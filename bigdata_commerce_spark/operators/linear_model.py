"""Hashed-feature linear classifier: the fastText-style quality-filter
seam (CCNet / RefinedWeb / DCLM pipelines gate documents on a linear
model over hashed bag-of-words features).

operators/lm_quality.py scores fluency with a char-bigram LM; this
module is the *supervised* counterpart — score documents against a
trained weight vector, and train that vector distributedly when
labels exist (gold prose vs crawl noise). Both halves are pure
DataFrame plans:

- **Featurization** (hashing trick, Weinberger et al. 2009): token ->
  bucket via the package's engine-portable md5 machinery
  (functions.md5_uniform60 discipline), L1-normalized term frequency.
  MAP-SIDE array expressions + ONE explode + ONE (id, bucket) hash
  aggregate — the same cost class as every tokenizing operator here.
- **Scoring**: broadcast-join the (bucket, w) weight table (a model
  of 2^20 buckets is ~8 MB — always broadcastable), then ONE hash
  aggregate per document. The per-document dot product is a
  SEQUENTIAL FOLD over the bucket-sorted contribution list, so the
  float sum has one defined association order — bit-identical across
  engines/partitionings (the bm25/ewma hash-stability discipline).
- **Training** (full-batch logistic GD): per iteration, one
  broadcast-join + doc aggregate (scores), one key aggregate
  (bucket gradients), one scalar collect (bias gradient — one float,
  the PageRank dangling-mass pattern). Feature rows are computed ONCE
  and persisted; iteration cost is independent of vocabulary. Not
  SQL-expressible (iterative float fixpoint) — verified against a
  numpy reference instead, the graph.py precedent.

Ref: reference engine has no model scoring at all; spec follows the
public fastText linear classifier (Joulin et al. 2016) restricted to
unigram features, hashing-trick vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "feat"


def token_bucket_expr(token, n_buckets: int):
    """Engine-portable bucket id of one token: first 15 hex chars of
    md5(token:feat) as BIGINT, mod n_buckets (the md5_uniform60
    formula applied to token text; DuckDB replays it char-for-char)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(token, F.lit(f":{_SALT}"))), 1, 15), 16, 10
        ).cast("long")
        % n_buckets
    )


def hashed_features(
    df: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket, x): L1-normalized hashed term frequencies —
    x = count(tokens hashing to bucket) / count(tokens). Documents
    with no tokens contribute no rows (score_linear restores them
    with the bias-only score). One explode + one hash aggregate."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    tokens = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"), lambda t: t != ""
    )
    toks = df.select(
        F.col(id_col), tokens.alias("__tk")
    ).select(
        F.col(id_col),
        F.size("__tk").alias("__n"),
        F.explode("__tk").alias("__t"),
    )
    return (
        toks.select(
            id_col, "__n", token_bucket_expr(F.col("__t"), n_buckets).alias("bucket")
        )
        .groupBy(id_col, "bucket")
        .agg(
            (F.count(F.lit(1)).cast("double") / F.first("__n")).alias("x")
        )
    )


def score_linear(
    df: DataFrame,
    weights: DataFrame,
    bias: float,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document linear score + sigmoid probability against a
    (bucket, w) weight table. Returns (id, score, prob), both rounded
    to 6 dp for engine-portable comparison.

    The dot product folds contributions in BUCKET ORDER (array_sort +
    sequential aggregate), not in shuffle-arrival order, so the float
    sum is deterministic — rerun-stable and oracle-reproducible.
    Weights are broadcast (a hashed vocabulary is small by
    construction); documents without tokens — or whose tokens all hit
    zero-weight buckets absent from ``weights`` — score the bare bias.
    """
    feats = hashed_features(df, n_buckets, text_col=text_col, id_col=id_col)
    contrib = (
        feats.join(F.broadcast(weights), "bucket", "left")
        .select(
            id_col,
            "bucket",
            (F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias("c"),
        )
        .groupBy(id_col)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("bucket", "c"))),
                F.lit(0.0),
                lambda acc, s: acc + s["c"],
            ).alias("__dot")
        )
    )
    out = df.select(id_col).join(contrib, id_col, "left")
    score = F.coalesce(F.col("__dot"), F.lit(0.0)) + F.lit(float(bias))
    return out.select(
        id_col,
        F.round(score, 6).alias("score"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-score)), 6).alias("prob"),
    )


def train_logreg(
    df: DataFrame,
    n_buckets: int,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = 20,
    lr: float = 1.0,
    checkpoint_every: int = 5,
) -> tuple[DataFrame, float]:
    """Full-batch logistic regression by gradient descent over hashed
    features. Returns ((bucket, w) DataFrame, bias).

    Loss = mean log-loss over documents; gradients are exact (no
    sampling), so the result is a deterministic function of the data
    up to float-sum association (verified against a numpy twin to
    1e-6 in tests — the PageRank verification posture). Per
    iteration: broadcast current weights -> per-doc score aggregate ->
    per-doc error -> per-bucket gradient aggregate + ONE collected
    float (bias gradient). The feature table is computed once and
    persisted; weight lineage is truncated by localCheckpoint every
    ``checkpoint_every`` iterations (graph.py cadence) so the plan
    does not grow with the iteration count.
    """
    labels = df.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    )
    feats = hashed_features(df, n_buckets, text_col=text_col, id_col=id_col).persist()
    n_docs = labels.count()
    if n_docs == 0:
        raise ValueError("train_logreg needs at least one labeled document")
    spark = df.sparkSession
    w = spark.createDataFrame([], "bucket long, w double")
    bias = 0.0
    for it in range(iters):
        dots = (
            feats.join(F.broadcast(w), "bucket", "left")
            .groupBy(id_col)
            .agg(F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0))).alias("__dot"))
        )
        err = (
            labels.join(dots, id_col, "left")
            .select(
                id_col,
                (
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(-(F.coalesce(F.col("__dot"), F.lit(0.0)) + F.lit(bias)))
                    )
                    - F.col("__y")
                ).alias("__e"),
            )
        )
        grad = (
            feats.join(err, id_col)
            .groupBy("bucket")
            .agg((F.sum(F.col("x") * F.col("__e")) / F.lit(float(n_docs))).alias("__g"))
        )
        bias_grad = err.agg(F.avg("__e")).collect()[0][0]
        w = (
            w.join(grad, "bucket", "full")
            .select(
                "bucket",
                (
                    F.coalesce(F.col("w"), F.lit(0.0))
                    - F.lit(lr) * F.coalesce(F.col("__g"), F.lit(0.0))
                ).alias("w"),
            )
        )
        bias -= lr * float(bias_grad)
        if (it + 1) % checkpoint_every == 0 or it == iters - 1:
            w = w.localCheckpoint()
    feats.unpersist()
    return w, bias
