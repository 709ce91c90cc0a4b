"""BM25 relevance scoring over the document corpus — query-driven
quality filtering for training data (score a crawl slice against a
topic's terms, keep the tail above a threshold; the retrieval half of
retrieval-augmented dataset curation).

Okapi BM25 (Robertson/Sparck Jones; the Lucene-default formulation):

    score(D, Q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*|D|/avgdl))
    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))

Scale shape (in-plan end to end):
- tokenize + doc length as array expressions (no UDF);
- ONE explode, with the query-term membership filter applied to the
  exploded term map-side — only (doc, matching-term) pairs ever reach
  a shuffle, so a 1000-term query over 100 TB shuffles megabytes;
- term frequencies = one hash aggregate on (doc, term); document
  frequencies ride a second aggregate over that (already tiny)
  result; N/avgdl are a one-row aggregate — both broadcast;
- per-document score = one aggregate over <= |Q| rows per doc.

The corpus tokenizes twice by default (the N/avgdl stats pass and the
match pass). At 100 TB, pass ``n_docs``/``avgdl`` explicitly — corpus
stats are computed once per snapshot and reused across every query —
and the stats scan disappears, leaving ONE corpus pass per query.

Determinism across engines: each term's contribution is rounded to
8 dp and summed as DECIMAL (the money_sum discipline) — ln() may
differ by 1 ulp between libms, and float summation order between
partitionings; rounding before the exact sum makes Spark and the
DuckDB oracle bit-identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "bm25",
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """(id, score) for every document matching at least one query
    term (docs with no match are absent — join-filter semantics, the
    useful shape when the corpus dwarfs the match set). Tokenization
    is lowercase whitespace split; pre-normalize the text column for
    anything fancier. Scores are rounded to 6 dp.

    Pass ``n_docs`` AND ``avgdl`` (precomputed corpus stats) to skip
    the stats scan — the production path when many queries score the
    same snapshot (module docstring).
    """
    if not query_terms:
        raise ValueError("bm25_scores needs at least one query term")
    if (n_docs is None) != (avgdl is None):
        raise ValueError("pass both n_docs and avgdl, or neither")
    terms = sorted({t.lower() for t in query_terms})

    toks = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
        ).alias("__toks"),
    ).withColumn("__dl", F.size("__toks"))

    if n_docs is not None:
        spark = docs.sparkSession
        stats = spark.range(1).select(
            F.lit(int(n_docs)).alias("__n"),
            F.lit(float(avgdl)).alias("__avgdl"),
        )
    else:
        stats = toks.agg(
            F.count(F.lit(1)).alias("__n"), F.avg("__dl").alias("__avgdl")
        )

    # membership filter on the exploded term evaluates map-side,
    # before any shuffle — the load-bearing line at corpus scale
    matches = toks.select(
        id_col, "__dl", F.explode("__toks").alias("__term")
    ).where(F.col("__term").isin(terms))

    tf = matches.groupBy(id_col, "__dl", "__term").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    df_ = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))

    n, avgdl = F.col("__n"), F.col("__avgdl")
    idf = F.log(
        F.lit(1.0) + (n - F.col("__df") + F.lit(0.5)) / (F.col("__df") + F.lit(0.5))
    )
    tf_term = (
        F.col("__tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("__tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl)
        )
    )
    contrib = F.round(idf * tf_term, 8).cast("decimal(20,8)")
    return (
        tf.join(F.broadcast(df_), "__term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).cast("double").alias(score_col))
    )
