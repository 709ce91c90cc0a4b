"""Scale probe: does the dedup/ANN family stay sub-quadratic when the
corpus grows 10x?

No sf1 testdata ships in this environment, so the probe synthesizes a
10x corpus from sf0.1 by unioning 10 id-remapped, DECORRELATED
copies. Decorrelation is the load-bearing choice: a verbatim (or
lightly-marked) 10x copy makes every document a 10-way near-dup, so
pair outputs grow ~45x and the measurement becomes "how fast can you
emit 1000x more pairs", not "does candidate generation stay linear"
(a first probe run with one marker token per copy measured exactly
that: 971x the output pairs). Instead:

- documents: every third token gets a copy-specific suffix, so EVERY
  3-gram shingle of a copy differs from the original and from other
  copies (any 3 consecutive tokens contain a mutated position) —
  cross-copy Jaccard is 0 while within-copy structure is preserved
  (copy-mates of originally-similar docs mutate identically, so their
  similarity survives). Output pairs grow exactly 10x.
- embeddings: each copy is multiplied elementwise by a deterministic
  per-copy +-1 sign pattern — an orthogonal transform, so within-copy
  cosines are EXACTLY the originals' while cross-copy cosines collapse
  toward 0. Output near-dup pairs grow exactly 10x.

For each probed operator the headline number is wall(10x)/wall(1x):
a candidate-generation design that is secretly all-pairs goes ~100x;
the banded/bucketed designs should stay near ~10x (plus constant
overhead). Prints one JSON line; run ad-hoc, results recorded in
SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_commerce_spark import get_spark  # noqa: E402
from bigdata_commerce_spark.operators import dedup, similarity  # noqa: E402
from bigdata_commerce_spark.operators.dedup_cluster import connected_components  # noqa: E402

SCRATCH = Path(__file__).resolve().parent / ".scratch" / "scale_probe"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10


def build_corpus(spark) -> tuple[str, str]:
    """10 id-remapped copies of documents + embeddings, written once."""
    docs_out = str(SCRATCH / "documents10x")
    emb_out = str(SCRATCH / "embeddings10x")
    if not (Path(docs_out).exists() and Path(emb_out).exists()):
        shutil.rmtree(SCRATCH, ignore_errors=True)
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        n_docs = docs.count()
        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        n_emb = emb.count()
        copies = spark.range(COPIES).withColumnRenamed("id", "copy")
        (
            docs.crossJoin(F.broadcast(copies))
            .select(
                (F.col("doc_id") + F.col("copy") * F.lit(n_docs)).alias("doc_id"),
                # copy 0 = originals; copies 1..9 mutate every third
                # token (see module docstring)
                F.when(F.col("copy") == 0, F.col("text"))
                .otherwise(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda x, i: F.when(
                                i % 3 == 0,
                                F.concat(x, F.lit("c"), F.col("copy").cast("string")),
                            ).otherwise(x),
                        ),
                        " ",
                    )
                )
                .alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            .repartition(32)
            .write.parquet(docs_out)
        )
        (
            emb.crossJoin(F.broadcast(copies))
            .select(
                (F.col("vec_id") + F.col("copy") * F.lit(n_emb)).alias("vec_id"),
                # deterministic +-1 sign pattern per (copy, dim):
                # parity of a md5 nibble — orthogonal transform, see
                # module docstring; copy 0 keeps the originals
                F.transform(
                    F.col("embedding"),
                    lambda x, i: F.when(F.col("copy") == 0, x).otherwise(
                        x
                        * F.when(
                            F.conv(
                                F.substring(
                                    F.md5(
                                        F.concat_ws(
                                            ":",
                                            F.col("copy").cast("string"),
                                            i.cast("string"),
                                        )
                                    ),
                                    1,
                                    1,
                                ),
                                16,
                                10,
                            ).cast("int")
                            % 2
                            == 0,
                            F.lit(1.0),
                        ).otherwise(F.lit(-1.0))
                    ).cast("float"),
                ).alias("embedding"),
                "label",
            )
            .repartition(32)
            .write.parquet(emb_out)
        )
    return docs_out, emb_out


def probes(spark, docs_path: str, emb_path: str):
    docs = spark.read.parquet(docs_path)
    emb = spark.read.parquet(emb_path)
    probe_vecs = emb.where(F.col("vec_id") < 5)
    return {
        "dedup_exact": lambda: dedup.exact_duplicates(docs).count(),
        "dedup_minhash_lsh": lambda: dedup.minhash_lsh_pairs(
            docs, num_hashes=8, bands=4, threshold=0.8
        ).count(),
        "dedup_simhash": lambda: dedup.simhash_pairs(docs, max_hamming=3).count(),
        "dedup_ngram_jaccard": lambda: dedup.jaccard_pairs(docs, threshold=0.8).count(),
        "dedup_clusters": lambda: connected_components(
            docs.select(F.col("doc_id").alias("id")),
            dedup.jaccard_pairs(docs, threshold=0.8),
            node_col="id",
        ).count(),
        "embedding_ann_ivf": lambda: similarity.ivf_topk(
            emb, probe_vecs, k=5, n_centroids=16, nprobe=4
        ).count(),
        "embedding_neardup": lambda: similarity.neardup_pairs(
            emb, threshold=0.45
        ).count(),
    }


def main() -> None:
    spark = get_spark(app_name="scale_probe")
    docs10, emb10 = build_corpus(spark)
    docs1 = os.path.join(SF_DIR, "documents.parquet")
    emb1 = os.path.join(SF_DIR, "embeddings.parquet")

    out = {"metric": "scale_probe_10x_ratio", "copies": COPIES, "ops": {}}
    p1 = probes(spark, docs1, emb1)
    p10 = probes(spark, docs10, emb10)
    for name in p1:
        fn1, fn10 = p1[name], p10[name]
        # symmetric warm-up: both sides pay one run before timing, so
        # one-time reader/codegen cost doesn't inflate only the 10x
        # number (the headline ratio)
        fn1()
        fn10()
        t0 = time.perf_counter()
        n1 = fn1()
        w1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        n10 = fn10()
        w10 = time.perf_counter() - t0
        out["ops"][name] = {
            "wall_1x": round(w1, 2),
            "wall_10x": round(w10, 2),
            "ratio": round(w10 / w1, 1),
            "rows_1x": n1,
            "rows_10x": n10,
        }
        print(f"# {name}: {w1:.2f}s -> {w10:.2f}s ({w10 / w1:.1f}x)", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
