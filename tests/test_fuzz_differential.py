"""Differential fuzz sweep: EVERY oracle-paired catalog query runs on
adversarially-generated data (tests/fuzzgen.py) and must still match
its DuckDB oracle with the driver's exact row-count + schema +
value comparison.

Why this exists: the driver gate and the twin pytest both replay the
SAME fixed parquet testdata, so an operator/oracle pair can agree on
that distribution while disagreeing off it. This sweep feeds both
engines NULLs, empty/unicode/whitespace strings, malformed JSON,
dangling foreign keys, timestamp ties, planted skew, and degenerate
embedding vectors — same schemas, hostile content.

Round-6 findings it would have caught (all fixed, kept here as the
regression net):
- ANSI cast abort on {"k": "garbage"} props (-> try_cast at ingest)
- DuckDB json_extract throwing on malformed JSON (-> json_valid guard)
- DuckDB DECIMAL(38,12)->DOUBLE double-rounding (-> via-VARCHAR cast)
- DuckDB numeric-literal parse 1 ULP off for ~11% of doubles
  (-> CAST('…' AS DOUBLE) for embedded plane matrices)
- NULL-contract drift in 7 oracles (boilerplate, canonical docs, URL
  dedup/host report, winsorize, OHLC, dup matrix) and 2 kernels
  (multimodal absent-media semantics)
- -0.0 vs +0.0 hash splits (fold init, ROUND sign normalization)
"""

from __future__ import annotations

import pytest

# Suite tiering (VERDICT r10 item 7): the differential fuzz sweep is a
# heavyweight certification sweep — the full `pytest tests/` run
# keeps it; `-m "not slow"` gives the fast development signal.
pytestmark = pytest.mark.slow

from bigdata_commerce_spark.plans import ORACLES, QUERIES, TWIN_ORACLES, TWIN_QUERIES
from tests.fuzzgen import generate
from tests.oracle_utils import compare_to_oracle

ALL_QUERIES = {**TWIN_QUERIES, **QUERIES}
ALL_ORACLES = {**TWIN_ORACLES, **ORACLES}


@pytest.fixture(scope="session")
def fuzz_dir(tmp_path_factory) -> str:
    return generate(str(tmp_path_factory.mktemp("fuzzdata")))


def test_every_oracle_paired_query_is_swept():
    # every query with an oracle gets a fuzz row; if this fails a new
    # query was registered without joining the sweep (it is automatic
    # — fix the registry, not this test)
    assert set(ALL_ORACLES) <= set(ALL_QUERIES)
    assert len(ALL_ORACLES) >= 128


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_fuzz_matches_oracle(spark, fuzz_dir, name):
    df = ALL_QUERIES[name](spark, fuzz_dir)
    compare_to_oracle(spark, df, ALL_ORACLES[name], fuzz_dir)


# ---------------------------------------------------------------------------
# Empty-table profile: 100 TB pipelines hit empty sources/partitions
# constantly; zero rows must mean an empty-but-correct report, a
# documented loud error — never a crash or a silent engine divergence.
# ---------------------------------------------------------------------------

# Operators whose documented contract is a LOUD error on empty input
# (an anchor/quantizer/binning cannot be derived from nothing).
EMPTY_RAISES: dict[str, str] = {
    "customer_rfm_segments": "recency anchor needs >= 1 order",
    "price_distribution_psi": "binning needs a non-empty baseline",
    "embedding_ann_ivf_indexed": "md5 quantizer needs >= 1 vector "
    "(explicit centroids= seeds an empty index — covered below)",
}

# Spark emits NO grand-total row for rollup/cube/grouping sets over
# zero input rows; DuckDB (and the SQL standard) emit the () group
# with count 0. Engine-level divergence — Spark's behavior is this
# engine's contract, so the oracle comparison is skipped on empty.
EMPTY_ENGINE_DIVERGENCE = frozenset(
    {"lineitem_rollup", "lineitem_cube", "events_grouping_sets"}
)


@pytest.fixture(scope="session")
def empty_dir(tmp_path_factory) -> str:
    import pyarrow.parquet as pq

    from tests.conftest import SF_SMOKE

    out = tmp_path_factory.mktemp("emptydata")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        sch = pq.read_schema(f"{SF_SMOKE}/{t}.parquet")
        pq.write_table(sch.empty_table(), str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_empty_tables(spark, empty_dir, name):
    if name in EMPTY_RAISES:
        with pytest.raises(ValueError):
            ALL_QUERIES[name](spark, empty_dir).collect()
        return
    if name in EMPTY_ENGINE_DIVERGENCE:
        assert ALL_QUERIES[name](spark, empty_dir).count() == 0
        return
    df = ALL_QUERIES[name](spark, empty_dir)
    compare_to_oracle(spark, df, ALL_ORACLES[name], empty_dir)


# ---------------------------------------------------------------------------
# Duplicate-heavy profile: 70% of the corpus is exact/near duplicate
# chains — the regime where cluster merging, canonical survivor picks,
# span scrubbing and incremental dedup stores do real work (the base
# profile's ~20% duplication barely links anything). Restricted to the
# dedup/similarity/span family; the other queries don't read text
# structure and gain nothing from a third full sweep.
# ---------------------------------------------------------------------------

DUP_FAMILY = sorted(
    set(ALL_ORACLES)
    & {
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "dedup_clusters",
        "dedup_canonical_docs",
        "minhash_signatures",
        "simhash_values",
        "doc_fingerprints",
        "doc_duplicate_spans",
        "docs_scrubbed_dupspans",
        "doc_contaminated_spans",
        "benchmark_contamination",
        "source_dup_matrix",
        "incremental_dedup_novel",
        "docs_bloom_anti",
        "docs_bloom_semi",
        "docs_editdist_join",
        "cross_corpus_links",
        "multimodal_phash_wide_pairs",
        "documents_canonical_urls",
        "url_dedup_survivors",
        "boilerplate_scrub",
        "repetition_stats",
        "corpus_curation",
        "corpus_curation_funnel",
    }
)


@pytest.fixture(scope="session")
def dup_heavy_dir(tmp_path_factory) -> str:
    return generate(str(tmp_path_factory.mktemp("dupheavy")), dup_rate=0.7)


def test_dup_family_is_nonempty():
    assert len(DUP_FAMILY) >= 20


@pytest.mark.parametrize("name", DUP_FAMILY)
def test_dup_heavy_matches_oracle(spark, dup_heavy_dir, name):
    df = ALL_QUERIES[name](spark, dup_heavy_dir)
    compare_to_oracle(spark, df, ALL_ORACLES[name], dup_heavy_dir)


def test_empty_ivf_index_with_explicit_centroids(spark, empty_dir, tmp_path):
    """An EMPTY index is legitimate when the quantizer is supplied
    (build-then-append lifecycle): write must leave a readable store
    (the cells_schema anchor) and search must return zero rows."""
    from pyspark.sql import functions as F

    from bigdata_commerce_spark.operators import ivf_index
    from bigdata_commerce_spark.sources.testdata import load_table

    empty = load_table(spark, "embeddings", empty_dir)
    cents = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [-1.0] * 64)],
        "centroid_id int, centroid_vec array<double>",
    )
    path = str(tmp_path / "empty_ivf")
    ivf_index.write_ivf_index(empty, path, centroids=cents)
    probes = spark.createDataFrame(
        [(7, [0.5] * 64)], "vec_id long, embedding array<float>"
    ).withColumn("embedding", F.col("embedding"))
    assert ivf_index.search_ivf_index(spark, path, probes, k=3).count() == 0
    # and appending into the seeded index works + becomes searchable
    delta = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id long, embedding array<float>"
    )
    ivf_index.append_to_ivf_index(delta, path)
    assert ivf_index.search_ivf_index(spark, path, probes, k=3).count() == 1


def test_recipe_gates_nonvacuous_on_fuzz_corpus(spark, fuzz_dir):
    """Round-7 verdict item 3: the fuzz corpus now carries a
    multi-line prose family (fuzzgen._prose), so the published recipe
    gates must pass a NON-ZERO subset — a composed funnel whose every
    stage is zero would be a vacuous oracle match."""
    row = ALL_QUERIES["published_recipe_funnel"](spark, fuzz_dir).collect()[0]
    assert row.n_raw > 0
    assert row.n_gopher > 0, "no doc passes Gopher — prose family missing?"
    assert row.n_c4 > 0, "no doc passes Gopher+C4"
    assert row.n_ccnet > 0, "no survivor lands in CCNet head/middle"
    assert row.n_dsir > 0, "no survivor kept by DSIR"
    # funnel is monotone by construction; pin it anyway
    assert row.n_raw >= row.n_gopher >= row.n_c4 >= row.n_ccnet >= row.n_dsir
