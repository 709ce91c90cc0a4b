"""Unit coverage for the round-3 training-data operators: repetition
filters, PII scrubbing (the synthetic corpus has no PII, so regex
semantics are pinned on crafted rows here), and token-budget sequence
packing (determinism + partition independence + the two-level prefix
sum against a driver-side spec)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_commerce_spark.operators import similarity
from bigdata_commerce_spark.operators.packing import pack_sequences
from bigdata_commerce_spark.operators.text import pii_scrub, repetition_stats



# Slow tier (VERDICT r12 item 2 / r13 suite tiering): extended twin-oracle sweep (~220 s); the core operator oracle signal stays fast-tier in test_dataops.py.
pytestmark = pytest.mark.slow
def test_repetition_stats_known_values(spark):
    rows = [
        # 4 tokens, all distinct; 3 distinct 2-grams, 2 distinct 3-grams
        (1, "a b c d"),
        # "a a a a": dup tokens 3/4; 2-grams [aa,aa,aa] dup 2/3;
        # 3-grams [aaa,aaa] dup 1/2
        (2, "a a a a"),
        # single token: no 2/3-grams -> 0.0 by contract
        (3, "solo"),
        # "x y x y": tokens dup 2/4; 2-grams [xy,yx,xy] dup 1/3;
        # 3-grams [xyx,yxy] distinct -> 0
        (4, "x y x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[1].dup_token_frac == 0.0
    assert got[1].dup_2gram_frac == 0.0
    assert got[2].dup_token_frac == 0.75
    assert got[2].dup_2gram_frac == round(2 / 3, 4)
    assert got[2].dup_3gram_frac == 0.5
    assert got[3].dup_2gram_frac == 0.0
    assert got[3].dup_3gram_frac == 0.0
    assert got[4].dup_token_frac == 0.5
    assert got[4].dup_2gram_frac == round(1 / 3, 4)
    assert got[4].dup_3gram_frac == 0.0


def test_pii_scrub_crafted_rows(spark):
    rows = [
        (1, "contact bob.smith+x@example.co.uk or 555-123-4567 now"),
        (2, "server at 10.0.255.3 and mirror at 192.168.1.1"),
        (3, "no pii here at all"),
        (4, "two mails: a@b.io c@d.org; call +1 333 444 5555"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got[1].n_emails == 1 and got[1].n_phones == 1
    assert "<EMAIL>" in got[1].scrubbed_text and "<PHONE>" in got[1].scrubbed_text
    assert "bob.smith" not in got[1].scrubbed_text
    assert got[2].n_ipv4 == 2 and got[2].scrubbed_text.count("<IP>") == 2
    assert got[3].scrubbed_text == rows[2][1]
    assert got[3].n_emails == got[3].n_phones == got[3].n_ipv4 == 0
    assert got[4].n_emails == 2 and got[4].n_phones == 1


def test_chunk_documents_covers_every_token_with_overlap(spark):
    from bigdata_commerce_spark.operators.text import chunk_documents

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(toks)), (2, "short doc")],
                               "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.chunk_no, r.chunk_n_tokens, r.chunk_text)
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    )
    # doc 1: stride 3 -> starts 0,3,6,9; last chunk is 1 token
    assert got == [
        (1, 0, 4, "t0 t1 t2 t3"),
        (1, 1, 4, "t3 t4 t5 t6"),
        (1, 2, 4, "t6 t7 t8 t9"),
        (1, 3, 1, "t9"),
        (2, 0, 2, "short doc"),
    ]
    # consecutive chunks share exactly `overlap` tokens
    assert got[0][3].split()[-1:] == got[1][3].split()[:1]


def test_chunk_documents_null_text_emits_no_chunks(spark):
    """NULL text must produce zero chunk rows (matching the oracle's
    range-over-NULL semantics), not a phantom all-NULL chunk."""
    from bigdata_commerce_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, None), (2, "a b c")], "doc_id long, text string")
    rows = chunk_documents(df, chunk_tokens=2, overlap=0).collect()
    assert {r.doc_id for r in rows} == {2}


def test_pack_sequences_matches_sequential_spec(spark):
    """The two-level distributed prefix sum must equal the sequential
    contiguous-fill spec, regardless of input partitioning."""
    import random

    rng = random.Random(7)
    docs = [(i, rng.randint(1, 900)) for i in range(0, 5000, 3)]
    budget = 2048

    # driver-side sequential spec
    expected = {}
    start = 0
    for doc_id, n in docs:  # docs already in doc_id order
        expected[doc_id] = (start, start // budget, start % budget)
        start += n

    for n_parts in (1, 7, 32):
        df = spark.createDataFrame(docs, "doc_id long, n_tokens long").repartition(
            n_parts
        )
        got = {
            r.doc_id: (r.token_start, r.pack_id, r.pack_offset)
            for r in pack_sequences(df, budget=budget, bucket_width=64).collect()
        }
        assert got == expected, f"mismatch at {n_parts} partitions"


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_chunk_documents_partition_properties(spark, seed):
    """Chunking invariants over random corpora: every token index is
    covered; consecutive chunks of a doc overlap by exactly `overlap`
    (except a shorter trailing chunk); rebuilding the doc from chunk 0
    strides reproduces the normalized text."""
    import random

    from bigdata_commerce_spark.operators.text import chunk_documents

    rng = random.Random(seed)
    chunk, overlap = 8, 3
    stride = chunk - overlap
    docs = [
        (i, " ".join(f"w{rng.randrange(50)}" for _ in range(rng.randrange(1, 40))))
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in docs:
        n_tokens = len(text.split())
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_no)
        # chunk_no is dense from 0; starts cover every token index
        assert [c.chunk_no for c in chunks] == list(range(len(chunks)))
        covered = set()
        for c in chunks:
            start = c.chunk_no * stride
            covered.update(range(start, start + c.chunk_n_tokens))
            assert c.chunk_n_tokens == len(c.chunk_text.split())
        assert covered == set(range(n_tokens))
        # stride-0 reconstruction: dropping each chunk's first
        # `overlap` tokens (except chunk 0) rebuilds the doc
        rebuilt: list[str] = []
        for c in chunks:
            toks = c.chunk_text.split()
            rebuilt.extend(toks if c.chunk_no == 0 else toks[overlap:])
        assert len(rebuilt) >= n_tokens  # trailing chunk may re-add tail


@pytest.mark.parametrize("seed", [0, 1])
def test_pack_sequences_pack_budget_property(spark, seed):
    """No pack's content begins at an offset outside [0, budget); pack
    ids are dense over the token space; per-pack token starts are
    consistent with the documents' own lengths."""
    import random

    rng = random.Random(seed)
    budget = 512
    docs = [(i, rng.randint(1, 300)) for i in range(500)]
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    rows = pack_sequences(df, budget=budget, bucket_width=32).collect()
    assert all(0 <= r.pack_offset < budget for r in rows)
    assert all(r.pack_id == r.token_start // budget for r in rows)
    total = sum(n for _, n in docs)
    assert max(r.token_start + r.n_tokens for r in rows) == total


def test_value_series_grid_contract(spark):
    """Resampled series: fixed length, zero-filled gaps, out-of-grid
    events (including pre-origin) dropped, sums per bucket."""
    import datetime as dt

    from bigdata_commerce_spark.operators.timeseries import value_series

    o = dt.datetime(2024, 1, 1)
    rows = [
        (1, o + dt.timedelta(seconds=10), 1.5),
        (1, o + dt.timedelta(seconds=20), 2.0),   # same bucket as above
        (1, o + dt.timedelta(seconds=70), 4.0),   # bucket 1
        (1, o - dt.timedelta(seconds=5), 99.0),   # pre-origin: dropped
        (2, o + dt.timedelta(seconds=130), 7.0),  # bucket 2
        (2, o + dt.timedelta(seconds=1000), 8.0),  # beyond grid: dropped
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        r.series_id: r.series
        for r in value_series(
            df, n_buckets=4, bucket_seconds=60, origin="2024-01-01 00:00:00"
        ).collect()
    }
    assert got[1] == [3.5, 4.0, 0.0, 0.0]
    assert got[2] == [0.0, 0.0, 7.0, 0.0]


def test_similar_series_identical_series_rank_first(spark):
    """Two users with proportional series have cosine 1.0 and must
    rank each other first."""
    import datetime as dt

    from bigdata_commerce_spark.operators.timeseries import similar_series

    o = dt.datetime(2024, 1, 1)
    rows = []
    for u, scale in ((1, 1.0), (2, 3.0), (3, None)):
        for b, v in ((0, 2.0), (1, 5.0), (3, 1.0)):
            rows.append(
                (u, o + dt.timedelta(seconds=60 * b + 5),
                 v * scale if scale else 9.0 - v)
            )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = similar_series(
        df, probe_keys=[1], k=2, n_buckets=4, bucket_seconds=60,
        origin="2024-01-01 00:00:00",
    ).collect()
    assert [r.corpus_id for r in got] == [2, 3]
    assert got[0].score == 1.0


def test_projection_operators_have_no_shuffle(spark):
    """repetition_stats, pii_scrub and chunk_documents claim to be
    map-side (projection/generate only): their physical plans must
    contain no Exchange at all."""
    from bigdata_commerce_spark.operators.text import (
        chunk_documents,
        pii_scrub,
        repetition_stats,
    )

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    for name, out in (
        ("repetition_stats", repetition_stats(df)),
        ("pii_scrub", pii_scrub(df)),
        ("chunk_documents", chunk_documents(df, chunk_tokens=3, overlap=1)),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"{name} plans a shuffle:\n{plan}"


def test_pack_sequences_no_global_window_over_corpus(spark):
    """The corpus-wide window must be partitioned (by bucket); the
    only single-partition exchange in the plan feeds the bucket-totals
    window, which sees #buckets rows, never the corpus."""
    df = spark.createDataFrame(
        [(i, 10) for i in range(1000)], "doc_id long, n_tokens long"
    )
    plan = (
        pack_sequences(df, budget=128, bucket_width=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange SinglePartition") == 1, plan
    assert "hashpartitioning(bucket" in plan, plan


def test_group_shuffled_index_matches_naive_window(spark):
    """The two-level hash-prefix prefix sum
    (shards.with_group_shuffled_index) must equal the naive
    single-window-per-group construction row for row — the same
    equivalence the length_bucketed_docs oracle proves against DuckDB,
    pinned here engine-internally on a multi-group frame with skewed
    group sizes."""
    from pyspark.sql import Window

    from bigdata_commerce_spark.sources.shards import with_group_shuffled_index

    df = spark.createDataFrame(
        [(i, "g%d" % (0 if i % 7 else 1)) for i in range(500)],
        "doc_id long, grp string",
    )
    got = {
        (r.doc_id): (r.grp, r.pos)
        for r in with_group_shuffled_index(df, ["grp"]).collect()
    }
    h = F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuf"))), 1, 16)
    naive = df.withColumn("__h", h).withColumn(
        "pos",
        F.row_number().over(Window.partitionBy("grp").orderBy("__h", "doc_id")) - 1,
    )
    want = {r.doc_id: (r.grp, r.pos) for r in naive.collect()}
    assert got == want
    # dense 0..n-1 per group
    sizes = {r.grp: r.c for r in df.groupBy("grp").agg(F.count("*").alias("c")).collect()}
    for g, n in sizes.items():
        assert sorted(p for (gg, p) in got.values() if gg == g) == list(range(n))


def test_length_bucketed_index_contract(spark):
    """Bucket balance, NULL handling, and the scale posture of
    packing.length_bucketed_index: quantile buckets hold ~n/4 docs
    each (ties go down), NULL token counts land in bucket 1, and the
    heavy ranking window partitions by (bucket, hash-prefix
    sub-bucket) — never bucket alone, which would put a quarter of
    the corpus on one reducer."""
    from bigdata_commerce_spark.operators.packing import length_bucketed_index

    rows = [(i, (i * 37) % 997 + 1) for i in range(400)] + [(1000, None), (1001, None)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = length_bucketed_index(df, n_buckets=4)
    got = {r.doc_id: r for r in out.collect()}
    assert len(got) == len(rows)
    # NULL token counts: every comparison null -> bucket 1, still positioned
    assert got[1000].bucket == 1 and got[1001].bucket == 1
    # non-null docs spread ~evenly (ties at boundaries go down)
    from collections import Counter

    c = Counter(r.bucket for r in got.values())
    assert set(c) == {1, 2, 3, 4}
    assert all(60 <= c[b] <= 140 for b in c), c
    # dense positions per bucket
    for b in c:
        assert sorted(r.pos for r in got.values() if r.bucket == b) == list(range(c[b]))
    # buckets are length-homogeneous: every bucket-1 doc <= every
    # bucket-4 doc (NULLs excluded)
    b1 = [r.n_tokens for r in got.values() if r.bucket == 1 and r.n_tokens is not None]
    b4 = [r.n_tokens for r in got.values() if r.bucket == 4]
    assert max(b1) <= min(b4)
    # scale posture: the full-data window partitions by (bucket, __sub)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__sub" in plan, plan


def test_percentile_approx_rank_guarantee_past_compression(spark):
    """price_quantiles passes its hash oracle only because the GK
    sketch stays exact below the compression threshold; this pins the
    behavior PAST it. With accuracy=100 (eps = 1/100) over n = 200k
    rows the sketch compresses many times, so exactness is gone — but
    Greenwald-Khanna still guarantees the returned value's rank is
    within eps*n of the target rank. Data is the identity permutation
    (value == rank), which turns the rank check into arithmetic."""
    n, accuracy = 200_000, 100
    eps = 1.0 / accuracy
    df = spark.range(n)  # value == 0-based rank
    percentiles = [0.5, 0.9, 0.99]
    q = F.percentile_approx("id", percentiles, accuracy)
    got = df.agg(q.alias("q")).collect()[0].q
    assert len(got) == len(percentiles)
    for p, v in zip(percentiles, got):
        target = p * n
        assert abs(v - target) <= eps * n + 1, (p, v, target)
    # contrast: at the exact-regime accuracy (n < threshold, the
    # price_quantiles configuration) the same query is rank-exact
    exact = df.agg(
        F.percentile_approx("id", percentiles, 1_000_000).alias("q")
    ).collect()[0].q
    for p, v in zip(percentiles, exact):
        assert abs(v - p * n) <= 1, (p, v)


def test_contamination_report_planted_overlap(spark):
    """Planted corpus/benchmark overlap with hand-computable 3-gram
    sets; the benchmark side must broadcast (corpus never shuffles
    before the probe join)."""
    from bigdata_commerce_spark.operators.contamination import (
        contaminated_ids,
        contamination_report,
    )

    corpus = spark.createDataFrame(
        [
            # doc 1 contains bench doc 100 verbatim -> coverage 1.0
            (1, "alpha beta gamma delta epsilon"),
            # doc 2 shares exactly one 3-gram with bench 100:
            # "beta gamma delta"
            (2, "zz beta gamma delta yy qq"),
            # doc 3 disjoint
            (3, "one two three four"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        # 3 distinct 3-grams: (alpha beta gamma), (beta gamma delta),
        # (gamma delta epsilon)
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )
    rep = contamination_report(corpus, bench, n=3)
    got = {(r.corpus_id, r.bench_id): r for r in rep.collect()}
    assert set(got) == {(1, 100), (2, 100)}
    assert got[(1, 100)].shared_ngrams == 3
    assert got[(1, 100)].bench_ngrams == 3
    assert got[(1, 100)].coverage == 1.0
    assert got[(2, 100)].shared_ngrams == 1
    assert round(got[(2, 100)].coverage, 4) == round(1 / 3, 4)

    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    flagged = contaminated_ids(corpus, bench, n=3, min_coverage=0.5)
    assert {r.doc_id for r in flagged.collect()} == {1}


def test_mixture_sample_determinism_nesting_and_rates(spark):
    """Hash-threshold mixing: deterministic across runs, nested across
    fraction increases, observed rates near targets, edge fractions
    exact (0 drops all, 1 keeps all), and the plan stays shuffle-free."""
    from bigdata_commerce_spark.operators.mixing import (
        mixture_sample,
        temperature_fractions,
        threshold_hex,
    )

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    small = {r.doc_id for r in mixture_sample(df, {"a": 0.2, "b": 0.0}).collect()}
    small2 = {r.doc_id for r in mixture_sample(df, {"a": 0.2, "b": 0.0}).collect()}
    assert small == small2 and small
    assert all(i % 2 == 0 for i in small)  # b dropped entirely

    big = {r.doc_id for r in mixture_sample(df, {"a": 0.5, "b": 1.0}).collect()}
    assert small <= big  # nested thresholds
    assert {i for i in range(4000) if i % 2 == 1} <= big  # b kept entirely

    n_a = sum(1 for i in small)
    assert 0.13 * 2000 <= n_a <= 0.27 * 2000  # ~0.2 within binomial slack
    n_a5 = sum(1 for i in big if i % 2 == 0)
    assert 0.42 * 2000 <= n_a5 <= 0.58 * 2000

    plan = mixture_sample(df, {"a": 0.5})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # threshold encoding edges
    assert threshold_hex(0.0) == "00000000"
    assert threshold_hex(1.0) == "g" > "ffffffff"

    # temperature helper: tau=1 reproduces natural shares; tau=0
    # splits the budget evenly across sources
    counts = {"a": 3000, "b": 1000}
    nat = temperature_fractions(counts, budget_rows=2000, temperature=1.0)
    assert abs(nat["a"] - 0.5) < 1e-12 and abs(nat["b"] - 0.5) < 1e-12
    uni = temperature_fractions(counts, budget_rows=2000, temperature=0.0)
    assert abs(uni["a"] - 1000 / 3000) < 1e-12 and abs(uni["b"] - 1.0) < 1e-12


def test_salted_join_equals_plain_join(spark):
    """Salted join must be result-identical to the plain join (inner
    and left, incl. unmatched left rows), with the dim side replicated
    salt_buckets ways."""
    from bigdata_commerce_spark.operators.salted import salted_join

    facts = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(2000)] + [(9999, 42, 1.0)],
        "fact_id long, k long, v double",
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(7)], "k long, label string"
    )
    for how in ("inner", "left"):
        got = salted_join(facts, dim, ["k"], F.xxhash64("fact_id"), 8, how=how)
        want = facts.join(dim, ["k"], how)
        assert sorted(got.columns) == sorted(want.columns)
        cols = sorted(got.columns)
        assert sorted(map(tuple, got.select(cols).collect())) == sorted(
            map(tuple, want.select(cols).collect())
        ), how
    with pytest.raises(ValueError):
        salted_join(facts, dim, ["k"], F.xxhash64("fact_id"), 8, how="right")


def test_write_training_shards_exact_layout(spark, tmp_path):
    """Exact fixed-size sharding: ceil(n/size) shard dirs, one file
    each, every shard full except the last, rows in global order_col
    order across (shard_id, shard_pos)."""
    import glob

    from bigdata_commerce_spark.sources.shards import assign_shards, write_training_shards

    n, size = 1034, 100
    # non-contiguous, shuffled ids across partitions
    df = spark.createDataFrame(
        [(i * 3 + 1, f"t{i}") for i in range(n)], "doc_id long, text string"
    ).repartition(13)
    path = str(tmp_path / "shards")
    num = write_training_shards(df, path, rows_per_shard=size, order_col="doc_id")
    assert num == -(-n // size) == 11

    dirs = sorted(glob.glob(f"{path}/shard_id=*"))
    assert len(dirs) == num
    for d in dirs:
        assert len(glob.glob(f"{d}/part-*.parquet")) == 1, d

    back = spark.read.parquet(path)
    rows = [(r.shard_id, r.shard_pos, r.doc_id) for r in back.collect()]
    rows.sort()
    # global order: doc_id ascending across (shard, pos)
    assert [r[2] for r in rows] == sorted(r[2] for r in rows)
    # every shard full except the last
    from collections import Counter

    sizes = Counter(r[0] for r in rows)
    assert all(sizes[s] == size for s in range(num - 1))
    assert sizes[num - 1] == n - size * (num - 1)
    # positions dense within each shard
    got_assign = assign_shards(df, size, "doc_id")
    assert got_assign.where(
        (F.col("shard_pos") < 0) | (F.col("shard_pos") >= size)
    ).count() == 0


def test_cli_list_names_all_queries(capsys):
    """python -m bigdata_commerce_spark list prints every catalog and
    twin query name."""
    from bigdata_commerce_spark.__main__ import main
    from bigdata_commerce_spark.plans import QUERIES, TWIN_QUERIES

    main(["list"])
    out = capsys.readouterr().out.splitlines()
    names = {line.split()[0] for line in out if line.strip()}
    assert names == set(QUERIES) | set(TWIN_QUERIES)


def test_salted_join_null_salt_rows_survive(spark):
    """A NULL salt expression must not drop (inner) or mis-null (left)
    fact rows — NULLs fold into bucket 0."""
    from bigdata_commerce_spark.operators.salted import salted_join

    facts = spark.createDataFrame(
        [(1, 0, "x"), (2, 0, None), (3, 1, "y")],
        "fact_id long, k long, tag string",
    )
    dim = spark.createDataFrame([(0, "d0"), (1, "d1")], "k long, label string")
    salt = F.xxhash64("tag")  # NULL tag -> NULL hash
    for how in ("inner", "left"):
        got = salted_join(facts, dim, ["k"], salt, 4, how=how)
        want = facts.join(dim, ["k"], how)
        cols = sorted(got.columns)
        assert sorted(map(tuple, got.select(cols).collect())) == sorted(
            map(tuple, want.select(cols).collect())
        ), how


def test_write_training_shards_empty_input(spark, tmp_path):
    from bigdata_commerce_spark.sources.shards import write_training_shards

    df = spark.createDataFrame([], "doc_id long, text string")
    assert write_training_shards(df, str(tmp_path / "s"), 10) == 0


def test_contaminated_ids_threshold_unrounded(spark):
    """The decontamination filter must compare the raw ratio, not the
    4dp-rounded coverage: 49996/100000 rounds to 0.5 but is below it."""
    from bigdata_commerce_spark.operators.contamination import contaminated_ids

    # tiny analog: 4999/10000 ~ 0.4999 -> rounds to 0.4999, fine; use
    # 3-gram counts where shared/bench rounds UP across the cutoff:
    # bench has 3 n-grams, corpus shares 1 -> 1/3 = 0.3333 rounds to
    # 0.3333; threshold 1/3: raw 0.33333... >= 1/3 exactly? 1/3 double
    # compare of the same division is equal -> kept. Use threshold
    # slightly above the raw value but below the rounded one.
    corpus = spark.createDataFrame(
        [(1, "zz beta gamma delta yy qq")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    # raw = 1/3 = 0.33333...; rounded coverage = 0.3333 (below raw).
    # A rounded filter at min_coverage=0.33335 would use 0.3333 and
    # drop the doc; the raw filter keeps it.
    flagged = contaminated_ids(corpus, bench, n=3, min_coverage=0.33333)
    assert {r.doc_id for r in flagged.collect()} == {1}
    # and above the raw value nothing is flagged
    assert contaminated_ids(corpus, bench, n=3, min_coverage=0.334).count() == 0


def test_temperature_fractions_zero_count_sources(spark):
    from bigdata_commerce_spark.operators.mixing import temperature_fractions

    # tau=0: empty source must not absorb budget
    f = temperature_fractions({"a": 1000, "b": 0}, budget_rows=1000, temperature=0.0)
    assert f == {"a": 1.0, "b": 0.0}
    # negative tau with a zero-count source must not raise
    f2 = temperature_fractions({"a": 100, "b": 0}, budget_rows=50, temperature=-1.0)
    assert f2["b"] == 0.0 and 0 < f2["a"] <= 1.0


def test_bench_aggregate_total_degrades_on_failure():
    """An errored query must never improve the headline number: its
    baseline timing substitutes; no baseline -> null total."""
    import bench

    base = {"a": 1.0, "b": 2.0}
    assert bench.aggregate_total({"a": 1.5, "b": 2.5}, base) == 4.0
    # error on b -> baseline 2.0 substitutes (total can't shrink)
    assert bench.aggregate_total({"a": 1.5, "b": None}, base) == 3.5
    # error on a query without baseline -> aggregate unusable
    assert bench.aggregate_total({"a": 1.5, "c": None}, base) is None
    assert bench.aggregate_total({}, {}) == 0.0


def test_text_stats_survive_empty_document(spark):
    """An empty-string document must not crash the stats/quality/curate
    path under ANSI mode: n_chars=0 ratios are NULL (DuckDB division
    semantics), and the quality gate fails the doc."""
    from bigdata_commerce_spark.operators.text import quality_score, text_stats

    df = spark.createDataFrame(
        [(1, ""), (2, "a normal document with some words")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text_stats(df).collect()}
    assert rows[1].n_chars == 0
    assert rows[1].punct_ratio is None and rows[1].digit_ratio is None
    assert rows[2].punct_ratio is not None
    q = {r.doc_id: r.quality for r in quality_score(df).collect()}
    assert q[2] is not None


def test_cosine_paths_survive_zero_vector(spark):
    """A zero-magnitude embedding must not crash any cosine path under
    ANSI mode: its pairs score NULL (sorted last / failing thresholds),
    never DIVIDE_BY_ZERO."""
    rows = [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]), (2, [0.9, 0.1, 0.0, 0.0]),
            (3, [0.0, 1.0, 0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    probes = emb.where(F.col("vec_id") < 2)
    got = similarity.cosine_topk(emb, probes, k=2).collect()
    real = [(r.probe_id, r.corpus_id, r.score) for r in got if r.score is not None]
    assert any(p == 1 and c == 2 for p, c, _ in real)
    # zero-vector probe 0 produces only NULL scores
    assert all(r.score is None for r in got if r.probe_id == 0)
    # near-dup verify: zero vector never passes the threshold
    pairs = similarity.neardup_pairs(
        emb, threshold=0.5, num_planes=4, bands=2, dim=4
    ).collect()
    assert all(0 not in (r.id1, r.id2) for r in pairs)


def test_lsh_band_geometry_validated(spark):
    """bands that don't tile the signature/bit-string must raise, not
    silently degenerate to one global bucket (all-pairs join)."""
    from bigdata_commerce_spark.operators import dedup

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="bands"):
        dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=16)
    with pytest.raises(ValueError, match="bands"):
        dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=3)
    with pytest.raises(ValueError, match="bands"):
        similarity.lsh_ann_topk(emb, emb, num_planes=16, bands=20, dim=2)


def test_dedup_survivors_string_ids_with_quality(spark):
    """The quality tiebreak must work for non-numeric node ids (the id
    types connected_components explicitly supports)."""
    from bigdata_commerce_spark.operators.dedup_cluster import dedup_survivors

    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c")], "id string, cluster_id string"
    )
    quality = spark.createDataFrame(
        [("a", 0.5), ("b", 0.9), ("c", 0.1)], "id string, quality double"
    )
    got = {r.cluster_id: (r.survivor_id, r.cluster_size)
           for r in dedup_survivors(clusters, quality).collect()}
    assert got == {"a": ("b", 2), "c": ("c", 1)}
    # ties -> lowest id
    q2 = spark.createDataFrame([("a", 0.5), ("b", 0.5)], "id string, quality double")
    got2 = {r.cluster_id: r.survivor_id
            for r in dedup_survivors(clusters.where(F.col("cluster_id") == "a"), q2).collect()}
    assert got2 == {"a": "a"}


def test_heavy_hitters_flat_distribution_falls_back_to_exact(spark):
    """When the 10th-heaviest key's count doesn't clear the n/(k+1)
    sketch bound (flat distribution, small k), the certification must
    fall back to the exact groupBy — output equals the plain GROUP BY
    top-N regardless of distribution."""
    from bigdata_commerce_spark.operators.sketch import heavy_hitters

    # 600 near-uniform keys, counts 5..6; k=8 -> bound = n/9 >> 6
    rows = [(i % 600,) for i in range(3300)]
    df = spark.createDataFrame(rows, "user_id long").repartition(8)
    got = [(r.user_id, r.event_count, r.rank)
           for r in heavy_hitters(df, "user_id", top_n=10, k=8).collect()]
    want = [
        (r.user_id, r.n, i + 1)
        for i, r in enumerate(
            df.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.asc("user_id")).limit(10).collect()
        )
    ]
    assert got == want
    # and the certified regime still takes the sketch path (same output)
    skewed = spark.createDataFrame(
        [(1,)] * 500 + [(2,)] * 300 + [(i,) for i in range(3, 60)], "user_id long"
    ).repartition(8)
    hh = heavy_hitters(skewed, "user_id", top_n=2, k=64).collect()
    assert [(r.user_id, r.event_count) for r in hh] == [(1, 500), (2, 300)]


def test_ngram_counts_known_values(spark):
    from bigdata_commerce_spark.operators.text import ngram_counts

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "solo")], "doc_id long, text string"
    )
    got = {r.ngram: (r.n_total, r.n_docs) for r in ngram_counts(df, n=2).collect()}
    # doc1 bigrams: ab, ba, ab ; doc2: ab, bc ; doc3: none (1 token)
    assert got == {"a b": (3, 2), "b a": (1, 1), "b c": (1, 1)}


def test_salted_join_spreads_hot_key(spark):
    """The point of the operator: the hot key's rows must land in more
    than one partition after the salted join (a plain shuffle join
    puts them all in the hot key's single reducer)."""
    from bigdata_commerce_spark.operators.salted import salted_join

    facts = spark.createDataFrame(
        [(i, 7, float(i)) for i in range(5000)], "fact_id long, k long, v double"
    )
    dim = spark.createDataFrame([(7, "hot")], "k long, label string")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE would coalesce this tiny test shuffle into one partition and
    # mask the distribution being asserted; at real scale the salted
    # partitions exceed the advisory size and stay separate
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        salted = salted_join(facts, dim, ["k"], F.xxhash64("fact_id"), 16)
        n_parts_salted = (
            salted.withColumn("p", F.spark_partition_id())
            .select("p").distinct().count()
        )
        plain = facts.join(dim, ["k"])
        n_parts_plain = (
            plain.withColumn("p", F.spark_partition_id())
            .select("p").distinct().count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev_coalesce)
    assert n_parts_plain == 1, "plain shuffle join funnels the hot key to one reducer"
    assert n_parts_salted > 4, f"salted join spread over {n_parts_salted} partitions"


def test_pack_then_shard_last_mile(spark, tmp_path):
    """The pretraining last mile composed end-to-end: token counts ->
    pack_sequences (contiguous fill) -> write_training_shards. Shard
    files are per-shard sorted, the doc order inside the shard stream
    matches the packing order, and no pack straddles a shard boundary
    unexpectedly (shards cut on document, not token, boundaries)."""
    import glob

    from bigdata_commerce_spark.sources.shards import write_training_shards

    docs = spark.createDataFrame(
        [(i, 100 + (i * 37) % 400) for i in range(240)], "doc_id long, n_tokens long"
    ).repartition(9)
    packed = pack_sequences(docs, budget=2048, bucket_width=32)
    path = str(tmp_path / "train_shards")
    num = write_training_shards(packed, path, rows_per_shard=50, order_col="doc_id")
    assert num == -(-240 // 50) == 5
    assert len(glob.glob(f"{path}/shard_id=*/part-*.parquet")) == num

    back = spark.read.parquet(path).collect()
    rows = sorted((r.shard_id, r.shard_pos, r.doc_id, r.token_start) for r in back)
    # global doc order across the shard stream == packing order
    assert [r[2] for r in rows] == sorted(r[2] for r in rows)
    # token_start is nondecreasing across the shard stream (packing
    # order preserved through the export)
    starts = [r[3] for r in rows]
    assert starts == sorted(starts)


def test_remove_frequent_lines_multiline_boilerplate(spark):
    """The CCNet mode: newline-delimited documents sharing a cookie
    banner and a footer; boilerplate lines (df >= 2) disappear, unique
    prose survives in original order, blank lines are always kept."""
    from bigdata_commerce_spark.operators.text import remove_frequent_lines

    banner = "Accept cookies to continue"
    footer = "Copyright 2026 Example Corp"
    rows = [
        (1, f"{banner}\nalpha prose one\n\nbeta prose two\n{footer}"),
        (2, f"{banner}\ngamma unique line\n{footer}"),
        (3, "totally original document\nwith two lines"),
        # whole doc is boilerplate -> empty clean_text, row preserved
        (4, f"{banner}\n{footer}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_frequent_lines(df, min_docs=2).collect()}
    assert got[1].clean_text == "alpha prose one\n\nbeta prose two"
    assert got[1].n_removed_lines == 2 and got[1].n_kept_lines == 3
    assert got[2].clean_text == "gamma unique line"
    assert got[3].clean_text == rows[2][1]
    assert got[3].n_removed_lines == 0
    assert got[4].clean_text == "" and got[4].n_kept_lines == 0
    assert got[4].n_removed_lines == 2


def test_remove_frequent_lines_normalized_matching(spark):
    """Line matching is on lower+trim — '  FOOTER ' and 'footer' are
    the same line for frequency purposes, but reassembly keeps the
    original spelling of surviving lines."""
    from bigdata_commerce_spark.operators.text import remove_frequent_lines

    rows = [
        (1, "  FOOTER \nkeep me A"),
        (2, "footer\nkeep me B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_frequent_lines(df, min_docs=2).collect()}
    assert got[1].clean_text == "keep me A"
    assert got[2].clean_text == "keep me B"
    assert got[1].n_removed_lines == got[2].n_removed_lines == 1


def test_cap_per_source_quota_and_determinism(spark):
    """cap_per_source keeps exactly min(quota, n_s) rows per source,
    picks a partitioning-independent subset, and nests: the quota-5
    selection is a prefix of the quota-10 selection per source."""
    from bigdata_commerce_spark.operators.mixing import cap_per_source

    rows = [(i, f"src{i % 3}") for i in range(60)] + [(100, "rare")]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    got10 = cap_per_source(df, 10)
    per_src = {r.source: r.n for r in got10.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per_src == {"src0": 10, "src1": 10, "src2": 10, "rare": 1}

    got5 = {(r.source, r.doc_id) for r in cap_per_source(df, 5).collect()}
    top10 = {(r.source, r.doc_id) for r in got10.where(F.col("source_rank") <= 5).collect()}
    assert got5 == top10

    # partitioning independence: same selection from a 1-partition copy
    one = {(r.source, r.doc_id) for r in cap_per_source(df.coalesce(1), 5).collect()}
    assert one == got5


def test_remove_frequent_lines_null_text_and_literal_delimiter(spark):
    """NULL text keeps its output row (as ''), and a regex-metachar
    delimiter is treated literally."""
    from bigdata_commerce_spark.operators.text import remove_frequent_lines

    rows = [(1, "a.b.a"), (2, None), (3, "b.c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in remove_frequent_lines(df, min_docs=2, delimiter=".").collect()}
    assert set(got) == {1, 2, 3}
    # 'b' appears in docs 1 and 3 -> boilerplate; 'a'/'c' survive
    assert got[1].clean_text == "a.a" and got[1].n_removed_lines == 1
    assert got[3].clean_text == "c"
    assert got[2].clean_text == "" and got[2].n_removed_lines == 0


def test_fill_gaps_locf_crafted(spark):
    """Gap semantics on a crafted series: carries through holes,
    restarts per key, marks observed vs filled, last-obs-per-bucket
    tiebreak."""
    from bigdata_commerce_spark.operators.timeseries import fill_gaps_locf

    rows = [
        # key 1: buckets 10, 13 observed -> 11, 12 filled with 5.0
        (1, 10 * 60, 5.0),
        (1, 13 * 60, 9.0),
        # same bucket twice: later ts wins
        (1, 13 * 60 + 30, 7.0),
        # key 2: single observation -> single grid row
        (2, 40 * 60, 1.5),
    ]
    df = spark.createDataFrame(rows, "k long, sec long, v double").select(
        "k", F.col("sec").cast("timestamp").alias("ts"), "v"
    )
    out = fill_gaps_locf(df, bucket_seconds=60, key_col="k", ts_col="ts", value_col="v")
    got = {(r.k, r.bucket): (r.value, r.is_observed) for r in out.collect()}
    assert got[(1, 10)] == (5.0, True)
    assert got[(1, 11)] == (5.0, False)
    assert got[(1, 12)] == (5.0, False)
    assert got[(1, 13)] == (7.0, True)  # later timestamp wins the bucket
    assert got[(2, 40)] == (1.5, True)
    assert len(got) == 5


def test_similarity_join_cross_table(spark):
    """Cross-table fuzzy match equals the naive per-pair Jaccard, and
    same-side near-dups never leak into the output."""
    from bigdata_commerce_spark.operators.dedup import similarity_join

    left = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "one two three four five six"),
        (3, "alpha beta gamma delta epsilon zeta"),  # same-side dup of 1
    ]
    right = [
        (10, "alpha beta gamma delta epsilon zeta eta"),  # near 1 and 3
        (11, "totally different text with no overlap here"),
        (12, "one two three four five six"),  # exact of 2
    ]
    ldf = spark.createDataFrame(left, "doc_id long, text string")
    rdf = spark.createDataFrame(right, "doc_id long, text string")
    got = {
        (r.left_id, r.right_id): r.jaccard
        for r in similarity_join(ldf, rdf, threshold=0.5).collect()
    }
    # naive reference
    def sh(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = {}
    for li, lt in left:
        for ri, rt in right:
            a, b = sh(lt), sh(rt)
            j = len(a & b) / len(a | b)
            if j >= 0.5:
                want[(li, ri)] = round(j, 4)
    assert got == want
    assert (1, 10) in got and (2, 12) in got
    assert all(k[0] in {1, 2, 3} and k[1] in {10, 11, 12} for k in got)


def test_shuffled_index_is_permutation_and_partition_independent(spark):
    """The shuffled index is a dense permutation of 0..n-1, stable
    across partitionings, different from the sorted order, and a new
    salt draws a different permutation."""
    from bigdata_commerce_spark.sources.shards import with_shuffled_index

    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    a = {r.doc_id: r.idx for r in with_shuffled_index(df).collect()}
    assert sorted(a.values()) == list(range(300))
    b = {r.doc_id: r.idx for r in with_shuffled_index(df.repartition(7)).collect()}
    assert a == b
    assert [a[i] for i in range(300)] != list(range(300))  # actually shuffled
    c = {r.doc_id: r.idx for r in with_shuffled_index(df, salt="other").collect()}
    assert sorted(c.values()) == list(range(300)) and c != a


def test_flag_anomalies_crafted(spark):
    """Known z-scores: a 10-sigma-ish spike flags, normal points do
    not, and degenerate keys (single point, zero variance) return
    NULL z / false rather than dividing by zero."""
    from bigdata_commerce_spark.operators.timeseries import flag_anomalies

    rows = (
        [(1, b, 10.0) for b in range(9)] + [(1, 9, 100.0)]  # spike
        + [(2, 0, 5.0)]                                       # single point
        + [(3, b, 7.0) for b in range(4)]                     # zero variance
    )
    df = spark.createDataFrame(rows, "series_id long, bucket long, value double")
    # the spike's z is (100-19)/sd_samp = 2.846 — use a 2.5 threshold
    got = {(r.series_id, r.bucket): r for r in flag_anomalies(df, z_threshold=2.5).collect()}
    assert got[(1, 9)].is_anomaly and got[(1, 9)].z > 2.5
    assert not got[(1, 0)].is_anomaly
    assert got[(2, 0)].z is None and not got[(2, 0)].is_anomaly
    assert got[(3, 2)].z is None and not got[(3, 2)].is_anomaly
    assert len(got) == len(rows)


def test_psi_detects_planted_shift(spark):
    """PSI verdicts behave: identical distributions ~0, a hard shift
    large; bins are equi-depth on the reference; empty bins survive
    via the epsilon floor instead of NaN/inf."""
    from bigdata_commerce_spark.operators import drift

    ref = spark.range(0, 4000).select((F.col("id") % 100).cast("double").alias("v"))
    same = drift.psi_report(ref, ref, "v", n_bins=10)
    rows = same.collect()
    assert rows[0].psi_total == 0.0
    assert len(rows) == 10
    # shifted: all current mass in the top decile
    cur = spark.range(0, 1000).select((F.lit(99.0)).alias("v"))
    shifted = drift.psi_report(ref, cur, "v", n_bins=10).collect()
    assert shifted[0].psi_total > 1.0
    terms = {r.bin: r for r in shifted}
    assert all(t.psi_term is not None for t in terms.values())  # eps floor worked
    assert terms[9].cur_share == 1.0

    bounds = drift.equi_depth_boundaries(ref, "v", 4)
    assert len(bounds) == 3
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_bins"):
        drift.equi_depth_boundaries(ref, "v", 1)
    with _pytest.raises(ValueError, match="empty"):
        drift.equi_depth_boundaries(ref.limit(0), "v", 4)


def test_rate_cap_keeps_earliest_per_bucket(spark):
    from bigdata_commerce_spark.operators.mixing import rate_cap_per_key_bucket

    rows = [(i, 1, float(3600 * (i // 5) + i)) for i in range(10)]  # 2 hours x 5
    df = spark.createDataFrame(rows, "event_id long, user_id long, sec double").select(
        "event_id", "user_id", F.col("sec").cast("timestamp").alias("ts")
    )
    got = sorted(
        r.event_id for r in rate_cap_per_key_bucket(df, 2, 3600).collect()
    )
    assert got == [0, 1, 5, 6]  # earliest 2 of each hour bucket


def test_flag_anomalies_null_key_rows_survive(spark):
    from bigdata_commerce_spark.operators.timeseries import flag_anomalies

    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 1, 2.0), (None, 0, 9.0)],
        "series_id long, bucket long, value double",
    )
    got = flag_anomalies(df).collect()
    assert len(got) == 3  # NULL-key row kept, not dropped by the join
    nk = [r for r in got if r.series_id is None][0]
    assert nk.z is None and nk.is_anomaly is False


def test_rate_cap_tolerates_map_columns(spark):
    from bigdata_commerce_spark.operators.mixing import rate_cap_per_key_bucket

    df = spark.createDataFrame(
        [(1, 1, 10.0, {"a": "b"}), (2, 1, 20.0, {"c": "d"})],
        "event_id long, user_id long, sec double, props map<string,string>",
    ).select("event_id", "user_id", F.col("sec").cast("timestamp").alias("ts"), "props")
    got = rate_cap_per_key_bucket(df, 1, 3600)
    assert [r.event_id for r in got.collect()] == [1]  # earliest kept, no crash


def test_assign_bins_refuses_collision(spark):
    from bigdata_commerce_spark.operators import drift

    df = spark.createDataFrame([(1.0, 5)], "v double, bin int")
    with pytest.raises(ValueError, match="already exists"):
        drift.assign_bins(df, "v", [0.5])
    out = drift.assign_bins(df, "v", [0.5], bin_col="vbin")
    assert out.collect()[0].vbin == 1


def test_psi_empty_current_is_loud_not_null(spark):
    from bigdata_commerce_spark.operators import drift

    ref = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    rows = drift.psi_report(ref, ref.limit(0), "v", n_bins=4).collect()
    assert all(r.cur_share == 0.0 for r in rows)
    assert rows[0].psi_total > 1.0  # epsilon floor drives the verdict loud


def test_running_sum_bucketed_equals_exact(spark):
    """The skew-bounded two-level prefix-sum running sum must be
    bit-identical to the exact window across bucket widths, including
    NULL values mid-stream, leading NULLs, NULL timestamps, and
    tied timestamps broken by the id column."""
    from datetime import datetime, timedelta

    from bigdata_commerce_spark.operators.running import running_sum_per_key

    t = lambda m: datetime(2024, 1, 1) + timedelta(minutes=m)
    rows = [
        # user 1: leading NULL value, a mid-stream NULL, a ts tie
        (1, 1, t(0), None),
        (2, 1, t(10), 5.0),
        (3, 1, t(10), 2.0),  # tie with event 2 -> tiebreak on id
        (4, 1, t(200), None),
        (5, 1, t(400), 1.5),
        # user 2: NULL ts first (runs before everything, stays NULL)
        (6, 2, None, 9.0),
        (7, 2, t(5), 1.0),
        # user 3: all-NULL values -> running sum NULL throughout
        (8, 3, t(1), None),
        (9, 3, t(2), None),
        # NULL user: exact path windows it like any key; bucketized
        # join-back must be null-safe to keep (and sum) these rows
        (10, None, t(0), 2.0),
        (11, None, t(90), 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )

    def run(bucket):
        out = running_sum_per_key(
            df, "user_id", "ts", "value", "rs",
            bucket_seconds=bucket, tiebreak_col="event_id",
        )
        return sorted(
            (r.event_id, None if r.rs is None else float(r.rs))
            for r in out.collect()
        )

    exact = run(None)
    assert exact == [
        (1, None), (2, 5.0), (3, 7.0), (4, 7.0), (5, 8.5),
        (6, 9.0), (7, 10.0), (8, None), (9, None),
        (10, 2.0), (11, 5.0),
    ]
    for b in (60, 3600, 86400):
        assert run(b) == exact, f"bucket_seconds={b} diverged"


def test_running_sum_keeps_8dp_precision(spark):
    """The bucketized add must not demote decimal scale: 8-dp inputs
    (3e-8 + 4e-8) sum to exactly 7e-8 on BOTH paths, with identical
    decimal(38,8) output types — the (38,8)+(38,8) -> (38,7) Spark
    demotion the narrowed partials exist to avoid."""
    from datetime import datetime, timedelta

    from bigdata_commerce_spark.operators.running import running_sum_per_key

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, 1, t0, 3e-8), (2, 1, t0 + timedelta(hours=2), 4e-8)],
        "event_id long, user_id long, ts timestamp, value double",
    )

    def run(bucket):
        out = running_sum_per_key(
            df, "user_id", "ts", "value", "rs",
            bucket_seconds=bucket, tiebreak_col="event_id",
        )
        return out.schema["rs"].dataType.simpleString(), {
            r.event_id: float(r.rs) for r in out.collect()
        }

    exact_type, exact_vals = run(None)
    buck_type, buck_vals = run(3600)  # rows land in different buckets
    assert exact_type == buck_type == "decimal(38,8)"
    assert exact_vals == buck_vals == {1: 3e-8, 2: 7e-8}


def test_bm25_ranking_properties(spark):
    """Crafted corpus pins the ranking laws: higher tf wins at equal
    length, rarer terms out-score common ones (idf), longer documents
    are penalized at equal tf (length normalization), and documents
    with no query term are absent."""
    from bigdata_commerce_spark.operators.bm25 import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark pad"),   # tf=3
            (2, "spark pad pad pad"),       # tf=1, same length as 1
            (3, "rare pad pad pad"),        # rare term, same shape as 2
            (4, "spark " + "pad " * 99),    # tf=1, much longer
            (5, "nothing relevant here"),
        ],
        "doc_id long, text string",
    )
    scores = {
        r.doc_id: r.bm25
        for r in bm25_scores(docs, ["spark", "rare"]).collect()
    }
    assert set(scores) == {1, 2, 3, 4}
    assert scores[1] > scores[2]          # tf monotonicity
    assert scores[3] > scores[2]          # rarer term -> higher idf
    assert scores[2] > scores[4]          # length normalization
    assert all(v > 0 for v in scores.values())
    with pytest.raises(ValueError, match="at least one query term"):
        bm25_scores(docs, [])


def test_quantize_roundtrip_error_bound(spark):
    """Dequantized components differ from the originals by at most
    scale/2 (+ float eps); the zero vector round-trips to zeros."""
    import random

    from bigdata_commerce_spark.operators.quantize import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    rng = random.Random(5)
    rows = [
        (i, [rng.uniform(-3, 3) for _ in range(16)]) for i in range(40)
    ] + [(99, [0.0] * 16)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    orig = {r.vec_id: r.embedding for r in df.collect()}  # post-float32 values
    q = quantize_embeddings(df)
    scales = {r.vec_id: r.qscale for r in q.select("vec_id", "qscale").collect()}
    back = {r.vec_id: r.embedding for r in dequantize_embeddings(q).collect()}
    for vid, vec in orig.items():
        s = scales[vid]
        for a, b in zip(vec, back[vid]):
            assert abs(a - b) <= s / 2 + 1e-5, (vid, a, b, s)
    assert back[99] == [0.0] * 16 and scales[99] == 0.0


def test_quantized_search_preserves_topk_recall(spark):
    """Exact cosine top-10 over the DEQUANTIZED corpus must recover
    most of the true top-10 — int8 with per-vector scaling loses
    little ranking fidelity (the property that makes the 4x-smaller
    store usable for search)."""
    from bigdata_commerce_spark.operators.quantize import (
        dequantize_embeddings,
        quantize_embeddings,
    )
    from bigdata_commerce_spark.operators.similarity import cosine_topk
    from bigdata_commerce_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, "embeddings", SF_SMOKE)
    probes = emb.where(F.col("vec_id") < 5)
    deq = dequantize_embeddings(quantize_embeddings(emb))

    def topk(corpus):
        return {
            (r.probe_id, r.corpus_id)
            for r in cosine_topk(corpus, probes, k=10).collect()
        }

    exact, quant = topk(emb), topk(deq)
    recall = len(exact & quant) / len(exact)
    assert recall >= 0.8, f"recall = {recall}"


def test_lm_quality_separates_gibberish_from_prose(spark):
    """Trained on clean prose, reference-like documents must score a
    lower mean NLL than alphabet-soup gibberish; unseen bigrams route
    through the catch-all bucket (not NULL); sub-2-char docs are
    absent (no bigrams, no defined score)."""
    from bigdata_commerce_spark.operators.lm_quality import char_bigram_nll

    prose = "the quick brown fox jumps over the lazy dog and then the "
    reference = spark.createDataFrame(
        [(i, prose * 3) for i in range(10)], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the brown dog jumps over the fox"),   # reference-like
            (2, "zq xv jj qq wz vx kk zz qx vj"),      # gibberish, unseen bigrams
            (3, "x"),                                   # too short: absent
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in char_bigram_nll(docs, reference=reference).collect()}
    assert set(out) == {1, 2}
    assert out[1].nll < out[2].nll
    assert out[1].nll is not None and out[2].nll is not None
    assert out[1].n_bigrams == len("the brown dog jumps over the fox") - 1


def test_lm_quality_degenerate_reference_scores_not_empty(spark):
    """A reference with no trainable text (all sub-2-char docs) yields
    the 1-outcome model: every bigram scores through the catch-all
    bucket (logp 0 -> nll 0.0) — NOT an empty output silently
    dropping every document."""
    from bigdata_commerce_spark.operators.lm_quality import char_bigram_nll

    docs = spark.createDataFrame(
        [(1, "real text here")], "doc_id long, text string"
    )
    empty_ref = spark.createDataFrame(
        [(9, "x"), (10, "")], "doc_id long, text string"
    )
    rows = char_bigram_nll(docs, reference=empty_ref).collect()
    assert len(rows) == 1
    assert rows[0].doc_id == 1 and rows[0].nll == 0.0


def test_validate_mean_in_range_survives_huge_and_nan(spark):
    """mean_in_range must stay total over any numeric column — no
    ANSI crash on values decimal(38,6) can't hold (>=1e32, NaN) and
    no silent sample shrinkage: a non-representable value FAILS the
    check (a range gate must not pass by dropping exactly the
    pathology it exists to catch), while the co-compiled checks keep
    reporting."""
    from bigdata_commerce_spark.operators import validate as V

    bad = spark.createDataFrame(
        [(2.0e12,), (4.0e12,), (float("nan"),), (1.0e33,)], "x double"
    )
    rep = {r.check_name: r for r in V.validate(
        bad, [V.mean_in_range("x", 2.5e12, 3.5e12), V.not_null("x")]
    ).collect()}
    assert rep["mean_in_range(x)"].passed is False  # pathology fails loud
    assert rep["not_null(x)"].passed is True  # shared aggregate survived

    # clean large-magnitude values still verdict on the exact mean
    ok = spark.createDataFrame([(2.0e12,), (4.0e12,)], "x double")
    rep2 = V.validate(ok, [V.mean_in_range("x", 2.5e12, 3.5e12)]).collect()[0]
    assert rep2.passed is True

    # sum overflow (each value representable, sum past decimal(38,6))
    # -> check fails, aggregate does not crash
    over = spark.createDataFrame([(9.0e31,), (9.0e31,)], "x double")
    rep3 = {r.check_name: r for r in V.validate(
        over, [V.mean_in_range("x", 0, 1e33), V.not_null("x")]
    ).collect()}
    assert rep3["mean_in_range(x)"].passed is False
    assert rep3["not_null(x)"].passed is True


def test_multimodal_real_mode_null_content_is_absent_media(spark):
    """NULL content (failed fetch) must yield NULL features / NULL
    resize fingerprint / zero frames in real mode — never a CodecError
    that kills the batch."""
    import numpy as np

    from bigdata_commerce_spark.operators import multimodal
    from bigdata_commerce_spark.operators.codecs import encode_bmp

    img = encode_bmp(np.full((2, 2, 3), 7, dtype=np.uint8))
    media = spark.createDataFrame(
        [(0, bytearray(img), None), (1, None, None)],
        multimodal.MEDIA_SCHEMA,
    )
    feats = {r.media_id: r for r in multimodal.extract_features(media, decode="real").collect()}
    assert feats[0].features is not None and feats[1].features is None
    # absent media -> NULL n_bytes/sha (absent != 0-byte payload)
    assert feats[1].n_bytes is None and feats[1].content_sha is None
    rs = {r.media_id: r for r in multimodal.resize_media(media, 2, 2, decode="real").collect()}
    assert rs[0].resized_sha is not None and rs[1].resized_sha is None
    frames = multimodal.frame_sample(media, n_frames=3, decode="real").collect()
    assert {r.media_id for r in frames} == {0} and len(frames) == 3


def test_bm25_precomputed_stats_matches_inline(spark):
    """Passing snapshot-level n_docs/avgdl (the one-scan production
    path) must reproduce the inline two-pass scores exactly."""
    from bigdata_commerce_spark.operators.bm25 import bm25_scores
    from bigdata_commerce_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, "documents", SF_SMOKE)
    toks = docs.select(
        F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")).alias("dl")
    )
    n, avgdl = toks.agg(F.count(F.lit(1)), F.avg("dl")).collect()[0]
    inline = sorted(map(tuple, bm25_scores(docs, ["spark", "join"]).collect()))
    precomp = sorted(map(tuple, bm25_scores(
        docs, ["spark", "join"], n_docs=n, avgdl=avgdl
    ).collect()))
    assert inline == precomp and inline
    with pytest.raises(ValueError, match="both n_docs and avgdl"):
        bm25_scores(docs, ["spark"], n_docs=10)


def test_psi_report_bin_stays_int(spark):
    """The eager ref-share materialization must preserve the public
    report schema — bin is IntegerType, not inference-widened long."""
    from pyspark.sql.types import IntegerType

    from bigdata_commerce_spark.operators import drift

    ref = spark.range(0, 100).select(F.col("id").cast("double").alias("v"))
    rep = drift.psi_report(ref, ref, "v", n_bins=4)
    assert rep.schema["bin"].dataType == IntegerType()


def test_retrieval_curation_pipeline_last_mile(spark, tmp_path):
    """The round-5 operators composed end to end, one engine: LM
    quality scoring + BM25 topical relevance gate the corpus, the
    survivors' embeddings are int8-quantized and published as a
    partition-pruned IVF index, and a search over the index returns
    only curated documents with sane cosine scores."""
    from bigdata_commerce_spark.operators.bm25 import bm25_scores
    from bigdata_commerce_spark.operators.ivf_index import (
        search_ivf_index,
        write_ivf_index,
    )
    from bigdata_commerce_spark.operators.lm_quality import char_bigram_nll
    from bigdata_commerce_spark.operators.quantize import (
        dequantize_embeddings,
        quantize_embeddings,
    )
    from bigdata_commerce_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, "documents", SF_SMOKE)
    emb = load_table(spark, "embeddings", SF_SMOKE)

    # Gate 1: self-perplexity — drop the most alien half
    nll = char_bigram_nll(docs)
    cutoff = nll.agg(F.expr("percentile(nll, 0.5)")).collect()[0][0]
    fluent = nll.where(F.col("nll") <= cutoff).select("doc_id")
    # Gate 2: topical relevance — must match the query at all
    relevant = bm25_scores(docs, ["spark", "shuffle", "join"]).select("doc_id")
    kept = fluent.join(relevant, "doc_id", "inner")
    n_kept = kept.count()
    assert 0 < n_kept < docs.count()

    # Quantize the curated slice's embeddings, publish the IVF index
    # over the DEQUANTIZED vectors (the 4x-smaller store)
    curated_vecs = emb.join(
        kept.withColumnRenamed("doc_id", "vec_id"), "vec_id", "inner"
    )
    deq = dequantize_embeddings(quantize_embeddings(curated_vecs))
    idx = str(tmp_path / "ivf")
    write_ivf_index(deq.select("vec_id", "embedding"), idx, n_centroids=8)

    probes = emb.where(F.col("vec_id") < 3)
    hits = search_ivf_index(spark, idx, probes, k=5, nprobe=4).collect()
    assert hits
    kept_ids = {r.vec_id for r in curated_vecs.select("vec_id").collect()}
    assert {r.corpus_id for r in hits} <= kept_ids  # only curated docs
    assert all(-1.0001 <= r.score <= 1.0001 for r in hits)  # cosine range


def test_tokenizer_pipeline_end_to_end(spark):
    """The tokenizer loop composed end to end, one engine: BPE merge
    rules TRAINED on the corpus's own word-frequency table
    (operators/bpe.py), the corpus encoded with them, and
    pack_sequences packing the REAL token counts under a budget —
    closing the train-tokenizer -> count -> pack chain that token
    budgets and mixture math depend on."""
    from bigdata_commerce_spark.operators import bpe
    from bigdata_commerce_spark.operators.packing import pack_sequences
    from bigdata_commerce_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, "documents", SF_SMOKE)
    merges = bpe.train_bpe(bpe.word_frequencies(docs), 12)
    assert len(merges) == 12

    enc = bpe.encode_tokens(docs, merges).withColumn(
        "n_tokens", F.size("bpe_tokens")
    )
    # merges compressed the corpus vs character-level + EOW
    char_level = docs.select(
        F.sum(
            F.length(F.lower("text")) - F.length(F.regexp_replace(F.lower("text"), r"\S", ""))
            + F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != ""))
        )
    ).collect()[0][0]
    bpe_total = enc.agg(F.sum("n_tokens")).collect()[0][0]
    assert 0 < bpe_total < char_level

    packed = pack_sequences(
        enc.select("doc_id", "n_tokens"), budget=512, bucket_width=128
    )
    assert packed.count() == docs.count()  # every doc packed once
    # token_start is the exact running sum of n_tokens in doc_id order
    rows = sorted(
        (r.doc_id, r.n_tokens, r.token_start) for r in packed.collect()
    )
    running = 0
    for _, n, start in rows:
        assert start == running
        running += n
    assert running == bpe_total


def test_canonical_per_cluster_string_ids(spark):
    """String ids must work (the tiebreak never negates the id) —
    largest order wins, ties break to the SMALLEST id."""
    from bigdata_commerce_spark.operators.dedup_cluster import canonical_per_cluster

    clusters = spark.createDataFrame(
        [("b", 1), ("a", 1), ("c", 1), ("z", 2)],
        "doc_id string, cluster_id long",
    )
    docs = spark.createDataFrame(
        [("a", 10), ("b", 10), ("c", 5), ("z", 1)], "doc_id string, n_chars long"
    )
    got = {
        r["cluster_id"]: (r["doc_id"], r["n_members"])
        for r in canonical_per_cluster(clusters, docs).collect()
    }
    assert got == {1: ("a", 3), 2: ("z", 1)}


def test_random_projection_preserves_distances_in_expectation(spark):
    """JL property sanity on real corpus vectors: for sampled pairs,
    the projected L2 distance is within a loose band of the original
    (16 dims -> generous tolerance), plan stays shuffle-free, and
    out_dim/round_dp contracts hold."""
    import math

    import pytest

    from bigdata_commerce_spark.operators.similarity import random_projection
    from bigdata_commerce_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, "embeddings", SF_SMOKE).limit(40)
    proj = random_projection(emb, round_dp=None)
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure projection

    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    projs = {r["vec_id"]: r["projected"] for r in proj.collect()}
    ids = sorted(vecs)[:10]
    ratios = []
    for a in ids:
        for b in ids:
            if a >= b:
                continue
            d0 = math.dist(vecs[a], vecs[b])
            d1 = math.dist(projs[a], projs[b])
            if d0 > 0:
                ratios.append(d1 / d0)
    mean = sum(ratios) / len(ratios)
    assert 0.6 < mean < 1.4          # unbiased in expectation
    assert all(0.2 < r < 2.5 for r in ratios)  # no catastrophic pair

    assert len(next(iter(projs.values()))) == 16
    with pytest.raises(ValueError):
        random_projection(emb, out_dim=0)


def test_split_by_group_purity_null_and_determinism(spark):
    """Every group lands wholly in one split; NULL groups form their
    own group (no dropped rows); assignment is a pure function of the
    group key (rerun- and partitioning-stable)."""
    from pyspark.sql import functions as F

    from bigdata_commerce_spark.operators.mixing import split_by_group

    rows = [(i, f"dom{i % 9}" if i % 10 else None) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = split_by_group(df, 0.4, "grp")
    assert out.count() == 200  # NULLs kept
    impure = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("n"))
        .where(F.col("n") > 1)
        .count()
    )
    assert impure == 0
    a = sorted((r.doc_id, r.split) for r in out.collect())
    b = sorted(
        (r.doc_id, r.split)
        for r in split_by_group(df.repartition(7, "doc_id"), 0.4, "grp").collect()
    )
    assert a == b
    # boundary fractions
    all_test = split_by_group(df, 1.0, "grp")
    assert all_test.where(F.col("split") != "test").count() == 0
    none_test = split_by_group(df, 0.0, "grp")
    assert none_test.where(F.col("split") != "train").count() == 0


def test_tfidf_top_terms_matches_hand_computation(spark):
    """Three-doc corpus: shared terms get low idf, unique terms rank
    first; ties break by term text; k truncates per doc."""
    import math

    from bigdata_commerce_spark.operators.text import tfidf_top_terms

    docs = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "durian"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.term, r.tfidf, r.rank)
        for r in tfidf_top_terms(df, k=2).collect()
    )

    def idf(dfreq):
        return math.log((3 + 1) / (dfreq + 1)) + 1

    expected = sorted(
        [
            (1, "apple", round(2 / 3 * idf(1), 6), 1),
            (1, "banana", round(1 / 3 * idf(2), 6), 2),
            (2, "cherry", round(1 / 2 * idf(1), 6), 1),
            (2, "banana", round(1 / 2 * idf(2), 6), 2),
            (3, "durian", round(1 * idf(1), 6), 1),
        ]
    )
    assert got == expected


def test_tfidf_ties_break_by_term_and_empty_docs_vanish(spark):
    from bigdata_commerce_spark.operators.text import tfidf_top_terms

    df = spark.createDataFrame(
        [(1, "zeta alpha"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    got = [(r.term, r.rank) for r in
           tfidf_top_terms(df, k=2).orderBy("rank").collect()]
    # equal tf and df -> equal score -> alphabetical order decides
    assert got == [("alpha", 1), ("zeta", 2)]


def test_mine_hard_negatives_excludes_positives_before_ranking(spark):
    """Positives must not eat top-k slots: with k=2 and the single
    best match labeled positive, the 2nd and 3rd best surface."""
    from bigdata_commerce_spark.operators.similarity import mine_hard_negatives

    # 2-d vectors with known cosine order vs the probe (1, 0)
    corpus = [
        (1, [1.0, 0.0]),    # identical -> best, but labeled positive
        (2, [0.9, 0.1]),    # 2nd
        (3, [0.5, 0.5]),    # 3rd
        (4, [0.0, 1.0]),    # orthogonal
        (10, [1.0, 0.05]),  # the query itself, also labeled positive
    ]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    q = cdf.where("vec_id = 10")
    pos = spark.createDataFrame(
        [(10, 1), (10, 10)], "query_id long, pos_id long"
    )
    got = [(r.neg_id, r.rank) for r in
           mine_hard_negatives(cdf, q, pos, k=2)
           .orderBy("rank").collect()]
    assert got == [(2, 1), (3, 2)]


def test_mine_hard_negatives_empty_positive_set_is_plain_topk(spark):
    from bigdata_commerce_spark.operators.similarity import mine_hard_negatives

    corpus = [(i, [float(i), 1.0]) for i in range(1, 6)]
    cdf = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    q = cdf.where("vec_id = 5")
    pos = spark.createDataFrame([], "query_id long, pos_id long")
    got = [r.neg_id for r in
           mine_hard_negatives(cdf, q, pos, k=3).orderBy("rank").collect()]
    # self scores cosine 1.0 exactly (not excluded unless labeled —
    # the caller owns the positive set), then 4, then 3
    assert got == [5, 4, 3]


def test_next_event_examples_crafted_and_partition_independent(spark):
    import datetime as dt

    from bigdata_commerce_spark.operators.seqpairs import next_event_examples

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a b c d e -> 2 full-context examples at L=3
        *[
            (i, t0 + dt.timedelta(minutes=i), 1, e, 0.0, "{}")
            for i, e in enumerate("a b c d e".split())
        ],
        # user 2: exactly 3 events -> nothing (needs L+1)
        *[
            (10 + i, t0 + dt.timedelta(minutes=i), 2, e, 0.0, "{}")
            for i, e in enumerate("x y z".split())
        ],
        # user 3: NULL ts excluded -> only 3 positioned events -> nothing
        (20, None, 3, "q", 0.0, "{}"),
        *[
            (21 + i, t0 + dt.timedelta(minutes=i), 3, e, 0.0, "{}")
            for i, e in enumerate("m n o".split())
        ],
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = sorted(
        (r.user_id, r.target_idx, tuple(r.context), r.target)
        for r in next_event_examples(df, context_len=3).collect()
    )
    assert got == [
        (1, 3, ("a", "b", "c"), "d"),
        (1, 4, ("b", "c", "d"), "e"),
    ]
    again = sorted(
        (r.user_id, r.target_idx, tuple(r.context), r.target)
        for r in next_event_examples(
            df.repartition(5, "event_type"), context_len=3
        ).collect()
    )
    assert again == got


def test_next_event_examples_tiebreak_orders_equal_timestamps(spark):
    import datetime as dt

    from bigdata_commerce_spark.operators.seqpairs import next_event_examples

    t = dt.datetime(2024, 6, 1)
    rows = [(i, t, 1, e, 0.0, "{}") for i, e in enumerate("p q r s".split())]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = [
        (r.target_idx, tuple(r.context), r.target)
        for r in next_event_examples(df, context_len=2)
        .orderBy("target_idx")
        .collect()
    ]
    # all four share a timestamp: event_id decides the total order
    assert got == [(2, ("p", "q"), "r"), (3, ("q", "r"), "s")]


def test_embedding_centroid_drift_crafted(spark):
    """Identical sides -> cosine 1, shift 0; a rotated group shows
    up; one-sided groups report NULLs rather than vanishing."""
    from bigdata_commerce_spark.operators.drift import embedding_centroid_drift

    ref = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]), ("a", [1.0, 0.0]),
            ("b", [0.0, 2.0]),
            ("only_ref", [3.0, 4.0]),
        ],
        "label string, embedding array<double>",
    )
    cur = spark.createDataFrame(
        [
            ("a", [1.0, 0.0]),               # unchanged
            ("b", [2.0, 0.0]),               # rotated 90 degrees
            ("only_cur", [1.0, 1.0]),
        ],
        "label string, embedding array<double>",
    )
    got = {r.label: r for r in embedding_centroid_drift(ref, cur).collect()}
    assert set(got) == {"a", "b", "only_ref", "only_cur"}
    assert got["a"].n_ref == 2 and got["a"].n_cur == 1
    assert got["a"].centroid_cosine == 1.0 and got["a"].l2_shift == 0.0
    assert got["b"].centroid_cosine == 0.0       # orthogonal centroids
    assert got["b"].l2_shift == round((4 + 4) ** 0.5, 6)
    assert got["only_ref"].centroid_cosine is None
    assert got["only_ref"].n_cur is None
    assert got["only_cur"].l2_shift is None


def test_curation_funnel_reconciles_with_curate(spark):
    """Funnel totals must reconcile with the operators they narrate:
    sum(n_unique) == curate() row count, and the stage counts are
    monotone non-increasing."""
    from bigdata_commerce_spark.operators.text import curate, curation_funnel
    from bigdata_commerce_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001")
    funnel = curation_funnel(docs).collect()
    assert sum(r.n_unique for r in funnel) == curate(docs).count()
    for r in funnel:
        assert r.n_raw >= r.n_quality >= r.n_quality_lang >= 0
        # n_unique counts canonical SURVIVORS attributed to this
        # source; it can exceed n_quality_lang only if another
        # source's duplicates collapsed here — with distinct synthetic
        # texts per source it must not exceed the gate count
        assert r.n_unique <= r.n_quality_lang


def test_upsample_epochs_expectation_nesting_and_determinism(spark):
    from bigdata_commerce_spark.operators.mixing import upsample_epochs

    rows = [(i, "a" if i % 2 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    out = upsample_epochs(df, {"a": 2.5, "b": 0.3})
    per = {r.source: r.cnt for r in
           out.groupBy("source").count().withColumnRenamed("count", "cnt").collect()}
    # expectation: a -> 1000*2.5, b -> 1000*0.3; hash draw ~ binomial
    assert 2300 <= per["a"] <= 2700
    assert 200 <= per["b"] <= 400
    # integer epochs are unconditional: every 'a' doc appears at
    # epochs 0 and 1
    from pyspark.sql import functions as F
    full = out.where("source = 'a' and epoch < 2").groupBy("doc_id").count()
    assert full.where("count != 2").count() == 0

    # nesting: raising a factor only ADDS copies
    small = {(r.doc_id, r.epoch) for r in
             upsample_epochs(df, {"a": 1.2}).where("source='a'").collect()}
    big = {(r.doc_id, r.epoch) for r in
           upsample_epochs(df, {"a": 1.7}).where("source='a'").collect()}
    assert small <= big

    # determinism across partitionings
    a = sorted((r.doc_id, r.epoch) for r in
               upsample_epochs(df, {"a": 2.5, "b": 0.3}).collect())
    b = sorted((r.doc_id, r.epoch) for r in
               upsample_epochs(df.repartition(17, "doc_id"),
                               {"a": 2.5, "b": 0.3}).collect())
    assert a == b

    # factor 0 drops; negative rejected
    assert upsample_epochs(df, {"a": 0.0}).where("source='a'").count() == 0
    import pytest as _pytest
    with _pytest.raises(ValueError, match=">= 0"):
        upsample_epochs(df, {"a": -1.0})


def test_scd2_join_point_in_time_semantics(spark):
    """Facts pick the version current AT THEIR TIME: before the first
    version -> NULL dims; between changes -> v1; after the last
    change -> the open-ended v2. Exactly one version matches any
    instant. Duplicate change times are rejected."""
    import datetime as dt

    import pytest as _pytest

    from bigdata_commerce_spark.operators.scd2 import changes_to_scd2, scd2_join

    d = dt.date
    chg = spark.createDataFrame(
        [
            (1, d(2020, 1, 1), "bronze"),
            (1, d(2021, 1, 1), "gold"),
            (2, d(2020, 6, 1), "silver"),
        ],
        "cust long, ts date, tier string",
    )
    dim = changes_to_scd2(chg, ["cust"], "ts")
    rows = {(r.cust, r.valid_from): r.valid_to for r in dim.collect()}
    assert rows[(1, d(2020, 1, 1))] == d(2021, 1, 1)
    assert rows[(1, d(2021, 1, 1))] is None
    assert rows[(2, d(2020, 6, 1))] is None

    fact = spark.createDataFrame(
        [
            (100, 1, d(2019, 12, 31)),  # before first version
            (101, 1, d(2020, 1, 1)),    # inclusive lower bound -> bronze
            (102, 1, d(2020, 12, 31)),  # bronze
            (103, 1, d(2021, 1, 1)),    # exclusive upper -> gold
            (104, 2, d(2022, 1, 1)),    # open-ended silver
            (105, 9, d(2022, 1, 1)),    # unknown key -> NULL
        ],
        "order_id long, cust long, odate date",
    )
    got = {r.order_id: r.tier for r in
           scd2_join(fact, dim, ["cust"], "odate").collect()}
    assert got == {
        100: None, 101: "bronze", 102: "bronze",
        103: "gold", 104: "silver", 105: None,
    }
    # exactly one row per fact (intervals partition the timeline)
    assert scd2_join(fact, dim, ["cust"], "odate").count() == 6

    dup = spark.createDataFrame(
        [(1, d(2020, 1, 1), "a"), (1, d(2020, 1, 1), "b")],
        "cust long, ts date, tier string",
    )
    with _pytest.raises(ValueError, match="same instant"):
        changes_to_scd2(dup, ["cust"], "ts")


def test_scd2_validate_off_is_lazy_and_skips_the_check(spark):
    """validate=False: plan construction runs ZERO jobs (no eager
    duplicate-instant scan) — the off-switch for callers whose change
    log is already validated (100x: the check doubles read cost)."""
    import datetime as dt

    from bigdata_commerce_spark.operators.scd2 import changes_to_scd2

    d = dt.date
    dup = spark.createDataFrame(
        [(1, d(2020, 1, 1), "a"), (1, d(2020, 1, 1), "b")],
        "cust long, ts date, tier string",
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    dim = changes_to_scd2(dup, ["cust"], "ts", validate=False)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "validate=False must not launch a job"
    # the duplicate slips through by explicit caller choice
    assert dim.count() == 2


def test_scd2_join_rejects_column_name_collisions(spark):
    """A non-key dim column sharing a fact column's name would emit a
    duplicated output name — rejected up front."""
    import datetime as dt

    import pytest as _pytest

    from bigdata_commerce_spark.operators.scd2 import changes_to_scd2, scd2_join

    d = dt.date
    chg = spark.createDataFrame(
        [(1, d(2020, 1, 1), "bronze")], "cust long, ts date, tier string"
    )
    dim = changes_to_scd2(chg, ["cust"], "ts")
    fact = spark.createDataFrame(
        [(100, 1, d(2021, 1, 1), "keep")],
        "order_id long, cust long, odate date, tier string",
    )
    with _pytest.raises(ValueError, match="collision.*tier"):
        scd2_join(fact, dim, ["cust"], "odate")


def test_tag_phrases_rejects_empty_dictionary(spark):
    import pytest as _pytest

    from bigdata_commerce_spark.operators.dupspans import tag_phrases

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="non-empty"):
        tag_phrases(df, [])


def test_rfm_scores_crafted(spark):
    """4 customers engineered into distinct quartiles per axis; the
    most-recent/most-frequent/biggest spender scores 444."""
    import datetime as dt

    from bigdata_commerce_spark.operators.rfm import rfm_scores

    d = dt.date
    rows = []
    # customer c buys c times, amount 100*c each, last purchase
    # c*10 days before the anchor (customer 4 = best on every axis)
    for c in (1, 2, 3, 4):
        for i in range(c):
            rows.append((c, d(2024, 12, 31) - dt.timedelta(days=(5 - c) * 10 + i), 100.0 * c))
    df = spark.createDataFrame(rows, "o_custkey long, o_orderdate date, o_totalprice double")
    got = {r.customer: r for r in rfm_scores(df, n_bins=4).collect()}
    assert got[4].rfm == "444"
    assert got[1].r_score == 1 and got[1].f_score == 1 and got[1].m_score == 1
    # monotone: better on every raw axis -> scores never decrease
    for c in (1, 2, 3):
        assert got[c + 1].r_score >= got[c].r_score
        assert got[c + 1].f_score >= got[c].f_score
        assert got[c + 1].m_score >= got[c].m_score
    # anchor override shifts every recency by the same delta
    # (corpus max ts is customer 4's last purchase, 2024-12-21)
    delta = (d(2025, 1, 31) - d(2024, 12, 21)).days
    shifted = {r.customer: r.recency_days for r in
               rfm_scores(df, n_bins=4, asof=d(2025, 1, 31)).collect()}
    for c in (1, 2, 3, 4):
        assert shifted[c] == got[c].recency_days + delta


def test_variant_extract_totality_and_malformed_report(spark):
    from bigdata_commerce_spark.functions.semistructured import (
        malformed_json_report,
        parse_json_variant,
        variant_extract,
    )

    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "name": "x", "nested": {"d": 1.5}}'),
            (2, '{"k": "not-an-int"}'),
            (3, "{{{ definitely not json"),
            (4, None),
            (5, '{"other": 1}'),
        ],
        "id long, props string",
    )
    out = variant_extract(
        df,
        "props",
        {
            "k": ("$.k", "int"),
            "name": ("$.name", "string"),
            "d": ("$.nested.d", "double"),
        },
    )
    got = {r.id: (r.k, r.name, r.d) for r in out.collect()}
    assert got[1] == (7, "x", 1.5)
    assert got[2] == (None, None, None)   # type mismatch -> NULL, no abort
    assert got[3] == (None, None, None)   # malformed -> NULL
    assert got[4] == (None, None, None)   # NULL input
    assert got[5] == (None, None, None)   # missing path
    assert out.columns == ["id", "props", "k", "name", "d"]

    rep = malformed_json_report(df, "props").collect()[0]
    assert (rep.n_rows, rep.n_null_input, rep.n_malformed) == (5, 1, 1)
    assert rep.malformed_frac == 0.25     # 1 malformed of 4 non-NULL

    # keep_variant exposes the parsed value for ad-hoc downstream use
    v = variant_extract(df, "props", {"k": ("$.k", "int")}, keep_variant=True)
    assert "__v" in v.columns
    pj = parse_json_variant(df, "props")
    assert pj.where("v IS NULL AND props IS NOT NULL").count() == 1  # row 3


def test_cross_source_dup_matrix_exact_pair_arithmetic(spark):
    """Diagonal = C(n,2) within a source; off-diagonal = n_a*n_b;
    unique contents contribute nothing; default key is the full-text
    fingerprint."""
    from bigdata_commerce_spark.operators.dedup import cross_source_dup_matrix

    rows = [
        # content X: 3 copies in src_a, 2 in src_b
        *[(i, "same text here", "src_a") for i in range(3)],
        *[(10 + i, "same text here", "src_b") for i in range(2)],
        # content Y: 2 copies, both in src_b
        (20, "other dup", "src_b"), (21, "other dup", "src_b"),
        # unique content
        (30, "totally unique", "src_a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {(r.source_a, r.source_b): (r.shared_fps, r.dup_pairs)
           for r in cross_source_dup_matrix(df).collect()}
    assert got == {
        ("src_a", "src_a"): (1, 3),   # C(3,2)
        ("src_a", "src_b"): (1, 6),   # 3*2
        ("src_b", "src_b"): (2, 1 + 1),  # C(2,2)=1 for X copies + C(2,2)=1 for Y
    }


# ---------------------------------------------------------------------------
# SemDeDup (round 8): within-cluster dominance prune, keep-the-
# peripheral rule (Abbas et al. 2023)
# ---------------------------------------------------------------------------

def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_drops_exact_duplicates_keeps_min_id(spark):
    from bigdata_commerce_spark.operators.similarity import semdedup

    base = [1.0, 0.0, 0.0, 0.0]
    other = [0.0, 1.0, 0.0, 0.0]
    rows = [(1, base), (2, base), (3, base), (4, other)]
    out = {r.vec_id: r for r in semdedup(_vecs(spark, rows), tau=0.99).collect()}
    # identical vectors have identical centroid_sim -> tie-break keeps
    # the smallest id; the orthogonal vector is untouched
    assert out[1].kept is True
    assert out[2].kept is False and out[3].kept is False
    assert out[4].kept is True
    assert out[1].centroid_id == out[2].centroid_id == out[3].centroid_id


def test_semdedup_keeps_the_peripheral_member(spark):
    """The published rule: among a near-dup pair, the member FARTHER
    from its centroid (lower centroid_sim) survives, regardless of
    id order."""
    from bigdata_commerce_spark.operators.similarity import semdedup

    # one EXPLICIT centroid shared by the near-dup pair (with a
    # corpus this tiny the md5 pick would make every vector its own
    # centroid and the pair would never meet in a cell); v10 IS the
    # centroid direction, so v11 is the peripheral member and must
    # survive even though v10 has the smaller id
    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.9962, 0.0871, 0.0, 0.0]  # ~5 degrees off a
    far = [0.0, 0.0, 1.0, 0.0]
    rows = [(10, a), (11, b), (12, far)]
    cents = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 0.0, 1.0, 0.0])],
        "centroid_id long, centroid_vec array<double>",
    )
    out = {
        r.vec_id: r
        for r in semdedup(_vecs(spark, rows), tau=0.99, centroids=cents).collect()
    }
    pair = [out[10], out[11]]
    assert sorted(p.kept for p in pair) == [False, True]
    survivor = next(p for p in pair if p.kept)
    victim = next(p for p in pair if not p.kept)
    assert survivor.centroid_sim <= victim.centroid_sim
    assert out[12].kept is True


def test_semdedup_zero_vector_contract(spark):
    from bigdata_commerce_spark.operators.similarity import semdedup

    rows = [(1, [0.0, 0.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 0.0, 0.0])]
    out = {r.vec_id: r for r in semdedup(_vecs(spark, rows), tau=0.9).collect()}
    # zero-magnitude vectors: NULL cell, NULL sim, always kept — even
    # though two of them are "identical" (their cosine is undefined)
    for i in (1, 3):
        assert out[i].kept is True
        assert out[i].centroid_id is None and out[i].centroid_sim is None
    assert out[2].kept is True


def test_semdedup_hot_cell_warning_fires(spark, caplog):
    """VERDICT r9 item 3: with max_cell_size UNSET, a cell over 4x
    the median cell size logs a warning naming the blowup (the
    detector is the same histogram the salt path broadcasts)."""
    import logging

    from bigdata_commerce_spark.operators.similarity import semdedup

    e1, e2, e3 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]
    rows = [(i, e1) for i in range(12)] + [(100, e2), (101, e3)]
    cents = spark.createDataFrame(
        [(0, e1), (1, e2), (2, e3)],
        "centroid_id long, centroid_vec array<double>",
    )
    with caplog.at_level(
        logging.WARNING, logger="bigdata_commerce_spark.operators.similarity"
    ):
        semdedup(_vecs(spark, rows), tau=0.99, centroids=cents).collect()
    hot = [r for r in caplog.records if "hot cell" in r.getMessage()]
    assert hot, "expected a hot-cell warning (cell sizes 12/1/1)"
    assert "max_cell_size" in hot[0].getMessage()
    assert "12" in hot[0].getMessage()


def test_semdedup_hot_cell_warning_silent_when_balanced_or_capped(spark, caplog):
    """No warning on balanced cells, and none when the caller already
    set max_cell_size (the salt path IS the mitigation)."""
    import logging

    from bigdata_commerce_spark.operators.similarity import semdedup

    e1, e2, e3 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]
    cents = spark.createDataFrame(
        [(0, e1), (1, e2), (2, e3)],
        "centroid_id long, centroid_vec array<double>",
    )
    balanced = [(1, e1), (2, e1), (3, e2), (4, e2), (5, e3), (6, e3)]
    hot_rows = [(i, e1) for i in range(12)] + [(100, e2), (101, e3)]
    with caplog.at_level(
        logging.WARNING, logger="bigdata_commerce_spark.operators.similarity"
    ):
        semdedup(_vecs(spark, balanced), tau=0.99, centroids=cents).collect()
        semdedup(
            _vecs(spark, hot_rows), tau=0.99, centroids=cents, max_cell_size=4
        ).collect()
    assert not [r for r in caplog.records if "hot cell" in r.getMessage()]


def test_semdedup_hot_cell_warning_opt_out(spark, caplog):
    """ADVICE r10 item 3: warn_hot_cells=False skips the blocking
    driver collect (no warning even on a hot cell) and the kept set
    is identical to the default path."""
    import logging

    from bigdata_commerce_spark.operators.similarity import semdedup

    e1, e2, e3 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]
    cents = spark.createDataFrame(
        [(0, e1), (1, e2), (2, e3)],
        "centroid_id long, centroid_vec array<double>",
    )
    hot_rows = [(i, e1) for i in range(12)] + [(100, e2), (101, e3)]
    with caplog.at_level(
        logging.WARNING, logger="bigdata_commerce_spark.operators.similarity"
    ):
        quiet = semdedup(
            _vecs(spark, hot_rows), tau=0.99, centroids=cents, warn_hot_cells=False
        ).collect()
    assert not [r for r in caplog.records if "hot cell" in r.getMessage()]
    noisy = semdedup(_vecs(spark, hot_rows), tau=0.99, centroids=cents).collect()
    key = lambda rows: sorted((r.vec_id, r.kept) for r in rows)  # noqa: E731
    assert key(quiet) == key(noisy)


def test_semdedup_threshold_gates_the_prune(spark):
    from bigdata_commerce_spark.operators.similarity import semdedup

    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.8, 0.6, 0.0, 0.0]  # cosine 0.8 to a
    rows = [(1, a), (2, b)]
    cents = spark.createDataFrame(
        [(100, [1.0, 0.1, 0.0, 0.0])],
        "centroid_id long, centroid_vec array<double>",
    )
    loose = {
        r.vec_id: r.kept
        for r in semdedup(_vecs(spark, rows), tau=0.75, centroids=cents).collect()
    }
    tight = {
        r.vec_id: r.kept
        for r in semdedup(_vecs(spark, rows), tau=0.9, centroids=cents).collect()
    }
    assert sorted(loose.values()) == [False, True]  # 0.8 >= 0.75: one drops
    assert list(tight.values()) == [True, True]     # 0.8 < 0.9: both stay


def test_semdedup_plan_shape(spark):
    """No CartesianProduct anywhere (the only nested-loop joins are
    the broadcast one-row centroid constants), and the shuffle
    surface is the cell-keyed self-join family only — the property
    SCALE.md claims."""
    import re

    from bigdata_commerce_spark.operators.similarity import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = semdedup(emb)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 2, plan[:500]


def test_semdedup_salt_split_bounds_survivors(spark):
    """Hot-cell bound (r8 verdict item 2): a duplicate blob larger
    than ``max_cell_size`` salt-splits into ceil(size/cap) buckets —
    at most that many survivors (one per non-empty bucket, the
    bucket-minimum id), never the unbounded single-survivor exactness
    — while cells at or under the cap stay bit-identical to the
    unsalted result."""
    from bigdata_commerce_spark.operators.similarity import semdedup

    blob = [1.0, 0.0, 0.0, 0.0]
    small_a = [0.0, 1.0, 0.0, 0.0]
    small_b = [0.0, 0.9962, 0.0871, 0.0]  # near-dup of small_a
    rows = [(i, blob) for i in range(40)] + [(100, small_a), (101, small_b)]
    cents = spark.createDataFrame(
        [(0, blob), (1, small_a)],
        "centroid_id long, centroid_vec array<double>",
    )
    out = {
        r.vec_id: r
        for r in semdedup(
            _vecs(spark, rows), tau=0.99, centroids=cents, max_cell_size=10
        ).collect()
    }
    blob_survivors = [i for i in range(40) if out[i].kept]
    # ceil(40/10) = 4 salt buckets; identical vectors collapse to the
    # per-bucket minimum id, so 1..4 survivors (4 unless a bucket is
    # empty under the hash split)
    assert 1 <= len(blob_survivors) <= 4
    # the small cell (2 <= cap) keeps exact semantics: the peripheral
    # member survives, the centroid-aligned one drops
    assert out[100].kept is False and out[101].kept is True


def test_semdedup_cap_is_exact_when_no_cell_exceeds_it(spark):
    """max_cell_size larger than every cell == the unsalted result,
    row for row (n_salt = 1 everywhere is the exact path)."""
    from bigdata_commerce_spark.operators.similarity import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = {
        r.vec_id: (r.centroid_id, r.centroid_sim, r.kept)
        for r in semdedup(emb, tau=0.9, n_centroids=8).collect()
    }
    capped = {
        r.vec_id: (r.centroid_id, r.centroid_sim, r.kept)
        for r in semdedup(emb, tau=0.9, n_centroids=8, max_cell_size=10**6).collect()
    }
    assert base == capped


# ---------------------------------------------------------------------------
# Media perceptual-hash near-dup (round 8)
# ---------------------------------------------------------------------------

def test_media_phash_bits_equal_feature_signs(spark):
    """The JVM nibble rule must equal 'feature >= 0.5' on the
    deterministic kernel's exact feature values."""
    from bigdata_commerce_spark.operators.multimodal import (
        documents_as_media,
        extract_features,
        media_phash,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} body text") for i in range(1, 30)] + [(99, None)],
        "doc_id long, text string",
    )
    media = documents_as_media(docs)
    feats = {r.media_id: r.features for r in extract_features(media).collect()}
    hashes = {r.media_id: r.phash for r in media_phash(media).collect()}
    assert hashes[99] is None  # absent media -> NULL phash
    for mid, fv in feats.items():
        if fv is None:
            continue
        expect = sum((1 << i) for i, x in enumerate(fv) if x >= 0.5)
        assert hashes[mid] == expect, mid


def test_media_phash_pairs_equal_brute_force(spark):
    """Pigeonhole banding must be invisible: the banded union equals
    the brute-force hamming<=k set exactly (including hamming-0 exact
    duplicates)."""
    from bigdata_commerce_spark.operators.multimodal import (
        documents_as_media,
        media_phash,
        media_phash_pairs,
    )

    texts = [f"payload {i % 17}" for i in range(60)]  # planted exact dups
    docs = spark.createDataFrame(
        list(enumerate(texts, start=1)), "doc_id long, text string"
    )
    media = documents_as_media(docs)
    got = {
        (r.media_a, r.media_b, r.hamming)
        for r in media_phash_pairs(media, max_hamming=1).collect()
    }
    h = {r.media_id: r.phash for r in media_phash(media).collect()}
    ids = sorted(h)
    brute = {
        (a, b, bin(h[a] ^ h[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(h[a] ^ h[b]).count("1") <= 1
    }
    assert got == brute
    assert any(d == 0 for _, _, d in got)  # the planted exact dups


def test_media_phash_pairs_validates_band_split(spark):
    import pytest as _pytest

    from bigdata_commerce_spark.operators.multimodal import (
        documents_as_media,
        media_phash_pairs,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        media_phash_pairs(documents_as_media(docs), max_hamming=2)  # 3 | 8 fails
