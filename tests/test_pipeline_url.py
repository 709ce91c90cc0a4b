"""URL-stage integration: the crawl keying head (canonicalize →
blocklist → URL dedup → per-domain cap) composed end to end on the
real testdata — every stage oracle-checked individually (the four
urltools twins + source_capped_docs); this test pins that they
COMPOSE: column contracts line up, counts reconcile stage to stage,
and the final corpus carries no blocked domain, no duplicate
canonical URL, and no domain over quota."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_commerce_spark.operators import urltools
from bigdata_commerce_spark.operators.mixing import cap_per_source
from bigdata_commerce_spark.plans.catalog_dataops import _messy_url
from bigdata_commerce_spark.sources.testdata import load_table

SF = "/root/testdata/sf0.001"


def test_url_keying_chain_composes(spark):
    docs = load_table(spark, "documents", SF).select(
        "doc_id", "text", "source"
    ).withColumn("url", _messy_url())
    n_raw = docs.count()

    # 1. blocklist: drop the multi-part-suffix domain (doc_id%5==1 rows)
    blocked = spark.createDataFrame([("example.co.uk",)], "domain string")
    vetted = urltools.filter_blocked_domains(docs, blocked)
    n_vetted = vetted.count()
    assert n_vetted < n_raw  # the blocked slice really existed
    assert (
        vetted.where(F.col("registered_domain") == "example.co.uk").count() == 0
    )
    # the fixture's other rows all canonicalize; only the blocked
    # doc_id%5==1 slice is gone
    n_blocked = docs.where(F.col("doc_id") % 5 == 1).count()
    assert n_vetted == n_raw - n_blocked

    # 2. URL dedup: one survivor per canonical URL, payload via semi-join
    survivors = urltools.dedup_by_canonical_url(vetted)
    kept = vetted.join(
        survivors.select("doc_id"), "doc_id", "left_semi"
    )
    n_kept = kept.count()
    assert n_kept == survivors.count()
    assert (
        kept.groupBy("canonical_url").count().where(F.col("count") > 1).count()
        == 0
    )
    # the %5 cases 2/3/else collide per source — dedup must shrink
    assert n_kept < n_vetted

    # 3. per-domain quota on the registered domain the URL stage added
    quota = 50
    capped = cap_per_source(kept, quota, source_col="registered_domain")
    over = (
        capped.groupBy("registered_domain")
        .count()
        .where(F.col("count") > quota)
        .count()
    )
    assert over == 0
    # the cap binds (cdn duplicates leave >quota docs on example.com)
    assert capped.count() < n_kept
    # payload columns flow through the whole chain intact
    assert {"doc_id", "text", "source", "canonical_url", "registered_domain"} <= set(
        capped.columns
    )
