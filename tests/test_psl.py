"""Public Suffix List machinery: parser, Spark expression, DuckDB
restatement parity, and the IDNA host pre-pass.

The cases cover every publicsuffix.org algorithm branch: exact rules
at 2-4 labels, wildcard rules (*.ck, *.kawasaki.jp,
*.compute.amazonaws.com), exception rules (!www.ck,
!city.kawasaki.jp), the implicit '*' fallback, ICANN vs PRIVATE
section handling, and the engine's documented keys-as-itself
deviation for unregistrable hosts and IP literals.
"""

from __future__ import annotations

import duckdb
import pytest

from bigdata_commerce_spark.operators import psl, urltools

# (host, expected registered domain) under the bundled snapshot with
# the PRIVATE section included.
PSL_CASES = [
    ("www.example.com", "example.com"),
    ("example.com", "example.com"),
    ("www.example.co.uk", "example.co.uk"),        # 2-label ICANN suffix
    ("example.co.uk", "example.co.uk"),
    ("co.uk", "co.uk"),                            # host IS a suffix -> itself
    ("foo.example.com.au", "example.com.au"),
    ("x.pvt.k12.ma.us", "x.pvt.k12.ma.us"),        # 4-label? no: pvt.k12.ma.us is the suffix
    ("y.x.pvt.k12.ma.us", "x.pvt.k12.ma.us"),
    ("blog.foo.github.io", "foo.github.io"),       # PRIVATE suffix
    ("github.io", "github.io"),
    ("a.b.ck", "a.b.ck"),                          # *.ck: b.ck is a suffix
    ("c.a.b.ck", "a.b.ck"),
    ("www.ck", "www.ck"),                          # !www.ck: suffix is ck
    ("foo.www.ck", "www.ck"),
    ("city.kawasaki.jp", "city.kawasaki.jp"),      # exception beats wildcard
    ("sub.city.kawasaki.jp", "city.kawasaki.jp"),
    ("foo.kawasaki.jp", "foo.kawasaki.jp"),        # wildcard suffix -> itself
    ("bar.foo.kawasaki.jp", "bar.foo.kawasaki.jp"),
    ("vm1.compute.amazonaws.com", "vm1.compute.amazonaws.com"),
    ("x.vm1.compute.amazonaws.com", "x.vm1.compute.amazonaws.com"),
    ("localhost", "localhost"),                    # single label -> itself
    ("unknowntld.zz", "unknowntld.zz"),            # implicit '*' fallback
    ("a.unknowntld.zz", "unknowntld.zz"),
    ("192.168.10.4", "192.168.10.4"),              # IPv4 literal
    ("[2001:db8::1]", "[2001:db8::1]"),            # bracketed IPv6
]


def test_parser_sections_and_rule_kinds():
    rules = psl.default_rules(include_private=True)
    assert "co.uk" in rules.exact and "github.io" in rules.exact
    assert "ck" in rules.wildcard and "kawasaki.jp" in rules.wildcard
    assert "www.ck" in rules.exception and "city.kawasaki.jp" in rules.exception
    no_private = psl.default_rules(include_private=False)
    assert "github.io" not in no_private.exact
    assert "co.uk" in no_private.exact
    assert rules.max_labels() >= 4  # *.compute.amazonaws.com


def test_spark_expression_matches_algorithm(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(PSL_CASES)], "i int, host string"
    )
    rules = psl.default_rules()
    out = df.withColumn("dom", psl.registered_domain_expr(df.host, rules))
    got = {r["i"]: r["dom"] for r in out.collect()}
    for i, (host, want) in enumerate(PSL_CASES):
        assert got[i] == want, f"{host!r}: {got[i]!r} != {want!r}"


def test_duckdb_restatement_matches_spark_cases():
    rules = psl.default_rules()
    sql = psl.registered_domain_sql("h", rules)
    con = duckdb.connect()
    for host, want in PSL_CASES:
        got = con.execute(f"SELECT {sql} FROM (SELECT ? AS h)", [host]).fetchone()[0]
        assert got == want, f"{host!r}: {got!r} != {want!r}"


def test_private_section_toggle(spark):
    """include_private=False keys hosting tenants under the platform."""
    df = spark.createDataFrame([("blog.foo.github.io",)], "host string")
    no_private = psl.default_rules(include_private=False)
    out = df.withColumn("dom", psl.registered_domain_expr(df.host, no_private))
    assert out.head()["dom"] == "github.io"
    # and urltools threads the rules parameter through
    urls = spark.createDataFrame(
        [("https://blog.foo.github.io/x",)], "url string"
    )
    got = urltools.with_registered_domain(
        urltools.with_canonical_url(urls), rules=no_private
    ).head()["registered_domain"]
    assert got == "github.io"


def test_load_psl_roundtrip(tmp_path):
    p = tmp_path / "psl.dat"
    p.write_text(psl.PSL_SNAPSHOT, encoding="utf-8")
    assert psl.load_psl(str(p)) == psl.default_rules(True)
    assert psl.load_psl(str(p), include_private=False) == psl.default_rules(False)


# ---------------------------------------------------------------------------
# userinfo + IDN (urltools rules 6-7)
# ---------------------------------------------------------------------------


def test_userinfo_is_stripped(spark):
    cases = [
        ("https://user:pw@example.com/x", "https://example.com/x"),
        ("https://USER@Example.COM:443/x?a=1", "https://example.com/x?a=1"),
        ("https://example.com/x", "https://example.com/x"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {r["i"]: r["canonical_url"]
           for r in urltools.with_canonical_url(df).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_non_ascii_hosts_quarantine_without_prepass(spark):
    df = spark.createDataFrame(
        [("https://пример.рф/x",), ("https://bücher.example/y",)], "url string"
    )
    rows = urltools.with_canonical_url(df).collect()
    assert all(r["canonical_url"] is None for r in rows)


def test_idna_prepass_encodes_and_is_idempotent(spark):
    cases = [
        # mixed-script host -> punycode; path/query untouched
        ("https://пример.рф/x?a=1", "https://xn--e1afmkfd.xn--p1ai/x?a=1"),
        ("http://BÜCHER.example:8080/y", "http://xn--bcher-kva.example:8080/y"),
        # mixed ascii/unicode labels: only unicode labels encode
        ("https://www.日本.jp/z", "https://www.xn--wgv71a.jp/z"),
        # userinfo preserved by the pre-pass (canonicalizer strips it later)
        ("https://u:p@пример.рф/w", "https://u:p@xn--e1afmkfd.xn--p1ai/w"),
        # pure-ASCII URLs pass through byte-identical
        ("https://Example.COM/keep?b=2", "https://Example.COM/keep?b=2"),
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    out = urltools.with_idna_host(df)
    got = {r["i"]: r["url"] for r in out.collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"
    # idempotence: a second pass is the identity
    again = urltools.with_idna_host(out)
    got2 = {r["i"]: r["url"] for r in again.collect()}
    assert got2 == got


def test_idna_prepass_then_canonicalize_end_to_end(spark):
    """The documented composition: pre-pass clears rule 7, the
    expression canonicalizer + PSL domain then apply normally."""
    df = spark.createDataFrame(
        [(1, "HTTPS://ПрИмЕр.рф:443//a/?utm_source=t&z=1#frag")],
        "doc_id long, url string",
    )
    out = urltools.with_registered_domain(
        urltools.with_canonical_url(urltools.with_idna_host(df))
    ).head()
    assert out["canonical_url"] == "https://xn--e1afmkfd.xn--p1ai/a?z=1"
    assert out["registered_domain"] == "xn--e1afmkfd.xn--p1ai"


def test_idna_invalid_hosts_pass_through_and_quarantine(spark):
    # empty label ('a..b') fails IDNA -> left unchanged -> canonical NULL
    df = spark.createDataFrame([("https://ой..б/x",)], "url string")
    out = urltools.with_canonical_url(urltools.with_idna_host(df))
    row = out.head()
    assert row["canonical_url"] is None


@pytest.mark.parametrize("include_private", [True, False])
def test_rules_are_hashable_and_cached(include_private):
    a = psl.default_rules(include_private)
    b = psl.default_rules(include_private)
    assert a is b  # lru_cache


def test_nested_exception_rules_agree_across_engines(spark):
    """Round-6 advice regression: with NESTED exception rules
    (!www.ck and !foo.www.ck) the DuckDB restatement wrapped its
    CASEs so the SHORTEST exception ended outermost and won, while
    the Spark coalesce is longest-first — host foo.www.ck drifted
    (Spark foo.www.ck, DuckDB www.ck). Unreachable with the bundled
    snapshot (no nested exceptions), latent for a swapped-in full
    PSL. Both engines must pick the longest matching exception."""
    rules = psl.PslRules(
        exact=frozenset({"ck"}),
        wildcard=frozenset({"ck", "www.ck"}),
        exception=frozenset({"www.ck", "foo.www.ck"}),
    )
    cases = [
        ("www.ck", "www.ck"),            # !www.ck cancels *.ck
        ("foo.www.ck", "foo.www.ck"),    # !foo.www.ck (longest) must win
        ("x.foo.www.ck", "foo.www.ck"),
        ("bar.www.ck", "www.ck"),        # !www.ck matches last-2 labels
                                         # (exception beats *.www.ck)
        ("a.ck", "a.ck"),                # *.ck wildcard -> itself
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, host string"
    )
    out = df.withColumn("dom", psl.registered_domain_expr(df.host, rules))
    got_spark = {r["i"]: r["dom"] for r in out.collect()}
    sql = psl.registered_domain_sql("h", rules)
    con = duckdb.connect()
    for i, (host, want) in enumerate(cases):
        got_duck = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS h)", [host]
        ).fetchone()[0]
        assert got_spark[i] == want, f"spark {host!r}: {got_spark[i]!r}"
        assert got_duck == want, f"duckdb {host!r}: {got_duck!r}"
