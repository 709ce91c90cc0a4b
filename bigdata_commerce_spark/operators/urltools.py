"""URL canonicalization and host-level curation primitives.

The first stage of every crawl-curation pipeline is URL-keyed: the
same page arrives under dozens of surface forms (scheme/host case,
default ports, trailing dots, duplicated slashes, tracking query
params, fragments), and dedup/quota/blocklist decisions key on the
*canonical* form and on the *registered domain*, not on the raw
string. The reference engine has no URL stage (its inputs are
pre-keyed session logs); this module is part of the beyond-reference
training-data layer, next to ``mixing.cap_per_source`` (per-source
quota caps) and ``dedup`` (content-level dedup) — URL dedup runs
BEFORE content dedup because it is one cheap hash agg instead of a
shingle pipeline.

100 TB shape: ``with_canonical_url`` / ``with_registered_domain`` are
pure column projections — zero shuffle, no UDF, evaluated inside the
scan stage. ``dedup_by_canonical_url`` is ONE hash aggregate on the
canonical string (identical shuffle shape to ``dedup.dedup_exact``,
map-side partial min). ``host_report`` is one hash aggregate on the
registered domain (domain cardinality ≪ row count, so the partial
agg collapses almost everything map-side).

Canonicalization contract (documented so the DuckDB oracle can state
the same rules):

1. scheme and host are lowercased;
2. the scheme's default port is stripped (``:80`` for http, ``:443``
   for https), then a trailing FQDN dot on the host;
3. runs of ``/`` in the path collapse to one, a trailing ``/`` is
   dropped (except for the root path), an empty path becomes ``/``;
4. the fragment is dropped;
5. query params are split on ``&``; empties, ``utm_*`` and the
   exact tracking keys in ``TRACKING_PARAMS`` are removed; the rest
   are sorted bytewise and rejoined (param ORDER never identifies a
   resource; param VALUES may, so values are untouched);
6. userinfo (``user:pass@``) and punycode/IDN normalization are out
   of scope — upstream fetchers already reject/resolve those.

Only absolute ``scheme://host...`` URLs are canonicalized; anything
else (relative refs, ``mailto:``, garbage) yields NULL so callers can
quarantine rather than silently mis-key.

``with_registered_domain`` approximates the public-suffix list with
the handful of multi-part suffixes in ``MULTIPART_SUFFIXES``; a real
deployment swaps in the full PSL as a broadcast set — the extraction
expression is unchanged, only the literal set grows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Exact query keys that are tracking/attribution noise (the utm_*
# family is matched by prefix instead — it is open-ended). 'ref' /
# 'ref_src' are deliberately NOT here: on major sites 'ref' selects
# content (GitHub '?ref=branch'), so stripping it would merge
# genuinely different resources; callers curating corpora where ref
# is known-noise pass tracking_params=TRACKING_PARAMS | {'ref', ...}.
TRACKING_PARAMS: frozenset[str] = frozenset(
    {"fbclid", "gclid", "msclkid", "mc_eid", "igshid", "_ga"}
)

# Multi-part public suffixes the registered-domain rule knows about.
# Deliberately tiny (see module docstring) — the REAL artifact is the
# expression shape: last-2 labels, or last-3 when last-2 is a listed
# public suffix.
MULTIPART_SUFFIXES: frozenset[str] = frozenset(
    {
        "co.uk", "org.uk", "gov.uk", "ac.uk",
        "com.au", "net.au", "org.au",
        "co.jp", "co.in", "co.kr", "co.nz", "co.za",
        "com.br", "com.cn", "com.mx", "com.tr", "com.sg",
    }
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# Query = everything after the FIRST '?' that precedes any '#': the
# leading [^#?]* refuses to skip past a '?' or into the fragment, so
# 'https://h/p#sec?a=1' has NO query (the '?' is fragment content)
# while 'https://h/p?a=1?b=2' keeps 'a=1?b=2' (RFC 3986: later '?'s
# are query content).
_QUERY_RE = r"^[^#?]*\?([^#]*)"


def _canonical_expr(
    url: Column, tracking_params: frozenset[str] = TRACKING_PARAMS
) -> Column:
    """The canonical-URL Column expression. Pure built-ins; every
    step mirrors a numbered rule in the module docstring."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    # Rule 2: default port, then trailing FQDN dot.
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    host = F.regexp_replace(host, r"\.$", "")
    # Rule 3: collapse slash runs, drop trailing slash, '' -> '/'.
    rawpath = F.regexp_extract(url, _PATH_RE, 1)
    path = F.regexp_replace(rawpath, "/{2,}", "/")
    path = (
        F.when(path == "", F.lit("/"))
        .when(path != "/", F.regexp_replace(path, "/$", ""))
        .otherwise(path)
    )
    # Rule 5: split, scrub tracking keys, sort, rejoin. Fragment is
    # never captured (rule 4). Keys compare via the text before the
    # first '=' so valueless params ('flag') scrub by name too.
    tracked = F.array(*[F.lit(p) for p in sorted(tracking_params)])
    kept = F.filter(
        F.split(F.regexp_extract(url, _QUERY_RE, 1), "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~F.array_contains(tracked, F.split(p, "=").getItem(0)),
    )
    query = F.array_join(F.array_sort(kept), "&")
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    # Absolute http(s)-style URLs only; everything else is NULL so
    # callers quarantine instead of mis-keying (module docstring).
    return F.when((scheme != "") & (hostport != ""), canonical)


def _domain_expr(canonical: Column) -> Column:
    """Registered domain of an already-canonical URL (NULL in → NULL
    out). Last two host labels, or last three when the last two form
    a listed multi-part public suffix; IPv4-literal hosts have no
    domain hierarchy and are kept whole."""
    host = F.regexp_extract(canonical, _HOSTPORT_RE, 1)
    bare = F.regexp_replace(host, ":[0-9]+$", "")  # non-default port stays in host
    labels = F.split(bare, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    last3 = F.concat_ws(".", F.element_at(labels, -3), last2)
    suffixes = F.array(*[F.lit(s) for s in sorted(MULTIPART_SUFFIXES)])
    return (
        F.when(canonical.isNull(), F.lit(None).cast("string"))
        .when(bare.rlike(r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$"), bare)
        .when(n <= 2, bare)
        .when(F.array_contains(suffixes, last2), last3)
        .otherwise(last2)
    )


def with_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    tracking_params: frozenset[str] = TRACKING_PARAMS,
) -> DataFrame:
    """Add the canonical form of ``url_col``. Zero shuffle.
    ``tracking_params`` widens/narrows the exact-key scrub set (the
    default deliberately excludes content-significant keys like
    'ref' — see TRACKING_PARAMS)."""
    return df.withColumn(
        out_col, _canonical_expr(F.col(url_col), tracking_params)
    )


def with_registered_domain(
    df: DataFrame,
    canonical_col: str = "canonical_url",
    out_col: str = "registered_domain",
) -> DataFrame:
    """Add the registered domain of an already-canonical URL column.
    Zero shuffle."""
    return df.withColumn(out_col, _domain_expr(F.col(canonical_col)))


def dedup_by_canonical_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-level dedup: canonicalize and keep the min-``id_col`` row
    id per canonical URL. Returns (canonical_url, survivor id) —
    callers semi-join back for payloads, exactly the
    ``dedup.dedup_exact`` contract. NULL canonicals (non-absolute
    URLs) are excluded, not grouped into one bucket.

    ONE hash aggregate on the canonical string; min() gives a
    map-side partial so the shuffle carries one row per (partition,
    url), not per input row."""
    return (
        with_canonical_url(df, url_col)
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(F.min(id_col).alias(id_col))
    )


def host_report(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-registered-domain curation stats: rows seen, distinct
    canonical URLs, and the URL-dup ratio — the table a crawl
    operator reads to set per-domain quota caps
    (``mixing.cap_per_source``).

    One hash aggregate keyed on the domain. countDistinct adds the
    usual expand-for-distinct, still one shuffle; domain cardinality
    is tiny vs rows, so partials collapse map-side."""
    canon = with_canonical_url(df, url_col).where(
        F.col("canonical_url").isNotNull()
    )
    canon = with_registered_domain(canon)
    return canon.groupBy("registered_domain").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("canonical_url").alias("n_urls"),
        F.round(
            1.0 - F.countDistinct("canonical_url") / F.count(F.lit(1)), 4
        ).alias("dup_ratio"),
    )


def filter_blocked_domains(
    df: DataFrame,
    blocked: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop rows whose registered domain appears in ``blocked`` (a
    one-column DataFrame of registered domains — the crawl blocklist;
    NULL-canonical rows are dropped too, they cannot be vetted).
    Returns the input columns plus canonical_url/registered_domain so
    downstream stages (dedup, quota caps) reuse the parse.

    ONE left-anti equi-join on the domain. No forced broadcast hint:
    real blocklists range from tens (fits broadcast — AQE picks it)
    to hundreds of millions of domains (shuffle join is the only
    correct plan); size-based planning decides."""
    canon = with_registered_domain(with_canonical_url(df, url_col)).where(
        F.col("canonical_url").isNotNull()
    )
    key = blocked.columns[0]
    return canon.join(
        blocked.select(F.col(key).alias("registered_domain")).distinct(),
        "registered_domain",
        "left_anti",
    )
