"""Deterministic adversarial testdata generator for the differential
fuzz sweep (tests/test_fuzz_differential.py).

Produces the same ten tables as the driver's parquet testdata, with
the SAME schemas (names, types, nullability) but hostile content the
fixed testdata never exercises:

- NULLs in every nullable value column (text, lang, source, value,
  props, event_type, acctbal, label, ...)
- empty / whitespace-only / single-token / very long strings
- unicode: CJK, emoji, RTL Arabic, combining accents
- exact and near duplicate documents and embedding vectors
- repeated-phrase documents (duplicate-span / repetition territory)
- JSON edge shapes in events.props: {}, null values, nested, strings,
  and outright garbage
- dangling foreign keys (orders→customer, lineitem→part/orders)
- timestamp ties (same user, same instant), epoch and far-future
  extremes
- a planted hot key in events.user_id (skew)
- zero / giant (norm overflow) / tiny embedding vectors

Everything is seeded — same directory contents on every run — so the
fuzz sweep is reproducible and its comparisons are exact, like the
driver's. Money-like doubles are generated as integer cents / 100:
not exactly representable in binary, but both engines read the SAME
parquet bits, and every catalog aggregate is engineered to be
order-independent (decimal sums etc.), so exact comparison holds.

NaN is deliberately absent: upstream loaders in this engine null out
sentinels at ingest (functions/__init__.py), so NaN-vs-NULL ordering
divergence between engines is not a contract the catalog makes.
"""

from __future__ import annotations

import json
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 0xF0221

# Vocabulary overlapping the real generator's word salad, plus common
# English stopwords so stopword/quality metrics exercise both branches.
_WORDS = (
    "the a and of to in is it for on spark table scan join merge sort "
    "filter window batch stream key order row column value data query "
    "hash agg part line customer vector small big fast slow dup"
).split()

_UNICODE_TEXTS = (
    "日本語のテキストです。これは全角文字のみ。",
    "🦀🚀✨ emoji only doc 🎉🔥",
    "مرحبا بالعالم هذا نص عربي",
    "éléphant résumé combining accents",
    "ПРИВЕТ мир КИРИЛЛИЦА текст",
    'he said "x\\y" and (a+b)*c? [brackets] {braces} 100%',
    # Engine-parity hostiles (round-7 advice): Java \\s includes \\x0b
    # where RE2's does not, and Java $ matches before a trailing
    # \\r / U+0085 / U+2028 / U+2029 where RE2's does not -- these rows
    # make any bare-\\s or bare-$ oracle pairing fail the differential
    # sweep instead of drifting silently.
    "vertical\x0btab splits words\x0bhere maybe.",
    "crlf line one.\r\nsecond crlf line here.\r\nthird one!\r\n",
    "trailing carriage return.\r",
    "nel\x85terminated line.\x85tail",
    "unicode line sep\u2028dot end.\u2028para sep\u2029tail line.",
    "form\ffeed and\ttabs \x0b mixed \r\n whitespace zoo.",
    # mojibake rows (encoding repair differential): utf-8 bytes
    # mis-decoded as cp1252, single- and double-encoded
    'Ã©lÃ©phant rÃ©sumÃ© â€” naÃ¯ve â€œquotedâ€\x9d textâ€¦',
    'cafÃƒÂ© Ã‚Â· ÃƒÂ¼ber',
)


def _money(rng: random.Random, lo_cents: int, hi_cents: int) -> float:
    return rng.randint(lo_cents, hi_cents) / 100.0


def _salad(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


# Gopher's stopword list (text.GOPHER_STOPWORDS) — two per prose line
# so flag_stopwords passes; mirrored here instead of imported so a
# fixture regression can't silently track an operator-constant change.
_PROSE_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _prose(rng: random.Random, n_lines: int) -> str:
    """Multi-line prose that PASSES the published recipe gates
    (round-7 verdict item 3 — the salad docs are single-line token
    soup on which Gopher/C4 pass zero documents, making composed
    recipe oracles vacuous): every line ends in terminal punctuation,
    has >= 6 words, and carries Gopher stopwords; 8+ distinct lines
    and 50+ words per document."""
    lines = []
    for _ in range(n_lines):
        k = rng.randrange(5, 11)
        ws = [rng.choice(_WORDS) for _ in range(k)]
        ws.insert(rng.randrange(len(ws) + 1), rng.choice(_PROSE_STOPS))
        ws.insert(rng.randrange(len(ws) + 1), rng.choice(_PROSE_STOPS))
        lines.append(" ".join(ws) + rng.choice((".", ".", ".", "!", "?")))
    return "\n".join(lines)


def _region() -> dict:
    return {
        "r_regionkey": pa.array([0, 1, 2, 3, 4], pa.int32()),
        "r_name": ["AMERICA", "", "ASIA 🌏", "europé", "MIDDLE EAST"],
    }


def _nation(rng: random.Random) -> dict:
    names = [_salad(rng, 1).upper() for _ in range(25)]
    names[3] = names[7] = "DUPLICATE NATION"
    names[11] = ""
    names[12] = "日本"
    return {
        "n_nationkey": pa.array(list(range(25)), pa.int32()),
        "n_name": names,
        "n_regionkey": pa.array([rng.randrange(5) for _ in range(25)], pa.int32()),
    }


def _customer(rng: random.Random) -> dict:
    n = 150
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
    bal = [_money(rng, -99999, 999999) for _ in range(n)]
    bal[5] = 0.0
    bal[6] = None
    bal[7] = None
    seg = [rng.choice(segs) for _ in range(n)]
    seg[10] = ""
    seg[11] = None
    return {
        "c_custkey": pa.array(list(range(1, n + 1)), pa.int64()),
        "c_name": [f"Customer#{i:09d}" if i % 37 else "客户 🏷" for i in range(1, n + 1)],
        "c_nationkey": pa.array([rng.randrange(25) for _ in range(n)], pa.int32()),
        "c_acctbal": pa.array(bal, pa.float64()),
        "c_mktsegment": seg,
    }


def _supplier(rng: random.Random) -> dict:
    n = 10
    bal = [_money(rng, -50000, 500000) for _ in range(n)]
    bal[0] = 0.0
    return {
        "s_suppkey": pa.array(list(range(1, n + 1)), pa.int64()),
        "s_name": [f"Supplier#{i}" for i in range(1, n + 1)],
        "s_nationkey": pa.array([rng.randrange(25) for _ in range(n)], pa.int32()),
        "s_acctbal": pa.array(bal, pa.float64()),
    }


def _part(rng: random.Random) -> dict:
    n = 200
    brands = [f"Brand#{b}" for b in range(1, 6)]
    types = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
    names = [_salad(rng, 3) for _ in range(n)]
    names[20] = names[21] = "duplicate part name"
    names[22] = ""
    names[23] = "零件 🔩"
    sizes = [rng.randrange(1, 51) for _ in range(n)]
    sizes[0] = 0
    sizes[1] = 10_000
    return {
        "p_partkey": pa.array(list(range(1, n + 1)), pa.int64()),
        "p_name": names,
        "p_brand": [rng.choice(brands) for _ in range(n)],
        "p_type": [rng.choice(types) for _ in range(n)],
        "p_size": pa.array(sizes, pa.int32()),
        "p_retailprice": pa.array([_money(rng, 100, 200000) for _ in range(n)], pa.float64()),
    }


def _ts_us(year: int, month: int, day: int, h=0, m=0, s=0, us=0) -> int:
    import datetime as dt

    return int(
        dt.datetime(year, month, day, h, m, s, us, tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )


def _orders(rng: random.Random) -> dict:
    n = 800
    base = _ts_us(2024, 1, 1)
    dates = [base + rng.randrange(0, 30 * 86400) * 1_000_000 for _ in range(n)]
    dates[0] = _ts_us(1970, 1, 1)
    dates[1] = _ts_us(2099, 12, 31, 23, 59, 59)
    dates[2] = dates[3] = dates[4] = base + 12345 * 1_000_000  # exact ties
    cust = [rng.randrange(1, 151) for _ in range(n)]
    for i in range(5):  # dangling FKs → outer-join paths
        cust[i + 10] = 151 + i
    return {
        "o_orderkey": pa.array(list(range(1, n + 1)), pa.int64()),
        "o_custkey": pa.array(cust, pa.int64()),
        "o_orderstatus": [rng.choice("FOP") for _ in range(n)],
        "o_totalprice": pa.array([_money(rng, 1000, 5000000) for _ in range(n)], pa.float64()),
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_orderpriority": [
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
            for _ in range(n)
        ],
    }


def _lineitem(rng: random.Random) -> dict:
    n = 3000
    base = _ts_us(2024, 1, 5)
    ship = [base + rng.randrange(0, 40 * 86400) * 1_000_000 for _ in range(n)]
    ship[0] = _ts_us(1970, 1, 2)
    ship[1] = _ts_us(2099, 1, 1)
    ship[2] = ship[3] = base  # ties
    okey = [rng.randrange(1, 801) for _ in range(n)]
    pkey = [rng.randrange(1, 201) for _ in range(n)]
    for i in range(4):  # dangling
        okey[i + 20] = 801 + i
        pkey[i + 30] = 201 + i
    qty = [float(rng.randrange(1, 51)) for _ in range(n)]
    qty[0] = 0.0
    return {
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(pkey, pa.int64()),
        "l_suppkey": pa.array([rng.randrange(1, 11) for _ in range(n)], pa.int64()),
        "l_linenumber": pa.array([rng.randrange(1, 8) for _ in range(n)], pa.int32()),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array([_money(rng, 100, 10000000) for _ in range(n)], pa.float64()),
        "l_discount": pa.array([rng.randrange(0, 11) / 100.0 for _ in range(n)], pa.float64()),
        "l_tax": pa.array([rng.randrange(0, 9) / 100.0 for _ in range(n)], pa.float64()),
        "l_returnflag": [rng.choice("ANR") for _ in range(n)],
        "l_linestatus": [rng.choice("OF") for _ in range(n)],
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }


def _events(rng: random.Random) -> dict:
    n = 1200
    base = _ts_us(2024, 1, 1)
    kinds = ["click", "view", "purchase", "signup", "error"]
    users, ts, etype, value, props = [], [], [], [], []
    for i in range(n):
        # planted skew: user 7 owns ~30% of events
        u = 7 if rng.random() < 0.30 else rng.randrange(1, 41)
        users.append(u)
        ts.append(base + rng.randrange(0, 30 * 86400) * 1_000_000 + rng.randrange(0, 1_000_000))
        etype.append(rng.choice(kinds))
        value.append(_money(rng, 0, 100000))
        props.append(json.dumps({"k": rng.randrange(0, 100)}))
    # hostile rows (overwrite a deterministic prefix)
    ts[1] = ts[0]
    users[1] = users[0]  # exact tie: same user, same instant
    etype[1] = etype[0]
    ts[2] = _ts_us(1970, 1, 1)
    ts[3] = _ts_us(2099, 6, 1)
    etype[4] = ""
    etype[5] = None
    value[6] = None
    value[7] = 0.0
    value[8] = -123.45
    # 1e9 is the planted extreme, NOT 1e12+: the stats operators
    # (timeseries.flag_anomalies, value trends) document the money_sum
    # domain |value| < 1e12 with <=6 decimal places — beyond it their
    # exact DECIMAL(18,6) sums-of-squares overflow and ANSI mode
    # aborts LOUDLY (the correct 100 TB behavior; a 38-digit decimal
    # cannot hold exact squares of 1e12-scale values in any engine).
    value[9] = 1e9
    props[10] = "{}"
    props[11] = '{"k": null}'
    props[12] = '{"k": "str"}'
    props[13] = '{"a": {"b": 1}}'
    props[14] = "not json at all"
    props[15] = ""
    props[16] = None
    props[17] = '{"k": -5}'
    return {
        "event_id": pa.array(list(range(1, n + 1)), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": etype,
        "value": pa.array(value, pa.float64()),
        "props": props,
    }


def _documents(rng: random.Random, dup_rate: float = 0.2) -> dict:
    n = 400
    langs = ["en", "de", "fr", "zh", "es"]
    sources = [f"src{i}" for i in range(1, 21)]
    # dup_rate splits evenly between exact and near duplicates; the
    # dup-heavy profile (0.7) makes most of the corpus one tangle of
    # duplicate chains — the regime where cluster merging, canonical
    # survivor picks and incremental stores earn their keep
    p_fresh = max(0.0, 0.78 - dup_rate) * (0.50 / 0.58)
    p_exact = dup_rate / 2
    texts: list[str | None] = []
    prose_idx: list[int] = []
    for i in range(n):
        r = rng.random()
        if r < p_fresh:
            # one fresh doc in four is multi-line prose that passes
            # the Gopher/C4 gates (recipe funnels must be non-vacuous
            # on this corpus — round-7 verdict item 3); the rest stay
            # single-line salad, which those gates reject
            if rng.random() < 0.25:
                texts.append(_prose(rng, rng.randrange(8, 13)))
                prose_idx.append(i)
            else:
                texts.append(_salad(rng, rng.randrange(10, 120)))
        elif r < p_fresh + p_exact and texts:
            texts.append(rng.choice([t for t in texts if t] or ["fallback doc"]))  # exact dup
        elif r < p_fresh + 2 * p_exact and texts:
            donor = rng.choice([t for t in texts if t and len(t) > 30] or ["fallback doc two"])
            words = donor.split()
            words[rng.randrange(len(words))] = rng.choice(_WORDS)  # near dup
            texts.append(" ".join(words))
        elif r < 0.78:
            phrase = _salad(rng, 5)
            texts.append(" ".join([phrase] * rng.randrange(3, 8)))  # repeated phrase
        else:
            texts.append(_salad(rng, rng.randrange(20, 60)))
    # hostile prefix
    texts[0] = ""
    texts[1] = " \n\t  "
    texts[2] = "word"
    texts[3] = "word " * 800
    texts[4] = None
    texts[5] = None
    for j, u in enumerate(_UNICODE_TEXTS):
        texts[6 + j] = u
    lang = [rng.choice(langs) for _ in range(n)]
    # prose docs are labeled 'en' so the DSIR English-target slice is
    # prose-dominated — the keep gate then has real signal on this
    # corpus (and the composed recipe funnel stays non-vacuous end to
    # end); the hostile lang overrides below still win
    for j in prose_idx:
        lang[j] = "en"
    lang[20] = ""
    lang[21] = None
    src = [sources[min(int(rng.expovariate(0.35)), 19)] for _ in range(n)]
    src[22] = None
    # a source whose EVERY doc has NULL text: its per-source
    # SUM(n_tokens) is NULL in both engines (ADVICE r9 item 1 — the
    # reachable-on-real-data case the mixed sources above cannot hit);
    # token mixers must drop it, never crash on int(NULL) or let a
    # NULL weight poison SUM(w). docs 4/5 are the planted NULL texts.
    src[4] = "src_void"
    src[5] = "src_void"
    return {
        "doc_id": pa.array(list(range(1, n + 1)), pa.int64()),
        "text": texts,
        "lang": lang,
        "source": src,
        "n_chars": pa.array(
            [len(t) if t is not None else None for t in texts], pa.int64()
        ),
    }


def _embeddings(rng: random.Random) -> dict:
    n, dim = 400, 64
    npr = np.random.default_rng(SEED)
    mat = npr.standard_normal((n, dim)).astype(np.float32)
    mat[0] = 0.0  # zero vector
    mat[2] = mat[1]  # exact duplicate
    mat[3] = mat[1] + np.float32(1e-3)  # near duplicate
    mat[4] = np.float32(1e20)  # norm**2 overflows to inf
    mat[5] = np.float32(1e-30)  # tiny
    labels: list[int | None] = [rng.randrange(0, 10) for _ in range(n)]
    labels[6] = None
    labels[7] = None
    return {
        "vec_id": pa.array(list(range(1, n + 1)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in mat], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }


def generate(out_dir: str, dup_rate: float = 0.2) -> str:
    """Write all ten fuzz tables as ``{out_dir}/{table}.parquet``.

    Idempotent and deterministic: same SEED + dup_rate → same
    bytes-for-bytes values (parquet metadata aside). ``dup_rate``
    controls the documents table's duplicate density (0.7 = the
    dup-heavy profile). Returns ``out_dir``.
    """
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(SEED)
    tables = {
        "region": _region(),
        "nation": _nation(rng),
        "customer": _customer(rng),
        "supplier": _supplier(rng),
        "part": _part(rng),
        "orders": _orders(rng),
        "lineitem": _lineitem(rng),
        "events": _events(rng),
        "documents": _documents(rng, dup_rate),
        "embeddings": _embeddings(rng),
    }
    for name, cols in tables.items():
        pq.write_table(pa.table(cols), os.path.join(out_dir, f"{name}.parquet"))
    return out_dir


if __name__ == "__main__":
    import sys

    print(generate(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_fuzz"))
