"""Published curation recipes: Gopher rule flags, CCNet perplexity
buckets, DSIR importance weights — crafted-input laws (the oracle
twins in plans/catalog_dataops.py pin the exact values; these pin the
SEMANTICS per rule)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigdata_commerce_spark.operators.lm_quality import (
    dsir_logratio,
    perplexity_buckets,
)
from bigdata_commerce_spark.operators.text import gopher_quality_flags
from tests.conftest import SF_SMOKE



# Slow tier (VERDICT r12 item 2 / r13 suite tiering): composed end-to-end curation recipes (~50 s).
pytestmark = pytest.mark.slow
GOOD = (
    "The quick brown fox jumps over the lazy dog and runs off to be "
    "free of that noisy farm with all its ducks and hens and very "
    "many other loud animals that have made peace with the farmer "
    "who tends to the field each day and waits for the next warm rain to come by."
)  # 55 words, stopword-rich, all alphabetic


def _flags(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r.asDict() for r in gopher_quality_flags(df).collect()}


def test_gopher_good_document_passes_all(spark):
    out = _flags(spark, [(1, GOOD)])
    r = out[1]
    assert r["n_words"] == 55
    assert all(v for k, v in r.items() if k.startswith("flag_")), r
    assert r["passes_gopher"] is True


def test_gopher_individual_rules_fail_for_the_right_reason(spark):
    bullets = "\n".join(f"- item {i} ok" for i in range(10))
    dup = ("same line here\n" * 10) + "one other line"
    symbols = GOOD + " " + "#" * 20
    longwords = " ".join("supercalifragilistic" for _ in range(60))
    nostops = " ".join(f"w{i}" for i in range(60))
    numeric = " ".join(str(i) for i in range(60))
    ellipsis = "\n".join(f"truncated line {i}..." for i in range(10))
    out = _flags(
        spark,
        [
            (1, "too short"),
            (2, bullets),
            (3, dup),
            (4, symbols),
            (5, longwords),
            (6, nostops),
            (7, numeric),
            (8, ellipsis),
            (9, None),
        ],
    )
    assert not out[1]["flag_word_count"]
    assert not out[2]["flag_bullet_lines"]
    assert not out[3]["flag_dup_lines"]
    assert not out[4]["flag_symbol_ratio"]
    assert not out[5]["flag_mean_word_len"]
    assert not out[6]["flag_stopwords"]
    assert not out[7]["flag_alpha_words"]
    assert not out[8]["flag_ellipsis_lines"]
    # NULL text behaves as '': zero words, fails, never NULL flags
    assert out[9]["n_words"] == 0 and out[9]["passes_gopher"] is False
    for r in out.values():
        assert all(v is not None for v in r.values()), r
        assert r["passes_gopher"] is False or r["doc_id"] == 1


def test_gopher_flags_are_one_shuffle_free_projection(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id long, text string")
    plan = gopher_quality_flags(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_ccnet_buckets_are_ordered_within_language(spark):
    from bigdata_commerce_spark.sources.testdata import load_table

    docs = load_table(spark, "documents", SF_SMOKE)
    out = perplexity_buckets(docs).collect()
    assert out, "no buckets produced"
    by_lang: dict[str, dict[str, list[float]]] = {}
    for r in out:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(r["nll"])
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        if "head" in buckets and "middle" in buckets:
            assert max(buckets["head"]) <= min(buckets["middle"]), lang
        if "middle" in buckets and "tail" in buckets:
            assert max(buckets["middle"]) <= min(buckets["tail"]), lang
        # terciles: head holds roughly a third (exact count depends on
        # boundary ties; it can never exceed middle+tail combined + ties)
        n = sum(len(v) for v in buckets.values())
        assert len(buckets.get("head", [])) <= n


def test_dsir_prefers_target_like_documents(spark):
    a_docs = [(i, "alpha beta gamma delta " * 6) for i in range(1, 9)]
    z_docs = [(i, "zulu xray quebec victor " * 6) for i in range(9, 17)]
    raw = spark.createDataFrame(a_docs + z_docs, "doc_id long, text string")
    target = spark.createDataFrame(a_docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dsir_logratio(raw, target, keep_fraction=0.5).collect()}
    a_scores = [out[i]["logratio"] for i in range(1, 9)]
    z_scores = [out[i]["logratio"] for i in range(9, 17)]
    assert min(a_scores) > max(z_scores)
    # keep = top fraction by weight: every kept weight >= every dropped
    kept = [r["logratio"] for r in out.values() if r["keep"]]
    dropped = [r["logratio"] for r in out.values() if not r["keep"]]
    assert kept and min(kept) >= max(dropped)
    assert all(out[i]["keep"] for i in range(1, 9))


def test_dsir_empty_target_still_scores(spark):
    raw = spark.createDataFrame(
        [(1, "some text here with words")], "doc_id long, text string"
    )
    empty_target = raw.where(F.lit(False))
    out = dsir_logratio(raw, empty_target).collect()
    # empty target -> degenerate 1-outcome model (logp 0 catch-all):
    # logratio = -sum(logp_raw) > 0, never a crash or empty output
    assert len(out) == 1 and out[0]["logratio"] is not None


@pytest.mark.parametrize("frac", [0.0, 1.0])
def test_dsir_keep_fraction_extremes(spark, frac):
    raw = spark.createDataFrame(
        [(i, f"document number {i} with shared words") for i in range(1, 6)],
        "doc_id long, text string",
    )
    out = dsir_logratio(raw, raw, keep_fraction=frac).collect()
    if frac == 1.0:
        assert all(r["keep"] for r in out)
    else:
        # keep_fraction=0 -> threshold is the max; only the argmax
        # (and exact ties) survive
        mx = max(r["logratio"] for r in out)
        assert all(r["keep"] == (r["logratio"] >= mx) for r in out)


def test_c4_line_rules(spark):
    from bigdata_commerce_spark.operators.text import c4_line_filter

    good_line = "This sentence has plenty of words and ends correctly."
    doc = "\n".join(
        [
            good_line,
            "Short line.",                     # < 5 words -> dropped
            "No terminal punctuation here at all",  # no ending punct -> dropped
            "Enable JavaScript to view this content.",  # javascript -> dropped
            'He said "this quoted line has enough words."',  # kept (quote end)
            "Another perfectly fine sentence lives right here!",  # kept
        ]
    )
    rows = spark.createDataFrame(
        [
            (1, doc),
            (2, good_line),                # only 1 kept line -> page dropped
            (3, doc + "\nlorem ipsum dolor sit amet today."),  # lorem -> dropped
            (4, doc + "\nif (x) { return; }"),  # brace -> dropped
            (5, None),                     # NULL -> dropped, no crash
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in c4_line_filter(rows).collect()}
    assert out[1]["kept"] is True
    assert out[1]["n_lines"] == 6 and out[1]["n_lines_kept"] == 3
    clean = out[1]["text_clean"].split("\n")
    assert clean[0] == good_line and len(clean) == 3
    assert "JavaScript" not in out[1]["text_clean"]
    for d in (2, 3, 4, 5):
        assert out[d]["kept"] is False
        assert out[d]["text_clean"] is None, d
    plan = c4_line_filter(rows)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Hypothesis differential: Spark operators vs pure-Python references
# ---------------------------------------------------------------------------

import re as _re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Controlled alphabet: structure-rich (bullets, ellipses, braces,
# trigger words, ragged whitespace) but no exotic Unicode, so Python's
# locale-free reference matches Java/RE2 semantics exactly.
_WORDS = ["the", "and", "to", "of", "cat", "dog", "run", "x1", "42",
          "###", "a…b", "javascript", "JavaScript", "lorem", "ipsum",
          "big{", "word...",
          # round-8 parity class: \x0b splits words in BOTH engines
          # now (explicit ASCII class); NEL splits in neither
          "v\x0bt", "nel\x85nel"]
_ENDINGS = ["", ".", "!", "?", '"', "...", "…", ".\r"]
_LINE_STARTS = ["", "- ", "* ", "• ", "  "]


@st.composite
def _docs(draw):
    n_docs = draw(st.integers(1, 6))
    out = []
    for i in range(n_docs):
        n_lines = draw(st.integers(0, 8))
        lines = []
        for _ in range(n_lines):
            ws = draw(st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12))
            line = (
                draw(st.sampled_from(_LINE_STARTS))
                + " ".join(ws)
                + draw(st.sampled_from(_ENDINGS))
            )
            lines.append(line)
        sep = draw(st.sampled_from(["\n", "\n\n", "\n \n", "\r\n"]))
        text = sep.join(lines) if lines else draw(st.sampled_from(["", " ", None]))
        out.append((i, text))
    return out


_WS = r"[ \t\n\r\f\x0b]+"  # Java \s (ASCII), matching the operators


def _ref_words(t):
    return [w for w in _re.split(_WS, t) if w]


def _ref_lines(t):
    # strip \r with the spaces — CRLF corpora see LF lines (the
    # operators' btrim(' \r') / oracle trim(x, ' ' || chr(13)))
    return [l for l in (x.strip(" \r") for x in t.split("\n")) if l]


def _ref_gopher(text):
    from bigdata_commerce_spark.operators.text import (
        GOPHER_BULLET_CHARS,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
    )

    t = text or ""
    w, l = _ref_words(t), _ref_lines(t)
    nw, nl = len(w), len(l)
    sum_len = sum(len(x) for x in w)
    symbols = (
        t.count("#") + t.count("…")
        + (len(t) - len(t.replace("...", ""))) // 3
    )
    alpha = sum(1 for x in w if _re.search("[A-Za-z]", x))
    stops = len(set(x.lower() for x in w) & set(GOPHER_STOPWORDS))
    bullets = sum(1 for x in l if x[:1] in GOPHER_BULLET_CHARS)
    ellipsis = sum(1 for x in l if x.endswith("...") or x.endswith("…"))
    dup = nl - len(set(l))
    flags = {
        "flag_word_count": GOPHER_MIN_WORDS <= nw <= GOPHER_MAX_WORDS,
        "flag_mean_word_len": nw > 0 and 3 * nw <= sum_len <= 10 * nw,
        "flag_symbol_ratio": 10 * symbols <= nw,
        "flag_bullet_lines": 10 * bullets <= 9 * nl,
        "flag_ellipsis_lines": 10 * ellipsis <= 3 * nl,
        "flag_alpha_words": 5 * alpha >= 4 * nw,
        "flag_stopwords": stops >= 2,
        "flag_dup_lines": 10 * dup <= 3 * nl,
    }
    return {
        "n_words": nw,
        "n_lines": nl,
        **flags,
        "passes_gopher": all(flags.values()),
    }


def _ref_c4(text):
    from bigdata_commerce_spark.operators.text import (
        C4_MIN_KEPT_LINES,
        C4_MIN_LINE_WORDS,
    )

    t = text or ""
    l = _ref_lines(t)
    kl = [
        x
        for x in l
        if _re.search(r'[.!?"]\Z', x)  # \Z = Java/RE2 \z (absolute end)
        and len(_ref_words(x)) >= C4_MIN_LINE_WORDS
        and "javascript" not in x.lower()
    ]
    kept = (
        len(kl) >= C4_MIN_KEPT_LINES
        and "lorem ipsum" not in t.lower()
        and "{" not in t
    )
    return {
        "n_lines": len(l),
        "n_lines_kept": len(kl),
        "kept": kept,
        "text_clean": "\n".join(kl) if kept else None,
    }


@_SETTINGS
@given(docs=_docs())
def test_gopher_matches_python_reference(spark, docs):
    from bigdata_commerce_spark.operators.text import gopher_quality_flags

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_flags(df).collect()}
    for doc_id, text in docs:
        want = {"doc_id": doc_id, **_ref_gopher(text)}
        assert got[doc_id] == want, (repr(text), got[doc_id], want)


@_SETTINGS
@given(docs=_docs())
def test_c4_matches_python_reference(spark, docs):
    from bigdata_commerce_spark.operators.text import c4_line_filter

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_line_filter(df).collect()}
    for doc_id, text in docs:
        want = {"doc_id": doc_id, **_ref_c4(text)}
        assert got[doc_id] == want, (repr(text), got[doc_id], want)


def test_top_ngram_coverage_law(spark):
    from bigdata_commerce_spark.operators.text import top_ngram_char_fraction

    # "spam ham " * 10 -> top 2-gram "spam ham" (or "ham spam") covers
    # most of the text; a diverse doc's top gram covers little
    df = spark.createDataFrame(
        [
            (1, "spam ham " * 10),
            (2, "one two three four five six seven eight nine ten"),
            (3, "x"),          # 1 token -> absent at every n
            (4, None),         # NULL -> absent
        ],
        "doc_id long, text string",
    )
    out = {}
    for r in top_ngram_char_fraction(df).collect():
        out[(r["doc_id"], r["n"])] = r
    r12 = out[(1, 2)]
    assert r12["top_count"] == 10  # "spam ham" x10 (beats "ham spam" x9)
    assert r12["top_ngram"] == "spam ham"
    # 10 * 8 chars / 89 normalized chars
    assert r12["top_char_frac"] == round(80 / 89, 4)
    assert out[(2, 2)]["top_count"] == 1
    assert out[(2, 2)]["top_char_frac"] < 0.3
    assert (3, 2) not in out and (4, 2) not in out
    # every doc with >= n tokens appears exactly once per n
    assert {(1, 2), (1, 3), (1, 4), (2, 2), (2, 3), (2, 4)} == set(out)


def test_encoding_quality_detects_each_damage_class(spark):
    from bigdata_commerce_spark.operators.text import encoding_quality

    ctrl = chr(1) + "chars" + chr(7)
    df = spark.createDataFrame(
        [
            (1, "perfectly clean ascii text"),
            (2, "bad decode � here � twice"),
            (3, "cafÃ© and â€smartâ€ quotes Â nbsp"),
            (4, "control" + ctrl + "inside"),
            (5, "tabs\tand\nnewlines are fine"),
            (6, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in encoding_quality(df).collect()}
    assert out[1]["flag_clean"] is True
    assert out[2]["n_replacement_chars"] == 2 and not out[2]["flag_clean"]
    assert out[3]["n_mojibake_hits"] == 4 and not out[3]["flag_clean"]  # A-tilde, a-circ-euro x2, A-circ
    assert out[4]["n_control_chars"] == 2 and not out[4]["flag_clean"]
    assert out[5]["flag_clean"] is True  # tab/newline excluded from the class
    assert out[6]["flag_clean"] is True and out[6]["n_mojibake_hits"] == 0
    plan = encoding_quality(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# Composed funnel (round-7 verdict item 3): hand-verified survivor
# counts on a crafted corpus where every gate passes a non-zero,
# countable subset.
# ---------------------------------------------------------------------------

def _prose_doc(seed: int, n_lines: int = 8) -> str:
    """Deterministic multi-line prose passing Gopher AND C4: 8
    distinct lines x 8 words = 64 words, every line ends '.', carries
    the Gopher stopwords 'the'/'and'/'with', no symbols/bullets."""
    return "\n".join(
        f"the data table number {seed} row {i} scans and filters batches with care."
        for i in range(n_lines)
    )


def test_published_recipe_funnel_hand_counts(spark):
    from bigdata_commerce_spark.operators.lm_quality import (
        dsir_logratio,
        perplexity_buckets,
        published_recipe_funnel,
    )
    from bigdata_commerce_spark.operators.text import c4_line_filter

    texts = {
        1: _prose_doc(1), 2: _prose_doc(2), 3: _prose_doc(3),
        4: _prose_doc(4), 5: _prose_doc(5), 6: _prose_doc(6),
        # fails Gopher (10 words < 50) and C4 (single line)
        7: "tiny document with under ten words total here now.",
        # passes Gopher, fails C4's no-brace page rule
        8: _prose_doc(8) + "\nthe extra line has a { brace and the page drops.",
        # passes Gopher, fails C4 (every line mentions javascript)
        9: "\n".join(
            f"the javascript widget {i} renders and updates with the page loads."
            for i in range(8)
        ),
        # fails Gopher (all lines bulleted > 90%), passes C4's line rules
        10: "\n".join(
            f"- the bullet item {i} lists and counts things with care."
            for i in range(8)
        ),
    }
    df = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in sorted(texts.items())],
        "doc_id long, text string, lang string, source string",
    )
    row = published_recipe_funnel(df).collect()[0]
    # HAND COUNTS: raw 10; Gopher passes 1-6, 8, 9 (7 too short, 10
    # all-bullets); C4 keeps 1-6 among those (8 brace, 9 javascript).
    assert row.n_raw == 10
    assert row.n_gopher == 8
    assert row.n_c4 == 6
    # CCNet head+middle = nll <= the 2/3 tercile over all ten docs, so
    # at most ~1/3 of the corpus is tail: >= 3 of the 6 survivors
    # remain. DSIR with target == the whole corpus (all docs 'en')
    # gives logratio 0 everywhere -> every doc keeps (0 >= cut=0).
    # Reconstruct both from the individual operators (the funnel must
    # equal the composition of its published parts).
    buckets = {
        r.doc_id: r.bucket for r in perplexity_buckets(df).collect()
    }
    keeps = {
        r.doc_id: r.keep
        for r in dsir_logratio(df, df.where(F.col("lang") == "en")).collect()
    }
    c4_kept = {r.doc_id: r.kept for r in c4_line_filter(df).collect()}
    survivors = [i for i in (1, 2, 3, 4, 5, 6) if c4_kept[i]]
    exp_ccnet = sum(
        1 for i in survivors if buckets.get(i) in ("head", "middle")
    )
    exp_dsir = sum(
        1
        for i in survivors
        if buckets.get(i) in ("head", "middle") and keeps.get(i, False)
    )
    assert row.n_ccnet == exp_ccnet
    assert row.n_dsir == exp_dsir
    # every gate's survivor count is non-zero on this corpus
    assert row.n_gopher > 0 and row.n_c4 > 0
    assert row.n_ccnet >= 3 and row.n_dsir > 0
