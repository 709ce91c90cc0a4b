"""Byte-fixture tests for the mojibake repair kernels (round-7
verdict item 5): damage known-clean text with the real codec
round-trip, assert the kernels reverse it, and reconcile repair with
the encoding_quality detector."""

from __future__ import annotations

import pytest

from bigdata_commerce_spark.operators.encoding_repair import (
    _sloppy_cp1252_decode,
    mojibake_fixmap,
    repair_encoding,
    repair_encoding_exact,
)
from bigdata_commerce_spark.operators.text import encoding_quality

# Clean originals spanning the repair map: Latin-1 letters, cp1252
# punctuation, and plain ASCII that must never change.
CLEAN = [
    "éléphant résumé naïve",
    "smart “quotes” and ’apostrophes’ — em dash … ellipsis",
    "price €99 · §2 ©2026 ±5%",
    "plain ascii stays untouched.",
    "ÀÈÌÒÙ àèìòù ÄËÏÖÜ äëïöü ñÑ çÇ",
]


def damage(t: str) -> str:
    """The classic web damage: UTF-8 bytes mis-decoded as cp1252
    (sloppy — undefined bytes pass through as Latin-1)."""
    return _sloppy_cp1252_decode(t.encode("utf-8"))


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_fixmap_is_generated_and_ordered():
    m = mojibake_fixmap()
    assert len(m) > 100
    # longest-first total order (the chain-order contract)
    lens = [len(d) for d, _ in m]
    assert lens == sorted(lens, reverse=True)
    # spot-check the canonical pair
    assert ("Ã©", "é") in m


def test_fast_repair_reverses_single_layer_damage(spark):
    damaged = [damage(t) for t in CLEAN]
    out = {
        r.doc_id: r
        for r in repair_encoding(_docs(spark, damaged)).collect()
    }
    for i, orig in enumerate(CLEAN, start=1):
        assert out[i].text_repaired == orig, orig
        assert out[i].was_repaired == (damage(orig) != orig)
        assert out[i].n_hits_after == 0


def test_fast_repair_leaves_clean_text_byte_identical(spark):
    out = repair_encoding(_docs(spark, CLEAN)).collect()
    for r, orig in zip(sorted(out, key=lambda r: r.doc_id), CLEAN):
        assert r.text_repaired == orig
        # CLEAN texts contain repaired chars but no damaged sequences
        assert not r.was_repaired
    # NULL text passes through as NULL, flag false
    row = repair_encoding(_docs(spark, [None])).collect()[0]
    assert row.text_repaired is None and row.was_repaired is False


@pytest.mark.parametrize("layers", [1, 2])
def test_exact_kernel_reverses_nested_damage(spark, layers):
    damaged = CLEAN
    for _ in range(layers):
        damaged = [damage(t) for t in damaged]
    out = {
        r.doc_id: r
        for r in repair_encoding_exact(_docs(spark, damaged)).collect()
    }
    for i, orig in enumerate(CLEAN, start=1):
        assert out[i].text_repaired == orig, (layers, orig)


def test_exact_kernel_never_touches_valid_text(spark):
    texts = CLEAN + ["ascii only", None, "", "日本語テキスト", "Ποσειδῶν"]
    out = repair_encoding_exact(_docs(spark, texts)).collect()
    by_id = {r.doc_id: r for r in out}
    for i, t in enumerate(texts, start=1):
        assert by_id[i].text_repaired == t
        assert by_id[i].was_repaired is False


def test_repair_reconciles_with_detector(spark):
    """The repaired-vs-damaged differential: after the exact kernel,
    the encoding_quality detector must report strictly fewer mojibake
    hits (zero, for pure single/double cp1252 damage)."""
    damaged = [damage(t) for t in CLEAN] + [damage(damage(t)) for t in CLEAN]
    df = _docs(spark, damaged)
    before = {
        r.doc_id: r.n_mojibake_hits for r in encoding_quality(df).collect()
    }
    repaired = repair_encoding_exact(df).select(
        "doc_id", "text_repaired"
    ).withColumnRenamed("text_repaired", "text")
    after = {
        r.doc_id: r.n_mojibake_hits for r in encoding_quality(repaired).collect()
    }
    assert any(v > 0 for v in before.values())
    for i in before:
        assert after[i] == 0, i


def test_fast_path_is_udf_free(spark):
    plan = repair_encoding(_docs(spark, CLEAN))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # and shuffle-free: one projection at scan speed, no Exchange
    assert "Exchange" not in plan, plan.splitlines()[:12]
