"""ROTATION.md's ledger as an enforced invariant (VERDICT r6 item 7).

After round 7 the rotation closes: every catalog/twin query must have
at least one driver-verified round, be slotted for the current round
(``rN*``), or carry an explicit row-identity pin to a driver-verified
sibling. This test parses the ledger table and fails on any query
that has none — so a future registry addition without a rotation plan
(or a ledger row that silently loses its verification) breaks the
suite instead of rotting quietly.
"""

from __future__ import annotations

import re
from pathlib import Path

from bigdata_commerce_spark.plans import QUERIES, TWIN_QUERIES

LEDGER = Path(__file__).resolve().parent.parent / "ROTATION.md"
_ROW = re.compile(r"^\| `([^`]+)` \| ([^|]+) \| ([^|]+) \|$")


def _parse_ledger() -> dict[str, tuple[str, str]]:
    rows: dict[str, tuple[str, str]] = {}
    for line in LEDGER.read_text().splitlines():
        m = _ROW.match(line)
        if m and m.group(1) != "query":
            rows[m.group(1)] = (m.group(2).strip(), m.group(3).strip())
    return rows


def test_every_query_is_in_the_ledger():
    rows = _parse_ledger()
    missing = sorted((set(QUERIES) | set(TWIN_QUERIES)) - set(rows))
    assert not missing, f"registry queries absent from ROTATION.md ledger: {missing}"


def test_ledger_slots_match_registry():
    """The ledger's slot column must mirror the live registry — a
    rotation edit without a ledger update (or vice versa) fails."""
    rows = _parse_ledger()
    wrong = sorted(
        name
        for name, (slot, _) in rows.items()
        if name in QUERIES or name in TWIN_QUERIES
        if slot.startswith("driver") != (name in QUERIES)
    )
    assert not wrong, f"ledger slot disagrees with registry: {wrong}"


def test_every_query_has_a_driver_row_or_pin():
    """The closed ledger: a green driver round, a pending ``rN*``
    slot, a ``pinned == sibling`` row-identity pin, or an explicit
    ``queued (rN)`` marker for a freshly-added query awaiting the
    next rotation — nothing may have none of the four. A queue marker
    is only honest for the NEXT round, so the maintenance rotation
    cannot park queries in the queue forever without the slot column
    (checked by test_ledger_slots_match_registry) going stale."""
    rows = _parse_ledger()
    unverified = []
    for name in sorted(set(QUERIES) | set(TWIN_QUERIES)):
        slot, rounds = rows.get(name, ("", ""))
        has_round = bool(re.search(r"\br\d+\*?", rounds))
        pinned = rounds.startswith("pinned ==")
        queued = bool(re.fullmatch(r"queued \(r\d+\)", rounds))
        if not (has_round or pinned or queued):
            unverified.append(name)
    assert not unverified, (
        f"queries with no driver row, no pending slot, no pin, and no "
        f"queue marker: {unverified}"
    )


def test_ledger_horizon():
    """VERDICT r9 item 7: the informal "~3 rounds without a re-check"
    promise, made structural — no oracle-paired query's NEWEST driver
    row may be older than 4 rounds behind the current round (the max
    round anywhere in the ledger, pending ``rN*`` slots included).
    Pinned rows ride their target's verification (checked by
    test_pins_point_at_driver_verified_queries); ``queued (rN)`` rows
    are brand-new twins awaiting their first slot."""
    rows = _parse_ledger()
    all_rounds = [
        int(n)
        for _, (_, rounds) in rows.items()
        for n in re.findall(r"\br(\d+)\*?", rounds)
    ]
    current = max(all_rounds)
    stale = []
    for name in sorted(set(QUERIES) | set(TWIN_QUERIES)):
        slot, rounds = rows.get(name, ("", ""))
        if rounds.startswith("pinned ==") or re.fullmatch(r"queued \(r\d+\)", rounds):
            continue
        newest = max(int(n) for n in re.findall(r"\br(\d+)\*?", rounds))
        if newest < current - 4:
            stale.append(f"{name} (newest driver row r{newest}, current r{current})")
    assert not stale, f"ledger horizon exceeded (>4 rounds without a driver row): {stale}"


def test_pins_point_at_driver_verified_queries():
    rows = _parse_ledger()
    for name, (_, rounds) in rows.items():
        if not rounds.startswith("pinned =="):
            continue
        target = rounds.removeprefix("pinned ==").strip().split()[0]
        if target not in rows:
            # prose pin (e.g. "exact sessionize (session_stats anchor)")
            # — the parenthesized anchor must exist and be verified
            m = re.search(r"\(([a-z0-9_]+) anchor\)", rounds)
            assert m and m.group(1) in rows, (
                f"pin target of {name!r} not found in ledger: {rounds!r}"
            )
            target = m.group(1)
        t_rounds = rows[target][1]
        assert re.search(r"\br\d+\*?", t_rounds), (
            f"{name!r} pins to {target!r}, which has no driver row itself"
        )
