"""Driver-verification rotation (round-4 verdict item 2): the queries()
registry orders itself by staleness derived from the CORRECTNESS_r*.json
files on disk — no hand-maintained verified-set literals."""

import json
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod


def _write(tmp_path, rnd, entries):
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(entries))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
RED = {"rows_match": True, "schema_match": True, "hash_match": False, "err": None}


def test_verified_rounds_reads_latest_green(tmp_path):
    _write(tmp_path, 1, {"a": GREEN, "b": GREEN})
    _write(tmp_path, 2, {"b": GREEN, "c": GREEN, "d": RED})
    got = entry_mod._driver_verified_rounds(str(tmp_path))
    assert got == {"a": 1, "b": 2, "c": 2}  # d is red → not verified


def test_rotation_orders_pinned_then_never_then_stalest():
    verified = entry_mod._driver_verified_rounds()
    q = entry_mod.queries()
    keys = list(q)
    # pinned core leads
    assert keys[: len(entry_mod._PINNED_CORE)] == entry_mod._PINNED_CORE
    # after the pinned block: never-verified first, then ascending rounds
    tail = keys[len(entry_mod._PINNED_CORE):]
    ranks = [verified.get(k, -1) for k in tail]
    assert ranks == sorted(ranks)
    # with r1..r4 files in the repo, the 50-query driver window must reach
    # every never-verified entry (27 as of round 5 — fewer as rounds land)
    never = [k for k in keys if k not in verified]
    window = keys[:50]
    assert all(k in window for k in never) or len(never) > 50 - len(
        entry_mod._PINNED_CORE
    )


def test_red_row_reenters_window(tmp_path):
    """A key whose LATEST check is red is a known regression: it must
    rank as never-verified (dropped from the verified map), not sit at
    its last-green round's rank behind the backlog."""
    _write(tmp_path, 1, {"x": GREEN, "y": GREEN})
    _write(tmp_path, 2, {"x": GREEN, "y": RED})
    got = entry_mod._driver_verified_rounds(str(tmp_path))
    assert got["x"] == 2
    assert "y" not in got  # regressed → re-enters the window immediately
    # ...and a later green restores it
    _write(tmp_path, 3, {"y": GREEN})
    got = entry_mod._driver_verified_rounds(str(tmp_path))
    assert got["y"] == 3
