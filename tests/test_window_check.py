"""The rotation invariant is enforced by a tool, not a comment.

tools/window_check.py reads the committed CORRECTNESS history plus the
live _PRIORITY_KEYS ordering; these tests (a) run it against the real
repo state — the gate that makes a missed rotation fail CI — and
(b) feed it synthetic histories with deliberately broken invariants to
prove each violation class actually fires.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.window_check import MAX_AGE, WINDOW, check, load_history


def test_repo_state_satisfies_invariant():
    import __spark_entry__ as entry

    errs = check(list(entry._PRIORITY_KEYS), list(entry.queries()),
                 load_history())
    assert errs == [], "\n".join(errs)


def test_window_is_exactly_full():
    """The priority prefix should fill all 50 driver slots — an
    underfull window wastes rotation capacity the registry needs."""
    import __spark_entry__ as entry

    reg = set(entry.queries())
    in_window = [k for k in entry._PRIORITY_KEYS[:WINDOW] if k in reg]
    assert len(in_window) == WINDOW


# ---- synthetic violation fixtures ---------------------------------------

REG = [f"k{i}" for i in range(6)]


def hist(**rounds):
    return {int(r[1:]): set(keys) for r, keys in rounds.items()}


def test_w1_ghost_key_fires():
    errs = check(["ghost", *REG[:1]], REG,
                 hist(r1=REG), window_size=2)
    assert any(e.startswith("W1") and "ghost" in e for e in errs)


def test_w2_aged_key_fires():
    # k5 last rowed r1; rounds r2/r3 rowed others; this round (r4)
    # window excludes it -> age 3 > 2.
    h = hist(r1=REG, r2=REG[:2], r3=REG[2:4])
    errs = check(REG[:2], REG, h, window_size=2)
    assert any(e.startswith("W2") and "k5" in e for e in errs)


def test_w2_green_history_passes():
    # every key re-windowed within 2 rounds -> no W2.
    h = hist(r1=REG, r2=REG[:3], r3=REG[3:])
    errs = check(REG[:3], REG, h, window_size=3)
    assert not any(e.startswith("W2") for e in errs)


def test_w3_never_rowed_key_outside_window_fires():
    h = hist(r1=REG[:5])
    errs = check(REG[:5], REG, h, window_size=5)  # k5 never rowed
    assert any(e.startswith("W3") and "k5" in e for e in errs)


def test_w4_capacity_fires():
    h = hist(r1=REG)
    errs = check(REG, REG, h, window_size=1)  # capacity 3 < 6 keys
    assert any(e.startswith("W4") for e in errs)


def test_w5_infeasible_next_round_fires():
    # window_size=2: this round (r2) windows k0,k1; the other 4 keys
    # were rowed r0... use ages: all rowed r1? then next round they're
    # age 2 -> mandatory 4 > 2 slots.
    h = {1: set(REG)}
    errs = check(REG[:2], REG, h, window_size=2, max_age=1)
    assert any(e.startswith("W5") for e in errs)


def test_w6_red_row_is_not_coverage(tmp_path):
    import json

    data = {
        "good": {"rows_match": True, "schema_match": True,
                 "hash_match": True, "err": None},
        "red": {"rows_match": True, "schema_match": True,
                "hash_match": False, "err": None},
        "errd": {"rows_match": True, "err": "boom"},
        "rows_only": {"rows_match": True, "err": None},
    }
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(data))
    h = load_history(str(tmp_path))
    assert h == {3: {"good", "rows_only"}}


def test_real_history_loads_all_rounds():
    h = load_history()
    assert len(h) >= 10 and all(h.values())
    # the documented fact underpinning the whole scheme: the driver
    # window has never exceeded 50 keys in any committed round.
    assert max(len(v) for v in h.values()) <= WINDOW


def test_constants_are_the_documented_invariant():
    assert (WINDOW, MAX_AGE) == (50, 2)
