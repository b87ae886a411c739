"""Mechanically enforce the driver-window rotation invariant.

The driver's CORRECTNESS gate checks only the FIRST ``WINDOW`` (50)
keys of ``queries()`` each round.  The repo's standing invariant
(VERDICT r8 onward) is that every registry key's most recent driver
row is at most ``MAX_AGE`` (2) rounds old — i.e. every key rotates
back into the window at least every 3 rounds, which caps the registry
at 3 x 50 = 150 keys.  Until r11 that invariant lived only in the
``_PRIORITY_KEYS`` fill comments; a missed rotation would have broken
it silently.  This tool reads the committed CORRECTNESS_r*.json
history plus the live ``_PRIORITY_KEYS`` ordering and fails loudly if:

  W1. the window names a key that is not in the registry (the r10
      fill-comment bug class: ``forget_documents`` and
      ``multimodal_resize`` were listed but are not registry keys);
  W2. any registry key's projected driver-row age AFTER this round's
      window runs exceeds MAX_AGE rounds;
  W3. a key that has never had a driver row sits outside the window
      (new keys must take window slots in their first eligible round);
  W4. the registry exceeds rotation capacity ((MAX_AGE + 1) x WINDOW);
  W5. next round's mandatory window — keys that will be MAX_AGE rounds
      old after this round — would not fit in WINDOW slots (the
      earmark-feasibility check: catching this one round early is the
      whole point);
  W6. a red driver row (any of rows/schema/hash false) is being
      counted as coverage — a failed row is treated as NO row, so a
      regression forces the key back into a window.

Usage:
    python tools/window_check.py            # check /root/repo state
    python -m pytest tests/test_window_check.py

The pure logic lives in :func:`check` so tests can feed synthetic
histories (including a deliberately aged key) without touching git.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50     # driver checks the first 50 queries() keys
MAX_AGE = 2     # max rounds since a key's last green driver row


def load_history(repo: str = REPO) -> dict[int, set[str]]:
    """Round number -> set of keys with a GREEN driver row that round.

    A row is green only if rows/schema/hash all matched (hash_match is
    absent for oracle-less keys — then rows_match alone gates, the
    driver's own weaker check).  Red rows are dropped entirely (W6).
    """
    hist: dict[int, set[str]] = {}
    for name in os.listdir(repo):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", name)
        if not m:
            continue
        with open(os.path.join(repo, name)) as fh:
            data = json.load(fh)
        green = set()
        for key, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("rows_match") and row.get("err") is None
            for extra in ("schema_match", "hash_match"):
                if extra in row and row[extra] is not None:
                    ok = ok and row[extra]
            if ok:
                green.add(key)
        hist[int(m.group(1))] = green
    return hist


def check(window: list[str], registry: list[str],
          history: dict[int, set[str]],
          window_size: int = WINDOW, max_age: int = MAX_AGE) -> list[str]:
    """Return a list of violation strings (empty == invariant holds).

    ``window`` is the priority prefix (only its first ``window_size``
    entries count as this round's driver window); ``registry`` is every
    key ``queries()`` exposes; ``history`` maps past round number ->
    keys green that round.  "This round" is max(history) + 1.
    """
    errs: list[str] = []
    reg = set(registry)
    win = [k for k in window][:window_size]
    win_set = set(win)

    ghosts = [k for k in win if k not in reg]
    if ghosts:
        errs.append(f"W1 window names non-registry keys: {sorted(ghosts)}")

    this_round = (max(history) + 1) if history else 1
    last_row: dict[str, int] = {}
    for rnd in sorted(history):
        for key in history[rnd]:
            last_row[key] = rnd

    never = sorted(k for k in reg if k not in last_row and k not in win_set)
    if never:
        errs.append(f"W3 never-driver-checked keys outside window: {never}")

    overdue = []
    for key in sorted(reg):
        if key in win_set or key not in last_row:
            continue  # refreshed this round / handled by W3
        age = this_round - last_row[key]
        if age > max_age:
            overdue.append(f"{key} (last row r{last_row[key]}, age {age})")
    if overdue:
        errs.append(f"W2 driver-row age exceeds {max_age}: {overdue}")

    capacity = (max_age + 1) * window_size
    if len(reg) > capacity:
        errs.append(f"W4 registry {len(reg)} keys exceeds rotation "
                    f"capacity {capacity} ({max_age + 1} x {window_size})")

    # feasibility one round ahead: after this round, a key's last row
    # is this_round if windowed, else unchanged.  Keys whose post-round
    # last row is (this_round - max_age) MUST lead next round's window.
    mandatory_next = sorted(
        k for k in reg
        if k not in win_set
        and last_row.get(k) == this_round - max_age
    )
    if len(mandatory_next) > window_size:
        errs.append(f"W5 next round needs {len(mandatory_next)} mandatory "
                    f"slots > {window_size}: rotation is infeasible")
    return errs


def main() -> int:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry  # noqa: PLC0415

    registry = list(entry.queries())
    window = list(entry._PRIORITY_KEYS)
    history = load_history()
    errs = check(window, registry, history)
    this_round = (max(history) + 1) if history else 1
    if errs:
        print(f"window_check r{this_round}: INVARIANT BROKEN")
        for e in errs:
            print(f"  {e}")
        return 1
    n_window = len([k for k in window[:WINDOW] if k in set(registry)])
    print(f"window_check r{this_round}: OK — {len(registry)} registry keys, "
          f"{n_window} in window, capacity {(MAX_AGE + 1) * WINDOW}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
