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
      regression forces the key back into a window;
  W7. more than NEW_KEY_BUDGET (1) never-driver-checked keys exist
      mid-round — the registry endgame policy (SURVEY §2, r13): at
      147/150 capacity, growth is at most ONE new oracle key per
      round, into a spare window slot, so rotation planning stays
      feasible all the way to the 150-key ceiling.

In the POST-ROUND state (tools/roundinfo.py: the newest CORRECTNESS
artifact landed and no engine input changed since), W2/W3 projections
against the stale window would be phantom breaches — the live ordering
belongs to the round that already ran.  There the tool enforces only
RECORDED ages plus next-window feasibility (W5); the moment the
builder touches any engine input, mid-round projection resumes, which
forces the rotation to be the first commit of the new round.

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
NEW_KEY_BUDGET = 1  # max new (never-driver-checked) keys per round


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
          window_size: int = WINDOW, max_age: int = MAX_AGE,
          post_round: bool = False) -> list[str]:
    """Return a list of violation strings (empty == invariant holds).

    ``window`` is the priority prefix (only its first ``window_size``
    entries count as this round's driver window); ``registry`` is every
    key ``queries()`` exposes; ``history`` maps past round number ->
    keys green that round.

    ``post_round`` (see tools/roundinfo.py) flips the semantics for
    the inter-round state where the newest CORRECTNESS round already
    RAN but the next round's window has not been laid yet: projecting
    W2/W3 against the stale ordering would be a phantom breach (the
    r11 red-suite bug), so instead only what is RECORDED is enforced
    (no key's age ever exceeded max_age in committed history) plus the
    W5 feasibility of the mandatory next window.  Mid-round — the
    builder has started the new round — the full projection applies,
    which is the rotate-first forcing function.
    """
    errs: list[str] = []
    reg = set(registry)
    win = [k for k in window][:window_size]
    win_set = set(win)

    ghosts = [k for k in win if k not in reg]
    if ghosts:
        errs.append(f"W1 window names non-registry keys: {sorted(ghosts)}")

    if not history:
        this_round = 1
    elif post_round:
        this_round = max(history)   # the round that just finished
    else:
        this_round = max(history) + 1
    last_row: dict[str, int] = {}
    for rnd in sorted(history):
        for key in history[rnd]:
            last_row[key] = rnd

    capacity = (max_age + 1) * window_size
    if len(reg) > capacity:
        errs.append(f"W4 registry {len(reg)} keys exceeds rotation "
                    f"capacity {capacity} ({max_age + 1} x {window_size})")

    if post_round:
        # RECORDED breach: a key's age exceeded max_age at the round
        # that just ran — a rotation actually missed, never a
        # projection artifact.
        breached = [
            f"{k} (last row r{last_row[k]}, age {this_round - last_row[k]})"
            for k in sorted(reg)
            if k in last_row and this_round - last_row[k] > max_age
        ]
        if breached:
            errs.append(
                f"W2 recorded driver-row age exceeds {max_age}: {breached}")
        # feasibility of the NEXT round's window: keys that would age
        # past max_age if not windowed in round this_round+1, plus
        # never-driver-checked keys (their first eligible round is
        # next round — W3's post-round form).
        mandatory = sorted(
            k for k in reg
            if last_row.get(k, -(10 ** 9)) <= this_round - max_age
        )
        if len(mandatory) > window_size:
            errs.append(
                f"W5 next round needs {len(mandatory)} mandatory "
                f"slots > {window_size}: rotation is infeasible")
        return errs

    never = sorted(k for k in reg if k not in last_row and k not in win_set)
    if never:
        errs.append(f"W3 never-driver-checked keys outside window: {never}")

    # endgame new-key budget (SURVEY §2 policy, r13): only bind once
    # a history exists — in round 1 every key is legitimately new.
    if history:
        new_keys = sorted(k for k in reg if k not in last_row)
        if len(new_keys) > NEW_KEY_BUDGET:
            errs.append(f"W7 {len(new_keys)} new keys exceed the "
                        f"per-round budget {NEW_KEY_BUDGET}: {new_keys}")

    overdue = []
    for key in sorted(reg):
        if key in win_set or key not in last_row:
            continue  # refreshed this round / handled by W3
        age = this_round - last_row[key]
        if age > max_age:
            overdue.append(f"{key} (last row r{last_row[key]}, age {age})")
    if overdue:
        errs.append(f"W2 driver-row age exceeds {max_age}: {overdue}")

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
    from tools.roundinfo import round_state  # noqa: PLC0415

    registry = list(entry.queries())
    window = list(entry._PRIORITY_KEYS)
    history = load_history()
    state = round_state()
    errs = check(window, registry, history, post_round=state.post_round)
    mode = "post-round" if state.post_round else "mid-round"
    if errs:
        print(f"window_check r{state.round} ({mode}): INVARIANT BROKEN")
        for e in errs:
            print(f"  {e}")
        return 1
    n_window = len([k for k in window[:WINDOW] if k in set(registry)])
    print(f"window_check r{state.round} ({mode}): OK — "
          f"{len(registry)} registry keys, "
          f"{n_window} in window, capacity {(MAX_AGE + 1) * WINDOW}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
