"""Single source of truth for "which round is this?" across the
process tools (window_check, round_check, perf_regress).

Three tools previously inferred the round independently as
``max(CORRECTNESS_r*.json) + 1`` and all misbehaved in the same
inter-round state (VERDICT r11, What's wrong #1/#3): the moment the
driver drops round N's (still-untracked) CORRECTNESS file, "+1" jumps
to N+1 even though the live ``_PRIORITY_KEYS`` window and the bench
artifacts still belong to round N — window_check projected a phantom
W2 breach and perf_regress printed NOT-READY for a round nobody had
started.  The missing concept is the POST-ROUND state, detectable from
git alone:

  post-round  = the newest CORRECTNESS artifact landed and NO engine
                input (bench.py, __spark_entry__.py, the package,
                tools/) has changed since — committed or uncommitted.
                The live round is N (just finished); the next window
                has not been laid yet.
  mid-round   = engine work exists after the newest artifact (the
                builder has started round N+1; the very first commit
                is supposed to be the window rotation, and
                window_check's W2 projection enforces exactly that).

``round_state()`` returns (newest_recorded, post_round, round): the
``round`` field is what every consumer should use — N in post-round
state, N+1 in mid-round state.
"""

from __future__ import annotations

import os
import re
import subprocess
from dataclasses import dataclass

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENGINE_INPUTS = ["bench.py", "__spark_entry__.py",
                 "university_data_lakehouse_spark", "tools"]


@dataclass(frozen=True)
class RoundState:
    newest_recorded: int   # max N over CORRECTNESS_rN.json (0 if none)
    post_round: bool       # artifact landed, zero engine work since
    round: int             # the live round: N post-round, N+1 mid-round


def _git(repo: str, *args: str) -> str:
    try:
        return subprocess.run(
            ["git", "-C", repo, *args], check=True,
            capture_output=True, text=True).stdout.strip()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return ""


def correctness_files(repo: str = REPO) -> dict[int, str]:
    """Round number -> CORRECTNESS filename, from the working tree.

    Working-tree listing (not git ls-files) is deliberate: the
    driver's just-dropped untracked file is exactly the signal that
    flips ``post_round`` — hiding it would re-create the r11 phantom-
    W2 bug in the opposite direction (a stale mid-round projection
    against a window that already ran)."""
    out: dict[int, str] = {}
    for name in os.listdir(repo):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", name)
        if m:
            out[int(m.group(1))] = name
    return out


def round_state(repo: str = REPO) -> RoundState:
    files = correctness_files(repo)
    if not files:
        return RoundState(0, False, 1)
    n = max(files)

    # uncommitted engine edits: the builder is working — mid-round,
    # whatever the artifact's git state (this is the forcing function:
    # a builder who starts engine work before rotating the window sees
    # the W2 projection immediately)
    if _git(repo, "status", "--porcelain", "--", *ENGINE_INPUTS):
        return RoundState(n, False, n + 1)

    # newest artifact untracked/modified: the driver just wrote it and
    # no engine work has followed — the canonical post-round state
    if _git(repo, "status", "--porcelain", "--", files[n]):
        return RoundState(n, True, n)

    art_commit = _git(repo, "log", "-1", "--format=%H", "--", files[n])
    eng_commit = _git(repo, "log", "-1", "--format=%H", "--",
                      *ENGINE_INPUTS)
    if not art_commit or not eng_commit or art_commit == eng_commit:
        # unknowable or a shared commit (engine changed at-or-after
        # the artifact): treat as mid-round, the strict reading
        return RoundState(n, False, n + 1)
    post = subprocess.run(
        ["git", "-C", repo, "merge-base", "--is-ancestor",
         eng_commit, art_commit],
        capture_output=True).returncode == 0
    return RoundState(n, post, n if post else n + 1)
