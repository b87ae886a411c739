"""tools/roundinfo.py — the shared post-round/mid-round detector.

Every scenario is a throwaway git repo shaped like the real one. The
states mirror the actual round lifecycle: (1) builder working after
the previous round's artifacts were committed -> mid-round N+1;
(2) driver drops round N's untracked CORRECTNESS file at round end ->
post-round N (the judged-HEAD state that produced the r11 phantom-W2
red suite); (3) next builder commits the artifact but hasn't touched
the engine yet -> still post-round N; (4) first engine edit
(committed or not) -> mid-round N+1 again.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.roundinfo import round_state


def _git(repo, *args):
    subprocess.run(["git", "-C", str(repo), *args], check=True,
                   capture_output=True)


@pytest.fixture()
def repo(tmp_path):
    _git(tmp_path, "init", "-q")
    _git(tmp_path, "config", "user.email", "t@example.com")
    _git(tmp_path, "config", "user.name", "t")
    (tmp_path / "bench.py").write_text("# bench\n")
    (tmp_path / "__spark_entry__.py").write_text("# entry\n")
    (tmp_path / "university_data_lakehouse_spark").mkdir()
    (tmp_path / "university_data_lakehouse_spark" / "op.py").write_text(
        "x = 1\n")
    (tmp_path / "tools").mkdir()
    (tmp_path / "tools" / "t.py").write_text("y = 1\n")
    _git(tmp_path, "add", "-A")
    _git(tmp_path, "commit", "-qm", "engine")
    return tmp_path


def test_no_correctness_files_is_round_one(repo):
    s = round_state(str(repo))
    assert (s.newest_recorded, s.post_round, s.round) == (0, False, 1)


def test_engine_commit_after_artifact_is_mid_round(repo):
    (repo / "CORRECTNESS_r03.json").write_text("{}")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "r3 artifacts")
    (repo / "university_data_lakehouse_spark" / "op.py").write_text("x = 2\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "r4 work")
    s = round_state(str(repo))
    assert (s.newest_recorded, s.post_round, s.round) == (3, False, 4)


def test_untracked_artifact_is_post_round(repo):
    # the driver's end-of-round drop: newest CORRECTNESS untracked,
    # engine clean — exactly the judged-HEAD state
    (repo / "CORRECTNESS_r03.json").write_text("{}")
    _git(repo, "add", "CORRECTNESS_r03.json")
    _git(repo, "commit", "-qm", "r3 artifacts")
    (repo / "CORRECTNESS_r04.json").write_text("{}")
    s = round_state(str(repo))
    assert (s.newest_recorded, s.post_round, s.round) == (4, True, 4)


def test_committed_artifact_with_no_engine_work_is_post_round(repo):
    # next round's builder committed the driver files first but has
    # not rotated yet
    (repo / "CORRECTNESS_r05.json").write_text("{}")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "r5 artifacts")
    s = round_state(str(repo))
    assert (s.newest_recorded, s.post_round, s.round) == (5, True, 5)


def test_dirty_engine_forces_mid_round(repo):
    # builder started round 5 (uncommitted engine edit) before
    # rotating — projection semantics must apply immediately
    (repo / "CORRECTNESS_r04.json").write_text("{}")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "r4 artifacts")
    (repo / "bench.py").write_text("# modified\n")
    s = round_state(str(repo))
    assert (s.newest_recorded, s.post_round, s.round) == (4, False, 5)


def test_shared_commit_is_mid_round(repo):
    # artifact and engine change in ONE commit: ordering unprovable,
    # strict reading applies (same rule as round_check R3)
    (repo / "CORRECTNESS_r02.json").write_text("{}")
    (repo / "university_data_lakehouse_spark" / "op.py").write_text("x = 9\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "artifact + engine together")
    s = round_state(str(repo))
    assert (s.newest_recorded, s.post_round, s.round) == (2, False, 3)


def test_real_repo_state_is_coherent():
    s = round_state()
    assert s.newest_recorded >= 11
    assert s.round in (s.newest_recorded, s.newest_recorded + 1)
    assert s.round == (s.newest_recorded if s.post_round
                       else s.newest_recorded + 1)
