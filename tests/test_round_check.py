"""tools/round_check.py's artifact-freshness logic on a fixture repo.

The R3 git-ancestry rules (artifact must be committed AFTER the last
bench-input commit, never IN the same commit, inputs clean) are what
make the per-round bench numbers provable — and they were built in
response to two real process lapses (r9: artifacts missing entirely;
r10: bench committed at a non-final HEAD). Each scenario here is one
of those failure shapes reconstructed in a throwaway git repo.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import round_check


def _git(repo, *args):
    subprocess.run(["git", "-C", str(repo), *args], check=True,
                   capture_output=True)


GOOD_BENCH = {
    "metric": "headline_total_runtime", "value": 1.0, "unit": "sec",
    "queries": {"q1": 1.0},
    "sf1_synth": {"queries": {"q1": 2.0}, "total": 2.0},
}


@pytest.fixture()
def repo(tmp_path, monkeypatch):
    """A throwaway git repo shaped like the real one: bench inputs +
    a CORRECTNESS_r01.json so current_round() == 2."""
    _git(tmp_path, "init", "-q")
    _git(tmp_path, "config", "user.email", "t@example.com")
    _git(tmp_path, "config", "user.name", "t")
    (tmp_path / "bench.py").write_text("# bench\n")
    (tmp_path / "__spark_entry__.py").write_text("# entry\n")
    (tmp_path / "university_data_lakehouse_spark").mkdir()
    (tmp_path / "university_data_lakehouse_spark" / "op.py").write_text("x=1\n")
    (tmp_path / "tools").mkdir()
    (tmp_path / "tools" / "t.py").write_text("y=1\n")
    (tmp_path / "CORRECTNESS_r01.json").write_text("{}")
    _git(tmp_path, "add", "-A")
    _git(tmp_path, "commit", "-qm", "engine")
    monkeypatch.setattr(round_check, "REPO", str(tmp_path))
    return tmp_path


def _write_artifacts(repo):
    (repo / "BENCH_r02_local.json").write_text(json.dumps(GOOD_BENCH))
    (repo / "SCALE_REPORT_r02.txt").write_text("# scale report\n" + "x" * 300)


def test_current_round_is_max_correctness_plus_one(repo):
    assert round_check.current_round() == 2


def test_artifact_committed_after_engine_is_fresh(repo):
    _write_artifacts(repo)
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "artifacts")
    assert round_check.check_round(2) == []


def test_uncommitted_artifact_with_clean_inputs_is_accepted(repo):
    # the just-ran-about-to-commit state
    _write_artifacts(repo)
    assert round_check.check_round(2) == []


def test_artifact_sharing_a_commit_with_engine_fails(repo):
    _write_artifacts(repo)
    (repo / "university_data_lakehouse_spark" / "op.py").write_text("x=2\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "engine + artifacts together")
    errs = round_check.check_round(2)
    assert any("share commit" in e for e in errs)


def test_engine_commit_after_artifact_fails(repo):
    # the r10 near-miss: timings describe code that no longer exists
    _write_artifacts(repo)
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "artifacts")
    (repo / "university_data_lakehouse_spark" / "op.py").write_text("x=3\n")
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "late engine change")
    errs = round_check.check_round(2)
    assert any("changed later" in e for e in errs)


def test_dirty_bench_inputs_fail(repo):
    _write_artifacts(repo)
    _git(repo, "add", "-A")
    _git(repo, "commit", "-qm", "artifacts")
    (repo / "bench.py").write_text("# modified, uncommitted\n")
    errs = round_check.check_round(2)
    assert any("uncommitted" in e for e in errs)


def test_missing_artifacts_fail(repo):
    errs = round_check.check_round(2)
    assert any("R1" in e for e in errs)
    assert any("R2" in e for e in errs)


def test_bench_without_sf1_synth_section_fails(repo):
    bad = {k: v for k, v in GOOD_BENCH.items() if k != "sf1_synth"}
    (repo / "BENCH_r02_local.json").write_text(json.dumps(bad))
    (repo / "SCALE_REPORT_r02.txt").write_text("# scale report\n" + "x" * 300)
    errs = round_check.check_round(2)
    assert any("sf1_synth" in e for e in errs)


def test_corrupt_bench_json_fails(repo):
    # the r11 incident: a GC warning line captured instead of JSON
    (repo / "BENCH_r02_local.json").write_text(
        "[warning][gc,alloc] Retried waiting for GCLocker\n")
    (repo / "SCALE_REPORT_r02.txt").write_text("# scale report\n" + "x" * 300)
    errs = round_check.check_round(2)
    assert any("unreadable" in e for e in errs)
