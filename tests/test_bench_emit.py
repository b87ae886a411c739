"""bench.emit contract: the stdout line must always survive the
driver's bounded output tail, and the sidecar must be byte-complete.

The driver keeps the last ~2000 chars of bench output and parses the
JSON line from that tail; the full result outgrew it at r6 and every
driver BENCH_r{6..10}.json recorded parsed:null. These tests pin the
fix: one compact line <= 1800 chars for ANY registry size, most
expensive queries kept when truncation is needed, full result intact
in bench_full.json.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _emit(out, tmp_path):
    sidecar = tmp_path / "bench_full.json"
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.emit(out, full_path=str(sidecar))
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 1, "emit must print exactly ONE line"
    return json.loads(lines[0]), len(lines[0]), sidecar


def test_small_result_keeps_every_query(tmp_path):
    out = {"metric": "headline_total_runtime", "value": 1.0,
           "core_total": 0.5, "sf": 0.1,
           "queries": {f"q{i}": i / 10 for i in range(10)}}
    d, n, sidecar = _emit(out, tmp_path)
    assert n <= 1800
    assert len(d["queries"]) == 10 and d["n_queries"] == 10
    assert json.loads(sidecar.read_text()) == out


def test_oversized_result_keeps_most_expensive_queries(tmp_path):
    # 200 long-named keys cannot fit: truncation must keep the top
    # spenders, and n_queries must still report the full count
    out = {"metric": "headline_total_runtime", "value": 1.0,
           "core_total": 0.5, "sf": 0.1,
           "queries": {f"a_very_long_operator_name_{i:04d}": float(i)
                       for i in range(200)}}
    d, n, _ = _emit(out, tmp_path)
    assert n <= 1800
    kept = d["queries"]
    assert 0 < len(kept) < 200 and d["n_queries"] == 200
    cheapest_kept = min(kept.values())
    dropped = [v for k, v in out["queries"].items() if k not in kept]
    assert all(v <= cheapest_kept for v in dropped)


def test_line_parses_out_of_a_2000_char_tail(tmp_path):
    out = {"metric": "headline_total_runtime", "value": 1.0,
           "core_total": 0.5, "sf": 0.1,
           "queries": {f"query_{i:03d}": float(i) for i in range(80)},
           "sf1_synth": {"queries": {}, "total": 0.0, "core_total": 9.9}}
    d, n, _ = _emit(out, tmp_path)
    line = json.dumps(d, separators=(",", ":"))
    tail = ("# stderr noise line\n" * 50 + line + "\n")[-2000:]
    parsed = None
    for ln in tail.splitlines():
        try:
            parsed = json.loads(ln)
            break
        except json.JSONDecodeError:
            continue
    assert parsed and parsed["metric"] == "headline_total_runtime"
    assert parsed["sf1_core_total"] == 9.9
