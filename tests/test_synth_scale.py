"""Tests for tools/synth_scale.py — the upward-scale synthesizer.

The bench's ``sf1_synth`` section is only meaningful if the replicated
data is a faithful 10x: disjoint key ranges, intact FK chains, fixed
dims untouched, schemas byte-compatible with the source, and the
text/embedding perturbations behaving as documented.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from synth_scale import FIXED, KEY_DOMAINS, synthesize  # noqa: E402

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("synth"))
    synthesize(SRC, out, replicas=3)
    return out


def _q(sql):
    return duckdb.connect().execute(sql).fetchall()


def test_row_counts_scale_linearly(synth_dir):
    for t in KEY_DOMAINS:
        src_n = _q(f"SELECT count(*) FROM '{SRC}/{t}.parquet'")[0][0]
        out_n = _q(f"SELECT count(*) FROM '{synth_dir}/{t}.parquet'")[0][0]
        assert out_n == 3 * src_n, t


def test_fixed_dims_untouched(synth_dir):
    for t in FIXED:
        diff = _q(
            f"SELECT count(*) FROM ("
            f"  (SELECT * FROM '{SRC}/{t}.parquet'"
            f"   EXCEPT SELECT * FROM '{synth_dir}/{t}.parquet')"
            f"  UNION ALL"
            f"  (SELECT * FROM '{synth_dir}/{t}.parquet'"
            f"   EXCEPT SELECT * FROM '{SRC}/{t}.parquet'))")[0][0]
        assert diff == 0, t


def test_keys_disjoint_across_replicas(synth_dir):
    # every surrogate key stays unique after replication => ranges are
    # disjoint (a collision between replicas would dedupe the count)
    for t, keys in KEY_DOMAINS.items():
        if t == "lineitem":
            continue  # lineitem's grain is (orderkey, linenumber)
        col = keys[0][0]
        n, d = _q(f"SELECT count(*), count(DISTINCT {col}) "
                  f"FROM '{synth_dir}/{t}.parquet'")[0]
        assert n == d, t


def test_fk_chains_intact(synth_dir):
    orphans = _q(
        f"SELECT count(*) FROM '{synth_dir}/lineitem.parquet' l "
        f"LEFT JOIN '{synth_dir}/orders.parquet' o "
        f"ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL")[0][0]
    assert orphans == 0
    orphans = _q(
        f"SELECT count(*) FROM '{synth_dir}/orders.parquet' o "
        f"LEFT JOIN '{synth_dir}/customer.parquet' c "
        f"ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL")[0][0]
    assert orphans == 0
    # replicated FKs into the UN-replicated dims must still resolve
    orphans = _q(
        f"SELECT count(*) FROM '{synth_dir}/customer.parquet' c "
        f"LEFT JOIN '{synth_dir}/nation.parquet' n "
        f"ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL")[0][0]
    assert orphans == 0


def test_timestamps_not_shifted(synth_dir):
    src = _q(f"SELECT min(o_orderdate), max(o_orderdate) "
             f"FROM '{SRC}/orders.parquet'")[0]
    out = _q(f"SELECT min(o_orderdate), max(o_orderdate) "
             f"FROM '{synth_dir}/orders.parquet'")[0]
    assert src == out


def test_document_text_perturbation(synth_dir):
    # replica 0 byte-identical; other replicas length-preserving ciphers
    # that share no text with each other
    src_rows = dict(_q(f"SELECT doc_id, text FROM '{SRC}/documents.parquet'"))
    out_rows = dict(
        _q(f"SELECT doc_id, text FROM '{synth_dir}/documents.parquet'"))
    stride = max(
        10 ** len(str(max(src_rows))), 10)
    for doc_id, text in src_rows.items():
        assert out_rows[doc_id] == text  # replica 0 untouched
        r1 = out_rows[doc_id + stride]
        assert len(r1) == len(text) and r1 != text
    # n_chars stays consistent with the rotated text
    bad = _q(f"SELECT count(*) FROM '{synth_dir}/documents.parquet' "
             f"WHERE length(text) != n_chars")[0][0]
    src_bad = _q(f"SELECT count(*) FROM '{SRC}/documents.parquet' "
                 f"WHERE length(text) != n_chars")[0][0]
    assert bad == 3 * src_bad  # cipher introduces no NEW inconsistency


def test_embeddings_perturbed_but_close(synth_dir):
    max_vec = _q(f"SELECT max(vec_id) FROM '{SRC}/embeddings.parquet'")[0][0]
    stride = 10
    while stride <= max_vec:
        stride *= 10
    rows = _q(
        f"SELECT s.embedding, o.embedding "
        f"FROM '{SRC}/embeddings.parquet' s "
        f"JOIN '{synth_dir}/embeddings.parquet' o "
        f"ON o.vec_id = s.vec_id + {stride} LIMIT 50")
    assert rows, f"replica-1 vec_ids expected at stride {stride}"
    for src_vec, out_vec in rows:
        deltas = [abs(a - b) for a, b in zip(src_vec, out_vec)]
        assert max(deltas) > 0.0  # actually perturbed
        assert max(deltas) < 0.1  # but small: cluster structure kept


def test_scale_report_classification():
    """Pure-python slope classifier: superlinear flags exclude the
    documented quadratic baselines; overhead- vs data-bound split at
    the ratio thresholds."""
    import sys
    sys.path.insert(0, "tools")
    from scale_report import report

    base = {"a": 1.0, "b": 1.0, "sim_knn_bruteforce": 1.0, "gone": 1.0,
            "dedup_embedding_lsh": 1.0}
    big = {"a": 20.0, "b": 8.0, "sim_knn_bruteforce": 50.0, "new": 9.9,
           "dedup_embedding_lsh": 14.0}
    rows = {r["query"]: r for r in report(base, big)}
    assert rows["a"]["class"].startswith("SUPERLINEAR")
    assert rows["b"]["class"] == "data-bound (healthy linear)"
    assert rows["sim_knn_bruteforce"]["class"].startswith("quadratic-baseline")
    assert rows["dedup_embedding_lsh"]["class"].startswith("quadratic-baseline")
    assert "new" not in rows and "gone" not in rows


def test_scale_report_step_scaled_thresholds():
    """r6 ADVICE: thresholds scale with the data step — the same
    ratio classifies differently under a 10x vs a 100x step."""
    import sys
    sys.path.insert(0, "tools")
    from scale_report import classify

    # ratio 20 is superlinear for a 10x step, overhead-bound for 100x
    assert classify(20.0, "a", step=10.0).startswith("SUPERLINEAR")
    assert classify(20.0, "a", step=100.0) == "overhead-bound at this scale"
    assert classify(80.0, "a", step=100.0) == "data-bound (healthy linear)"
    assert classify(130.0, "a", step=100.0).startswith("SUPERLINEAR")
