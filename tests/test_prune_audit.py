"""tools/prune_audit.py — the registry-wide column-pruning sweep.

The classifier is pure string logic over formatted plans; these tests
feed it synthetic scan blocks so each policy edge (wide vs narrow
table, fraction threshold, allowlist) is pinned without a Spark
session. The real-repo sweep runs in the round chain
(python tools/prune_audit.py), not here — 147 explains are minutes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.prune_audit import ALLOW, classify, scan_blocks


def _plan(table: str, cols: list[str]) -> str:
    struct = ",".join(f"{c}:bigint" for c in cols)
    return (
        "== Physical Plan ==\n"
        "(1) Scan parquet \n"
        f"Location: InMemoryFileIndex [file:/x/{table}.parquet]\n"
        f"ReadSchema: struct<{struct}>\n"
    )


def test_scan_blocks_pair_table_with_width():
    plan = _plan("lineitem", ["l_orderkey", "l_partkey"])
    assert list(scan_blocks(plan)) == [("lineitem", 2)]


def test_narrow_projection_of_wide_table_passes():
    plan = _plan("lineitem", [f"c{i}" for i in range(3)])
    assert classify("some_key", plan) == []


def test_full_width_scan_of_wide_table_flags():
    plan = _plan("lineitem", [f"c{i}" for i in range(16)])
    errs = classify("some_key", plan)
    assert len(errs) == 1 and "16/16" in errs[0]


def test_narrow_table_read_whole_is_fine():
    # nation is 4 columns — reading it whole is not a finding
    plan = _plan("nation", ["a", "b", "c", "d"])
    assert classify("some_key", plan) == []


def test_allowlisted_key_passes_with_reason_recorded():
    plan = _plan("lineitem", [f"c{i}" for i in range(16)])
    assert classify("silver_fact_lineitems", plan) == []
    assert "lineitem" in ALLOW["silver_fact_lineitems"]


def test_unknown_table_is_ignored():
    plan = _plan("sometable", [f"c{i}" for i in range(30)])
    assert classify("some_key", plan) == []


def test_allowlist_names_only_registry_keys():
    import __spark_entry__ as entry_mod

    reg = set(entry_mod.queries())
    ghosts = [k for k in ALLOW if k not in reg]
    assert not ghosts, f"allowlist names non-registry keys: {ghosts}"


def test_nested_types_count_as_one_column():
    """ADVICE r12: `struct<([^>]*)>` truncated at the first `>` of a
    nested type and the flat comma-split miscounted parameterized
    types — a wide scan with nested columns could pass the audit."""
    from tools.prune_audit import top_level_fields

    assert top_level_fields("a:int,b:bigint") == 2
    assert top_level_fields("a:array<int>,b:int") == 2
    assert top_level_fields(
        "a:struct<x:int,y:struct<p:int,q:int>>,b:map<string,int>,"
        "c:array<struct<u:double,v:double>>") == 3
    assert top_level_fields("") == 0

    # end-to-end through scan_blocks: 3 nested columns of the 8-wide
    # documents table must be 3, not 6 (flat split) or 1 (truncation)
    plan = (
        "== Physical Plan ==\n"
        "(1) Scan parquet \n"
        "Location: InMemoryFileIndex [file:/x/documents.parquet]\n"
        "ReadSchema: struct<a:array<struct<x:int,y:int>>,"
        "b:map<string,int>,c:int>\n"
    )
    assert list(scan_blocks(plan)) == [("documents", 3)]
