"""Column-pruning audit across the whole registry.

At 100 TB the difference between a parquet scan reading 3 columns and
one reading all 16 of lineitem is the dominant I/O term — SURVEY §6's
"push down and prune" claim. tests/test_plan_shape.py pins pruning for
a handful of named plans; this tool sweeps EVERY registry key's
formatted plan and flags any parquet scan whose ReadSchema covers
(nearly) the full width of a wide table, so a refactor that silently
drops a projection (e.g. ``select('*')`` before a narrow aggregate)
fails the round chain instead of shipping.

Classifier: for each ``Scan parquet`` block, pair the Location's table
with its ReadSchema column count; flag when the table is WIDE (>=
``MIN_WIDTH`` columns) and the scan reads more than ``MAX_FRACTION``
of them.  Silver conformance legitimately projects most of its source
(the reference's transforms keep ~all columns) — those keys are
allowlisted with the reason inline, the HIGH_VARIANCE-set discipline.

Usage: python tools/prune_audit.py [--sf-dir DIR] [--keys k1,k2,...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# physical widths of the testdata tables (columns)
TABLE_WIDTHS = {
    "lineitem": 16, "orders": 9, "customer": 8, "part": 9,
    "supplier": 7, "nation": 4, "region": 3,
    "events": 6, "documents": 6, "embeddings": 3,
}
MIN_WIDTH = 6        # narrow dims may be read whole — that's fine
MAX_FRACTION = 0.85  # scans reading > this fraction of a wide table

# keys whose full-width scans are the OPERATOR'S CONTRACT, not a
# pruning miss — each with the reason. Anything else reading a wide
# table whole is a finding.
ALLOW: dict[str, str] = {
    # silver conformance mirrors the reference transforms, which KEEP
    # nearly every source column (defs/silver_transforms/defs.yaml)
    "silver_dim_customers": "conformance keeps the full customer row",
    "silver_dim_parts": "conformance keeps the full part row",
    "silver_fact_lineitems": "conformance keeps the full lineitem row",
    "silver_fact_orders": "conformance keeps the full orders row",
    # per-table profiling / quality sweeps must touch every column by
    # definition
    "dq_profile": "profiles every column of every table",
    "dq_not_null_pk": "null-scans each table's full width",
    "dq_no_duplicates": "hashes full rows to find exact duplicates",
    "dq_row_count": "unioned per-table counts read whole tables",
    "corpus_manifest": "manifests carry the full shard row",
}


def top_level_fields(body: str) -> int:
    """Count struct fields at bracket depth 0 — `struct<a:int,
    b:array<struct<x:int,y:int>>>` is TWO columns, not four. The old
    `[^>]*` regex truncated at the first `>` of any nested type and
    the flat `,`-split counted nested members as columns, so a wide
    scan with nested columns could be miscounted (ADVICE r12; latent
    on the flat testdata, real for any nested-schema source)."""
    depth, n = 0, 0
    for chunk in body.split(","):
        if depth == 0 and ":" in chunk:
            n += 1
        depth += chunk.count("<") - chunk.count(">")
    return n


def scan_blocks(plan: str):
    """Yield (table, n_columns_read) for each parquet scan block."""
    for block in re.split(r"\(\d+\) Scan parquet", plan)[1:]:
        loc = re.search(r"Location:.*?\[([^\]]*)\]", block)
        # greedy to the LAST '>' on the line so nested types stay in
        rs = re.search(r"ReadSchema: struct<(.*)>", block)
        if not loc or not rs:
            continue
        table = next((t for t in TABLE_WIDTHS
                      if f"{t}.parquet" in loc.group(1)), None)
        if table is None:
            continue
        yield table, top_level_fields(rs.group(1))


def classify(key: str, plan: str) -> list[str]:
    """Violation strings for one key's formatted plan (pure logic —
    unit-tested on synthetic plans)."""
    out = []
    for table, ncols in scan_blocks(plan):
        width = TABLE_WIDTHS[table]
        if width < MIN_WIDTH:
            continue
        if ncols > MAX_FRACTION * width and key not in ALLOW:
            out.append(f"{key}: scans {ncols}/{width} columns of "
                       f"{table} — projection not pushed down")
    return out


def audit(keys, sf_dir: str) -> list[str]:
    import __spark_entry__ as entry_mod  # noqa: PLC0415
    from university_data_lakehouse_spark.session import (  # noqa: PLC0415
        get_spark,
    )

    spark = get_spark("prune-audit")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    errs: list[str] = []
    for key in keys:
        try:
            df = queries[key](spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            errs += classify(key, buf.getvalue())
        except Exception as exc:  # plan build must never crash silently
            errs.append(f"{key}: explain failed: {exc}")
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--keys", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry_mod  # noqa: PLC0415

    keys = (args.keys.split(",") if args.keys
            else list(entry_mod.queries()))
    errs = audit(keys, args.sf_dir)
    if errs:
        print(f"prune_audit: {len(errs)} unpruned wide scan(s)")
        for e in errs:
            print(f"  {e}")
        return 1
    print(f"prune_audit: OK — {len(keys)} keys, zero unpruned wide "
          f"scans (>{MAX_FRACTION:.0%} of a >= {MIN_WIDTH}-column "
          "table outside the documented allowlist)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
