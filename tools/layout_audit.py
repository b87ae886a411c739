"""Full-registry partition-layout invariance audit.

tests/test_partition_invariance.py gates 10 order-sensitive
representatives every run; this tool sweeps EVERY registry key under
the same hostile layout (prime shuffle partition count + 64 KiB file
splits fragmenting the scans, optionally a non-UTC session timezone)
and demands the identical bit-exact DuckDB parity the normal-layout
oracle gate demands.  A pass is the local proxy for "the answer does
not change when the cluster gets 100x more executors"; any accidental
dependence on partition count, in-partition row order, or scan-split
boundaries shows up as a hash mismatch.

The r5 audit covered the then-96-key registry (96/96 exact, recorded
in SURVEY §5 item 9); the registry has since grown to 146 keys — run
this each time the audit claim is re-asserted:

    python tools/layout_audit.py                 # hostile layout
    python tools/layout_audit.py --tz America/New_York
    python tools/layout_audit.py --sf /root/testdata/sf0.01
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--tz", default=None,
                    help="also set a non-UTC session timezone")
    ap.add_argument("--keys", nargs="+", default=None)
    args = ap.parse_args()

    import __spark_entry__ as entry  # noqa: PLC0415
    from tests.oracle_utils import compare  # noqa: PLC0415
    # ONE definition of the hostile layout — the pytest gate and this
    # audit must stress the identical configuration or the SURVEY
    # "same hostile layout" claim silently weakens (r11 review)
    from tests.test_partition_invariance import HOSTILE  # noqa: PLC0415
    from university_data_lakehouse_spark.session import get_spark  # noqa: PLC0415

    queries, oracles = entry.queries(), entry.oracle_sql()
    if args.keys:
        unknown = [k for k in args.keys
                   if k not in queries or k not in oracles]
        if unknown:
            # argument error, NOT a parity failure — a typo must never
            # be recordable as a broken invariance claim (r11 review)
            ap.error(f"unknown/oracle-less keys: {', '.join(unknown)}")
    keys = args.keys or [k for k in queries if k in oracles]

    spark = get_spark()
    for k, v in HOSTILE.items():
        spark.conf.set(k, v)
    if args.tz:
        spark.conf.set("spark.sql.session.timeZone", args.tz)
    t0 = time.time()
    failed: list[str] = []
    for i, key in enumerate(keys, 1):
        try:
            spark.catalog.clearCache()
            compare(queries[key](spark, args.sf), oracles[key], args.sf,
                    name=f"{key}@layout-audit")
            status = "ok"
        except Exception:  # noqa: BLE001
            failed.append(key)
            status = "FAIL"
            traceback.print_exc()
        print(f"[{i:3d}/{len(keys)}] {key}: {status}", flush=True)
    dt = time.time() - t0
    label = f"hostile layout{' + tz ' + args.tz if args.tz else ''}"
    print(f"\nlayout_audit ({label}, sf={args.sf}): "
          f"{len(keys) - len(failed)}/{len(keys)} exact in {dt:.0f}s")
    if failed:
        print("FAILED: " + ", ".join(failed))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
