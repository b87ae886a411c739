"""Command-line front door: ``python -m university_data_lakehouse_spark``.

The switcher's entry point for a reference user: list every query the
engine exposes, run one against a scale-factor directory, or
materialize the medallion asset graph into a managed-table warehouse
— no Python required beyond the invocation.
"""

from __future__ import annotations

import argparse
import sys


def _registries():
    import __spark_entry__ as entry_mod  # noqa: PLC0415

    return entry_mod.queries(), entry_mod.oracle_sql()


def _spark():
    from .session import get_spark  # noqa: PLC0415

    return get_spark("udl-cli")


def cmd_list(_args) -> int:
    queries, oracles = _registries()
    for key in queries:
        marker = "oracle" if key in oracles else "rows-only"
        print(f"{key}\t[{marker}]")
    return 0


def cmd_run(args) -> int:
    queries, _ = _registries()
    if args.key not in queries:
        print(f"unknown query {args.key!r}; see `list`", file=sys.stderr)
        return 2
    df = queries[args.key](_spark(), args.sf_dir)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)
    return 0


def cmd_medallion(args) -> int:
    from .plans.medallion import medallion_graph  # noqa: PLC0415
    from .tables import TableCatalog  # noqa: PLC0415

    catalog = TableCatalog(args.warehouse) if args.warehouse else None
    results = medallion_graph().materialize(
        _spark(), args.sf_dir, keys=args.keys or None, catalog=catalog)
    worst = 0
    for key in sorted(results):
        r = results[key]
        print(f"{r.status:14s} {key:28s} rows={r.rows}")
        worst = max(worst, 0 if r.status == "ok" else 1)
    return worst


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="university_data_lakehouse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list every query key")
    run = sub.add_parser("run", help="run one query and show rows")
    run.add_argument("key")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    run.add_argument("--limit", type=int, default=20)
    run.add_argument("--explain", action="store_true")
    med = sub.add_parser("medallion", help="materialize the asset graph")
    med.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    med.add_argument("--warehouse", default=None,
                     help="publish assets as managed tables here")
    med.add_argument("--keys", nargs="*", default=None)
    args = p.parse_args(argv)
    return {"list": cmd_list, "run": cmd_run,
            "medallion": cmd_medallion}[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
