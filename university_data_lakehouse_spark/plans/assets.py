"""Declarative asset graph with topological execution and
quality-check gating.

Reference parity: Dagster's asset graph as wired by the three
components (``s3_data_landing_component.py`` bronze assets,
``trino_iceberg_transform_component.py:116`` silver CTAS assets with
``data_quality_checks`` lists, ``gold_analytics_component.py:128``
gold models). Here an Asset is a named Spark transform with declared
deps, group, tags, and blocking checks; the graph toposorts and
materializes with per-asset results, and a failed blocking check
halts downstream materialization (the reference's
``blocking=True`` check semantics).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Asset:
    key: str                              # e.g. "silver/dim_customers"
    fn: Callable[..., DataFrame]          # (spark, sf_dir, **dep DFs) → DF
    deps: tuple[str, ...] = ()
    group: str = "default"
    tags: dict[str, str] = field(default_factory=dict)
    kind: str = "spark"
    # checks: name → fn(DataFrame) → (passed: bool, metadata: dict)
    checks: tuple[tuple[str, Callable[[DataFrame], tuple[bool, dict]]], ...] = ()
    # expectations: DLT-style ROW-LEVEL quality policies, applied
    # before checks: (name, SQL predicate, action). Like their public
    # Delta Live Tables namesakes — "warn" records the violation
    # count and publishes everything, "drop" filters violating rows
    # out of what is published, "fail" blocks the asset (and its
    # downstream) when any row violates. NULL predicates pass (same
    # SQL-standard rule as table CHECK constraints). All violation
    # counts come from ONE aggregate pass regardless of how many
    # expectations an asset declares.
    expectations: tuple[tuple[str, str, str], ...] = ()


@dataclass
class AssetResult:
    key: str
    status: str                           # ok | check_failed | skipped | error
    rows: int | None = None
    checks: dict[str, bool] = field(default_factory=dict)
    error: str | None = None
    # expectation name → violating-row count (pre-drop)
    expectations: dict[str, int] = field(default_factory=dict)
    # check name → the metadata dict the check returned alongside its
    # verdict (r16): the reference attaches the same per-check
    # metadata to asset materializations (Dagster check results);
    # before this the dicts every plans/checks.py factory already
    # built were discarded at the orchestrator boundary
    check_meta: dict[str, dict] = field(default_factory=dict)


class AssetGraph:
    def __init__(self, assets: Iterable[Asset]):
        self.assets = {a.key: a for a in assets}
        for a in self.assets.values():
            missing = [d for d in a.deps if d not in self.assets]
            if missing:
                raise ValueError(f"{a.key}: unknown deps {missing}")

    def toposort(self, keys: Iterable[str] | None = None) -> list[str]:
        """Deterministic Kahn toposort (lexicographic among ready
        nodes) over the closure of `keys` plus their upstreams."""
        wanted = set(self.assets if keys is None else keys)
        # include upstream closure
        frontier = list(wanted)
        while frontier:
            k = frontier.pop()
            for d in self.assets[k].deps:
                if d not in wanted:
                    wanted.add(d)
                    frontier.append(d)
        indeg = {k: sum(d in wanted for d in self.assets[k].deps) for k in wanted}
        ready = sorted(k for k, n in indeg.items() if n == 0)
        out: list[str] = []
        while ready:
            k = ready.pop(0)
            out.append(k)
            for other in sorted(wanted):
                if k in self.assets[other].deps:
                    indeg[other] -= 1
                    if indeg[other] == 0:
                        ready.append(other)
            ready.sort()
        if len(out) != len(wanted):
            cyc = sorted(wanted - set(out))
            raise ValueError(f"cycle among {cyc}")
        return out

    def downstream_of(self, key: str) -> set[str]:
        out, frontier = set(), [key]
        while frontier:
            k = frontier.pop()
            for other, a in self.assets.items():
                if k in a.deps and other not in out:
                    out.add(other)
                    frontier.append(other)
        return out

    def materialize(
        self,
        spark: SparkSession,
        sf_dir: str,
        keys: Iterable[str] | None = None,
        catalog=None,
        lineage_send=None,
    ) -> dict[str, AssetResult]:
        """Run assets in dependency order; a failed blocking check
        skips everything downstream (reference blocking semantics).

        With a ``catalog`` (tables.TableCatalog), every asset that
        passes its checks is committed as a managed-table version —
        the engine's twin of the reference's per-asset Iceberg CTAS
        (``trino_iceberg_transform_component.py:116``). Check-failed
        assets are NOT committed, so the published table always holds
        the last good version.

        With a ``lineage_send`` callable ``(path, payload) -> None``,
        each successfully-materialized asset's dependency edges are
        pushed in the catalog PUT shape after the run — the engine's
        twin of the reference registering OpenMetadata lineage at
        materialization time (``gold_analytics_component.py:288``).
        Edges into skipped/failed assets are NOT pushed."""
        order = self.toposort(keys)
        results: dict[str, AssetResult] = {}
        materialized: dict[str, DataFrame] = {}
        blocked: set[str] = set()
        try:
            self._run(spark, sf_dir, order, results, materialized,
                      blocked, catalog)
        finally:
            # release the per-run caches: leaked InMemoryRelations
            # would otherwise shadow parquet scans (and their filter
            # pushdown) for every later query in the session
            for df in materialized.values():
                df.unpersist()
        if lineage_send is not None:
            from .lineage import (  # noqa: PLC0415 — avoid import cycle
                LINEAGE_PATH,
                catalog_lineage_payloads,
            )

            ok = {k.replace("/", ".") for k, r in results.items()
                  if r.status == "ok"}
            for p in catalog_lineage_payloads(self):
                if p["edge"]["toEntity"]["fqn"] in ok:
                    lineage_send(LINEAGE_PATH, p)
        return results

    def _run(self, spark, sf_dir, order, results, materialized, blocked,
             catalog) -> None:
        for key in order:
            if key in blocked:
                results[key] = AssetResult(key, "skipped")
                continue
            asset = self.assets[key]
            try:
                dep_dfs = {d: materialized[d] for d in asset.deps if d in materialized}
                df = asset.fn(spark, sf_dir, **dep_dfs) if dep_dfs else asset.fn(spark, sf_dir)
                df, exp_metrics, exp_failed = self._apply_expectations(
                    asset, df)
                df = df.cache()
                rows = df.count()
            except Exception as e:  # noqa: BLE001 — orchestrator boundary
                results[key] = AssetResult(key, "error", error=str(e)[:500])
                blocked |= self.downstream_of(key)
                continue
            check_outcomes: dict[str, bool] = {}
            check_meta: dict[str, dict] = {}
            failed = exp_failed
            for name, check in asset.checks:
                ok, meta = check(df)
                check_outcomes[name] = ok
                check_meta[name] = meta
                failed = failed or not ok
            materialized[key] = df
            if failed:
                results[key] = AssetResult(key, "check_failed", rows,
                                           check_outcomes,
                                           expectations=exp_metrics,
                                           check_meta=check_meta)
                blocked |= self.downstream_of(key)
            else:
                if catalog is not None:
                    catalog.write(key, df, mode="overwrite")
                results[key] = AssetResult(key, "ok", rows, check_outcomes,
                                           expectations=exp_metrics,
                                           check_meta=check_meta)

    @staticmethod
    def _apply_expectations(asset: Asset, df: DataFrame):
        """Evaluate every expectation's violation count in ONE
        aggregate pass, then apply drop filters; returns
        (possibly-filtered df, metrics, any_fail_violated)."""
        if not asset.expectations:
            return df, {}, False
        from pyspark.sql import functions as F  # noqa: PLC0415

        ok = {name: F.coalesce(F.expr(pred), F.lit(True))
              for name, pred, _ in asset.expectations}
        row = df.agg(*[
            F.count(F.when(~ok[name], 1)).alias(name)
            for name, _, _ in asset.expectations
        ]).collect()[0]
        metrics = {name: row[name] for name, _, _ in asset.expectations}
        failed = any(metrics[name] > 0
                     for name, _, action in asset.expectations
                     if action == "fail")
        for name, _, action in asset.expectations:
            if action == "drop" and metrics[name] > 0:
                df = df.where(ok[name])
        return df, metrics, failed
