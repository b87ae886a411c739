"""Multi-source bronze landing surface.

Reference parity: ``S3DataLandingComponent`` registers 4 source
systems (PeopleSoft SIS, SAP ERP, Salesforce CRM, Higher-Ed ops) each
with its own S3 prefix, table list, per-source sensor with an
independent cursor, and per-table freshness checks
(``s3_data_landing_component.py:10-17`` SourceSystemConfig,
``:198-269`` per-source sensors, ``:165-196`` freshness). Here each
source system maps onto the driver-testdata tables already tagged in
``registry.SOURCE_REGISTRY``, and one "sensor tick" is a Structured
Streaming ``availableNow`` pass whose checkpoint IS the cursor —
per (source, table), so sources advance independently exactly like
the reference's ``cursor[f"{source}/{table}"]`` dict.

Scale notes: a tick lists only the per-table landing prefix; the
checkpointed file log bounds re-listing; bronze output is plain
parquet (append) a ManagedTable writer can replace.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..streaming.ingestion import ingest_available_now, landing_stream
from .registry import SOURCE_REGISTRY


@dataclass(frozen=True)
class SourceSystem:
    name: str
    description: str
    prefix: str                       # landing sub-prefix, e.g. "erp/"
    tables: tuple[str, ...]
    file_format: str = "parquet"
    freshness_sla_hours: float = 24.0
    sensor_interval_seconds: int = 60


#: Format-specific reader options (reference analog: the per-source
#: ``file_format`` in SourceSystemConfig). Parquet/JSON self-describe
#: rows; CSV needs header handling. The schema probe additionally
#: infers types for the text formats.
FORMAT_OPTIONS: dict[str, dict[str, str]] = {
    "parquet": {},
    "csv": {"header": "true"},
    "json": {},
}


def _tables_of(system: str) -> tuple[str, ...]:
    return tuple(
        t.name for t in SOURCE_REGISTRY.values() if t.source_system == system
    )


SOURCE_SYSTEMS: dict[str, SourceSystem] = {
    s.name: s
    for s in [
        SourceSystem("sis", "Student Information System analog "
                     "(customer/part/lineitem)", "sis/", _tables_of("sis"),
                     freshness_sla_hours=24.0),
        SourceSystem("erp", "ERP finance analog (orders/supplier)", "erp/",
                     _tables_of("erp"), freshness_sla_hours=6.0),
        SourceSystem("crm", "CRM activity analog (events)", "crm/",
                     _tables_of("crm"), freshness_sla_hours=1.0),
        SourceSystem("ops", "Operational reference data (region/nation)",
                     "ops/", _tables_of("ops"), freshness_sla_hours=168.0),
        SourceSystem("docs", "Document/embedding corpus landing", "docs/",
                     _tables_of("docs"), freshness_sla_hours=72.0),
    ]
}


class BronzeLanding:
    """Landing→bronze driver for all configured source systems."""

    def __init__(
        self,
        spark: SparkSession,
        landing_root: str,
        bronze_root: str,
        checkpoint_root: str,
        systems: dict[str, SourceSystem] | None = None,
    ):
        self.spark = spark
        self.landing_root = landing_root
        self.bronze_root = bronze_root
        self.checkpoint_root = checkpoint_root
        self.systems = systems or SOURCE_SYSTEMS

    def landing_dir(self, source: str, table: str) -> str:
        return os.path.join(self.landing_root, self.systems[source].prefix, table)

    def bronze_dir(self, source: str, table: str) -> str:
        return os.path.join(self.bronze_root, f"{source}_{table}")

    def _checkpoint(self, source: str, table: str) -> str:
        return os.path.join(self.checkpoint_root, source, table)

    def tick(self, source: str) -> dict[str, int]:
        """One sensor tick for ONE source system: for each of its
        tables, ingest every not-yet-seen landing file (the stream
        checkpoint is the cursor) and stop. Other sources' cursors
        are untouched — ticks are independent per source, per table.
        Returns rows ingested per table this tick."""
        sys = self.systems[source]
        out: dict[str, int] = {}
        for table in sys.tables:
            ldir = self.landing_dir(source, table)
            if not os.path.isdir(ldir) or not os.listdir(ldir):
                out[table] = 0
                continue
            # schema from the files actually present (the reference
            # reads its registry; parquet self-describes and the batch
            # probe reads footers only; CSV/JSON probe with inference)
            opts = dict(FORMAT_OPTIONS.get(sys.file_format, {}))
            probe = self.spark.read.format(sys.file_format)
            for k, v in opts.items():
                probe = probe.option(k, v)
            if sys.file_format in ("csv", "json"):
                probe = probe.option("inferSchema", "true")
            schema = probe.load(ldir).schema
            sdf = landing_stream(self.spark, ldir, schema,
                                 fmt=sys.file_format, options=opts)
            q = ingest_available_now(
                sdf, self.bronze_dir(source, table), self._checkpoint(source, table)
            )
            q.awaitTermination()
            out[table] = sum(
                int(p["numInputRows"]) for p in q.recentProgress
            )
        return out

    def freshness(self, source: str, now=None) -> dict[str, dict]:
        """Per-source freshness vs the source's SLA (parity:
        s3_data_landing_component.py:165-196): age of the newest
        ``_ingested_at`` in each bronze table."""
        sys = self.systems[source]
        out: dict[str, dict] = {}
        for table in sys.tables:
            bdir = self.bronze_dir(source, table)
            if not os.path.isdir(bdir):
                out[table] = {"passed": False, "reason": "never ingested"}
                continue
            df = self.spark.read.parquet(bdir)
            latest = df.agg(F.max("_ingested_at").alias("t")).collect()[0]["t"]
            if latest is None:
                out[table] = {"passed": False, "reason": "empty table"}
                continue
            import datetime as _dt  # noqa: PLC0415

            if latest.tzinfo is None:
                # session tz is pinned UTC, so naive collect values are UTC
                latest = latest.replace(tzinfo=_dt.timezone.utc)
            now_ts = now or _dt.datetime.now(tz=_dt.timezone.utc)
            age_h = (now_ts - latest).total_seconds() / 3600.0
            out[table] = {
                "passed": age_h <= sys.freshness_sla_hours,
                "age_hours": age_h,
                "sla_hours": sys.freshness_sla_hours,
            }
        return out
