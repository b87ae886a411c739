"""YAML-declared component configs.

Reference parity: the reference's entire surface is declared in
per-component YAML files (``defs/schedules/defs.yaml``,
``defs/bronze_ingestion/defs.yaml`` — each a ``type`` plus an
``attributes`` block that the component class hydrates). This module
closes the declarative-config loop for OUR components: a committed
YAML file builds the same :class:`ScheduleConfig` /
:class:`SourceSystem` objects the Python constructors take, so the
schedule DSL and the bronze landing surface can be re-declared
without code changes.

The repo ships ``configs/defs.yaml`` as the working example
(structure mirrors the reference's attribute names; content targets
the driver testdata sources).
"""

from __future__ import annotations

import yaml

from ..sources.systems import SourceSystem
from .schedules import ScheduleConfig, parse_schedules


def load_component(path: str) -> dict:
    """One component doc: {"type": ..., "attributes": {...}}."""
    with open(path) as fh:
        doc = yaml.safe_load(fh)
    if not isinstance(doc, dict) or "attributes" not in doc:
        raise ValueError(f"{path}: expected a mapping with 'attributes'")
    return doc


def schedules_from_attrs(attrs: dict) -> list[ScheduleConfig]:
    """``jobs:`` list → ScheduleConfigs. Field names follow the
    reference's schedule attributes (cron_schedule, asset_selection,
    default_status RUNNING/STOPPED, execution_timezone)."""
    jobs = []
    for job in attrs.get("jobs", []):
        jobs.append({
            "name": job["name"],
            "cron_schedule": job["cron_schedule"],
            "asset_selection": job.get("asset_selection", "*"),
            "enabled": job.get("default_status", "RUNNING") == "RUNNING",
            "timezone": job.get("execution_timezone", "UTC"),
        })
    return parse_schedules(jobs)


def source_systems_from_attrs(attrs: dict) -> dict[str, SourceSystem]:
    """``source_systems:`` list → SourceSystem registry. Per-source
    fields may override the component-level defaults
    (sensor_interval_seconds, file_format, freshness_sla_hours)."""
    default_interval = int(attrs.get("sensor_interval_seconds", 60))
    default_format = attrs.get("file_format", "parquet")
    default_sla = float(attrs.get("freshness_sla_hours", 24.0))
    out: dict[str, SourceSystem] = {}
    for s in attrs.get("source_systems", []):
        sys = SourceSystem(
            name=s["name"],
            description=s.get("description", ""),
            prefix=s.get("prefix", s["name"] + "/"),
            tables=tuple(s.get("tables", [])),
            file_format=s.get("file_format", default_format),
            freshness_sla_hours=float(
                s.get("freshness_sla_hours", default_sla)
            ),
            sensor_interval_seconds=int(
                s.get("sensor_interval_seconds", default_interval)
            ),
        )
        out[sys.name] = sys
    return out


def load_defs(path: str) -> dict:
    """Load a multi-component defs YAML: each document in the file is
    one component (``type`` + ``attributes``); the loader dispatches
    on the trailing type name. Returns
    ``{"schedules": [ScheduleConfig...],
       "source_systems": {name: SourceSystem...}}``."""
    with open(path) as fh:
        docs = [d for d in yaml.safe_load_all(fh) if d]
    schedules: list[ScheduleConfig] = []
    systems: dict[str, SourceSystem] = {}
    for doc in docs:
        kind = str(doc.get("type", "")).rsplit(".", 1)[-1]
        attrs = doc.get("attributes", {})
        if kind == "ScheduledJobComponent":
            schedules.extend(schedules_from_attrs(attrs))
        elif kind == "BronzeLandingComponent":
            systems.update(source_systems_from_attrs(attrs))
        else:
            raise ValueError(f"unknown component type {doc.get('type')!r}")
    return {"schedules": schedules, "source_systems": systems}
