"""Cron schedule configs.

Reference parity: ``scheduled_job_component.py`` schedule attributes
(name, cron_schedule, asset selection, enabled flag) from
``defs/schedules/defs.yaml``. Includes a dependency-free 5-field cron
matcher so schedules are testable without a scheduler daemon.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass


@dataclass(frozen=True)
class ScheduleConfig:
    name: str
    cron: str                 # standard 5-field cron
    selection: str            # plans.selection DSL
    enabled: bool = True
    timezone: str = "UTC"


def parse_schedules(raw: list[dict]) -> list[ScheduleConfig]:
    out = []
    for item in raw:
        out.append(
            ScheduleConfig(
                name=item["name"],
                cron=item["cron_schedule"],
                selection=item.get("asset_selection", "*"),
                enabled=bool(item.get("enabled", True)),
                timezone=item.get("timezone", "UTC"),
            )
        )
    return out


def _field_matches(field: str, value: int) -> bool:
    for part in field.split(","):
        part = part.strip()
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
        if part in ("*", ""):
            if value % step == 0:
                return True
            continue
        if "-" in part:
            lo, hi = (int(x) for x in part.split("-", 1))
            if lo <= value <= hi and (value - lo) % step == 0:
                return True
            continue
        if int(part) == value:
            return True
    return False


def cron_matches(cron: str, t: dt.datetime) -> bool:
    minute, hour, dom, month, dow = cron.split()
    return (
        _field_matches(minute, t.minute)
        and _field_matches(hour, t.hour)
        and _field_matches(dom, t.day)
        and _field_matches(month, t.month)
        and _field_matches(dow, t.weekday() + 1 if t.weekday() < 6 else 0)
        # cron dow: 0=Sunday..6=Saturday; python weekday: 0=Monday
    )


def next_run(cron: str, after: dt.datetime, limit_days: int = 366) -> dt.datetime:
    t = after.replace(second=0, microsecond=0) + dt.timedelta(minutes=1)
    end = after + dt.timedelta(days=limit_days)
    while t <= end:
        if cron_matches(cron, t):
            return t
        t += dt.timedelta(minutes=1)
    raise ValueError(f"no run for {cron!r} within {limit_days} days")


def _local_wall_time(t: dt.datetime, timezone: str) -> dt.datetime:
    """The naive wall-clock time ``cron_matches`` compares against:
    an AWARE ``t`` is converted into the schedule's timezone (so
    "0 2 * * *" in America/New_York fires at 02:00 local through DST
    flips — the reference's ScheduleDefinition execution_timezone
    semantic); a NAIVE ``t`` is taken as already being the
    schedule's wall clock."""
    if t.tzinfo is None:
        return t
    from zoneinfo import ZoneInfo  # noqa: PLC0415 — stdlib, lazy

    return t.astimezone(ZoneInfo(timezone)).replace(tzinfo=None)


def due_schedules(schedules: list[ScheduleConfig],
                  t: dt.datetime) -> list[ScheduleConfig]:
    """The enabled schedules whose cron matches ``t`` (each evaluated
    on its own timezone's wall clock), in list order."""
    return [s for s in schedules
            if s.enabled and cron_matches(s.cron, _local_wall_time(
                t, s.timezone))]


def run_scheduled_jobs(
    spark,
    sf_dir: str,
    graph,
    schedules: list[ScheduleConfig],
    t: dt.datetime,
    catalog=None,
    lineage_send=None,
) -> dict[str, dict]:
    """Execute every due schedule against the asset graph — the tick
    a scheduler daemon runs (r16; reference analog: the Dagster
    daemon evaluating ``scheduled_job_component.py`` schedules and
    launching the selected-asset job). For each schedule from
    :func:`due_schedules`, its selection DSL resolves to asset keys
    (plans.selection, the reference's _parse_asset_selection) and the
    graph materializes that selection — upstream closure, blocking
    checks, catalog commits and lineage push all exactly as a manual
    ``materialize`` call, so scheduling adds triggering, never new
    execution semantics.  A due schedule whose selection matches no
    asset records ``{}`` rather than materializing everything (the
    ``*``-selection is how you ask for everything).  Returns
    {schedule name: materialize results} for the schedules that
    fired, in schedule-list order."""
    from .selection import select_assets  # noqa: PLC0415 — avoid cycle

    out: dict[str, dict] = {}
    for s in due_schedules(schedules, t):
        keys = select_assets(graph.assets.values(), s.selection)
        out[s.name] = (graph.materialize(
            spark, sf_dir, keys=keys, catalog=catalog,
            lineage_send=lineage_send) if keys else {})
    return out
