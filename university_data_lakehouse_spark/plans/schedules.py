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
