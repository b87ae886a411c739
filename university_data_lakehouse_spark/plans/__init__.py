from .assets import Asset, AssetGraph, AssetResult  # noqa: F401
from .selection import select_assets  # noqa: F401
from .schedules import ScheduleConfig, parse_schedules  # noqa: F401
