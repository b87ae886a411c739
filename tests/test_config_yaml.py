"""YAML component-config loading (SURVEY §2.10; reference
defs/*/defs.yaml parity): the committed configs/defs.yaml must build
the same ScheduleConfig / SourceSystem objects the Python
constructors take, drive the selection DSL, and drive a real
BronzeLanding tick."""

from __future__ import annotations

import os
import shutil

from university_data_lakehouse_spark.plans.config import load_defs
from university_data_lakehouse_spark.plans.medallion import medallion_graph
from university_data_lakehouse_spark.plans.schedules import next_run
from university_data_lakehouse_spark.plans.selection import select_assets
from university_data_lakehouse_spark.sources.systems import (
    SOURCE_SYSTEMS,
    BronzeLanding,
)

DEFS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "configs", "defs.yaml")


def test_yaml_schedules_drive_selection():
    defs = load_defs(DEFS)
    schedules = {s.name: s for s in defs["schedules"]}
    assert schedules["bronze_nightly_ingestion"].enabled
    assert not schedules["contacts_hourly_refresh"].enabled
    g = medallion_graph()
    picked = select_assets(g.assets.values(),
                           schedules["silver_daily_transforms"].selection)
    assert picked and all(k.startswith("silver/") for k in picked)
    both = select_assets(g.assets.values(),
                         schedules["contacts_hourly_refresh"].selection)
    assert both == ["gold/status_funnel", "silver/fact_contacts"]
    # cron strings parse and schedule
    import datetime as dt

    t = next_run(schedules["gold_daily_analytics"].cron,
                 dt.datetime(2026, 1, 1, 0, 0))
    assert (t.hour, t.minute) == (6, 0)
    # the corpus pipeline is scheduled through the same YAML surface
    from university_data_lakehouse_spark.plans.corpus import corpus_graph

    corpus_assets = select_assets(corpus_graph().assets.values(),
                                  schedules["corpus_weekly_build"].selection)
    assert corpus_assets == ["gold/corpus_shards", "gold/corpus_stats"]
    t = next_run(schedules["corpus_weekly_build"].cron,
                 dt.datetime(2026, 1, 1, 0, 0))
    assert t.weekday() == 6 and t.hour == 3    # Sunday 03:00


def test_yaml_source_systems_match_python_registry():
    systems = load_defs(DEFS)["source_systems"]
    assert set(systems) == set(SOURCE_SYSTEMS)
    for name, sys in systems.items():
        assert set(sys.tables) == set(SOURCE_SYSTEMS[name].tables), name
        assert sys.freshness_sla_hours == SOURCE_SYSTEMS[name].freshness_sla_hours
    assert systems["crm"].sensor_interval_seconds == 30  # per-source override


def test_yaml_systems_drive_bronze_tick(spark, sf_dir, tmp_path):
    systems = load_defs(DEFS)["source_systems"]
    landing = BronzeLanding(
        spark,
        landing_root=str(tmp_path / "landing"),
        bronze_root=str(tmp_path / "bronze"),
        checkpoint_root=str(tmp_path / "ckpt"),
        systems=systems,
    )
    d = landing.landing_dir("ops", "region")
    os.makedirs(d, exist_ok=True)
    shutil.copy(os.path.join(sf_dir, "region.parquet"),
                os.path.join(d, "data_001.parquet"))
    got = landing.tick("ops")
    assert got["region"] > 0 and got["nation"] == 0
