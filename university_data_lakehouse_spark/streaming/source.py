"""Managed table as an incremental (streaming) source.

The Delta "streaming from a table" behavior re-expressed over the
table layer's change data feed: each poll reads ONLY the files
committed since the stored version cursor (``changes_between``'s
append-only fast path — zero diff compute), and the cursor advances
only when the caller commits it AFTER its downstream write lands.
At-least-once delivery + an idempotent keyed MERGE downstream =
effective exactly-once, the same contract as streaming/sink.py.

Reference parity: the sensor-cursor discipline of
``s3_data_landing_component.py`` (per-source cursors advanced after a
successful materialization), applied to table versions instead of
object keys.

Scale notes: a poll over an append-only range reads just that range's
files; a range containing rewrites (MERGE/DELETE) falls back to the
keyed snapshot diff — prefer polling often enough that ticks stay in
the fast path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..tables.format import ManagedTable


class TableChangeFeed:
    """Version-cursor poller over a managed table's change feed.

    Two-phase protocol: ``poll()`` returns (changes, target_version)
    without moving the cursor; the caller processes the frame (e.g.
    MERGEs it downstream) and then calls ``commit(target_version)``.
    A crash between the two replays the same range on restart —
    downstream idempotency (keyed MERGE) absorbs the replay.
    """

    def __init__(self, table: ManagedTable, checkpoint_dir: str,
                 keys: list[str] | None = None):
        self.table = table
        self.keys = keys
        self._cursor_path = os.path.join(checkpoint_dir, "table_cursor.json")
        os.makedirs(checkpoint_dir, exist_ok=True)

    def cursor(self) -> int:
        if not os.path.exists(self._cursor_path):
            return 0
        with open(self._cursor_path) as fh:
            return int(json.load(fh)["version"])

    def commit(self, version: int) -> None:
        tmp = self._cursor_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": version}, fh)
        os.replace(tmp, self._cursor_path)

    def reset(self) -> None:
        """Recovery path for a cursor that points below the table's
        vacuum horizon (``poll`` raised VersionExpiredError): drop the
        cursor so the next ``poll`` bootstraps from the CURRENT
        snapshot (full frame as inserts). Downstream keyed-MERGE
        idempotency absorbs the re-delivery."""
        if os.path.exists(self._cursor_path):
            os.unlink(self._cursor_path)

    def poll(self, spark: SparkSession) -> tuple[DataFrame | None, int]:
        """Changes since the cursor, or (None, cursor) when the table
        has no new commits. A cursor of 0 (never polled) delivers the
        full current snapshot as inserts — the bootstrap read."""
        cur = self.cursor()
        latest = self.table.latest_version()
        if latest <= cur:
            return None, cur
        if cur == 0:
            from pyspark.sql import functions as F  # noqa: PLC0415

            df = self.table.read(spark, latest).select(
                "*",
                F.lit("insert").alias("_change_type"),
                F.lit(latest).alias("_commit_version"),
            )
            return df, latest
        return (
            self.table.changes_between(spark, cur, latest, keys=self.keys),
            latest,
        )
