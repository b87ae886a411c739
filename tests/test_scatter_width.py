"""scatter() width policy (r17, guide §2.5).

``bytes_per_task`` right-sizes the round-robin exchange to the input:
width = ceil(input_bytes / budget) clamped to cluster parallelism.
These pins are what keeps the policy scale-adaptive rather than
core-count-tuned: tiny inputs skip the exchange entirely, mid-size
inputs get a proportional width, and anything past
parallelism x budget clamps to full width (at 100 TB the scan is
already wide and scatter no-ops via the getNumPartitions probe).
"""

from __future__ import annotations

import math
import os

from university_data_lakehouse_spark.sources.loader import (
    load_table,
    scatter,
    table_path,
)

SF = "/root/testdata/sf0.001"
DOCS_BYTES = os.path.getsize(table_path(SF, "documents"))


def _docs(spark):
    return load_table(spark, SF, "documents")


def test_width_is_input_proportional(spark):
    par = spark.sparkContext.defaultParallelism
    budget = max(DOCS_BYTES // 3, 1)   # => ceil == 3 or 4 partitions
    want = min(par, math.ceil(DOCS_BYTES / budget))
    got = scatter(_docs(spark), bytes_per_task=budget)
    assert got.rdd.getNumPartitions() == want


def test_width_one_skips_the_exchange(spark):
    # a budget bigger than the whole input -> width 1 -> untouched
    # frame (identical plan object, no RoundRobin exchange)
    df = _docs(spark)
    out = scatter(df, bytes_per_task=DOCS_BYTES * 10)
    assert out is df


def test_tiny_budget_clamps_to_parallelism(spark):
    par = spark.sparkContext.defaultParallelism
    out = scatter(_docs(spark), bytes_per_task=1)
    assert out.rdd.getNumPartitions() == par


def test_min_input_bytes_floor_still_gates(spark):
    # the r16 floor composes with the r17 width: below the floor the
    # frame is untouched regardless of bytes_per_task
    df = _docs(spark)
    out = scatter(df, min_input_bytes=DOCS_BYTES * 10,
                  bytes_per_task=1)
    assert out is df


def test_unknown_size_keeps_full_parallelism(spark):
    # a frame with no file-backed scan (inputFiles empty): don't gate,
    # fall back to the r16 behavior of full parallelism
    par = spark.sparkContext.defaultParallelism
    df = spark.range(10 ** 4).toDF("doc_id")
    out = scatter(df, bytes_per_task=1 << 30)
    assert out.rdd.getNumPartitions() == par
