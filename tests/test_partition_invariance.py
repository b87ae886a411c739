"""Partition-layout invariance (SURVEY §6): every determinism claim
in the operator docstrings — hash-gated sampling, medoid quantizer
training, windowed packing, iterative label propagation — must hold
under a HOSTILE layout, not just the suite's default. These tests
re-run representative order-sensitive operators with a prime shuffle
partition count and a tiny file-split size (so the parquet scan
itself fragments differently) and demand the SAME DuckDB hash parity.

A pass here is the local proxy for "the answer does not change when
the cluster gets 100× more executors": any accidental dependence on
partition count, row order within partitions, or scan-split
boundaries shows up as a hash mismatch.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle_utils import compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()

# Order-sensitive representatives of each mechanism family:
# windowed running sums, iterative convergence, trained quantizers,
# banded LSH joins, session windows, RANGE frames, packing pipelines.
KEYS = [
    "pack_token_bins",
    "corpus_build",
    "corpus_manifest",
    "dedup_cluster_canonical",
    "dedup_minhash_lsh",
    "dedup_boilerplate",
    "sim_knn_ivf",
    "events_sessionize",
    "events_moving_avg",
    "olap_top_k_per_group",
]

HOSTILE = {
    "spark.sql.shuffle.partitions": "7",        # prime, != any default
    "spark.sql.files.maxPartitionBytes": "65536",  # fragment the scans
    "spark.sql.files.openCostInBytes": "0",
}


@pytest.fixture()
def hostile_layout(spark):
    saved = {k: spark.conf.get(k, None) for k in HOSTILE}
    for k, v in HOSTILE.items():
        spark.conf.set(k, v)
    spark.catalog.clearCache()   # drop caches built under the old layout
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    spark.catalog.clearCache()


@pytest.mark.parametrize("key", KEYS)
def test_hash_parity_under_hostile_layout(hostile_layout, sf_dir, key):
    compare(QUERIES[key](hostile_layout, sf_dir), ORACLES[key], sf_dir,
            name=f"{key}@hostile-layout")
