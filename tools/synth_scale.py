"""Deterministic upward-scale synthesizer: replicate a testdata scale
factor N times with disjoint key ranges, producing an "sf1-equivalent"
dataset for benchmarking shuffles/joins at a size where they cost
something (VERDICT r5 "Next round" #1).

Design choices (all aimed at making per-replica work ADD, not explode):

- ``region``/``nation`` are fixed-cardinality dims (5/25) and are NOT
  replicated — every replica's FKs point at the same dims, exactly as
  a 10x TPC-H scale-up would.
- Every surrogate key domain (custkey, orderkey, partkey, suppkey,
  event_id, user_id, doc_id, vec_id) is shifted by ``i * stride`` where
  stride is the next power of 10 above the domain's max — replica key
  ranges are disjoint and the mapping is invertible by eye.
- Timestamps are NOT shifted: fixed date predicates (TPC-H Q1/Q3/Q6...)
  keep their per-replica selectivity, so the aggregate work is truly
  10x.  (Shifting dates would let partition pruning discard 9/10
  replicas and the bench would measure scan only.)
- ``documents.text`` gets a per-replica letter-rotation cipher (rot-i
  over a-z/A-Z).  Length-preserving (``n_chars`` stays correct, token
  counts stay correct) but replicas share zero shingles, so near-dup
  candidate generation scales linearly instead of quadratically in the
  replica count.  Replica 0 is byte-identical to the source.
- ``embeddings.embedding`` gets small deterministic per-replica
  gaussian noise (seeded by replica index) so ANN top-k doesn't
  degenerate into distance-0 ties across replicas; ``label`` structure
  is preserved (noise sigma 0.01 << inter-cluster distance).

Usage:  python tools/synth_scale.py [--replicas 10]
            [--src /root/testdata/sf0.1] [--out .synthdata/sf1]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

# tables copied through untouched (fixed-cardinality dims)
FIXED = ("region", "nation")

# per-table key columns and the key DOMAIN each belongs to; columns in
# the same domain shift by the same stride so FKs stay consistent
KEY_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "custkey")],
    "supplier": [("s_suppkey", "suppkey")],
    "part": [("p_partkey", "partkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [("l_orderkey", "orderkey"), ("l_partkey", "partkey"),
                 ("l_suppkey", "suppkey")],
    "events": [("event_id", "eventid"), ("user_id", "userid")],
    "documents": [("doc_id", "docid")],
    "embeddings": [("vec_id", "vecid")],
}

ROW_GROUP = 128 * 1024  # rows per parquet row group — keeps ~48 splits
#                         on the 6M-row lineitem so local[32] stays busy


def _stride(max_key: int) -> int:
    s = 10
    while s <= max_key:
        s *= 10
    return s


def _rot_table(i: int) -> dict[int, int]:
    """Length-preserving per-replica cipher: rot-i over a-z and A-Z."""
    t: dict[int, int] = {}
    for base in (ord("a"), ord("A")):
        for k in range(26):
            t[base + k] = base + (k + i) % 26
    return t


def synthesize(src: str, out: str, replicas: int,
               tables: list[str] | None = None) -> dict[str, int]:
    """``tables`` restricts the replicated set (FIXED dims are always
    copied) — the x100 "sf10" build uses this to skip the tables only
    the quadratic-by-construction baselines read (embeddings).

    Replicas stream to one ParquetWriter per table (a x100 lineitem is
    60M rows — concatenating that in pandas first would hold the whole
    output in memory; per-replica row-group writes keep the peak at
    one replica)."""
    os.makedirs(out, exist_ok=True)
    counts: dict[str, int] = {}

    for t in FIXED:
        df = pd.read_parquet(os.path.join(src, f"{t}.parquet"))
        df.to_parquet(os.path.join(out, f"{t}.parquet"), index=False)
        counts[t] = len(df)

    wanted = {t: keys for t, keys in KEY_DOMAINS.items()
              if tables is None or t in tables}

    # pass 1: compute one stride per key domain from the SOURCE data so
    # every table shifts the same domain by the same amount (strides
    # always derive from the FULL domain set, independent of `tables`,
    # so a restricted build keeps FK ranges identical to a full one)
    strides: dict[str, int] = {}
    frames: dict[str, pd.DataFrame] = {}
    for t, keys in KEY_DOMAINS.items():
        df = pd.read_parquet(os.path.join(src, f"{t}.parquet"))
        if t in wanted:
            frames[t] = df
        for col, dom in keys:
            m = int(df[col].max())
            strides[dom] = max(strides.get(dom, 0), _stride(m))

    for t, keys in wanted.items():
        df = frames[t]
        # preserve the source arrow schema (e.g. list<float> embeddings,
        # int32 linenumber) — pandas copies alone would widen types
        src_schema = pq.read_schema(os.path.join(src, f"{t}.parquet"))
        writer = pq.ParquetWriter(os.path.join(out, f"{t}.parquet"),
                                  src_schema)
        n = 0
        for i in range(replicas):
            r = df.copy()
            for col, dom in keys:
                r[col] = r[col] + i * strides[dom]
            if t == "documents" and i > 0:
                # 26-cycle cipher: above 26 replicas, replica i shares
                # its text with replica i-26 (fresh doc_ids) — exact
                # dups reappear, which is realistic dedup work, but
                # near-dup candidate counts grow with the cycle count.
                tab = _rot_table(i % 26)
                r["text"] = r["text"].map(lambda s, _t=tab: s.translate(_t))
            if t == "embeddings" and i > 0:
                rng = np.random.RandomState(1_000_003 * i)
                mat = np.stack(df["embedding"].to_numpy())
                noise = rng.normal(0.0, 0.01, mat.shape).astype(mat.dtype)
                r["embedding"] = list(mat + noise)
            writer.write_table(
                pa.Table.from_pandas(r, schema=src_schema,
                                     preserve_index=False),
                row_group_size=ROW_GROUP,
            )
            n += len(r)
        writer.close()
        counts[t] = n
    return counts


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(here, ".synthdata", "sf1"))
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset of replicated tables")
    a = ap.parse_args()
    tables = a.tables.split(",") if a.tables else None
    counts = synthesize(a.src, a.out, a.replicas, tables=tables)
    for t, n in sorted(counts.items()):
        print(f"{t}: {n}")


if __name__ == "__main__":
    main()
