"""Deterministic hostile-skew synthesizer (VERDICT r6 "Next round"
#8): derive a corpus from a testdata scale factor where one key owns
a planted, pathological share of the data —

- ``events``: ONE user (a fresh id above the source max) receives a
  copy of ~``hot_frac`` of all events (fresh event_ids, timestamps
  preserved) — so sessionize / attribution windows see one partition
  key carrying ~10% of the table.
- ``lineitem``: ONE order (a fresh orderkey) carries ``hot_lines``
  lines over DISTINCT parts — so the basket-affinity self-join's
  per-order fan-out hits C(hot_lines, 2) pairs inside a single join
  key, exactly the shape AQE's skew-join split exists for.
- ``documents``: ONE boilerplate 3-sentence span is appended to
  ``hot_doc_frac`` of all documents — so the span-hash aggregation of
  ``dedup_c4_spans`` sees one md5 key carrying ~30% of the corpus
  (the hot-key case its map-side partial aggregation absorbs).

Everything else is copied through byte-identically, arrow schemas
preserved, so the same oracle SQL replays on the skewed dir and the
operators must produce hash-identical results — skew may slow a plan
down, never change its answer.

Usage:  python tools/synth_skew.py [--src /root/testdata/sf0.1]
            [--out .synthdata/skew] [--hot-frac 0.1]
            [--hot-lines 10000]
"""

from __future__ import annotations

import argparse
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _stride(max_key: int) -> int:
    s = 10
    while s <= max_key:
        s *= 10
    return s


def _write_like(src_path: str, out_path: str, df: pd.DataFrame) -> None:
    schema = pq.read_schema(src_path)
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema, preserve_index=False),
        out_path,
    )


HOT_SPAN = ("All rights reserved worldwide. "
            "Subscribe to our newsletter today! "
            "This copyright notice applies to every page here.")


def synthesize(src: str, out: str, hot_frac: float = 0.1,
               hot_lines: int = 10_000,
               hot_doc_frac: float = 0.3) -> dict[str, int]:
    """Build the skewed dir; returns planted-key stats for assertions."""
    os.makedirs(out, exist_ok=True)
    stats: dict[str, int] = {}

    ev_src = os.path.join(src, "events.parquet")
    ev = pd.read_parquet(ev_src)
    hot_user = int(ev["user_id"].max()) + _stride(int(ev["user_id"].max()))
    # hot_frac of the FINAL table: n_hot / (n + n_hot) = hot_frac
    n_hot = int(len(ev) * hot_frac / (1.0 - hot_frac))
    hot = ev.iloc[:n_hot].copy()
    hot["event_id"] = hot["event_id"] + _stride(int(ev["event_id"].max()))
    hot["user_id"] = hot_user
    _write_like(ev_src, os.path.join(out, "events.parquet"),
                pd.concat([ev, hot], ignore_index=True))
    stats["hot_user"] = hot_user
    stats["hot_user_events"] = n_hot
    stats["events_total"] = len(ev) + n_hot

    li_src = os.path.join(src, "lineitem.parquet")
    li = pd.read_parquet(li_src)
    hot_order = (int(li["l_orderkey"].max())
                 + _stride(int(li["l_orderkey"].max())))
    base = li.iloc[:hot_lines].copy()
    # distinct parts within the hot order: the (order, part) distinct
    # collapse must NOT shrink the planted order
    base["l_orderkey"] = hot_order
    base["l_partkey"] = range(1, len(base) + 1)
    base["l_linenumber"] = range(1, len(base) + 1)
    _write_like(li_src, os.path.join(out, "lineitem.parquet"),
                pd.concat([li, base], ignore_index=True))
    stats["hot_order"] = hot_order
    stats["hot_order_lines"] = len(base)
    stats["lineitem_total"] = len(li) + len(base)

    doc_src = os.path.join(src, "documents.parquet")
    if os.path.exists(doc_src):
        doc = pd.read_parquet(doc_src)
        n_hot_docs = int(len(doc) * hot_doc_frac)
        idx = doc.index[:n_hot_docs]
        # ". " first: documents whose text does not end in terminal
        # punctuation would otherwise merge their unique tail into
        # the span's first sentence, making every "shared" span
        # distinct — the separator closes the original text so the
        # three boilerplate sentences stand alone in every hot doc
        doc.loc[idx, "text"] = doc.loc[idx, "text"].astype(str) \
            + ". " + HOT_SPAN
        _write_like(doc_src, os.path.join(out, "documents.parquet"), doc)
        stats["hot_span_docs"] = n_hot_docs
        stats["documents_total"] = len(doc)
    return stats


def main() -> None:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(here, ".synthdata",
                                                  "skew"))
    ap.add_argument("--hot-frac", type=float, default=0.1)
    ap.add_argument("--hot-lines", type=int, default=10_000)
    ap.add_argument("--hot-doc-frac", type=float, default=0.3)
    a = ap.parse_args()
    stats = synthesize(a.src, a.out, a.hot_frac, a.hot_lines,
                       a.hot_doc_frac)
    for k, v in sorted(stats.items()):
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
