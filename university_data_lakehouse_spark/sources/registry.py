"""Source-table schema registry (bronze layer).

Parity with the reference's source-schema registry
(``components/s3_data_landing_component.py:274-420``), which declares
each raw table's source system, columns, and primary key. Here the
"source systems" are the driver's TPC-H-ish synthetic tables
(TESTDATA.md); the registry powers schema validation on load and the
data-quality checks in ``operators/quality.py``.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SourceTable:
    name: str
    source_system: str
    primary_key: tuple[str, ...]
    columns: dict[str, str]  # name -> spark sql type
    # foreign keys: column -> (parent_table, parent_column)
    foreign_keys: dict[str, tuple[str, str]] = field(default_factory=dict)
    # value-range rules: column -> (low, high) inclusive
    value_ranges: dict[str, tuple[float, float]] = field(default_factory=dict)


SOURCE_REGISTRY: dict[str, SourceTable] = {
    t.name: t
    for t in [
        SourceTable(
            "region", "ops", ("r_regionkey",),
            {"r_regionkey": "int", "r_name": "string"},
        ),
        SourceTable(
            "nation", "ops", ("n_nationkey",),
            {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
            foreign_keys={"n_regionkey": ("region", "r_regionkey")},
        ),
        SourceTable(
            "customer", "sis", ("c_custkey",),
            {
                "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
                "c_acctbal": "double", "c_mktsegment": "string",
            },
            foreign_keys={"c_nationkey": ("nation", "n_nationkey")},
        ),
        SourceTable(
            "supplier", "erp", ("s_suppkey",),
            {
                "s_suppkey": "bigint", "s_name": "string",
                "s_nationkey": "int", "s_acctbal": "double",
            },
            foreign_keys={"s_nationkey": ("nation", "n_nationkey")},
        ),
        SourceTable(
            "part", "sis", ("p_partkey",),
            {
                "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
                "p_type": "string", "p_size": "int", "p_retailprice": "double",
            },
            value_ranges={"p_size": (1, 50), "p_retailprice": (0.0, 1e9)},
        ),
        SourceTable(
            "orders", "erp", ("o_orderkey",),
            {
                "o_orderkey": "bigint", "o_custkey": "bigint",
                "o_orderstatus": "string", "o_totalprice": "double",
                "o_orderdate": "timestamp", "o_orderpriority": "string",
            },
            foreign_keys={"o_custkey": ("customer", "c_custkey")},
            value_ranges={"o_totalprice": (0.0, 1e9)},
        ),
        SourceTable(
            "lineitem", "sis", ("l_orderkey", "l_linenumber"),
            {
                "l_orderkey": "bigint", "l_partkey": "bigint",
                "l_suppkey": "bigint", "l_linenumber": "int",
                "l_quantity": "double", "l_extendedprice": "double",
                "l_discount": "double", "l_tax": "double",
                "l_returnflag": "string", "l_linestatus": "string",
                "l_shipdate": "timestamp",
            },
            foreign_keys={
                "l_orderkey": ("orders", "o_orderkey"),
                "l_partkey": ("part", "p_partkey"),
                "l_suppkey": ("supplier", "s_suppkey"),
            },
            value_ranges={
                "l_quantity": (0.0, 1e6),
                "l_discount": (0.0, 1.0),
                "l_tax": (0.0, 1.0),
            },
        ),
        SourceTable(
            "events", "crm", ("event_id",),
            {
                "event_id": "bigint", "ts": "timestamp", "user_id": "bigint",
                "event_type": "string", "value": "double", "props": "string",
            },
        ),
        SourceTable(
            "documents", "docs", ("doc_id",),
            {
                "doc_id": "bigint", "text": "string", "lang": "string",
                "source": "string", "n_chars": "bigint",
            },
        ),
        SourceTable(
            "embeddings", "docs", ("vec_id",),
            {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
        ),
    ]
}


def expected_schema(name: str) -> dict[str, str]:
    return dict(SOURCE_REGISTRY[name].columns)
