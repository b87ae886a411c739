"""Column-level lineage registry for the silver/gold layers.

Reference parity: ``_SILVER_SCHEMAS`` / ``_GOLD_SCHEMAS`` in
``trino_iceberg_transform_component.py:221-288`` and
``gold_analytics_component.py`` (column name/type/description plus
``sources`` as "layer/table.column" strings, pushed to OpenMetadata
at gold_analytics_component.py:288-308). Here the registry describes
OUR operators' outputs over the driver testdata, is validated against
the live DataFrames in tests, and renders the same
column → upstream-columns edge list a catalog push needs.
"""

from __future__ import annotations

SILVER_LINEAGE: dict[str, list[dict]] = {
    "silver_dim_customers": [
        {"name": "customer_key", "type": "string", "sources": [],
         "description": "md5 surrogate key"},
        {"name": "custkey", "type": "bigint", "sources": ["bronze/customer.c_custkey"]},
        {"name": "full_name", "type": "string",
         "sources": ["bronze/customer.c_name", "bronze/customer.c_mktsegment"]},
        {"name": "segment", "type": "string", "sources": ["bronze/customer.c_mktsegment"]},
        {"name": "acctbal", "type": "double", "sources": ["bronze/customer.c_acctbal"]},
        {"name": "nation_name", "type": "string", "sources": ["bronze/nation.n_name"]},
        {"name": "is_buyer", "type": "boolean", "sources": ["bronze/orders.o_custkey"]},
    ],
    "silver_dim_parts": [
        {"name": "part_key", "type": "string", "sources": []},
        {"name": "partkey", "type": "bigint", "sources": ["bronze/part.p_partkey"]},
        {"name": "part_name", "type": "string", "sources": ["bronze/part.p_name"]},
        {"name": "brand", "type": "string", "sources": ["bronze/part.p_brand"]},
        {"name": "part_type", "type": "string", "sources": ["bronze/part.p_type"]},
        {"name": "part_size", "type": "int", "sources": ["bronze/part.p_size"]},
        {"name": "retail_price", "type": "double", "sources": ["bronze/part.p_retailprice"]},
    ],
    "silver_dim_suppliers": [
        {"name": "supplier_key", "type": "string", "sources": []},
        {"name": "suppkey", "type": "bigint", "sources": ["bronze/supplier.s_suppkey"]},
        {"name": "supplier_name", "type": "string", "sources": ["bronze/supplier.s_name"]},
        {"name": "acctbal", "type": "double", "sources": ["bronze/supplier.s_acctbal"]},
        {"name": "nation_name", "type": "string", "sources": ["bronze/nation.n_name"]},
        {"name": "region_name", "type": "string", "sources": ["bronze/region.r_name"]},
    ],
    "silver_fact_lineitems": [
        {"name": "lineitem_key", "type": "string", "sources": []},
        {"name": "orderkey", "type": "bigint", "sources": ["bronze/lineitem.l_orderkey"]},
        {"name": "linenumber", "type": "int", "sources": ["bronze/lineitem.l_linenumber"]},
        {"name": "partkey", "type": "bigint", "sources": ["bronze/lineitem.l_partkey"]},
        {"name": "quantity", "type": "double", "sources": ["bronze/lineitem.l_quantity"]},
        {"name": "extended_price", "type": "double",
         "sources": ["bronze/lineitem.l_extendedprice"]},
        {"name": "return_flag", "type": "string", "sources": ["bronze/lineitem.l_returnflag"]},
        {"name": "ship_date", "type": "timestamp", "sources": ["bronze/lineitem.l_shipdate"]},
        {"name": "order_total", "type": "double", "sources": ["bronze/orders.o_totalprice"]},
    ],
    "silver_fact_orders": [
        {"name": "transaction_key", "type": "string", "sources": []},
        {"name": "orderkey", "type": "bigint", "sources": ["bronze/orders.o_orderkey"]},
        {"name": "posting_date", "type": "timestamp", "sources": ["bronze/orders.o_orderdate"]},
        {"name": "status", "type": "string", "sources": ["bronze/orders.o_orderstatus"]},
        {"name": "priority", "type": "string", "sources": ["bronze/orders.o_orderpriority"]},
        {"name": "amount", "type": "double", "sources": ["bronze/orders.o_totalprice"]},
        {"name": "customer_name", "type": "string", "sources": ["bronze/customer.c_name"]},
        {"name": "segment", "type": "string", "sources": ["bronze/customer.c_mktsegment"]},
    ],
    "silver_fact_contacts": [
        {"name": "contact_key", "type": "string", "sources": []},
        {"name": "custkey", "type": "bigint", "sources": ["bronze/customer.c_custkey"]},
        {"name": "full_name", "type": "string",
         "sources": ["bronze/customer.c_name", "bronze/customer.c_mktsegment"]},
        {"name": "segment", "type": "string", "sources": ["bronze/customer.c_mktsegment"]},
        {"name": "funnel_stage", "type": "string", "sources": ["bronze/orders.o_orderstatus"]},
        {"name": "priority", "type": "string", "sources": ["bronze/orders.o_orderpriority"]},
        {"name": "expected_revenue", "type": "double", "sources": ["bronze/orders.o_totalprice"]},
        {"name": "campaign_flag", "type": "string", "sources": ["bronze/lineitem.l_returnflag"]},
    ],
}

GOLD_LINEAGE: dict[str, list[dict]] = {
    "gold_order_metrics": [
        {"name": "order_year", "type": "int", "sources": ["bronze/orders.o_orderdate"]},
        {"name": "segment", "type": "string", "sources": ["bronze/customer.c_mktsegment"]},
        {"name": "status", "type": "string", "sources": ["bronze/orders.o_orderstatus"]},
        {"name": "total_customers", "type": "bigint", "sources": ["bronze/orders.o_custkey"]},
        {"name": "total_qty", "type": "double", "sources": ["bronze/lineitem.l_quantity"]},
        {"name": "avg_acctbal", "type": "double", "sources": ["bronze/customer.c_acctbal"]},
        {"name": "return_rate", "type": "double",
         "sources": ["bronze/lineitem.l_returnflag", "bronze/orders.o_custkey"]},
        {"name": "funded_customers", "type": "bigint",
         "sources": ["bronze/customer.c_acctbal", "bronze/orders.o_custkey"]},
        {"name": "avg_lines_per_part", "type": "double", "sources": ["bronze/lineitem.l_partkey"]},
    ],
    "gold_revenue_analytics": [
        {"name": "ship_year", "type": "string", "sources": ["bronze/lineitem.l_shipdate"]},
        {"name": "rev_type", "type": "string", "sources": []},
        {"name": "segment", "type": "string", "sources": ["bronze/customer.c_mktsegment"]},
        {"name": "cost_center_name", "type": "string",
         "sources": ["bronze/orders.o_orderpriority"]},
        {"name": "total_customers", "type": "bigint", "sources": ["bronze/orders.o_custkey"]},
        {"name": "total_offered", "type": "double", "sources": ["bronze/lineitem.l_extendedprice"]},
        {"name": "total_disbursed", "type": "double", "sources": ["bronze/lineitem.l_extendedprice"]},
        {"name": "avg_revenue_per_row", "type": "double",
         "sources": ["bronze/lineitem.l_extendedprice"]},
        {"name": "budget_utilization", "type": "double",
         "sources": ["bronze/lineitem.l_extendedprice", "bronze/orders.o_totalprice"]},
    ],
    "gold_status_funnel": [
        {"name": "priority", "type": "string", "sources": ["bronze/orders.o_orderpriority"]},
        {"name": "term_code", "type": "string", "sources": []},
        {"name": "open_orders", "type": "bigint", "sources": ["bronze/orders.o_orderstatus"]},
        {"name": "finished_orders", "type": "bigint", "sources": ["bronze/orders.o_orderstatus"]},
        {"name": "pending_orders", "type": "bigint", "sources": ["bronze/orders.o_orderstatus"]},
        {"name": "completion_rate", "type": "double", "sources": ["bronze/orders.o_orderstatus"]},
        {"name": "melt_rate", "type": "double", "sources": ["bronze/orders.o_orderstatus"]},
        {"name": "expected_revenue", "type": "double", "sources": ["bronze/orders.o_totalprice"]},
        {"name": "top_segment", "type": "string", "sources": ["bronze/customer.c_mktsegment"]},
    ],
}


CORPUS_LINEAGE: dict[str, list[dict]] = {
    "gold_corpus_shards": [
        {"name": "doc_id", "type": "bigint",
         "sources": ["bronze/documents.doc_id"]},
        {"name": "lang", "type": "string",
         "sources": ["bronze/documents.lang"]},
        {"name": "n_tokens", "type": "int",
         "sources": ["bronze/documents.text"]},
        {"name": "bin_id", "type": "bigint",
         "sources": ["bronze/documents.text", "bronze/documents.lang",
                     "bronze/documents.doc_id"]},
        {"name": "pos_in_bin", "type": "int",
         "sources": ["bronze/documents.text", "bronze/documents.lang",
                     "bronze/documents.doc_id"]},
    ],
    "gold_corpus_stats": [
        {"name": "lang", "type": "string",
         "sources": ["bronze/documents.lang"]},
        {"name": "n_docs", "type": "bigint",
         "sources": ["bronze/documents.doc_id"]},
        {"name": "n_canonical", "type": "bigint",
         "sources": ["bronze/documents.text", "bronze/documents.doc_id"]},
        {"name": "n_quality", "type": "bigint",
         "sources": ["bronze/documents.text", "bronze/documents.doc_id"]},
        {"name": "n_sampled", "type": "bigint",
         "sources": ["bronze/documents.text", "bronze/documents.doc_id"]},
        {"name": "total_tokens", "type": "bigint",
         "sources": ["bronze/documents.text"]},
        {"name": "sampled_tokens", "type": "bigint",
         "sources": ["bronze/documents.text", "bronze/documents.doc_id"]},
        {"name": "dup_rate", "type": "double",
         "sources": ["bronze/documents.text", "bronze/documents.doc_id"]},
    ],
}


def lineage_edges(registry: dict[str, list[dict]]) -> list[tuple[str, str]]:
    """(upstream 'layer/table.column', 'table.column') edge list —
    what a catalog (OpenMetadata in the reference) ingests."""
    edges = []
    for table, cols in registry.items():
        for col in cols:
            for src in col["sources"]:
                edges.append((src, f"{table}.{col['name']}"))
    return edges


def _registry_for(asset_key: str) -> list[dict] | None:
    """Asset key ('silver/dim_customers') → its column registry
    ('silver_dim_customers' in SILVER_LINEAGE/GOLD_LINEAGE)."""
    name = asset_key.replace("/", "_")
    return (SILVER_LINEAGE.get(name) or GOLD_LINEAGE.get(name)
            or CORPUS_LINEAGE.get(name))


def column_lineage_for_edge(dep: str, asset_key: str) -> list[dict]:
    """Per-column lineage entries for ONE (dep → asset) table edge:
    ``{"fromColumns": [...], "toColumn": ...}`` with '.'-separated
    fqns (the catalog's columnsLineage shape; reference analog:
    ``trino_iceberg_transform_component.py:304``
    ``_build_column_lineage``).

    Silver assets record bronze-column sources directly. Gold assets
    also record bronze roots, so a gold edge from a SILVER dep is
    derived transitively: the dep's columns whose own bronze sources
    intersect the gold column's roots are the fromColumns."""
    cols = _registry_for(asset_key)
    if not cols:
        return []
    out = []
    to_prefix = asset_key.replace("/", ".")
    if dep.startswith("bronze/"):
        for col in cols:
            froms = [s.replace("/", ".") for s in col["sources"]
                     if s.startswith(dep + ".")]
            if froms:
                out.append({"fromColumns": froms,
                            "toColumn": f"{to_prefix}.{col['name']}"})
    else:
        dep_cols = _registry_for(dep) or []
        dep_prefix = dep.replace("/", ".")
        for col in cols:
            roots = set(col["sources"])
            froms = [f"{dep_prefix}.{dc['name']}" for dc in dep_cols
                     if roots & set(dc["sources"])]
            if froms:
                out.append({"fromColumns": froms,
                            "toColumn": f"{to_prefix}.{col['name']}"})
    return out


def catalog_lineage_payloads(graph) -> list[dict]:
    """Lineage edges in the catalog REST shape the reference pushes
    (``gold_analytics_component.py:288-308``: ``PUT /api/v1/lineage``
    with ``{"edge": {"fromEntity", "toEntity"}}`` per dependency).
    One payload per (dep → asset) edge of the asset graph, fqn =
    asset key with '/' → '.'; edges whose endpoints have column
    registries additionally carry ``lineageDetails.columnsLineage``
    (the reference attaches the same per-column ``sources`` edges to
    asset metadata via ``_build_column_lineage``)."""
    payloads = []
    for key in sorted(graph.assets):
        for dep in graph.assets[key].deps:
            payload = {
                "edge": {
                    "fromEntity": {"type": "table",
                                   "fqn": dep.replace("/", ".")},
                    "toEntity": {"type": "table",
                                 "fqn": key.replace("/", ".")},
                }
            }
            columns = column_lineage_for_edge(dep, key)
            if columns:
                payload["edge"]["lineageDetails"] = {
                    "columnsLineage": columns
                }
            payloads.append(payload)
    return payloads


# the REST path the reference PUTs each edge to
# (gold_analytics_component.py:294 ``api_url = f"{host}/api/v1/lineage"``)
LINEAGE_PATH = "/api/v1/lineage"


class RecordingTransport:
    """Default catalog sender: records each (path, payload) PUT in
    order. A production sender has the same signature and does
    ``requests.put(host + path, json=payload)`` (the reference's
    ``_register_openmetadata_lineage``); tests and dry runs read
    ``.calls``."""

    def __init__(self) -> None:
        self.calls: list[tuple[str, dict]] = []

    def __call__(self, path: str, payload: dict) -> None:
        self.calls.append((path, payload))


def push_lineage(graph, send=None) -> int:
    """Push every lineage edge through ``send(path, payload)`` — one
    PUT-shaped call per (dep → asset) edge, path = LINEAGE_PATH, in
    sorted-asset order. ``send`` defaults to a fresh
    RecordingTransport (record-to-list dry run); pass a requests-
    backed callable for a live catalog. Returns edges pushed."""
    transport = send if send is not None else RecordingTransport()
    payloads = catalog_lineage_payloads(graph)
    for p in payloads:
        transport(LINEAGE_PATH, p)
    return len(payloads)
