"""Graph catalog: label/type -> stored-table bindings.

Reference parity: queries resolve schemas through a Catalog —
`OpenSPGCatalog` (HTTP project schema) or the JSON/map literal catalogs
used by tests (/root/reference/reasoner/lube-api/src/main/scala/com/antgroup/openspg/reasoner/lube/catalog/Catalog.scala;
impl/JSONGraphCatalog.scala, impl/PropertyGraphCatalog.scala). Here the
catalog is a JSON-able dict binding vertex labels and edge types to
parquet/Iceberg locations with optional column allowlists
(GraphLoaderConfig.java:32-53 property-allowlist analog), materialized
lazily into a :class:`linkgraph.gql.PropertyGraph` of column-pruned
reads — the allowlist reaches the scan (`ReadSchema`), so unqueried
properties are never deserialized.

Catalog dict shape::

    {
      "vertices": {"Page": {"path": "/data/verts", "columns": ["vid", "url"]}},
      "edges":    {"links": {"path": "/data/edges", "columns": ["src", "dst", "anchor"],
                              "format": "parquet"}}
    }

``format`` defaults to parquet; ``"table"`` reads a catalog table name
(Iceberg when the session has a configured catalog — tables.py gating).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def _load_one(spark: SparkSession, spec: dict) -> DataFrame:
    fmt = spec.get("format", "parquet")
    if fmt == "table":
        df = spark.read.table(spec["path"])
    else:
        df = spark.read.format(fmt).load(spec["path"])
    cols = spec.get("columns")
    return df.select(*cols) if cols else df


class GraphCatalog:
    """Lazy label->DataFrame resolver over a catalog dict."""

    def __init__(self, spark: SparkSession, spec: dict):
        self.spark = spark
        self.spec = spec

    @classmethod
    def from_json(cls, spark: SparkSession, text: str) -> "GraphCatalog":
        return cls(spark, json.loads(text))

    def vertex_labels(self) -> list[str]:
        return sorted(self.spec.get("vertices", {}))

    def edge_types(self) -> list[str]:
        return sorted(self.spec.get("edges", {}))

    def property_graph(self):
        """Materialize every binding into a PropertyGraph for the GQL
        front-end (reads are lazy DataFrames; nothing scans until a
        query runs)."""
        from linkgraph.gql import PropertyGraph

        return PropertyGraph(
            {lb: _load_one(self.spark, s) for lb, s in self.spec.get("vertices", {}).items()},
            {et: _load_one(self.spark, s) for et, s in self.spec.get("edges", {}).items()},
        )
