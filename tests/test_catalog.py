import json

from linkgraph.catalog import GraphCatalog
from linkgraph.gql import compile_query


def test_catalog_to_pattern_query(spark, tmp_path):
    verts = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")],
        "vid bigint, name string, junk string",
    )
    edges = spark.createDataFrame(
        [(1, 2, 9.0), (2, 3, 1.5)], "src bigint, dst bigint, weight double"
    )
    verts.write.parquet(str(tmp_path / "v"))
    edges.write.parquet(str(tmp_path / "e"))
    spec = {
        "vertices": {"Page": {"path": str(tmp_path / "v"), "columns": ["vid", "name"]}},
        "edges": {"links": {"path": str(tmp_path / "e")}},
    }
    cat = GraphCatalog.from_json(spark, json.dumps(spec))
    assert cat.vertex_labels() == ["Page"] and cat.edge_types() == ["links"]
    g = cat.property_graph()
    # the column allowlist pruned 'junk' from the vertex binding
    assert "junk" not in g.vertices["Page"].columns
    got = {
        (r["a"], r["b"], r["w"])
        for r in compile_query(
            "MATCH (a:Page)-[e:links]->(b:Page) RETURN a.name AS a, b.name AS b, e.weight AS w",
            g,
        ).collect()
    }
    assert got == {("a", "b", 9.0), ("b", "c", 1.5)}
