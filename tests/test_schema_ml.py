"""The reference's shipped ``.schema`` files parse, validate, and their
EMBEDDED KGDSL property/relation rules run.

Format from /root/reference/python/knext/knext/schema/marklang/
schema_ml.py; fixtures shaped like the example projects' CSVs."""

import glob
from datetime import datetime, timedelta

import pytest

from linkgraph import schema_ml
from linkgraph.gql import PropertyGraph

EXAMPLES = "/root/reference/python/knext/knext/examples"


def test_all_shipped_schema_files_parse():
    expected = {
        "finance": (2, 0),
        "medicine": (6, 0),
        "oneke": (11, 0),
        "riskmining": (7, 2),
        "supplychain": (11, 13),
        "test": (8, 0),  # knext/tests — KTStd spreadable/regular metas
    }
    paths = sorted(glob.glob(f"{EXAMPLES}/*/schema/*.schema")) + [
        "/root/reference/python/knext/tests/test/schema/test.schema"
    ]
    assert len(paths) == len(expected), "a shipped .schema file is unchecked"
    for path in paths:
        name = path.rsplit("/", 1)[-1].removesuffix(".schema")
        m = schema_ml.parse_schema(open(path).read())
        rules = schema_ml.property_rules(m)
        assert (len(m.types), len(rules)) == expected[name], name
    # the KTStd type metas round-trip (reference schema_ml.py:421-438)
    m = schema_ml.parse_schema(
        open("/root/reference/python/knext/tests/test/schema/test.schema").read()
    )
    std = m.types["STD.Standard"]
    assert std.spreadable is True
    assert std.regular.startswith(r"^\d{4}")


def test_standard_type_metas_validated():
    import pytest

    with pytest.raises(ValueError, match="standard type only"):
        schema_ml.parse_schema(
            "namespace T\n\nE(e): EntityType\n    spreadable: True\n"
        )
    with pytest.raises(ValueError, match="True or False"):
        schema_ml.parse_schema(
            "namespace T\n\nS(s): StandardType\n    spreadable: yes\n"
        )
    with pytest.raises(ValueError, match="concept type only"):
        schema_ml.parse_schema(
            "namespace T\n\nS(s): StandardType\n    autoRelate: X\n"
        )
    # spot-check structure: riskmining Person
    m = schema_ml.parse_schema(open(f"{EXAMPLES}/riskmining/schema/riskmining.schema").read())
    person = m.types["RiskMining.Person"]
    assert person.kind == "EntityType" and person.display == "自然人"
    assert person.properties["age"].object_type == "Integer"
    assert person.properties["belongTo"].semantic == "IND"
    assert person.properties["belongTo"].object_type == "RiskMining.TaxOfRiskUser"
    ft = person.relations["fundTrans"]
    assert set(ft.sub_properties) == {"transDate", "transAmt"}
    assert person.relations["developed"].rule is not None
    assert "RiskMining.Device" in person.relations["developed"].rule
    # concept type meta
    assert m.types["RiskMining.TaxOfRiskUser"].hypernym == "isA"
    # constraint capture (Device.install MultiValue)
    assert m.types["RiskMining.Device"].properties["install"].constraints == ["MultiValue"]


def test_semantic_prefix_validation():
    with pytest.raises(ValueError, match="not a IND#"):
        schema_ml.parse_schema(
            "namespace A\n\nT(t): EntityType\n    properties:\n"
            "        IND#leadTo(x): T\n"
        )
    with pytest.raises(ValueError, match="unknown semantic prefix"):
        schema_ml.parse_schema(
            "namespace A\n\nT(t): EntityType\n    properties:\n"
            "        ZZZ#belongTo(x): T\n"
        )


@pytest.fixture()
def riskmining_graph(spark):
    persons = spark.createDataFrame([(1, "dev"), (2, "boss"), (3, "civ")], "vid bigint, id string")
    apps = spark.createDataFrame([(10, "app1")], "vid bigint, id string")
    devices = spark.createDataFrame(
        [(100 + i, f"d{i}") for i in range(7)], "vid bigint, id string"
    )
    companies = spark.createDataFrame([(200, "c1")], "vid bigint, id string")
    certs = spark.createDataFrame([(300, "cert1")], "vid bigint, id string")
    return PropertyGraph(
        {
            "RiskMining.Person": persons,
            "RiskMining.App": apps,
            "RiskMining.Device": devices,
            "RiskMining.Company": companies,
            "RiskMining.Cert": certs,
        },
        {
            "hasDevice": spark.createDataFrame(
                [(1, 100 + i) for i in range(7)], "src bigint, dst bigint"
            ),
            "install": spark.createDataFrame(
                [(100 + i, 10) for i in range(7)], "src bigint, dst bigint"
            ),
            "holdShare": spark.createDataFrame([(2, 200)], "src bigint, dst bigint"),
            "hasCert": spark.createDataFrame([(200, 300)], "src bigint, dst bigint"),
            "useCert": spark.createDataFrame([(10, 300)], "src bigint, dst bigint"),
        },
    )


def test_riskmining_rules_run(riskmining_graph):
    """developed needs a HAVING (deviceNum = group(s,o).count(d); R1:
    deviceNum > 5 — dev has 7 devices, others 0) and release walks
    holdShare/hasCert plus the untyped `[useCert]` alias-as-type edge."""
    m = schema_ml.parse_schema(
        open(f"{EXAMPLES}/riskmining/schema/riskmining.schema").read()
    )
    assert schema_ml.validate_graph(m, riskmining_graph)["missing_vertex_tables"] == []
    res = schema_ml.apply_rules(m, riskmining_graph)
    dev = [(r["src"], r["dst"]) for r in res.graph.edges["developed"].collect()]
    rel = [(r["src"], r["dst"]) for r in res.graph.edges["release"].collect()]
    assert dev == [(1, 10)]
    assert rel == [(2, 10)]


def test_supplychain_rules_run(spark):
    """The 13 supplychain rules include CROSS-RULE dependencies
    (mainSupply's having divides by s.totalTransInAmt, produced by the
    FIRST rule) — _toposort orders them; date-windowed fundTrans
    features and the null-coalescing cashflowDiff rules also run."""
    m = schema_ml.parse_schema(
        open(f"{EXAMPLES}/supplychain/schema/supplychain.schema").read()
    )
    ten_days_ago = (datetime.now() - timedelta(days=10)).strftime("%Y%m%d")
    companies = spark.createDataFrame(
        [(1, "c1"), (2, "c2")], "vid bigint, id string"
    )
    persons = spark.createDataFrame([(50, "u")], "vid bigint, id string")
    products = spark.createDataFrame([(10, "原油"), (11, "汽油")], "vid bigint, id string")
    g = PropertyGraph(
        {
            "SupplyChain.Company": companies,
            "SupplyChain.Person": persons,
            "SupplyChain.Product": products,
            "SupplyChain.Industry": spark.createDataFrame(
                [(90, "能源")], "vid bigint, id string"
            ),
        },
        {
            "product": spark.createDataFrame(
                [(1, 10), (2, 11)], "src bigint, dst bigint"
            ),
            "hasSupplyChain": spark.createDataFrame(
                [(10, 11)], "src bigint, dst bigint"
            ),
            "fundTrans": spark.createDataFrame(
                [(2, 1, 100, ten_days_ago)],
                "src bigint, dst bigint, transAmt bigint, transDate string",
            ),
            "legalRepresentative": spark.createDataFrame(
                [(50, 1), (50, 2)], "src bigint, dst bigint"
            ),
            "belongToIndustry": spark.createDataFrame(
                [(10, 90)], "src bigint, dst bigint"
            ),
        },
    )
    res = schema_ml.apply_rules(m, g)
    c = {r["id"]: r for r in res.graph.vertices["SupplyChain.Company"].collect()}
    assert c["c1"]["totalTransInAmt"] == 100
    assert c["c2"]["totalTransInAmt"] is None
    assert c["c2"]["fundTrans1Month"] == 100  # 10 days ago < 30-day window
    assert c["c1"]["fundTrans1MonthIn"] == 100
    assert c["c2"]["cashflowDiff1Month"] == 100  # out 100, in 0 (coalesced)
    # mainSupply: c2 pays 100 of c1's 100 total inflow -> ratio 1.0 > 0.5
    ms = [(r["src"], r["dst"]) for r in res.graph.edges["mainSupply"].collect()]
    assert ms == [(1, 2)]
    # homomorphic matching (the engine's documented semantics — same as
    # the DuckDB-SQL oracles): s and o may bind one vertex, so the
    # symmetric pattern also yields the self-pairs
    slr = {(r["src"], r["dst"]) for r in res.graph.edges["sameLegalRepresentative"].collect()}
    assert slr == {(1, 2), (2, 1), (1, 1), (2, 2)}
    bti = [(r["src"], r["dst"]) for r in res.graph.edges["belongToIndustry"].collect()]
    assert bti == [(1, 90)]


def test_validate_graph_reports_missing(spark):
    m = schema_ml.parse_schema(
        "namespace A\n\nT(t): EntityType\n    properties:\n"
        "        name(n): Text\n    relations:\n        knows(k): T\n"
    )
    empty = PropertyGraph({}, {})
    rep = schema_ml.validate_graph(m, empty)
    assert rep["missing_vertex_tables"] == ["A.T"]
    ok = PropertyGraph(
        {"A.T": spark.createDataFrame([(1, "x")], "vid bigint, name string")},
        {"knows": spark.createDataFrame([(1, 1)], "src bigint, dst bigint")},
    )
    rep = schema_ml.validate_graph(m, ok)
    assert rep == {
        "missing_vertex_tables": [],
        "missing_columns": [],
        "missing_edge_tables": [],
    }
