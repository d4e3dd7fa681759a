"""The reference's shipped ``concept.rule`` files parse and RUN.

Envelope + completion semantics from
/root/reference/python/knext/knext/schema/marklang/concept_rule_ml.py;
fixtures shaped like the riskmining / supplychain example CSVs."""

import pytest
from pyspark.sql import functions as F

from linkgraph import concept_rules, kgdsl
from linkgraph.gql import PropertyGraph

RISKMINING = (
    "/root/reference/python/knext/knext/examples/riskmining/schema/concept.rule"
)
SUPPLYCHAIN = (
    "/root/reference/python/knext/knext/examples/supplychain/schema/concept.rule"
)


def test_shipped_files_parse_to_valid_kgdsl():
    rm = concept_rules.parse_rule_file(open(RISKMINING).read())
    sc = concept_rules.parse_rule_file(open(SUPPLYCHAIN).read())
    assert len(rm) == 3 and len(sc) == 5
    for r in rm + sc:
        stmts = kgdsl.parse_script(r.dsl)  # every completed rule compiles
        assert len(stmts) == 1 and stmts[0].define is not None
    # namespace qualification happened
    assert rm[0].src_type == "RiskMining.TaxOfRiskApp"
    assert "RiskMining.App" in rm[0].dsl
    # leadTo keys carry the destination concept
    lead = [r for r in sc if r.dst_type]
    assert [(r.src_name, r.dst_name) for r in lead] == [
        ("价格上涨", "成本上涨"),
        ("成本上涨", "利润下跌"),
    ]


@pytest.fixture()
def riskmining_graph(spark):
    apps = spark.createDataFrame(
        [(1, "app1", "含赌博成分"), (2, "app2", "工具")],
        "vid bigint, id string, riskMark string",
    )
    persons = spark.createDataFrame(
        [(10, "dev"), (11, "boss"), (12, "civ")], "vid bigint, id string"
    )
    developed = spark.createDataFrame([(10, 1)], "src bigint, dst bigint")
    release = spark.createDataFrame([(11, 1)], "src bigint, dst bigint")
    trans = spark.createDataFrame([(11, 10)], "src bigint, dst bigint")
    return PropertyGraph(
        {"RiskMining.App": apps, "RiskMining.Person": persons},
        {"developed": developed, "release": release, "fundTrans": trans},
    )


def test_riskmining_end_to_end(riskmining_graph):
    """The three belongTo rules chain: app1 (riskMark like %赌博%) is a
    gambling app, its developer is 开发者, and the releaser who funds the
    developer is 老板 — civilian and app2 stay unclassified."""
    res = concept_rules.run_rule_file(
        open(RISKMINING).read(), riskmining_graph
    )
    apps = res.graph.vertices["RiskMining.TaxOfRiskApp"]
    assert [r["id"] for r in apps.collect()] == ["app1"]
    users = res.graph.vertices["RiskMining.TaxOfRiskUser"]
    got = {(r["id"], r["concept"]) for r in users.collect()}
    assert got == {("dev", "赌博App开发者"), ("boss", "赌博App老板")}


@pytest.fixture()
def supplychain_graph(spark):
    events = spark.createDataFrame(
        [(1, "e1", "价格", "上涨"), (2, "e2", "价格", "下跌")],
        "vid bigint, id string, index string, trend string",
    )
    cevents = spark.createDataFrame(
        [(10, "ce1", "成本", "上涨")],
        "vid bigint, id string, index string, trend string",
    )
    products = spark.createDataFrame(
        [(100, "原油"), (101, "汽油")], "vid bigint, id string"
    )
    companies = spark.createDataFrame(
        [(200, "c1", "炼化公司")], "vid bigint, id string, name string"
    )
    subj = spark.createDataFrame(
        [(1, 100), (10, 200)], "src bigint, dst bigint"
    )
    chain = spark.createDataFrame([(100, 101)], "src bigint, dst bigint")
    prodedge = spark.createDataFrame([(200, 101)], "src bigint, dst bigint")
    return PropertyGraph(
        {
            "SupplyChain.ProductChainEvent": events,
            "SupplyChain.CompanyEvent": cevents,
            "SupplyChain.Product": products,
            "SupplyChain.Company": companies,
        },
        {"subject": subj, "hasSupplyChain": chain, "product": prodedge},
    )


def test_supplychain_causation_chain(supplychain_graph):
    """belongTo classification + leadTo rules with Action DDL: the price
    event propagates down the supply chain into a CREATED cost event
    (createNodeInstance with no id= — deterministic content-hash
    identity), and the pre-existing cost event yields a profit event."""
    res = concept_rules.run_rule_file(
        open(SUPPLYCHAIN).read(), supplychain_graph
    )
    prod = res.graph.vertices["SupplyChain.TaxOfProdEvent"]
    assert [(r["id"], r["concept"]) for r in prod.collect()] == [
        ("e1", "价格上涨")
    ]
    ces = res.graph.vertices["SupplyChain.CompanyEvent"]
    created = {
        (r["name"], r["index"], r["trend"])
        for r in ces.collect()
        if r["id"] not in ("ce1",)
    }
    assert ("炼化公司成本上升事件", "成本", "上涨") in created
    assert ("炼化公司利润下跌事件", "利润", "下跌") in created
    assert res.graph.edges["leadTo"].count() == 2


def test_supplychain_fixpoint_classifies_created_events(supplychain_graph):
    """fixpoint=True re-runs the file until stable: the cost event the
    leadTo rule CREATED gets classified by the earlier belongTo rule on
    the second round (the reference server re-evaluates taxonomy
    dynamically; one-pass mode legitimately misses it)."""
    one = concept_rules.run_rule_file(
        open(SUPPLYCHAIN).read(), supplychain_graph
    )
    fix = concept_rules.run_rule_file(
        open(SUPPLYCHAIN).read(), supplychain_graph, fixpoint=True
    )
    one_rows = one.graph.vertices["SupplyChain.TaxOfCompanyEvent"].collect()
    assert [(r["id"], r["concept"]) for r in one_rows] == [("ce1", "成本上涨")]
    fix_rows = fix.graph.vertices["SupplyChain.TaxOfCompanyEvent"].collect()
    assert len(fix_rows) == 3  # ce1 + both created events, no duplicates
    created_cost = [
        r for r in fix_rows if r["id"] != "ce1" and r["concept"] == "成本上涨"
    ]
    assert len(created_cost) == 1
    # identical re-created instances collapse (content-hash identity)
    assert (
        fix.graph.vertices["SupplyChain.CompanyEvent"]
        .groupBy("vid").count().where("count > 1").count() == 0
    )


def test_headless_rule_completion(spark):
    """A rule body with no Define head gets the generated belongTo head
    (subject type from subject_types; the reference infers it from the
    server schema) — and without the mapping it fails loudly."""
    text = """namespace Demo

`RiskLevel`/`high`:
    rule: [[
        Structure {
        }
        Constraint {
            R1: s.score >= 90
        }
    ]]
"""
    rules = concept_rules.parse_rule_file(
        text, subject_types={"Demo.RiskLevel": "Demo.Account"}
    )
    assert len(rules) == 1
    assert "Define (s:Demo.Account)-[p:belongTo]->" in rules[0].dsl
    accounts = spark.createDataFrame(
        [(1, "a1", 95), (2, "a2", 50)], "vid bigint, id string, score int"
    )
    res = concept_rules.run_rule_file(
        text,
        PropertyGraph({"Demo.Account": accounts}, {}),
        subject_types={"Demo.RiskLevel": "Demo.Account"},
    )
    assert [r["id"] for r in res.graph.vertices["Demo.RiskLevel"].collect()] == ["a1"]
    with pytest.raises(ValueError, match="subject_types"):
        concept_rules.parse_rule_file(text)


def test_envelope_errors():
    with pytest.raises(ValueError, match="namespace first"):
        concept_rules.parse_rule_file("`A`/`x`:\n    rule: [[ y ]]\n")
    with pytest.raises(ValueError, match="duplicate namespace"):
        concept_rules.parse_rule_file("namespace A\nnamespace B\n")
    with pytest.raises(ValueError, match="unterminated"):
        concept_rules.parse_rule_file(
            "namespace A\n\n`T`/`x`:\n    rule: [[\n        stuff\n"
        )
    with pytest.raises(ValueError, match="expected rule:"):
        concept_rules.parse_rule_file(
            "namespace A\n\n`T`/`x`:\n    nonsense\n"
        )


def test_ddl_type_qualified_after_parenthesized_value(spark):
    """type= FOLLOWING a parenthesized value entry still gets the
    namespace (a non-greedy regex can't cross the close paren)."""
    rule = (
        'createNodeInstance(value={name=concat(c.name, "x")}, '
        "type=CompanyEvent)"
    )
    out = concept_rules._qualify_ddl_types(rule, "NS")
    assert "type=NS.CompanyEvent" in out
    # already-qualified types stay untouched
    again = concept_rules._qualify_ddl_types(out, "NS")
    assert again == out


def test_unconsumed_concept_key_raises():
    two_keys = "namespace A\n\n`T`/`x`:\n`U`/`y`:\n    rule: [[ Define (s:E)-[p:belongTo]->(o:`U`/`y`) { Structure { } Constraint { } } ]]\n"
    with pytest.raises(ValueError, match="no rule"):
        concept_rules.parse_rule_file(two_keys)
    with pytest.raises(ValueError, match="end of file"):
        concept_rules.parse_rule_file("namespace A\n\n`T`/`x`:\n")


def test_multi_producer_pred_values_both_survive(spark):
    """Two belongTo Defines on ONE subject label merge the shared pred
    property (coalesce) instead of the second overwriting the first."""
    accounts = spark.createDataFrame(
        [(1, "a1", 95), (2, "a2", 10)], "vid bigint, id string, score int"
    )
    res = kgdsl.run_script(
        """
Define (s:Account)-[p:belongTo]->(o:`Tier`/`high`) {
    GraphStructure { (s) }
    Rule { R1: s.score >= 90 }
}

Define (s:Account)-[p:belongTo]->(o:`Tier`/`low`) {
    GraphStructure { (s) }
    Rule { R1: s.score < 90 }
}

GraphStructure { (s:Account) }
Action { get(s.id, s.belongTo) }
""",
        PropertyGraph({"Account": accounts}, {}),
    )
    got = {(r["s_id"], r["s_belongTo"]) for r in res.table.collect()}
    assert got == {("a1", "high"), ("a2", "low")}
    # the accumulated ddl delta holds BOTH classifications
    assert res.ddl["belongTo"].count() == 2


def test_idless_instance_hash_null_safe(spark):
    """Content-hash identity distinguishes null-vs-value swaps (to_json
    with ignoreNullFields=false, not concat_ws which drops nulls)."""
    rows = spark.createDataFrame(
        [("x", None, "k1"), (None, "x", "k2")], "a string, b string, id string"
    )
    res = kgdsl.run_script(
        """
GraphStructure { (r:Rows) }
Action {
    createNodeInstance(type=Out, value={ p=r.a  q=r.b })
}
""",
        PropertyGraph({"Rows": rows.withColumn("vid", F.monotonically_increasing_id())}, {}),
    )
    assert res.graph.vertices["Out"].select("vid").distinct().count() == 2


def test_multi_producer_concept_defines_toposort(spark):
    """Several belongTo Defines for ONE concept type in ONE script (the
    riskmining shape) order before their consumer instead of tripping
    the duplicate-producer guard."""
    accounts = spark.createDataFrame(
        [(1, "a1", 95), (2, "a2", 10)], "vid bigint, id string, score int"
    )
    g = PropertyGraph({"Account": accounts}, {})
    res = kgdsl.run_script(
        """
GraphStructure { (t:Tier) }
Action { get(t.id, t.concept) }

Define (s:Account)-[p:belongTo]->(o:`Tier`/`high`) {
    GraphStructure { (s) }
    Rule { R1: s.score >= 90 }
}

Define (s:Account)-[p:belongTo]->(o:`Tier`/`low`) {
    GraphStructure { (s) }
    Rule { R1: s.score < 90 }
}
""",
        g,
    )
    got = {(r["t_id"], r["t_concept"]) for r in res.table.collect()}
    assert got == {("a1", "high"), ("a2", "low")}
