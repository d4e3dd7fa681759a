"""KGDSL dialect tests — parse goldens mirror the reference's DSL test
shapes (LocalRunnerTest.java:44-55 road DSL, KgReasonerZijinLocalTest
Define chains, KgReasonerLeadToTest createNodeInstance/createEdgeInstance);
execution tests check results against hand-built DataFrame plans."""

import pytest
from pyspark.sql import functions as F

from linkgraph import kgdsl
from linkgraph.gql import PropertyGraph
from linkgraph.kgdsl import parse_script, run_script


# ---------------------------------------------------------------------------
# parse goldens
# ---------------------------------------------------------------------------


ROAD_DSL = """
GraphStructure {
        (s1:Road.Event)-[p1:subject]-(o1:Road.Researcher)
        (s1:Road.Event)-[p3:object]-(o3:Road.Area)
}
Rule {
        R0: o1.id == "zhangsan"
        R1: o3.name rlike "north.*"
}
Action {
    get(o3.name)
}
"""


def test_parse_road_dsl_golden():
    stmts = parse_script(ROAD_DSL)
    assert len(stmts) == 1
    s = stmts[0]
    assert s.define is None
    assert set(s.query.nodes) == {"s1", "o1", "o3"}
    assert s.query.nodes["s1"].label == "Road.Event"
    assert all(e.undirected for e in s.query.edges)
    assert {e.rel for e in s.query.edges} == {"subject", "object"}
    assert ("bin", "=", ("ref", "o1", "id"), ("lit", "zhangsan")) in s.filters
    assert ("bin", "rlike", ("ref", "o3", "name"), ("lit", "north.*")) in s.filters
    assert s.gets == [(("ref", "o3", "name"), None)]


def test_parse_define_golden():
    stmts = parse_script(
        """
Define (s:CustFundKG.Account)-[p:cur_month_num]->(o:Int) {
    GraphStructure {
        (u:CustFundKG.Account)-[t:accountFundContact]-(s)
    }
    Rule {
        R1("this month"): t.transDate >= 20240101
        o = group(s).count(t.transDate)
    }
}
"""
    )
    assert len(stmts) == 1
    s = stmts[0]
    assert s.define.pred == "cur_month_num"
    assert s.define.is_property
    assert s.define.subj_label == "CustFundKG.Account"
    # the Define head binds the subject's label inside the body
    assert s.query.nodes["s"].label == "CustFundKG.Account"
    assert s.aggs["o"] == (["s"], "count", [("ref", "t", "transDate")])
    assert s.filters == [
        ("bin", ">=", ("ref", "t", "transDate"), ("lit", 20240101))
    ]


def test_parse_normalized_operators_and_comments():
    stmts = parse_script(
        """
GraphStructure { (a:T)-[e:r]->(b:T) }  // trailing comment
Rule {
    R0: a.x != 1 && (b.y == null || !(a.z >= 2))
    w = a.x * 2
}
Action { get(a.id, b.id) }
"""
    )
    s = stmts[0]
    (f0,) = s.filters
    assert f0[0] == "bin" and f0[1] == "and"
    assert f0[2] == ("bin", "<>", ("ref", "a", "x"), ("lit", 1))
    assert f0[3][1] == "or"
    assert f0[3][2] == ("bin", "=", ("ref", "b", "y"), ("lit", None))
    assert s.lets["w"] == ("bin", "*", ("ref", "a", "x"), ("lit", 2))


def test_parse_concept_qualified_label():
    stmts = parse_script(
        "GraphStructure { (u:RiskApp/`gambling`)-[e:developed]->(a:App) }\n"
        "Rule { }\nAction { get(u.id) }"
    )
    s = stmts[0]
    assert s.query.nodes["u"].label == "RiskApp"
    assert (
        "u",
        ("bin", "=", ("ref", "u", "concept"), ("lit", "gambling")),
    ) in s.node_constraints


def test_parse_action_ddl_golden():
    stmts = parse_script(
        """
GraphStructure { (s:Corp)-[e:hit]->(o:Accident) }
Rule { }
Action {
    ev = createNodeInstance(
        type=Influence,
        value={
            id = s.id
            subject = s.name
            degree = 'down'
        }
    )
    createEdgeInstance(
        src=s,
        dst=ev,
        type=leadTo,
        value={
        }
    )
}
"""
    )
    s = stmts[0]
    (ni,) = s.node_instances
    assert ni.var == "ev" and ni.type == "Influence"
    assert ("subject", ("ref", "s", "name")) in ni.value
    (ei,) = s.edge_instances
    assert (ei.src, ei.dst, ei.type) == ("s", "ev", "leadTo")


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------


@pytest.fixture()
def fund_graph(spark):
    accounts = spark.createDataFrame(
        [(1, "acc1"), (2, "acc2"), (3, "acc3"), (4, "acc4")],
        "vid bigint, id string",
    )
    transfers = spark.createDataFrame(
        # (src, dst, transDate, amount)
        [
            (1, 2, 20240105, 100.0),
            (1, 3, 20240110, 50.0),
            (2, 3, 20231201, 70.0),
            (3, 4, 20240120, 30.0),
            (2, 1, 20240102, 10.0),
        ],
        "src bigint, dst bigint, transDate int, amount double",
    )
    return PropertyGraph({"Account": accounts}, {"transfer": transfers})


def test_base_statement_filters_and_get(fund_graph):
    res = run_script(
        """
GraphStructure { (a:Account)-[t:transfer]->(b:Account) }
Rule {
    R0: t.transDate >= 20240101
    R1: t.amount > 20
}
Action { get(a.id, b.id, t.amount) }
""",
        fund_graph,
    )
    got = {(r["a_id"], r["b_id"], r["t_amount"]) for r in res.table.collect()}
    assert got == {("acc1", "acc2", 100.0), ("acc1", "acc3", 50.0),
                   ("acc3", "acc4", 30.0)}


def test_define_property_then_query_with_toposort(fund_graph):
    # consumer statement FIRST: the runner must topo-order on the
    # produced property name (Validator/Dag analog)
    res = run_script(
        """
GraphStructure { (s:Account) }
Rule { R0: s.out_num >= 2 }
Action { get(s.id, s.out_num) }

Define (s:Account)-[p:out_num]->(o:Int) {
    GraphStructure { (s)-[t:transfer]->(u:Account) }
    Rule {
        o = group(s).count(t.transDate)
    }
}
""",
        fund_graph,
    )
    got = {(r["s_id"], r["s_out_num"]) for r in res.table.collect()}
    assert got == {("acc1", 2), ("acc2", 2)}
    assert "out_num" in res.ddl


def test_define_property_expression_with_lets(fund_graph):
    res = run_script(
        """
Define (s:Account)-[p:flag]->(o:Boolean) {
    GraphStructure { (s) }
    Rule {
        nid = s.vid
        o = nid >= 3
    }
}
GraphStructure { (s:Account) }
Rule { R0: s.flag == true }
Action { get(s.id) }
""",
        fund_graph,
    )
    assert {r["s_id"] for r in res.table.collect()} == {"acc3", "acc4"}


def test_define_derived_edge_with_agg_prop(fund_graph):
    # AttributePOC holdPMProduct2-style: entity object type -> new edge
    # with an aggregated property (KgReasonerZijinLocalTest.java:161-177)
    res = run_script(
        """
Define (s:Account)-[p:big_partner]->(o:Account) {
    GraphStructure { (s)-[t:transfer]->(o) }
    Rule {
        p.total = group(s,o).sum(t.amount)
    }
}
GraphStructure { (a:Account)-[e:big_partner]->(b:Account) }
Rule { R0: e.total >= 50 }
Action { get(a.id, b.id, e.total) }
""",
        fund_graph,
    )
    got = {(r["a_id"], r["b_id"], r["e_total"]) for r in res.table.collect()}
    assert got == {("acc1", "acc2", 100.0), ("acc1", "acc3", 50.0),
                   ("acc2", "acc3", 70.0)}
    assert set(res.graph.edges) == {"transfer", "big_partner"}


def test_action_ddl_creates_nodes_edges_and_upserts(fund_graph, spark, tmp_path):
    from linkgraph.tables import TableStore

    store = TableStore(spark, str(tmp_path / "store"))
    res = run_script(
        """
GraphStructure { (a:Account)-[t:transfer]->(b:Account) }
Rule { R0: t.amount >= 70 }
Action {
    ev = createNodeInstance(
        type=BigTransfer,
        value={
            id = a.id
            amount = t.amount
        }
    )
    createEdgeInstance(
        src=a,
        dst=ev,
        type=flagged,
        value={
            when = t.transDate
        }
    )
}
""",
        fund_graph,
        store=store,
    )
    assert res.table is None
    assert "BigTransfer" in res.graph.vertices
    assert "flagged" in res.graph.edges
    assert res.graph.vertices["BigTransfer"].count() == 2  # acc1, acc2 rows
    # DDL persisted through the TableStore (GraphStoreSinkWriter analog)
    assert store.read("vertices_BigTransfer").count() == 2
    assert store.read("edges_flagged").count() == 2
    # the new edge type is queryable in a follow-up script run
    res2 = run_script(
        "GraphStructure { (a:Account)-[f:flagged]->(e:BigTransfer) }\n"
        "Rule { }\nAction { get(a.id, f.when) }",
        res.graph,
    )
    assert {r["f_when"] for r in res2.table.collect()} == {20240105, 20231201}


def test_params_bind_in_rules(fund_graph):
    res = run_script(
        """
GraphStructure { (a:Account)-[t:transfer]->(b:Account) }
Rule { R0: t.amount >= $minamt }
Action { get(a.id, b.id) }
""",
        fund_graph,
        params={"minamt": 70},
    )
    got = {(r["a_id"], r["b_id"]) for r in res.table.collect()}
    assert got == {("acc1", "acc2"), ("acc2", "acc3")}


def test_null_equality_is_null_semantics(spark):
    verts = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5)], "vid bigint, id string, x int"
    )
    g = PropertyGraph({"V": verts}, {"E": spark.createDataFrame(
        [(1, 2)], "src bigint, dst bigint")})
    res = run_script(
        "GraphStructure { (v:V) }\nRule { R0: v.x == null }\nAction { get(v.id) }",
        g,
    )
    assert {r["v_id"] for r in res.table.collect()} == {"a"}


def test_cycle_detection():
    with pytest.raises(ValueError, match="cyclic"):
        run_script(
            """
Define (s:A)-[p:x]->(o:Int) {
    GraphStructure { (s)-[e:y]->(u:A) }
    Rule { o = group(s).count(e.ts) }
}
Define (s:A)-[p:y]->(o:A) {
    GraphStructure { (s)-[e:x_edge]->(o) }
    Rule { R0: s.x > 1 }
}
""",
            PropertyGraph({}, {}),
        )


# ---------------------------------------------------------------------------
# review-pass regressions (round 3)
# ---------------------------------------------------------------------------


def test_define_with_action_ddl_inside(fund_graph):
    """Action { createNodeInstance } INSIDE a Define block executes
    (KgReasonerLeadToTest addVertexTest1 shape): both the derived
    property and the created vertices must appear."""
    res = run_script(
        """
Define (s:Account)-[p:outn]->(o:Int) {
    GraphStructure { (s)-[t:transfer]->(u:Account) }
    Rule {
        num = group(s).count(u.vid)
        o = num
    }
    Action {
        createNodeInstance(
            type=OutCount,
            value={
                id = s.id
            }
        )
    }
}
GraphStructure { (s:Account) }
Rule { R0: s.outn >= 2 }
Action { get(s.id, s.outn) }
""",
        fund_graph,
    )
    # the let-to-agg indirection (o = num) resolves to the aggregation
    assert {(r["s_id"], r["s_outn"]) for r in res.table.collect()} == {
        ("acc1", 2), ("acc2", 2)
    }
    # and the Action DDL inside the Define really ran
    assert "OutCount" in res.graph.vertices
    assert res.graph.vertices["OutCount"].count() == 3  # acc1, acc2, acc3


def test_params_bind_in_agg_args_and_ddl_values(fund_graph):
    res = run_script(
        """
Define (s:Account)-[p:tot]->(o:Double) {
    GraphStructure { (s)-[t:transfer]->(u:Account) }
    Rule { o = group(s).sum(t.amount * $fx) }
}
GraphStructure { (s:Account) }
Rule { R0: s.tot >= $cut }
Action { get(s.id, s.tot) }
""",
        fund_graph,
        params={"fx": 2, "cut": 200},
    )
    got = {(r["s_id"], r["s_tot"]) for r in res.table.collect()}
    assert got == {("acc1", 300.0)}  # (100+50)*2


def test_parsed_script_reusable_with_different_params(fund_graph):
    stmts = parse_script(
        "GraphStructure { (a:Account)-[t:transfer]->(b:Account) }\n"
        "Rule { R0: t.amount >= $minamt }\nAction { get(a.id, b.id) }"
    )
    first = run_script(stmts, fund_graph, params={"minamt": 100})
    second = run_script(stmts, fund_graph, params={"minamt": 10})
    assert first.table.count() == 1
    assert second.table.count() == 5  # caller's AST not clobbered by run 1


def test_toposort_sees_let_only_dependency(fund_graph):
    res = run_script(
        """
GraphStructure { (s:Account) }
Rule {
    f = s.flag2
    R0: f == true
}
Action { get(s.id) }

Define (s:Account)-[p:flag2]->(o:Boolean) {
    GraphStructure { (s) }
    Rule { o = s.vid >= 3 }
}
""",
        fund_graph,
    )
    assert {r["s_id"] for r in res.table.collect()} == {"acc3", "acc4"}


def test_unnamed_filter_line_rejected_loudly(fund_graph):
    # `t.amount == 100` is a comparison, not an assignment — the
    # tokenizer keeps `==` distinct so this is rejected at parse time
    # (silently dropping it would un-filter the query)
    with pytest.raises(SyntaxError, match="must be named"):
        run_script(
            "GraphStructure { (a:Account)-[t:transfer]->(b:Account) }\n"
            "Rule { t.amount == 100 }\nAction { get(a.id) }",
            fund_graph,
        )


def test_dotted_type_names_in_ddl(fund_graph):
    res = run_script(
        """
GraphStructure { (a:Account)-[t:transfer]->(b:Account) }
Rule { R0: t.amount >= 100 }
Action {
    ev = createNodeInstance(
        type=HengSheng.CompanyInfluence,
        value={ id = a.id }
    )
    createEdgeInstance(src=a, dst=ev, type=Risk.leadTo, value={ })
}
""",
        fund_graph,
    )
    assert "HengSheng.CompanyInfluence" in res.graph.vertices
    assert "Risk.leadTo" in res.graph.edges


def test_addproperty_group_beyond_subject_rejected(fund_graph):
    with pytest.raises(ValueError, match="subject alias"):
        run_script(
            """
Define (s:Account)-[p:n]->(o:Int) {
    GraphStructure { (s)-[t:transfer]->(u:Account) }
    Rule { o = group(s,u).count(t.transDate) }
}
GraphStructure { (s:Account) }
Rule { }
Action { get(s.id) }
""",
            fund_graph,
        )


def test_redefine_overwrites_property(fund_graph):
    res = run_script(
        """
Define (s:Account)-[p:mark]->(o:Int) {
    GraphStructure { (s) }
    Rule { o = 1 }
}
Define (s:Account)-[p:mark2]->(o:Int) {
    GraphStructure { (s) }
    Rule { o = s.mark + 1 }
}
GraphStructure { (s:Account) }
Rule { }
Action { get(s.id, s.mark2) }
""",
        fund_graph,
    )
    assert {r["s_mark2"] for r in res.table.collect()} == {2}
    # re-running over the augmented graph re-Defines 'mark' w/o dup column
    res2 = run_script(
        "Define (s:Account)-[p:mark]->(o:Int) { GraphStructure { (s) } "
        "Rule { o = 7 } }\n"
        "GraphStructure { (s:Account) }\nRule { }\nAction { get(s.id, s.mark) }",
        res.graph,
    )
    assert {r["s_mark"] for r in res2.table.collect()} == {7}


def test_node_instance_with_src_prop_routes_to_vertices(fund_graph, spark, tmp_path):
    from linkgraph.tables import TableStore

    store = TableStore(spark, str(tmp_path / "srcstore"))
    run_script(
        """
GraphStructure { (a:Account)-[t:transfer]->(b:Account) }
Rule { R0: t.amount >= 100 }
Action {
    createNodeInstance(
        type=Hop,
        value={
            id = a.id
            src = a.id
        }
    )
}
""",
        fund_graph,
        store=store,
    )
    # routed by provenance (vertex), not by sniffing a 'src' column
    assert store.read("vertices_Hop").count() == 1


# ---------------------------------------------------------------------------
# arrow-DSL GraphStructure form (FinBench shape, KGDSL.g4:118)
# ---------------------------------------------------------------------------


def test_parse_arrow_form_golden():
    stmts = parse_script(
        """
GraphStructure {
    account [Account, __start__='true', region='cn']
    other [Account]
    medium [Medium]
    account -> other [transfer] repeat(1,3) as edge1
    other -> medium [signIn, signUp] as edge2
    other <-> medium [knows]
}
Rule { }
Action { get(other.id) }
"""
    )
    s = stmts[0]
    assert s.root == "account"
    assert s.query.nodes["account"].label == "Account"
    assert s.query.nodes["medium"].label == "Medium"
    # region='cn' became a pattern constraint on its alias; __start__ did NOT
    assert (
        "account",
        ("bin", "=", ("ref", "account", "region"), ("lit", "cn")),
    ) in s.node_constraints
    e1, e2, e3 = s.query.edges
    assert (e1.src, e1.dst, e1.alias, e1.rel, e1.lower, e1.upper) == (
        "account", "other", "edge1", "transfer", 1, 3
    )
    assert e2.rel == ("signIn", "signUp") and e2.alias == "edge2"
    assert e3.undirected and e3.rel == "knows"


def test_parse_path_methods_and_lambda():
    stmts = parse_script(
        """
GraphStructure {
    a [T, __start__='true']
    a -> b [r] repeat(1,2) as e1
}
Rule {
    R0: e1.edges().constraint((pre, cur) => pre.ts <= cur.ts && cur.ts >= $t0)
    n = repeat_edge_length(e1)
}
Action { get(b.id, n) }
"""
    )
    s = stmts[0]
    (f0,) = s.filters
    assert f0[0] == "func" and f0[1] == "repeat_constraint"
    assert f0[2][0] == ("ref", "e1", "path")
    lam = f0[2][1]
    assert lam[0] == "lambda" and lam[1] == ["pre", "cur"]
    # bare var-len alias in repeat_edge_length rewrote to the path column
    assert s.lets["n"] == ("func", "repeat_edge_length", [("ref", "e1", "path")])


def test_finbench_trc1_shape_executes(spark):
    """The trc1 query shape (FinBenchTest.java:84-105): seeded var-len
    transfer chain with a pairwise timestamp constraint, joined to a
    blocked signIn medium."""
    accounts = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "a3"), (4, "a4")], "vid bigint, id string"
    )
    mediums = spark.createDataFrame(
        [(101, "m1", True), (102, "m2", False)],
        "vid bigint, id string, isBlocked boolean",
    )
    transfers = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 20), (3, 4, 15), (1, 3, 5)],
        "src bigint, dst bigint, ts int",
    )
    signin = spark.createDataFrame(
        [(2, 101), (3, 101), (4, 102)], "src bigint, dst bigint"
    )
    g = PropertyGraph(
        {"Account": accounts, "Medium": mediums},
        {"transfer": transfers, "signIn": signin},
    )
    res = run_script(
        """
GraphStructure {
    account [Account, __start__='true']
    other [Account]
    medium [Medium]
    account -> other [transfer] repeat(1,3) as edge1
    other -> medium [signIn] as edge2
}
Rule {
    R1("seed"): account.id == $a
    R2("monotone"): edge1.edges().constraint((pre, cur) => pre.ts <= cur.ts)
    R3("blocked"): medium.isBlocked == true
    repeat_len = repeat_edge_length(edge1)
}
Action {
    get(other.id, repeat_len, medium.id)
}
""",
        g,
        params={"a": "a1"},
    )
    got = {
        (r["other_id"], r["repeat_len"], r["medium_id"])
        for r in res.table.collect()
    }
    # 1->2 [10], 1->3 [5], 1->2->3 [10,20], 1->3->4 [5,15] are monotone;
    # 1->2->3->4 [10,20,15] is not; medium must be blocked (m1)
    assert got == {("a2", 1, "m1"), ("a3", 1, "m1"), ("a3", 2, "m1")}


def test_lambda_binds_params_inside_body(spark):
    accounts = spark.createDataFrame([(1, "a1"), (2, "a2"), (3, "a3")],
                                     "vid bigint, id string")
    transfers = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 20)], "src bigint, dst bigint, ts int"
    )
    g = PropertyGraph({"Account": accounts}, {"transfer": transfers})
    script = """
GraphStructure {
    a [Account, __start__='true']
    a -> b [transfer] repeat(1,2) as e1
}
Rule {
    R0: a.id == 'a1'
    R1: e1.edges().constraint((pre, cur) => cur.ts <= $cap)
}
Action { get(b.id, repeat_edge_length(e1)) }
"""
    hi = run_script(script, g, params={"cap": 25})
    lo = run_script(script, g, params={"cap": 15})
    assert {r["b_id"] for r in hi.table.collect()} == {"a2", "a3"}
    assert {r["b_id"] for r in lo.table.collect()} == {"a2"}


def test_constraint_pushdown_forward_vs_reverse_walk(spark):
    """The pairwise constraint pushes into the expansion loop in BOTH
    walk directions: rooting the pattern at the source (forward walk)
    and at the destination (reverse walk, edges swapped then unswapped)
    must produce identical path sets."""
    acc = spark.createDataFrame([(i, f"a{i}") for i in range(1, 7)],
                                "vid bigint, id string")
    tr = spark.createDataFrame(
        [(1, 2, 10), (2, 3, 20), (3, 4, 15), (4, 5, 30), (2, 5, 8),
         (5, 6, 40), (1, 5, 50)],
        "src bigint, dst bigint, ts int",
    )
    g = PropertyGraph({"Account": acc}, {"transfer": tr})

    def script(root_line_a: str, root_line_b: str) -> str:
        return f"""
GraphStructure {{
    a {root_line_a}
    b {root_line_b}
    a -> b [transfer] repeat(1,3) as e1
}}
Rule {{
    R0: e1.edges().constraint((pre, cur) => pre.ts < cur.ts)
}}
Action {{ get(a.id, b.id, repeat_edge_length(e1)) }}
"""

    fwd = run_script(script("[Account, __start__='true']", "[Account]"), g)
    rev = run_script(script("[Account]", "[Account, __start__='true']"), g)
    fr = sorted((r[0], r[1], r[2]) for r in fwd.table.collect())
    rr = sorted((r[0], r[1], r[2]) for r in rev.table.collect())
    assert fr == rr and len(fr) > 0
    # spot-checks: monotone chains present, non-monotone pruned
    assert ("a1", "a3", 2) in fr       # 1-2-3: [10, 20]
    assert ("a3", "a6", 3) in fr       # 3-4-5-6: [15, 30, 40]
    assert ("a1", "a4", 3) not in fr   # 1-2-3-4: [10, 20, 15] not monotone


def test_get_as_view_and_embedded_sql(fund_graph):
    """get(... as alias).as(view(cols)).sql(>>> ... <<<) — the
    EMBEDDED_SQL_ACTION form (KGDSL.g4:479-484): the projection
    registers as a temp view and the embedded SQL is the result."""
    res = run_script(
        """
GraphStructure { (a:Account)-[t:transfer]->(b:Account) }
Rule { }
Action {
    get(a.id as src_id COMMENT 'payer', t.amount as amt)
    .as(flows(payer, amount))
    .sql(>>>
        select payer, sum(amount) as total
        from flows group by payer
    <<<)
}
""",
        fund_graph,
    )
    got = {(r["payer"], r["total"]) for r in res.table.collect()}
    assert got == {("acc1", 150.0), ("acc2", 80.0), ("acc3", 30.0)}


def test_get_item_alias_without_view(fund_graph):
    res = run_script(
        "GraphStructure { (a:Account)-[t:transfer]->(b:Account) }\n"
        "Rule { R0: t.amount >= 70 }\n"
        "Action { get(a.id as payer, b.id as payee) }",
        fund_graph,
    )
    got = {(r["payer"], r["payee"]) for r in res.table.collect()}
    assert got == {("acc1", "acc2"), ("acc2", "acc3")}


def test_named_path_declaration_and_existence_rule(fund_graph):
    """KGDSL 1.0 compat: `path1: (s)-[e]->(o)` names a path;
    `R1('d'): path1` asserts its existence (a no-op beyond the join)."""
    res = run_script(
        """
GraphStructure {
    path1: (a:Account)-[t:transfer]->(b:Account)
}
Rule {
    R1("must exist"): path1
    R2: t.amount >= 70
}
Action { get(a.id, b.id) }
""",
        fund_graph,
    )
    got = {(r["a_id"], r["b_id"]) for r in res.table.collect()}
    assert got == {("acc1", "acc2"), ("acc2", "acc3")}


def test_define_concept_object_is_string_property(fund_graph):
    """`Define ...->[o:RiskConcept/`x`]` (KGDSL.g4:47 comment form):
    a concept-typed object lowers to a STRING property (KTConcept ->
    StringType), not a derived edge."""
    res = run_script(
        """
Define (s:Account)-[p:riskLevel]->[o:RiskConcept/`tier`] {
    GraphStructure { (s) }
    Rule { o = rule_value(s.vid >= 3, 'high', 'low') }
}
GraphStructure { (s:Account) }
Rule { R0: s.riskLevel == 'high' }
Action { get(s.id, s.riskLevel) }
""",
        fund_graph,
    )
    got = {(r["s_id"], r["s_riskLevel"]) for r in res.table.collect()}
    assert got == {("acc3", "high"), ("acc4", "high")}
    assert "riskLevel" not in res.graph.edges  # property, not an edge


def test_group_topk_rule_youngstar_shape(spark):
    """KgReasonerTopKFilmTest doTest2: a Define whose Rule keeps only
    the per-group top-1 by sort (`group(s).asc(o.age).limit(1)`), then a
    query over the derived youngStar edge."""
    films = spark.createDataFrame([(1, "f1"), (2, "f2")], "vid bigint, id string")
    stars = spark.createDataFrame(
        [(10, "s10", 25), (11, "s11", 19), (12, "s12", 30), (13, "s13", 22)],
        "vid bigint, id string, age int",
    )
    cast = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 12), (2, 13)], "src bigint, dst bigint"
    )
    g = PropertyGraph({"Film": films, "FilmStar": stars}, {"starOfFilm": cast})
    res = run_script(
        """
Define (s:Film)-[p:youngStar]->(o:FilmStar) {
    GraphStructure {
        (s)-[e:starOfFilm]->(o)
    }
    Rule {
        R1("youngest only"): group(s).asc(o.age).limit(1)
    }
}
GraphStructure { (s:Film)-[y:youngStar]->(o:FilmStar) }
Rule { }
Action { get(s.id, o.id) }
""",
        g,
    )
    got = {(r["s_id"], r["o_id"]) for r in res.table.collect()}
    assert got == {("f1", "s11"), ("f2", "s13")}  # youngest per film


def test_group_keep_longest_path_rule(spark):
    """TransitiveOptionalTest shape: group(A).keep_longest_path(F1)
    keeps only each root's maximum-length var-len paths."""
    acc = spark.createDataFrame([(i, f"a{i}") for i in range(1, 6)],
                                "vid bigint, id string")
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 5)],
                              "src bigint, dst bigint")
    g = PropertyGraph({"A": acc}, {"r": e})
    res = run_script(
        """
GraphStructure {
    a [A, __start__='true']
    a -> b [r] repeat(1,3) as F1
}
Rule {
    R0: a.id == 'a1'
    R1("longest only"): group(a).keep_longest_path(F1)
}
Action { get(b.id, repeat_edge_length(F1)) }
""",
        g,
    )
    rows = {(r[0], r[1]) for r in res.table.collect()}
    assert rows == {("a4", 3)}  # 1-2-3-4 beats 1-2, 1-2-3, 1-5


def test_group_topk_sort_on_path_length(spark):
    """Sort expressions inside group() rules resolve bare var-len
    aliases to the path column (the fix-varlen pass covers
    group_filters)."""
    acc = spark.createDataFrame([(i, f"a{i}") for i in range(1, 5)],
                                "vid bigint, id string")
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint")
    g = PropertyGraph({"A": acc}, {"r": e})
    res = run_script(
        """
GraphStructure {
    a [A, __start__='true']
    a -> b [r] repeat(1,3) as F1
}
Rule {
    R0: a.id == 'a1'
    R1: group(a).desc(repeat_edge_length(F1)).limit(1)
}
Action { get(b.id, repeat_edge_length(F1)) }
""",
        g,
    )
    rows = {(r[0], r[1]) for r in res.table.collect()}
    assert rows == {("a4", 3)}


def test_define_edge_with_node_only_body(fund_graph):
    """The object alias may be bound by a standalone node declaration
    (cross-join product pattern) — sameName-style Defines."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # the intentional product warns
        res = run_script(
            """
Define (s:Account)-[p:peer]->(o:Account) {
    GraphStructure {
        (s), (o)
    }
    Rule { R1: s.vid < o.vid }
}
GraphStructure { (a:Account)-[e:peer]->(b:Account) }
Rule { }
Action { get(a.id, b.id) }
""",
            fund_graph,
        )
        assert res.table.count() == 6  # C(4,2) ordered pairs


def test_concept_instance_is_default_value(fund_graph):
    """`->[o:RiskConcept/`high`]` with no `o = ...` line: matching
    subjects get the instance string itself (belongTo semantics)."""
    res = run_script(
        """
Define (s:Account)-[p:risk]->[o:RiskConcept/`high`] {
    GraphStructure { (s) }
    Rule { R1: s.vid >= 3 }
}
GraphStructure { (s:Account) }
Rule { R0: s.risk == 'high' }
Action { get(s.id) }
""",
        fund_graph,
    )
    assert {r["s_id"] for r in res.table.collect()} == {"acc3", "acc4"}


def test_group_limit_without_order_raises(fund_graph):
    with pytest.raises(ValueError, match="asc\\(\\)/desc\\(\\)"):
        run_script(
            "GraphStructure { (a:Account)-[t:transfer]->(b:Account) }\n"
            "Rule { R1: group(a, b).limit(1) }\n"
            "Action { get(a.id) }",
            fund_graph,
        )


def test_compound_group_rule_rejected(fund_graph):
    with pytest.raises(SyntaxError, match="whole"):
        run_script(
            "GraphStructure { (a:Account)-[t:transfer]->(b:Account) }\n"
            "Rule { R1: group(a).asc(t.amount).limit(1) && t.amount > 5 }\n"
            "Action { get(a.id) }",
            fund_graph,
        )


def test_kgdsl_parser_fuzz_deterministic():
    """Seeded fuzz over both GraphStructure syntaxes + rule/action
    shapes: every generated script parses to the same AST twice, and
    random token deletions raise only SyntaxError (never an internal
    error)."""
    import random

    rng = random.Random(31)
    node_lines = [
        "    a [T, __start__='true']",
        "    b [T]",
        "    c [U, kind='x']",
    ]
    edge_lines = [
        "    a -> b [r] as e0",
        "    b -> c [r, s]",
        "    a -> c [r] repeat(1,3) as e1",
        "    b <-> c [s]",
    ]
    chain_lines = [
        "    (a:T)-[e2:r]->(b)",
        "    p9: (b)-[e3:s]-(c:U)",
    ]
    rules = [
        "    R0: a.x == 1 && b.y != null",
        "    R1(\"d\"): c.kind like 'x%'",
        "    w = a.x * 2",
        "    R2: e1.edges().constraint((pre, cur) => pre.ts <= cur.ts)",
        "    R3: group(a).asc(b.y).limit(2)",
    ]
    actions = [
        "    get(a.x, b.y as yy)",
        "    get(a.x).as(v0(ax))",
    ]
    for _ in range(80):
        gs = rng.sample(node_lines, rng.randrange(1, 3))
        gs += rng.sample(edge_lines if rng.random() < 0.6 else chain_lines,
                         rng.randrange(1, 3))
        rl = rng.sample(rules, rng.randrange(0, 3))
        ac = [rng.choice(actions)]
        script = (
            "GraphStructure {\n" + "\n".join(gs) + "\n}\n"
            "Rule {\n" + "\n".join(rl) + "\n}\n"
            "Action {\n" + "\n".join(ac) + "\n}\n"
        )
        try:
            s1 = parse_script(script)
            s2 = parse_script(script)
        except SyntaxError:
            continue  # sampled combo can be invalid (e.g. rule w/o alias)
        assert len(s1) == len(s2) == 1
        assert s1[0].query.nodes == s2[0].query.nodes
        assert s1[0].query.edges == s2[0].query.edges
        assert s1[0].filters == s2[0].filters
        assert s1[0].gets == s2[0].gets
        # mutation: delete one non-whitespace char; only SyntaxError ok
        pos = rng.randrange(len(script))
        mutated = script[:pos] + script[pos + 1 :]
        try:
            parse_script(mutated)
        except (SyntaxError, ValueError):
            pass  # rejected cleanly


def test_define_unnamed_comparison_rejected(fund_graph):
    # ADVICE r3: inside a Define, `a.amount == 100` used to classify as
    # a property assignment targeting a non-predicate alias and was
    # silently dropped — must be a parse error now
    with pytest.raises(SyntaxError, match="must be named"):
        run_script(
            """
Define (s:Account)-[p:flagged]->(o:Int) {
    GraphStructure { (s)-[t:transfer]->(b:Account) }
    Rule {
        t.amount == 100
        o = group(s).count(t.amount)
    }
}
GraphStructure { (s:Account) }
Rule { R0: s.flagged > 0 }
Action { get(s.id) }
""",
            fund_graph,
        )


def test_duplicate_producer_rejected(fund_graph):
    # two Defines producing the same property type must fail loudly,
    # not silently topo-order against the first
    script = """
Define (s:Account)-[p:deg]->(o:Int) {
    GraphStructure { (s)-[t:transfer]->(b:Account) }
    Rule { o = group(s).count(t.amount) }
}
Define (s:Account)-[p:deg]->(o:Int) {
    GraphStructure { (s)<-[t:transfer]-(b:Account) }
    Rule { o = group(s).count(t.amount) }
}
GraphStructure { (s:Account) }
Rule { R0: s.deg > 0 }
Action { get(s.id, s.deg) }
"""
    with pytest.raises(ValueError, match="two statements produce 'deg'"):
        run_script(script, fund_graph)


def test_action_ddl_collapse_deterministic(fund_graph):
    # a created node whose value= depends on another pattern alias used
    # to take an arbitrary matching row's value (dropDuplicates) — now
    # collapses with F.min like _run_define
    script = """
GraphStructure { (a:Account)-[t:transfer]->(b:Account) }
Rule { }
Action {
    ev = createNodeInstance(
        type=Flag,
        value={
            id = a.id
            first_peer = b.id
        }
    )
    get(a.id)
}
"""
    vals = set()
    for _ in range(3):
        res = run_script(script, fund_graph)
        nd = res.graph.vertices["Flag"]
        vals.add(
            tuple(sorted((r["id"], r["first_peer"]) for r in nd.collect()))
        )
    assert len(vals) == 1
    # acc1 transfers to acc2 and acc3 -> deterministic min is acc2
    got = dict(
        (r["id"], r["first_peer"])
        for r in run_script(script, fund_graph).graph.vertices["Flag"].collect()
    )
    assert got["acc1"] == "acc2"


def test_parse_arrow_multi_vertex_and_edge_props_golden():
    stmts = parse_script(
        """
GraphStructure {
    a, b [Account]
    a -> b [transfer, transDate=20240105] repeat(1,2) as e
}
Rule { }
Action { get(a.id, b.id) }
"""
    )
    s = stmts[0]
    assert s.query.nodes["a"].label == "Account"
    assert s.query.nodes["b"].label == "Account"
    (e,) = s.query.edges
    assert e.rel == "transfer" and (e.lower, e.upper) == (1, 2)
    assert e.props == (("transDate", 20240105),)


def test_arrow_edge_property_constraint_runs(fund_graph):
    # inline edge equality filters the edge table BEFORE the join
    res = run_script(
        """
GraphStructure {
    a [Account]
    a -> b [transfer, transDate=20240105] as t
}
Rule { }
Action { get(a.id, b.id) }
""",
        fund_graph,
    )
    got = {(r["a_id"], r["b_id"]) for r in res.table.collect()}
    assert got == {("acc1", "acc2")}


def test_arrow_edge_property_constraint_varlen_per_hop(fund_graph):
    # var-len expansion applies the inline constraint at EVERY hop:
    # amount>=?  only exact equality supported; use amount=70 edge 2->3
    # then no second hop with amount=70 exists -> only 1-hop paths
    res = run_script(
        """
GraphStructure {
    a [Account]
    a -> b [transfer, amount=70.0] repeat(1,2) as e
}
Rule { }
Action { get(a.id, b.id) }
""",
        fund_graph,
    )
    got = {(r["a_id"], r["b_id"]) for r in res.table.collect()}
    assert got == {("acc2", "acc3")}


def test_parse_multi_label_vertex_alternation(fund_graph, spark):
    # `s [A, B]` — label list lowers to the same union as (s:A|B)
    g = PropertyGraph(
        {
            "A": spark.createDataFrame([(1, "x")], "vid bigint, id string"),
            "B": spark.createDataFrame([(2, "y")], "vid bigint, id string"),
        },
        {"E": spark.createDataFrame([(1, 2)], "src bigint, dst bigint")},
    )
    res = run_script(
        "GraphStructure {\n s [A, B]\n}\nRule { }\nAction { get(s.id, s.label) }",
        g,
    )
    got = {(r["s_id"], r["s_label"]) for r in res.table.collect()}
    assert got == {("x", "A"), ("y", "B")}


def test_start_on_multi_vertex_line_rejected():
    with pytest.raises(SyntaxError, match="ONE traversal root"):
        parse_script(
            "GraphStructure {\n a, b [V, __start__='true']\n a -> b [E]\n}\n"
            "Rule { }\nAction { get(a.vid) }"
        )


def test_gql_chain_label_alternation(spark):
    g = PropertyGraph(
        {
            "A": spark.createDataFrame([(1, "x")], "vid bigint, id string"),
            "B": spark.createDataFrame([(2, "y")], "vid bigint, id string"),
        },
        {"E": spark.createDataFrame([(1, 2)], "src bigint, dst bigint")},
    )
    res = run_script(
        "GraphStructure { (s:A|B)-[e:E]->(o:A|B) }\nRule { }\n"
        "Action { get(s.id, o.id) }",
        g,
    )
    assert [(r["s_id"], r["o_id"]) for r in res.table.collect()] == [("x", "y")]


def test_path_list_ops(fund_graph):
    """ListOpExpr family (RuleExprParser.scala:516-650): get/head/tail
    on edges(), nodes() with get/str_join/accumulate, struct-field
    access on a computed element."""
    res = run_script(
        """
GraphStructure {
    a [Account, __start__='true']
    a -> b [transfer] repeat(2,2) as e1
}
Rule {
    R0: a.vid == 1
    f = e1.edges().get(0).dst
    l = e1.edges().tail().dst
    n2 = e1.nodes().get(1)
    s = e1.nodes().str_join('-')
    acc = e1.nodes().accumulate('+')
}
Action { get(a.vid, b.vid, f, l, n2, s, acc) }
""",
        fund_graph,
    )
    got = {
        (r["a_vid"], r["b_vid"], r["f"], r["l"], r["n2"], r["s"], r["acc"])
        for r in res.table.collect()
    }
    # 2-hop paths from vid 1: 1-2-3, 1-2-1, 1-3-4
    assert got == {
        (1, 3, 2, 3, 2, "1-2-3", 6.0),
        (1, 1, 2, 1, 2, "1-2-1", 4.0),
        (1, 4, 3, 4, 3, "1-3-4", 8.0),
    }


def test_path_slice_and_head(fund_graph):
    res = run_script(
        """
GraphStructure {
    a [Account, __start__='true']
    a -> b [transfer] repeat(2,2) as e1
}
Rule {
    R0: a.vid == 1
    h = e1.edges().head().src
    sl = e1.edges().slice(0,1).length()
}
Action { get(b.vid, h, sl) }
""",
        fund_graph,
    )
    got = {(r["b_vid"], r["h"], r["sl"]) for r in res.table.collect()}
    assert got == {(3, 1, 1), (1, 1, 1), (4, 1, 1)}


@pytest.fixture()
def optional_graph(spark):
    """TransitiveOptionalTest.java:147-161 shape: A with optional
    fan-out, D->F mandatory."""
    mk = lambda *ids: spark.createDataFrame(  # noqa: E731
        [(i, f"n{i}") for i in ids], "vid bigint, name string"
    )
    return PropertyGraph(
        {"a": mk(1, 2), "b": mk(10), "c": mk(20), "d": mk(30), "e": mk(40),
         "f": mk(50)},
        {
            "ab": spark.createDataFrame([(1, 10)], "src bigint, dst bigint"),
            "ac": spark.createDataFrame([(1, 20)], "src bigint, dst bigint"),
            "ce": spark.createDataFrame([(20, 40)], "src bigint, dst bigint"),
            "ad": spark.createDataFrame(
                [(1, 30), (2, 30)], "src bigint, dst bigint"
            ),
            "df": spark.createDataFrame([(30, 50)], "src bigint, dst bigint"),
        },
    )


def test_optional_edges_left_join(optional_graph):
    # A=2 has no ab/ac edges -> NULL B/C but still a row (the whole
    # point of __optional__); chained optional C->E follows C's NULLs
    res = run_script(
        """
GraphStructure {
  A [a, __start__='true']
  B [b]
  C [c]
  E [e]
  A -> B [ab, __optional__='true']
  A -> C [ac, __optional__='true']
  C -> E [ce, __optional__='true']
}
Rule { }
Action { get(A.name, B.name, C.name, E.name) }
""",
        optional_graph,
    )
    got = {tuple(r) for r in res.table.collect()}
    assert got == {
        ("n1", "n10", "n20", "n40"),
        ("n2", None, None, None),
    }


def test_optional_chain_form_and_exists_rule(optional_graph):
    # OPTIONAL named-path chain + exist()/exists() rule
    # (TransitiveOptionalTest.java:1161 shape)
    res = run_script(
        """
GraphStructure {
  A [a, __start__='true']
  OPTIONAL p1: (A)-[e1:ab]->(B:b)
}
Rule {
  R2: (exists(B) and B.name == 'n10') or (not exist(B))
}
Action { get(A.name, B.name) }
""",
        optional_graph,
    )
    got = {tuple(r) for r in res.table.collect()}
    assert got == {("n1", "n10"), ("n2", None)}


def test_optional_mandatory_mix(optional_graph):
    # mandatory A->D->F narrows to A=1,2; optional B rides along
    res = run_script(
        """
GraphStructure {
  A [a, __start__='true']
  B [b]
  D [d]
  F [f]
  A -> B [ab, __optional__='true']
  A -> D [ad]
  D -> F [df]
}
Rule { }
Action { get(A.name, B.name, F.name) }
""",
        optional_graph,
    )
    got = {tuple(r) for r in res.table.collect()}
    assert got == {("n1", "n10", "n50"), ("n2", None, "n50")}


def test_optional_node_declaration_constraint_stays_optional(optional_graph):
    # `D [d, name='n30']` on an optional-only alias filters the right
    # side of the left join — A rows without a match keep NULLs instead
    # of disappearing (r4 review fix)
    res = run_script(
        """
GraphStructure {
  A [a, __start__='true']
  D [d, name='nope']
  A -> D [ad, __optional__='true']
}
Rule { }
Action { get(A.name, D.name) }
""",
        optional_graph,
    )
    got = {tuple(r) for r in res.table.collect()}
    assert got == {("n1", None), ("n2", None)}


def test_optional_edge_alias_rule_is_post_join(optional_graph):
    # a Rule conjunct on the optional EDGE alias routes post-join
    # (3-valued; exist() guards the maybe-absent case) instead of
    # crashing in the mandatory traversal (r4 review fix)
    res = run_script(
        """
GraphStructure {
  A [a, __start__='true']
  B [b]
  A -> B [ab, __optional__='true'] as e1
}
Rule {
  R1: (not exist(e1)) or B.name == 'n10'
}
Action { get(A.name, B.name) }
""",
        optional_graph,
    )
    got = {tuple(r) for r in res.table.collect()}
    assert got == {("n1", "n10"), ("n2", None)}


def test_all_optional_without_root_clean_error(optional_graph):
    with pytest.raises(ValueError, match="__start__"):
        run_script(
            "GraphStructure {\n A -> B [ab, __optional__='true']\n}\n"
            "Rule { }\nAction { get(A.vid) }",
            optional_graph,
        )


def test_getfield_through_lets_and_negative_get(fund_graph):
    # let-bound path + struct access under getfield, and get(-1)
    res = run_script(
        """
GraphStructure {
    a [Account, __start__='true']
    a -> b [transfer] repeat(2,2) as e1
}
Rule {
    R0: a.vid == 1
    p = e1.edges()
    f = p.get(0).src
    l = p.get(0 - 1).dst
}
Action { get(b.vid, f, l) }
""",
        fund_graph,
    )
    got = {(r["b_vid"], r["f"], r["l"]) for r in res.table.collect()}
    assert got == {(3, 1, 3), (1, 1, 1), (4, 1, 4)}


def test_having_filter_on_agg_let(fund_graph):
    """A Rule conjunct referencing a group() let is a HAVING condition
    (riskmining.schema developed: `deviceNum = group(s,o).count(d);
    R1: deviceNum > 5`) — applied after the Define's groupBy, and it may
    mix per-group property refs (mainSupply divides by s.<prop>)."""
    res = run_script(
        """
Define (a:Account)-[p:bigSender]->(o:Account) {
    GraphStructure { (a)-[t:transfer]->(o) }
    Rule {
        total = group(a, o).sum(t.amount)
        R1: total > 60.0
    }
}

GraphStructure { (a:Account)-[e:bigSender]->(b:Account) }
Action { get(a.id, b.id) }
""",
        fund_graph,
    )
    got = {(r["a_id"], r["b_id"]) for r in res.table.collect()}
    # acc1->acc2 total 100, acc2->acc3 total 70; the rest are <= 60
    assert got == {("acc1", "acc2"), ("acc2", "acc3")}


def test_having_on_add_property(fund_graph):
    """HAVING on the AddProperty path: only subjects whose aggregate
    passes get the derived property at all."""
    res = run_script(
        """
Define (a:Account)-[p:fanout]->(o:Int) {
    GraphStructure { (a)-[t:transfer]->(b:Account) }
    Rule {
        n = group(a).count(b.vid)
        R1: n >= 2
        o = n
    }
}

GraphStructure { (a:Account) }
Rule { R0: a.fanout != null }
Action { get(a.id, a.fanout) }
""",
        fund_graph,
    )
    got = {(r["a_id"], r["a_fanout"]) for r in res.table.collect()}
    assert got == {("acc1", 2), ("acc2", 2)}
