"""Property-based tests (hypothesis): random small graphs must match the
pure-Python oracles — strengthens the reference's golden-assert-only
strategy (SURVEY.md §5: property testing absent there)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkgraph.algos import connected_components, pagerank
from tests.oracles import components_oracle, pagerank_oracle

edge_sets = st.sets(
    st.tuples(st.integers(0, 14), st.integers(0, 14)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_sets)
def test_cc_matches_union_find(spark, edges):
    vertices = {v for e in edges for v in e}
    df = spark.createDataFrame(sorted(edges), "src bigint, dst bigint")
    got = {
        r["vid"]: r["component"]
        for r in connected_components(df, max_iter=40).state.collect()
    }
    assert got == components_oracle(edges, vertices)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_sets)
def test_pagerank_matches_power_iteration(spark, edges):
    vertices = {v for e in edges for v in e}
    df = spark.createDataFrame(sorted(edges), "src bigint, dst bigint")
    expected, _ = pagerank_oracle(edges, vertices, tol=1e-7, max_iter=60)
    got = {
        r["vid"]: r["score"]
        for r in pagerank(df, tol=1e-7, max_iter=60).state.collect()
    }
    assert set(got) == vertices
    for v in vertices:
        assert math.isclose(got[v], expected[v], abs_tol=1e-6)
