"""Adversarial-depth tests for the connected-components primitive behind
q42: plain min-label propagation needs diameter-many rounds (a 100-node
chain would blow the 20-round bound); the pointer-jumping variant collapses
chains geometrically.  A union-find oracle checks arbitrary graphs."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from supermusr_data_pipeline_spark.plans.text_dedup import min_label_components


def _run_cc(spark, pairs):
    df = spark.createDataFrame(pairs, "u bigint, v bigint")
    edges = df.union(df.select(F.col("v"), F.col("u")))
    return {r.node: r.label for r in min_label_components(edges).collect()}


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_100_node_chain_converges(spark):
    """Diameter 99 — the case that kills diameter-bound propagation."""
    pairs = [(i, i + 1) for i in range(99)]
    labels = _run_cc(spark, pairs)
    assert labels == {i: 0 for i in range(100)}


def test_two_chains_and_a_star(spark):
    pairs = (
        [(i, i + 1) for i in range(0, 30)]          # chain 0..30
        + [(i, i + 1) for i in range(100, 140)]      # chain 100..140
        + [(500, x) for x in range(501, 520)]        # star at 500
    )
    labels = _run_cc(spark, pairs)
    assert all(v == 0 for n, v in labels.items() if n <= 30)
    assert all(v == 100 for n, v in labels.items() if 100 <= n <= 140)
    assert all(v == 500 for n, v in labels.items() if n >= 500)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 39), st.integers(0, 39)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=60,
    )
)
def test_matches_union_find(spark, pairs):
    assert _run_cc(spark, pairs) == _union_find(pairs)
