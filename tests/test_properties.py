"""Property-based tests (hypothesis) for the round-3 distributed
algorithms: randomized inputs against exact reference implementations.
Example counts are small because every example runs real Spark jobs.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000), st.floats(0, 1, width=32)),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_distributed_ntile_matches_window_ntile(spark, rows):
    """_distributed_ntile must equal the textbook global ntile(10) for
    any (doc_id, score) set — including N < 10, ties in score (broken
    by doc_id), and empty input."""
    from pyspark.sql.window import Window

    from pinterest_data_pipeline6_spark.operators.textops import _distributed_ntile

    df = spark.createDataFrame(
        [(i, float(s)) for i, s in rows], "doc_id long, score double"
    )
    got = {
        (r["doc_id"], r["decile"])
        for r in _distributed_ntile(df, n_buckets=10).collect()
    }
    w = Window.orderBy("score", "doc_id")
    want = {
        (r["doc_id"], r["decile"])
        for r in df.withColumn("decile", F.ntile(10).over(w)).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    """Star-contraction CC must label every node with its component's
    minimum id for arbitrary graphs (self-loops, duplicates, any
    orientation)."""
    from pinterest_data_pipeline6_spark.operators.dedup import _connected_components

    df = spark.createDataFrame(edges, "u long, v long")
    labels, _ = _connected_components(df)
    got = {r["node"]: r["label"] for r in labels.collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
            nodes.update((a, b))
    comp: dict[int, set[int]] = {}
    for x in nodes:
        comp.setdefault(find(x), set()).add(x)
    want = {x: min(comp[find(x)]) for x in nodes}
    assert got == want
