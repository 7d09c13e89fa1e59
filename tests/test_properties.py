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


@settings(max_examples=8, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 500), st.integers(1, 40)),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    ),
    budget=st.sampled_from([8, 32, 128]),
)
def test_packing_accounting_matches_python_reference(spark, docs, budget):
    """The concat-and-chunk accounting (bins, straddles) must equal a
    straightforward Python packer for any (doc_id, n_tok) sequence —
    one shard, one lang, so the window arithmetic itself is on trial."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(docs, "doc_id long, n_tok long")
    w = Window.partitionBy(F.lit(1)).orderBy("doc_id")
    cum = df.withColumn("cum_end", F.sum("n_tok").over(w))
    start = F.col("cum_end") - F.col("n_tok")
    straddle = (
        F.floor(start / budget) != F.floor((F.col("cum_end") - 1) / budget)
    ).cast("int")
    got = cum.agg(
        F.sum("n_tok").alias("total"),
        F.sum(straddle).alias("n_straddle"),
        F.ceil(F.sum("n_tok") / budget).alias("n_bins"),
    ).first()

    total, straddles, offset = 0, 0, 0
    for _, n in sorted(docs):
        if offset // budget != (offset + n - 1) // budget:
            straddles += 1
        offset += n
        total += n
    assert got["total"] == total
    assert got["n_straddle"] == straddles
    assert got["n_bins"] == -(-total // budget)
