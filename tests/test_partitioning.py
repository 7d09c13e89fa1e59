"""Skew/co-location utilities: salted join result parity, bucketed
join exchange elimination, repartition reuse.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pinterest_data_pipeline6_spark.functions.partitioning import (
    morton_code,
    zorder_by,
    repartition_for,
    salted_join,
    write_bucketed,
)
from pinterest_data_pipeline6_spark.plans.checks import executed_plan, final_plan
from pinterest_data_pipeline6_spark.sources.readers import table
from tests.conftest import df_to_sorted_rows

SF = "/root/testdata/sf0.01"


def test_salted_join_matches_plain_join(spark):
    orders = table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = table(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = orders.join(customer, "o_custkey", "inner")
    salted = salted_join(orders, customer, "o_custkey", n_salts=8)
    assert df_to_sorted_rows(salted) == df_to_sorted_rows(plain)


def test_salted_join_is_deterministic(spark):
    orders = table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    customer = table(spark, SF, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    a = salted_join(orders, customer, "o_custkey").count()
    b = salted_join(orders, customer, "o_custkey").count()
    assert a == b == orders.join(customer, "o_custkey").count()


def test_bucketed_join_has_no_exchange(spark):
    """With broadcast off (the 100 TB fact-fact case — neither side
    fits), identically-bucketed tables sort-merge join with ZERO
    exchanges: the bucket layout IS the shuffle, paid once at write."""
    orders = table(spark, SF, "orders")
    lineitem = table(spark, SF, "lineitem")
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.select("l_orderkey", "l_quantity"),
        "b_lineitem",
        "l_orderkey",
        8,
    )
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = executed_plan(joined)
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        expected = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


def test_repartition_reuse_single_exchange(spark):
    li = repartition_for(table(spark, SF, "lineitem"), ["l_orderkey"], 8)
    agg1 = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    # the groupBy reuses the explicit hash partitioning: exactly the one
    # user-requested exchange appears, none added for the aggregate
    # (final_plan text includes the Initial Plan section — strip it)
    plan = final_plan(agg1).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_morton_code_interleaves_bits(spark):
    """morton_code(x, y) must interleave exactly: (x=0b11, y=0b01) ->
    y1 x1 y0 x0 = 0b0111 = 7."""
    row = spark.range(1).select(
        morton_code(F.lit(3), F.lit(1)).alias("m"),
        morton_code(F.lit(0), F.lit(0)).alias("z"),
        morton_code(F.lit(65535), F.lit(65535)).alias("full"),
    ).first()
    assert row.m == 7
    assert row.z == 0
    assert row.full == (1 << 32) - 1


def test_zorder_is_shuffle_free_and_locally_sorted(spark):
    """zorder_by must not add an Exchange (layout is per-partition) and
    each partition must come out sorted by the Morton code."""
    li = table(spark, "/root/testdata/sf0.01", "lineitem").repartition(4)
    z = zorder_by(li, "l_partkey", "l_suppkey")
    plan = executed_plan(z)
    assert plan.count("Exchange") == executed_plan(li).count("Exchange")
    codes = z.select(morton_code(F.col("l_partkey"), F.col("l_suppkey")).alias("m"))
    def _sorted(it):
        vals = [r.m for r in it]
        return [all(a <= b for a, b in zip(vals, vals[1:]))]

    ok = codes.rdd.mapPartitions(_sorted).collect()
    assert all(ok)


def test_morton_properties(spark):
    """Property test: the Spark morton_code column, the portable
    morton_sql text, and a Python bit-interleave reference agree on
    random inputs; and the code preserves locality ordering on the
    diagonal (monotone along x=y)."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    from pinterest_data_pipeline6_spark.functions.partitioning import morton_sql

    def py_morton(x: int, y: int, bits: int = 16) -> int:
        out = 0
        for i in range(bits):
            out |= ((x >> i) & 1) << (2 * i)
            out |= ((y >> i) & 1) << (2 * i + 1)
        return out

    import duckdb

    con = duckdb.connect()

    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=65535),
                st.integers(min_value=0, max_value=65535),
            ),
            min_size=1,
            max_size=20,
        )
    )
    @settings(max_examples=20, deadline=None)
    def check(pairs):
        df = spark.createDataFrame(pairs, "x long, y long")
        got = [
            r.m
            for r in df.select(morton_code(F.col("x"), F.col("y")).alias("m"))
            .collect()
        ]
        expected = [py_morton(x, y) for x, y in pairs]
        assert got == expected
        expr = morton_sql("x", "y")
        duck = [
            r[0]
            for r in con.execute(
                f"SELECT {expr} FROM (SELECT unnest($1) AS t), LATERAL (SELECT t['x'] AS x, t['y'] AS y)",
                [[{"x": x, "y": y} for x, y in pairs]],
            ).fetchall()
        ]
        assert sorted(duck) == sorted(expected)  # unnest order is not input order

    check()
    # diagonal monotonicity: z(k,k) strictly increases with k
    prev = -1
    for k in range(0, 65536, 4096):
        cur = py_morton(k, k)
        assert cur > prev
        prev = cur


# ---------------------------------------------------------------------------
# connected components: alternating large-star/small-star
# ---------------------------------------------------------------------------


def test_cc_chain_converges_in_log_rounds(spark):
    """Adversarial high-diameter fixture: a 64-node chain needs 63
    rounds of plain min-label propagation but must converge in
    <= 2*log2(n)+2 alternating star rounds (Kiveris et al.)."""
    import math

    from pinterest_data_pipeline6_spark.operators.dedup import _connected_components

    n = 64
    edges = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "u long, v long")
    labels, rounds = _connected_components(edges)
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2
    out = labels.groupBy("label").count().collect()
    assert len(out) == 1
    assert out[0]["label"] == 0 and out[0]["count"] == n


def test_cc_matches_union_find(spark):
    """Mixed graph (chain + star + random multigraph with self-loops)
    against a driver-side union-find reference: every node must map to
    its component's minimum id."""
    import random

    from pinterest_data_pipeline6_spark.operators.dedup import _connected_components

    random.seed(7)
    edges = (
        [(i, i + 1) for i in range(10)]
        + [(100, 100 + i) for i in range(1, 8)]
        + [(200 + random.randrange(30), 200 + random.randrange(30)) for _ in range(40)]
    )
    labels, _ = _connected_components(spark.createDataFrame(edges, "u long, v long"))
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
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert set(got) == nodes
    assert all(got[x] == min(comp[find(x)]) for x in nodes)


def test_cc_star_fixpoint_stops_after_one_round(spark):
    """r11 convergence probe pin: the structural star predicate stops
    as soon as a round's OUTPUT is a union of stars, without the old
    signature-compare's full confirming no-op round. A triangle needs
    exactly one large/small-star round to collapse onto node 0; an
    already-starred input is likewise done after one round. (The old
    probe reported 2 rounds on the triangle — the second being the
    confirm round whose three shuffles the predicate eliminates.)"""
    from pinterest_data_pipeline6_spark.operators.dedup import _connected_components

    tri = spark.createDataFrame([(0, 1), (0, 2), (1, 2)], "u long, v long")
    labels, rounds = _connected_components(tri)
    assert rounds == 1
    assert sorted(tuple(r) for r in labels.collect()) == [
        (0, 0), (1, 0), (2, 0),
    ]

    star = spark.createDataFrame([(i, 0) for i in range(1, 8)], "u long, v long")
    labels2, rounds2 = _connected_components(star)
    assert rounds2 == 1
    got = {r["node"]: r["label"] for r in labels2.collect()}
    assert got == {i: 0 for i in range(8)}


def test_training_shard_export_roundtrip(spark, tmp_path):
    """write_training_shards: hive layout with one dir per hash shard,
    row-lossless, and the on-disk counts equal export_shard_histogram
    (the written layout IS the audited assignment)."""
    from pinterest_data_pipeline6_spark.operators.curation import (
        N_EXPORT_SHARDS,
        export_shard_histogram,
        write_training_shards,
    )
    from pinterest_data_pipeline6_spark.sources.readers import table

    sf = "/root/testdata/sf0.001"
    docs = table(spark, sf, "documents")
    out = str(tmp_path / "shards")
    n_dirs = write_training_shards(docs, out)
    assert n_dirs == N_EXPORT_SHARDS
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    hist = {r["shard"]: r["n_docs"] for r in export_shard_histogram(spark, sf).collect()}
    written = {r["shard"]: r["count"] for r in back.groupBy("shard").count().collect()}
    assert written == hist
    # partition pruning: a shard predicate must become a PartitionFilter
    # on the scan (directory pruning), not a post-scan row filter
    from pinterest_data_pipeline6_spark.plans import executed_plan

    plan = executed_plan(back.filter(back.shard == 3))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "shard" in pf[0]


def test_widen_small_scan_estimate(spark, tmp_path):
    """The maxSplitBytes-mirroring estimate (openCostInBytes +
    bytesPerCore): a many-small-files input that Spark already splits
    across the cluster must NOT be re-shuffled, while a single tiny
    file MUST be widened to defaultParallelism."""
    from pinterest_data_pipeline6_spark.sources.readers import widen_small_scan

    target = spark.sparkContext.defaultParallelism
    many = tmp_path / "many"
    spark.range(10_000).repartition(40).write.parquet(str(many))
    df_many = spark.read.parquet(str(many))
    # 40 files x 4MB open cost ≈ 160MB estimated input → >= target splits
    assert widen_small_scan(df_many) is df_many  # returned untouched

    one = tmp_path / "one"
    spark.range(100).coalesce(1).write.parquet(str(one))
    df_one = spark.read.parquet(str(one))
    widened = widen_small_scan(df_one)
    assert widened is not df_one
    assert widened.rdd.getNumPartitions() == target
