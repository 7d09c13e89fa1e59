"""Graph analytics over relational edge data: PageRank, triangle
counting, and common-neighbor link prediction.

Beyond-reference capability (the reference has no graph surface), but a
standard stage in corpus curation at 100 TB — domain-graph PageRank
ranks crawl sources for quality weighting, and near-dup clusters are
already a graph problem (see ``dedup.dedup_clusters`` for the
connected-components half of this family).

The test graph contracts lineitem's part–supplier incidence onto a
bounded node space (``% K``), which keeps the DuckDB oracle exact while
the OPERATOR code stays shape-identical to the open-web case:

- **PageRank**: rank and degree tables co-partitioned with the edge
  list on ``src``; each of the fixed ``PR_ITERS`` rounds is one join
  (edges ⨝ ranks, map-side combinable contribution sum) + one hash agg
  on ``dst``. Degrees are computed once and reused. At 1000 executors
  the edges partitioning is reused across rounds (same key), so each
  round pays one shuffle of (dst, contrib) partials — the classic
  Pregel cost — and the rank table never passes through the driver.
  Fixed iteration count keeps the whole loop ONE lazy Catalyst plan
  (no driver-side convergence probe) and makes the computation
  expressible as unrolled CTEs for the oracle.
- **triangles**: canonical a<b edge orientation, then the two-join
  wedge-close pattern E(a,b) ⨝ E(b,c) ⨝ E(a,c) — all equi-joins, never
  a cartesian. At web scale the standard refinement is degree-based
  orientation (orient each edge toward the higher-degree endpoint) so
  wedge fanout is bounded by sqrt(m); noted here, not needed on the
  contracted graph.
- **common neighbors**: the wedge join WITHOUT the closing edge —
  candidate pairs two hops apart, anti-joined against existing edges —
  the cheapest link-prediction scorer; top-k via TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pinterest_data_pipeline6_spark.sources.readers import table

PR_PARTS = 60  # contracted part-node space (ids 0..59)
PR_SUPPS = 25  # contracted supplier-node space (ids 100..124)
PR_ITERS = 3
PR_DAMP = 0.85

TRI_K = 40  # contracted single node space for triangle/link ops


def _bipartite_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct part→supplier incidence edges on the contracted space.
    Part ids live in [0, PR_PARTS), supplier ids in [100, 100+PR_SUPPS)
    — disjoint ranges, so the both-directions union below cannot create
    duplicate directed edges."""
    li = table(spark, sf, "lineitem")
    return (
        li.select(
            (F.col("l_partkey") % PR_PARTS).alias("src"),
            (F.lit(100) + F.col("l_suppkey") % PR_SUPPS).alias("dst"),
        )
        .distinct()
    )


def pagerank_undirected(directed_edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """Core PageRank over a DIRECTED (src, dst) edge list (callers pass
    both directions for undirected graphs): damping PR_DAMP, rank
    seeded 1.0, fixed ``iters`` rounds. Returns (node, deg, pr)
    unrounded/unsorted — presentation belongs to the caller.

    One lazy plan: degrees once, then per round one equi-join of the
    edge list with the current rank table and one hash agg on the
    destination — partial aggregation makes the contribution sum
    map-side combinable, so the shuffle carries per-(partition, dst)
    partials, not per-edge rows."""
    bi = directed_edges
    deg = bi.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("pr"))
    for _ in range(iters):
        contribs = (
            bi.join(ranks, bi.src == ranks.node)
            .join(deg.withColumnRenamed("src", "dnode"), F.col("dnode") == F.col("node"))
            .select(F.col("dst"), (F.col("pr") / F.col("deg")).alias("c"))
        )
        ranks = contribs.groupBy("dst").agg(
            (F.lit(1 - PR_DAMP) + F.lit(PR_DAMP) * F.sum("c")).alias("pr")
        ).select(F.col("dst").alias("node"), "pr")
    return ranks.join(deg, ranks.node == deg.src).select("node", "deg", "pr")


def pagerank_bipartite(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank (damping 0.85, PR_ITERS fixed rounds, rank seeded 1.0)
    on the undirected contracted part–supplier graph. Returns
    (node, degree, pr) ordered by node."""
    e = _bipartite_edges(spark, sf)
    bi = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return (
        pagerank_undirected(bi)
        .select("node", "deg", F.round("pr", 6).alias("pr"))
        .orderBy("node")
    )


def _contracted_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical (a < b) undirected simple edges on one contracted node
    space derived from lineitem's (part, supplier) incidences."""
    li = table(spark, sf, "lineitem")
    u = F.col("l_partkey") % TRI_K
    v = (F.col("l_suppkey") * 7) % TRI_K
    return (
        li.select(F.least(u, v).alias("a"), F.greatest(u, v).alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
    )


def triangles_per_node(e: DataFrame) -> DataFrame:
    """Core per-node triangle participation over canonical (a < b)
    undirected simple edges: (node, degree, n_triangles), every node
    listed (0 if triangle-free), unsorted.

    Wedge-close join chain on canonical a<b<c ordering — each triangle
    is produced exactly once, then credited to its three corners via a
    3-way union feeding one hash agg. All equi-joins (plan-tested
    registry-wide for no cartesians)."""
    ab = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    bc = e.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    wedge = ab.join(bc, F.col("y") == F.col("y2")).select("x", "y", "z")
    closing = e.select(F.col("a").alias("x2"), F.col("b").alias("z2"))
    tri = wedge.join(
        closing, (F.col("x") == F.col("x2")) & (F.col("z") == F.col("z2"))
    ).select("x", "y", "z")
    corners = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
    )
    tri_per_node = corners.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.join(tri_per_node, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint").alias("n_triangles"),
    )


def triangle_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node triangle participation on the contracted lineitem
    graph, ordered by node (see ``triangles_per_node`` for the plan)."""
    return triangles_per_node(_contracted_edges(spark, sf)).orderBy("node")


def common_neighbors_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Link prediction by common-neighbor count: the 10 highest-scoring
    NON-adjacent node pairs (ties broken by pair id), with the score =
    number of shared neighbors. The wedge join gives two-hop pairs; an
    anti-join removes pairs already connected; TakeOrderedAndProject
    delivers the global top-k without a full sort."""
    e = _contracted_edges(spark, sf)
    # neighbor list in both directions: wedges centered on v
    nbr = e.select(F.col("a").alias("v"), F.col("b").alias("u")).unionAll(
        e.select(F.col("b").alias("v"), F.col("a").alias("u"))
    )
    left = nbr.select("v", F.col("u").alias("p"))
    right = nbr.select(F.col("v").alias("v2"), F.col("u").alias("q"))
    wedges = (
        left.join(right, F.col("v") == F.col("v2"))
        .where(F.col("p") < F.col("q"))
        .select("p", "q")
    )
    pairs = wedges.groupBy("p", "q").agg(F.count(F.lit(1)).alias("n_common"))
    non_adjacent = pairs.join(
        e, (pairs.p == e.a) & (pairs.q == e.b), "left_anti"
    )
    return non_adjacent.orderBy(
        F.desc("n_common"), F.asc("p"), F.asc("q")
    ).limit(10)


_EDGES_SQL = f"""
        SELECT DISTINCT l_partkey % {PR_PARTS} AS src,
                        100 + l_suppkey % {PR_SUPPS} AS dst
        FROM lineitem
"""

_CONTRACTED_SQL = f"""
        SELECT DISTINCT least(l_partkey % {TRI_K}, (l_suppkey * 7) % {TRI_K}) AS a,
                        greatest(l_partkey % {TRI_K}, (l_suppkey * 7) % {TRI_K}) AS b
        FROM lineitem
        WHERE l_partkey % {TRI_K} <> (l_suppkey * 7) % {TRI_K}
"""


def _pr_round(prev: str, out: str) -> str:
    return f"""
        {out} AS (
            SELECT b.dst AS node,
                   {1 - PR_DAMP} + {PR_DAMP} * SUM(r.pr / d.deg) AS pr
            FROM bi b
            JOIN {prev} r ON b.src = r.node
            JOIN deg d ON b.src = d.node
            GROUP BY b.dst
        )"""


ORACLE: dict[str, str] = {
    "pagerank_bipartite": f"""
        WITH edges AS ({_EDGES_SQL}),
        bi AS (
            SELECT src, dst FROM edges
            UNION ALL
            SELECT dst AS src, src AS dst FROM edges
        ),
        deg AS (SELECT src AS node, COUNT(*) AS deg FROM bi GROUP BY src),
        r0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS pr FROM deg),
        {_pr_round('r0', 'r1')},
        {_pr_round('r1', 'r2')},
        {_pr_round('r2', 'r3')}
        SELECT d.node, d.deg, ROUND(r.pr, 6) AS pr
        FROM r3 r JOIN deg d ON r.node = d.node
        ORDER BY d.node
    """,
    "triangle_counts": f"""
        WITH e AS ({_CONTRACTED_SQL}),
        tri AS (
            SELECT ab.a AS x, ab.b AS y, bc.b AS z
            FROM e ab
            JOIN e bc ON ab.b = bc.a
            JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
        ),
        corners AS (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ),
        tpn AS (SELECT node, COUNT(*) AS n_triangles FROM corners GROUP BY node),
        deg AS (
            SELECT node, COUNT(*) AS degree
            FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
            GROUP BY node
        )
        SELECT d.node, d.degree, COALESCE(t.n_triangles, 0) AS n_triangles
        FROM deg d LEFT JOIN tpn t ON d.node = t.node
        ORDER BY d.node
    """,
    "common_neighbors_topk": f"""
        WITH e AS ({_CONTRACTED_SQL}),
        nbr AS (
            SELECT a AS v, b AS u FROM e
            UNION ALL
            SELECT b AS v, a AS u FROM e
        ),
        pairs AS (
            SELECT l.u AS p, r.u AS q, COUNT(*) AS n_common
            FROM nbr l JOIN nbr r ON l.v = r.v
            WHERE l.u < r.u
            GROUP BY l.u, r.u
        )
        SELECT p, q, n_common
        FROM pairs
        WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = pairs.p AND e.b = pairs.q)
        ORDER BY n_common DESC, p ASC, q ASC
        LIMIT 10
    """,
}

QUERIES = {
    "pagerank_bipartite": pagerank_bipartite,
    "triangle_counts": triangle_counts,
    "common_neighbors_topk": common_neighbors_topk,
}


LPA_ROUNDS = 2  # fixed synchronous rounds — keeps the loop ONE lazy plan
# and the oracle an unrolled CTE chain, same policy as PR_ITERS


def label_propagation_communities(spark: SparkSession, sf: str) -> DataFrame:
    """Community detection via synchronous label propagation (LPA) on
    the contracted undirected graph: labels seed as node ids; each
    round every node adopts its neighbors' PLURALITY label (ties break
    to the smallest label — the determinism knob async LPA lacks);
    after ``LPA_ROUNDS`` rounds, communities roll up to (label, size).
    Complements the family: PageRank ranks nodes, triangles measure
    closure, connected components (dedup_clusters) find reachability —
    LPA finds density clusters finer than components.

    100 TB shape: per round ONE equi-join of the both-directions edge
    list with the current label table (shuffle keyed on the node id)
    and two hash aggs (neighbor-label counts, then per-node plurality
    argmax via max(struct(cnt, -label)) — partial-agg friendly, no
    window over raw edges).  Fixed rounds keep the whole loop one lazy
    Catalyst plan, the same Pregel cost model as ``pagerank_bipartite``.
    """
    e = _contracted_edges(spark, sf)
    e2 = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    labels = (
        e2.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    for _ in range(LPA_ROUNDS):
        counts = (
            e2.join(labels, e2.v == labels.node)
            .groupBy(e2.u, "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            counts.groupBy("u")
            .agg(
                F.max(
                    F.struct(F.col("cnt"), (-F.col("lbl")).alias("neg"))
                ).alias("m")
            )
            .select(F.col("u").alias("node"), (-F.col("m.neg")).alias("lbl"))
        )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
        .orderBy("community")
    )


QUERIES["label_propagation_communities"] = label_propagation_communities


def _lpa_round(prev: str, cnt: str, out: str) -> str:
    return f"""
    {cnt} AS (
        SELECT e2.u AS node, {prev}.lbl, COUNT(*) AS cnt
        FROM e2 JOIN {prev} ON e2.v = {prev}.node
        GROUP BY 1, 2
    ),
    {out} AS (
        SELECT node, lbl FROM (
            SELECT node, lbl,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY cnt DESC, lbl ASC) AS rn
            FROM {cnt}
        ) WHERE rn = 1
    )"""


ORACLE["label_propagation_communities"] = f"""
    WITH e AS (
        SELECT DISTINCT
               LEAST(l_partkey % {TRI_K}, (l_suppkey * 7) % {TRI_K}) AS a,
               GREATEST(l_partkey % {TRI_K}, (l_suppkey * 7) % {TRI_K}) AS b
        FROM lineitem
        WHERE l_partkey % {TRI_K} <> (l_suppkey * 7) % {TRI_K}
    ),
    e2 AS (
        SELECT a AS u, b AS v FROM e
        UNION ALL
        SELECT b AS u, a AS v FROM e
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM e2),
    {_lpa_round("l0", "c1", "l1")},
    {_lpa_round("l1", "c2", "l2")}
    SELECT lbl AS community, COUNT(*) AS n_nodes,
           MIN(node) AS min_node, MAX(node) AS max_node
    FROM l2 GROUP BY lbl ORDER BY community
"""


# ---------------------------------------------------------------------------
# Round 8: k-core peeling — the density-based pruning that complements
# the family (PageRank ranks, triangles close, LPA clusters, CC
# reaches): iteratively remove nodes of degree < K until the K-core
# remains. Used in dedup/graph curation to separate template farms
# (dense cores of near-identical docs) from organic content.

KCORE_K = 3       # the core threshold
KCORE_ROUNDS = 3  # fixed peel rounds (unrolled, one lazy plan)


def kcore_peeling_rounds(spark: SparkSession, sf: str) -> DataFrame:
    """K-core peeling ledger over the contracted undirected graph:
    after each of KCORE_ROUNDS synchronous peels (drop every node whose
    CURRENT degree < KCORE_K, keep edges with both endpoints alive),
    report surviving nodes/edges and the round's peel count. Round 0 is
    the unpeeled graph. A fixed round count reports the peeling
    TRAJECTORY — the fixpoint property (round K+1 = round K) is what
    the oracle checks at small scale, and at 100 TB the same unrolled
    plan runs with ``localCheckpoint`` lineage cuts per round like
    dedup_clusters' CC loop.

    Per round: one degree agg keyed on the node + two semi-joins of the
    canonical edge list — the shuffle carries (node, degree) pairs and
    edges, never anything wider."""
    e = _contracted_edges(spark, sf).localCheckpoint(eager=True)
    # the contracted graph is bounded (TRI_K nodes, <= TRI_K^2/2
    # canonical edges), so ONE checkpoint materializes the whole graph
    # and every peel round below is constant-size work on it
    nodes0 = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .distinct()
    )
    node_sets = [nodes0]
    edge_sets = [e]
    cur = e
    for _ in range(KCORE_ROUNDS):
        both = cur.select(F.col("a").alias("u")).unionAll(
            cur.select(F.col("b").alias("u"))
        )
        deg = both.groupBy("u").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= KCORE_K).select(
            F.col("u").alias("n")
        )
        # each round reads `cur` three times (degree agg + two semi
        # joins) — checkpoint the (bounded) survivor edge set so the
        # plan tree stays linear in rounds, the BT-MM lineage cut
        cur = (
            cur.join(keep.select(F.col("n").alias("a")), "a", "left_semi")
            .join(keep.select(F.col("n").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        node_sets.append(keep)
        edge_sets.append(cur)
    # ONE aggregate per ledger column over round-tagged unions (instead
    # of 3 crossJoined scalar aggs per round): all sources are
    # checkpointed tiny tables, so the whole ledger is a single job
    tag = lambda dfs, col: [
        df.select(F.lit(r).alias("round"), F.col(col))
        for r, df in enumerate(dfs)
    ]
    nodes_tagged = tag(node_sets, "n")[0]
    for d in tag(node_sets, "n")[1:]:
        nodes_tagged = nodes_tagged.unionByName(d)
    edges_tagged = tag(edge_sets, "a")[0]
    for d in tag(edge_sets, "a")[1:]:
        edges_tagged = edges_tagged.unionByName(d)
    n_counts = nodes_tagged.groupBy("round").agg(
        F.count("*").alias("n_nodes")
    )
    e_counts = edges_tagged.groupBy("round").agg(
        F.count("*").alias("n_edges")
    )
    # literal rounds spine: a round whose survivor set is EMPTY has no
    # group above, but the ledger (like the oracle) must still list it
    # with zeros — e.g. a graph fully peeled in round 1
    spine = spark.range(KCORE_ROUNDS + 1).select(
        F.col("id").cast("int").alias("round")
    )
    w = Window.orderBy("round")
    return (
        spine.join(n_counts, "round", "left")
        .join(e_counts, "round", "left")
        .select(
            "round",
            F.coalesce("n_nodes", F.lit(0)).alias("n_nodes"),
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            F.coalesce(
                F.lag(F.coalesce("n_nodes", F.lit(0))).over(w)
                - F.coalesce("n_nodes", F.lit(0)),
                F.lit(0),
            ).cast("bigint").alias("n_peeled"),
        )
        .orderBy("round")
    )


def _kcore_oracle_sql() -> str:
    ctes = [
        f"""e0 AS (
        SELECT DISTINCT
               LEAST(l_partkey % {TRI_K}, (l_suppkey * 7) % {TRI_K}) AS a,
               GREATEST(l_partkey % {TRI_K}, (l_suppkey * 7) % {TRI_K}) AS b
        FROM lineitem
        WHERE l_partkey % {TRI_K} != (l_suppkey * 7) % {TRI_K}
    )""",
        """n0 AS (
        SELECT DISTINCT u FROM (
            SELECT a AS u FROM e0 UNION ALL SELECT b FROM e0
        )
    )""",
    ]
    selects = [
        "SELECT 0 AS round, (SELECT COUNT(*) FROM n0) AS n_nodes, "
        "(SELECT COUNT(*) FROM e0) AS n_edges, CAST(0 AS BIGINT) AS n_peeled"
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        ctes.append(f"""k{r} AS (
        SELECT u FROM (
            SELECT u, COUNT(*) AS d FROM (
                SELECT a AS u FROM e{r - 1}
                UNION ALL SELECT b FROM e{r - 1}
            ) GROUP BY u
        ) WHERE d >= {KCORE_K}
    )""")
        ctes.append(f"""e{r} AS (
        SELECT a, b FROM e{r - 1}
        WHERE a IN (SELECT u FROM k{r}) AND b IN (SELECT u FROM k{r})
    )""")
        prev = "n0" if r == 1 else f"k{r - 1}"
        selects.append(
            f"SELECT {r} AS round, (SELECT COUNT(*) FROM k{r}) AS n_nodes, "
            f"(SELECT COUNT(*) FROM e{r}) AS n_edges, "
            f"CAST((SELECT COUNT(*) FROM {prev}) "
            f"- (SELECT COUNT(*) FROM k{r}) AS BIGINT) AS n_peeled"
        )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        + "\nUNION ALL\n".join(selects) + "\nORDER BY round"
    )


ORACLE["kcore_peeling_rounds"] = _kcore_oracle_sql()
QUERIES["kcore_peeling_rounds"] = kcore_peeling_rounds
