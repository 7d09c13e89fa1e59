"""Property-based tests (hypothesis) for the round-3 distributed
algorithms: randomized inputs against exact reference implementations.
Example counts are small because every example runs real Spark jobs.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import example, given, settings, strategies as st  # noqa: E402

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
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.sampled_from(["a", "b", "c"]),
            st.floats(0, 1, width=32),
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    n_buckets=st.sampled_from([3, 4, 10]),
)
def test_grouped_distributed_ntile_matches_per_group_window(spark, rows, n_buckets):
    """The grouped variant must equal ntile(n) OVER (PARTITION BY grp
    ORDER BY score, doc_id) for any group mix — including groups
    smaller than n, score ties, absent groups, and empty input."""
    from pyspark.sql.window import Window

    from pinterest_data_pipeline6_spark.operators.textops import _distributed_ntile

    df = spark.createDataFrame(
        [(i, g, float(s)) for i, g, s in rows],
        "doc_id long, grp string, score double",
    )
    got = {
        (r["doc_id"], r["grp"], r["decile"])
        for r in _distributed_ntile(df, n_buckets, group_cols=["grp"]).collect()
    }
    w = Window.partitionBy("grp").orderBy("score", "doc_id")
    want = {
        (r["doc_id"], r["grp"], r["decile"])
        for r in df.withColumn("decile", F.ntile(n_buckets).over(w)).collect()
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


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=0,
        max_size=40,
    )
)
def test_triangles_match_bruteforce(spark, edges):
    """triangles_per_node must equal the O(n^3) reference count for any
    small graph (self-loops dropped, duplicate edges collapsed)."""
    from pinterest_data_pipeline6_spark.operators.graph import triangles_per_node

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not canon:
        return
    df = spark.createDataFrame(sorted(canon), "a long, b long")
    got = {
        (r["node"], r["degree"], r["n_triangles"])
        for r in triangles_per_node(df).collect()
    }

    nodes = sorted({n for e in canon for n in e})
    adj = {n: set() for n in nodes}
    for a, b in canon:
        adj[a].add(b)
        adj[b].add(a)
    want = set()
    for n in nodes:
        tri = 0
        for u in adj[n]:
            for v in adj[n]:
                if u < v and v in adj[u]:
                    tri += 1
        want.add((n, len(adj[n]), tri))
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 10), st.integers(0, 10)),
        min_size=1,
        max_size=30,
    )
)
def test_pagerank_matches_python_reference(spark, edges):
    """pagerank_undirected must match a literal Python transcription of
    the same fixed-round recurrence to float tolerance."""
    from pinterest_data_pipeline6_spark.operators.graph import (
        PR_DAMP,
        PR_ITERS,
        pagerank_undirected,
    )

    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    if not canon:
        return
    directed = sorted(canon | {(b, a) for a, b in canon})
    df = spark.createDataFrame(directed, "src long, dst long")
    got = {r["node"]: (r["deg"], r["pr"]) for r in pagerank_undirected(df).collect()}

    deg: dict[int, int] = {}
    for s, _ in directed:
        deg[s] = deg.get(s, 0) + 1
    pr = {n: 1.0 for n in deg}
    for _ in range(PR_ITERS):
        nxt = {n: 0.0 for n in deg}
        for s, d in directed:
            nxt[d] += pr[s] / deg[s]
        pr = {n: (1 - PR_DAMP) + PR_DAMP * c for n, c in nxt.items()}
    assert set(got) == set(deg)
    for n in deg:
        assert got[n][0] == deg[n]
        assert abs(got[n][1] - pr[n]) < 1e-9, (n, got[n], pr[n])


@settings(max_examples=8, deadline=None)
@given(
    keys=st.lists(st.integers(0, 2**40), min_size=1, max_size=50, unique=True),
    probes=st.lists(st.integers(0, 2**40), min_size=1, max_size=50, unique=True),
)
def test_bloom_construction_has_no_false_negatives(spark, keys, probes):
    """For ANY build key set (including keys near 2^40 — the overflow
    envelope the portable hash family is designed for), every build key
    must pass its own Bloom filter, and the Spark-side hash expression
    must agree with the pure-Python reference of the same formula."""
    from pinterest_data_pipeline6_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_K,
        BLOOM_WORD_BITS,
        HASH_A,
        HASH_B,
        HASH_P,
        _hash_expr,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    hashes = F.array(*[F.expr(_hash_expr("k", i, BLOOM_BITS)) for i in range(BLOOM_K)])
    pos = df.select("k", F.explode(hashes).alias("pos"))
    got = {(r["k"], r["pos"]) for r in pos.collect()}
    want = {
        (k, ((k % HASH_P) * HASH_A[i] + HASH_B[i]) % HASH_P % BLOOM_BITS)
        for k in keys
        for i in range(BLOOM_K)
    }
    assert got == want  # Spark expr == Python reference, no overflow

    # build the word bitset in Python from the agreed positions and
    # check zero false negatives for the build set itself
    words: dict[int, int] = {}
    for _, p in want:
        words[p // BLOOM_WORD_BITS] = words.get(p // BLOOM_WORD_BITS, 0) | (
            1 << (p % BLOOM_WORD_BITS)
        )
    for k in keys:
        for i in range(BLOOM_K):
            p = ((k % HASH_P) * HASH_A[i] + HASH_B[i]) % HASH_P % BLOOM_BITS
            assert (words[p // BLOOM_WORD_BITS] >> (p % BLOOM_WORD_BITS)) & 1


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(st.integers(0, 1_000), min_size=1, max_size=120),
)
def test_cms_estimate_is_upper_bound_of_exact(spark, rows):
    """min-over-rows of the CMS counters must never undercount: for any
    key stream, estimate >= exact frequency for every key (the defining
    count-min guarantee; equality unless another key collides in all
    four rows)."""
    from pinterest_data_pipeline6_spark.operators.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        _hash_expr,
    )

    df = spark.createDataFrame([(k,) for k in rows], "k long")
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.expr(_hash_expr("k", i, CMS_WIDTH)).cast("long").alias("col"),
            )
            for i in range(CMS_DEPTH)
        ]
    )
    sketch = (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
        .agg(F.count("*").alias("cnt"))
    )
    probes = df.distinct().select("k", F.explode(cells).alias("c")).select(
        "k", F.col("c.row").alias("row"), F.col("c.col").alias("col")
    )
    est = {
        r["k"]: r["est"]
        for r in probes.join(sketch, ["row", "col"])
        .groupBy("k")
        .agg(F.min("cnt").alias("est"))
        .collect()
    }
    from collections import Counter

    exact = Counter(rows)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)


# ---------------------------------------------------------------- round 5


TOKENS = [f"t{i}" for i in range(20)]


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 500),
            st.sampled_from(["en", "es"]),
            st.lists(st.sampled_from(TOKENS), min_size=0, max_size=40),
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda t: t[0],
    )
)
def test_prefix_filter_jaccard_matches_brute_force(spark, docs, tmp_path_factory):
    """jaccard_prefix_filter_pairs is an EXACT algorithm: for any
    corpus the prefix+size+positional filters must lose no qualifying
    pair and the verify step must admit no extra one. Randomized check
    against a pure-Python brute force over all within-lang pairs
    (duplicated tokens, empty texts, singleton langs included)."""
    from pinterest_data_pipeline6_spark.operators.dedup import (
        JACCARD_TAU_DEN,
        JACCARD_TAU_NUM,
        jaccard_prefix_filter_pairs,
    )

    out = tmp_path_factory.mktemp("jpf_prop")
    rows = [(i, lg, " ".join(toks), len(" ".join(toks))) for i, lg, toks in docs]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string, n_chars int"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = {
        (r["lang"], r["doc_a"], r["doc_b"])
        for r in jaccard_prefix_filter_pairs(spark, str(out)).collect()
    }
    want = set()
    sets = {i: (lg, set(text.split(" "))) for i, lg, text, _ in rows}
    for a in sets:
        for b in sets:
            if a >= b or sets[a][0] != sets[b][0]:
                continue
            sa, sb = sets[a][1], sets[b][1]
            i = len(sa & sb)
            na, nb = len(sa), len(sb)
            if (JACCARD_TAU_NUM + JACCARD_TAU_DEN) * i >= JACCARD_TAU_NUM * (
                na + nb
            ):
                want.add((sets[a][0], a, b))
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 20),  # day offset
            st.integers(0, 8),  # user
        ),
        min_size=0,
        max_size=60,
    )
)
def test_trailing_distinct_users_matches_brute_force(
    spark, events, tmp_path_factory
):
    """The reduce-then-explode trailing-7-day rollup must equal the
    textbook per-day set union for any event set — including day gaps
    larger than the window, repeated (user, day) events, and empty
    input."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.events import (
        trailing_distinct_users,
    )

    base = datetime.datetime(2024, 3, 1, 12, 0, 0)
    out = tmp_path_factory.mktemp("tdu_prop")
    rows = [
        (base + datetime.timedelta(days=d), u) for d, u in events
    ]
    spark.createDataFrame(rows, "ts timestamp, user_id long").write.mode(
        "overwrite"
    ).parquet(str(out / "events.parquet"))

    got = {
        (str(r["day"]), r["n_users"], r["n_events"])
        for r in trailing_distinct_users(spark, str(out)).collect()
    }
    days = sorted({d for d, _ in events})
    want = set()
    for d in days:
        users = {u for dd, u in events if d - 6 <= dd <= d}
        n_ev = sum(1 for dd, _ in events if d - 6 <= dd <= d)
        day = (base + datetime.timedelta(days=d)).date()
        want.add((str(day), len(users), n_ev))
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),  # user
            st.integers(0, 10_000),  # seconds offset
            st.sampled_from(["click", "purchase", "view"]),
            st.integers(0, 400),  # value in quarter units
        ),
        min_size=0,
        max_size=40,
    )
)
def test_asof_tolerance_matches_brute_force(spark, events, tmp_path_factory):
    """asof_tolerance_join must match the literal spec — most recent
    purchase with ts <= click.ts (ties: the dedup-max value), fresh iff
    <= 1 h stale — for any interleaving of clicks and purchases,
    including equal timestamps across users and value ties."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.events import (
        ASOF_TOLERANCE_S,
        asof_tolerance_join,
    )

    base = datetime.datetime(2024, 3, 1, 0, 0, 0)
    out = tmp_path_factory.mktemp("asof_prop")
    rows = [
        (i, base + datetime.timedelta(seconds=s), u, et, v / 4.0)
        for i, (u, s, et, v) in enumerate(events)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    res = {
        r["day"]: (r["n_clicks"], r["n_matched"], r["n_fresh"], r["sum_fresh_value"])
        for r in asof_tolerance_join(spark, str(out)).collect()
    }

    purchases: dict[tuple[int, datetime.datetime], float] = {}
    for _, ts, u, et, v in rows:
        if et == "purchase":
            key = (u, ts)
            purchases[key] = max(purchases.get(key, float("-inf")), v)
    clicks = [(ts, u) for _, ts, u, et, _ in rows if et == "click"]
    agg: dict[str, list] = {}
    for ts, u in clicks:
        cand = [(pts, v) for (pu, pts), v in purchases.items() if pu == u and pts <= ts]
        day = str(ts.date())
        rec = agg.setdefault(day, [0, 0, 0, 0.0])
        rec[0] += 1
        if cand:
            pts, v = max(cand)
            rec[1] += 1
            if (ts - pts).total_seconds() <= ASOF_TOLERANCE_S:
                rec[2] += 1
                rec[3] += v
    assert set(res) == set(agg)
    for day, (nc, nm, nf, sv) in agg.items():
        gc, gm, gf, gs = res[day]
        assert (gc, gm, gf) == (nc, nm, nf), (day, res[day], agg[day])
        assert gs is None and nf == 0 or abs((gs or 0.0) - sv) < 1e-6, (
            day, gs, sv,
        )


@settings(max_examples=6, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(0, 5),  # user
            st.sampled_from(["click", "error", "purchase", "view"]),
        ),
        min_size=0,
        max_size=50,
    )
)
def test_cooccurrence_lift_matches_brute_force(spark, pairs, tmp_path_factory):
    """event_cooccurrence_lift must equal the literal market-basket
    definition — n_both over distinct user sets, lift = n_both * U /
    (n_a * n_b) — for any event multiset, including repeated events,
    users with one type, and empty input."""
    import datetime
    import itertools

    from pinterest_data_pipeline6_spark.operators.events import (
        event_cooccurrence_lift,
    )

    out = tmp_path_factory.mktemp("lift_prop")
    base = datetime.datetime(2024, 3, 1)
    rows = [(base, u, t) for u, t in pairs]
    spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string"
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        (r["type_a"], r["type_b"], r["n_both"], r["lift"])
        for r in event_cooccurrence_lift(spark, str(out)).collect()
    }

    by_type: dict[str, set[int]] = {}
    for u, t in pairs:
        by_type.setdefault(t, set()).add(u)
    n_users = len({u for u, _ in pairs})
    want = set()
    for a, b in itertools.combinations(sorted(by_type), 2):
        both = len(by_type[a] & by_type[b])
        if both:
            lift = round(both * n_users / (len(by_type[a]) * len(by_type[b])), 6)
            want.add((a, b, both, lift))
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    days=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 20)),  # (user, day)
        min_size=0,
        max_size=60,
    )
)
def test_power_curve_matches_brute_force(spark, days, tmp_path_factory):
    """user_power_curve must equal the literal histogram + descending
    cumulative tail for any (user, day) multiset — repeated same-day
    events collapse, the tail counts users with AT LEAST d days."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.events import user_power_curve

    out = tmp_path_factory.mktemp("pc_prop")
    base = datetime.datetime(2024, 3, 1, 8, 0, 0)
    rows = [
        (base + datetime.timedelta(days=d, minutes=u), u) for u, d in days
    ]
    spark.createDataFrame(rows, "ts timestamp, user_id long").write.mode(
        "overwrite"
    ).parquet(str(out / "events.parquet"))

    got = {
        (r["days_active"], r["n_users"], r["n_users_at_least"])
        for r in user_power_curve(spark, str(out)).collect()
    }

    per_user: dict[int, set[int]] = {}
    for u, d in days:
        per_user.setdefault(u, set()).add(d)
    hist: dict[int, int] = {}
    for u, ds in per_user.items():
        hist[len(ds)] = hist.get(len(ds), 0) + 1
    want = set()
    for d_act, n in hist.items():
        at_least = sum(v for k, v in hist.items() if k >= d_act)
        want.add((d_act, n, at_least))
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    prices=st.lists(
        st.integers(1, 10_000),  # cents, cast to 2-dp prices
        min_size=1,
        max_size=80,
    )
)
def test_exact_quantiles_match_sorted_pick(spark, prices, tmp_path_factory):
    """exact_price_quantiles must return exactly the element at rank
    ceil(q*n) of the (price, id)-sorted sequence for any multiset —
    including heavy ties (the id tie-break decides) and n smaller than
    the quantile count (ranks collide; every quantile still reports)."""
    import math

    from pinterest_data_pipeline6_spark.operators.relational import (
        EXACT_QUANTILES,
        exact_price_quantiles,
    )

    out = tmp_path_factory.mktemp("eq_prop")
    rows = [(i, 1, float(c) / 100) for i, c in enumerate(prices)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber long, l_extendedprice double"
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

    got = {
        (r["quantile"], r["value"], r["rank"], r["n_rows"])
        for r in exact_price_quantiles(spark, str(out)).collect()
    }

    ordered = sorted(
        (round(c / 100, 2), i * 10 + 1) for i, c in enumerate(prices)
    )
    n = len(ordered)
    want = set()
    for q in EXACT_QUANTILES:
        rank = math.ceil(q * n)
        want.add((q, ordered[rank - 1][0], rank, n))
    assert got == want


# --- round-5 wave-5 data-selection family ------------------------------------


def _write_docs(spark, tmp_path_factory, tag, rows):
    """rows: (doc_id, lang, source, text). Writes a minimal documents
    table (n_chars derived) and returns the sf dir."""
    out = tmp_path_factory.mktemp(tag)
    spark.createDataFrame(
        [(i, lg, src, text, len(text)) for i, lg, src, text in rows],
        "doc_id long, lang string, source string, text string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out)


def _h64_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.sampled_from(["en", "fr"]),
            st.sampled_from(["sA", "sB", "sC"]),
            st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=14),
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_winnowing_matches_python_reference(spark, docs, tmp_path_factory):
    """winnowing_fingerprints' per-source rollup must equal a
    pure-Python winnowing (same 60-bit md5 hash, same 3-gram shingles,
    same W=4 window-min) for any corpus — tiny alphabets force the
    repeated-shingle / duplicate-window-min cases, and short docs
    exercise the < W cutoff."""
    from decimal import ROUND_HALF_UP, Decimal

    from pinterest_data_pipeline6_spark.operators.textops import (
        WINNOW_N,
        WINNOW_W,
        winnowing_fingerprints,
    )

    rows = [(i, lg, src, " ".join(toks)) for i, lg, src, toks in docs]
    d = _write_docs(spark, tmp_path_factory, "winnow_prop", rows)

    got = {
        (
            r["source"],
            r["n_docs"],
            r["n_windows"],
            r["n_fp"],
            r["n_fp_distinct"],
            r["density"],
        )
        for r in winnowing_fingerprints(spark, d).collect()
    }

    per_source: dict[str, list] = {}
    for i, lg, src, text in rows:
        toks = text.split(" ")
        if len(toks) < WINNOW_N:
            continue
        hs = [
            _h64_py(" ".join(toks[j : j + WINNOW_N]))
            for j in range(len(toks) - WINNOW_N + 1)
        ]
        if len(hs) < WINNOW_W:
            continue
        fps = {
            min(hs[j : j + WINNOW_W]) for j in range(len(hs) - WINNOW_W + 1)
        }
        per_source.setdefault(src, []).append((len(hs) - WINNOW_W + 1, fps))
    want = set()
    for src, entries in per_source.items():
        n_windows = sum(w for w, _ in entries)
        n_fp = sum(len(f) for _, f in entries)
        distinct = len(set().union(*(f for _, f in entries)))
        density = float(
            (Decimal(n_fp) / Decimal(n_windows)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP
            )
        )
        want.add((src, len(entries), n_windows, n_fp, distinct, density))
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.sampled_from(["en", "fr"]),
            st.sampled_from(["sA", "sB"]),
            st.lists(st.sampled_from(list("abc")), min_size=1, max_size=6),
        ),
        min_size=0,
        max_size=55,
        unique_by=lambda t: t[0],
    )
)
def test_source_quality_cap_matches_python_reference(
    spark, docs, tmp_path_factory
):
    """The keep/drop split and quality floor must equal a per-source
    Python sort for any corpus — with up to ~27 docs per source the
    CAP=20 boundary is actually exercised, and the tiny alphabet
    forces quality ties broken by doc_id."""
    from pinterest_data_pipeline6_spark.operators.curation import (
        SOURCE_CAP,
        source_quality_cap,
    )

    rows = [(i, lg, src, " ".join(toks)) for i, lg, src, toks in docs]
    d = _write_docs(spark, tmp_path_factory, "cap_prop", rows)

    got = {
        (r["source"], r["n_docs"], r["n_kept"], r["n_dropped"], r["quality_floor"])
        for r in source_quality_cap(spark, d).collect()
    }

    per_source: dict[str, list] = {}
    for i, lg, src, text in rows:
        toks = text.split(" ")
        q = len(set(toks)) * 1_000_000 + min(len(text), 999_999)
        per_source.setdefault(src, []).append((q, i))
    want = set()
    for src, qs in per_source.items():
        ordered = sorted(qs, key=lambda t: (-t[0], t[1]))
        kept = ordered[:SOURCE_CAP]
        want.add(
            (src, len(qs), len(kept), len(qs) - len(kept), min(q for q, _ in kept))
        )
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.sampled_from(["en", "fr"]),
            st.sampled_from(["sA", "sB", "sC"]),
            st.lists(st.sampled_from(list("ab")), min_size=1, max_size=9),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_token_budget_allocation_invariants(spark, docs, tmp_path_factory):
    """For any corpus: per-source availability is exact, every
    allocation is clipped at availability, the total allocation never
    exceeds the budget, and shares match the sqrt-temperature formula
    within rounding."""
    import math

    from pinterest_data_pipeline6_spark.operators.curation import (
        BUDGET_FRACTION_DEN,
        BUDGET_FRACTION_NUM,
        token_budget_allocation,
    )

    rows = [(i, lg, src, " ".join(toks)) for i, lg, src, toks in docs]
    d = _write_docs(spark, tmp_path_factory, "budget_prop", rows)

    out = {r["source"]: r for r in token_budget_allocation(spark, d).collect()}

    avail: dict[str, int] = {}
    for i, lg, src, text in rows:
        avail[src] = avail.get(src, 0) + len(text.split(" "))
    total = sum(avail.values())
    budget = total * BUDGET_FRACTION_NUM // BUDGET_FRACTION_DEN
    wsum = sum(math.sqrt(a) for a in avail.values())

    assert set(out) == set(avail)
    for src, a in avail.items():
        r = out[src]
        assert r["avail_tokens"] == a
        assert 0 <= r["alloc_tokens"] <= a
        assert abs(r["share"] - math.sqrt(a) / wsum) <= 2e-6
        assert abs(r["epochs"] - r["alloc_tokens"] / a) <= 2e-4
    assert sum(r["alloc_tokens"] for r in out.values()) <= budget


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.sampled_from(["en", "fr"]),
            st.sampled_from(["src0", "sX", "sY"]),  # src0 = DSIR target
            st.lists(st.sampled_from(list("abcdef")), min_size=1, max_size=10),
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_dsir_weights_match_python_reference(spark, docs, tmp_path_factory):
    """Per-language doc counts and selection counts must be exact, and
    the mean weight must match a pure-Python add-one-smoothed hashed
    log-ratio scorer to float tolerance, for any target/pool split —
    including corpora that are all-target (empty output) or all-pool."""
    import math

    from pinterest_data_pipeline6_spark.operators.curation import (
        DSIR_BUCKETS,
        DSIR_TARGET_SOURCES,
        dsir_importance_weights,
    )

    rows = [(i, lg, src, " ".join(toks)) for i, lg, src, toks in docs]
    d = _write_docs(spark, tmp_path_factory, "dsir_prop", rows)

    out = {r["lang"]: r for r in dsir_importance_weights(spark, d).collect()}

    c_t: dict[int, int] = {}
    c_r: dict[int, int] = {}
    pool_docs = []
    for i, lg, src, text in rows:
        buckets = [_h64_py(t) % DSIR_BUCKETS for t in text.split(" ")]
        if src in DSIR_TARGET_SOURCES:
            for b in buckets:
                c_t[b] = c_t.get(b, 0) + 1
        else:
            for b in buckets:
                c_r[b] = c_r.get(b, 0) + 1
            pool_docs.append((lg, buckets))
    seen = set(c_t) | set(c_r)
    tot_t, tot_r = sum(c_t.values()), sum(c_r.values())
    ratio = {
        b: math.log(
            ((c_t.get(b, 0) + 1) / (tot_t + DSIR_BUCKETS))
            / ((c_r.get(b, 0) + 1) / (tot_r + DSIR_BUCKETS))
        )
        for b in seen
    }
    per_lang: dict[str, list] = {}
    for lg, buckets in pool_docs:
        per_lang.setdefault(lg, []).append(sum(ratio[b] for b in buckets))
    assert set(out) == set(per_lang)
    for lg, ws in per_lang.items():
        r = out[lg]
        assert r["n_docs"] == len(ws)
        assert r["n_selected"] == sum(1 for w in ws if w > 0)
        assert abs(r["mean_weight"] - sum(ws) / len(ws)) <= 2e-4


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.sampled_from(["en", "fr"]),
            st.lists(st.sampled_from(list("abcd")), min_size=0, max_size=10),
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_kn_continuation_matches_python_reference(spark, docs, tmp_path_factory):
    """The continuation table must equal a pure-Python Kneser-Ney count
    pass for any corpus — tiny alphabets force heavy bigram-type
    collisions (the regime where continuation counts and raw counts
    actually diverge), and sub-2-token docs exercise the cutoff."""
    from pinterest_data_pipeline6_spark.operators.textops import (
        KN_TOP,
        kn_continuation_stats,
    )

    rows = [(i, lg, "sX", " ".join(toks)) for i, lg, toks in docs]
    d = _write_docs(spark, tmp_path_factory, "kn_prop", rows)

    got = {
        (r["lang"], r["rank"], r["word"], r["cont_types"], r["p_continuation"])
        for r in kn_continuation_stats(spark, d).collect()
    }

    types: set = set()
    for i, lg, _src, text in rows:
        toks = text.split(" ")
        for j in range(len(toks) - 1):
            types.add((lg, toks[j], toks[j + 1]))
    want = set()
    langs = {lg for lg, _, _ in types}
    for lg in langs:
        lang_types = [(w1, w2) for lgx, w1, w2 in types if lgx == lg]
        total = len(lang_types)
        cont: dict[str, int] = {}
        for _w1, w2 in lang_types:
            cont[w2] = cont.get(w2, 0) + 1
        ordered = sorted(cont.items(), key=lambda kv: (-kv[1], kv[0]))[:KN_TOP]
        for rank, (w2, c) in enumerate(ordered, start=1):
            want.add((lg, rank, w2, c, round(c / total, 6)))
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.lists(st.sampled_from(list("ab")), min_size=1, max_size=12),
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    )
)
def test_weighted_quantiles_match_python_reference(spark, docs, tmp_path_factory):
    """The distributed weighted-quantile pass must equal a sequential
    cumulative-weight scan for any corpus — including heavy n_chars
    ties (broken by doc_id), single-doc corpora, and thresholds landing
    exactly on a cumulative boundary (the integer cross-multiplication
    must not drift)."""
    from pinterest_data_pipeline6_spark.operators.textops import (
        WQ_QUANTILES,
        weighted_length_quantiles,
    )

    rows = [(i, "en", "sX", " ".join(toks)) for i, toks in docs]
    d = _write_docs(spark, tmp_path_factory, "wq_prop", rows)

    got = {
        (r["quantile"], r["n_chars"], r["cum_tokens"], r["total_tokens"])
        for r in weighted_length_quantiles(spark, d).collect()
    }

    ordered = sorted(
        ((len(text), i, len(text.split(" "))) for i, _lg, _src, text in rows),
        key=lambda t: (t[0], t[1]),
    )
    total = sum(wt for _s, _i, wt in ordered)
    want = set()
    for label, num, den in WQ_QUANTILES:
        cum = 0
        for s, _i, wt in ordered:
            cum += wt
            if cum * den >= num * total:
                want.add((label, s, cum, total))
                break
    assert got == want


# --- round-6 wave ------------------------------------------------------------


def _write_events(spark, tmp_path_factory, tag, rows):
    """rows: (event_id, ts, user_id, event_type, value). Writes a
    minimal events table and returns the sf dir."""
    out = tmp_path_factory.mktemp(tag)
    spark.createDataFrame(
        [(i, ts, u, et, float(v), None) for i, ts, u, et, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))
    return str(out)


@settings(max_examples=6, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 200)),
        min_size=0,
        max_size=80,
    )
)
def test_label_propagation_matches_python_reference(
    spark, pairs, tmp_path_factory
):
    """Two synchronous plurality-label rounds (min-label ties) must
    equal a pure-Python simulation for any random multigraph — the
    contraction, dedup, tie-break and round count all exercised."""
    from pinterest_data_pipeline6_spark.operators.graph import (
        LPA_ROUNDS,
        TRI_K,
        label_propagation_communities,
    )

    out = tmp_path_factory.mktemp("lpa_prop")
    spark.createDataFrame(
        [(pk, sk) for pk, sk in pairs], "l_partkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

    got = {
        (r["community"], r["n_nodes"], r["min_node"], r["max_node"])
        for r in label_propagation_communities(spark, str(out)).collect()
    }

    edges = set()
    for pk, sk in pairs:
        u, v = pk % TRI_K, (sk * 7) % TRI_K
        if u != v:
            edges.add((min(u, v), max(u, v)))
    adj: dict[int, list] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lbl = {n: n for n in adj}
    for _ in range(LPA_ROUNDS):
        new = {}
        for n, nbrs in adj.items():
            counts: dict[int, int] = {}
            for m in nbrs:
                counts[lbl[m]] = counts.get(lbl[m], 0) + 1
            new[n] = min(
                (l for l in counts), key=lambda l: (-counts[l], l)
            )
        lbl = new
    comm: dict[int, list] = {}
    for n, l in lbl.items():
        comm.setdefault(l, []).append(n)
    want = {
        (l, len(ns), min(ns), max(ns)) for l, ns in comm.items()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),  # event_id = arrival order
            st.integers(0, 3 * 24 * 60),  # event-time minute offset
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_late_arrival_matches_python_reference(spark, rows, tmp_path_factory):
    """The distributed prefix-max lateness audit must equal a
    sequential arrival-order scan for any out-of-order stream."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.events import (
        LATE_TOLERANCE_MIN,
        late_arrival_accounting,
    )

    base = datetime.datetime(2024, 3, 1)
    ev = [
        (i, base + datetime.timedelta(minutes=m), 1, "view", 0.0)
        for i, m in rows
    ]
    d = _write_events(spark, tmp_path_factory, "late_prop", ev)
    got = {
        (str(r["d"]), r["n_events"], r["n_late"], r["max_late_us"])
        for r in late_arrival_accounting(spark, d).collect()
    }

    per_day: dict[str, list] = {}
    prev_max = None
    for i, m in sorted(rows):
        ts = base + datetime.timedelta(minutes=m)
        late_us = None
        if prev_max is not None:
            wm = prev_max - datetime.timedelta(minutes=LATE_TOLERANCE_MIN)
            us = int((wm - ts).total_seconds() * 1_000_000)
            late_us = us if us > 0 else None
        per_day.setdefault(str(ts.date()), []).append(late_us)
        prev_max = ts if prev_max is None else max(prev_max, ts)
    want = {
        (
            day,
            len(ls),
            sum(1 for x in ls if x is not None),
            max((x for x in ls if x is not None), default=None),
        )
        for day, ls in per_day.items()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.integers(0, 5),  # day index
            st.sampled_from(["click", "view"]),
            st.floats(0, 100, width=32),
        ),
        min_size=0,
        max_size=60,
        unique_by=lambda t: t[0],
    )
)
def test_theilsen_matches_python_reference(spark, rows, tmp_path_factory):
    """The distributed Theil-Sen drift must equal a pure-Python
    element-pick-median implementation — per-day lower medians,
    all-pairs slopes, lower median of slopes."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        quality_trend_theilsen,
    )

    base = datetime.datetime(2024, 3, 1, 12, 0)
    ev = [
        (i, base + datetime.timedelta(days=day), 1, et, float(v))
        for i, day, et, v in rows
    ]
    d = _write_events(spark, tmp_path_factory, "ts_prop", ev)
    got = {
        r["event_type"]: (r["n_slopes"], r["trend_per_day"])
        for r in quality_trend_theilsen(spark, d).collect()
    }

    per: dict[tuple, list] = {}
    for i, day, et, v in rows:
        per.setdefault((et, day), []).append((float(v), i))
    med: dict[str, list] = {}
    for (et, day), vs in per.items():
        vs.sort()
        m = vs[(len(vs) + 1) // 2 - 1][0]  # lower median element
        med.setdefault(et, []).append((day, m))
    want = {}
    for et, dm in med.items():
        dm.sort()
        slopes = [
            ((mb - ma) / float(db - da), da, db)
            for ix, (da, ma) in enumerate(dm)
            for db, mb in dm[ix + 1 :]
        ]
        if not slopes:
            continue
        slopes.sort()
        s = slopes[(len(slopes) + 1) // 2 - 1][0]
        want[et] = (len(slopes), s)
    assert set(got) == set(want)
    for et, (n, s) in want.items():
        assert got[et][0] == n
        assert abs(got[et][1] - s) <= 1e-6


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10_000),
            st.integers(0, 2),  # user
            st.integers(0, 1),  # day
            st.integers(0, 100),  # minute (ties possible)
            st.sampled_from(["a", "b", "c"]),
        ),
        min_size=0,
        max_size=50,
        unique_by=lambda t: t[0],
    )
)
def test_skipgram_pairs_match_python_reference(spark, rows, tmp_path_factory):
    """lead()-column skip-gram extraction must equal a sequential
    sliding window over each (user, day) sequence ordered by
    (ts, event_id) — including timestamp ties broken by event_id."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.events import (
        SKIPGRAM_WINDOW,
        session_skipgram_pairs,
    )

    base = datetime.datetime(2024, 3, 1)
    ev = [
        (
            i,
            base + datetime.timedelta(days=day, minutes=minute),
            u,
            et,
            0.0,
        )
        for i, u, day, minute, et in rows
    ]
    d = _write_events(spark, tmp_path_factory, "sg_prop", ev)
    got = {
        (r["center"], r["context"], r["dist"]): (r["n_pairs"], r["n_users"])
        for r in session_skipgram_pairs(spark, d).collect()
    }

    seqs: dict[tuple, list] = {}
    for i, u, day, minute, et in rows:
        ts = base + datetime.timedelta(days=day, minutes=minute)
        seqs.setdefault((u, day), []).append((ts, i, et))
    agg: dict[tuple, list] = {}
    for (u, _), evs in seqs.items():
        evs.sort()
        for ix, (_, _, c) in enumerate(evs):
            for k in range(1, SKIPGRAM_WINDOW + 1):
                if ix + k < len(evs):
                    agg.setdefault((c, evs[ix + k][2], k), []).append(u)
    want = {
        key: (len(us), len(set(us))) for key, us in agg.items()
    }
    assert got == want


# --- round 7: exact substring-level dedup (Lee et al. 2022 class) ------------


def _brute_dup_spans(toks_by_doc, K, cap):
    """Pure-Python mirror of longest_dup_substring_stats' per-doc
    numbers: seed K-grams with corpus frequency in [2, cap], chain
    consecutive seeds per (doc_a, doc_b, diagonal), interval-union the
    spans per doc. Returns {doc: (longest, dup_tokens)}."""
    from collections import Counter

    gram_count = Counter()
    grams = {}  # doc -> list of (pos, gram string) 0-based
    for d, toks in toks_by_doc.items():
        g = [
            (i, " ".join(toks[i : i + K]))
            for i in range(len(toks) - K + 1)
        ]
        grams[d] = g
        gram_count.update(s for _, s in g)
    eligible = {s for s, n in gram_count.items() if 2 <= n <= cap}
    out = {}
    for da, ga in grams.items():
        spans = set()
        for db, gb in grams.items():
            if da == db:
                continue
            pos_b = {}
            for j, s in gb:
                if s in eligible:
                    pos_b.setdefault(s, []).append(j)
            by_diag = {}
            for i, s in ga:
                if s not in eligible:
                    continue
                for j in pos_b.get(s, ()):
                    by_diag.setdefault(i - j, []).append(i)
            for seeds in by_diag.values():
                seeds.sort()
                start = prev = seeds[0]
                for i in seeds[1:]:
                    if i == prev + 1:
                        prev = i
                    else:
                        spans.add((start, prev + K - 1))
                        start = prev = i
                spans.add((start, prev + K - 1))
        if not spans:
            continue
        longest = max(e - s + 1 for s, e in spans)
        covered = set()
        for s, e in spans:
            covered.update(range(s, e + 1))
        out[da] = (longest, len(covered))
    return out


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 500),
            st.sampled_from(["en", "es"]),
            st.lists(
                st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
                min_size=0,
                max_size=30,
            ),
        ),
        min_size=0,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    planted=st.integers(0, 3),
)
def test_longest_dup_substring_matches_brute_force(
    spark, docs, planted, tmp_path_factory
):
    """The diagonal-chaining formulation must agree with a brute-force
    all-pairs maximal-match reference on every corpus: per language the
    doc-with-dup count, the longest duplicated run, and the exact
    duplicated-token union mass."""
    from pinterest_data_pipeline6_spark.operators.dedup import (
        LDS_HOT_CAP,
        LDS_K,
        longest_dup_substring_stats,
    )

    # plant long shared substrings so runs >= K actually occur
    shared = ["s%d" % i for i in range(LDS_K + 5)]
    rows = list(docs)
    for p in range(planted):
        base_id = 1000 + 2 * p
        rows.append((base_id, "en", ["x%d" % p] + shared + ["y%d" % p]))
        rows.append((base_id + 1, "en", shared + ["z%d" % p]))

    out = tmp_path_factory.mktemp("lds_prop")
    spark.createDataFrame(
        [(i, lg, " ".join(t)) for i, lg, t in rows],
        "doc_id long, lang string, text string",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = {
        r["lang"]: (
            r["n_docs_with_dup"],
            r["max_dup_len"],
            r["dup_tokens"],
            r["total_tokens"],
        )
        for r in longest_dup_substring_stats(spark, str(out)).collect()
    }

    # NOTE: split(" ") of "" yields one empty token in both engines,
    # so token counts below mirror len("".split(" ")) == 1
    toks_by_doc = {i: (" ".join(t)).split(" ") for i, lg, t in rows}
    lang_by_doc = {i: lg for i, lg, _ in rows}
    per_doc = _brute_dup_spans(toks_by_doc, LDS_K, LDS_HOT_CAP)
    want = {}
    for i, lg in lang_by_doc.items():
        n, mx, dup, tot = want.get(lg, (0, 0, 0, 0))
        tot += len(toks_by_doc[i])
        if i in per_doc:
            n += 1
            mx = max(mx, per_doc[i][0])
            dup += per_doc[i][1]
        want[lg] = (n, mx, dup, tot)
    assert got == want


def test_unicode_fold_matches_duckdb_nfc_on_declared_subset(
    spark, tmp_path_factory
):
    """The Spark replace-chain NFC must agree with DuckDB's native
    nfc_normalize on every declared combining sequence, and the full
    fold must merge compatibility variants in both engines."""
    import duckdb

    from pinterest_data_pipeline6_spark.operators.dedup import (
        _NFC_PAIRS,
        ORACLE,
        unicode_fold_dedup_stats,
    )

    rows = []
    # every declared pair, decomposed form, one doc each + its
    # precomposed twin (they must merge under the fold)
    for k, (seq, comp) in enumerate(_NFC_PAIRS):
        rows.append((2 * k, f"word {seq} tail", "en"))
        rows.append((2 * k + 1, f"word {comp} tail", "en"))
    # compatibility variants: fullwidth + ligature + width spaces
    n = len(rows)
    rows.append((n, "ＦＵＬＬ　ﬁle ﬂow", "fw"))
    rows.append((n + 1, "FULL file flow", "fw"))

    out = tmp_path_factory.mktemp("nfc_prop")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    sdf = unicode_fold_dedup_stats(spark, str(out)).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{out}/documents.parquet/*.parquet')"
    )
    odf = con.execute(ORACLE["unicode_fold_dedup_stats"]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    got = sorted(map(tuple, sdf[cols].astype(str).values.tolist()))
    want = sorted(map(tuple, odf[cols].astype(str).values.tolist()))
    assert got == want
    by_lang = {r["lang"]: r for _, r in sdf.iterrows()}
    # every decomposed doc changed under NFC; every pair merged
    en = by_lang["en"]
    assert en["n_changed_nfc"] == len(_NFC_PAIRS)
    assert en["merged_by_fold"] == len(_NFC_PAIRS)
    fw = by_lang["fw"]
    assert fw["n_changed_fold"] == 1 and fw["merged_by_fold"] == 1


# --- round 7: stats-entry brute-force differentials ---------------------------


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["click", "view"]),
            st.sampled_from([0, 1, 2]),  # 0/1 weekend days, 2 weekday
            st.integers(0, 5),           # small value space forces ties
        ),
        min_size=0,
        max_size=60,
    )
)
def test_mannwhitney_matches_brute_force(spark, rows, tmp_path_factory):
    """The integer-exact 2U formulation (sum over distinct values of
    cnt_w * (2*min_rank + cnt - 1), minus nw*(nw+1)) must equal the
    textbook tie-averaged rank-sum U computed directly in Python."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        mannwhitney_value_shift,
    )

    # 2024-01-06 Sat / 2024-01-07 Sun / 2024-01-08 Mon
    days = [datetime.datetime(2024, 1, 6, 12), datetime.datetime(2024, 1, 7, 12),
            datetime.datetime(2024, 1, 8, 12)]
    data = [
        (i, days[d], i, et, float(v), None)
        for i, (et, d, v) in enumerate(rows)
    ]
    out = tmp_path_factory.mktemp("mw_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (r["n_weekend"], r["n_weekday"], r["u2_weekend"])
        for r in mannwhitney_value_shift(spark, str(out)).collect()
    }

    want = {}
    for et in {r[0] for r in rows}:
        sample = [(float(v), d < 2) for e, d, v in rows if e == et]
        sample.sort(key=lambda t: t[0])
        # tie-averaged ranks, doubled to stay integer
        r2 = 0
        i = 0
        while i < len(sample):
            j = i
            while j < len(sample) and sample[j][0] == sample[i][0]:
                j += 1
            # 2 * average rank of positions i..j-1 (1-based)
            avg2 = (i + 1) + j  # == 2*( (i+1 + j) / 2 )
            r2 += sum(avg2 for v, w in sample[i:j] if w)
            i = j
        nw = sum(1 for v, w in sample if w)
        nd = len(sample) - nw
        want[et] = (nw, nd, r2 - nw * (nw + 1))
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 9)),  # (user, day)
        min_size=1,
        max_size=60,
    )
)
def test_churn_hazard_matches_brute_force(spark, rows, tmp_path_factory):
    """Per-tenure churned / at-risk counts must match a direct Python
    computation from each user's (first, last) activity days."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.events import (
        churn_hazard_by_tenure,
    )

    base = datetime.datetime(2024, 1, 1, 9)
    data = [
        (i, base + datetime.timedelta(days=d), u, "click", 1.0, None)
        for i, (u, d) in enumerate(rows)
    ]
    out = tmp_path_factory.mktemp("chz_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["tenure_days"]: (r["n_at_risk"], r["n_churned"])
        for r in churn_hazard_by_tenure(spark, str(out)).collect()
    }

    span = {}
    for u, d in rows:
        lo, hi = span.get(u, (d, d))
        span[u] = (min(lo, d), max(hi, d))
    from collections import Counter

    churned = Counter(hi - lo for lo, hi in span.values())
    want = {
        t: (sum(c for tt, c in churned.items() if tt >= t), churned[t])
        for t in churned
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 1),          # priority bucket
            st.integers(0, 400),        # day offset
            st.integers(100, 9_999_99), # price in cents
        ),
        min_size=2,
        max_size=60,
    )
)
def test_ols_trend_matches_integer_reference(spark, rows, tmp_path_factory):
    """The decimal-moment OLS must equal a pure-Python integer-exact
    least squares (same milliunit scaling, same first-day shift)."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.facts import (
        ols_order_price_trend,
    )

    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, i, "O", cents / 100.0, base + datetime.timedelta(days=d),
         f"P{p}")
        for i, (p, d, cents) in enumerate(rows)
    ]
    out = tmp_path_factory.mktemp("ols_prop")
    spark.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))

    got = {
        r["o_orderpriority"]: (r["n_orders"], r["slope_per_day"], r["r2"])
        for r in ols_order_price_trend(spark, str(out)).collect()
    }

    for p in {f"P{p}" for p, d, c in rows}:
        pts = [(d, c * 10) for pp, d, c in rows if f"P{pp}" == p]
        d0 = min(d for d, y in pts)
        n = len(pts)
        sx = sum(d - d0 for d, y in pts)
        sy = sum(y for d, y in pts)
        sxx = sum((d - d0) ** 2 for d, y in pts)
        sxy = sum((d - d0) * y for d, y in pts)
        syy = sum(y * y for d, y in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        deny = n * syy - sy * sy
        assert got[p][0] == n
        if den == 0:
            assert got[p][1] is None
        else:
            want_slope = float(num) / float(den) / 1000.0
            assert got[p][1] == pytest.approx(want_slope, abs=2e-6)
            if deny != 0:
                want_r2 = (float(num) * float(num)) / (
                    float(den) * float(deny)
                )
                assert got[p][2] == pytest.approx(want_r2, abs=2e-6)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(-500, 500)),
        min_size=1,
        max_size=60,
    )
)
def test_mad_outliers_match_sorted_pick(spark, rows, tmp_path_factory):
    """Median/MAD element picks and the cross-multiplied outlier count
    must match a direct sorted-list computation."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        mad_robust_outliers,
    )

    base = datetime.datetime(2024, 1, 1, 9)
    data = [
        (i, base, i, f"t{t}", v / 10.0, None)
        for i, (t, v) in enumerate(rows)
    ]
    out = tmp_path_factory.mktemp("mad_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (r["n_events"], r["median_value"], r["mad"],
                          r["n_outliers"])
        for r in mad_robust_outliers(spark, str(out)).collect()
    }

    for t in {f"t{t}" for t, v in rows}:
        vals = sorted(
            (v / 10.0, i) for i, (tt, v) in enumerate(rows) if f"t{tt}" == t
        )
        n = len(vals)
        med = vals[(50 * n + 99) // 100 - 1][0]
        devs = sorted((abs(v - med), i) for v, i in vals)
        mad = devs[(50 * n + 99) // 100 - 1][0]
        n_out = sum(1 for d, i in devs if d * 6745.0 > mad * 35000.0)
        assert got[t] == (
            n,
            pytest.approx(med, abs=1e-9),
            pytest.approx(mad, abs=1e-9),
            n_out,
        )


def test_mad_outliers_mad_zero_convention(spark, tmp_path_factory):
    """MAD=0 corner (a value shared by >50% of the group): the modified
    z-score is undefined, and the documented convention is that EVERY
    event with nonzero deviation is flagged (6745*dev > 0).  Pins the
    degenerate behavior the docstring declares."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        mad_robust_outliers,
    )

    base = datetime.datetime(2024, 1, 1, 9)
    # 7 of 10 events share value 5.0 -> med=5.0, MAD=0; the 3 deviants
    # (including a tiny 5.000001 deviation) must ALL be flagged.
    vals = [5.0] * 7 + [5.000001, 4.0, 100.0]
    data = [
        (i, base, i, "tz", v, None) for i, v in enumerate(vals)
    ]
    out = tmp_path_factory.mktemp("mad_zero")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    [r] = mad_robust_outliers(spark, str(out)).collect()
    assert r["median_value"] == 5.0
    assert r["mad"] == 0.0
    assert r["n_events"] == 10
    assert r["n_outliers"] == 3


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 4), st.integers(0, 50)),
        min_size=1,
        max_size=60,
    )
)
def test_transition_matrix_matches_brute_force(spark, rows, tmp_path_factory):
    """(src, dst) transition counts must equal a per-user time-ordered
    bigram count with (ts, event_id) tie-break."""
    import datetime
    from collections import Counter

    from pinterest_data_pipeline6_spark.operators.events import (
        event_transition_matrix,
    )

    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, base + datetime.timedelta(minutes=m), u, f"e{t}", 1.0, None)
        for i, (u, t, m) in enumerate(rows)
    ]
    out = tmp_path_factory.mktemp("trans_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in event_transition_matrix(spark, str(out)).collect()
    }

    want = Counter()
    by_user = {}
    for i, (u, t, m) in enumerate(rows):
        by_user.setdefault(u, []).append((m, i, f"e{t}"))
    for seq in by_user.values():
        seq.sort()
        for (m1, i1, a), (m2, i2, b) in zip(seq, seq[1:]):
            want[(a, b)] += 1
    assert got == dict(want)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 35)),  # (user, day)
        min_size=1,
        max_size=60,
    )
)
def test_cohort_retention_matches_brute_force(spark, rows, tmp_path_factory):
    """Cohort buckets (Monday-truncated first-seen week), offsets, and
    distinct-user counts must match a direct per-user computation."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.events import (
        cohort_retention,
    )

    base = datetime.datetime(2024, 1, 1, 12)  # a Monday
    data = [
        (i, base + datetime.timedelta(days=d), u, "click", 1.0, None)
        for i, (u, d) in enumerate(rows)
    ]
    out = tmp_path_factory.mktemp("cohort_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(spark, str(out)).collect()
    }

    def monday(day_offset: int) -> datetime.date:
        d = (base + datetime.timedelta(days=day_offset)).date()
        return d - datetime.timedelta(days=d.weekday())

    user_weeks = {}
    for u, d in rows:
        user_weeks.setdefault(u, set()).add(monday(d))
    want = {}
    for u, ws in user_weeks.items():
        cw = min(ws)
        for w in ws:
            key = (cw.isoformat(), (w - cw).days // 7)
            want.setdefault(key, set()).add(u)
    assert got == {k: len(us) for k, us in want.items()}


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 9), st.integers(1, 40)),
        min_size=1,
        max_size=40,
    )
)
def test_shewhart_breaches_match_brute_force(spark, rows, tmp_path_factory):
    """3-sigma breach counts must match a direct integer computation
    (n*c - S1)^2 > 9*(n*S2 - S1^2) over the daily-count series."""
    import datetime
    from collections import Counter

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        shewhart_control_limits,
    )

    base = datetime.datetime(2024, 1, 1, 6)
    data = []
    eid = 0
    for t, d, c in rows:
        for _ in range(c):
            data.append(
                (eid, base + datetime.timedelta(days=d), eid, f"t{t}", 1.0,
                 None)
            )
            eid += 1
    out = tmp_path_factory.mktemp("shew_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (r["n_days"], r["n_out_hi"], r["n_out_lo"])
        for r in shewhart_control_limits(spark, str(out)).collect()
    }

    daily = Counter()
    for t, d, c in rows:
        daily[(f"t{t}", d)] += c
    for t in {f"t{t}" for t, d, c in rows}:
        cs = [c for (tt, d), c in daily.items() if tt == t]
        n, s1, s2 = len(cs), sum(cs), sum(c * c for c in cs)
        hi = sum(
            1
            for c in cs
            if (n * c - s1) ** 2 > 9 * (n * s2 - s1 * s1) and n * c - s1 > 0
        )
        lo = sum(
            1
            for c in cs
            if (n * c - s1) ** 2 > 9 * (n * s2 - s1 * s1) and n * c - s1 < 0
        )
        assert got[t] == (n, hi, lo)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 12), st.integers(1, 30)),
        min_size=1,
        max_size=30,
    )
)
def test_page_hinkley_matches_integer_reference(
    spark, rows, tmp_path_factory
):
    """The window formulation (u_t = D*prefix_t - t*S, drift = peak
    distance from the running trough/crest) must equal a direct
    sequential Page-Hinkley computation in Python integers."""
    import datetime
    from collections import Counter

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        page_hinkley_drift,
    )

    base = datetime.datetime(2024, 1, 1, 6)
    data = []
    eid = 0
    for t, d, c in rows:
        for _ in range(c):
            data.append(
                (eid, base + datetime.timedelta(days=d), eid, f"t{t}", 1.0,
                 None)
            )
            eid += 1
    out = tmp_path_factory.mktemp("ph_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (
            r["n_days"],
            r["up_drift"],
            (r["up_day"] - base.date()).days,
            r["down_drift"],
            (r["down_day"] - base.date()).days,
        )
        for r in page_hinkley_drift(spark, str(out)).collect()
    }

    daily = Counter()
    for t, d, c in rows:
        daily[(f"t{t}", d)] += c
    for t in {f"t{t}" for t, d, c in rows}:
        series = sorted((d, c) for (tt, d), c in daily.items() if tt == t)
        D = len(series)
        S = sum(c for d, c in series)
        prefix = 0
        run_min = run_max = 0  # u_0 bounds start at the first row below
        us = []
        for i, (d, c) in enumerate(series, start=1):
            prefix += c
            us.append((D * prefix - i * S, d))
        up_best = (None, None)
        dn_best = (None, None)
        lo = hi = None
        for i, (u, d) in enumerate(us):
            lo = u if lo is None else min(lo, u)
            hi = u if hi is None else max(hi, u)
            up, dn = u - lo, hi - u
            if up_best[0] is None or up > up_best[0]:
                up_best = (up, d)
            if dn_best[0] is None or dn > dn_best[0]:
                dn_best = (dn, d)
        assert got[t] == (
            D,
            pytest.approx(up_best[0] / D, abs=1e-4),
            up_best[1],
            pytest.approx(dn_best[0] / D, abs=1e-4),
            dn_best[1],
        )


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 8), st.integers(1, 8)),
        min_size=2,
        max_size=40,
    )
)
def test_spearman_matches_permutation_rank_reference(
    spark, rows, tmp_path_factory
):
    """Tie-broken Spearman: sum(d^2) over (length rank, diversity
    rank) permutation ranks with doc_id tie-break must match a direct
    Python computation on synthesized token streams."""
    from pinterest_data_pipeline6_spark.operators.dataquality import (
        QUERIES as TQ,
    )

    # doc i: n_tok tokens of which n_dis are distinct (n_dis <= n_tok)
    docs = []
    for i, (lg, n_tok, n_dis) in enumerate(rows):
        n_dis = min(n_dis, n_tok)
        toks = [f"w{j % n_dis}" for j in range(n_tok)]
        docs.append((i, " ".join(toks), f"l{lg}", "s", len(" ".join(toks))))
    out = tmp_path_factory.mktemp("spear_prop")
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = {
        r["lang"]: (r["n_docs"], r["sum_d2"])
        for r in TQ["spearman_length_diversity"](spark, str(out)).collect()
    }

    for lg in {f"l{lg}" for lg, a, b in rows}:
        pts = [
            (i, n_tok, min(n_dis, n_tok))
            for i, (g, n_tok, n_dis) in enumerate(rows)
            if f"l{g}" == lg
        ]
        rank_x = {
            i: r + 1
            for r, (i, x, y) in enumerate(
                sorted(pts, key=lambda p: (p[1], p[0]))
            )
        }
        rank_y = {
            i: r + 1
            for r, (i, x, y) in enumerate(
                sorted(pts, key=lambda p: (p[2], p[0]))
            )
        }
        sum_d2 = sum((rank_x[i] - rank_y[i]) ** 2 for i, x, y in pts)
        assert got[lg] == (len(pts), sum_d2)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 10), st.integers(1, 6),
                  st.integers(-3, 3)),
        min_size=2,
        max_size=40,
    )
)
def test_kendall_tau_matches_brute_force(spark, rows, tmp_path_factory):
    """Concordant/discordant pair counts and the tau-b tie terms must
    match a direct O(days^2) Python computation over the daily
    (count, value-sum) series."""
    import datetime
    from collections import defaultdict

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        kendall_tau_daily,
    )

    base = datetime.datetime(2024, 1, 1, 6)
    data = []
    eid = 0
    for t, d, c, v in rows:
        for _ in range(c):
            data.append(
                (eid, base + datetime.timedelta(days=d), eid, f"t{t}",
                 float(v), None)
            )
            eid += 1
    out = tmp_path_factory.mktemp("kt_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (r["n0"], r["n_concordant"], r["n_discordant"])
        for r in kendall_tau_daily(spark, str(out)).collect()
    }

    daily = defaultdict(lambda: [0, 0])
    for t, d, c, v in rows:
        daily[(f"t{t}", d)][0] += c
        daily[(f"t{t}", d)][1] += c * v
    for t in {f"t{t}" for t, *_ in rows}:
        series = [(x, y) for (tt, d), (x, y) in daily.items() if tt == t]
        n = len(series)
        if n < 2:
            # no day pairs: the inner pair join yields no group at all
            assert t not in got
            continue
        con = dis = 0
        for i in range(n):
            for j in range(i + 1, n):
                s = 0
                if series[i][0] != series[j][0] and series[i][1] != series[j][1]:
                    sx = 1 if series[i][0] < series[j][0] else -1
                    sy = 1 if series[i][1] < series[j][1] else -1
                    s = sx * sy
                if s == 1:
                    con += 1
                elif s == -1:
                    dis += 1
        assert got[t] == (n * (n - 1) // 2, con, dis)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 12), st.integers(1, 8)),
        min_size=1,
        max_size=40,
    )
)
def test_runs_test_matches_brute_force(spark, rows, tmp_path_factory):
    """Run boundaries and up/down counts over the nonzero daily deltas
    must match a direct sequential computation."""
    import datetime
    from collections import Counter

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        runs_test_daily,
    )

    base = datetime.datetime(2024, 1, 1, 6)
    data = []
    eid = 0
    for t, d, c in rows:
        for _ in range(c):
            data.append(
                (eid, base + datetime.timedelta(days=d), eid, f"t{t}", 1.0,
                 None)
            )
            eid += 1
    out = tmp_path_factory.mktemp("runs_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (r["n_moves"], r["n_up"], r["n_down"], r["n_runs"])
        for r in runs_test_daily(spark, str(out)).collect()
    }

    daily = Counter()
    for t, d, c in rows:
        daily[(f"t{t}", d)] += c
    for t in {f"t{t}" for t, *_ in rows}:
        series = sorted((d, c) for (tt, d), c in daily.items() if tt == t)
        signs = []
        for (d1, c1), (d2, c2) in zip(series, series[1:]):
            if c2 != c1:
                signs.append(1 if c2 > c1 else 0)
        if not signs:
            assert t not in got
            continue
        n_runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
        assert got[t] == (
            len(signs), sum(signs), len(signs) - sum(signs), n_runs
        )


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 10), st.integers(1, 9)),
        min_size=1,
        max_size=40,
    )
)
def test_fano_factor_matches_integer_reference(spark, rows, tmp_path_factory):
    """fano = (D*sum(n^2) - S^2) / (D*S) must equal the direct
    variance/mean of the daily-count series (population variance)."""
    import datetime
    from collections import Counter

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        fano_burstiness,
    )

    base = datetime.datetime(2024, 1, 1, 6)
    data = []
    eid = 0
    for t, d, c in rows:
        for _ in range(c):
            data.append(
                (eid, base + datetime.timedelta(days=d), eid, f"t{t}", 1.0,
                 None)
            )
            eid += 1
    out = tmp_path_factory.mktemp("fano_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (r["n_days"], r["fano_factor"])
        for r in fano_burstiness(spark, str(out)).collect()
    }

    daily = Counter()
    for t, d, c in rows:
        daily[(f"t{t}", d)] += c
    for t in {f"t{t}" for t, *_ in rows}:
        cs = [c for (tt, d), c in daily.items() if tt == t]
        D, S = len(cs), sum(cs)
        mean = S / D
        var = sum((c - mean) ** 2 for c in cs) / D
        assert got[t][0] == D
        assert got[t][1] == pytest.approx(var / mean, abs=1e-5)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 10), st.integers(1, 9)),
        min_size=1,
        max_size=40,
    )
)
def test_lag1_autocorr_matches_brute_force(spark, rows, tmp_path_factory):
    """Pearson r over consecutive observed-day pairs must match a
    direct computation on the sorted daily-count series."""
    import datetime
    import math
    from collections import Counter

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        lag1_autocorr_daily,
    )

    base = datetime.datetime(2024, 1, 1, 6)
    data = []
    eid = 0
    for t, d, c in rows:
        for _ in range(c):
            data.append(
                (eid, base + datetime.timedelta(days=d), eid, f"t{t}", 1.0,
                 None)
            )
            eid += 1
    out = tmp_path_factory.mktemp("lag1_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (r["n_pairs"], r["r1_autocorr"])
        for r in lag1_autocorr_daily(spark, str(out)).collect()
    }

    daily = Counter()
    for t, d, c in rows:
        daily[(f"t{t}", d)] += c
    for t in {f"t{t}" for t, *_ in rows}:
        series = [c for d, c in sorted(
            (d, c) for (tt, d), c in daily.items() if tt == t
        )]
        if len(series) < 2:
            assert t not in got
            continue
        xs, ys = series[:-1], series[1:]
        m = len(xs)
        num = m * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
        vx = m * sum(x * x for x in xs) - sum(xs) ** 2
        vy = m * sum(y * y for y in ys) - sum(ys) ** 2
        want = None if vx * vy == 0 else num / math.sqrt(float(vx) * float(vy))
        assert got[t][0] == m
        if want is None:
            assert got[t][1] is None
        else:
            assert got[t][1] == pytest.approx(want, abs=1e-5)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 20), st.integers(1, 6)),
        min_size=1,
        max_size=40,
    )
)
def test_weekday_seasonality_matches_brute_force(
    spark, rows, tmp_path_factory
):
    """ISO-Monday=0 weekday buckets, shares, and x7 lifts must match a
    direct Python computation (2024-01-01 is a Monday, so day offset
    mod 7 IS the expected weekday)."""
    import datetime
    from collections import Counter

    from pinterest_data_pipeline6_spark.operators.dataquality import (
        weekday_seasonality,
    )

    base = datetime.datetime(2024, 1, 1, 6)  # Monday
    data = []
    eid = 0
    for t, d, c in rows:
        for _ in range(c):
            data.append(
                (eid, base + datetime.timedelta(days=d), eid, f"t{t}", 1.0,
                 None)
            )
            eid += 1
    out = tmp_path_factory.mktemp("wd_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        (r["event_type"], r["weekday"]): (r["n_events"], r["share"])
        for r in weekday_seasonality(spark, str(out)).collect()
    }

    by_wd = Counter()
    totals = Counter()
    for t, d, c in rows:
        by_wd[(f"t{t}", d % 7)] += c
        totals[f"t{t}"] += c
    want = {
        k: (n, pytest.approx(n / totals[k[0]], abs=1e-6))
        for k, n in by_wd.items()
    }
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 5), st.integers(1, 9)),
        min_size=1,
        max_size=30,
    )
)
def test_hhi_gini_match_brute_force(spark, rows, tmp_path_factory):
    """HHI (sum of squared shares) and the mean-absolute-difference
    Gini must match direct computations on per-source doc counts."""
    from pinterest_data_pipeline6_spark.operators.curation import (
        source_concentration_hhi,
    )

    data = []
    did = 0
    for lg, s, c in rows:
        for _ in range(c):
            data.append((did, f"doc {did} text", f"l{lg}", f"s{s}", 10))
            did += 1
    out = tmp_path_factory.mktemp("hhi_prop")
    spark.createDataFrame(
        data,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = {
        r["lang"]: (r["n_sources"], r["n_docs"], r["hhi"], r["gini"])
        for r in source_concentration_hhi(spark, str(out)).collect()
    }

    from collections import Counter

    cnt = Counter()
    for lg, s, c in rows:
        cnt[(f"l{lg}", f"s{s}")] += c
    for lg in {f"l{lg}" for lg, *_ in rows}:
        xs = [c for (g, s), c in cnt.items() if g == lg]
        k, S = len(xs), sum(xs)
        hhi = sum(x * x for x in xs) / S**2
        sad = sum(abs(a - b) for a in xs for b in xs)
        gini = sad / (2 * k * S)
        assert got[lg] == (
            k, S, pytest.approx(hhi, abs=1e-6), pytest.approx(gini, abs=1e-6)
        )


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 30)),  # (lang, n_tok)
        min_size=1,
        max_size=40,
    )
)
def test_token_lorenz_matches_sorted_pick(spark, rows, tmp_path_factory):
    """Top-1%/top-10% token shares must match a direct sorted
    computation with the ceil(n/100)/ceil(n/10) cutoffs and the
    (length desc, doc_id asc) tie-break."""
    from pinterest_data_pipeline6_spark.operators.curation import (
        token_lorenz_points,
    )

    docs = [
        (i, " ".join(f"w{j}" for j in range(n)), f"l{lg}", "s", 3 * n)
        for i, (lg, n) in enumerate(rows)
    ]
    out = tmp_path_factory.mktemp("lorenz_prop")
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = {
        r["lang"]: (r["n_docs"], r["total_tokens"], r["top1pct_share"],
                    r["top10pct_share"])
        for r in token_lorenz_points(spark, str(out)).collect()
    }

    for lg in {f"l{lg}" for lg, n in rows}:
        lens = sorted(
            ((n, i) for i, (g, n) in enumerate(rows) if f"l{g}" == lg),
            key=lambda t: (-t[0], t[1]),
        )
        n_docs = len(lens)
        total = sum(n for n, i in lens)
        k1 = (n_docs + 99) // 100
        k10 = (n_docs + 9) // 10
        s1 = sum(n for n, i in lens[:k1]) / total
        s10 = sum(n for n, i in lens[:k10]) / total
        assert got[lg] == (
            n_docs, total,
            pytest.approx(s1, abs=1e-6), pytest.approx(s10, abs=1e-6),
        )


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 4), st.integers(1, 9)),
        min_size=1,
        max_size=30,
    )
)
def test_rate_cap_matches_brute_force(spark, rows, tmp_path_factory):
    """Violation counts, worst burst, and dropped-event mass per day
    must match a direct per-(user, day) computation at the cap of 5."""
    import datetime
    from collections import Counter

    from pinterest_data_pipeline6_spark.operators.events import (
        RATE_CAP_PER_DAY,
        rate_cap_violations,
    )

    base = datetime.datetime(2024, 1, 1, 6)
    data = []
    eid = 0
    for u, d, c in rows:
        for _ in range(c):
            data.append(
                (eid, base + datetime.timedelta(days=d), u, "click", 1.0,
                 None)
            )
            eid += 1
    out = tmp_path_factory.mktemp("cap_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        (r["d"] - base.date()).days: (
            r["n_user_days"], r["n_violations"], r["max_burst"],
            r["n_excess_events"],
        )
        for r in rate_cap_violations(spark, str(out)).collect()
    }

    per = Counter()
    for u, d, c in rows:
        per[(u, d)] += c
    want = {}
    for d in {d for u, d, c in rows}:
        ns = [n for (u, dd), n in per.items() if dd == d]
        want[d] = (
            len(ns),
            sum(1 for n in ns if n > RATE_CAP_PER_DAY),
            max(ns),
            sum(n - RATE_CAP_PER_DAY for n in ns if n > RATE_CAP_PER_DAY),
        )
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 3), st.integers(0, 2),
                  st.integers(0, 500)),
        min_size=1,
        max_size=40,
    )
)
def test_first_touch_dedup_matches_brute_force(spark, rows, tmp_path_factory):
    """Kept counts per type must match a direct first-per-(user, day)
    selection with the (ts, event_id) tie-break — including events of
    DIFFERENT types competing for the same (user, day) slot."""
    import datetime
    from collections import Counter

    from pinterest_data_pipeline6_spark.operators.events import (
        daily_first_touch_dedup,
    )

    base = datetime.datetime(2024, 1, 1)
    data = [
        (i, base + datetime.timedelta(days=d, seconds=s), u, f"e{t}", 1.0,
         None)
        for i, (u, d, t, s) in enumerate(rows)
    ]
    out = tmp_path_factory.mktemp("ft_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (r["n_events"], r["n_kept"])
        for r in daily_first_touch_dedup(spark, str(out)).collect()
    }

    first = {}
    for i, (u, d, t, s) in enumerate(rows):
        key = (u, d)
        cand = (s, i, f"e{t}")
        if key not in first or cand < first[key]:
            first[key] = cand
    kept = Counter(t for s, i, t in first.values())
    n_all = Counter(f"e{t}" for u, d, t, s in rows)
    want = {t: (n_all[t], kept.get(t, 0)) for t in n_all}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    cents=st.lists(
        st.one_of(
            st.integers(-10_000_000, 10_000_000),
            # exact-binary fractions whose x1000 lands exactly on .5 —
            # the adversarial tie case for the rounding contract
            st.integers(-1000, 1000).map(lambda k: k * 62.5),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_integer_scaling_round_contract_matches_duckdb(spark, cents):
    """The moment entries scale doubles to integers via ROUND(v * S)
    in BOTH engines and rely on the products and the half-away-from-
    zero tie rule being identical.  Pin it: Spark's
    round(v*1000)::bigint must equal DuckDB's CAST(ROUND(v*1000) AS
    BIGINT) for every value, including exact .5 ties (62.5 multiples
    land exactly on half-integers after x1000 scaling)."""
    import duckdb

    from pyspark.sql import functions as F

    vals = [float(c) / 100.0 for c in cents]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = [
        r["r"]
        for r in df.select(
            F.round(F.col("v") * 1000).cast("bigint").alias("r")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(ROUND(CAST(? AS DOUBLE) * 1000) AS BIGINT)", [v]
        ).fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_ndcg_discount_literals_round_trip_exactly():
    """ann_ndcg_eval embeds 1/log2(p+1) as repr() literals in the
    DuckDB oracle; the whole determinism contract rests on repr
    round-tripping to the identical double."""
    from pinterest_data_pipeline6_spark.operators.similarity import (
        _NDCG_DISC,
    )

    for d in _NDCG_DISC:
        assert float(repr(d)) == d
    # and the oracle string carries exactly these literals
    from pinterest_data_pipeline6_spark.operators.similarity import ORACLE

    sql = ORACLE["ann_ndcg_eval"]
    for d in _NDCG_DISC:
        assert repr(d) in sql


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 4000)),  # (lang, doc_id)
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[1],
    )
)
def test_js_divergence_matches_python_reference(spark, rows, tmp_path_factory):
    """Hash-split counts and the smoothed JSD terms must match a
    pure-Python computation with the same 60-bit md5 hash splits and
    add-one smoothing."""
    import math

    from pinterest_data_pipeline6_spark.operators.curation import (
        SPLIT_BOUNDS,
        js_divergence_splits,
    )

    docs = [
        (did, f"text {did}", f"l{lg}", "s", 10) for lg, did in rows
    ]
    out = tmp_path_factory.mktemp("jsd_prop")
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = {
        r["lang"]: (r["n_train"], r["n_val"], r["jsd_term"])
        for r in js_divergence_splits(spark, str(out)).collect()
    }

    langs = sorted({f"l{lg}" for lg, did in rows})
    n_train = {lg: 0 for lg in langs}
    n_val = {lg: 0 for lg in langs}
    for lg, did in rows:
        pct = _h64_py(str(did)) % 100
        if pct < SPLIT_BOUNDS[0]:
            n_train[f"l{lg}"] += 1
        elif pct < SPLIT_BOUNDS[1]:
            n_val[f"l{lg}"] += 1
    tot_t = sum(n_train.values()) + len(langs)
    tot_v = sum(n_val.values()) + len(langs)
    for lg in langs:
        p = (n_train[lg] + 1) / tot_t
        q = (n_val[lg] + 1) / tot_v
        m = (p + q) / 2
        jsd = 0.5 * p * math.log2(p / m) + 0.5 * q * math.log2(q / m)
        assert got[lg][0] == n_train[lg]
        assert got[lg][1] == n_val[lg]
        assert got[lg][2] == pytest.approx(jsd, abs=1e-5)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(st.integers(0, 3), min_size=1, max_size=40),
        min_size=1,
        max_size=25,
    )
)
def test_ccnet_paragraph_dedup_matches_brute_force(
    spark, docs, tmp_path_factory
):
    """CCNet paragraph-dedup removal ledger must match a direct Python
    chunk-hash-first-occurrence computation (tiny alphabet forces chunk
    collisions, partial last chunks, and single-chunk docs)."""
    from pinterest_data_pipeline6_spark.operators.dedup import (
        PARA_TOKENS,
        ccnet_paragraph_dedup_stats,
    )

    rows = [
        (i, " ".join(f"w{t}" for t in toks), f"l{i % 2}", "s0", 0)
        for i, toks in enumerate(docs)
    ]
    out = tmp_path_factory.mktemp("ccnet_prop")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = {
        r["lang"]: (r["n_paras"], r["n_removed"], r["tokens_total"],
                    r["tokens_removed"], r["n_docs_touched"])
        for r in ccnet_paragraph_dedup_stats(spark, str(out)).collect()
    }

    first: dict[str, tuple] = {}
    occs = []  # (lang, doc_id, i, text, p_tok)
    for doc_id, text, lang, _, _ in rows:
        toks = text.split(" ")
        n_chunks = (len(toks) - 1) // PARA_TOKENS + 1
        for i in range(n_chunks):
            chunk = " ".join(toks[i * PARA_TOKENS:(i + 1) * PARA_TOKENS])
            occs.append((lang, doc_id, i, chunk, len(chunk.split(" "))))
            if chunk not in first or (doc_id, i) < first[chunk]:
                first[chunk] = (doc_id, i)
    want: dict[str, list] = {}
    touched: dict[str, set] = {}
    for lang, doc_id, i, chunk, p_tok in occs:
        w = want.setdefault(lang, [0, 0, 0, 0])
        removed = first[chunk] != (doc_id, i)
        w[0] += 1
        w[1] += removed
        w[2] += p_tok
        w[3] += p_tok * removed
        if removed:
            touched.setdefault(lang, set()).add(doc_id)
    for lang, w in want.items():
        assert got[lang] == (
            w[0], w[1], w[2], w[3], len(touched.get(lang, set()))
        ), lang


def test_para_composite_key_no_aliasing_past_2_20(spark):
    """The paragraph first-occurrence key is struct(doc_id, i), ordered
    lexicographically — a document with >= 2^20 paragraphs must still
    lose to ANY later doc_id (the retired doc_id * 2^20 + i packing
    aliased (0, 2^20) into doc 1's key space and would have picked the
    wrong canonical survivor).  Pins Spark's struct-min against
    DuckDB's struct-min on the exact corner, plus ties and plain rows."""
    import duckdb

    from pinterest_data_pipeline6_spark.operators.dedup import (
        _PARA_KEY,
        _para_key_col,
    )

    rows = [
        # (doc_id, i): doc 0 at/over the old 2^20 packing bound — the
        # old integer key 0 * 2^20 + (2^20 + 5) > 1 * 2^20 + 0 flipped
        # the survivor; the struct key must keep doc 0 first.
        (0, (1 << 20) + 5),
        (0, 1 << 20),
        (1, 0),
        (1, 7),
        (2, 3),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, i int")
    got = sdf.agg(F.min(_para_key_col()).alias("m")).collect()[0]["m"]
    want = duckdb.sql(
        "SELECT MIN(" + _PARA_KEY + ") FROM (VALUES "
        + ", ".join(f"({d}, {i})" for d, i in rows)
        + ") AS t(doc_id, i)"
    ).fetchone()[0]
    assert (got["d"], got["i"]) == (want["d"], want["i"]) == (0, 1 << 20)


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=7),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=10,
    )
)
# Self-pair runs >= 5 are the corner where the old shared-delimiter
# double-replace mis-phased greedy application ([aa, a, aa] instead of
# [aa, aa, a]) — pin them deterministically, odd and even lengths.
@example(docs=[["aaaaa", "aaaaaa", "aaaaaaa", "ab"]])
@example(docs=[["aaaa", "aa", "a"], ["abab", "aabb"]])
def test_bpe_iterative_merges_match_greedy_reference(
    spark, docs, tmp_path_factory
):
    """The 3-round unrolled BPE chain (per-symbol-framed single-replace
    apply) must match a direct Python greedy implementation: weighted
    pair counts, argmax with (count desc, pair asc) tie-break, greedy
    left-to-right single-scan merge application, recount.  A 2-letter
    alphabet maximizes overlapping self-pair sites ('aaaaa'), the exact
    corner the per-symbol framing must keep phase-aligned."""
    from pinterest_data_pipeline6_spark.operators.textops import (
        BPE_MERGE_ROUNDS,
        bpe_iterative_merges,
    )

    rows = [
        (i, " ".join(words), "en", "s0", 0) for i, words in enumerate(docs)
    ]
    out = tmp_path_factory.mktemp("bpe_prop")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = [
        (r["round"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_iterative_merges(spark, str(out)).collect()
    ]

    # Python reference: vocab as symbol tuples
    from collections import Counter

    vocab = Counter()
    for words in docs:
        for w in words:
            vocab[tuple(w)] += 1

    want = []
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        pair_counts: Counter = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += freq
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), cnt = best
        want.append((rnd, l, r, cnt))
        new_vocab: Counter = Counter()
        for syms, freq in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] += freq
        vocab = new_vocab

    assert got[: len(want)] == want


def test_condorcet_winner_requires_full_field(spark, tmp_path_factory):
    """A type that wins every pairing it HAS but was never compared
    against some other observed type must NOT be flagged Condorcet
    winner (the r8 ADVICE finding: the old n_wins == n_opponents test
    passed it).  t0 beats t1; t1 beats t2; t0 and t2 never co-occur —
    nobody beats all (n_types - 1) = 2 opponents, so no winner."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.preference import (
        condorcet_winner_audit,
    )

    day = datetime.datetime(2024, 1, 1, 9)
    data = [
        (0, day, 1, "t0", 2.0, None),
        (1, day, 1, "t1", 1.0, None),
        (2, day, 2, "t1", 2.0, None),
        (3, day, 2, "t2", 1.0, None),
    ]
    out = tmp_path_factory.mktemp("condorcet_field")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (r["n_majority_wins"], r["is_condorcet_winner"])
        for r in condorcet_winner_audit(spark, str(out)).collect()
    }
    assert got == {"t0": (1, False), "t1": (1, False), "t2": (0, False)}


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),    # user
            st.integers(0, 1),    # day
            st.integers(0, 3),    # type
            st.integers(-200, 200),  # value decicents
        ),
        min_size=2,
        max_size=50,
    )
)
def test_bradley_terry_matches_python_reference(
    spark, rows, tmp_path_factory
):
    """The 3-round unrolled Bradley-Terry MM chain must match a direct
    Python implementation with the identical rounding discipline
    (HALF_UP at 9 decimals on the exact binary double, DECIMAL sums) —
    pins both the comparison construction and the fixed-point
    trajectory."""
    import datetime
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from pinterest_data_pipeline6_spark.operators.preference import (
        BT_PSEUDO,
        BT_ROUNDS,
        bradley_terry_strengths,
    )

    data = [
        (
            i,
            datetime.datetime(2024, 1, 1 + d, 9),
            u,
            f"t{t}",
            v / 10.0,
            None,
        )
        for i, (u, d, t, v) in enumerate(rows)
    ]
    out = tmp_path_factory.mktemp("bt_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (r["n_wins"], r["n_comparisons"], r["strength"])
        for r in bradley_terry_strengths(spark, str(out)).collect()
    }

    def r9(x: float) -> float:
        return float(
            Decimal(x).quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP)
        )

    # comparison construction
    cents: dict = defaultdict(int)
    for u, d, t, v in rows:
        # Spark ROUND(value*100) on the double v/10*100
        c = float(
            Decimal((v / 10.0) * 100).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        cents[(u, d, f"t{t}")] += int(c)
    wins: dict = defaultdict(int)
    seen_ud = defaultdict(set)
    for (u, d, t), _ in cents.items():
        seen_ud[(u, d)].add(t)
    for (u, d), types in seen_ud.items():
        ts_sorted = sorted(types)
        for ii, ta in enumerate(ts_sorted):
            for tb in ts_sorted[ii + 1:]:
                ca, cb = cents[(u, d, ta)], cents[(u, d, tb)]
                if ca > cb:
                    wins[(ta, tb)] += 1
                elif cb > ca:
                    wins[(tb, ta)] += 1
    if not wins:
        assert got == {}
        return
    n_ij: dict = defaultdict(int)
    for (i, j), w in wins.items():
        n_ij[(i, j)] += w
        n_ij[(j, i)] += w
    types = sorted({t for pair in n_ij for t in pair})
    W = {t: sum(w for (i, j), w in wins.items() if i == t) for t in types}
    N = {t: sum(n for (i, j), n in n_ij.items() if i == t) for t in types}
    p = {t: 1.0 for t in types}
    for _ in range(BT_ROUNDS):
        raw = {}
        for t in types:
            denom = sum(
                Decimal(str(r9(n_ij[(t, j)] / (p[t] + p[j]))))
                for j in types
                if (t, j) in n_ij
            )
            raw[t] = r9((W[t] + BT_PSEUDO) / float(denom))
        tot = float(sum(Decimal(str(raw[t])) for t in types))
        p = {t: r9(raw[t] / tot) for t in types}

    for t in types:
        assert got[t][0] == W[t], t
        assert got[t][1] == N[t], t
        assert got[t][2] == pytest.approx(round(p[t], 6), abs=2e-6), t


def test_kcore_peeling_matches_brute_force(spark):
    """The unrolled 3-round k-core peel must match a direct Python peel
    over the same contracted edge set at sf0.001."""
    from pinterest_data_pipeline6_spark.operators.graph import (
        KCORE_K,
        KCORE_ROUNDS,
        _contracted_edges,
        kcore_peeling_rounds,
    )

    sf = "/root/testdata/sf0.001"
    edges = {
        (r.a, r.b) for r in _contracted_edges(spark, sf).collect()
    }
    got = {
        r["round"]: (r["n_nodes"], r["n_edges"], r["n_peeled"])
        for r in kcore_peeling_rounds(spark, sf).collect()
    }

    nodes = {n for e in edges for n in e}
    cur = set(edges)
    prev_n = len(nodes)
    assert got[0] == (len(nodes), len(edges), 0)
    for r in range(1, KCORE_ROUNDS + 1):
        deg: dict = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= KCORE_K}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
        assert got[r] == (len(keep), len(cur), prev_n - len(keep)), r
        prev_n = len(keep)


def test_kmv_estimate_matches_hashlib_reference(spark):
    """The KMV order statistic and estimate must match a driver-side
    hashlib computation over the same distinct users at sf0.001."""
    import hashlib
    from collections import defaultdict

    from pinterest_data_pipeline6_spark.operators.sketches import (
        KMV_K,
        kmv_distinct_estimate,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_type", "user_id"
    ).where("event_type is not null and user_id is not null").distinct()
    users = defaultdict(set)
    for r in ev.collect():
        users[r.event_type].add(r.user_id)

    got = {
        r["event_type"]: (r["n_distinct"], r["kmv_estimate"])
        for r in kmv_distinct_estimate(spark, sf).collect()
    }
    for t, us in users.items():
        hashes = sorted(
            int(hashlib.md5(f"kmv|{u}".encode()).hexdigest()[:15], 16)
            for u in us
        )
        n = len(us)
        if n < KMV_K:
            est = float(n)
        else:
            est = (KMV_K - 1) * float(1 << 60) / hashes[KMV_K - 1]
        assert got[t] == (n, pytest.approx(round(est, 2), abs=1e-6)), t


def test_temporal_split_audit_matches_brute_force(spark):
    """Cutoff pick, side volumes and user-overlap must match a direct
    Python split at sf0.001."""
    import math
    from collections import defaultdict

    from pinterest_data_pipeline6_spark.operators.events import (
        SPLIT_TRAIN_PCT,
        temporal_split_audit,
    )

    sf = "/root/testdata/sf0.001"
    rows = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr("event_type", "user_id", "cast(ts as date) as day")
        .where("ts is not null and user_id is not null "
               "and event_type is not null")
        .collect()
    )
    days = sorted({r.day for r in rows})
    cutoff = days[math.ceil(len(days) * SPLIT_TRAIN_PCT / 100) - 1]
    agg = defaultdict(lambda: [0, 0, set(), set()])
    for r in rows:
        a = agg[r.event_type]
        if r.day <= cutoff:
            a[0] += 1
            a[2].add(r.user_id)
        else:
            a[1] += 1
            a[3].add(r.user_id)
    got = {
        r["event_type"]: (
            r["n_train_events"], r["n_test_events"], r["n_train_users"],
            r["n_test_users"], r["n_overlap_users"],
        )
        for r in temporal_split_audit(spark, sf).collect()
    }
    for t, (ntr, nte, utr, ute) in agg.items():
        assert got[t] == (ntr, nte, len(utr), len(ute), len(utr & ute)), t


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),      # user
            st.integers(0, 1),      # day
            st.integers(0, 2),      # type
            st.integers(-50, 50),   # value decicents
        ),
        min_size=2,
        max_size=40,
    )
)
def test_preference_family_matches_brute_force(spark, rows, tmp_path_factory):
    """pairwise_preference_matrix, dpo_pair_sampling_weights and
    preference_agreement_rate must match one shared Python brute force
    over the same derived comparisons (win/tie counting, chosen/
    rejected extraction, per-user majority votes)."""
    import datetime
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    from pinterest_data_pipeline6_spark.operators.preference import (
        dpo_pair_sampling_weights,
        pairwise_preference_matrix,
        preference_agreement_rate,
    )

    data = [
        (i, datetime.datetime(2024, 1, 1 + d, 9), u, f"t{t}", v / 10.0, None)
        for i, (u, d, t, v) in enumerate(rows)
    ]
    out = tmp_path_factory.mktemp("pref_fam")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    # shared comparison construction
    cents: dict = defaultdict(int)
    for u, d, t, v in rows:
        c = int(
            Decimal((v / 10.0) * 100).quantize(
                Decimal("1"), rounding=ROUND_HALF_UP
            )
        )
        cents[(u, d, f"t{t}")] += c
    ud_types = defaultdict(set)
    for (u, d, t) in cents:
        ud_types[(u, d)].add(t)
    comps = []  # (user, type_a, type_b, ca, cb)
    for (u, d), types in ud_types.items():
        ts_sorted = sorted(types)
        for i, a in enumerate(ts_sorted):
            for b in ts_sorted[i + 1:]:
                comps.append((u, a, b, cents[(u, d, a)], cents[(u, d, b)]))

    # 1. matrix
    got_m = {
        (r["type_a"], r["type_b"]): (
            r["n_comparisons"], r["wins_a"], r["wins_b"], r["ties"]
        )
        for r in pairwise_preference_matrix(spark, str(out)).collect()
    }
    want_m: dict = defaultdict(lambda: [0, 0, 0, 0])
    for _, a, b, ca, cb in comps:
        w = want_m[(a, b)]
        w[0] += 1
        w[1] += ca > cb
        w[2] += ca < cb
        w[3] += ca == cb
    assert got_m == {k: tuple(v) for k, v in want_m.items()}

    # 2. dpo pairs
    got_d = {
        (r["chosen"], r["rejected"]): r["n_pairs"]
        for r in dpo_pair_sampling_weights(spark, str(out)).collect()
    }
    want_d: dict = defaultdict(int)
    for _, a, b, ca, cb in comps:
        if ca != cb:
            want_d[(a, b) if ca > cb else (b, a)] += 1
    assert got_d == dict(want_d)

    # 3. agreement
    got_a = {
        (r["type_a"], r["type_b"]): (r["n_raters"], r["agreement_rate"])
        for r in preference_agreement_rate(spark, str(out)).collect()
    }
    votes: dict = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for u, a, b, ca, cb in comps:
        v = votes[(a, b)][u]
        v[0] += ca > cb
        v[1] += ca < cb
    for pair, users in votes.items():
        tally: dict = defaultdict(int)
        for u, (wa, wb) in users.items():
            tally["a" if wa > wb else "b" if wb > wa else "tie"] += 1
        n = sum(tally.values())
        agree = (
            round(
                sum(c * (c - 1) for c in tally.values()) / (n * (n - 1)), 6
            )
            if n > 1
            else None
        )
        got_n, got_rate = got_a[pair]
        assert got_n == n, pair
        if agree is None:
            assert got_rate is None, pair
        else:
            assert got_rate == pytest.approx(agree, abs=1e-9), pair


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 1),  # source
            st.lists(st.integers(0, 2), min_size=1, max_size=30),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_source_boilerplate_removal_matches_brute_force(
    spark, docs, tmp_path_factory
):
    """boilerplate_para_removal_by_source must match a direct Python
    within-source df>=threshold removal over the same 12-token
    chunks."""
    from pinterest_data_pipeline6_spark.operators.dedup import (
        PARA_BOILER_MIN_DOCS,
        PARA_TOKENS,
        boilerplate_para_removal_by_source,
    )

    rows = [
        (i, " ".join(f"w{t}" for t in toks), "en", f"s{s}", 0)
        for i, (s, toks) in enumerate(docs)
    ]
    out = tmp_path_factory.mktemp("boiler_prop")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = {
        r["source"]: (r["n_docs"], r["n_paras"], r["n_removed"],
                      r["tokens_removed"], r["tokens_kept"])
        for r in boilerplate_para_removal_by_source(
            spark, str(out)
        ).collect()
    }

    from collections import defaultdict

    occs = defaultdict(list)   # source -> [(doc_id, chunk, p_tok)]
    df = defaultdict(set)      # (source, chunk) -> doc ids
    for doc_id, text, _, src, _ in rows:
        toks = text.split(" ")
        n_chunks = (len(toks) - 1) // PARA_TOKENS + 1
        for i in range(n_chunks):
            chunk = " ".join(toks[i * PARA_TOKENS:(i + 1) * PARA_TOKENS])
            occs[src].append((doc_id, chunk, len(chunk.split(" "))))
            df[(src, chunk)].add(doc_id)
    for src, lst in occs.items():
        n_docs = len({d for d, _, _ in lst})
        n_paras = len(lst)
        rm = kept = n_removed = 0
        for d, chunk, p_tok in lst:
            if len(df[(src, chunk)]) >= PARA_BOILER_MIN_DOCS:
                n_removed += 1
                rm += p_tok
            else:
                kept += p_tok
        assert got[src] == (n_docs, n_paras, n_removed, rm, kept), src


# ---------------------------------------------------------------------------
# Round 9: property tests for the perceptual-hash / fingerprint /
# classifier / HLL / masking families — each pinned against a direct
# Python reference over hypothesis-generated corpora.


def _doc_parquet(spark, tmp_path_factory, texts, tag):
    rows = [
        (i, t, f"l{i % 2}", f"s{i % 3}", len(t)) for i, t in enumerate(texts)
    ]
    out = tmp_path_factory.mktemp(tag)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))
    return str(out), rows


def _ahash_py(payload: bytes) -> int:
    cells = [payload[(j * len(payload)) // 32] for j in range(32)]
    total = sum(cells)
    return sum(1 << j for j, c in enumerate(cells) if c * 32 > total)


def _dhash_py(payload: bytes) -> int:
    cells = [payload[(j * len(payload)) // 36] for j in range(36)]
    bits, k = 0, 0
    for i in range(35):
        if i % 9 == 8:
            continue
        if cells[i] > cells[i + 1]:
            bits |= 1 << k
        k += 1
    return bits


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=80,
        ),
        min_size=1,
        max_size=12,
    )
)
@example(texts=["a", "zz", "the same text", "the same text"])
def test_perceptual_hashes_match_python_reference(
    spark, texts, tmp_path_factory
):
    """aHash (strided 32-cell mean threshold) and dHash (4x9 grid
    within-row comparisons) must equal a byte-level Python reference
    for every payload — pins the hex-substring cell reads, the integer
    mean comparison, and the bit packing."""
    from pinterest_data_pipeline6_spark.operators.multimodal import (
        _perceptual_hashes,
    )

    out, rows = _doc_parquet(spark, tmp_path_factory, texts, "phash_prop")
    got = {
        r["media_id"]: (r["ahash"], r["dhash"])
        for r in _perceptual_hashes(spark, out).collect()
    }
    for doc_id, t, *_ in rows:
        payload = t.encode()
        assert got[doc_id] == (_ahash_py(payload), _dhash_py(payload)), t


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=60,
        ),
        min_size=1,
        max_size=10,
    )
)
@example(texts=["abc", "abcdefgh" * 8, "abcdefgh" * 8])
def test_media_fingerprints_match_python_reference(
    spark, texts, tmp_path_factory
):
    """Byte-window min-gram-hash fingerprints must equal a Python
    reference: gram hash = portable 60-bit md5 of the UPPERCASE hex of
    4 payload bytes, window = disjoint 8-gram blocks, fingerprint =
    window min (payloads under 4 bytes produce none)."""
    from pinterest_data_pipeline6_spark.operators.multimodal import (
        FP_GRAM_BYTES,
        FP_WINDOW,
        _media_fingerprints,
    )

    out, rows = _doc_parquet(spark, tmp_path_factory, texts, "fp_prop")
    got = {}
    for r in _media_fingerprints(spark, out).collect():
        got.setdefault(r["media_id"], {})[r["w"]] = r["fp"]

    for doc_id, t, *_ in rows:
        p = t.encode()
        want: dict[int, int] = {}
        if len(p) >= FP_GRAM_BYTES:
            hx = p.hex().upper()
            for g in range(len(p) - FP_GRAM_BYTES + 1):
                gh = _h64_py(hx[g * 2 : g * 2 + 2 * FP_GRAM_BYTES])
                w = g // FP_WINDOW
                want[w] = min(want.get(w, gh), gh)
        assert got.get(doc_id, {}) == want, t


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=6),
            min_size=1,
            max_size=20,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_quality_classifier_matches_python_reference(
    spark, texts, tmp_path_factory
):
    """The hashed-feature classifier's per-document integer state
    (token count, milli-weight sum) must equal a direct Python
    hash-and-sum — pins the bucket hash, the literal weight array, and
    the exactness of the aggregate."""
    from pinterest_data_pipeline6_spark.operators.scoring import (
        QC_BUCKETS,
        QC_WEIGHTS_MILLI,
        _doc_scores,
    )

    out, rows = _doc_parquet(spark, tmp_path_factory, texts, "qc_prop")
    got = {
        r["doc_id"]: (r["n_tok"], r["total_milli"])
        for r in _doc_scores(spark, out).collect()
    }
    for doc_id, t, *_ in rows:
        toks = t.split(" ")
        total = sum(
            QC_WEIGHTS_MILLI[_h64_py(tok) % QC_BUCKETS] for tok in toks
        )
        assert got[doc_id] == (len(toks), total), t


@settings(max_examples=6, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)),  # (type, user)
        min_size=1,
        max_size=120,
    )
)
def test_hll_registers_match_python_reference(
    spark, events, tmp_path_factory
):
    """HLL register table and estimate must match a Python reference:
    bucket = h % 64, rho = 55 - bitlength(h // 64) (55 when the
    remainder is 0), registers = per-bucket max, estimate =
    numerator / exact integer harmonic sum.  Duplicates must be
    absorbed by the register max."""
    import datetime

    from pinterest_data_pipeline6_spark.operators.sketches import (
        HLL_M,
        _HLL_NUMERATOR,
        _HLL_WBITS,
        hll_register_estimate,
    )

    data = [
        (i, datetime.datetime(2024, 1, 1, 9), u, f"t{ty}", 1.0, None)
        for i, (ty, u) in enumerate(events)
    ]
    out = tmp_path_factory.mktemp("hll_prop")
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    got = {
        r["event_type"]: (
            r["n_distinct"],
            r["n_registers_used"],
            r["n_zero_registers"],
            r["hll_estimate"],
        )
        for r in hll_register_estimate(spark, str(out)).collect()
    }

    per_type: dict[str, dict[int, int]] = {}
    truth: dict[str, set] = {}
    for ty, u in events:
        t = f"t{ty}"
        h = _h64_py(f"hll|{u}")
        b, w = h % HLL_M, h // HLL_M
        rho = (_HLL_WBITS + 1) - (w.bit_length() if w else 0)
        regs = per_type.setdefault(t, {})
        regs[b] = max(regs.get(b, 0), rho)
        truth.setdefault(t, set()).add(u)
    for t, regs in per_type.items():
        s = sum(1 << (_HLL_WBITS + 1 - m) for m in regs.values())
        s += (HLL_M - len(regs)) * (1 << (_HLL_WBITS + 1))
        est = _HLL_NUMERATOR / s
        nd, used, zeros, got_est = got[t]
        assert (nd, used, zeros) == (
            len(truth[t]),
            len(regs),
            HLL_M - len(regs),
        ), t
        assert abs(got_est - est) < 0.02, (t, got_est, est)


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="mn", min_size=1, max_size=3),
            min_size=1,
            max_size=30,
        ).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_span_corruption_matches_python_reference(
    spark, texts, tmp_path_factory
):
    """Span-corruption accounting must equal a Python scan: token i
    masked iff h64('mask|doc:i') % 100 < 15, spans = maximal masked
    runs — pins the windowless two-hash span-start trick."""
    from pinterest_data_pipeline6_spark.operators.curation import (
        SPAN_MASK_PCT,
        span_corruption_masks,
    )

    out, rows = _doc_parquet(spark, tmp_path_factory, texts, "span_prop")
    got = {
        r["lang"]: (r["n_tokens"], r["n_masked"], r["n_spans"])
        for r in span_corruption_masks(spark, out).collect()
    }
    want: dict[str, list] = {}
    for doc_id, t, *_ in rows:
        lang = f"l{doc_id % 2}"
        w = want.setdefault(lang, [0, 0, 0])
        prev = False
        for i in range(len(t.split(" "))):
            m = _h64_py(f"mask|{doc_id}:{i}") % 100 < SPAN_MASK_PCT
            w[0] += 1
            w[1] += m
            w[2] += m and not prev
            prev = m
    for lang, (nt, nm, ns) in want.items():
        assert got[lang] == (nt, nm, ns), lang


def test_hll_w_uses_exact_integer_division(spark):
    """Regression pin for the r9 ADVICE finding: the HLL register
    remainder must be the exact integer h // 64, not
    floor(h / 64.0).  For 60-bit hashes past 2^53 the double
    division rounds away low bits — e.g. h = 2^59 - 1 has exact
    w = 2^53 - 1 (bit_length 53) but floor(float(h)/64) = 2^53
    (bit_length 54), flipping rho by 1 vs the DuckDB oracle's //.
    shiftright(h, 6) must match // for every adversarial h, and
    the old floor form must demonstrably diverge on at least one."""
    adversarial = [
        (1 << 59) - 1,
        (1 << 58) - 1,
        (1 << 57) - 1,
        (1 << 54) + 63,
        (1 << 53) - 1,  # below the double cliff: both forms agree
        12345678901234567,
    ]
    df = spark.createDataFrame([(h,) for h in adversarial], "h long")
    rows = df.selectExpr(
        "h",
        "shiftright(h, 6) AS w_shift",
        "CAST(floor(h / 64) AS LONG) AS w_floor",
    ).collect()
    diverged = 0
    for r in rows:
        exact = r["h"] >> 6
        assert r["w_shift"] == exact, (r["h"], r["w_shift"], exact)
        if r["w_floor"] != exact:
            diverged += 1
    assert diverged >= 1, "expected floor(h/64) to diverge on >=1 case"

    # and the shipped queries must use the exact form
    import inspect

    from pinterest_data_pipeline6_spark.operators import sketches

    for fn in (sketches.hll_register_estimate, sketches.hll_union_merge_audit):
        src = inspect.getsource(fn)
        assert "shiftright(h, 6)" in src, fn.__name__
        assert "floor(h / HLL_M)" not in src, fn.__name__


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=10),
            min_size=1,
            max_size=25,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    )
)
def test_unigram_lm_matches_python_em_reference(
    spark, texts, tmp_path_factory
):
    """The unigram-LM trainer, fertility and compression curve must
    match a plain-Python Viterbi-EM reference: seed counts = weighted
    substrings <= 4 chars; costs = round(1000*ln(total)) -
    round(1000*ln(cnt)) in integer milli-nats (round = half-up);
    Viterbi = min total cost, ties to the lexicographically smallest
    segmentation; M-step = Viterbi usage + add-one on single-char seed
    pieces.  Words up to 10 chars exercise DP lengths past the
    fixtures' max of 8."""
    import math
    from collections import Counter

    from pinterest_data_pipeline6_spark.operators.textops import (
        UNI_EM_ROUNDS,
        UNI_MAX_PIECE,
        unigram_compression_curve,
        unigram_lm_train,
        unigram_viterbi_fertility,
    )

    INV = 10**12

    def _r(v):
        return math.floor(v + 0.5)

    words: Counter = Counter()
    langs = ["de", "en", "fr"]
    by_lang: dict[str, Counter] = {}
    for i, t in enumerate(texts):
        lang = langs[i % 3]
        for w in t.split(" "):
            if w:
                words[w] += 1
                by_lang.setdefault(lang, Counter())[w] += 1

    seed: Counter = Counter()
    for w, f in words.items():
        n = len(w)
        for p in range(n):
            for ln in range(1, min(UNI_MAX_PIECE, n - p) + 1):
                seed[w[p : p + ln]] += f

    def costs(cnt):
        t = _r(1000 * math.log(sum(cnt.values())))
        return {p: t - _r(1000 * math.log(v)) for p, v in cnt.items()}

    def viterbi(w, cost):
        n = len(w)
        dp = [(0, "")] + [None] * n
        for j in range(1, n + 1):
            best = None
            for ln in range(1, min(UNI_MAX_PIECE, j) + 1):
                prev = dp[j - ln]
                piece = w[j - ln : j]
                cand = (prev[0] + cost.get(piece, INV), prev[1] + "|" + piece)
                if best is None or cand < best:
                    best = cand
            dp[j] = best
        return dp[n]

    counts, vits = [seed], []
    for _ in range(UNI_EM_ROUNDS):
        cost = costs(counts[-1])
        segs = {w: viterbi(w, cost)[1] for w in words}
        vits.append(segs)
        nxt: Counter = Counter()
        for w, f in words.items():
            for piece in segs[w].split("|"):
                if piece:
                    nxt[piece] += f
        for p in seed:
            if len(p) == 1:
                nxt[p] += 1
        counts.append(nxt)
    cost = costs(counts[-1])
    vits.append({w: viterbi(w, cost)[1] for w in words})

    out = tmp_path_factory.mktemp("uni_prop")
    rows = [
        (i, t, langs[i % 3], "s0", len(t)) for i, t in enumerate(texts)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got_train = {
        r["round"]: (
            r["n_pieces"], r["n_multi_pieces"], r["total_count"],
            r["top_piece"], r["top_count"],
        )
        for r in unigram_lm_train(spark, str(out)).collect()
    }
    for r, cnt in enumerate(counts):
        top = min((-v, p) for p, v in cnt.items())
        assert got_train[r] == (
            len(cnt),
            sum(1 for p in cnt if len(p) > 1),
            sum(cnt.values()),
            top[1],
            -top[0],
        ), r

    npieces = {w: s.count("|") for w, s in vits[-1].items()}
    got_fert = {
        r["lang"]: (r["n_words"], r["total_pieces"])
        for r in unigram_viterbi_fertility(spark, str(out)).collect()
    }
    for lang, wl in by_lang.items():
        assert got_fert[lang] == (
            sum(wl.values()),
            sum(f * npieces[w] for w, f in wl.items()),
        ), lang

    got_curve = {
        r["round"]: r["total_pieces"]
        for r in unigram_compression_curve(spark, str(out)).collect()
    }
    for r, segs in enumerate(vits):
        assert got_curve[r] == sum(
            f * segs[w].count("|") for w, f in words.items()
        ), r


def test_data_decay_schedule_matches_closed_form():
    """The repetition-discount literals must be the quantized geometric
    schedule: W_MILLI[k] = round(1000 * DECAY^k), S_MILLI[k] the exact
    prefix sum, and S_MILLI[k]/1000 within one quantization step per
    term of the closed-form geometric sum (1 - d^k) / (1 - d)."""
    from pinterest_data_pipeline6_spark.operators.curation import (
        DATA_DECAY,
        EPOCH_CAP,
        S_MILLI,
        W_MILLI,
    )

    assert len(W_MILLI) == EPOCH_CAP + 1
    assert len(S_MILLI) == EPOCH_CAP + 1
    assert S_MILLI[0] == 0
    for k in range(EPOCH_CAP + 1):
        assert W_MILLI[k] == round(1000 * DATA_DECAY**k), k
        if k:
            assert S_MILLI[k] == S_MILLI[k - 1] + W_MILLI[k - 1], k
        closed = (1 - DATA_DECAY**k) / (1 - DATA_DECAY)
        assert abs(S_MILLI[k] / 1000 - closed) <= k * 0.0005 + 1e-9, k
    # monotone value, diminishing marginals
    assert all(a > b for a, b in zip(W_MILLI, W_MILLI[1:]))


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(1, 40),     # tokens per doc
            st.integers(50, 500),   # n_chars
        ),
        min_size=1,
        max_size=30,
    )
)
def test_data_constrained_accounting_matches_python(
    spark, docs, tmp_path_factory
):
    """Effective-token accounting must equal a Python computation:
    decay curve eff(e) = U * S_MILLI[e] // 1000, and the trade-off's
    budget split (full epochs at S, remainder at the next W) for each
    n_chars threshold."""
    from pinterest_data_pipeline6_spark.operators.curation import (
        BUDGET_MULT,
        DECAY_CURVE_EPOCHS,
        EPOCH_CAP,
        S_MILLI,
        TRADEOFF_MIN_CHARS,
        W_MILLI,
        data_constrained_tradeoff,
        epoch_token_value_decay,
    )

    rows = [
        (i, " ".join(f"t{j}" for j in range(nt)), "en", "s0", nc)
        for i, (nt, nc) in enumerate(docs)
    ]
    out = tmp_path_factory.mktemp("dc_prop")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    u_full = sum(nt for nt, _ in docs)
    got = {
        r["epochs"]: (r["raw_tokens"], r["effective_tokens"], r["marginal_tokens"])
        for r in epoch_token_value_decay(spark, str(out)).collect()
    }
    for e in range(1, DECAY_CURVE_EPOCHS + 1):
        assert got[e] == (
            u_full * e,
            u_full * S_MILLI[e] // 1000,
            u_full * W_MILLI[e - 1] // 1000,
        ), e

    budget = BUDGET_MULT * u_full
    got_t = {
        r["min_chars"]: (
            r["n_docs"], r["unique_tokens"], r["epochs"], r["effective_tokens"]
        )
        for r in data_constrained_tradeoff(spark, str(out)).collect()
    }
    for t in TRADEOFF_MIN_CHARS:
        kept = [(nt, nc) for nt, nc in docs if nc >= t]
        u = sum(nt for nt, _ in kept)
        if u == 0:
            assert t not in got_t
            continue
        e = min(budget // u, EPOCH_CAP)
        eff = (u * S_MILLI[e] + (budget - e * u) * W_MILLI[e]) // 1000
        assert got_t[t] == (len(kept), u, e, eff), t


def test_nsw_beam_search_invariants(spark):
    """Beam search can never beat the exact scan: per query,
    approx_best_cos <= exact_best_cos, 0 <= recall <= 1, hits <= 10,
    and the visited set is at least the final beam's size."""
    from pinterest_data_pipeline6_spark.operators.similarity import (
        NSW_BEAM,
        TOP_K,
        nsw_beam_search_recall,
    )

    rows = nsw_beam_search_recall(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    for r in rows:
        assert r["approx_best_cos"] <= r["exact_best_cos"], r
        assert 0 <= r["n_hits"] <= TOP_K, r
        assert abs(r["recall_at_k"] - r["n_hits"] / TOP_K) < 1e-9, r
        assert r["n_scored"] >= NSW_BEAM, r


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=7),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=10,
    )
)
@example(docs=[["aaaaa", "aaaaaa", "ab"], ["abab", "aabb", "bb"]])
def test_wordpiece_merges_match_likelihood_reference(
    spark, docs, tmp_path_factory
):
    """The 3-round WordPiece chain must match a Python reference with
    the likelihood score count(l,r)/(count(l)*count(r)): weighted pair
    AND symbol counts, argmax with (score desc, pair asc) tie-break
    (score compared as the exact Fraction — the engines' single
    correctly-rounded double division must never flip an order the
    rational comparison decides), greedy single-scan apply."""
    from fractions import Fraction

    from pinterest_data_pipeline6_spark.operators.textops import (
        BPE_MERGE_ROUNDS,
        wordpiece_iterative_merges,
    )

    rows = [
        (i, " ".join(words), "en", "s0", 0) for i, words in enumerate(docs)
    ]
    out = tmp_path_factory.mktemp("wp_prop")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    got = [
        (
            r["round"], r["left_sym"], r["right_sym"],
            r["pair_count"], r["left_count"], r["right_count"],
        )
        for r in wordpiece_iterative_merges(spark, str(out)).collect()
    ]

    from collections import Counter

    vocab = Counter()
    for words in docs:
        for w in words:
            vocab[tuple(w)] += 1

    want = []
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        pair_counts: Counter = Counter()
        sym_counts: Counter = Counter()
        for syms, freq in vocab.items():
            for s in syms:
                sym_counts[s] += freq
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += freq
        if not pair_counts:
            break
        best = min(
            pair_counts.items(),
            key=lambda kv: (
                -Fraction(kv[1], sym_counts[kv[0][0]] * sym_counts[kv[0][1]]),
                kv[0],
            ),
        )
        (l, r), cnt = best
        want.append((rnd, l, r, cnt, sym_counts[l], sym_counts[r]))
        new_vocab: Counter = Counter()
        for syms, freq in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] += freq
        vocab = new_vocab

    assert got[: len(want)] == want


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(1, 25),   # tokens
            st.integers(0, 3),    # source index
        ),
        min_size=2,
        max_size=30,
    )
)
def test_doremi_reweighting_matches_python(spark, docs, tmp_path_factory):
    """The DoReMi update must equal a Python computation: per-source
    token share, per-token classifier score vs corpus mean (both
    rounded to 9 before the clipped excess), weights share*exp(excess/
    1000) normalized — all to the 6-decimal output tolerance."""
    import math

    from pinterest_data_pipeline6_spark.operators.scoring import (
        QC_BUCKETS,
        QC_WEIGHTS_MILLI,
    )
    from pinterest_data_pipeline6_spark.operators.curation import (
        DOREMI_ETA,
        doremi_domain_reweighting,
    )

    rows = [
        (i, " ".join(f"w{i}t{j}" for j in range(nt)), "en", f"src{s}", 0)
        for i, (nt, s) in enumerate(docs)
    ]
    out = tmp_path_factory.mktemp("doremi_prop")
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(out / "documents.parquet"))

    per_src: dict[str, list[int]] = {}
    for i, (nt, s) in enumerate(docs):
        toks = [f"w{i}t{j}" for j in range(nt)]
        milli = sum(
            QC_WEIGHTS_MILLI[_h64_py(t) % QC_BUCKETS] for t in toks
        )
        d = per_src.setdefault(f"src{s}", [0, 0, 0])
        d[0] += 1
        d[1] += nt
        d[2] += milli
    g_tok = sum(v[1] for v in per_src.values())
    g_milli = sum(v[2] for v in per_src.values())
    mean_g = round(g_milli / g_tok, 9)
    raw = {
        s: (v[1] / g_tok)
        * math.exp(
            DOREMI_ETA * max(mean_g - round(v[2] / v[1], 9), 0.0) / 1000.0
        )
        for s, v in per_src.items()
    }
    z = sum(raw.values())

    got = {
        r["source"]: (
            r["n_docs"], r["n_tokens"], r["token_share"], r["new_weight"]
        )
        for r in doremi_domain_reweighting(spark, str(out)).collect()
    }
    assert set(got) == set(per_src)
    for s, v in per_src.items():
        nd, ntk, share, w = got[s]
        assert (nd, ntk) == (v[0], v[1]), s
        assert abs(share - round(v[1] / g_tok, 6)) < 1e-9, s
        assert abs(w - raw[s] / z) < 2e-6, s
