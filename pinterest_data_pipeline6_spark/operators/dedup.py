"""Deduplication operator family over ``documents`` / ``embeddings``:
exact, MinHash+LSH banding, SimHash, n-gram Jaccard, embedding-cosine.

These are the dedup primitives of a web-scale training-data pipeline,
expressed Spark-first:

- **exact**: hash-groupBy on normalized text — one shuffle, the shuffle
  carries 16-byte digests, not documents;
- **MinHash+LSH**: shingle → m=16 portable hashes → per-doc min
  signature (ONE shuffle: partial+final min agg) → 4 bands x 4 rows →
  band-key self-equijoin. At 100 TB the band join is the only pairwise
  step and it only ever compares docs that share a band bucket — never
  O(n²);
- **SimHash**: per-token 60-bit hash, 32 signed bit-votes aggregated per
  doc (partial+final sum agg), sign → 32-bit fingerprint. Hamming-ball
  lookups then run on the compact fingerprint table;
- **n-gram Jaccard**: exact verification on candidate blocks
  ((lang, size-bucket) blocking here; band buckets in a full pipeline) —
  the expensive exact measure runs only inside blocks;
- **embedding cosine**: same-label blocked pairs, double-precision
  left-fold dot product (bit-identical in DuckDB — see oracle).

Every hash is the portable ``md5-hex → bigint`` primitive shared with
the DuckDB oracles, so candidate pairs match across engines exactly.
All heavy lifting is Catalyst-native (higher-order functions + hash
aggregates + equijoins); no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pinterest_data_pipeline6_spark.operators.textops import H64_SQL, _h64_spark
from pinterest_data_pipeline6_spark.sources.readers import table, widen_small_scan

N_MINHASH = 16
N_BANDS = 4
ROWS_PER_BAND = N_MINHASH // N_BANDS
SIMHASH_BITS = 32
JACCARD_THRESHOLD = 0.2
COSINE_FLAG = 0.3


def _shingles(toks: Column) -> Column:
    """Distinct word 3-gram shingles (guarded for < 3 tokens)."""
    return F.array_distinct(
        F.when(
            F.size(toks) >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 3)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    )


def _exploded_shingles(docs: DataFrame, *keep: str, n: int = 3) -> DataFrame:
    """(keep..., shingle) with one row per word n-gram occurrence — the
    codegen formulation of shingling: explode the START INDEX first,
    then build each shingle with slice+concat_ws in a plain projection.
    A transform() lambda evaluates interpreted per element; this shape
    stays inside whole-stage codegen end-to-end, which is the difference
    between saturating cores and idling them when shingling 100 TB.
    Duplicate shingles are preserved (callers that need set semantics
    de-duplicate on their own key)."""
    toks = F.split(F.col("text"), " ")
    return (
        docs.select(*keep, toks.alias("toks"))
        .filter(F.size("toks") >= n)
        .select(
            *keep,
            "toks",
            F.explode(F.sequence(F.lit(1), F.size("toks") - (n - 1))).alias("i"),
        )
        .select(*keep, F.concat_ws(" ", F.slice("toks", F.col("i"), n)).alias("shingle"))
    )


_SHINGLES_SQL = """list_distinct(list_transform(
    generate_series(1, len(string_split(text,' ')) - 2),
    i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))"""


def dedup_exact_text(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup accounting per source: md5 over normalized text.
    The distinct-count shuffle moves digests only."""
    docs = table(spark, sf, "documents")
    digest = F.md5(F.lower(F.trim(F.col("text"))))
    return (
        docs.select("source", digest.alias("digest"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("digest").alias("n_unique"),
        )
        .orderBy("source")
    )


# Universal-hash family over one base md5 per shingle: h_i = (A_i * (h mod P)
# + B_i) mod P with P = 2^31 - 1. A_i*(h mod P) < 2^5 * 2^31 < 2^63 — no
# overflow in either engine (DuckDB errors on bigint overflow, Spark wraps,
# so staying in range is a correctness requirement, not a nicety).
MINHASH_P = 2_147_483_647
_MINHASH_A = [2 * i + 3 for i in range(N_MINHASH)]   # 3,5,..,33 — all coprime with P
_MINHASH_B = [7919 * (i + 1) for i in range(N_MINHASH)]


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, m_0..m_15) MinHash signature table for any relation with
    (doc_id, text): one portable 64-bit base hash per shingle occurrence,
    the 16 permutations as overflow-safe arithmetic on it, ONE shuffle
    (partial+final min aggregate). Shared by the banding path below and
    the estimate-vs-exact error audit."""
    exploded = _exploded_shingles(docs, "doc_id")
    # emitted as expr text — one parser call per aggregate instead of
    # ~6 py4j Column builds each (construction-tax remedy, same trees)
    return (
        exploded.selectExpr(
            "doc_id",
            "CAST(conv(substring(md5(shingle), 1, 15), 16, 10) AS BIGINT)"
            f" % {MINHASH_P} AS hb",
        )
        .groupBy("doc_id")
        .agg(
            *[
                F.expr(
                    f"min((hb * {_MINHASH_A[i]} + {_MINHASH_B[i]})"
                    f" % {MINHASH_P}) AS m_{i}"
                )
                for i in range(N_MINHASH)
            ]
        )
    )


def band_keys_for(docs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_key) for any relation with (doc_id,
    text): the LSH bucket membership table — shared by the batch
    candidate-pair query below and the streaming near-dup suppression
    sink (streaming/jobs.py).

    Signature construction: ONE md5 per shingle (the 16 permutations
    are cheap arithmetic on it), one explode, one partial+final min
    aggregate. Shingles come from the codegen explode-index path
    WITHOUT de-duplication: MIN over a multiset equals MIN over its
    set, so signatures are unchanged while the array_distinct +
    interpreted-lambda pass disappears. Band keys are md5 digests over
    each band's 4-minhash row."""
    sig = minhash_signatures(docs)
    band_keys = "array(" + ", ".join(
        "md5(concat_ws(','"
        + "".join(
            f", m_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
        )
        + "))"
        for b in range(N_BANDS)
    ) + ")"
    return sig.select(
        "doc_id", F.posexplode(F.expr(band_keys)).alias("band_idx", "band_key")
    )


def minhash_band_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """LSH candidate pairs: docs agreeing on all 4 minhashes of any band.
    The self-join keys on (band_idx, band_key) — only bucket-mates are
    ever compared, which is what keeps this sub-O(n²) at scale."""
    banded = band_keys_for(widen_small_scan(table(spark, sf, "documents")))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


EDIT_PREFIX = 160  # chars of text compared per pair (bounds the O(n*m) DP)
EDIT_MAX = 40  # max edit distance to count a candidate as verified


def neardup_edit_verify(spark: SparkSession, sf: str) -> DataFrame:
    """Verification stage after LSH blocking: score every MinHash
    candidate pair with Levenshtein distance over a fixed-length text
    prefix and report how many candidates survive — the
    candidate-generation → cheap-verify two-phase every production
    near-dup pipeline runs (banding buys recall, verification buys
    precision).

    Scale shape: the candidate set is already sub-O(n²) (band-bucket
    equi-join); this stage adds two broadcast-or-shuffle hash joins to
    attach prefixes and a row-local DP per pair. The prefix cap bounds
    the per-pair cost at EDIT_PREFIX² cells regardless of document
    length — full-text edit distance on 100 KB docs would be 10^10
    cells/pair, which no engine should run."""
    pairs = minhash_band_pairs(spark, sf)
    prefixes = table(spark, sf, "documents").select(
        "doc_id", F.substring(F.col("text"), 1, EDIT_PREFIX).alias("prefix")
    )
    joined = (
        pairs.join(
            prefixes.select(
                F.col("doc_id").alias("doc_a"), F.col("prefix").alias("pref_a")
            ),
            "doc_a",
        )
        .join(
            prefixes.select(
                F.col("doc_id").alias("doc_b"), F.col("prefix").alias("pref_b")
            ),
            "doc_b",
        )
        .select(F.levenshtein(F.col("pref_a"), F.col("pref_b")).alias("dist"))
    )
    return joined.agg(
        F.count("*").alias("n_candidates"),
        F.sum((F.col("dist") <= EDIT_MAX).cast("int")).alias("n_verified"),
        F.round(F.avg("dist"), 4).alias("avg_dist"),
        F.min("dist").alias("min_dist"),
        F.max("dist").alias("max_dist"),
    )


def simhash_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """32-bit SimHash per document: per-token hash, signed bit votes
    (token multiplicity counts), sign of each vote sets the bit.

    The 32 vote aggregates and the 32-term bit sum are emitted as expr
    text — same parsed trees, one parser call per expression instead
    of ~8 py4j Column builds each (construction-tax remedy; A/B 0.94 →
    0.48 s at sf0.1, identical fingerprints). The bit-sum literals are
    ``L``-suffixed so the whole fold is bigint from the first term —
    the Column form relied on the j=31 term's long literal promoting
    the (by then int32-max) partial sum just in time."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    exploded = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    hashed = exploded.selectExpr(
        "doc_id",
        "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT) AS h",
    )
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.expr(f"sum(IF((shiftright(h, {j}) & 1) = 1, 1, -1)) AS v_{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    simhash = "CAST(" + " + ".join(
        f"IF(v_{j} > 0, {2 ** j}L, 0L)" for j in range(SIMHASH_BITS)
    ) + " AS BIGINT)"
    return votes.selectExpr("doc_id", f"{simhash} AS simhash")


SIMHASH_BANDS = 4  # 32-bit fingerprint → 4 bands of 8 bits
HAMMING_MAX = 6  # pairs this close in Hamming distance count as near-dups


def simhash_hamming_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash candidate generation + verification — the pairing stage
    the fingerprints exist for. Pigeonhole: a pair within Hamming
    distance 3 differs in at most 3 of the 4 byte-bands, so it MUST
    agree on at least one band — banding has perfect recall there, and
    catches any 4-6-bit pair whose flips cluster into <= 3 bands. The
    band-bucket equi-join keeps the candidate set sub-O(n²) exactly
    like MinHash banding; candidates are verified with bit_count(xor),
    one integer op per pair. Emits the funnel summary (candidates,
    verified-close, distance stats)."""
    sim = simhash_fingerprints(spark, sf)
    bands = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.lit(b) for b in range(SIMHASH_BANDS)])
        ).alias("band_idx"),
    ).select(
        "doc_id",
        "simhash",
        "band_idx",
        F.expr("(simhash >> (band_idx * 8)) & 255").alias("band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    scored = pairs.select(hamming.alias("hamming"))
    return scored.agg(
        F.count("*").alias("n_candidates"),
        F.sum((F.col("hamming") <= HAMMING_MAX).cast("int")).alias("n_close"),
        F.min("hamming").alias("min_hamming"),
        F.round(F.avg("hamming"), 4).alias("avg_hamming"),
    )


def ngram_jaccard_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-gram Jaccard over blocked candidate pairs
    ((lang, n_chars DIV 100) blocking); emits pairs >= 0.2.

    Scalable inverted-index formulation: explode (doc, shingle-hash),
    equi-join on the shingle hash within blocks, count matches per pair
    → |A ∩ B|; then jaccard = inter / (|A| + |B| - inter). Pairs sharing
    ZERO shingles are never materialized — unlike a pairwise
    array_intersect nested loop, which evaluates every blocked pair and
    is O(pairs x set-size). At 100 TB this is a shuffle on the shingle
    hash (skew-prone frequent shingles are exactly what AQE skew-join
    splits)."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    d = docs.select(
        "doc_id",
        "lang",
        # floor, not cast: DuckDB CAST(double AS INT) rounds, Spark truncates
        F.floor(F.col("n_chars") / 100).cast("int").alias("sz"),
        "text",
    )
    # Whole-stage-codegen shingling (explode-index + slice — see
    # _exploded_shingles) then DISTINCT (doc, shingle-hash): Jaccard is
    # over shingle SETS. xxhash64, not the portable md5 hash: this
    # query's OUTPUT depends only on shingle equality (the join key), so
    # each engine may use its own injective-in-practice hash — no hex
    # string materialization per shingle, one fused codegen pass.
    e = (
        _exploded_shingles(d, "doc_id", "lang", "sz")
        .select("doc_id", "lang", "sz", F.xxhash64(F.col("shingle")).alias("h"))
        .distinct()
    )
    # per-doc distinct-shingle counts: a tiny (doc_id, n_sh) relation,
    # broadcast back onto the aggregated pair table — the pair table
    # never carries the counts through the big shuffle
    sizes = e.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.sz") == F.col("b.sz"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    na = F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")))
    nb = F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")))
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


CONTAINMENT_THRESHOLD = 0.3  # flag pairs where either doc is ≥30% contained


def ngram_containment_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """ASYMMETRIC near-dup detection: n-gram containment C(A→B) =
    |sh(A) ∩ sh(B)| / |sh(A)| — the signal Jaccard misses when a short
    document is wholly quoted inside a much longer one (the union term
    dilutes Jaccard toward 0 while containment of the short side stays
    ~1). This is the subset-duplication check a training-data pipeline
    runs to catch templated intros, quoted passages, and prompt-in-
    completion leakage that symmetric measures under-flag.

    Same scale shape as ``ngram_jaccard_pairs`` (one inverted-index
    equijoin on the shingle hash — pairs sharing zero shingles never
    materialize, AQE splits skewed frequent-shingle keys), then BOTH
    directions' containment come from the one symmetric intersection
    count — no second join. Emits pairs where either direction reaches
    the threshold.

    Blocking is (lang, shingle-hash) ONLY — deliberately NOT the
    size band Jaccard uses. Size banding is sound for Jaccard (a high-J
    pair necessarily has similar shingle counts) but would silence
    containment's whole point: a short doc swallowed by a 10x-longer
    one lands in different bands by construction, and that asymmetric
    pair is exactly what this operator exists to flag. The inverted
    index still prunes — a candidate must share at least one shingle —
    and the hash key (corpus-vocabulary cardinality) keeps the join
    distributed at any scale."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    d = docs.select("doc_id", "lang", "text")
    e = (
        _exploded_shingles(d, "doc_id", "lang")
        .select("doc_id", "lang", F.xxhash64(F.col("shingle")).alias("h"))
        .distinct()
    )
    sizes = e.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    na = F.broadcast(
        sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    )
    nb = F.broadcast(
        sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    )
    cont_a = F.round(F.col("inter").cast("double") / F.col("n_a"), 6)
    cont_b = F.round(F.col("inter").cast("double") / F.col("n_b"), 6)
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            cont_a.alias("cont_a_in_b"),
            cont_b.alias("cont_b_in_a"),
        )
        .filter(
            F.greatest(F.col("cont_a_in_b"), F.col("cont_b_in_a"))
            >= CONTAINMENT_THRESHOLD
        )
    )


EMB_DIM = 64  # embeddings.embedding width (schema-fixed)


def _dot64(x: Column, y: Column) -> Column:
    """Double-precision left-fold dot product: zip_with + aggregate,
    the exact association of the oracle's list_reduce left fold, so
    values are bit-identical. Measured note: Spark 4 evaluates this
    higher-order-function form ~2x FASTER than a 64-term unrolled
    element_at sum (the giant expression tree loses codegen wins to
    per-term overhead), so the compact lambda form is also the fast
    form — same conclusion as the _signature note in similarity.py."""
    prods = F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _norm64(v: Column) -> Column:
    """sqrt(dot(v, v)) — computed once per VECTOR by callers, not once
    per pair: the pairwise cosine then costs one dot + one multiply
    instead of three dots (the win that matters when pairs >> rows)."""
    return F.sqrt(_dot64(v, v))


def _cosine(a: Column, b: Column) -> Column:
    """Double-precision cosine, same term order as the DuckDB oracle's
    list_reduce left fold — results are bit-identical."""
    return _dot64(a, b) / (_norm64(a) * _norm64(b))


def embedding_cosine_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-dup scan, label-blocked: per label the pair count,
    max cosine, and count above the flag threshold. The pairwise stage
    runs only within label blocks (the ANN-bucketed path in
    similarity.py replaces labels with LSH buckets at scale)."""
    emb = widen_small_scan(table(spark, sf, "embeddings")).withColumn(
        "nrm", _norm64(F.col("embedding"))
    )
    a, b = emb.alias("a"), emb.alias("b")
    # norm computed once per row BEFORE the join — each pair pays one
    # unrolled dot + one multiply (bit-identical: same values, same fold)
    cos = _dot64(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.label").alias("label"), cos.alias("cos"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.max("cos"), 4).alias("max_cos"),
            F.sum(F.when(F.col("cos") > COSINE_FLAG, 1).otherwise(0)).alias("n_flagged"),
        )
        .orderBy("label")
    )


MAX_CC_ITERATIONS = 20


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node connects its STRICTLY LARGER
    neighbors to its minimum neighbor (including itself). Edges stay
    oriented (hi, lo) with hi > lo; the emitted (v, m) pairs satisfy
    m <= u < v so the invariant holds by construction."""
    nbr = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
        e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    )
    m = nbr.groupBy("u").agg(F.min("v").alias("mv"))
    m = m.select("u", F.least("mv", "u").alias("m"))
    # NO distinct here: the duplicates a large-star round can emit are
    # harmless to small-star's min-aggregate and get collapsed by its
    # output distinct — skipping the dedup saves one full shuffle of
    # the edge set per round (measured identical labels, one fewer
    # exchange; the fixpoint signature reads small-star's dedup'd
    # output, so convergence detection is unaffected).
    return (
        nbr.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: every node connects its smaller neighbors (and
    itself) to the minimum of those neighbors. Operates directly on the
    (hi, lo) orientation — each edge lives at its larger endpoint."""
    m = e.groupBy("hi").agg(F.min("lo").alias("m"))
    links = (
        e.join(m, "hi")
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
    )
    self_links = m.select("hi", F.col("m").alias("lo"))
    return links.union(self_links).distinct()


def _connected_components(
    edges: DataFrame, max_rounds: int = MAX_CC_ITERATIONS, oriented: bool = False
) -> tuple[DataFrame, int]:
    """Connected components via alternating large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond"):
    converges in O(log n) rounds regardless of component DIAMETER —
    the property plain min-label propagation lacks (a length-k chain
    costs k propagation rounds but ~log k star rounds; see
    tests/test_partitioning.py's adversarial chain fixture).

    ``edges`` is any two-column (u, v) pair list, either orientation,
    self-loops tolerated. Returns ``(labels, rounds)`` where labels maps
    every node of the graph to its component's MINIMUM node id — at the
    fixpoint the edge set is a union of stars rooted at component
    minima. Per round: three shuffles on node ids (neighborhood build +
    two min-aggregates), each carrying two bigints per edge;
    ``localCheckpoint`` truncates lineage and the convergence probe
    reads a handful of scalars, never data.

    Convergence (r11) is detected by a STRUCTURAL star predicate, not
    by comparing against the previous round: an oriented edge set is a
    large/small-star fixpoint exactly when it is a union of stars —
    every ``hi`` occurs once and no node is both a ``hi`` and a ``lo``
    (stars are provably fixed points of both star operations, and the
    algorithm's fixpoints are star unions, Kiveris et al. §3).  The
    predicate rides the SAME probe job that materializes the round, so
    the old shape's two extra jobs disappear: the initial signature
    pass and the full confirming no-op round (measured 0.62 s/round at
    sf0.1 — pure overhead once converged; at scale the saved confirm
    round is three shuffles of the full edge set).  It is also exact
    where the (count, hash-sum) signature had a collision corner.

    ``oriented=True`` asserts the caller already guarantees u > v with
    no self-loops or duplicate pairs (e.g. ``minhash_band_pairs``, whose
    a<b join condition + distinct produce exactly that) — skipping the
    normalization saves ONE FULL SHUFFLE of the pair set, which at scale
    is the largest relation this operator ever touches."""
    if oriented:
        e = edges.select(F.col("u").alias("hi"), F.col("v").alias("lo"))
    else:
        e = (
            edges.select(
                F.greatest(F.col("u"), F.col("v")).alias("hi"),
                F.least(F.col("u"), F.col("v")).alias("lo"),
            )
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
    # lazy: the first round's convergence probe is the action that
    # materializes the orientation — no standalone initial job
    e = e.localCheckpoint(eager=False)

    def _is_star_union(df: DataFrame) -> bool:
        # per node: occurrences as hi (nh) and total occurrences (nt);
        # a star union has nh == 1 and nt == nh for every hi-node.
        # Empty edge sets are trivially star unions (max over empty is
        # NULL -> coalesce 0).
        occ = (
            df.select(F.col("hi").alias("x"), F.lit(1).alias("h"))
            .union(df.select(F.col("lo").alias("x"), F.lit(0).alias("h")))
            .groupBy("x")
            .agg(F.sum("h").alias("nh"), F.count("*").alias("nt"))
        )
        viol = occ.agg(
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("nh") > 1)
                        | ((F.col("nh") >= 1) & (F.col("nt") > F.col("nh"))),
                        1,
                    ).otherwise(0)
                ),
                F.lit(0),
            )
        ).first()[0]
        return viol == 0

    rounds = 0
    for _ in range(max_rounds):
        # LAZY checkpoint: the star-predicate probe is the one action
        # that materializes the round — one Spark job per round
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        rounds += 1
        if _is_star_union(e):  # star fixpoint reached
            break
    labels = (
        e.select(F.col("hi").alias("node"), F.col("lo").alias("label"))
        .union(e.select(F.col("lo").alias("node"), F.col("lo").alias("label")))
        .distinct()
    )
    return labels, rounds


def dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components over the MinHash/LSH candidate-pair graph —
    the step that turns pairwise near-dup hits into KEEP/DROP decisions
    (every doc in a component collapses onto the min-doc_id
    representative). Emits (rep, cluster_size) per component.

    Clustering is the alternating large-star/small-star algorithm
    (``_connected_components``): O(log n) rounds bounds the driver loop
    even on adversarial high-diameter pair graphs, where the previous
    min-label propagation needed O(diameter) rounds and silently hit
    MAX_CC_ITERATIONS on chains longer than 20. The pair graph flows
    lazily into the CC's own eager orientation checkpoint — one
    materialization, not two (a prior ``localCheckpoint`` here made the
    minhash pipeline land twice)."""
    pairs = minhash_band_pairs(spark, sf)
    # the band join's a<b condition + distinct already yield oriented,
    # self-loop-free, deduplicated pairs: doc_b > doc_a maps directly to
    # (hi, lo), so the CC skips its normalization shuffle entirely
    edges = pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    labels, _ = _connected_components(edges, oriented=True)
    return (
        labels.groupBy(F.col("label").alias("rep"))
        .agg(F.count("*").alias("cluster_size"))
        .orderBy("rep")
    )


def dedup_survivorship(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-aware survivorship: collapse every near-dup cluster onto
    its HIGHEST-QUALITY member (not the arbitrary min-id) — the policy
    production curation actually wants, since boilerplate copies often
    carry the lowest ids. Per surviving doc's language: cluster count,
    total/dropped docs, and how many characters of text survive vs drop.

    The quality score is textops.quality_score_buckets' composite
    (length/diversity/word-length — formula kept in exact parity so the
    two entries rank identically); the winner is chosen by ONE grouped
    ``max(struct(score, -doc_id, ...))`` — partial-aggregatable map-side
    (no window, no per-cluster sort), ties broken to the smallest
    doc_id. Labels come from the same large-star/small-star CC as
    ``dedup_clusters``; singleton docs (absent from the pair graph)
    survive as their own cluster via the left join + coalesce. All
    reported measures are exact integers, so no float-ordering hazard
    crosses engines."""
    docs = table(spark, sf, "documents")
    pairs = minhash_band_pairs(spark, sf)
    edges = pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    labels, _ = _connected_components(edges, oriented=True)

    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks)
    len_score = F.least(F.col("n_chars") / F.lit(400.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)) / n_tok
    mean_wlen = (F.col("n_chars") - (n_tok - 1)) / n_tok  # chars minus spaces
    wlen_score = F.least(mean_wlen / F.lit(6.0), F.lit(1.0))
    score = F.round(0.4 * len_score + 0.4 * diversity + 0.2 * wlen_score, 6)

    lab = (
        docs.select("doc_id", "lang", "n_chars", score.alias("score"))
        .join(
            labels.withColumnRenamed("node", "doc_id"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            "lang",
            "n_chars",
            "score",
            F.coalesce("label", "doc_id").alias("rep"),
        )
    )
    per_rep = lab.groupBy("rep").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.max(
            F.struct(
                F.col("score"),
                (-F.col("doc_id")).alias("neg_id"),
                F.col("lang"),
                F.col("n_chars"),
            )
        ).alias("w"),
    )
    return (
        per_rep.groupBy(F.col("w.lang").alias("lang"))
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            (F.sum("n_docs") - F.count("*")).cast("bigint").alias("n_dropped"),
            F.sum(F.col("w.n_chars")).cast("bigint").alias("kept_chars"),
            (F.sum("total_chars") - F.sum(F.col("w.n_chars")))
            .cast("bigint")
            .alias("dropped_chars"),
        )
        .orderBy("lang")
    )


SPAN_TOKENS = 16  # pseudo-paragraph length for span-level dedup


def span_dedup_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Span-level (sub-document) duplication accounting: each document
    is cut into disjoint 16-token spans, each span is hashed, and a span
    occurrence counts as duplicated when its text occurs more than once
    anywhere in the corpus. Per source: span count, duplicated-span
    count, duplicated fraction.

    This is the substring-granularity contamination signal document-level
    dedup misses (boilerplate headers, license blocks, templated intros).
    Scale shape: explode is linear in token count, the global frequency
    pass is ONE partial+final count agg keyed on the 60-bit span hash
    (shuffle carries hashes, never span text), and the attribution join
    is hash-equi on the same key — no pairwise step anywhere.
    """
    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = F.split(F.col("text"), " ")
    spans = (
        docs.select("source", toks.alias("toks"))
        .select(
            "source",
            "toks",
            F.explode(
                F.sequence(F.lit(0), F.floor((F.size("toks") - 1) / SPAN_TOKENS))
            ).alias("i"),
        )
        .select(
            "source",
            _h64_spark(
                F.concat_ws(" ", F.slice("toks", F.col("i") * SPAN_TOKENS + 1, SPAN_TOKENS))
            ).alias("h"),
        )
    )
    freq = spans.groupBy("h").agg(F.count("*").alias("n_occ"))
    return (
        spans.join(freq, "h")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("n_occ") > 1).cast("bigint")).alias("n_dup_spans"),
            F.round(F.avg((F.col("n_occ") > 1).cast("double")), 4).alias("dup_frac"),
        )
        .orderBy("source")
    )


def cross_source_span_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-source contamination matrix at SPAN granularity: for every
    source pair (a < b), how many distinct 16-token spans appear in
    BOTH — the signal that catches templated boilerplate and licensing
    blocks flowing between crawls even when no whole document repeats
    (exact-digest overlap is zero on this corpus; span overlap is not).

    Same span hashing as ``span_dedup_stats`` (60-bit H64, text never
    shuffles). The per-source distinct prunes repeated spans within a
    source BEFORE the self-equijoin on the hash, so a span contributes
    at most (#sources choose 2) join rows — never a row-count blowup —
    and the output is bounded by the source-pair count regardless of
    corpus size."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = F.split(F.col("text"), " ")
    spans = (
        docs.select("source", toks.alias("toks"))
        .select(
            "source",
            "toks",
            F.explode(
                F.sequence(F.lit(0), F.floor((F.size("toks") - 1) / SPAN_TOKENS))
            ).alias("i"),
        )
        .select(
            "source",
            _h64_spark(
                F.concat_ws(
                    " ", F.slice("toks", F.col("i") * SPAN_TOKENS + 1, SPAN_TOKENS)
                )
            ).alias("h"),
        )
        .distinct()
    )
    a = spans.select(F.col("source").alias("source_a"), "h")
    b = spans.select(F.col("source").alias("source_b"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared_spans"))
        .orderBy("source_a", "source_b")
    )


def dup_cluster_size_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Histogram of exact-duplicate group sizes: group docs by text
    digest, then roll group sizes up into (size → groups, docs, excess
    copies). The removable-copy count (``n_excess``) is the headline
    number a dedup pass reports before anyone runs it.

    Two hash aggregates back to back; the first shuffles 16-byte
    digests, the second shuffles one row per digest group — strictly
    shrinking data volume, the safest possible shape at 100 TB."""
    docs = table(spark, sf, "documents")
    digest = F.md5(F.lower(F.trim(F.col("text"))))
    groups = docs.select(digest.alias("digest")).groupBy("digest").agg(
        F.count("*").alias("csize")
    )
    return (
        groups.groupBy("csize")
        .agg(F.count("*").alias("n_groups"))
        .select(
            "csize",
            "n_groups",
            (F.col("csize") * F.col("n_groups")).alias("n_docs"),
            ((F.col("csize") - 1) * F.col("n_groups")).alias("n_excess"),
        )
        .orderBy("csize")
    )


def bow_dedup_gain(spark: SparkSession, sf: str) -> DataFrame:
    """Canonicalization-sensitivity accounting: distinct docs under the
    exact digest vs under a bag-of-words digest (tokens sorted before
    hashing — catches reordered/shuffled near-copies that exact dedup
    misses, e.g. templated docs with permuted fields). ``bow_gain`` is
    the extra collapse the cheaper canonical form would buy per source.

    The sort is per-row over one document's tokens (no shuffle); both
    distinct counts ride the same single hash aggregate, and the
    shuffle carries two 16-byte digests per doc."""
    docs = table(spark, sf, "documents")
    toks = F.split(F.col("text"), " ")
    return (
        docs.select(
            "source",
            F.md5(F.col("text")).alias("e"),
            F.md5(F.concat_ws(" ", F.array_sort(toks))).alias("b"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count_distinct("e").alias("n_exact_unique"),
            F.count_distinct("b").alias("n_bow_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_exact_unique",
            "n_bow_unique",
            (F.col("n_exact_unique") - F.col("n_bow_unique")).alias("bow_gain"),
        )
        .orderBy("source")
    )


BOILER_N = 5  # boilerplate phrase width (word n-gram)
BOILER_MIN_DOCS = 3  # phrase must appear in >= this many distinct docs


def boilerplate_ngram_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate-phrase accounting (RefinedWeb/C4-style line dedup,
    adapted to unstructured text as word 5-grams): a phrase is
    boilerplate when it occurs in >= BOILER_MIN_DOCS distinct documents
    (nav bars, license headers, templated footers). Per source: total
    5-gram occurrences, occurrences covered by boilerplate phrases, and
    the boilerplate fraction — the number a cleaning pass would remove.

    Scale shape: one explode (codegen index path, hashes only from
    there on), ONE distinct-doc-count shuffle keyed on the 8-byte
    phrase hash, then the threshold-pruned hot-phrase set joins back.
    The hot set's size is DATA-DEPENDENT (a pathological corpus can
    have billions of >=MIN_DOCS phrases), so the build side carries no
    forced broadcast hint: AQE's size-based selection broadcasts it
    when it is actually small (the common case, asserted in
    tests/test_plans.py via the post-execution plan) and falls back to
    a shuffled hash join instead of OOMing the driver when it isn't."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    occ = _exploded_shingles(docs, "doc_id", "source", n=BOILER_N).select(
        "doc_id", "source", _h64_spark(F.col("shingle")).alias("h")
    )
    hot = (
        occ.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILER_MIN_DOCS)
        .select("h", F.lit(1).alias("boiler"))
    )
    return (
        occ.join(hot, "h", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum(F.coalesce(F.col("boiler"), F.lit(0))).cast("bigint").alias("n_boilerplate"),
            F.round(
                F.avg(F.when(F.col("boiler").isNotNull(), 1.0).otherwise(0.0)), 6
            ).alias("boiler_frac"),
        )
        .orderBy("source")
    )


BATCH_SOURCE = "src19"  # stand-in for the newest crawl increment


def incremental_dedup_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental-ingest dedup: the newest source plays the incoming
    batch; every other source is the historical corpus. A batch doc is
    rejected when its exact text digest already exists in history. Per
    language: batch size, exact-dup rejects, accepted docs — the
    accept/reject ledger an append-only ingestion pipeline emits.

    Scale shape: history is represented ONLY by its 16-byte digest
    index (at 100 TB that index lives bucketed on digest, so the probe
    is co-located); the incoming batch — typically orders of magnitude
    smaller than history — is the side that moves. Here that is a
    digest-keyed left join whose flag feeds one rollup; AQE picks the
    broadcast side. The LSH analogue (near-dup against history) is the
    streaming sink ``write_foreach_batch_neardup``."""
    docs = table(spark, sf, "documents")
    digest = F.md5(F.lower(F.trim(F.col("text"))))
    batch = docs.filter(F.col("source") == BATCH_SOURCE).select(
        "doc_id", "lang", digest.alias("digest")
    )
    hist = (
        docs.filter(F.col("source") != BATCH_SOURCE)
        .select(digest.alias("digest"))
        .distinct()
        .withColumn("dup", F.lit(1))
    )
    return (
        batch.join(hist, "digest", "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_batch"),
            F.sum(F.coalesce(F.col("dup"), F.lit(0))).cast("bigint").alias("n_exact_dup"),
            F.sum(F.when(F.col("dup").isNull(), 1).otherwise(0)).cast("bigint").alias(
                "n_accepted"
            ),
        )
        .orderBy("lang")
    )


ERR_BUCKETS = 20  # 0.05-wide |estimate - exact| error buckets


def minhash_estimate_error(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch-accuracy audit: for every LSH candidate pair, compare the
    MinHash Jaccard ESTIMATE (matching signature components / 16)
    against the EXACT distinct-shingle Jaccard, bucketed by absolute
    error (0.05-wide). The per-bucket pair counts plus pooled
    estimate/exact means are the calibration table that justifies the
    (bands, rows) operating point to whoever consumes the dedup output.

    Scale shape: the full signature rides THROUGH the band self-join
    (16 narrow ints per side) so the estimate is computed inline on
    the joined row — no separate signature re-join per pair side; the
    banded sides share one ReusedExchange, so signatures are computed
    once. The per-(doc_a, doc_b) dedup is a max-agg (k is identical on
    every shared band), and the exact measure joins shingle SETS onto
    the candidate pairs only (sub-O(n²) by construction), never all
    pairs. All per-pair math is deterministic IEEE double (identical
    in DuckDB); aggregates ride exact integer sums, so the
    cross-engine hash matches bit-for-bit."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    sig = minhash_signatures(docs)
    band_keys = F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[F.col(f"m_{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)],
                )
            )
            for b in range(N_BANDS)
        ]
    )
    banded = sig.select(
        "doc_id", *[f"m_{i}" for i in range(N_MINHASH)],
        F.posexplode(band_keys).alias("band_idx", "band_key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    k = sum(
        F.when(F.col(f"a.m_{i}") == F.col(f"b.m_{i}"), 1).otherwise(0)
        for i in range(N_MINHASH)
    )
    est = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            k.alias("k"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("k").alias("k"))
    )
    # materialize the token array before shingling: _shingles slices the
    # token list inside a transform lambda, and a lambda body re-evaluates
    # non-attribute subexpressions once per ELEMENT — with split() inlined
    # the text re-splits once per shingle (the plan-hygiene class guarded
    # by plans.nested_hof_filters; here it hid in a Project)
    sets = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks")).select(
        "doc_id", _shingles(F.col("toks")).alias("sh")
    )
    scored = (
        est.join(sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")), "doc_a")
        .join(sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")), "doc_b")
        .select(
            "k",
            F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            (F.size("sh_a") + F.size("sh_b") - F.size(F.array_intersect("sh_a", "sh_b"))).alias(
                "uni"
            ),
        )
    )
    err = F.abs(F.col("k") / 16.0 - F.col("inter").cast("double") / F.col("uni"))
    return (
        scored.select(
            F.floor(err * ERR_BUCKETS).cast("int").alias("err_bucket"), "k", "inter", "uni"
        )
        .groupBy("err_bucket")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.sum("k") / (16.0 * F.count("*")), 6).alias("avg_est"),
            F.round(F.sum("inter").cast("double") / F.sum("uni"), 6).alias("avg_exact"),
        )
        .orderBy("err_bucket")
    )


SWEEP_CONFIGS = ((2, 8), (4, 4), (8, 2))  # (bands, rows) over 16 minhashes


def lsh_tuning_sweep(spark: SparkSession, sf: str) -> DataFrame:
    """LSH operating-point sweep: candidate-pair counts for three
    (bands × rows-per-band) configurations over the SAME 16-minhash
    signatures — the candidate-budget curve that picks the banding
    config (more bands ⇒ higher recall ⇒ more candidates to verify;
    the sweep quantifies that trade before anyone commits a 100 TB
    run to it).

    Scale shape: signatures are computed once (one min-agg shuffle,
    shared via localCheckpoint) and each config re-bands them with
    pure projection + one bucket-keyed self-join; candidate pairs are
    never materialized beyond each config's count."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    sig = minhash_signatures(docs).localCheckpoint(eager=False)
    parts = []
    for nb, rpb in SWEEP_CONFIGS:
        band_keys = F.array(
            *[
                F.md5(
                    F.concat_ws(
                        ",", *[F.col(f"m_{b * rpb + r}") for r in range(rpb)]
                    )
                )
                for b in range(nb)
            ]
        )
        banded = sig.select(
            "doc_id", F.posexplode(band_keys).alias("band_idx", "band_key")
        )
        a, b = banded.alias("a"), banded.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
            .agg(F.count("*").alias("n_pairs"))
            .select(
                F.lit(nb).cast("int").alias("n_bands"),
                F.lit(rpb).cast("int").alias("rows_per_band"),
                "n_pairs",
            )
        )
        parts.append(pairs)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("n_bands")


QUALITY_DUP_BUCKETS = 4


def quality_dup_correlation(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-family audit: does short (low-quality-proxy) text near-
    duplicate more? Per n_chars length bucket, the fraction of docs
    that appear in at least one MinHash-LSH candidate pair — the
    classic curation finding (boilerplate is both low-quality AND
    duplicated) made measurable. Uses LSH candidacy rather than exact
    digests because candidacy is the signal that exists at every scale
    (the synthetic corpus has exact dups only at sf≥0.1).

    The candidate doc set (small by construction) broadcasts back onto
    the bucketed doc stream; one rollup."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    pairs = minhash_band_pairs(spark, sf)
    neardup = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .union(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("nd", F.lit(1))
    )
    sized = docs.select(
        "doc_id",
        F.least(
            F.floor(F.col("n_chars") / 200), F.lit(QUALITY_DUP_BUCKETS - 1)
        ).cast("int").alias("len_bucket"),
    )
    return (
        sized.join(F.broadcast(neardup), "doc_id", "left")
        .groupBy("len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce(F.col("nd"), F.lit(0))).cast("bigint").alias("n_neardup_docs"),
            F.round(
                F.avg(F.when(F.col("nd").isNotNull(), 1.0).otherwise(0.0)), 6
            ).alias("neardup_rate"),
        )
        .orderBy("len_bucket")
    )


def ngram_novelty_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus novelty ledger: for each document, which of its distinct
    3-gram shingles appear HERE FIRST (min doc_id owns the shingle)?
    Per source: docs, shingle volume, first-occurrence count, and the
    pooled novelty rate — the signal that distinguishes sources adding
    new content from sources recycling templates (a falling novelty
    rate over ingestion order is the drift alarm).

    Scale shape: the first-occurrence index IS the corpus shingle
    index (same infrastructure as the inverted index) — one
    per-doc-distinct pass, one min-agg keyed on the 8-byte hash, one
    hash join back. The rate is pooled (exact integer sums), not an
    average of per-doc doubles, so the cross-engine hash is stable."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    occ = (
        _exploded_shingles(docs, "doc_id", "source")
        .select("doc_id", "source", _h64_spark(F.col("shingle")).alias("h"))
        .distinct()
    )
    first = occ.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        occ.join(first, "h")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("bigint")).alias("novel"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_sh").alias("n_shingles"),
            F.sum("novel").alias("n_novel"),
            F.round(F.sum("novel").cast("double") / F.sum("n_sh"), 6).alias(
                "novelty_rate"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins (SQL assembled with plain loops — the generated
# text mirrors the Spark expression tree clause for clause)
# ---------------------------------------------------------------------------

_min_exprs = [
    f"MIN((hb * {_MINHASH_A[_i]} + {_MINHASH_B[_i]}) % {MINHASH_P}) AS m_{_i}"
    for _i in range(N_MINHASH)
]

def _sig_sql_from(src: str) -> str:
    """The minhash-signature CTE body over any relation exposing
    (doc_id, text) — parametrized so the streaming-sink batch twins can
    band quality-gated/normalized text, not just raw documents."""
    return (
        "SELECT doc_id, "
        + ", ".join(_min_exprs)
        + f"""
    FROM (
        SELECT doc_id, {H64_SQL.format(expr="shingle")} % {MINHASH_P} AS hb
        FROM (
            SELECT doc_id, unnest({_SHINGLES_SQL}) AS shingle
            FROM {src}
        )
    )
    GROUP BY doc_id"""
    )


_SIG_SQL = _sig_sql_from("documents")

_band_selects = []
for _b in range(N_BANDS):
    _cols = " || ',' || ".join(
        f"CAST(m_{_b * ROWS_PER_BAND + _r} AS VARCHAR)" for _r in range(ROWS_PER_BAND)
    )
    _band_selects.append(
        f"SELECT doc_id, {_b} AS band_idx, md5({_cols}) AS band_key FROM sig"
    )
_BAND_SQL = "\nUNION ALL\n".join(_band_selects)

_VOTE_SQL = ", ".join(
    f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v_{j}"
    for j in range(SIMHASH_BITS)
)
# per-term BIGINT cast: a bare 2147483648 literal would overflow INT32
_SIMHASH_SUM = " + ".join(
    f"CASE WHEN v_{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    for j in range(SIMHASH_BITS)
)

_COS_SQL = """(
    list_reduce(list_transform(generate_series(1, len(a.embedding)),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y)
    / (sqrt(list_reduce(list_transform(generate_series(1, len(a.embedding)),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)), (x, y) -> x + y))
     * sqrt(list_reduce(list_transform(generate_series(1, len(b.embedding)),
        i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x, y) -> x + y)))
)"""

ORACLE: dict[str, str] = {
    "dedup_exact_text": """
        SELECT source, COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(lower(trim(text)))) AS n_unique
        FROM documents GROUP BY source
    """,
    "minhash_band_pairs": f"""
        WITH sig AS ({_SIG_SQL}),
        banded AS ({_BAND_SQL})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    """,
    "neardup_edit_verify": f"""
        WITH sig AS ({_SIG_SQL}),
        banded AS ({_BAND_SQL}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        ),
        scored AS (
            SELECT levenshtein(substr(da.text, 1, {EDIT_PREFIX}),
                               substr(db.text, 1, {EDIT_PREFIX})) AS dist
            FROM pairs p
            JOIN documents da ON da.doc_id = p.doc_a
            JOIN documents db ON db.doc_id = p.doc_b
        )
        SELECT COUNT(*) AS n_candidates,
               CAST(SUM(CASE WHEN dist <= {EDIT_MAX} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_verified,
               ROUND(AVG(CAST(dist AS DOUBLE)), 4) AS avg_dist,
               MIN(dist) AS min_dist,
               MAX(dist) AS max_dist
        FROM scored
    """,
    "simhash_fingerprints": f"""
        SELECT doc_id, CAST({_SIMHASH_SUM} AS BIGINT) AS simhash
        FROM (
            SELECT doc_id, {_VOTE_SQL}
            FROM (SELECT doc_id, {H64_SQL.format(expr="tok")} AS h
                  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                        FROM documents))
            GROUP BY doc_id
        )
    """,
    "simhash_hamming_pairs": f"""
        WITH sim AS (
            SELECT doc_id, CAST({_SIMHASH_SUM} AS BIGINT) AS simhash
            FROM (
                SELECT doc_id, {_VOTE_SQL}
                FROM (SELECT doc_id, {H64_SQL.format(expr="tok")} AS h
                      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                            FROM documents))
                GROUP BY doc_id
            )
        ),
        bands AS (
            SELECT doc_id, simhash, band_idx,
                   (simhash >> (band_idx * 8)) & 255 AS band_val
            FROM sim, (SELECT unnest(generate_series(0, {SIMHASH_BANDS - 1})) AS band_idx)
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.simhash AS sim_a, b.simhash AS sim_b
            FROM bands a JOIN bands b
              ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
        ),
        scored AS (
            SELECT bit_count(CAST(xor(sim_a, sim_b) AS BIGINT)) AS hamming
            FROM pairs
        )
        SELECT COUNT(*) AS n_candidates,
               CAST(SUM(CASE WHEN hamming <= {HAMMING_MAX} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_close,
               MIN(hamming) AS min_hamming,
               ROUND(AVG(CAST(hamming AS DOUBLE)), 4) AS avg_hamming
        FROM scored
    """,
    "ngram_jaccard_pairs": f"""
        WITH d AS (
            SELECT doc_id, lang, CAST(FLOOR(n_chars / 100) AS INT) AS sz,
                   list_transform({_SHINGLES_SQL}, s -> {H64_SQL.format(expr="s")}) AS sh
            FROM documents
        ),
        e AS (
            SELECT doc_id, lang, sz, len(sh) AS n_sh, unnest(sh) AS h FROM d
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
            FROM e a JOIN e b
              ON a.h = b.h AND a.lang = b.lang AND a.sz = b.sz
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b,
               ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 6) AS jaccard
        FROM pairs
        WHERE ROUND(CAST(inter AS DOUBLE) / (n_a + n_b - inter), 6) >= {JACCARD_THRESHOLD}
    """,
    # same inverted-index pair table MINUS the size band (containment is
    # asymmetric by design — the short-in-long pair Jaccard's banding
    # drops is the one this operator exists for); both containment
    # directions derive from the one symmetric intersection count
    "ngram_containment_pairs": f"""
        WITH d AS (
            SELECT doc_id, lang,
                   list_transform({_SHINGLES_SQL}, s -> {H64_SQL.format(expr="s")}) AS sh
            FROM documents
        ),
        e AS (
            SELECT doc_id, lang, len(sh) AS n_sh, unnest(sh) AS h FROM d
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS inter
            FROM e a JOIN e b
              ON a.h = b.h AND a.lang = b.lang
             AND a.doc_id < b.doc_id
            GROUP BY 1, 2, 3, 4
        )
        SELECT doc_a, doc_b,
               ROUND(CAST(inter AS DOUBLE) / n_a, 6) AS cont_a_in_b,
               ROUND(CAST(inter AS DOUBLE) / n_b, 6) AS cont_b_in_a
        FROM pairs
        WHERE GREATEST(ROUND(CAST(inter AS DOUBLE) / n_a, 6),
                       ROUND(CAST(inter AS DOUBLE) / n_b, 6))
              >= {CONTAINMENT_THRESHOLD}
    """,
    # transitive closure via recursive CTE = the declarative twin of the
    # Spark-side iterative label propagation (both label every node with
    # the min doc_id reachable through the undirected candidate graph)
    "dedup_clusters": f"""
        WITH RECURSIVE sig AS ({_SIG_SQL}),
        banded AS ({_BAND_SQL}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
        )
        SELECT rep, COUNT(*) AS cluster_size
        FROM (SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u)
        GROUP BY rep
    """,
    # same recursive closure; the winner per cluster is the ordered-FIRST
    # over (score DESC, doc_id ASC) — the declarative twin of Spark's
    # max(struct(score, -doc_id)) argmax
    "dedup_survivorship": f"""
        WITH RECURSIVE sig AS ({_SIG_SQL}),
        banded AS ({_BAND_SQL}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION SELECT doc_b, doc_a FROM pairs
        ),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u WHERE e.v <> r.u
        ),
        labels AS (
            SELECT u AS doc_id, LEAST(u, MIN(v)) AS rep FROM reach GROUP BY u
        ),
        scored AS (
            SELECT doc_id, lang, n_chars, ROUND(
                0.4 * LEAST(n_chars / 400.0, 1.0)
              + 0.4 * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))
              + 0.2 * LEAST(((n_chars - (len(toks) - 1))
                             / CAST(len(toks) AS DOUBLE)) / 6.0, 1.0),
              6) AS score
            FROM (SELECT doc_id, lang, n_chars,
                         string_split(text, ' ') AS toks FROM documents)
        ),
        lab AS (
            SELECT s.doc_id, s.lang, s.n_chars, s.score,
                   COALESCE(l.rep, s.doc_id) AS rep
            FROM scored s LEFT JOIN labels l ON s.doc_id = l.doc_id
        ),
        per_rep AS (
            SELECT rep, COUNT(*) AS n_docs, SUM(n_chars) AS total_chars,
                   FIRST(lang ORDER BY score DESC, doc_id ASC) AS w_lang,
                   FIRST(n_chars ORDER BY score DESC, doc_id ASC) AS w_chars
            FROM lab GROUP BY rep
        )
        SELECT w_lang AS lang,
               COUNT(*) AS n_clusters,
               CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(n_docs) - COUNT(*) AS BIGINT) AS n_dropped,
               CAST(SUM(w_chars) AS BIGINT) AS kept_chars,
               CAST(SUM(total_chars) - SUM(w_chars) AS BIGINT) AS dropped_chars
        FROM per_rep GROUP BY w_lang ORDER BY lang
    """,
    "embedding_cosine_stats": f"""
        SELECT a.label AS label, COUNT(*) AS n_pairs,
               ROUND(MAX({_COS_SQL}), 4) AS max_cos,
               CAST(SUM(CASE WHEN {_COS_SQL} > {COSINE_FLAG} THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
        GROUP BY a.label
    """,
    "span_dedup_stats": f"""
        WITH spans AS (
            SELECT source,
                   {H64_SQL.format(expr="span")} AS h
            FROM (
                SELECT source,
                       unnest(list_transform(
                           generate_series(0, (len(toks) - 1) // {SPAN_TOKENS}),
                           i -> array_to_string(
                               toks[CAST(i * {SPAN_TOKENS} + 1 AS INT)
                                    :CAST(i * {SPAN_TOKENS} + {SPAN_TOKENS} AS INT)],
                               ' '))) AS span
                FROM (SELECT source, string_split(text, ' ') AS toks FROM documents)
            )
        ),
        freq AS (SELECT h, COUNT(*) AS n_occ FROM spans GROUP BY h)
        SELECT source,
               COUNT(*) AS n_spans,
               CAST(SUM(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
               ROUND(AVG(CASE WHEN n_occ > 1 THEN 1.0 ELSE 0.0 END), 4) AS dup_frac
        FROM spans JOIN freq USING (h)
        GROUP BY source
    """,
    "cross_source_span_overlap": f"""
        WITH spans AS (
            SELECT DISTINCT source,
                   {H64_SQL.format(expr="span")} AS h
            FROM (
                SELECT source,
                       unnest(list_transform(
                           generate_series(0, (len(toks) - 1) // {SPAN_TOKENS}),
                           i -> array_to_string(
                               toks[CAST(i * {SPAN_TOKENS} + 1 AS INT)
                                    :CAST(i * {SPAN_TOKENS} + {SPAN_TOKENS} AS INT)],
                               ' '))) AS span
                FROM (SELECT source, string_split(text, ' ') AS toks FROM documents)
            )
        )
        SELECT a.source AS source_a, b.source AS source_b,
               COUNT(*) AS n_shared_spans
        FROM spans a JOIN spans b
          ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2
        ORDER BY source_a, source_b
    """,
    "dup_cluster_size_histogram": """
        SELECT csize,
               COUNT(*) AS n_groups,
               CAST(csize * COUNT(*) AS BIGINT) AS n_docs,
               CAST((csize - 1) * COUNT(*) AS BIGINT) AS n_excess
        FROM (
            SELECT md5(lower(trim(text))) AS digest, COUNT(*) AS csize
            FROM documents GROUP BY digest
        )
        GROUP BY csize
    """,
    "boilerplate_ngram_stats": f"""
        WITH occ AS (
            SELECT doc_id, source, {H64_SQL.format(expr="shingle")} AS h
            FROM (
                SELECT doc_id, source,
                       unnest(list_transform(
                           generate_series(1, len(string_split(text,' ')) - {BOILER_N - 1}),
                           i -> array_to_string(string_split(text,' ')[i:i+{BOILER_N - 1}], ' ')))
                           AS shingle
                FROM documents
            )
        ),
        hot AS (
            SELECT h, 1 AS boiler
            FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM occ GROUP BY h)
            WHERE nd >= {BOILER_MIN_DOCS}
        )
        SELECT source, COUNT(*) AS n_ngrams,
               CAST(SUM(CASE WHEN hot.boiler IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boilerplate,
               ROUND(AVG(CASE WHEN hot.boiler IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
                   AS boiler_frac
        FROM occ LEFT JOIN hot ON occ.h = hot.h
        GROUP BY source
    """,
    "incremental_dedup_batch": f"""
        WITH batch AS (
            SELECT doc_id, lang, md5(lower(trim(text))) AS digest
            FROM documents WHERE source = '{BATCH_SOURCE}'
        ),
        hist AS (
            SELECT DISTINCT md5(lower(trim(text))) AS digest, 1 AS dup
            FROM documents WHERE source <> '{BATCH_SOURCE}'
        )
        SELECT lang, COUNT(*) AS n_batch,
               CAST(SUM(CASE WHEN h.dup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_exact_dup,
               CAST(SUM(CASE WHEN h.dup IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_accepted
        FROM batch b LEFT JOIN hist h ON b.digest = h.digest
        GROUP BY lang
    """,
    "minhash_estimate_error": f"""
        WITH sig AS ({{sig}}),
        banded AS ({{band}}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM banded a JOIN banded b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        ),
        est AS (
            SELECT p.doc_a, p.doc_b, ({{k_sql}}) AS k
            FROM pairs p
            JOIN sig sa ON sa.doc_id = p.doc_a
            JOIN sig sb ON sb.doc_id = p.doc_b
        ),
        sets AS (SELECT doc_id, {{sh}} AS sh FROM documents),
        scored AS (
            SELECT e.k,
                   len(list_intersect(a.sh, b.sh)) AS inter,
                   len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
            FROM est e
            JOIN sets a ON a.doc_id = e.doc_a
            JOIN sets b ON b.doc_id = e.doc_b
        )
        SELECT CAST(FLOOR(ABS(k / 16.0 - CAST(inter AS DOUBLE) / uni) * {ERR_BUCKETS}) AS INT)
                   AS err_bucket,
               COUNT(*) AS n_pairs,
               ROUND(SUM(k) / (16.0 * COUNT(*)), 6) AS avg_est,
               ROUND(CAST(SUM(inter) AS DOUBLE) / SUM(uni), 6) AS avg_exact
        FROM scored
        GROUP BY 1
    """,
    "bow_dedup_gain": """
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT e) AS n_exact_unique,
               COUNT(DISTINCT b) AS n_bow_unique,
               COUNT(DISTINCT e) - COUNT(DISTINCT b) AS bow_gain
        FROM (
            SELECT source,
                   md5(text) AS e,
                   md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS b
            FROM documents
        )
        GROUP BY source
    """,
}

_K_SQL = " + ".join(
    f"CASE WHEN sa.m_{_i} = sb.m_{_i} THEN 1 ELSE 0 END" for _i in range(N_MINHASH)
)
ORACLE["minhash_estimate_error"] = ORACLE["minhash_estimate_error"].format(
    sig=_SIG_SQL, band=_BAND_SQL, k_sql=_K_SQL, sh=_SHINGLES_SQL
)


def _sweep_oracle_sql() -> str:
    """One banded CTE + pair-count per sweep config, unioned — same
    signature CTE (and therefore identical pair sets) as Spark."""
    blocks = []
    for nb, rpb in SWEEP_CONFIGS:
        band_selects = []
        for b in range(nb):
            cols = " || ',' || ".join(
                f"CAST(m_{b * rpb + r} AS VARCHAR)" for r in range(rpb)
            )
            band_selects.append(
                f"SELECT doc_id, {b} AS band_idx, md5({cols}) AS band_key FROM sig"
            )
        band_sql = "\nUNION ALL\n".join(band_selects)
        blocks.append(
            f"""
            SELECT CAST({nb} AS INT) AS n_bands,
                   CAST({rpb} AS INT) AS rows_per_band,
                   COUNT(*) AS n_pairs
            FROM (
                SELECT DISTINCT a.doc_id, b.doc_id
                FROM ({band_sql}) a JOIN ({band_sql}) b
                  ON a.band_idx = b.band_idx AND a.band_key = b.band_key
                 AND a.doc_id < b.doc_id
            )"""
        )
    union = "\nUNION ALL\n".join(blocks)
    return f"WITH sig AS ({_SIG_SQL})\n{union}"


ORACLE["lsh_tuning_sweep"] = _sweep_oracle_sql()

ORACLE["ngram_novelty_profile"] = f"""
    WITH occ AS (
        SELECT DISTINCT doc_id, source, {H64_SQL.format(expr="shingle")} AS h
        FROM (
            SELECT doc_id, source,
                   unnest(list_transform(
                       generate_series(1, len(string_split(text,' ')) - 2),
                       i -> array_to_string(string_split(text,' ')[i:i+2], ' ')))
                       AS shingle
            FROM documents
        )
    ),
    first AS (SELECT h, MIN(doc_id) AS first_doc FROM occ GROUP BY h),
    per_doc AS (
        SELECT doc_id, source, COUNT(*) AS n_sh,
               CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
                   AS novel
        FROM occ JOIN first USING (h)
        GROUP BY doc_id, source
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(novel) AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(novel) AS DOUBLE) / SUM(n_sh), 6) AS novelty_rate
    FROM per_doc GROUP BY source
"""

ORACLE["quality_dup_correlation"] = f"""
    WITH sig AS ({_SIG_SQL}),
    banded AS ({_BAND_SQL}),
    pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    ),
    neardup AS (
        SELECT DISTINCT doc_id, 1 AS nd
        FROM (SELECT doc_a AS doc_id FROM pairs
              UNION ALL SELECT doc_b FROM pairs)
    ),
    sized AS (
        SELECT doc_id,
               LEAST(CAST(FLOOR(n_chars / 200) AS INT), {QUALITY_DUP_BUCKETS - 1})
                   AS len_bucket
        FROM documents
    )
    SELECT len_bucket, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN nd IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_neardup_docs,
           ROUND(AVG(CASE WHEN nd IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
               AS neardup_rate
    FROM sized LEFT JOIN neardup USING (doc_id)
    GROUP BY len_bucket
"""


def normalization_dedup_lift(spark: SparkSession, sf: str) -> DataFrame:
    """How much extra duplication text normalization exposes: per
    source, the distinct-digest count of the RAW text vs the text
    normalized the way web-corpus dedup pipelines do (lowercase, strip
    non-alphanumerics, collapse whitespace).  The gap is the
    duplicates that byte-exact dedup misses but normalized-exact dedup
    catches — the cheapest near-dup tier, sitting between
    ``dedup_exact_text`` and the MinHash family.

    Row-local normalization (lower / regexp_replace / trim, all
    whole-stage codegen) then ONE hash aggregate with two DISTINCT
    digests: Catalyst plans the multi-distinct via Expand (x2 row
    multiplier on the projected (source, digest) pairs — 32 bytes/row,
    not document text), each branch partially aggregated before the
    shuffle. Corpus text never leaves the map side.

    The regex classes stay in the Java-regex ∩ RE2 subset; DuckDB's
    regexp_replace needs the explicit 'g' flag to match Spark's
    replace-all semantics."""
    docs = table(spark, sf, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    d = docs.select(
        "source", F.md5("text").alias("raw_d"), F.md5(norm).alias("norm_d")
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("raw_d").alias("raw_distinct"),
            F.countDistinct("norm_d").alias("norm_distinct"),
        )
        .select(
            "source",
            "n_docs",
            "raw_distinct",
            "norm_distinct",
            (F.col("raw_distinct") - F.col("norm_distinct")).alias("merged_by_norm"),
            F.round(
                (F.col("raw_distinct") - F.col("norm_distinct"))
                / F.nullif(F.col("raw_distinct").cast("double"), F.lit(0.0)),
                6,
            ).alias("norm_dup_lift"),
        )
        .orderBy("source")
    )


# token-set Jaccard threshold tau = 19/20 = 0.95, kept as an integer
# rational: 0.95 has no exact double, and ceil(n * 0.95hat) overshoots
# at n = 20k (20 * 0.95hat = 19.000000000000004 -> ceil 20, exact 19),
# silently shortening the prefix and breaking completeness. All prefix
# and threshold math below is integer-only.
JACCARD_TAU_NUM, JACCARD_TAU_DEN = 19, 20


def jaccard_prefix_filter_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT token-set Jaccard >= 0.95 pairs within each language,
    computed with PPJoin-style prefix filtering — the lossless
    candidate-pruning alternative to LSH banding: instead of indexing
    EVERY token (``ngram_jaccard_pairs``'s inverted index) or accepting
    false negatives (MinHash bands), each document indexes only its
    prefix — its |d| - ceil(tau*|d|) + 1 globally RAREST tokens.  Any
    pair with J >= tau shares >= ceil(tau*|d|) tokens, so its
    smallest-ranked common token must land inside both prefixes
    (pigeonhole) — candidate generation is complete, and an exact
    array_intersect verification makes the output identical to the
    brute-force answer the oracle computes.

    Why this is the 100 TB shape: the inverted index is built ONLY from
    rare tokens — the head of the Zipf curve (the tokens that blow up
    an all-token index into near-cartesian posting lists, the skew AQE
    has to firefight in ``ngram_jaccard_pairs``) never enters the join
    by construction.  Stages: one (lang, token) count agg, one
    doc-keyed rank window (high-cardinality key), one equijoin on the
    rare prefix tokens, then a verify join that moves each candidate
    doc's sorted token array once.  ``n_t`` (the doc's distinct-token
    count) is projected row-locally BEFORE the explode — the exploded
    tokens are already distinct per doc, so ``size(toks)`` equals the
    ``count(*) OVER (PARTITION BY doc_id)`` an earlier version
    computed, dropping a whole window buffering pass over the
    exploded+joined token relation."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = F.array_distinct(F.split(F.col("text"), " "))
    t = docs.select(
        "doc_id", "lang", F.size(toks).alias("n_t"), F.explode(toks).alias("tok")
    )
    dfreq = t.groupBy("lang", "tok").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id")
    ranked = t.join(dfreq, ["lang", "tok"]).withColumn(
        "pos", F.row_number().over(w.orderBy("df", "tok"))
    )
    # ceil(tau * n) in exact integer arithmetic: (num*n + den-1) DIV den
    ceil_tau_n = F.floor(
        (F.lit(JACCARD_TAU_NUM) * F.col("n_t") + F.lit(JACCARD_TAU_DEN - 1))
        / F.lit(JACCARD_TAU_DEN)
    )
    prefix_len = F.col("n_t") - ceil_tau_n + 1
    # NOTE an inline-verification variant (arrays attached to prefix
    # rows, array_intersect computed in the candidate join's output —
    # the PPJoin paper's single-pass layout) was tried and measured 8x
    # WORSE here: the >= tau threshold references both join sides, so
    # PushPredicateThroughJoin moves it into the join CONDITION, where
    # the intersect evaluates per key-matched row pair ahead of the
    # cheap integer filters (and again in the project). Keeping
    # verification as separate joins AFTER the pair-dedup is what keeps
    # the expensive expression out of the join condition.
    pref = ranked.filter(F.col("pos") <= prefix_len).select(
        "lang", "tok", "doc_id", "pos", "n_t"
    )
    a, b = pref.alias("a"), pref.alias("b")
    num, den = F.lit(JACCARD_TAU_NUM), F.lit(JACCARD_TAU_DEN)
    # lossless candidate pruning inside the equijoin (all standard
    # PPJoin filters, all integer-only):
    # - size filter: J >= tau forces min(na,nb) >= tau * max(na,nb)
    # - positional filter: the overlap still reachable after this
    #   prefix position, min(na-pa, nb-pb)+1, must cover the required
    #   overlap alpha = ceil(num*(na+nb)/(num+den))
    # - asymmetric prefix: pairs are role-ordered by (n_t, doc_id), so
    #   side a is never the larger set; with na <= nb the required
    #   overlap is >= ceil(2*tau/(1+tau) * na), which shrinks a's
    #   effective prefix to n - ceil(2*num*n/(num+den)) + 1 — about
    #   half the indexed prefix (2*tau/(1+tau) ~ 0.974 vs tau = 0.95).
    #   The relation still stores the long (probe) prefix; the short
    #   bound applies as one extra integer predicate on a.pos with zero
    #   new stages.  On Zipfian vocabularies this halves the join's
    #   probe fan-out; on the harness's deliberately tiny-vocab docs
    #   table every doc ranks tokens in the same global order, so the
    #   local candidate count barely moves — the filter is for the
    #   100 TB shape, not the toy number.
    alpha = F.floor(
        (
            F.lit(JACCARD_TAU_NUM) * (F.col("a.n_t") + F.col("b.n_t"))
            + F.lit(JACCARD_TAU_NUM + JACCARD_TAU_DEN - 1)
        )
        / F.lit(JACCARD_TAU_NUM + JACCARD_TAU_DEN)
    )
    # ceil(2*num*n / (num+den)) in integer arithmetic
    short_bound = F.floor(
        (
            F.lit(2 * JACCARD_TAU_NUM) * F.col("a.n_t")
            + F.lit(JACCARD_TAU_NUM + JACCARD_TAU_DEN - 1)
        )
        / F.lit(JACCARD_TAU_NUM + JACCARD_TAU_DEN)
    )
    role_order = (F.col("a.n_t") < F.col("b.n_t")) | (
        (F.col("a.n_t") == F.col("b.n_t"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
    )
    cand = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.tok") == F.col("b.tok"))
            & role_order
            & (F.col("a.pos") <= F.col("a.n_t") - short_bound + 1)
            & (den * F.col("b.n_t") >= num * F.col("a.n_t"))
            & (den * F.col("a.n_t") >= num * F.col("b.n_t"))
            & (
                F.least(
                    F.col("a.n_t") - F.col("a.pos"), F.col("b.n_t") - F.col("b.pos")
                )
                + 1
                >= alpha
            ),
        )
        .select(
            F.col("a.lang").alias("lang"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sets = docs.select(
        "doc_id", F.array_sort(toks).alias("arr"), F.size(toks).alias("n")
    )
    sa = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("arr").alias("arr_a"),
        F.col("n").alias("na"),
    )
    sb = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("arr").alias("arr_b"),
        F.col("n").alias("nb"),
    )
    inter = F.size(F.array_intersect(F.col("arr_a"), F.col("arr_b")))
    verified = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("lang", "doc_a", "doc_b", inter.alias("i"), "na", "nb")
        # integer-arithmetic threshold: J = i/(na+nb-i) >= num/den
        # <=>  (num+den)*i >= num*(na+nb) — no float compare at the edge
        .filter(
            F.lit(JACCARD_TAU_NUM + JACCARD_TAU_DEN) * F.col("i")
            >= F.lit(JACCARD_TAU_NUM) * (F.col("na") + F.col("nb"))
        )
    )
    # roles were ordered by (n_t, doc_id); the output contract is
    # doc_a < doc_b by id (Jaccard is symmetric, so only the labels swap)
    return verified.select(
        "lang",
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b"),
        F.round(
            F.col("i") / (F.col("na") + F.col("nb") - F.col("i")).cast("double"), 6
        ).alias("jaccard"),
    ).orderBy("lang", "doc_a", "doc_b")


ORACLE["jaccard_prefix_filter_pairs"] = """
    WITH s AS (
        SELECT doc_id, lang,
               list_distinct(string_split(text, ' ')) AS arr
        FROM documents
    ),
    p AS (
        SELECT a.lang AS lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.arr, b.arr)) AS i,
               len(a.arr) AS na, len(b.arr) AS nb
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
    )
    SELECT lang, doc_a, doc_b,
           ROUND(i / CAST(na + nb - i AS DOUBLE), 6) AS jaccard
    FROM p
    WHERE 39 * i >= 19 * (na + nb)
"""

ORACLE["normalization_dedup_lift"] = """
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT raw_d) AS raw_distinct,
           COUNT(DISTINCT norm_d) AS norm_distinct,
           COUNT(DISTINCT raw_d) - COUNT(DISTINCT norm_d) AS merged_by_norm,
           ROUND((COUNT(DISTINCT raw_d) - COUNT(DISTINCT norm_d))
                 / CAST(NULLIF(COUNT(DISTINCT raw_d), 0) AS DOUBLE), 6)
               AS norm_dup_lift
    FROM (SELECT source, md5(text) AS raw_d,
                 md5(trim(regexp_replace(
                     regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                     ' +', ' ', 'g'))) AS norm_d
          FROM documents)
    GROUP BY source
"""

QUERIES = {
    "dedup_exact_text": dedup_exact_text,
    "minhash_band_pairs": minhash_band_pairs,
    "neardup_edit_verify": neardup_edit_verify,
    "simhash_fingerprints": simhash_fingerprints,
    "simhash_hamming_pairs": simhash_hamming_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "ngram_containment_pairs": ngram_containment_pairs,
    "embedding_cosine_stats": embedding_cosine_stats,
    "dedup_clusters": dedup_clusters,
    "dedup_survivorship": dedup_survivorship,
    "cross_source_span_overlap": cross_source_span_overlap,
    "span_dedup_stats": span_dedup_stats,
    "dup_cluster_size_histogram": dup_cluster_size_histogram,
    "bow_dedup_gain": bow_dedup_gain,
    "boilerplate_ngram_stats": boilerplate_ngram_stats,
    "incremental_dedup_batch": incremental_dedup_batch,
    "minhash_estimate_error": minhash_estimate_error,
    "lsh_tuning_sweep": lsh_tuning_sweep,
    "quality_dup_correlation": quality_dup_correlation,
    "ngram_novelty_profile": ngram_novelty_profile,
    "normalization_dedup_lift": normalization_dedup_lift,
    "jaccard_prefix_filter_pairs": jaccard_prefix_filter_pairs,
}


# ---------------------------------------------------------------------------
# round 7: exact substring-level duplication (Lee et al. 2022 class)
# ---------------------------------------------------------------------------

LDS_K = 8        # seed gram length (tokens): spans >= K are accounted exactly
LDS_HOT_CAP = 64  # grams occurring more often are excluded (hot-gram guard)


def longest_dup_substring_stats(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT cross-document duplicated-substring accounting — the
    ExactSubstr signal of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), which fixed-span hashing
    (``span_dedup_stats``) under-counts: a 93-token verbatim duplicate
    contributes at most 5 aligned 16-token spans but is a single
    maximal match here.  Per language: docs carrying any cross-doc
    duplicated token run >= K, the LONGEST such run, and the exact
    duplicated-token mass (union of all duplicated spans per doc).

    Algorithm (suffix arrays re-expressed as relational primitives):
    every K-token seed gram that occurs at >= 2 sites becomes a match
    seed; matching sites self-join on the gram hash; within a
    (doc_a, doc_b, offset-difference) DIAGONAL, consecutive seed
    positions chain into maximal runs (a run of g consecutive shared
    K-grams on one diagonal == one contiguous shared substring of
    g + K - 1 tokens — exact, not heuristic); per-doc interval union
    then yields the duplicated-token mass without double counting
    overlapping matches from different counterpart docs.

    Grams with corpus frequency > ``LDS_HOT_CAP`` are excluded, the
    standard practical guard every suffix-array dedup ships (a
    degenerate hot gram would otherwise quadratically explode the
    site self-join); a hotter-than-cap gram splits a run, so reported
    lengths are a LOWER bound in that (documented) corner — on this
    corpus the hottest gram occurs 3x, so the cap is inert.

    100 TB shape: gram sites shuffle as (doc, pos, 60-bit hash) — text
    never leaves the map side; the only pairwise step is confined to
    sites sharing a gram hash (output-bound, like PPJoin); run
    chaining is one window over the high-cardinality
    (doc_a, doc_b, diag) key; the interval union is one window keyed
    on doc_id.  No all-pairs step anywhere."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = F.split(F.col("text"), " ")
    base = docs.select("doc_id", "lang", toks.alias("toks"))
    grams = (
        base.filter(F.size("toks") >= LDS_K)
        .select(
            "doc_id",
            "toks",
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - (LDS_K - 1))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("bigint").alias("pos"),
            _h64_spark(
                F.concat_ws(" ", F.slice("toks", F.col("pos"), LDS_K))
            ).alias("h"),
        )
    )
    eligible = (
        grams.groupBy("h")
        .agg(F.count("*").alias("n_occ"))
        .filter((F.col("n_occ") >= 2) & (F.col("n_occ") <= LDS_HOT_CAP))
        .select("h")
    )
    sites = grams.join(eligible, "h")
    a = sites.select(F.col("doc_id").alias("da"), F.col("pos").alias("pa"), "h")
    b = sites.select(F.col("doc_id").alias("db"), F.col("pos").alias("pb"), "h")
    pairs = (
        a.join(b, "h")
        .filter(F.col("da") != F.col("db"))
        .select("da", "db", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w_run = Window.partitionBy("da", "db", "diag").orderBy("pa")
    runs = pairs.select(
        "da", "db", "diag", "pa",
        (F.col("pa") - F.row_number().over(w_run)).alias("isl"),
    )
    spans = (
        runs.groupBy("da", "db", "diag", "isl")
        .agg(
            F.min("pa").alias("s"),
            (F.max("pa") + F.lit(LDS_K - 1)).alias("e"),
        )
        .select("da", "s", "e")
        .distinct()
    )
    w_prev = (
        Window.partitionBy("da")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy("da")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = spans.select(
        "da", "s", "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        ).otherwise(0).alias("is_new"),
    )
    merged = (
        flagged.withColumn("gid", F.sum("is_new").over(w_cum))
        .groupBy("da", "gid")
        .agg(
            (F.max("e") - F.min("s") + 1).alias("covered"),
            F.max(F.col("e") - F.col("s") + 1).alias("max_span"),
        )
    )
    per_doc = merged.groupBy("da").agg(
        F.sum("covered").alias("dup_tokens"),
        F.max("max_span").alias("longest"),
    )
    info = base.select("doc_id", "lang", F.size("toks").cast("bigint").alias("n_toks"))
    return (
        info.join(per_doc, info.doc_id == per_doc.da, "left")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("dup_tokens").isNotNull().cast("bigint")).cast(
                "bigint"
            ).alias("n_docs_with_dup"),
            F.coalesce(F.max("longest"), F.lit(0)).cast("bigint").alias(
                "max_dup_len"
            ),
            F.sum(F.coalesce(F.col("dup_tokens"), F.lit(0))).cast(
                "bigint"
            ).alias("dup_tokens"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.round(
                F.sum(F.coalesce(F.col("dup_tokens"), F.lit(0)))
                / F.sum("n_toks").cast("double"),
                6,
            ).alias("dup_token_frac"),
        )
        .orderBy("lang")
    )


ORACLE["longest_dup_substring_stats"] = f"""
    WITH d AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    info AS (
        SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_toks FROM d
    ),
    grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               {H64_SQL.format(expr=(
                   "array_to_string(toks[CAST(i AS INT)"
                   ":CAST(i + " + str(LDS_K - 1) + " AS INT)], ' ')"
               ))} AS h
        FROM d, LATERAL unnest(generate_series(1, len(toks) - {LDS_K - 1}))
                 AS t(i)
        WHERE len(toks) >= {LDS_K}
    ),
    eligible AS (
        SELECT h FROM grams GROUP BY h
        HAVING COUNT(*) BETWEEN 2 AND {LDS_HOT_CAP}
    ),
    sites AS (SELECT g.* FROM grams g JOIN eligible USING (h)),
    pairs AS (
        SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa,
               a.pos - b.pos AS diag
        FROM sites a JOIN sites b ON a.h = b.h AND a.doc_id != b.doc_id
    ),
    runs AS (
        SELECT da, db, diag, pa,
               pa - ROW_NUMBER() OVER (PARTITION BY da, db, diag
                                       ORDER BY pa) AS isl
        FROM pairs
    ),
    spans AS (
        SELECT DISTINCT da, s, e FROM (
            SELECT da, MIN(pa) AS s, MAX(pa) + {LDS_K - 1} AS e
            FROM runs GROUP BY da, db, diag, isl
        )
    ),
    flagged AS (
        SELECT da, s, e,
               CASE WHEN s > COALESCE(
                   MAX(e) OVER (PARTITION BY da ORDER BY s, e
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS is_new
        FROM spans
    ),
    merged AS (
        SELECT da, gid, MAX(e) - MIN(s) + 1 AS covered,
               MAX(e - s + 1) AS max_span
        FROM (SELECT da, s, e,
                     SUM(is_new) OVER (PARTITION BY da ORDER BY s, e
                                       ROWS UNBOUNDED PRECEDING) AS gid
              FROM flagged)
        GROUP BY da, gid
    ),
    per_doc AS (
        SELECT da, SUM(covered) AS dup_tokens, MAX(max_span) AS longest
        FROM merged GROUP BY da
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN dup_tokens IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_with_dup,
           CAST(COALESCE(MAX(longest), 0) AS BIGINT) AS max_dup_len,
           CAST(SUM(COALESCE(dup_tokens, 0)) AS BIGINT) AS dup_tokens,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           ROUND(SUM(COALESCE(dup_tokens, 0))
                 / CAST(SUM(n_toks) AS DOUBLE), 6) AS dup_token_frac
    FROM info LEFT JOIN per_doc ON info.doc_id = per_doc.da
    GROUP BY lang ORDER BY lang
"""

QUERIES["longest_dup_substring_stats"] = longest_dup_substring_stats


STITCH_K = 3  # boundary gram length for continuation detection


def doc_stitch_links(spark: SparkSession, sf: str) -> DataFrame:
    """Chunk-reassembly audit: pairs of documents where one document's
    LAST ``STITCH_K`` tokens equal another's FIRST ``STITCH_K`` tokens
    — the signature of a crawler or chunker that split one logical
    document into consecutive records.  Training pipelines stitch (or
    at least co-shard) such fragments so context windows don't cut
    mid-document.  Per (tail-doc lang, head-doc lang): link count and
    distinct fragment counts on each side.

    100 TB shape: each doc contributes exactly ONE boundary row per
    side (two 60-bit hashes — head gram, tail gram), so the equijoin
    input is one slim row per document and the join key is the gram
    hash; output is bounded by the lang-pair matrix."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    toks = F.split(F.col("text"), " ")
    base = docs.select("doc_id", "lang", toks.alias("toks")).filter(
        F.size("toks") >= STITCH_K
    )
    bounds = base.select(
        "doc_id",
        "lang",
        _h64_spark(
            F.concat_ws(" ", F.slice("toks", F.lit(1), STITCH_K))
        ).alias("head_h"),
        _h64_spark(
            F.concat_ws(
                " ", F.slice("toks", F.size("toks") - (STITCH_K - 1), STITCH_K)
            )
        ).alias("tail_h"),
    )
    tails = bounds.select(
        F.col("doc_id").alias("tail_doc"),
        F.col("lang").alias("tail_lang"),
        F.col("tail_h").alias("h"),
    )
    heads = bounds.select(
        F.col("doc_id").alias("head_doc"),
        F.col("lang").alias("head_lang"),
        F.col("head_h").alias("h"),
    )
    return (
        tails.join(heads, "h")
        .filter(F.col("tail_doc") != F.col("head_doc"))
        .groupBy("tail_lang", "head_lang")
        .agg(
            F.count("*").alias("n_links"),
            F.count_distinct("tail_doc").alias("n_tail_docs"),
            F.count_distinct("head_doc").alias("n_head_docs"),
        )
        .orderBy("tail_lang", "head_lang")
    )


ORACLE["doc_stitch_links"] = f"""
    WITH base AS (
        SELECT doc_id, lang, string_split(text, ' ') AS toks
        FROM documents
    ),
    bounds AS (
        SELECT doc_id, lang,
               {H64_SQL.format(expr=(
                   "array_to_string(toks[1:" + str(STITCH_K) + "], ' ')"
               ))} AS head_h,
               {H64_SQL.format(expr=(
                   "array_to_string(toks[len(toks) - " + str(STITCH_K - 1)
                   + ":len(toks)], ' ')"
               ))} AS tail_h
        FROM base WHERE len(toks) >= {STITCH_K}
    )
    SELECT t.lang AS tail_lang, hd.lang AS head_lang,
           COUNT(*) AS n_links,
           CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS n_tail_docs,
           CAST(COUNT(DISTINCT hd.doc_id) AS BIGINT) AS n_head_docs
    FROM bounds t JOIN bounds hd
      ON t.tail_h = hd.head_h AND t.doc_id != hd.doc_id
    GROUP BY 1, 2 ORDER BY tail_lang, head_lang
"""

QUERIES["doc_stitch_links"] = doc_stitch_links


# ---------------------------------------------------------------------------
# round 7: Unicode canonical/compatibility fold for dedup preprocessing
# ---------------------------------------------------------------------------
#
# Real multilingual corpora carry the same text in NFC and NFD forms
# ("café" precomposed vs "cafe" + COMBINING ACUTE) and in fullwidth/
# ligature compatibility variants — byte-level hashing treats them as
# distinct documents and dedup silently misses them.  Spark 4 exposes
# ICU collations but no normal-form FUNCTION, so the canonical step is
# an explicit replace chain over a DECLARED subset (Latin vowels +
# n/c with the five common combining marks — built from Python's
# unicodedata at import so each pair is definitionally correct NFC);
# the compatibility fold is a single translate() over the fullwidth
# ASCII block + width-space variants plus the fi/fl ligatures.  The
# DuckDB oracle uses its native nfc_normalize() for the canonical step
# — the engines agree everywhere the declared subset covers (proven in
# tests/test_properties.py on decomposed inputs; outside the subset
# the Spark chain is a documented no-op, like the multimodal codec
# stub).

import unicodedata as _ud

_NFC_PAIRS: list[tuple[str, str]] = [
    (b + m, _ud.normalize("NFC", b + m))
    # combining grave / acute / circumflex / diaeresis / tilde / cedilla
    for b in "aeiouAEIOU"
    for m in ("\u0300", "\u0301", "\u0302", "\u0308")
] + [
    (b + m, _ud.normalize("NFC", b + m))
    for b, m in (("n", "\u0303"), ("N", "\u0303"),
                 ("c", "\u0327"), ("C", "\u0327"))
]
# fullwidth ! .. ~ (U+FF01..U+FF5E) -> ASCII 0x21..0x7E, plus
# ideographic space / NBSP -> plain space
_FOLD_SRC = "".join(chr(0xFF01 + i) for i in range(94)) + "\u3000\u00a0"
_FOLD_DST = "".join(chr(0x21 + i) for i in range(94)) + "  "
_LIGATURES = [("ﬁ", "fi"), ("ﬂ", "fl")]


def _nfc_spark(col: Column) -> Column:
    for seq, comp in _NFC_PAIRS:
        col = F.replace(col, F.lit(seq), F.lit(comp))
    return col


def _fold_spark(col: Column) -> Column:
    col = F.translate(col, _FOLD_SRC, _FOLD_DST)
    for lig, asc in _LIGATURES:
        col = F.replace(col, F.lit(lig), F.lit(asc))
    return col


def unicode_fold_dedup_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode-normalization dedup audit per language: how many docs
    change under NFC recomposition, how many more under the
    compatibility fold (fullwidth -> ASCII, width spaces, fi/fl
    ligatures), and the dedup lift — distinct digests before vs after
    the full fold.  ``normalization_dedup_lift`` measures case/
    punctuation normalization; this measures CODE-POINT normalization,
    the step that must run before either on multilingual crawls.

    100 TB shape: both normal forms are row-local projections (replace
    chains + one translate — all inside whole-stage codegen, no UDF);
    the only shuffle carries (lang, two 16-byte digests) into one
    partial+final aggregate."""
    docs = table(spark, sf, "documents")
    nfc = _nfc_spark(F.col("text"))
    fold = _fold_spark(nfc)
    d = docs.select(
        "lang",
        (nfc != F.col("text")).cast("bigint").alias("chg_nfc"),
        (fold != nfc).cast("bigint").alias("chg_fold"),
        F.md5("text").alias("raw_d"),
        F.md5(fold).alias("fold_d"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("chg_nfc").cast("bigint").alias("n_changed_nfc"),
            F.sum("chg_fold").cast("bigint").alias("n_changed_fold"),
            F.count_distinct("raw_d").alias("raw_distinct"),
            F.count_distinct("fold_d").alias("fold_distinct"),
            (F.count_distinct("raw_d") - F.count_distinct("fold_d")).alias(
                "merged_by_fold"
            ),
        )
        .orderBy("lang")
    )


def _fold_sql(expr: str) -> str:
    src = _FOLD_SRC.replace("'", "''")
    dst = _FOLD_DST.replace("'", "''")
    out = f"translate({expr}, '{src}', '{dst}')"
    for lig, asc in _LIGATURES:
        out = f"replace({out}, '{lig}', '{asc}')"
    return out


ORACLE["unicode_fold_dedup_stats"] = f"""
    WITH d AS (
        SELECT lang,
               CASE WHEN nfc_normalize(text) != text THEN 1 ELSE 0 END
                   AS chg_nfc,
               CASE WHEN {_fold_sql('nfc_normalize(text)')}
                        != nfc_normalize(text) THEN 1 ELSE 0 END
                   AS chg_fold,
               md5(text) AS raw_d,
               md5({_fold_sql('nfc_normalize(text)')}) AS fold_d
        FROM documents
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(chg_nfc) AS BIGINT) AS n_changed_nfc,
           CAST(SUM(chg_fold) AS BIGINT) AS n_changed_fold,
           COUNT(DISTINCT raw_d) AS raw_distinct,
           COUNT(DISTINCT fold_d) AS fold_distinct,
           COUNT(DISTINCT raw_d) - COUNT(DISTINCT fold_d) AS merged_by_fold
    FROM d GROUP BY lang ORDER BY lang
"""

QUERIES["unicode_fold_dedup_stats"] = unicode_fold_dedup_stats


# ---------------------------------------------------------------------------
# round 7: batch twin of the streaming near-dup suppression sink
# ---------------------------------------------------------------------------

NEARDUP_LEDGER_BATCHES = 3


def _neardup_batch_states(batched: DataFrame) -> DataFrame:
    """(batch_id, doc_id, status) replaying
    ``streaming/jobs.py::write_foreach_batch_neardup``'s cross-batch
    recurrence as ONE lazy plan over a batch relation exposing
    (doc_id, text, batch_id): per batch, in order, a doc is

      * ``hist``     — suppressed because one of its LSH band buckets
        is already occupied by a doc ACCEPTED in an earlier batch
        (the sink's accumulated ``bands_path`` state);
      * ``within``   — suppressed by a smaller-id same-batch doc
        sharing a (post-history) bucket;
      * ``bandless`` — accepted with no bands (< 3 tokens);
      * ``kept``     — accepted with bands (these bands extend the
        state the NEXT batch is checked against).

    The four statuses partition each batch, so the ledger's n_in is
    COUNT(*).  Unrolled over ``NEARDUP_LEDGER_BATCHES`` fixed rounds
    like the k-means/LPA entries — each round adds one band-keyed
    semi/anti join pass, never a pairwise step.

    The band table and each batch's per-doc status table materialize
    via ``localCheckpoint`` — the same lineage cut the streaming sink
    itself performs per micro-batch (streaming/jobs.py:407).  Without
    it the round-k branches each re-derive the full minhash/banding
    subtree and the recurrence lineage compounds quadratically
    (measured 20-25 s at sf0.01 lazy vs ~2 s checkpointed).

    Shape (r11, guide §2.4): within-batch domination is ONE window-min
    over the band bucket plus one per-doc aggregate — a doc is
    ``within``-suppressed iff any of its buckets holds a smaller
    doc_id, so ``min(doc_id) over (bucket) < doc_id`` aggregated
    per doc replaces the bucket self-semi-join + two distincts + one
    anti-join of the previous shape.  That also fuses the within/kept
    split into a single checkpointed status table per batch (2
    checkpoint jobs per batch became 1).  Contract: callers build
    ``batch_id = pmod(doc_id, NEARDUP_LEDGER_BATCHES)`` (both ledger
    twins do), so the band table re-derives it as a projection instead
    of re-joining the doc table.  Same-session interleaved A/B at
    sf0.1: neardup 3.25 → 2.61 s, funnel 3.61 → 2.77 s, ledger rows
    identical."""
    bands_all = band_keys_for(batched).withColumn(
        "batch_id", F.pmod("doc_id", F.lit(NEARDUP_LEDGER_BATCHES))
    ).localCheckpoint(eager=True)
    parts: list[DataFrame] = []
    seen: DataFrame | None = None
    w = Window.partitionBy("band_idx", "band_key")
    for k in range(NEARDUP_LEDGER_BATCHES):
        bk = batched.filter(F.col("batch_id") == k).select("doc_id")
        bands_k = bands_all.filter(F.col("batch_id") == k).select(
            "doc_id", "band_idx", "band_key"
        )
        if seen is not None:
            collided = (
                bands_k.join(seen, ["band_idx", "band_key"], "left_semi")
                .select("doc_id")
                .distinct()
            )
            bands_kp = bands_k.join(collided, "doc_id", "left_anti")
            hist = collided.select("doc_id", F.lit("hist").alias("status"))
        else:
            bands_kp = bands_k
            hist = None
        per_doc = (
            bands_kp.withColumn("mn", F.min("doc_id").over(w))
            .groupBy("doc_id")
            .agg(
                F.max((F.col("mn") < F.col("doc_id")).cast("int")).alias("dom")
            )
        )
        banded_status = per_doc.select(
            "doc_id",
            F.when(F.col("dom") == 1, F.lit("within"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
        # anti-join dedups its right side itself — no distinct needed
        bandless = bk.join(
            bands_k.select("doc_id"), "doc_id", "left_anti"
        ).select("doc_id", F.lit("bandless").alias("status"))
        st_k = banded_status.unionByName(bandless)
        if hist is not None:
            st_k = st_k.unionByName(hist)
        # ONE materialization per batch: the status table is what both
        # the ledger rollup and every later batch's history state read
        st_k = st_k.localCheckpoint(eager=True)
        parts.append(
            st_k.select(F.lit(k).alias("batch_id"), "doc_id", "status")
        )
        new_seen = bands_k.join(
            st_k.filter(F.col("status") == "kept"), "doc_id", "left_semi"
        ).select("band_idx", "band_key")
        seen = new_seen if seen is None else seen.unionByName(new_seen)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _ledger_rollup(states: DataFrame) -> DataFrame:
    return (
        states.groupBy("batch_id")
        .agg(
            F.count("*").alias("n_in"),
            F.sum((F.col("status") == "hist").cast("bigint")).cast(
                "bigint"
            ).alias("n_hist_suppressed"),
            F.sum((F.col("status") == "within").cast("bigint")).cast(
                "bigint"
            ).alias("n_within_suppressed"),
            F.sum((F.col("status") == "bandless").cast("bigint")).cast(
                "bigint"
            ).alias("n_bandless_accepted"),
            F.sum(
                F.col("status").isin("kept", "bandless").cast("bigint")
            ).cast("bigint").alias("n_accepted"),
        )
        .orderBy("batch_id")
    )


def neardup_suppression_ledger(spark: SparkSession, sf: str) -> DataFrame:
    """Batch twin of ``write_foreach_batch_neardup``'s suppression
    ledger (streaming/jobs.py:341): the foreachBatch sink had only
    pytest evidence — this replays the SAME accept/suppress recurrence
    (history-bucket collision, within-batch smaller-id domination,
    bandless acceptance, band-state accumulation) over the documents
    table with ``doc_id % 3`` standing in for micro-batch arrival
    order, so the sink's cross-batch semantics get a hard external
    DuckDB row.

    100 TB shape: per batch one band-keyed semi-join against the
    accumulated state + one band-bucket self-semi-join — the streaming
    sink's own join plan, replayed lazily."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    batched = docs.select(
        "doc_id", "text",
        F.pmod("doc_id", F.lit(NEARDUP_LEDGER_BATCHES)).alias("batch_id"),
    )
    return _ledger_rollup(_neardup_batch_states(batched))


def _neardup_states_sql(src: str) -> str:
    """Unrolled DuckDB CTE chain mirroring ``_neardup_batch_states``
    over a CTE named ``src`` exposing (doc_id, text, batch_id).
    Returns the body of a ``states(batch_id, doc_id, status)``
    relation, assuming ``sig``/``banded`` CTEs are NOT yet defined."""
    ctes = [
        f"sig AS ({_sig_sql_from(src)})",
        f"banded AS ({_BAND_SQL})",
        f"""bands AS (
            SELECT b.doc_id, b.band_idx, b.band_key, s.batch_id
            FROM banded b JOIN {src} s ON b.doc_id = s.doc_id
        )""",
    ]
    state_selects = []
    for k in range(NEARDUP_LEDGER_BATCHES):
        if k == 0:
            ctes.append(
                "bp0 AS (SELECT doc_id, band_idx, band_key "
                "FROM bands WHERE batch_id = 0)"
            )
        else:
            ctes.append(
                f"""coll{k} AS (
                SELECT DISTINCT doc_id FROM bands
                WHERE batch_id = {k}
                  AND EXISTS (SELECT 1 FROM seen{k - 1} s
                              WHERE s.band_idx = bands.band_idx
                                AND s.band_key = bands.band_key)
            )"""
            )
            ctes.append(
                f"""bp{k} AS (
                SELECT doc_id, band_idx, band_key FROM bands
                WHERE batch_id = {k}
                  AND doc_id NOT IN (SELECT doc_id FROM coll{k})
            )"""
            )
            state_selects.append(
                f"SELECT {k} AS batch_id, doc_id, 'hist' AS status FROM coll{k}"
            )
        ctes.append(
            f"""dom{k} AS (
            SELECT DISTINCT a.doc_id FROM bp{k} a JOIN bp{k} b
              ON a.band_idx = b.band_idx AND a.band_key = b.band_key
             AND b.doc_id < a.doc_id
        )"""
        )
        ctes.append(
            f"""surv{k} AS (
            SELECT DISTINCT doc_id FROM bp{k}
            WHERE doc_id NOT IN (SELECT doc_id FROM dom{k})
        )"""
        )
        ctes.append(
            f"""bl{k} AS (
            SELECT doc_id FROM {src} WHERE batch_id = {k}
              AND doc_id NOT IN
                  (SELECT DISTINCT doc_id FROM bands WHERE batch_id = {k})
        )"""
        )
        if k == 0:
            ctes.append(
                "seen0 AS (SELECT band_idx, band_key FROM bp0 "
                "WHERE doc_id IN (SELECT doc_id FROM surv0))"
            )
        else:
            ctes.append(
                f"""seen{k} AS (
                SELECT band_idx, band_key FROM seen{k - 1}
                UNION ALL
                SELECT band_idx, band_key FROM bp{k}
                WHERE doc_id IN (SELECT doc_id FROM surv{k})
            )"""
            )
        state_selects.append(
            f"SELECT {k} AS batch_id, doc_id, 'within' AS status FROM dom{k}"
        )
        state_selects.append(
            f"SELECT {k} AS batch_id, doc_id, 'bandless' AS status FROM bl{k}"
        )
        state_selects.append(
            f"SELECT {k} AS batch_id, doc_id, 'kept' AS status FROM surv{k}"
        )
    states = "\nUNION ALL\n".join(state_selects)
    return ",\n".join(ctes) + f",\nstates AS (\n{states}\n)"


_LEDGER_ROLLUP_SQL = """
    SELECT batch_id, COUNT(*) AS n_in,
           CAST(SUM(CASE WHEN status = 'hist' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hist_suppressed,
           CAST(SUM(CASE WHEN status = 'within' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_within_suppressed,
           CAST(SUM(CASE WHEN status = 'bandless' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bandless_accepted,
           CAST(SUM(CASE WHEN status IN ('kept', 'bandless') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_accepted
    FROM states GROUP BY batch_id ORDER BY batch_id
"""

ORACLE["neardup_suppression_ledger"] = (
    "WITH batched AS (SELECT doc_id, text, doc_id % "
    + str(NEARDUP_LEDGER_BATCHES)
    + " AS batch_id FROM documents),\n"
    + _neardup_states_sql("batched")
    + _LEDGER_ROLLUP_SQL
)

QUERIES["neardup_suppression_ledger"] = neardup_suppression_ledger


# ---------------------------------------------------------------------------
# Round 8: paragraph-level (CCNet-class) boilerplate REMOVAL accounting.
#
# span_dedup_stats / longest_dup_substring_stats MEASURE sub-document
# duplication; this family accounts for actually REMOVING it at
# paragraph granularity, the CCNet recipe (Wenzek et al. 2020): hash
# paragraphs, keep the first occurrence of each duplicated paragraph
# (cross-corpus dedup), or drop every occurrence of paragraphs repeated
# across >= N docs of one source (boilerplate: nav bars, footers,
# license headers). Documents here are single-space word streams, so a
# "paragraph" is a disjoint PARA_TOKENS-word chunk (last partial chunk
# included — a real paragraph remnant, unlike the shingle family's
# full-width-only spans).
#
# Shared scale shape: explode chunk START INDEX (codegen path), hash to
# 60 bits immediately — every shuffle from there carries (hash, small
# ints), never paragraph text; first-occurrence/frequency passes are
# single partial+final aggs on the hash; attribution joins are
# hash-equi. No pairwise step anywhere.

PARA_TOKENS = 12  # pseudo-paragraph width (disjoint chunks)
PARA_BOILER_MIN_DOCS = 3  # within-source boilerplate threshold

# First-occurrence composite key: struct(doc_id, i), compared
# lexicographically by field order in BOTH engines — unbounded, unlike
# the earlier doc_id * 2^20 + i integer packing, which would alias a
# document with >= 2^20 paragraphs into the next doc_id's key space
# and could mis-pick the canonical survivor.
_PARA_KEY = "{'d': doc_id, 'i': i}"  # DuckDB struct literal twin


def _para_key_col():
    """struct(doc_id, i) — the Spark side of the composite key."""
    return F.struct(F.col("doc_id").alias("d"), F.col("i").alias("i"))


def _paragraph_occurrences(docs: DataFrame, *keep: str) -> DataFrame:
    """(keep..., doc_id, i, n_chunks, p_tok, h): one row per disjoint
    PARA_TOKENS-word chunk occurrence. p_tok = tokens in this chunk
    (the last chunk may be partial); h = portable 60-bit text hash."""
    toks = F.split(F.col("text"), " ")
    cols = [c for c in keep if c != "doc_id"]
    return (
        docs.select(*cols, "doc_id", toks.alias("toks"), F.size(toks).alias("n_tok"))
        .select(
            *cols,
            "doc_id",
            "toks",
            "n_tok",
            F.floor((F.col("n_tok") - 1) / PARA_TOKENS).cast("int").alias("last_i"),
            F.explode(
                F.sequence(F.lit(0), F.floor((F.col("n_tok") - 1) / PARA_TOKENS))
            ).alias("i"),
        )
        .select(
            *cols,
            "doc_id",
            F.col("i").cast("int").alias("i"),
            (F.col("last_i") + 1).alias("n_chunks"),
            F.least(F.lit(PARA_TOKENS), F.col("n_tok") - F.col("i") * PARA_TOKENS).alias("p_tok"),
            _h64_spark(
                F.concat_ws(" ", F.slice("toks", F.col("i") * PARA_TOKENS + 1, PARA_TOKENS))
            ).alias("h"),
        )
    )


def _para_sql(keep: str) -> str:
    """DuckDB twin of ``_paragraph_occurrences`` over ``documents``:
    a CTE body yielding (keep..., doc_id, i, n_chunks, p_tok, h)."""
    para = (
        f"array_to_string(toks[CAST(i * {PARA_TOKENS} + 1 AS INT)"
        f":CAST(i * {PARA_TOKENS} + {PARA_TOKENS} AS INT)], ' ')"
    )
    cols = f"{keep}, " if keep else ""
    return f"""
        SELECT {cols}doc_id, CAST(i AS INT) AS i,
               CAST((n_tok - 1) // {PARA_TOKENS} + 1 AS BIGINT) AS n_chunks,
               LEAST({PARA_TOKENS}, n_tok - i * {PARA_TOKENS}) AS p_tok,
               {H64_SQL.format(expr=para)} AS h
        FROM (
            SELECT {cols}doc_id, toks, len(toks) AS n_tok,
                   unnest(generate_series(0, (len(toks) - 1) // {PARA_TOKENS})) AS i
            FROM (SELECT {cols}doc_id, string_split(text, ' ') AS toks
                  FROM documents)
        )
    """


def ccnet_paragraph_dedup_stats(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet cross-corpus paragraph dedup, REMOVAL accounting per
    language: every paragraph occurrence except the first (lowest
    (doc_id, chunk_idx) composite key) of its hash is removed. Emits
    the removal ledger: occurrences, removed occurrences, token mass
    removed/kept, removal rate, and how many docs were touched.

    Determinism: the survivor is the exact lexicographic min of the
    struct(doc_id, chunk_idx) composite key — no arbitrary-row
    semantics, no packing bound on paragraphs per document; all masses
    are exact integer sums with one final double division.

    100 TB shape: ONE min-agg keyed on the 60-bit hash (shuffle carries
    (hash, bigint)), then a hash-equi join back; AQE handles the hot
    digests (empty/template paragraphs) like any skewed agg key."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    occ = _paragraph_occurrences(docs, "lang").withColumn(
        "k", _para_key_col()
    )
    first = occ.groupBy("h").agg(F.min("k").alias("first_k"))
    j = occ.join(first, "h").withColumn(
        "removed", (F.col("k") != F.col("first_k")).cast("bigint")
    )
    return (
        j.groupBy("lang")
        .agg(
            F.count("*").alias("n_paras"),
            F.sum("removed").alias("n_removed"),
            F.sum("p_tok").alias("tokens_total"),
            F.sum(F.col("p_tok") * F.col("removed")).alias("tokens_removed"),
            F.round(
                F.sum(F.col("p_tok") * F.col("removed")).cast("double")
                / F.sum("p_tok").cast("double"),
                6,
            ).alias("removal_rate"),
            F.count_distinct(
                F.when(F.col("removed") == 1, F.col("doc_id"))
            ).alias("n_docs_touched"),
        )
        .orderBy("lang")
    )


ORACLE["ccnet_paragraph_dedup_stats"] = f"""
    WITH occ AS (
        SELECT lang, doc_id, i, p_tok, h,
               {_PARA_KEY} AS k
        FROM ({_para_sql("lang")})
    ),
    first AS (SELECT h, MIN(k) AS first_k FROM occ GROUP BY h)
    SELECT lang, COUNT(*) AS n_paras,
           CAST(SUM(CASE WHEN k != first_k THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           CAST(SUM(p_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN k != first_k THEN p_tok ELSE 0 END) AS BIGINT)
               AS tokens_removed,
           ROUND(CAST(SUM(CASE WHEN k != first_k THEN p_tok ELSE 0 END)
                      AS DOUBLE) / CAST(SUM(p_tok) AS DOUBLE), 6)
               AS removal_rate,
           CAST(COUNT(DISTINCT CASE WHEN k != first_k THEN doc_id END)
                AS BIGINT) AS n_docs_touched
    FROM occ JOIN first USING (h)
    GROUP BY lang ORDER BY lang
"""

QUERIES["ccnet_paragraph_dedup_stats"] = ccnet_paragraph_dedup_stats


def boilerplate_para_removal_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Within-source boilerplate paragraph removal (the CCNet/RefinedWeb
    line-dedup rule): a paragraph repeated in >= PARA_BOILER_MIN_DOCS
    distinct documents OF THE SAME SOURCE is boilerplate there, and ALL
    its occurrences in that source are dropped (unlike cross-corpus
    dedup, no first occurrence survives — a nav bar is noise every
    time). Per source: docs, paragraph occurrences, removed
    occurrences, token mass removed/kept, boilerplate fraction.

    100 TB shape: the distinct-doc frequency pass is one partial+final
    count-distinct agg keyed on (source, hash); the hot set joins back
    on the same key, sized by AQE (no forced broadcast — a template
    farm can make it large), same policy as boilerplate_ngram_stats."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    occ = _paragraph_occurrences(docs, "source")
    hot = (
        occ.groupBy("source", "h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= PARA_BOILER_MIN_DOCS)
        .select("source", "h", F.lit(1).alias("boiler"))
    )
    j = occ.join(hot, ["source", "h"], "left").withColumn(
        "rm", F.coalesce(F.col("boiler"), F.lit(0)).cast("bigint")
    )
    return (
        j.groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_paras"),
            F.sum("rm").alias("n_removed"),
            F.sum(F.col("p_tok") * F.col("rm")).alias("tokens_removed"),
            F.sum(F.col("p_tok") * (1 - F.col("rm"))).alias("tokens_kept"),
            F.round(
                F.sum("rm").cast("double") / F.count("*").cast("double"), 6
            ).alias("boiler_frac"),
        )
        .orderBy("source")
    )


ORACLE["boilerplate_para_removal_by_source"] = f"""
    WITH occ AS ({_para_sql("source")}),
    hot AS (
        SELECT source, h, 1 AS boiler
        FROM (SELECT source, h, COUNT(DISTINCT doc_id) AS nd
              FROM occ GROUP BY source, h)
        WHERE nd >= {PARA_BOILER_MIN_DOCS}
    )
    SELECT occ.source AS source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           COUNT(*) AS n_paras,
           CAST(SUM(CASE WHEN boiler IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed,
           CAST(SUM(CASE WHEN boiler IS NOT NULL THEN p_tok ELSE 0 END)
                AS BIGINT) AS tokens_removed,
           CAST(SUM(CASE WHEN boiler IS NULL THEN p_tok ELSE 0 END) AS BIGINT)
               AS tokens_kept,
           ROUND(CAST(SUM(CASE WHEN boiler IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS boiler_frac
    FROM occ LEFT JOIN hot ON occ.source = hot.source AND occ.h = hot.h
    GROUP BY occ.source ORDER BY source
"""

QUERIES["boilerplate_para_removal_by_source"] = boilerplate_para_removal_by_source


def doc_shrinkage_after_para_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document survivor-fraction histogram after CCNet paragraph
    dedup (first occurrence keeps): how much of each document's token
    mass survives removal, bucketed into deciles of kept fraction —
    the distribution a curation team reads to decide whether paragraph
    dedup is trimming templates or gutting content. Also counts docs
    emptied entirely (every paragraph was a non-first duplicate).

    Cross-engine determinism: kept_frac is ONE double division of two
    exact integer sums, then floor(x*10) — the identical IEEE sequence
    in both engines; bucket 10 (kept_frac == 1.0) folds into 9."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    occ = _paragraph_occurrences(docs).withColumn(
        "k", _para_key_col()
    )
    first = occ.groupBy("h").agg(F.min("k").alias("first_k"))
    per_doc = (
        occ.join(first, "h")
        .groupBy("doc_id")
        .agg(
            F.sum("p_tok").alias("t_tok"),
            F.sum(F.when(F.col("k") == F.col("first_k"), F.col("p_tok")).otherwise(0)).alias("k_tok"),
        )
    )
    bucket = F.least(
        F.floor(F.col("k_tok").cast("double") / F.col("t_tok").cast("double") * 10),
        F.lit(9),
    ).cast("int")
    return (
        per_doc.select(
            bucket.alias("kept_decile"),
            (F.col("k_tok") == 0).cast("bigint").alias("emptied"),
            "t_tok",
            "k_tok",
        )
        .groupBy("kept_decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("emptied").alias("n_emptied"),
            F.sum("t_tok").alias("tokens_before"),
            F.sum("k_tok").alias("tokens_after"),
        )
        .orderBy("kept_decile")
    )


ORACLE["doc_shrinkage_after_para_dedup"] = f"""
    WITH occ AS (
        SELECT doc_id, i, p_tok, h, {_PARA_KEY} AS k
        FROM ({_para_sql("")})
    ),
    first AS (SELECT h, MIN(k) AS first_k FROM occ GROUP BY h),
    per_doc AS (
        SELECT doc_id, SUM(p_tok) AS t_tok,
               SUM(CASE WHEN k = first_k THEN p_tok ELSE 0 END) AS k_tok
        FROM occ JOIN first USING (h) GROUP BY doc_id
    )
    SELECT CAST(LEAST(FLOOR(CAST(k_tok AS DOUBLE) / CAST(t_tok AS DOUBLE)
                            * 10), 9) AS INT) AS kept_decile,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN k_tok = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_emptied,
           CAST(SUM(t_tok) AS BIGINT) AS tokens_before,
           CAST(SUM(k_tok) AS BIGINT) AS tokens_after
    FROM per_doc GROUP BY 1 ORDER BY kept_decile
"""

QUERIES["doc_shrinkage_after_para_dedup"] = doc_shrinkage_after_para_dedup


def paragraph_df_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Paragraph document-frequency spectrum: for each df (number of
    distinct documents containing a paragraph), how many distinct
    paragraphs sit at that df and how much occurrence/token mass they
    carry. The spectrum is what tunes PARA_BOILER_MIN_DOCS: the
    boilerplate threshold should sit past the knee where organic
    repetition ends and template mass begins (same role the tuning
    sweep plays for MinHash band counts).

    Two strictly-shrinking aggregates: occurrences -> per-hash (df,
    occ, tokens), then per-df rollup — the dup_cluster_size_histogram
    shape at paragraph granularity."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    occ = _paragraph_occurrences(docs)
    per_h = occ.groupBy("h").agg(
        F.count_distinct("doc_id").alias("df"),
        F.count("*").alias("n_occ"),
        F.sum("p_tok").alias("tok"),
    )
    return (
        per_h.groupBy("df")
        .agg(
            F.count("*").alias("n_paragraphs"),
            F.sum("n_occ").alias("n_occurrences"),
            F.sum("tok").alias("token_mass"),
        )
        .orderBy("df")
    )


ORACLE["paragraph_df_histogram"] = f"""
    WITH occ AS ({_para_sql("")}),
    per_h AS (
        SELECT h, COUNT(DISTINCT doc_id) AS df, COUNT(*) AS n_occ,
               SUM(p_tok) AS tok
        FROM occ GROUP BY h
    )
    SELECT CAST(df AS BIGINT) AS df, COUNT(*) AS n_paragraphs,
           CAST(SUM(n_occ) AS BIGINT) AS n_occurrences,
           CAST(SUM(tok) AS BIGINT) AS token_mass
    FROM per_h GROUP BY df ORDER BY df
"""

QUERIES["paragraph_df_histogram"] = paragraph_df_histogram


def boilerplate_position_profile(spark: SparkSession, sf: str) -> DataFrame:
    """WHERE boilerplate lives inside documents: per language and
    chunk-position class (first / middle / last / only), paragraph
    occurrences vs boilerplate occurrences (global df >=
    PARA_BOILER_MIN_DOCS docs). Web boilerplate concentrates at
    document edges (headers, footers, nav) — a flat profile instead
    suggests templated BODY text, which wants substring-level dedup
    rather than edge-trimming.

    The df pass is the same single hash-keyed agg as the histogram;
    position class is row-local arithmetic on (i, n_chunks)."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    occ = _paragraph_occurrences(docs, "lang")
    hot = (
        occ.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= PARA_BOILER_MIN_DOCS)
        .select("h", F.lit(1).alias("boiler"))
    )
    pos = (
        F.when(F.col("n_chunks") == 1, "only")
        .when(F.col("i") == 0, "first")
        .when(F.col("i") == F.col("n_chunks") - 1, "last")
        .otherwise("middle")
    )
    return (
        occ.join(hot, "h", "left")
        .select(
            "lang",
            pos.alias("pos_class"),
            F.coalesce(F.col("boiler"), F.lit(0)).cast("bigint").alias("b"),
        )
        .groupBy("lang", "pos_class")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.sum("b").alias("n_boilerplate"),
            F.round(
                F.sum("b").cast("double") / F.count("*").cast("double"), 6
            ).alias("boiler_rate"),
        )
        .orderBy("lang", "pos_class")
    )


ORACLE["boilerplate_position_profile"] = f"""
    WITH occ AS ({_para_sql("lang")}),
    hot AS (
        SELECT h, 1 AS boiler
        FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM occ GROUP BY h)
        WHERE nd >= {PARA_BOILER_MIN_DOCS}
    )
    SELECT lang,
           CASE WHEN n_chunks = 1 THEN 'only'
                WHEN i = 0 THEN 'first'
                WHEN i = n_chunks - 1 THEN 'last'
                ELSE 'middle' END AS pos_class,
           COUNT(*) AS n_occurrences,
           CAST(SUM(CASE WHEN boiler IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boilerplate,
           ROUND(CAST(SUM(CASE WHEN boiler IS NOT NULL THEN 1 ELSE 0 END)
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS boiler_rate
    FROM occ LEFT JOIN hot USING (h)
    GROUP BY 1, 2 ORDER BY lang, pos_class
"""

QUERIES["boilerplate_position_profile"] = boilerplate_position_profile


def para_canonical_source_share(spark: SparkSession, sf: str) -> DataFrame:
    """Paragraph-level survivorship attribution: for every paragraph
    that occurs in more than one document, the CANONICAL copy is its
    first occurrence (min composite key). Per source: how many
    duplicated paragraphs this source canonically owns, how many of its
    occurrences are removed in favor of a canonical copy in ANOTHER
    source vs its own — who originates shared content and who recycles
    it (the paragraph-granularity twin of dedup_survivorship).

    Shape: the first-occurrence agg carries (hash -> key) once; the
    owner lookup is a second hash-equi join of two already-aggregated
    tables."""
    docs = widen_small_scan(table(spark, sf, "documents"))
    occ = _paragraph_occurrences(docs, "source").withColumn(
        "k", _para_key_col()
    )
    first = occ.groupBy("h").agg(
        F.min("k").alias("first_k"), F.count_distinct("doc_id").alias("nd")
    )
    dup_first = first.filter(F.col("nd") > 1)
    owner = (
        occ.join(dup_first, "h")
        .filter(F.col("k") == F.col("first_k"))
        .select("h", F.col("source").alias("owner_source"))
    )
    removed = (
        occ.join(dup_first, "h")
        .filter(F.col("k") != F.col("first_k"))
        .join(owner, "h")
    )
    owned = owner.groupBy(F.col("owner_source").alias("source")).agg(
        F.count("*").alias("n_canonical_owned")
    )
    rem = removed.groupBy("source").agg(
        F.sum((F.col("owner_source") == F.col("source")).cast("bigint")).alias(
            "n_removed_self_canonical"
        ),
        F.sum((F.col("owner_source") != F.col("source")).cast("bigint")).alias(
            "n_removed_foreign_canonical"
        ),
    )
    return (
        owned.join(rem, "source", "full")
        .select(
            "source",
            F.coalesce("n_canonical_owned", F.lit(0)).alias("n_canonical_owned"),
            F.coalesce("n_removed_self_canonical", F.lit(0)).alias(
                "n_removed_self_canonical"
            ),
            F.coalesce("n_removed_foreign_canonical", F.lit(0)).alias(
                "n_removed_foreign_canonical"
            ),
        )
        .orderBy("source")
    )


ORACLE["para_canonical_source_share"] = f"""
    WITH occ AS (
        SELECT source, doc_id, i, h, {_PARA_KEY} AS k
        FROM ({_para_sql("source")})
    ),
    first AS (
        SELECT h, MIN(k) AS first_k, COUNT(DISTINCT doc_id) AS nd
        FROM occ GROUP BY h
    ),
    dup_first AS (SELECT * FROM first WHERE nd > 1),
    owner AS (
        SELECT occ.h, occ.source AS owner_source
        FROM occ JOIN dup_first USING (h) WHERE k = first_k
    ),
    removed AS (
        SELECT occ.source, owner.owner_source
        FROM occ JOIN dup_first USING (h) JOIN owner USING (h)
        WHERE k != first_k
    ),
    owned AS (
        SELECT owner_source AS source, COUNT(*) AS n_canonical_owned
        FROM owner GROUP BY 1
    ),
    rem AS (
        SELECT source,
               SUM(CASE WHEN owner_source = source THEN 1 ELSE 0 END)
                   AS n_removed_self_canonical,
               SUM(CASE WHEN owner_source != source THEN 1 ELSE 0 END)
                   AS n_removed_foreign_canonical
        FROM removed GROUP BY source
    )
    SELECT COALESCE(owned.source, rem.source) AS source,
           CAST(COALESCE(n_canonical_owned, 0) AS BIGINT)
               AS n_canonical_owned,
           CAST(COALESCE(n_removed_self_canonical, 0) AS BIGINT)
               AS n_removed_self_canonical,
           CAST(COALESCE(n_removed_foreign_canonical, 0) AS BIGINT)
               AS n_removed_foreign_canonical
    FROM owned FULL OUTER JOIN rem ON owned.source = rem.source
    ORDER BY source
"""

QUERIES["para_canonical_source_share"] = para_canonical_source_share
