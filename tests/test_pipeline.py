"""End-to-end batch pipeline (X1/S5/S1/S2): run_batch over fixtures,
saved-table catalog state, DF-vs-SQL agreement on persisted tables,
CSV/JSON source shapes, and a hypothesis property test for the
follower-count rewrite (SURVEY.md §5.2.5).
"""

from __future__ import annotations

import pytest

from pinterest_data_pipeline6_spark import fixtures, pipeline
from pinterest_data_pipeline6_spark.operators.analytics import ANALYTICS_SQL
from pinterest_data_pipeline6_spark.sources.io import (
    read_csv,
    rm_checkpoint,
    save_table,
    write_partitioned,
)
from pinterest_data_pipeline6_spark.sources.readers import read_raw_json
from tests.conftest import df_to_sorted_rows


@pytest.fixture(scope="module")
def results(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pipe_raw")
    paths = fixtures.write_fixtures(d, n_rows=600, seed=21, dedup_safe=True)
    return pipeline.run_batch(
        spark, paths["raw_pin"], paths["raw_geo"], paths["raw_user"]
    )


def test_tables_persisted(spark, results):
    tables = {t.name for t in spark.catalog.listTables()}
    assert {"pin_table", "geo_table", "user_table", "followers_table"} <= tables


def test_run_batch_ships_analyze_stats(spark, results):
    """run_batch (default analyze_stats=True) must leave CBO statistics
    in the catalog for every persisted table: row-count table stats plus
    per-column stats on at least one join key — the ingest-path ANALYZE
    that docs/SCALE.md's CBO section prescribes."""
    for tbl in ("pin_table", "geo_table", "user_table", "followers_table"):
        rows = spark.sql(f"DESCRIBE EXTENDED {tbl}").collect()
        stats = {r["col_name"]: r["data_type"] for r in rows}
        assert "Statistics" in stats, tbl
        assert "rows" in stats["Statistics"], (tbl, stats["Statistics"])
    # column-level stats (NDV) present on the pin join key
    col = spark.sql("DESCRIBE EXTENDED pin_table ind").collect()
    kv = {r["info_name"]: r["info_value"] for r in col}
    assert kv.get("distinct_count") not in (None, "NULL"), kv


def test_workload_runs(results):
    assert set(results) == {"q1", "q2", "q3a", "q3b", "q4", "q5", "q6", "q7", "q8"}
    for name, df in results.items():
        assert df.count() > 0, name


def test_df_matches_sql_on_persisted_tables(spark, results):
    """The DataFrame form and the reference's SQL text agree over the
    SAVED tables (the workload's real input — BATCH:111-322)."""
    for q in ("q1", "q2", "q4", "q6", "q8"):
        sql_df = spark.sql(ANALYTICS_SQL[q])
        assert df_to_sorted_rows(results[q]) == df_to_sorted_rows(sql_df), q


def test_csv_source_roundtrip(spark, tmp_path):
    p = tmp_path / "creds.csv"
    p.write_text("Access key ID,Secret access key\nAKIA123,s3cr3t\n")
    df = read_csv(spark, str(p))
    row = df.select("Access key ID").first()  # S9 driver-side fetch
    assert row[0] == "AKIA123"


def test_json_source_declared_schema(spark, tmp_path):
    d = tmp_path / "pin_json"
    paths = fixtures.write_fixtures_jsonl(tmp_path, n_rows=50, seed=5, dedup_safe=True)
    df = read_raw_json(spark, "pin", paths["pin"])
    assert df.schema["index"].dataType.typeName() == "integer"
    assert df.count() == 50


def test_json_source_inference_path(spark, tmp_path):
    """SURVEY §1.3: the optional inference path (the reference's own
    behavior) discovers columns without a declared schema — same rows,
    superset-compatible columns, sampled types."""
    paths = fixtures.write_fixtures_jsonl(tmp_path, n_rows=50, seed=5, dedup_safe=True)
    declared = read_raw_json(spark, "pin", paths["pin"])
    inferred = read_raw_json(spark, "pin", paths["pin"], infer=True)
    assert inferred.count() == 50
    assert set(declared.columns) <= set(inferred.columns)
    # inference types integers by sampling (long, not the declared int)
    assert inferred.schema["index"].dataType.typeName() in ("long", "integer")


def test_rm_checkpoint(tmp_path):
    ck = tmp_path / "ck"
    (ck / "offsets").mkdir(parents=True)
    rm_checkpoint(ck)
    assert not ck.exists()


def test_partitioned_write_prunes(spark, tmp_path):
    """A filter on the partition column must prune to the matching
    directories — the scan's PartitionFilters carry the predicate and
    only one partition's rows are read."""
    from pyspark.sql import functions as F

    from pinterest_data_pipeline6_spark.plans.checks import executed_plan
    from pinterest_data_pipeline6_spark.sources.readers import table

    orders = table(spark, "/root/testdata/sf0.001", "orders")
    out = str(tmp_path / "orders_by_status")
    write_partitioned(orders, out, ["o_orderstatus"])

    back = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    plan = executed_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected > 0


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_format_roundtrip(spark, tmp_path, fmt):
    """Every non-parquet batch format the engine claims: write -> read
    -> identical rows. CSV/JSON lose type info, so those reads go
    through the declared schema (the engine's schema-first contract,
    SURVEY.md §1.3)."""
    from pyspark.sql import functions as F

    from pinterest_data_pipeline6_spark.sources.readers import table

    src = (
        table(spark, "/root/testdata/sf0.001", "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
        .orderBy("n_nationkey")
    )
    out = str(tmp_path / f"nation_{fmt}")
    w = src.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(out)

    r = spark.read
    if fmt in ("csv", "json"):
        r = r.schema(src.schema)
    if fmt == "csv":
        r = r.option("header", "true")
    back = r.format(fmt).load(out)
    # nullability flags differ per source (CSV readers mark everything
    # nullable); names + types are the schema contract
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in src.schema
    ]
    assert sorted(back.collect()) == sorted(src.collect())


def test_follower_rewrite_property(spark):
    """Property: for any \\d{1,6}[kM]? string the rewrite equals the
    plain-Python expansion; malformed strings become NULL."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    from pyspark.sql import functions as F
    from pinterest_data_pipeline6_spark.functions.cleaning import rewrite_follower_count

    def py_expand(s: str) -> int | None:
        t = s.replace("k", "000").replace("M", "000000")
        return int(t) if t.isdigit() and -2**31 <= int(t) < 2**31 else None

    @given(
        st.lists(
            st.one_of(
                st.from_regex(r"\A[0-9]{1,6}[kM]?\Z"),
                st.sampled_from(["User Info Error", "", "12x", "k", "M25"]),
            ),
            min_size=1,
            max_size=30,
        )
    )
    @settings(max_examples=20, deadline=None)
    def check(values):
        df = spark.createDataFrame([(v,) for v in values], ["follower_count"])
        out = [r[0] for r in rewrite_follower_count(df).collect()]
        assert out == [py_expand(v) for v in values]

    check()


def test_compact_files_reduces_file_count(spark, tmp_path):
    """Many small files -> few files, same rows, no shuffle needed."""
    from pinterest_data_pipeline6_spark.sources.io import compact_files

    src = tmp_path / "frag"
    df = spark.range(0, 10_000).withColumnRenamed("id", "k")
    df.repartition(64).write.parquet(str(src))
    before = len([f for f in src.rglob("*.parquet")])
    assert before >= 32
    compact_files(spark, src, target_file_mb=128)
    after = len([f for f in src.rglob("*.parquet")])
    assert after < before
    assert spark.read.parquet(str(src)).count() == 10_000


def test_observe_quality_metrics_free_with_action(spark):
    """observe() metrics must report rows/nulls/domain violations from
    the SAME job that computed the result — no second scan."""
    from pinterest_data_pipeline6_spark.functions.quality import (
        check_quality,
        observe_quality,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, None, -1.0), (3, "c", 5.0)], "k int, s string, v double"
    )
    instrumented, obs = observe_quality(df, not_null=("s",), positive=("v",))
    assert instrumented.count() == 3
    m = obs.get
    assert m["n_rows"] == 3
    assert m["n_null_s"] == 1
    assert m["n_nonpos_v"] == 1
    violations = check_quality(m)
    assert len(violations) == 2
    assert not check_quality(m, max_null_rate=0.5, max_nonpos_rate=0.5)


def test_run_batch_quality_report(spark, tmp_path_factory):
    """run_batch(quality_report={}) must surface per-table row counts
    and key-null counts gathered during the persist actions."""
    from pinterest_data_pipeline6_spark.pipeline import run_batch

    d = tmp_path_factory.mktemp("quality_raw")
    paths = fixtures.write_fixtures(d, n_rows=300, seed=77, dedup_safe=True)
    report: dict = {}
    run_batch(
        spark,
        paths["raw_pin"],
        paths["raw_geo"],
        paths["raw_user"],
        quality_report=report,
    )
    assert set(report) == {"pin_table", "geo_table", "user_table"}
    for tbl, metrics in report.items():
        assert metrics["n_rows"] > 0, tbl
        assert metrics["n_null_ind"] == 0, tbl


def test_events_ts_reader_handles_both_parquet_encodings(spark, tmp_path):
    """The shared reader must serve `events.ts` as a session-UTC
    TIMESTAMP whether the parquet shipped TIMESTAMP(NANOS) (read as
    nano longs under the legacy conf and truncated) or
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ and normalized) — the
    driver regenerated the dataset across rounds with a different
    encoding and downstream epoch math must survive both."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampType

    from pinterest_data_pipeline6_spark.sources.readers import _TABLE_CACHE, table

    base = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in micros
    micros = [base, base + 1_500_000, base + 3_000_000]
    for sub, arr in {
        "ns": pa.array([m * 1000 for m in micros], pa.timestamp("ns")),
        "us": pa.array(micros, pa.timestamp("us")),
    }.items():
        d = tmp_path / sub
        d.mkdir()
        pq.write_table(
            pa.table({"event_id": pa.array([1, 2, 3], pa.int64()), "ts": arr}),
            str(d / "events.parquet"),
        )
        df = table(spark, str(d), "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), sub
        got = sorted(r[0] for r in df.select(F.unix_micros("ts")).collect())
        assert got == micros, sub
    _TABLE_CACHE.clear()


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution at rest: files written before and after a
    column was added read back as ONE table with mergeSchema, old rows
    NULL in the new column — the contract a long-lived 100 TB dataset
    depends on when its producer adds a field."""
    old = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    old.write.parquet(str(tmp_path / "t" / "batch=0"))
    new = spark.createDataFrame(
        [(3, "c", 0.5)], "id long, name string, score double"
    )
    new.write.parquet(str(tmp_path / "t" / "batch=1"))

    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[3] == 0.5 and rows[1] is None and rows[2] is None


def test_json_corrupt_record_isolation(spark, tmp_path):
    """PERMISSIVE JSON parsing with an explicit _corrupt_record column:
    malformed lines land in quarantine-able rows instead of failing the
    job or silently vanishing — the ingest posture for a crawl feed
    where some fraction of payloads is always broken."""
    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "{not json at all}\n"
        '{"doc_id": 2, "text": "fine"}\n'
    )
    schema = "doc_id long, text string, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert sorted(r.doc_id for r in good) == [1, 2]
    assert len(bad) == 1 and "not json" in bad[0]._corrupt_record
