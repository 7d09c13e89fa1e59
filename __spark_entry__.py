"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query registries live next to the operators they exercise:
- ``operators/relational.py`` — SURVEY.md §2.12 Q1-Q8 retargets +
  per-operator coverage entries (scans, cleaning rules, case buckets).
- ``operators/events.py`` — windowed/sessionized event analytics
  (batch twins of the streaming operators, SURVEY.md §2.9).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's Q1 (most popular category per
    country — J1+A1+A5) retargeted onto the sf0.001 testdata tables."""
    from pinterest_data_pipeline6_spark.operators.relational import q1_category_per_country

    return q1_category_per_country(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pinterest_data_pipeline6_spark.operators import (
        collections,
        curation,
        dedup,
        events,
        multimodal,
        privacy,
        relational,
        similarity,
        subqueries,
        textops,
    )

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(relational.QUERIES)
    out.update(events.QUERIES)
    out.update(textops.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(collections.QUERIES)
    out.update(subqueries.QUERIES)
    out.update(privacy.QUERIES)
    out.update(curation.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each ``queries()`` entry."""
    from pinterest_data_pipeline6_spark.operators import (
        collections,
        curation,
        dedup,
        events,
        multimodal,
        privacy,
        relational,
        similarity,
        subqueries,
        textops,
    )

    out: dict[str, str] = {}
    out.update(relational.ORACLE)
    out.update(events.ORACLE)
    out.update(textops.ORACLE)
    out.update(dedup.ORACLE)
    out.update(similarity.ORACLE)
    out.update(multimodal.ORACLE)
    out.update(collections.ORACLE)
    out.update(subqueries.ORACLE)
    out.update(privacy.ORACLE)
    out.update(curation.ORACLE)
    return out
