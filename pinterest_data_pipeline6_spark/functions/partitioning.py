"""Partitioning, skew, and co-location utilities — the manual levers a
100 TB deployment combines with AQE.

- ``salted_join``: explicit key-salting for joins whose hot keys exceed
  what AQE's skew-join splitting handles (AQE splits oversized
  partitions of a sort-merge join, but a single pathological key still
  lands in one task per split boundary; salting spreads EACH key over
  ``n_salts`` subkeys deterministically). The small side is replicated
  n_salts times — use for dimension-vs-skewed-fact shapes.
- ``write_bucketed`` / co-located joins: pre-shuffling both fact tables
  into the same bucket layout turns every future equi-join on the
  bucket key into a zero-Exchange zip of co-located buckets — the
  standard amortization when one join key dominates a workload.
- ``repartition_for``: explicit hash/range repartitioning with a
  partition-count rationale, for reusing one partitioning across
  several downstream stages.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a deterministic salt
    in [0, n_salts) per row; the small side is exploded once per salt
    value; the join keys on (key, salt). Row multiplicity and join
    semantics are identical to ``big.join(small, key, how)``.

    The salt must be DETERMINISTIC (hash of a stable column, not
    rand()): retries and speculative tasks must re-derive the same
    salt or rows duplicate/vanish."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_salted = big.withColumn("__salt", salt.cast("int"))
    small_salted = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_salted.join(small_salted, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str | Sequence[str],
    n_buckets: int = 32,
    sort: bool = True,
    fmt: str = "parquet",
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table. Two
    tables bucketed identically on the join key equi-join with NO
    exchange on either side (see tests/test_partitioning.py, which
    asserts the Exchange-free plan)."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format(fmt).mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(name)


def repartition_for(
    df: DataFrame, keys: Sequence[str], n_partitions: int | None = None
) -> DataFrame:
    """Hash-repartition on ``keys`` so several downstream wide ops
    (joins + aggs on the same keys) reuse ONE exchange instead of each
    planning their own."""
    cols = [F.col(k) for k in keys]
    if n_partitions:
        return df.repartition(n_partitions, *cols)
    return df.repartition(*cols)


MORTON_BITS = 16


def morton_code(x: F.Column, y: F.Column, bits: int = MORTON_BITS) -> F.Column:
    """Morton (Z-order) interleave of two non-negative int columns:
    bit i of x lands at position 2i, bit i of y at 2i+1. Pure shift/
    mask arithmetic — whole-stage-codegen'd, no UDF."""
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x.cast("bigint"), i).bitwiseAND(1), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(y.cast("bigint"), i).bitwiseAND(1), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def morton_sql(x: str, y: str, bits: int = MORTON_BITS) -> str:
    """The identical interleave as portable SQL text (Spark and DuckDB
    share >>, &, << on BIGINT)."""
    # the CAST keeps the shift operand BIGINT in both dialects (DuckDB
    # otherwise narrows `& 1` to INT32 and overflows at << 31)
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & CAST(1 AS BIGINT)) << {2 * i})")
        terms.append(f"((({y} >> {i}) & CAST(1 AS BIGINT)) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_by(df: DataFrame, x: str, y: str, bits: int = MORTON_BITS) -> DataFrame:
    """Z-order layout: sort each partition by the Morton code of
    (x, y) before writing, so parquet row-group min/max stats become
    selective on BOTH columns — the data-skipping trick behind
    multi-dimensional clustering (Delta OPTIMIZE ZORDER BY, Hudi
    space-filling curves) without any engine extension.
    ``sortWithinPartitions`` keeps it shuffle-free: layout is a
    per-file property, no global sort needed."""
    return df.sortWithinPartitions(morton_code(F.col(x), F.col(y), bits))
