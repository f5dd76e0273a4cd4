"""Skew-handling utilities (100 TB concerns; SURVEY §7.2 step 8).

AQE's skew-join splitting handles moderate skew automatically (enabled
in session.py). These helpers cover the cases AQE doesn't:

  salted_group_count — two-phase aggregation for heavy-hitter GROUP BY
      keys: count per (key, salt) first (spreads one hot key over
      `salts` reducers), then re-aggregate per key. Identical results
      to a plain groupBy by associativity; the pre-agg shuffle carries
      at most `salts` rows per hot key per partition.

  salted_broadcast_join is unnecessary (broadcast joins don't shuffle);
  for skewed SORT-MERGE joins prefer AQE skewJoin, or replicate the
      salting pattern on the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_group_count(
    df: DataFrame, key_cols: list[str], salts: int = 16
) -> DataFrame:
    """COUNT(*) GROUP BY keys, skew-proof.

    Phase 1 groups by (keys..., salt) where salt = crc32(random-ish
    row-local value) % salts — here a hash of the whole row's partition
    offset is unnecessary; a uniform random salt is correct for counts
    because the final re-aggregation sums partials. Deterministic-result
    (though not deterministic-partitioning) by construction.
    """
    salted = df.withColumn(
        "_salt", (F.rand() * salts).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_partial").alias("cnt")
    )


def salted_group_agg(
    df: DataFrame,
    key_cols: list[str],
    agg_col: str,
    salts: int = 16,
) -> DataFrame:
    """Two-phase SUM/COUNT/AVG on a skewed key: emits
    (keys..., cnt, total, avg). Any algebraic aggregate decomposes the
    same way (partial state -> merge); holistic aggregates (median)
    need approx sketches instead."""
    salted = df.withColumn("_salt", (F.rand() * salts).cast("int"))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_n"), F.sum(agg_col).alias("_s")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_n").alias("cnt"),
        F.sum("_s").alias("total"),
        (F.sum("_s") / F.sum("_n")).alias("avg"),
    )
