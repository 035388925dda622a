"""Explicit skew handling (SURVEY.md §4.1, north_star "salted
repartitioning and two-level posting merges").

AQE's skew-join splitting does not help when the skew lives inside a
groupBy key (a Zipf head term like "the" hits one reducer); the classic
fix is a two-level salted merge: aggregate on (key, salt) first so the
hot key fans out over `buckets` reducers, then combine the partials.
Numerically neutral for counts/sums (integer addition is associative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key: str, salt_col: str, buckets: int) -> DataFrame:
    """count(*) per key, two-level: (key, pmod(hash(salt_col), buckets))
    partial counts -> final sum. Returns (key, df) like groupBy(key).count()."""
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").cast("long").alias("df"))


def salted_sum(df: DataFrame, key: str, value: str, salt_col: str, buckets: int, out: str) -> DataFrame:
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)))
    partial = salted.groupBy(key, "_salt").agg(F.sum(value).alias("_s"))
    return partial.groupBy(key).agg(F.sum("_s").alias(out))
