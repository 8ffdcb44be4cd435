"""Skew-handling utilities: two-level salted aggregation and salted
dimension joins.

SURVEY.md §4: the reference never faces skew (its partitioning is the
uniform raster grid); on Spark a planet-sized polygon or a dense city
cell concentrates one key's rows on one reducer. Three mitigations are
used in this engine, in order of preference:

1. AQE skew-join splitting (enabled in session.py) — free, runtime.
2. Mixed-resolution cell covers (cover.py) — hot AREAS are subdivided
   at the source so no single cell id is hot.
3. The explicit two-level salting here — for aggregations whose
   per-key state is large (distinct counts, collect-style), where
   map-side partial aggregation alone cannot shrink a hot key.

Salts are DERIVED (hash of other columns), never random: results must
be partitioning-independent and replayable (lineage digests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n))


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    val_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """COUNT(DISTINCT val) per key with a hot-key-proof plan.

    Level 1 shuffles on (key, salt(val)) — a hot key's values spread
    over ``n_salt`` reducers, each deduping its shard — level 2 sums
    the shard counts. Equivalent to groupBy(key).agg(countDistinct)
    but the biggest single reducer shrinks by ~n_salt.

    Output: key_cols + ``n_distinct``.
    """
    shard = (
        df.withColumn("__salt", _salt([val_col], n_salt))
        .groupBy(*key_cols, "__salt")
        .agg(F.count_distinct(F.col(val_col)).alias("__n"))
    )
    return shard.groupBy(*key_cols).agg(
        F.sum("__n").cast("long").alias("n_distinct")
    )


def salted_dim_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffle join resistant to a hot join key when the dim side is
    too big to broadcast: the dim row for each key is replicated
    ``n_salt`` times, the big side picks a deterministic salt from its
    own row hash, and the join key becomes (key, salt) — a hot key's
    rows land on n_salt reducers instead of one.

    (When dim IS broadcastable, prefer F.broadcast — the spatial join
    does; this is the fallback for large dims.)"""
    big_cols = [c for c in big.columns]
    salted_big = big.withColumn("__salt", _salt(big_cols, n_salt))
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = salted_big.join(replicated, [key, "__salt"], how)
    return out.drop("__salt")
