"""Skew mitigation utilities (100 TB design notes, SURVEY.md section 4).

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these are the EXPLICIT tools for the two shapes AQE cannot
fix:

- ``salted_aggregate``: a hot groupBy key (one second of a radiation
  spike, one document shard) funnels a partition's worth of rows into
  one reducer. Two-phase agg: salt the key (deterministic hash-mod so
  re-runs are stable), partial-agg per (key, salt), final-agg per key.
  Works for any algebraic aggregate (sum/count/min/max here).
- ``salted_broadcast_left``: replicate the SMALL side per salt value so
  a skewed big-side key spreads over N reducers while the join stays
  exact. (For broadcast-able smalls Spark already avoids the shuffle;
  this is for the mid-size dim that does not fit the broadcast
  threshold but whose join key is skewed.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df_cols: list[Column], n_salts: int) -> Column:
    # deterministic: re-runs and retries land rows on the same salt
    return F.pmod(F.xxhash64(*df_cols), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output_name -> (fn, input_col), fn in
    {sum, count, min, max}. Partial phase computes per (key, salt);
    final phase merges partials per key (count merges with sum).
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salt_src = [F.col(c) for c in (salt_on or df.columns)]
    salted = df.withColumn("_salt", _salt(salt_src, n_salts))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[
            getattr(F, fn)(col).alias(f"_p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*key_cols).agg(
        *[
            getattr(F, merge_fn[fn])(f"_p_{name}").alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side
    across all salts, join on (key, salt). Exact join semantics; the
    hot key's rows spread over ``n_salts`` reducers."""
    big_s = big.withColumn("_salt", _salt([F.col(c) for c in big.columns], n_salts))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")
