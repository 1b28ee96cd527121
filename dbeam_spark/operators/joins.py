"""Join strategy helpers for skewed data.

`salted_join` is the classic hot-key mitigation: replicate the small
side R times and scatter the big side's hot keys across R salt values,
so one executor no longer owns an entire hot key. Results are
identical to a plain inner join — only the partitioning changes.

AQE's skew-join splitting (on by default in our sessions) handles
*sort-merge* skew automatically; explicit salting still matters for
hash aggregations over hot keys and for engines/plans AQE can't fix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join `big ⋈ small` on column `on`, salted.

    big gets a deterministic salt in [0, salt_buckets) (hash of all
    its columns — spreads rows of the same key); small is exploded
    ×salt_buckets so every (key, salt) bucket finds its match.
    """
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt_buckets)).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = salted_big.join(salted_small, [on, "_salt"], how)
    return out.drop("_salt")
