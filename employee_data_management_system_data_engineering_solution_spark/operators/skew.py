"""Skew-mitigation join (salting).

AQE's skew-join split (`spark.sql.adaptive.skewJoin`, on in
``session.py``) handles most skew transparently by splitting oversized
shuffle partitions. Salting is the explicit fallback for the cases AQE
can't fix — e.g. a single hot key whose rows must still meet a
non-broadcastable right side, or deterministic pre-AQE engines.

``salted_join``: the skewed (big) side gets a uniform random-free salt
derived from a row fingerprint (``pmod(hash, salt))``, the small side
is replicated ``salt`` ways via an explode — so one hot key spreads
over ``salt`` shuffle partitions at the cost of replicating the small
side. Result is EXACTLY the plain inner equi-join (salt columns are
internal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
) -> DataFrame:
    """Inner equi-join with the big side salted ``salt`` ways.

    The salt is derived deterministically from the big side's full row
    (xxhash64 of all columns), keeping the operator retry-safe (a
    random salt would re-deal rows across retries). The small side is
    exploded ×``salt`` — only acceptable when it is genuinely the
    small side; at that point a broadcast join is usually better, which
    is why salting targets the middle ground: too big to broadcast,
    too skewed to shuffle cleanly.
    """
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt)).cast("int")
    )
    small_rep = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return big_salted.join(small_rep, on=[*on, "__salt"], how="inner").drop("__salt")
