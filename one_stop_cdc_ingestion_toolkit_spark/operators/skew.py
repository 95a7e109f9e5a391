"""Skew mitigation: salted joins.

AQE's skew-join splitting (enabled in the engine session) handles most
skew at runtime; explicit salting remains the tool when one join key
dominates so heavily that even split partitions overwhelm a task — the
classic power-law key (a viral document id, a null-ish default key).

``salted_join`` replicates the small side N ways and scatters the big
side's hot keys across the N replicas: the shuffle key becomes
(key, salt), bounding any task at ~1/N of the hot key's rows. Results
are exactly equal to the unsalted join (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is heavily skewed.

    ``big`` rows get a deterministic salt derived from their other
    columns (stable across retries — no rand(), which would break task
    re-execution); ``small`` is exploded once per salt value. The join
    key becomes (key, salt); columns returned match big ⋈ small.
    """
    # equivalence holds only for modes where UNMATCHED small-side rows
    # never surface: small is exploded n_salts times, so right/full
    # outer would emit each unmatched small row once PER SALT — silently
    # wrong results behind an API that promises unsalted equality
    # (review r7). Unmatched big rows survive exactly once (one salt per
    # big row), so left/semi/anti stay exact.
    allowed = {"inner", "left", "leftouter", "left_outer", "semi",
               "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower().replace("_", "") not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports inner/left/semi/anti, not {how!r}: "
            "right/full outer would duplicate unmatched small-side rows "
            "once per salt"
        )
    non_key = [c for c in big.columns if c != key]
    salt_src = F.xxhash64(*[F.col(c) for c in non_key]) if non_key else F.xxhash64(F.col(key))
    big_s = big.withColumn("__salt", F.pmod(salt_src, F.lit(n_salts)).cast("int"))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
