"""Skew-mitigation join utilities (north-star 100 TB surface).

AQE's skew-join handles most cases at runtime (enabled by default in
``session.get_spark``), but it only splits partitions of a sort-merge join
AFTER a shuffle has materialized, and cannot help when a single join key is
hot enough that one task still owns it end-to-end. Explicit salting solves
that shape deterministically: replicate the small side ``salts``×, spread
each big-side row across the salt space, join on (key, salt) — the hot
key's rows now land on ``salts`` different reducers.

Semantics are identical to the plain equi-join (each big-side row matches
exactly the one replica carrying its salt), so the DuckDB oracle for the
salted form is the unsalted SQL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_pq_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with an explicit
    ``salts``-way salt on the join key.

    - ``small`` is replicated ``salts``× via a literal-range explode (rows
      × salts — keep the small side genuinely small, the same constraint a
      broadcast join has).
    - ``big`` tags each row with a deterministic-within-the-run salt from
      ``monotonically_increasing_id`` — correctness needs only that each
      row carries SOME salt in range, so hot keys spread uniformly across
      reducers regardless of their key value.
    - The join key then becomes (on, salt): a key with 10⁹ rows becomes
      ``salts`` reducer-sized slices instead of one straggler task.

    ``how`` supports 'inner' and 'left' (the big side is never replicated,
    so left semantics survive salting; right/full would need the salt on
    the other side — decline those explicitly).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} "
            "(right/full joins would replicate the preserved side)"
        )
    if salts < 1:
        raise ValueError("salts must be >= 1")
    if SALT_COL in big.columns or SALT_COL in small.columns:
        raise ValueError(f"{SALT_COL} already present in an input")
    big_s = big.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(salts)).cast("int")
    )
    small_s = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = big_s.join(small_s, on=[on, SALT_COL], how=how)
    return out.drop(SALT_COL)
