"""Skew-flattening salted equi-join.

The brief's skew playbook names three regimes: broadcast the small
side, let AQE split detected skew at runtime, or SALT deliberately when
the skew is known in advance. This module is the third: the skewed
probe side's rows get a deterministic salt in ``[0, n_salt)``, the
build side replicates ``n_salt`` times, and the join key widens to
``(key, salt)`` — a hot key's rows now land on ``n_salt`` shuffle
partitions instead of one, at the cost of replicating the build side
``n_salt``x. Result set identical to the plain join by construction
(every probe row meets exactly one replica of each matching build row:
its salt's). Prefer ``F.broadcast`` when the build side fits; prefer
AQE skew handling when the skew is unknown — this operator is for the
middle regime (build side too big to broadcast, probe skew known),
and for engines/configs where AQE's skew split doesn't reach (e.g.
skew under a non-sort-merge join).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SALT_COL = "_salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    *,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``left`` (skewed probe side) with ``right`` (build
    side) on ``on``, spreading each key over ``n_salt`` shuffle
    partitions. ``how`` supports the probe-preserving shapes (inner /
    left / left_semi / left_anti — a right/full join would need the
    salt on the other side). The salt is deterministic (xxhash64 of the
    whole probe row), so retried tasks re-derive identical salts."""
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join supports probe-preserving joins, got {how!r}")
    for df, side in ((left, "left"), (right, "right")):
        if SALT_COL in df.columns:
            raise ValueError(f"salted_join reserves the column name {SALT_COL!r} ({side})")
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; rename "
            f"before joining (salted_join joins by name on {keys + [SALT_COL]})"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    l_salted = left.withColumn(SALT_COL, salt.cast("int"))
    r_salted = right.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return l_salted.join(r_salted, keys + [SALT_COL], how).drop(SALT_COL)
