"""Skew mitigation for hot join keys: explicit salting.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on by default
with AQE in this repo's sessions) handles most skew at runtime;
explicit salting is the deterministic fallback when one build-side key
is so hot that even a split partition overwhelms an executor — e.g. a
single pathological duplicate document colliding with millions of rows.

salted_join(left, right, key, n_salts):
  left rows get a deterministic pseudo-random salt in [0, n_salts);
  the (usually smaller) right side is replicated once per salt value;
  the join runs on (key, salt) so each hot key spreads over n_salts
  partitions. Replication cost: |right| × n_salts rows — pick the
  smaller side as `right` and keep n_salts modest (8–64).

Result-identical to the plain join (inner/left semantics preserved;
every left row matches exactly the same right rows through its salt's
replica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join left⨝right on left_key == right_key with the left side's hot
    keys spread across n_salts sub-partitions.

    Only inner and left joins are result-identical under salting:
    right/full would surface each unmatched right row once per replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join preserves semantics only for inner/left joins, "
            f"got how={how!r}"
        )
    salted_left = left.withColumn(
        "_salt",
        F.pmod(
            F.hash(F.col(left_key), F.monotonically_increasing_id()),
            F.lit(n_salts),
        ).cast("int"),
    )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salts - 1))
    ).alias("_salt")
    salted_right = right.select("*", salts)
    # dataframe-qualified keys so left_key == right_key (same column
    # name on both sides) does not hit an ambiguous-reference error
    joined = salted_left.join(
        salted_right,
        (salted_left[left_key] == salted_right[right_key])
        & (salted_left["_salt"] == salted_right["_salt"]),
        how,
    )
    return joined.drop("_salt")
