"""Skew mitigation (SURVEY.md §7.4.7): salted joins + the AQE posture.

The reference's data is skewed the way real warehouses are (India has 60
customers, most countries 1 — `data/q9.csv`; at 100 TB the hot keys in a
fact-fact join make one reducer the straggler). Two mitigations, both
exercised here:

1. **AQE skew-join splitting** — on by default in the engine session
   (``spark.sql.adaptive.skewJoin.enabled``); handles skew discovered at
   runtime with no query rewrite. First choice.
2. **Explicit salting** — for engines/pipelines where the skewed key set
   is known and AQE can't help (e.g. the skewed side feeds a window):
   the skewed probe side gets a deterministic salt in ``[0, S)``, the
   build side is replicated S ways, and the join key becomes
   ``(key, salt)`` so the hot key's rows spread over S reducers. Output
   is row-identical to the unsalted join (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Default salt fan-out: hot keys spread over this many reducers.
DEFAULT_SALT = 8


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Column,
    how: str = "inner",
    salt: int = DEFAULT_SALT,
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: salt the skewed side,
    replicate the other side ``salt`` ways, join on (predicate, salt).

    The salt is derived by hashing the skewed side's full row — any
    uniform assignment preserves join semantics, and a deterministic
    derivation keeps reruns stable. The replicated side grows S× — use
    this only when that side is the (much) smaller one, which is the
    only situation where salting beats AQE anyway.

    Only join types whose output is unaffected by replicating the
    ``small`` side are allowed: inner/left preserve rows exactly, and
    semi/anti test key existence (every salt replica carries the same
    keys). right/full would surface each unmatched small-side row S
    times — rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "semi", "leftsemi", "left_anti", "anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; {how!r} would "
            "multiply unmatched replicated-side rows by the salt count"
        )
    salted = skewed.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted.join(
        replicated, on & (salted["_salt"] == replicated["_salt"]), how
    )
    return out.drop("_salt")


def skew_confs(spark) -> dict[str, str]:
    """The engine's runtime skew posture (asserted in tests)."""
    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
    )
    return {k: spark.conf.get(k) for k in keys}
