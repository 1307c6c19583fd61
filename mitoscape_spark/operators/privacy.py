"""Differential-privacy-style aggregate release: contribution bounding
+ clamping + seeded Laplace noise, fully deterministic and
engine-portable.

The release recipe every privacy-reviewed analytics export uses
(Google's DP-SQL / OpenDP shape):

1. **clamp** each value to [0, clamp] — bounds one record's influence;
2. **bound contributions**: sum per (contributor, group) first, clamp
   that partial, so one entity moves a group total by at most
   ``clamp`` regardless of how many rows it owns — the sensitivity
   argument needs this, a plain per-row clamp does not cap an entity
   with a million rows;
3. add Laplace(clamp / epsilon) noise per group.

Noise here is SEEDED and deterministic: u ∈ (0, 1] derives from
``md5(salt || group)`` exactly like the repo's sampling primitives
(operators/sampling.py), and the Laplace draw is the closed-form
inverse CDF  −b · sign(u − ½) · ln(1 − 2·|u − ½|).  Deterministic noise
is NOT a privacy mechanism against an adversary who knows the salt —
it is the reproducible-pipeline variant (same release every run,
testable, hash-checkable cross-engine) of the exact math a production
RNG would feed. k-anonymity suppression (operators/profile.py's
k_anonymity) is the companion control.

Plan shape: two hash aggs (contributor-level partial, then group
final) — the contributor agg is the same shuffle a plain groupBy
would need; the noise is a per-group scalar expression in the final
projection. Zero extra shuffles vs the non-private aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 16^13 + 1: maps the 13-hex-digit (52-bit, double-exact) md5 prefix
# to u ∈ (0, 1] — identical constant in the SQL oracles
_U_DENOM = 4503599627370497.0


def _uniform_from(col):
    return (
        F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("double")
        + F.lit(1.0)
    ) / F.lit(_U_DENOM)


def dp_sum(
    df: DataFrame,
    group_col: str,
    value_col: str,
    contributor_col: str,
    clamp: float,
    epsilon: float,
    salt: str = "dp",
) -> DataFrame:
    """Noisy per-group sum with per-contributor sensitivity ``clamp``
    and privacy budget ``epsilon``. Returns one row per group:
    (group, n_contributors, noisy_sum) — noisy_sum rounded to 2 dp
    (noise scale dwarfs cents; rounding also absorbs libm ln() ulp
    differences cross-engine).
    """
    if clamp <= 0 or epsilon <= 0:
        raise ValueError("dp_sum: clamp and epsilon must be positive")
    clamped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(0.0)),
        F.lit(float(clamp)),
    )
    per_contrib = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col, contributor_col)
        .agg(F.sum(clamped).alias("_part"))
        .select(
            group_col,
            contributor_col,
            F.least(F.col("_part"), F.lit(float(clamp))).alias("_part"),
        )
    )
    u = _uniform_from(
        F.concat(F.lit(salt), F.col(group_col).cast("string"))
    )
    b = float(clamp) / float(epsilon)
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return (
        per_contrib.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_contributors"),
            F.sum("_part").alias("_true"),
        )
        .select(
            group_col,
            "n_contributors",
            F.round(F.col("_true") + noise, 2).alias("noisy_sum"),
        )
    )
