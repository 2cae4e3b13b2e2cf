"""Deterministic resampling: Poisson-bootstrap confidence intervals.

"Is the mean stable, or is it one fat order away from moving?" needs a
sampling distribution, not a point estimate.  The classic bootstrap
(resample n rows with replacement, R times) is a driver-side loop; the
scale-correct formulation is the POISSON BOOTSTRAP (Chamandy et al.,
"Estimating Uncertainty for Massive Data Streams", Google 2012; public):
each row enters replicate r with weight ~ Poisson(1), independently per
row — so replicate membership is a pure per-row map and ALL R replicates
accumulate in ONE aggregation pass with no row multiplication: R paired
(Σ w·x, Σ w) columns, partial-aggregated map-side like any other sum.

Determinism (the property the cross-engine oracle needs, and what makes
the gate reproducible run-to-run): the Poisson draw is the inverse-CDF
of a uniform derived from ``md5(key#boot<r>) mod 1e6`` — the same
engine-portable 60-bit md5 fold the sampling operators use
(pipeline/text.md5_long), so any engine recomputes the exact same
weights.  At production scale, where no second engine needs to agree,
swap in a cheaper 64-bit hash (e.g. xxhash64) — the algorithm is
hash-agnostic.

Extension — no reference counterpart; the reference's numeric family
gates point statistics only (numeric.py mean/percentile bounds).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..pipeline.text import md5_long

#: Inverse-CDF thresholds for Poisson(mean=1) on a uniform integer in
#: [0, 1e6): weight = #thresholds strictly below u, capped at MAX_W.
#: floor(F(k) * 1e6) for k = 0..7; beyond 8 the mass is < 1e-6.
POISSON1_THRESHOLDS_PPM = [
    367879,  # F(0) = e^-1
    735758,
    919698,
    981011,
    996340,
    999405,
    999916,
    999989,
]
POISSON_MAX_W = len(POISSON1_THRESHOLDS_PPM)

_PPM = 1_000_000


def poisson1_weight(key, rep: int, salt: str = "boot"):
    """Deterministic Poisson(1) draw for ``(key, rep)`` as a Column.

    ``u = md5(key#<salt><rep>) mod 1e6`` -> inverse CDF via the
    threshold ladder.  Exact integer comparisons, identical in any
    engine that reproduces the md5 fold.
    """
    u = md5_long(key, salt=f"{salt}{rep}") % _PPM
    w = F.lit(POISSON_MAX_W)
    # descending CASE ladder: first threshold u falls under wins
    for k in range(POISSON_MAX_W - 1, -1, -1):
        w = F.when(u < POISSON1_THRESHOLDS_PPM[k], k).otherwise(w)
    return w


def bootstrap_mean_ci(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_reps: int = 64,
    p_lo: float = 2.5,
    p_hi: float = 97.5,
    salt: str = "boot",
) -> DataFrame:
    """One-row Poisson-bootstrap digest of ``mean(value_col)``:
    ``(n_rows, n_reps, point_mean, boot_lo, boot_median, boot_hi)``.

    ``boot_lo``/``boot_hi`` are the empirical ``p_lo``/``p_hi``
    percentiles of the R replicate means under the repo's exact
    percentile rule ("smallest v with >= p% of replicates <= v", ties
    broken by replicate id), so the digest is fully deterministic.
    ``value_col`` should be integer-valued (cents, counts): the
    replicate numerators accumulate as DECIMAL(38,0) — exact at any
    scale — and each mean divides ONCE as a double, rounded to 6dp.

    Plan shape: ONE aggregation pass produces 2R+2 columns (map-side
    partials, no shuffle growth with R); the R means explode to an
    R-row bounded frame whose rank window is trivially small.  Cost is
    R md5 evaluations per row — all JVM whole-stage-codegen, no Python.
    """
    if n_reps < 4:
        raise ValueError("n_reps must be at least 4")
    if not (0.0 < p_lo < p_hi < 100.0):
        raise ValueError("need 0 < p_lo < p_hi < 100")
    key = F.col(key_col).cast("string")
    v = F.col(value_col)
    aggs = [
        F.count(F.lit(1)).alias("__cnt"),
        F.sum(v.cast("decimal(38,0)")).alias("__s"),
    ]
    for r in range(n_reps):
        w = poisson1_weight(key, r, salt=salt)
        aggs.append(
            F.sum((w.cast("decimal(19,0)") * v).cast("decimal(38,0)")).alias(
                f"__sw{r}"
            )
        )
        aggs.append(F.sum(w.cast("bigint")).alias(f"__n{r}"))
    wide = df.agg(*aggs)
    rep_means = F.array(
        *[
            F.struct(
                F.lit(r).alias("rep"),
                F.when(
                    F.col(f"__n{r}") > 0,
                    F.round(
                        F.col(f"__sw{r}").cast("double")
                        / F.col(f"__n{r}").cast("double"),
                        6,
                    ),
                ).alias("m"),
            )
            for r in range(n_reps)
        ]
    )
    exploded = wide.select(
        "__cnt", "__s", F.explode(rep_means).alias("e")
    ).select(
        "__cnt",
        "__s",
        F.col("e.rep").alias("rep"),
        F.col("e.m").alias("m"),
    )
    rn = F.row_number().over(Window.orderBy("m", "rep"))
    lo_idx = math.ceil(p_lo / 100.0 * n_reps)
    med_idx = math.ceil(0.5 * n_reps)
    hi_idx = math.ceil(p_hi / 100.0 * n_reps)
    ranked = exploded.select("__cnt", "__s", "m", rn.alias("rn"))
    return ranked.groupBy("__cnt", "__s").agg(
        F.max(F.when(F.col("rn") == lo_idx, F.col("m"))).alias("boot_lo"),
        F.max(F.when(F.col("rn") == med_idx, F.col("m"))).alias(
            "boot_median"
        ),
        F.max(F.when(F.col("rn") == hi_idx, F.col("m"))).alias("boot_hi"),
    ).select(
        F.col("__cnt").cast("bigint").alias("n_rows"),
        F.lit(n_reps).cast("int").alias("n_reps"),
        F.when(
            F.col("__cnt") > 0,
            F.round(
                F.col("__s").cast("double") / F.col("__cnt").cast("double"),
                6,
            ),
        ).alias("point_mean"),
        "boot_lo",
        "boot_median",
        "boot_hi",
    )
