"""Iterative model fitting as mergeable aggregates: logistic
regression by IRLS/Newton, expressed Spark-first.

A quality-classifier fit (the fastText/logreg stage of every corpus
curation stack — score documents, gate on the score) looks like it
needs an ML library, but for a linear model the ENGINE-side work of
each Newton step is exactly one mergeable aggregate: with
p = sigmoid(X beta) and W = diag(p(1-p)),

    H = X^T W X        (p(p+1)/2 sums)
    g = X^T (y - p)    (p sums)

— a dozen doubles per pass, map-side combinable, shuffling nothing but
partial moment states no matter how many rows X has.  The driver-side
work per step is solving a pxp system (here 3x3 via the explicit
adjugate/Cramer formulas), the same bounded-collect pattern as
fit_range_bins' bucket counts.  At 100 TB each iteration is one scan —
the standard distributed-GLM design (Spark MLlib's own LogisticRegression
does treeAggregate of the identical sufficient statistics); this
re-derivation keeps the whole model inside DataFrame aggregates so the
DuckDB oracle can replay EVERY iteration as a CTE chain, Cramer solve
included, and the final coefficients hash-match.

The adjugate formulas live in _CRAMER as engine-neutral expression
templates: Python evaluates them with float arithmetic, the oracle
generator interpolates the SAME strings into SQL — identical operation
order, so the two engines diverge only by aggregate-sum ulps, absorbed
by output rounding.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "logreg_irls",
    "logreg_sql_oracle",
    "ols_fit",
    "ols_sql_oracle",
    "CRAMER_EXPRS",
]

# det(H) and det(H with column j := g), 3x3 symmetric H, first-row
# cofactor expansion.  ONE source of truth for both engines: Python
# eval()s these, the SQL oracle interpolates them verbatim.
CRAMER_EXPRS: dict[str, str] = {
    "det": (
        "h00*(h11*h22 - h12*h12) - h01*(h01*h22 - h12*h02)"
        " + h02*(h01*h12 - h11*h02)"
    ),
    "det0": (
        "g0*(h11*h22 - h12*h12) - h01*(g1*h22 - h12*g2)"
        " + h02*(g1*h12 - h11*g2)"
    ),
    "det1": (
        "h00*(g1*h22 - h12*g2) - g0*(h01*h22 - h12*h02)"
        " + h02*(h01*g2 - g1*h02)"
    ),
    "det2": (
        "h00*(h11*g2 - g1*h12) - h01*(h01*g2 - g1*h02)"
        " + g0*(h01*h12 - h11*h02)"
    ),
}


def _solve3(s: dict[str, float]) -> tuple[float, float, float]:
    """Cramer solve of H delta = g from the sufficient-statistic sums,
    evaluating CRAMER_EXPRS with plain float arithmetic (the same
    doubles, in the same order, as the SQL oracle)."""
    env = dict(s)
    det = eval(CRAMER_EXPRS["det"], {"__builtins__": {}}, env)  # noqa: S307
    if det == 0.0 or not math.isfinite(det):
        raise ValueError(f"singular Hessian (det={det})")
    return tuple(
        eval(CRAMER_EXPRS[f"det{j}"], {"__builtins__": {}}, env) / det  # noqa: S307
        for j in range(3)
    )


def logreg_irls(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    label_col: str,
    n_iter: int = 4,
    round_dp: int = 4,
) -> DataFrame:
    """Fit y ~ sigmoid(b0 + b1*x1 + b2*x2) by ``n_iter`` Newton/IRLS
    steps from beta = 0, plus a final mean-log-loss scoring pass.

    Per step: ONE aggregate over df collecting the 6 Hessian + 3
    gradient sums (map-side combine; 9 doubles cross the wire), then a
    driver-side 3x3 Cramer solve — see the module docstring for why
    this is the scale-correct distributed-GLM shape.  The iteration
    count is FIXED (not convergence-tested) so the oracle can replay
    the exact computation; 4 Newton steps is past convergence for any
    well-scaled 2-feature problem.

    Rows with NULL features/label are dropped.  Output: ONE row
    (n, b0, b1, b2, log_loss), coefficients rounded to ``round_dp``.
    """
    d = (
        df.where(
            F.col(x1_col).isNotNull()
            & F.col(x2_col).isNotNull()
            & F.col(label_col).isNotNull()
        )
        .select(
            F.col(label_col).cast("double").alias("_y"),
            F.col(x1_col).cast("double").alias("_x1"),
            F.col(x2_col).cast("double").alias("_x2"),
        )
    )
    beta = (0.0, 0.0, 0.0)
    for _ in range(int(n_iter)):
        eta = (
            F.lit(beta[0])
            + F.lit(beta[1]) * F.col("_x1")
            + F.lit(beta[2]) * F.col("_x2")
        )
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = mu * (F.lit(1.0) - mu)
        xs = {"x0": F.lit(1.0), "x1": F.col("_x1"), "x2": F.col("_x2")}
        aggs = []
        for i, a in enumerate(("x0", "x1", "x2")):
            for j, b in enumerate(("x0", "x1", "x2")):
                if j >= i:
                    aggs.append(
                        F.sum(w * xs[a] * xs[b]).alias(f"h{i}{j}")
                    )
        for j, a in enumerate(("x0", "x1", "x2")):
            aggs.append(F.sum((F.col("_y") - mu) * xs[a]).alias(f"g{j}"))
        row = d.agg(*aggs).collect()[0]
        delta = _solve3({k: float(row[k]) for k in row.asDict()})
        beta = tuple(b + dl for b, dl in zip(beta, delta))

    eta = (
        F.lit(beta[0])
        + F.lit(beta[1]) * F.col("_x1")
        + F.lit(beta[2]) * F.col("_x2")
    )
    mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    score = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(
            -(
                F.col("_y") * F.log(mu)
                + (F.lit(1.0) - F.col("_y")) * F.log(F.lit(1.0) - mu)
            )
        ).alias("_loss"),
    ).collect()[0]
    out = [
        (
            int(score["n"]),
            round(beta[0], round_dp),
            round(beta[1], round_dp),
            round(beta[2], round_dp),
            round(float(score["_loss"]), round_dp),
        )
    ]
    return df.sparkSession.createDataFrame(
        out, "n bigint, b0 double, b1 double, b2 double, log_loss double"
    )


def logreg_sql_oracle(
    data_cte: str,
    n_iter: int = 4,
    round_dp: int = 4,
) -> str:
    """Generate the DuckDB replay of logreg_irls as one WITH chain:
    ``data_cte`` must be a SELECT producing columns (y, x1, x2); each
    iteration is a sums-CTE (same 9 aggregates) feeding a beta-CTE
    whose update interpolates CRAMER_EXPRS verbatim."""
    parts = [f"d AS ({data_cte})", "b0_ AS (SELECT 0.0 b0, 0.0 b1, 0.0 b2)"]
    for k in range(1, int(n_iter) + 1):
        prev = f"b{k - 1}_"
        mu = "1.0/(1.0 + exp(-(b0 + b1*x1 + b2*x2)))"
        parts.append(
            f"""s{k} AS (
              SELECT SUM(w*1.0*1.0) h00, SUM(w*1.0*x1) h01,
                     SUM(w*1.0*x2) h02, SUM(w*x1*x1) h11,
                     SUM(w*x1*x2) h12, SUM(w*x2*x2) h22,
                     SUM((y-mu)*1.0) g0, SUM((y-mu)*x1) g1,
                     SUM((y-mu)*x2) g2
              FROM (SELECT y, x1, x2, {mu} AS mu,
                           ({mu}) * (1.0 - ({mu})) AS w
                    FROM d CROSS JOIN {prev})
            )"""
        )
        det = CRAMER_EXPRS["det"]
        ups = ", ".join(
            f"b{j} + ({CRAMER_EXPRS[f'det{j}']}) / ({det}) AS b{j}"
            for j in range(3)
        )
        parts.append(
            f"b{k}_ AS (SELECT {ups} FROM s{k} CROSS JOIN {prev})"
        )
    last = f"b{int(n_iter)}_"
    mu = "1.0/(1.0 + exp(-(b0 + b1*x1 + b2*x2)))"
    chain = ",\n".join(parts)
    return f"""
        WITH {chain}
        SELECT COUNT(*) AS n,
               ROUND(any_value(b0), {round_dp}) AS b0,
               ROUND(any_value(b1), {round_dp}) AS b1,
               ROUND(any_value(b2), {round_dp}) AS b2,
               ROUND(AVG(-(y * ln({mu})
                           + (1.0 - y) * ln(1.0 - ({mu})))),
                     {round_dp}) AS log_loss
        FROM d CROSS JOIN {last}
    """


def ols_fit(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    label_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Closed-form OLS of y ~ b0 + b1*x1 + b2*x2 — the two-feature
    completion of the regr_* single-feature fits (zipf_slope,
    heaps_law): the normal equations X^T X beta = X^T y are NINE
    mergeable moment sums (one map-side-combinable aggregate over df)
    and the solve is the same 3x3 Cramer adjugate as logreg_irls,
    sharing CRAMER_EXPRS so the DuckDB oracle interpolates the
    identical formulas.  One scan, no iteration; R^2 from the same
    pass's y moments.

    Output: ONE row (n, b0, b1, b2, r2).  NULL rows drop; collinear
    features raise (singular normal matrix).
    """
    d = df.where(
        F.col(x1_col).isNotNull()
        & F.col(x2_col).isNotNull()
        & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).cast("double").alias("_y"),
        F.col(x1_col).cast("double").alias("_x1"),
        F.col(x2_col).cast("double").alias("_x2"),
    )
    one = F.lit(1.0)
    xs = {"x0": one, "x1": F.col("_x1"), "x2": F.col("_x2")}
    aggs = []
    for i, a in enumerate(("x0", "x1", "x2")):
        for j, b in enumerate(("x0", "x1", "x2")):
            if j >= i:
                aggs.append(F.sum(xs[a] * xs[b]).alias(f"h{i}{j}"))
    for j, a in enumerate(("x0", "x1", "x2")):
        aggs.append(F.sum(F.col("_y") * xs[a]).alias(f"g{j}"))
    aggs += [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    ]
    row = d.agg(*aggs).collect()[0]
    beta = _solve3(
        {k: float(row[k]) for k in row.asDict() if k[0] in "hg"}
    )
    n = int(row["n"])
    # R^2 = 1 - SSE/SST, SSE = y'y - beta' X'y (normal-equation form)
    sse = float(row["_syy"]) - sum(
        b * float(row[f"g{j}"]) for j, b in enumerate(beta)
    )
    sst = float(row["_syy"]) - float(row["g0"]) ** 2 / n
    r2 = 1.0 - sse / sst if sst > 0 else float("nan")
    out = [
        (
            n,
            round(beta[0], round_dp),
            round(beta[1], round_dp),
            round(beta[2], round_dp),
            round(r2, round_dp),
        )
    ]
    return df.sparkSession.createDataFrame(
        out, "n bigint, b0 double, b1 double, b2 double, r2 double"
    )


def ols_sql_oracle(data_cte: str, round_dp: int = 6) -> str:
    """DuckDB replay of ols_fit: the same nine moment sums, the same
    CRAMER_EXPRS solve, the same normal-equation R^2."""
    det = CRAMER_EXPRS["det"]
    betas = ", ".join(
        f"({CRAMER_EXPRS[f'det{j}']}) / ({det}) AS b{j}" for j in range(3)
    )
    return f"""
        WITH d AS ({data_cte}),
        s AS (
          SELECT SUM(1.0*1.0) h00, SUM(1.0*x1) h01, SUM(1.0*x2) h02,
                 SUM(x1*x1) h11, SUM(x1*x2) h12, SUM(x2*x2) h22,
                 SUM(y*1.0) g0, SUM(y*x1) g1, SUM(y*x2) g2,
                 COUNT(*) AS n, SUM(y*y) AS syy
          FROM d
        ),
        b AS (SELECT {betas}, n, syy, g0, g1, g2 FROM s)
        SELECT n,
               ROUND(b0, {round_dp}) AS b0,
               ROUND(b1, {round_dp}) AS b1,
               ROUND(b2, {round_dp}) AS b2,
               ROUND(1.0 - (syy - (b0*g0 + b1*g1 + b2*g2))
                         / (syy - g0*g0 / n), {round_dp}) AS r2
        FROM b
    """
