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
    "pca_power",
    "pca_sql_oracle",
    "calibration_curve",
    "calibration_sql_oracle",
    "auc_score",
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


# compiled once at import: the adjugate-determinant expressions are
# module-level constants shared verbatim with the SQL oracle; a
# dynamically-built dict must never reach eval, so only these
# precompiled code objects are evaluated
_CRAMER_CODE = {
    k: compile(v, f"<cramer:{k}>", "eval") for k, v in CRAMER_EXPRS.items()
}


def _solve3(s: dict[str, float]) -> tuple[float, float, float]:
    """Cramer solve of H delta = g from the sufficient-statistic sums,
    evaluating the precompiled CRAMER_EXPRS with plain float
    arithmetic (the same doubles, in the same order, as the SQL
    oracle)."""
    env = dict(s)
    det = eval(_CRAMER_CODE["det"], {"__builtins__": {}}, env)  # noqa: S307
    if det == 0.0 or not math.isfinite(det):
        raise ValueError(f"singular Hessian (det={det})")
    return tuple(
        eval(_CRAMER_CODE[f"det{j}"], {"__builtins__": {}}, env) / det  # noqa: S307
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


def pca_power(
    df: DataFrame,
    emb_col: str = "embedding",
    n_iter: int = 8,
    round_dp: int = 4,
) -> DataFrame:
    """Top principal component of an embedding column by centered
    power iteration — the embedding-drift / whitening diagnostic (how
    much of the corpus's variance lives on one axis; an embedding
    space collapsing toward rank-1 is a known failure smell).

    The same aggregates-only design as logreg_irls: one pass computes
    the d mean sums; each of the ``n_iter`` power steps is ONE
    aggregate over the centered rows collecting d sums
    (s = sum_x (x-m) * ((x-m) . v) = C'v up to scale), then the
    driver normalizes (d floats collected per step).  No d x d matrix
    is ever materialized — the Gram-vector product folds into the row
    pass, which is what makes this the 100-TB shape (MLlib's
    RowMatrix.computePrincipalComponents materializes the d x d
    covariance the same aggregate way).  Fixed iteration count +
    all-positive uniform init make the result (including the sign)
    deterministic, so the DuckDB oracle replays every step as CTEs
    over an (vec, dim, centered-x) triple table and the outputs
    hash-match at ``round_dp``.

    Output: one row PER DIMENSION (dim_idx 1-based, loading, n, dim,
    eigenvalue, explained_var — scalars repeated) — row-per-dim
    rather than an array column so the result is plainly sortable/
    hashable by any comparator; eigenvalue is the top COVARIANCE
    eigenvalue (||C'v|| / (n-1)), explained_var its share of total
    variance, loading the unit-vector entry (rounded).
    """
    import math as _math

    if int(n_iter) < 1:
        raise ValueError(f"pca_power: n_iter must be >= 1, got {n_iter}")
    emb = F.col(emb_col)
    # dimension = the MAX observed length (deterministic, unlike an
    # arbitrary first()); rows of any other length are rejected rather
    # than silently dropped — mixed lengths are an ingest bug
    dims = df.agg(
        F.max(F.size(emb)).alias("_dmax"),
        F.min(F.size(emb)).alias("_dmin"),
        F.count(F.lit(1)).alias("_cnt"),
    ).collect()[0]
    if not dims["_cnt"]:
        raise ValueError("pca_power: empty input")
    if dims["_dmax"] != dims["_dmin"]:
        raise ValueError(
            "pca_power: mixed embedding lengths "
            f"({dims['_dmin']}..{dims['_dmax']})"
        )
    d = int(dims["_dmax"])
    base = df.select(emb.cast("array<double>").alias("_e"))
    m_row = base.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.element_at("_e", i + 1)).alias(f"m{i}")
            for i in range(d)
        ],
    ).collect()[0]
    n = int(m_row["n"])
    if n < 2:
        raise ValueError("pca_power: need >= 2 rows")
    means = [float(m_row[f"m{i}"]) / n for i in range(d)]
    mean_lit = F.array(*[F.lit(m) for m in means])
    cx = base.select(
        F.zip_with("_e", mean_lit, lambda x, m: x - m).alias("_c")
    )
    v = [1.0 / _math.sqrt(d)] * d
    nrm = 0.0
    for _ in range(int(n_iter)):
        v_lit = F.array(*[F.lit(x) for x in v])
        dot = F.aggregate(
            F.zip_with("_c", v_lit, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        row = cx.agg(
            *[
                F.sum(F.element_at("_c", i + 1) * dot).alias(f"s{i}")
                for i in range(d)
            ],
            F.sum(
                F.aggregate(
                    F.transform("_c", lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            ).alias("ss"),
        ).collect()[0]
        s = [float(row[f"s{i}"]) for i in range(d)]
        nrm = _math.sqrt(sum(x * x for x in s))
        if nrm == 0.0:
            raise ValueError("pca_power: zero-variance input")
        v = [x / nrm for x in s]
        total_ss = float(row["ss"])
    eigenvalue = nrm / (n - 1)
    explained = eigenvalue / (total_ss / (n - 1))
    out = [
        (
            i + 1,
            round(v[i], round_dp),
            n,
            d,
            round(eigenvalue, round_dp),
            round(explained, round_dp),
        )
        for i in range(d)
    ]
    return df.sparkSession.createDataFrame(
        out,
        "dim_idx int, loading double, n bigint, dim int,"
        " eigenvalue double, explained_var double",
    )


def pca_sql_oracle(
    table: str = "embeddings",
    emb_col: str = "embedding",
    n_iter: int = 8,
    round_dp: int = 4,
) -> str:
    """DuckDB replay of pca_power over the (vec, dim, centered-x)
    triple table: the same mean pass, the same per-step
    dot -> d-sums -> normalize CTEs (MATERIALIZED — the chain is
    self-referencing)."""
    parts = [
        f"""ex AS MATERIALIZED (
          SELECT vec_id, generate_subscripts({emb_col}, 1) AS i,
                 CAST(unnest({emb_col}) AS DOUBLE) AS x
          FROM {table}
        )""",
        """mn AS MATERIALIZED (
          SELECT i, SUM(x) / MAX(nn.n) AS m
          FROM ex CROSS JOIN (
            SELECT CAST(COUNT(DISTINCT vec_id) AS DOUBLE) AS n FROM ex
          ) nn
          GROUP BY i
        )""",
        """cx AS MATERIALIZED (
          SELECT ex.vec_id, ex.i, ex.x - mn.m AS x
          FROM ex JOIN mn USING (i)
        )""",
        """dims AS (SELECT CAST(COUNT(*) AS DOUBLE) AS d FROM mn)""",
        """b0 AS MATERIALIZED (
          SELECT i, 1.0 / sqrt(dims.d) AS v
          FROM mn CROSS JOIN dims
        )""",
    ]
    for k in range(1, int(n_iter) + 1):
        parts.append(
            f"""u{k} AS MATERIALIZED (
              SELECT cx.vec_id, SUM(cx.x * b.v) AS dt
              FROM cx JOIN b{k - 1} b USING (i)
              GROUP BY cx.vec_id
            )"""
        )
        parts.append(
            f"""s{k} AS MATERIALIZED (
              SELECT cx.i, SUM(cx.x * u.dt) AS s
              FROM cx JOIN u{k} u USING (vec_id)
              GROUP BY cx.i
            )"""
        )
        parts.append(
            f"""b{k} AS MATERIALIZED (
              SELECT i, s / nrm.nr AS v
              FROM s{k} CROSS JOIN
                (SELECT sqrt(SUM(s * s)) AS nr FROM s{k}) nrm
            )"""
        )
    last = int(n_iter)
    chain = ",\n".join(parts)
    return f"""
        WITH {chain},
        scal AS (
          SELECT CAST(COUNT(DISTINCT vec_id) AS DOUBLE) AS n,
                 SUM(x * x) AS ss
          FROM cx
        ),
        lam AS (
          SELECT (SELECT sqrt(SUM(s * s)) FROM s{last}) AS nr
        )
        SELECT CAST(b.i AS INT) AS dim_idx,
               ROUND(b.v, {round_dp}) AS loading,
               CAST(scal.n AS BIGINT) AS n,
               CAST(dims.d AS INT) AS dim,
               ROUND(lam.nr / (scal.n - 1), {round_dp}) AS eigenvalue,
               ROUND((lam.nr / (scal.n - 1))
                     / (scal.ss / (scal.n - 1)), {round_dp})
                 AS explained_var
        FROM b{last} b CROSS JOIN scal CROSS JOIN dims CROSS JOIN lam
    """


def calibration_curve(
    df: DataFrame,
    x1_col: str,
    x2_col: str,
    label_col: str,
    n_bins: int = 10,
    n_iter: int = 4,
    round_dp: int = 6,
) -> DataFrame:
    """Reliability diagram + expected calibration error for the
    logreg_irls quality classifier — the eval step that tells a
    pipeline whether the score it is about to GATE on can be read as
    a probability (a miscalibrated 0.9 is not "90% good").

    Fits via logreg_irls, then scores with the ROUNDED published
    coefficients (the same 4dp values both engines hash-match on, so
    the score arithmetic is literal-identical cross-engine), bins
    scores into ``n_bins`` fixed-width bins (clamped so score 1.0
    lands in the last bin), and per bin reports size, mean confidence
    and empirical accuracy; ECE = sum_b (n_b/N) |acc_b - conf_b|
    rides every row.  Scoring + binning is one codegen pass + one
    n_bins-sized aggregate; the ECE window runs over the n_bins-row
    result.

    Output: one row per non-empty bin (bin, n, conf, acc, ece).
    """
    fit = logreg_irls(
        df, x1_col, x2_col, label_col, n_iter=n_iter
    ).collect()[0]
    b0, b1, b2 = fit["b0"], fit["b1"], fit["b2"]
    d = df.where(
        F.col(x1_col).isNotNull()
        & F.col(x2_col).isNotNull()
        & F.col(label_col).isNotNull()
    )
    mu = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(
            -(
                F.lit(b0)
                + F.lit(b1) * F.col(x1_col).cast("double")
                + F.lit(b2) * F.col(x2_col).cast("double")
            )
        )
    )
    nb = int(n_bins)
    binned = d.select(
        F.least(
            F.floor(mu * nb).cast("int"), F.lit(nb - 1)
        ).alias("bin"),
        mu.alias("_mu"),
        F.col(label_col).cast("double").alias("_y"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("_mu").alias("_conf"),
        F.avg("_y").alias("_acc"),
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy()
    ece = F.sum(
        F.col("n") * F.abs(F.col("_acc") - F.col("_conf"))
    ).over(w) / F.sum("n").over(w)
    return per_bin.select(
        "bin",
        "n",
        F.round("_conf", round_dp).alias("conf"),
        F.round("_acc", round_dp).alias("acc"),
        F.round(ece, round_dp).alias("ece"),
    )


def calibration_sql_oracle(
    data_cte: str,
    n_bins: int = 10,
    n_iter: int = 4,
    round_dp: int = 6,
) -> str:
    """DuckDB replay of calibration_curve: the full logreg oracle as
    a nested-WITH subquery CTE (its 4dp-rounded coefficients), then
    the identical score/bin/aggregate/ECE arithmetic."""
    inner = logreg_sql_oracle(data_cte, n_iter=n_iter)
    nb = int(n_bins)
    return f"""
        WITH fit AS MATERIALIZED (SELECT * FROM ({inner})),
        d AS ({data_cte}),
        scored AS (
          SELECT LEAST(CAST(floor(
                   (1.0/(1.0 + exp(-(fit.b0 + fit.b1*d.x1
                                     + fit.b2*d.x2)))) * {nb}
                 ) AS INT), {nb - 1}) AS bin,
                 1.0/(1.0 + exp(-(fit.b0 + fit.b1*d.x1
                                  + fit.b2*d.x2))) AS mu,
                 d.y
          FROM d CROSS JOIN fit
        ),
        per_bin AS (
          SELECT bin, COUNT(*) AS n, AVG(mu) AS conf, AVG(y) AS acc
          FROM scored GROUP BY bin
        )
        SELECT bin, n,
               ROUND(conf, {round_dp}) AS conf,
               ROUND(acc, {round_dp}) AS acc,
               ROUND(SUM(n * abs(acc - conf)) OVER ()
                     / SUM(n) OVER (), {round_dp}) AS ece
        FROM per_bin
    """


def auc_score(
    df: DataFrame,
    score_col: str,
    label_col: str,
    round_dp: int = 6,
    tie_dp: int = 12,
) -> DataFrame:
    """ROC AUC of a score column against a binary label — the
    ranking-quality half of the classifier-eval pair (calibration_curve
    measures probability quality; AUC measures whether the score
    ORDERS positives above negatives at all).

    Computed exactly via the rank-sum identity AUC = (R_pos -
    n_pos(n_pos+1)/2) / (n_pos * n_neg) with fractional tie ranks —
    i.e. the Mann-Whitney machinery applied to (score, label): one
    map-side-combinable groupBy to per-distinct-score (total,
    positive) counts, ONE range-repartition prefix pass
    (curation.exact_rank_prefix) for the cumulative ranks, one scalar
    aggregate.  Never sorts rows globally, never materializes the
    n_pos x n_neg pair set.

    Output: ONE row (n_pos, n_neg, auc); degenerate inputs (single
    class) yield NULL auc.

    Tie groups form on the score rounded to ``tie_dp`` decimals (the
    rounded-order-key convention every other ranking operator here
    follows): a cross-engine exp() ulp difference on an unrounded
    sigmoid could merge/split a tie and shift fractional ranks.
    """
    from .stats import fractional_rank_sums

    d = df.where(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.round(F.col(score_col).cast("double"), tie_dp).alias("_v"),
        F.col(label_col).cast("double").alias("_y"),
    )
    vc = d.groupBy("_v").agg(
        F.count(F.lit(1)).cast("double").alias("_t"),
        F.sum("_y").alias("_m"),
    )
    s = fractional_rank_sums(vc)
    np_, nn_ = F.col("_nm"), F.col("_no")
    auc = F.when(
        (np_ > 0) & (nn_ > 0),
        (F.col("_rm") - np_ * (np_ + 1) / 2.0) / (np_ * nn_),
    )
    return s.select(
        np_.cast("long").alias("n_pos"),
        nn_.cast("long").alias("n_neg"),
        F.round(auc, round_dp).alias("auc"),
    )
