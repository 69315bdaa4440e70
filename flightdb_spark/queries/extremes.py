"""Extreme-value-theory batch 121 (q671-q675) — the tail-risk
machinery a capacity/fraud/SLA pipeline runs over order totals
(exact integer cents end-to-end):

- q671 Hill tail-index: alpha from the top-201 order statistics
  (hill = mean ln(x_i / x_(k+1)); tied boundary rows contribute
  ln(1) = 0 so the estimator is tie-proof);
- q672 mean-excess function: e(u) over five thresholds at
  100..300% of the mean — the linearity diagnostic that justifies a
  GPD tail (slope sign reads off the tail class);
- q673 GPD method-of-moments at u = 2x mean: xi and beta from the
  exceedance moments — the peaks-over-threshold fit;
- q674 monthly block maxima + Gumbel moment fit: location/scale from
  the ~80 monthly maxima plus the 10-year (120-block) return level;
- q675 Hill return levels: quantile extrapolation
  RL(p) = x_ref * (k / (n p))^(1/alpha) at p = 1e-3..1e-5, the
  "what loss do we see once per N orders" table.

100 TB shape: q671/q675 reduce the corpus via orderBy().limit(201)
(TakeOrderedAndProject — per-partition top-k then one 201-row merge,
never a global sort); q672/q673 are single-pass filtered aggregates;
q674 aggregates to the bounded month table first. Nothing retains
more than the top-k or per-month rows.

Determinism: all money is BIGINT cents; squares accumulate as
DECIMAL(19,0) x DECIMAL(19,0) -> DECIMAL(38,0) (int128-safe in
DuckDB, q245 lesson); pure-rational outputs are emitted UNROUNDED
(identical straight-line ops, q666 lesson); anything through ln/exp
rounds transcendental TERMS at 9 dp into DECIMAL sums and the OUTPUT
at 6 dp (§5 two-decimals-finer contract); sqrt is IEEE-exact (§5);
Euler-gamma / sqrt(6)/pi / Gumbel plotting constants are Python
float literals inlined into both engines (§11).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

K_TAIL = 200  # Hill order statistics (top k+1 = 201 rows)

# §11: transcendental constants as Python literals, identical in both
# engines' SQL text. The e0 suffix forces DOUBLE parsing in DuckDB —
# a bare long decimal literal routes through DECIMAL and can land one
# ulp off the Python double (q681 lesson).
SQRT6_OVER_PI = repr(math.sqrt(6.0) / math.pi) + "e0"
EULER_GAMMA = repr(0.5772156649015329) + "e0"
# Gumbel 10-year (120 monthly blocks) plotting constant -ln(-ln(1-1/120))
GUMBEL_Y_120 = repr(-math.log(-math.log(1.0 - 1.0 / 120.0))) + "e0"


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "orders")).createOrReplaceTempView(
        "orders"
    )


def _cents_cte() -> str:
    return """cents AS (
      SELECT o_orderkey AS okey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders
    )"""


def _hill_cte() -> str:
    """Top-(k+1) order statistics -> Hill estimator. ref = the
    (k+1)-th largest = MIN over the limited set; rows tied with ref
    contribute ln(1) = 0, so ties cannot flip the estimate."""
    return f"""{_cents_cte()},
    topk AS (
      SELECT okey, c FROM cents
      ORDER BY c DESC, okey ASC
      LIMIT {K_TAIL + 1}
    ),
    refv AS (SELECT MIN(c) AS ref, CAST(COUNT(*) AS BIGINT) AS k1 FROM topk),
    hill AS (
      SELECT /*+ BROADCAST(r) */
             r.ref,
             CAST((SELECT COUNT(*) FROM cents) AS BIGINT) AS n_total,
             CAST(SUM(CAST(ROUND(ln(CAST(t.c AS DOUBLE)
                                     / CAST(r.ref AS DOUBLE)), 9)
                           AS DECIMAL(38,9))) AS DOUBLE)
               / CAST({K_TAIL} AS DOUBLE) AS hill_mean_log
      FROM topk t CROSS JOIN refv r
      GROUP BY r.ref
    )"""


# ---------------------------------------------------------------------------
# q671 — Hill tail index

_HILL_SQL = f"""
    WITH {_hill_cte()}
    SELECT CAST({K_TAIL} AS BIGINT) AS k_tail,
           n_total,
           CAST(ref AS DOUBLE) / CAST(100 AS DOUBLE) AS threshold_dollars,
           ROUND(hill_mean_log, 6) AS hill_estimate,
           ROUND(CAST(1 AS DOUBLE) / hill_mean_log, 6) AS tail_index_alpha
    FROM hill
    """


@query("q671_hill_tail_index", oracle=_HILL_SQL)
def q671_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the tail index over the 200 largest order
    totals: hill = mean ln(x_i / x_(201)), alpha = 1/hill. Selection
    is orderBy+limit (TakeOrderedAndProject — per-partition top-k,
    one tiny merge); ln terms round at 9 dp into a DECIMAL sum (§5),
    outputs at 6 dp."""
    _views(spark, sf_dir)
    return spark.sql(_HILL_SQL)


# ---------------------------------------------------------------------------
# q672 — mean-excess function

_ME_SQL = f"""
    WITH {_cents_cte()},
    meanv AS (
      SELECT CAST(FLOOR(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mean_c
      FROM cents
    ),
    grid AS (
      SELECT CAST(m.j AS BIGINT) AS mult_pct,
             CAST(FLOOR(CAST(v.mean_c * m.j AS DOUBLE)
                        / CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS u
      FROM meanv v
      JOIN (SELECT 100 AS j UNION ALL SELECT 150 UNION ALL SELECT 200
            UNION ALL SELECT 250 UNION ALL SELECT 300) m ON 1 = 1
    )
    SELECT /*+ BROADCAST(g) */ g.mult_pct,
           CAST(g.u AS DOUBLE) / CAST(100 AS DOUBLE) AS threshold_dollars,
           CAST(SUM(CASE WHEN c.c > g.u THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exceed,
           CASE WHEN SUM(CASE WHEN c.c > g.u THEN 1 ELSE 0 END) = 0
                THEN CAST(NULL AS DOUBLE)
                ELSE CAST(SUM(CASE WHEN c.c > g.u THEN c.c - g.u
                         ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
                  / CAST(SUM(CASE WHEN c.c > g.u THEN 1 ELSE 0 END)
                         AS DOUBLE)
                  / CAST(100 AS DOUBLE)
           END AS mean_excess_dollars
    FROM cents c CROSS JOIN grid g
    GROUP BY g.mult_pct, g.u
    ORDER BY g.mult_pct
    """


@query("q672_mean_excess", oracle=_ME_SQL)
def q672_mean_excess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mean-excess (mean-residual-life) function e(u) over five
    thresholds at 100..300% of the mean order total. Linear-in-u mean
    excess is the textbook GPD diagnostic: rising = heavy tail
    (xi > 0), flat = exponential, falling = bounded. Exact integer
    exceedance sums; one unrounded terminal quotient per row."""
    _views(spark, sf_dir)
    return spark.sql(_ME_SQL)


# ---------------------------------------------------------------------------
# q673 — GPD method-of-moments (peaks over threshold)

_GPD_SQL = f"""
    WITH {_cents_cte()},
    meanv AS (
      SELECT CAST(FLOOR(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mean_c
      FROM cents
    ),
    exc AS (
      SELECT /*+ BROADCAST(v) */ c.c - CAST(2 AS BIGINT) * v.mean_c AS y
      FROM cents c CROSS JOIN meanv v
      WHERE c.c > CAST(2 AS BIGINT) * v.mean_c
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exc,
             CAST(SUM(y) AS BIGINT) AS sy,
             SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sy2
      FROM exc
    )
    SELECT n_exc,
           CAST(sy AS DOUBLE) / CAST(n_exc AS DOUBLE) / CAST(100 AS DOUBLE)
             AS mean_exceed_dollars,
           ROUND(CAST(0.5 AS DOUBLE)
                 * (CAST(1 AS DOUBLE)
                    - (CAST(sy AS DOUBLE) / CAST(n_exc AS DOUBLE))
                      * (CAST(sy AS DOUBLE) / CAST(n_exc AS DOUBLE))
                      / ((CAST(sy2 AS DOUBLE)
                          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                            / CAST(n_exc AS DOUBLE))
                         / CAST(n_exc - 1 AS DOUBLE))), 6) AS xi_mom,
           ROUND(CAST(0.5 AS DOUBLE)
                 * (CAST(sy AS DOUBLE) / CAST(n_exc AS DOUBLE))
                 * ((CAST(sy AS DOUBLE) / CAST(n_exc AS DOUBLE))
                    * (CAST(sy AS DOUBLE) / CAST(n_exc AS DOUBLE))
                    / ((CAST(sy2 AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                          / CAST(n_exc AS DOUBLE))
                       / CAST(n_exc - 1 AS DOUBLE))
                    + CAST(1 AS DOUBLE))
                 / CAST(100 AS DOUBLE), 6) AS beta_mom_dollars
    FROM mom
    """


@query("q673_gpd_moments", oracle=_GPD_SQL)
def q673_gpd_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold GPD fit by method of moments at u = 2x
    the mean order total: xi = (1 - m^2/s^2)/2 and
    beta = m (m^2/s^2 + 1)/2 from the exceedance mean/variance.
    Moments come from exact BIGINT / DECIMAL(38,0) sums; the xi/beta
    expressions are straight-line identical doubles rounded once."""
    _views(spark, sf_dir)
    return spark.sql(_GPD_SQL)


# ---------------------------------------------------------------------------
# q674 — monthly block maxima + Gumbel moment fit

_GUMBEL_SQL = f"""
    WITH {_cents_cte()},
    stamped AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) * 12
               + CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mkey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders
    ),
    blocks AS (
      SELECT mkey, MAX(c) AS mx
      FROM stamped
      GROUP BY mkey
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
             CAST(SUM(mx) AS BIGINT) AS sm,
             SUM(CAST(mx AS DECIMAL(19,0)) * CAST(mx AS DECIMAL(19,0)))
               AS sm2
      FROM blocks
    )
    SELECT n_blocks,
           CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)
             / CAST(100 AS DOUBLE) AS mean_block_max_dollars,
           ROUND(sqrt((CAST(sm2 AS DOUBLE)
                       - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
                         / CAST(n_blocks AS DOUBLE))
                      / CAST(n_blocks - 1 AS DOUBLE))
                 * CAST({SQRT6_OVER_PI} AS DOUBLE)
                 / CAST(100 AS DOUBLE), 6) AS gumbel_beta_dollars,
           ROUND((CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)
                  - CAST({EULER_GAMMA} AS DOUBLE)
                    * sqrt((CAST(sm2 AS DOUBLE)
                            - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
                              / CAST(n_blocks AS DOUBLE))
                           / CAST(n_blocks - 1 AS DOUBLE))
                    * CAST({SQRT6_OVER_PI} AS DOUBLE))
                 / CAST(100 AS DOUBLE), 6) AS gumbel_mu_dollars,
           ROUND((CAST(sm AS DOUBLE) / CAST(n_blocks AS DOUBLE)
                  - CAST({EULER_GAMMA} AS DOUBLE)
                    * sqrt((CAST(sm2 AS DOUBLE)
                            - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
                              / CAST(n_blocks AS DOUBLE))
                           / CAST(n_blocks - 1 AS DOUBLE))
                    * CAST({SQRT6_OVER_PI} AS DOUBLE)
                  + CAST({GUMBEL_Y_120} AS DOUBLE)
                    * sqrt((CAST(sm2 AS DOUBLE)
                            - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)
                              / CAST(n_blocks AS DOUBLE))
                           / CAST(n_blocks - 1 AS DOUBLE))
                    * CAST({SQRT6_OVER_PI} AS DOUBLE))
                 / CAST(100 AS DOUBLE), 6) AS return_level_10y_dollars
    FROM mom
    """


@query("q674_gumbel_block_maxima", oracle=_GUMBEL_SQL)
def q674_gumbel_block_maxima(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly block maxima with a Gumbel moment fit: beta =
    s * sqrt(6)/pi, mu = mean - gamma_Euler * beta, and the 10-year
    (120-block) return level mu + beta * y_120. The corpus reduces to
    ~80 monthly maxima in one aggregate; all constants are Python
    float literals inlined into both engines (§11); sqrt is
    IEEE-exact (§5)."""
    _views(spark, sf_dir)
    return spark.sql(_GUMBEL_SQL)


# ---------------------------------------------------------------------------
# q675 — Hill return levels (quantile extrapolation)

_RL_SQL = f"""
    WITH {_hill_cte()},
    grid AS (
      SELECT CAST(p.per_million AS BIGINT) AS per_million
      FROM (SELECT 1000 AS per_million UNION ALL SELECT 100
            UNION ALL SELECT 10) p
    )
    SELECT /*+ BROADCAST(h) */ g.per_million,
           -- two-term straight-line sum of 9 dp-rounded doubles: order
           -- is fixed, so no DECIMAL accumulator is needed — and none
           -- is WANTED: Spark's DECIMAL(38,9) + DECIMAL(38,9) overflows
           -- precision 38 and silently drops to scale 8, while DuckDB
           -- keeps scale 9 (2e-9 exponent drift, amplified by exp).
           ROUND(exp(ROUND(ln(CAST(h.ref AS DOUBLE)), 9)
                     + ROUND(h.hill_mean_log
                           * ln(CAST({K_TAIL} AS DOUBLE)
                                * CAST(1000000 AS DOUBLE)
                                / (CAST(h.n_total AS DOUBLE)
                                   * CAST(g.per_million AS DOUBLE))), 9))
                 / CAST(100 AS DOUBLE), 4) AS return_level_dollars
    FROM grid g CROSS JOIN hill h
    ORDER BY g.per_million DESC
    """


@query("q675_hill_return_levels", oracle=_RL_SQL)
def q675_hill_return_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill-based quantile extrapolation: the order total exceeded
    with probability p (1000/100/10 per million orders),
    RL(p) = x_ref * (k/(n p))^hill, computed in log space with 9 dp
    term rounding and one exp (§5/§14). The Weissman estimator — the
    standard 'loss per N orders' capacity table."""
    _views(spark, sf_dir)
    return spark.sql(_RL_SQL)
