"""Propensity-score matching batch 169 (q917-q921) — the observational
causal-inference workflow (Rosenbaum-Rubin) over customers: treatment =
the BUILDING market segment, covariate = account balance, outcome =
lifetime order spend. Complements causal.py's IPW/raking with the
MATCHING estimator family: fit a propensity, coarsened-exact-match
(CEM) each treated unit to a pooled caliper-width cell of controls,
estimate the ATT from treated-minus-cell-mean differences, audit
covariate balance and common support.

The propensity here is a closed-form LINEAR probability model (OLS of
the treatment indicator on balance cents from exact integer moments) —
deliberately iteration-free so every score is an exact-arithmetic
double both engines agree on; swap in any model without touching the
matching plumbing.

- q917 the propensity model: slope/intercept/R^2 and score range;
- q918 coarsened-exact matching (CEM, with replacement): scores
  quantize to integer micro-units and coarsen to caliper-width cells;
  controls are POOLED per cell (count + mean balance/outcome/score),
  and each treated unit matches the nearest OCCUPIED cell among its
  own and the two adjacent ones — (cell_dist, gkey) ROW_NUMBER, at
  most 3 candidates per treated unit regardless of control density
  (no per-control |diff| or custkey tie-break exists by design);
- q919 ATT: mean treated-minus-matched-cell-pooled-mean outcome
  difference vs the naive treated-minus-control gap — what the
  cell-pooled CEM estimator corrects;
- q920 balance: standardized mean difference of the covariate before
  vs after matching (|SMD| < 0.1 is the conventional pass);
- q921 common support: the propensity histogram per arm with
  off-support treated counts.

100 TB shape: one customer scan + one orders aggregate; moments are
1-row broadcasts; the matching join is treated x (<=3 adjacent cell
aggregates), so candidate count per treated unit is
density-INDEPENDENT — the cell aggregation is what keeps the match
linear at any SF (per-individual 1-NN went 10-68x on 10x data in the
r7 rehearsal; coarsening is what CEM is for).

Determinism: all moments integer cents; propensity scores are
identical-arithmetic doubles quantized to exact micro-units BEFORE any
compare; cell choice tie-breaks on (cell_dist, gkey); SMD/ATT are
terminal ratios over exact DECIMAL cell means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

TREAT_SEG = "BUILDING"
CALIPER_U = 5000  # 0.005 in propensity micro-units


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("customer", "orders"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _idiv(d: str, a: str, b: str) -> str:
    return f"({a}) div ({b})" if d == "spark" else f"({a}) // ({b})"


def _base_cte() -> str:
    return f"""cust AS (
      SELECT c_custkey AS ck,
             CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal,
             CASE WHEN c_mktsegment = '{TREAT_SEG}' THEN 1 ELSE 0 END AS t
      FROM customer
    ),
    spend AS (
      SELECT o_custkey AS ck,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS y
      FROM orders GROUP BY o_custkey
    ),
    units AS (
      SELECT c.ck, c.bal, c.t,
             CAST(COALESCE(s.y, 0) AS BIGINT) AS y
      FROM cust c LEFT JOIN spend s ON s.ck = c.ck
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(bal) AS BIGINT) AS sx,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(bal * t) AS BIGINT) AS sxt,
             CAST(SUM(bal * bal) AS BIGINT) AS sxx
      FROM units
    ),
    fit AS (
      -- moments go through DOUBLE before any product: n*sxx overflows
      -- BIGINT from sf0.1 up (n ~ 1.5e4, sxx ~ 3.7e15); identical
      -- double arithmetic on identical integer inputs is engine-exact
      SELECT n, sx, st, sxt, sxx,
             (CAST(n AS DOUBLE) * sxt - CAST(sx AS DOUBLE) * st)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS b,
             (st - (CAST(n AS DOUBLE) * sxt - CAST(sx AS DOUBLE) * st)
                   / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                   * sx) / n AS a
      FROM mom
    ),
    scored AS (
      SELECT /*+ BROADCAST(f) */ u.ck, u.bal, u.t, u.y,
             CAST(FLOOR((f.a + f.b * u.bal) * 1000000 + 0.5) AS BIGINT)
               AS p_u
      FROM units u CROSS JOIN fit f
    )"""


# ---------------------------------------------------------------------------
# q917 — propensity model

_Q917_SQL = f"""
    WITH {_base_cte()}
    SELECT /*+ BROADCAST(f) */
           f.n,
           f.st AS n_treated,
           ROUND(f.b * 1000000, 6) AS slope_per_cent_x1e6,
           ROUND(f.a, 6) AS intercept,
           ROUND((CAST(f.n AS DOUBLE) * f.sxt - CAST(f.sx AS DOUBLE) * f.st)
                 * (CAST(f.n AS DOUBLE) * f.sxt - CAST(f.sx AS DOUBLE) * f.st)
                 / ((CAST(f.n AS DOUBLE) * f.sxx - CAST(f.sx AS DOUBLE) * f.sx)
                    * (CAST(f.n AS DOUBLE) * f.st
                       - CAST(f.st AS DOUBLE) * f.st)), 6) AS r2,
           CAST(MIN(s.p_u) AS BIGINT) AS min_p_u,
           CAST(MAX(s.p_u) AS BIGINT) AS max_p_u
    FROM scored s CROSS JOIN fit f
    GROUP BY f.n, f.st, f.b, f.a, f.sxt, f.sx, f.sxx
    """


@query("q917_propensity_model", oracle=_Q917_SQL)
def q917_propensity_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The linear-probability propensity fit: closed-form OLS of the
    treatment flag on balance cents — slope, intercept, R^2 straight
    from EXACT integer moment sums (n*sxt - sx*st over n*sxx - sx^2),
    plus the micro-unit score range. Iteration-free by design: every
    downstream matching query consumes exact quantized scores."""
    _views(spark, sf_dir)
    return spark.sql(_Q917_SQL)


# ---------------------------------------------------------------------------
# q918 — caliper 1-NN matching


def _match_cte(d: str) -> str:
    """Coarsened-exact matching join: scores coarsen to CALIPER-width
    cells; controls AGGREGATE per cell (count, pooled mean balance /
    outcome / score), and each treated unit matches the nearest
    occupied cell among its own and the two adjacent ones (own cell
    preferred, then lower cell id). Candidates per treated are AT MOST
    3 — independent of control density — so the join is linear at any
    SF (the r7 sf1 rehearsal showed both per-individual and
    exact-score-grid matching going 10-68x on 10x data; coarsening is
    what CEM is for). All controls in the matched cell pool their
    outcome (the standard CEM estimator)."""
    bucket = _idiv(d, "p_u", str(CALIPER_U))
    return f"""{_base_cte()},
    treated AS (
      SELECT ck, bal, y, p_u, CAST({bucket} AS BIGINT) AS bkt
      FROM scored WHERE t = 1
    ),
    cgrid AS (
      SELECT CAST({bucket} AS BIGINT) AS gkey,
             CAST(COUNT(*) AS BIGINT) AS n_at,
             CAST(ROUND(SUM(bal) * 1.0 / COUNT(*), 6) AS DECIMAL(13,6))
               AS c_bal,
             CAST(ROUND(SUM(y) * 1.0 / COUNT(*), 6) AS DECIMAL(19,6))
               AS c_y,
             CAST(ROUND(SUM(p_u) * 1.0 / COUNT(*), 6) AS DECIMAL(19,6))
               AS c_p
      FROM scored WHERE t = 0 GROUP BY CAST({bucket} AS BIGINT)
    ),
    offs(o) AS (VALUES (-1), (0), (1)),
    cand AS (
      SELECT tr.ck AS t_ck, tr.bal AS t_bal, tr.y AS t_y, tr.p_u AS t_p,
             g.gkey, g.n_at, g.c_bal, g.c_y, g.c_p,
             ABS(o.o) AS cell_dist
      FROM treated tr
      JOIN offs o ON TRUE
      JOIN cgrid g ON g.gkey = tr.bkt + o.o
    ),
    best AS (
      SELECT * FROM (
        SELECT cand.*,
               ROW_NUMBER() OVER (PARTITION BY t_ck
                                  ORDER BY cell_dist, gkey) AS rn
        FROM cand
      ) z WHERE rn = 1
    )"""


def _q918_sql(d: str) -> str:
    return f"""
    WITH {_match_cte(d)},
    tcount AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_treated FROM treated)
    SELECT /*+ BROADCAST(t) */
           t.n_treated,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           ROUND(CAST(COUNT(*) AS DOUBLE) / t.n_treated, 6) AS match_rate,
           -- gap vs the matched cell's pooled mean score (DECIMAL mean
           -- of exact integers -> exact)
           ROUND(CAST(SUM(ABS(CAST(t_p AS DECIMAL(19,6)) - c_p)) AS DOUBLE)
                 / COUNT(*), 4) AS mean_score_gap_u,
           CAST(MAX(cell_dist) AS BIGINT) AS max_cell_dist,
           CAST(COUNT(DISTINCT gkey) AS BIGINT) AS n_distinct_match_cells,
           CAST(SUM(n_at) AS BIGINT) AS matched_control_pool
    FROM best CROSS JOIN tcount t
    GROUP BY t.n_treated
    """


@query("q918_caliper_match", oracle=_q918_sql("duckdb"))
def q918_caliper_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsened-exact matching (CEM) with replacement: scores coarsen
    to caliper-width cells, controls POOL per cell, and each treated
    unit matches the nearest occupied cell among its own and the two
    adjacent ones by (cell_dist, gkey) — at most 3 candidates per
    treated unit, independent of control density. Reports match rate,
    treated-vs-cell-mean score gaps and matched-pool size."""
    _views(spark, sf_dir)
    return spark.sql(_q918_sql("spark"))


# ---------------------------------------------------------------------------
# q919 — ATT


def _q919_sql(d: str) -> str:
    return f"""
    WITH {_match_cte(d)},
    naive AS (
      SELECT ROUND(CAST(SUM(CASE WHEN t = 1 THEN y ELSE 0 END) AS DOUBLE)
                   / NULLIF(SUM(t), 0)
                 - CAST(SUM(CASE WHEN t = 0 THEN y ELSE 0 END) AS DOUBLE)
                   / NULLIF(SUM(1 - t), 0), 4) AS naive_gap_cents
      FROM scored
    )
    SELECT /*+ BROADCAST(nv) */
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           -- t_y BIGINT minus the DECIMAL pooled-control mean: exact
           -- DECIMAL accumulation, one terminal division
           ROUND(CAST(SUM(CAST(t_y AS DECIMAL(19,6)) - c_y) AS DOUBLE)
                 / COUNT(*), 4) AS att_cents,
           nv.naive_gap_cents,
           ROUND(CAST(SUM(CAST(t_y AS DECIMAL(19,6)) - c_y) AS DOUBLE)
                 / COUNT(*) - nv.naive_gap_cents, 4)
             AS selection_bias_removed
    FROM best CROSS JOIN naive nv
    GROUP BY nv.naive_gap_cents
    """


@query("q919_att_matched", oracle=_q919_sql("duckdb"))
def q919_att_matched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CEM ATT — mean treated spend minus the MATCHED CELL'S POOLED
    control mean (exact DECIMAL cell means, differences summed before
    one terminal division) — beside the naive group gap; their
    difference is the selection bias the cell-pooled matching
    removed."""
    _views(spark, sf_dir)
    return spark.sql(_q919_sql("spark"))


# ---------------------------------------------------------------------------
# q920 — covariate balance


def _q920_sql(d: str) -> str:
    return f"""
    WITH {_match_cte(d)},
    pre AS (
      SELECT CAST(SUM(t) AS BIGINT) AS nt,
             CAST(SUM(1 - t) AS BIGINT) AS nc,
             CAST(SUM(CASE WHEN t = 1 THEN bal ELSE 0 END) AS BIGINT) AS sxt,
             CAST(SUM(CASE WHEN t = 0 THEN bal ELSE 0 END) AS BIGINT) AS sxc,
             CAST(SUM(CASE WHEN t = 1 THEN bal * bal ELSE 0 END) AS BIGINT)
               AS sxxt,
             CAST(SUM(CASE WHEN t = 0 THEN bal * bal ELSE 0 END) AS BIGINT)
               AS sxxc
      FROM scored
    ),
    post AS (
      -- c_bal is the DECIMAL(13,6) pooled mean: sums and squared sums
      -- stay exact DECIMAL (products DECIMAL(26,12) — int128, the
      -- q245 widening rule), cast DOUBLE only in the terminal SMD
      SELECT CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(t_bal) AS BIGINT) AS sxt,
             CAST(CAST(SUM(c_bal) AS DOUBLE) AS DOUBLE) AS sxc,
             CAST(SUM(t_bal * t_bal) AS BIGINT) AS sxxt,
             CAST(CAST(SUM(CAST(c_bal AS DECIMAL(24,6))
                           * CAST(c_bal AS DECIMAL(24,6)))
                  AS DOUBLE) AS DOUBLE) AS sxxc
      FROM best
    )
    SELECT 'a_pre' AS stage,
           ROUND((CAST(sxt AS DOUBLE) / nt - CAST(sxc AS DOUBLE) / nc)
                 / SQRT(((CAST(sxxt AS DOUBLE) / nt
                          - (CAST(sxt AS DOUBLE) / nt)
                            * (CAST(sxt AS DOUBLE) / nt))
                         + (CAST(sxxc AS DOUBLE) / nc
                            - (CAST(sxc AS DOUBLE) / nc)
                              * (CAST(sxc AS DOUBLE) / nc))) / 2), 6)
             AS smd_balance
    FROM pre
    UNION ALL
    SELECT 'b_post' AS stage,
           ROUND((CAST(sxt AS DOUBLE) / np - CAST(sxc AS DOUBLE) / np)
                 / SQRT(((CAST(sxxt AS DOUBLE) / np
                          - (CAST(sxt AS DOUBLE) / np)
                            * (CAST(sxt AS DOUBLE) / np))
                         + (CAST(sxxc AS DOUBLE) / np
                            - (CAST(sxc AS DOUBLE) / np)
                              * (CAST(sxc AS DOUBLE) / np))) / 2), 6)
             AS smd_balance
    FROM post
    ORDER BY stage
    """


@query("q920_covariate_balance", oracle=_q920_sql("duckdb"))
def q920_covariate_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The balance table every matching study must publish: the
    standardized mean difference of the covariate before matching
    (all treated vs all controls) and after (matched pairs) — both
    from exact integer moments; |SMD| shrinking toward 0 is the
    evidence the matching worked (asserted in tests)."""
    _views(spark, sf_dir)
    return spark.sql(_q920_sql("spark"))


# ---------------------------------------------------------------------------
# q921 — common support


def _q921_sql(d: str) -> str:
    # decile bins over the observed score range, exact integer math
    bin_expr = _idiv(d, "(p_u - mn) * 10", "(mx - mn) + 1")
    return f"""
    WITH {_base_cte()},
    rng AS (
      SELECT CAST(MIN(p_u) AS BIGINT) AS mn, CAST(MAX(p_u) AS BIGINT) AS mx
      FROM scored
    ),
    binned AS (
      SELECT /*+ BROADCAST(r) */ s.t,
             CAST({bin_expr} AS BIGINT) AS bin
      FROM scored s CROSS JOIN rng r
    ),
    hist AS (
      SELECT bin,
             CAST(SUM(t) AS BIGINT) AS n_treated,
             CAST(SUM(1 - t) AS BIGINT) AS n_control
      FROM binned GROUP BY bin
    )
    SELECT bin, n_treated, n_control,
           CAST(CASE WHEN n_treated > 0 AND n_control = 0
                THEN 1 ELSE 0 END AS INT) AS treated_off_support
    FROM hist
    ORDER BY bin
    """


@query("q921_common_support", oracle=_q921_sql("duckdb"))
def q921_common_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-support audit: the propensity histogram per arm over ten
    exact integer score-range bins, flagging bins where treated units
    have NO control counterpart (the units no matching estimator can
    speak for). One scored pass, a 1-row range broadcast, a 10-row
    rollup."""
    _views(spark, sf_dir)
    return spark.sql(_q921_sql("spark"))
