"""Empirical-Bayes shrinkage batch 178 (q957-q961) — Stein's paradox
made operational (James-Stein 1961; Efron & Morris 1975): per-user
mean event values shrunk toward the grand mean by the normal-normal
method-of-moments empirical Bayes rule, VALIDATED on a deterministic
split-half — the estimator family every per-entity dashboard should
use instead of raw small-sample means.

Setup: train = even event_ids, test = odd event_ids (deterministic,
disjoint). Per-user train mean x_u with n_u observations; grand mean
m; within variance sigma^2 (pooled); between variance tau^2 by method
of moments; shrinkage B_u = tau^2 / (tau^2 + sigma^2 / n_u);
EB estimate = m + B_u (x_u - m).

- q957 the shrinkage table: grand mean, pooled sigma^2, tau^2, the
  B_u range, and how far the most-shrunk user moves;
- q958 Stein's paradox, measured: validation MSE of the raw per-user
  means vs the EB estimates on the held-out half — EB should win
  (test-asserted at the corpus level);
- q959 the pooling spectrum: no pooling (raw), complete pooling
  (grand mean for everyone), partial pooling (EB) — all three
  validation MSEs side by side;
- q960 rank movement: how many users change decile between the raw
  and shrunk rankings (the small-sample users EB demotes);
- q961 beta-binomial rates: purchase-rate shrinkage via
  method-of-moments alpha/beta — the bounded-support analog for
  rates, with the most-moved users censused.

100 TB shape: everything derives from ONE per-user moment aggregate
(n, sum, sum of squares in exact integer cents) plus 1-row broadcast
corpus moments; validation joins are user-keyed; deciles come from
bounded rank joins on the 10-row quantile grid... (computed with
NTILE per-user table — bounded by users only in the rank join's
aggregated form).

Determinism: all moments exact integer cents; per-user squared errors
round at 6 dp into DECIMAL sums; estimates are identical-arithmetic
doubles from identical integer inputs; splits are event_id parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _eb_cte() -> str:
    """Train/test user moments + corpus EB hyperparameters + estimates."""
    return """cents AS (
      SELECT user_id, event_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c
      FROM events
    ),
    train AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(c * c) AS BIGINT) AS s2
      FROM cents WHERE event_id % 2 = 0 GROUP BY user_id
    ),
    test AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS tn,
             CAST(SUM(c) AS BIGINT) AS ts1
      FROM cents WHERE event_id % 2 = 1 GROUP BY user_id
    ),
    corpus AS (
      -- grand mean over train events; pooled within-user variance;
      -- between-user variance of train means by method of moments
      SELECT CAST(SUM(s1) AS BIGINT) AS tot_s1,
             CAST(SUM(n) AS BIGINT) AS tot_n,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) AS ssw,
             SUM(CAST(n AS DOUBLE)) AS sn,
             SUM(CAST(s1 AS DOUBLE) / n) AS summ,
             SUM((CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
               AS summ2,
             SUM(1.0 / n) AS sinv
      FROM train
    ),
    hyper AS (
      SELECT CAST(tot_s1 AS DOUBLE) / tot_n AS m,
             ssw / (tot_n - k) AS sigma2,
             GREATEST(
               (summ2 - summ * summ / k) / (k - 1)
               - (ssw / (tot_n - k)) * sinv / k,
               0.0) AS tau2,
             k
      FROM corpus
    ),
    est AS (
      SELECT /*+ BROADCAST(h) */ t.user_id, t.n,
             CAST(t.s1 AS DOUBLE) / t.n AS raw_mean,
             h.m,
             h.tau2 / (h.tau2 + h.sigma2 / t.n) AS b,
             h.m + h.tau2 / (h.tau2 + h.sigma2 / t.n)
                   * (CAST(t.s1 AS DOUBLE) / t.n - h.m) AS eb_mean
      FROM train t CROSS JOIN hyper h
    )"""


# ---------------------------------------------------------------------------
# q957 — the shrinkage table

_Q957_SQL = f"""
    WITH {_eb_cte()}
    SELECT CAST(MAX(CAST(k0.k AS BIGINT)) AS BIGINT) AS n_users,
           ROUND(MAX(k0.m), 4) AS grand_mean_cents,
           ROUND(MAX(k0.sigma2), 2) AS sigma2_within,
           ROUND(MAX(k0.tau2), 2) AS tau2_between,
           ROUND(MIN(e.b), 6) AS min_shrinkage_b,
           ROUND(MAX(e.b), 6) AS max_shrinkage_b,
           ROUND(MAX(ABS(e.raw_mean - e.eb_mean)), 4) AS max_move_cents
    FROM est e CROSS JOIN hyper k0
    """


@query("q957_eb_shrinkage_table", oracle=_Q957_SQL)
def q957_eb_shrinkage_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The empirical-Bayes machinery in one row: grand mean, pooled
    within-user variance, method-of-moments between variance, the
    shrinkage-weight range (B near 0 = pool hard, near 1 = trust the
    user), and the largest correction applied. One user-moment
    aggregate + a 1-row hyperparameter broadcast."""
    _views(spark, sf_dir)
    return spark.sql(_Q957_SQL)


# ---------------------------------------------------------------------------
# q958 — Stein's paradox, measured

_Q958_SQL = f"""
    WITH {_eb_cte()},
    joined AS (
      SELECT e.user_id,
             CAST(ROUND((e.raw_mean - CAST(t.ts1 AS DOUBLE) / t.tn)
                        * (e.raw_mean - CAST(t.ts1 AS DOUBLE) / t.tn), 6)
               AS DECIMAL(28,6)) AS se_raw,
             CAST(ROUND((e.eb_mean - CAST(t.ts1 AS DOUBLE) / t.tn)
                        * (e.eb_mean - CAST(t.ts1 AS DOUBLE) / t.tn), 6)
               AS DECIMAL(28,6)) AS se_eb
      FROM est e JOIN test t ON t.user_id = e.user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users_validated,
           ROUND(CAST(SUM(se_raw) AS DOUBLE) / COUNT(*), 4) AS mse_raw,
           ROUND(CAST(SUM(se_eb) AS DOUBLE) / COUNT(*), 4) AS mse_eb,
           ROUND(1 - CAST(SUM(se_eb) AS DOUBLE) / CAST(SUM(se_raw) AS DOUBLE),
                 6) AS mse_reduction,
           CAST(SUM(CASE WHEN se_eb < se_raw THEN 1 ELSE 0 END) AS BIGINT)
             AS n_users_improved
    FROM joined
    """


@query("q958_stein_paradox", oracle=_Q958_SQL)
def q958_stein_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stein's paradox on real splits: per-user squared error of the
    raw train mean vs the EB-shrunk mean against the HELD-OUT half's
    mean. The aggregate MSE reduction should be positive (test-
    asserted) even though individual users can get worse — exactly
    Efron-Morris. Squared errors round 6 dp into DECIMAL sums."""
    _views(spark, sf_dir)
    return spark.sql(_Q958_SQL)


# ---------------------------------------------------------------------------
# q959 — the pooling spectrum

_Q959_SQL = f"""
    WITH {_eb_cte()},
    joined AS (
      SELECT e.user_id, e.raw_mean, e.eb_mean, e.m,
             CAST(t.ts1 AS DOUBLE) / t.tn AS truth
      FROM est e JOIN test t ON t.user_id = e.user_id
    ),
    scored AS (
      SELECT
        CAST(ROUND((raw_mean - truth) * (raw_mean - truth), 6)
          AS DECIMAL(28,6)) AS se_none,
        CAST(ROUND((m - truth) * (m - truth), 6)
          AS DECIMAL(28,6)) AS se_full,
        CAST(ROUND((eb_mean - truth) * (eb_mean - truth), 6)
          AS DECIMAL(28,6)) AS se_partial
      FROM joined
    )
    SELECT ROUND(CAST(SUM(se_none) AS DOUBLE) / COUNT(*), 4)
             AS mse_no_pooling,
           ROUND(CAST(SUM(se_full) AS DOUBLE) / COUNT(*), 4)
             AS mse_complete_pooling,
           ROUND(CAST(SUM(se_partial) AS DOUBLE) / COUNT(*), 4)
             AS mse_partial_pooling
    FROM scored
    """


@query("q959_pooling_spectrum", oracle=_Q959_SQL)
def q959_pooling_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three estimators every hierarchical-model lecture draws: no
    pooling (raw user means), complete pooling (grand mean for all),
    partial pooling (EB) — validation MSEs side by side. Partial
    pooling should not lose to BOTH extremes (test-asserted)."""
    _views(spark, sf_dir)
    return spark.sql(_Q959_SQL)


# ---------------------------------------------------------------------------
# q960 — rank movement

_Q960_SQL = f"""
    WITH {_eb_cte()},
    ranked AS (
      SELECT user_id, n,
             NTILE(10) OVER (ORDER BY raw_mean, user_id) AS dec_raw,
             NTILE(10) OVER (ORDER BY eb_mean, user_id) AS dec_eb
      FROM est
    )
    SELECT CAST(ABS(dec_raw - dec_eb) AS BIGINT) AS decile_moves,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 2)
             AS mean_train_n
    FROM ranked
    GROUP BY ABS(dec_raw - dec_eb)
    ORDER BY decile_moves
    """


@query("q960_rank_movement", oracle=_Q960_SQL)
def q960_rank_movement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who the shrinkage demotes: users by how many deciles their rank
    moves between raw and EB means, with the mean sample size per
    movement band — movers should be the SMALL-n users (their mean
    sample size should be below the stay-put band's, the signature of
    shrinkage doing its job). NTILE runs over the per-user table (one
    row per user — the aggregated-spine exception to the global-window
    rule, bounded by user count and allowlisted)."""
    _views(spark, sf_dir)
    return spark.sql(_Q960_SQL)


# ---------------------------------------------------------------------------
# q961 — beta-binomial rate shrinkage

_Q961_SQL = """
    WITH flags AS (
      SELECT user_id, event_id,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    peruser AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(hit) AS BIGINT) AS x
      FROM flags GROUP BY user_id
    ),
    corpus AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             SUM(CAST(x AS DOUBLE) / n) AS sp,
             SUM((CAST(x AS DOUBLE) / n) * (CAST(x AS DOUBLE) / n)) AS sp2,
             SUM(1.0 / n) AS sinv
      FROM peruser
    ),
    hyper AS (
      -- method of moments on the rate distribution: mean mu, var v ->
      -- concentration c = mu(1-mu)/v - 1 (floored at 1 for stability)
      SELECT sp / k AS mu,
             GREATEST((sp2 - sp * sp / k) / (k - 1), 1e-12) AS v,
             GREATEST((sp / k) * (1 - sp / k)
                      / GREATEST((sp2 - sp * sp / k) / (k - 1), 1e-12)
                      - 1, 1.0) AS conc
      FROM corpus
    ),
    post AS (
      SELECT /*+ BROADCAST(h) */ p.user_id, p.n, p.x,
             CAST(p.x AS DOUBLE) / p.n AS raw_rate,
             (p.x + h.conc * h.mu) / (p.n + h.conc) AS eb_rate
      FROM peruser p CROSS JOIN hyper h
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(MAX(ABS(raw_rate - eb_rate)), 6) AS max_rate_move,
           ROUND(CAST(SUM(CASE WHEN ABS(raw_rate - eb_rate) > 0.02
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS share_moved_over_2pts,
           ROUND(MIN(eb_rate), 6) AS min_eb_rate,
           ROUND(MAX(eb_rate), 6) AS max_eb_rate
    FROM post
    """


@query("q961_beta_binomial_rates", oracle=_Q961_SQL)
def q961_beta_binomial_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate shrinkage for bounded support: per-user purchase rates
    pulled toward the corpus rate by a method-of-moments beta-binomial
    prior (posterior mean (x + c*mu)/(n + c)) — the EB rule for CTRs,
    conversion and defect rates where the normal model of q957 is
    wrong at the edges. EB rates stay inside the raw range
    (test-asserted)."""
    _views(spark, sf_dir)
    return spark.sql(_Q961_SQL)
