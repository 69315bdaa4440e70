"""Off-policy evaluation batch 40 (q319-q320): estimate what a new
action policy WOULD earn from logged interaction data — the
counterfactual question behind every bandit/RLHF deployment gate.
Events are the interaction log: the logged action is the event type,
the reward is value/100. q319's IPS scores against the DECLARED
uniform logging policy (p_log = 1/k over the k logged actions) so it
genuinely differs from SNIPS; q320's DR correction keeps the
empirical propensities. Candidate policies are the five
deterministic single-action policies ("always A"), evaluated with
inverse-propensity scoring (IPS), its self-normalized variant
(SNIPS), the effective sample size that says how trustworthy each
estimate is (q319), and the doubly-robust estimator that adds a
per-segment reward model (q320).

For deterministic single-action policies these estimators have
closed forms (SNIPS reduces to the matched-rows mean), which is
exactly what keeps the whole family oracle-checkable while
exercising the real IPS/DR plumbing a bandit platform runs.

Determinism: rewards round to 6 dp and accumulate in DECIMAL;
propensities are exact count ratios; every estimator divides once
per output row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

_LOG_CTE = """
    logged AS (
      SELECT user_id, event_type AS action,
             CAST(ROUND(value / 100.0, 6) AS DECIMAL(38,6)) AS reward
      FROM events
    ),
    prop AS (
      SELECT action, CAST(COUNT(*) AS BIGINT) AS n_a,
             (SELECT COUNT(*) FROM logged) AS n,
             (SELECT COUNT(DISTINCT action) FROM logged) AS k
      FROM logged GROUP BY action
    )
"""


@query(
    "q319_offpolicy_eval",
    oracle=f"""
    WITH {_LOG_CTE}
    SELECT p.action AS policy_action,
           p.n_a AS n_match,
           ROUND(CAST(p.n_a AS DOUBLE) / p.n, 6) AS propensity,
           -- IPS under the DECLARED uniform logging policy (p_log =
           -- 1/k): sum(r / p_log) over matched rows, divided by N.
           -- Differs from SNIPS exactly when the empirical action
           -- frequency deviates from 1/k.
           ROUND(CAST(s.sr AS DOUBLE) * p.k / p.n, 6) AS ips_value,
           -- SNIPS: constant weights cancel -> matched-rows mean
           ROUND(CAST(s.sr AS DOUBLE) / p.n_a, 6) AS snips_value,
           -- ESS of constant weights = n_match
           p.n_a AS effective_sample_size
    FROM prop p
    JOIN (SELECT action, SUM(reward) AS sr FROM logged GROUP BY action) s
      ON s.action = p.action
    ORDER BY p.action
    """,
)
def q319_offpolicy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPS / SNIPS / ESS for the five single-action candidate
    policies against the logged bandit feedback: IPS reweights
    matched rewards by 1/propensity (unbiased, high variance), SNIPS
    normalizes by the weight mass (biased, stable — for a
    deterministic policy it reduces to the matched mean, the
    documented closed form), and the effective sample size is the
    match count.

    IPS is scored against the DECLARED logging policy — uniform over
    the k logged actions (p_log = 1/k) — not the empirical action
    frequency: with empirical propensities the two estimators
    coincide algebraically (sr/p-hat/n == sr/n_a) and the table would
    print one number twice. Under the declared policy ips_value =
    sr*k/n and snips_value = sr/n_a genuinely differ whenever the log
    is action-imbalanced; their gap is itself the diagnostic a bandit
    platform reads. The empirical propensity stays as its own column.
    The table an experimentation platform reads before promoting a
    policy without an A/B test. Scale: one action-keyed aggregate
    over the log (k keys, map-side combine does all the work) plus a
    1-row broadcast total — no eager driver-side counts; rewards
    accumulate 6-dp DECIMAL."""
    ev = load_table(spark, sf_dir, "events")
    logged = ev.select(
        F.col("event_type").alias("action"),
        F.round(F.col("value") / 100.0, 6).cast("decimal(38,6)").alias("reward"),
    )
    tot = logged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("action").cast("bigint").alias("k"),
    )
    agg = logged.groupBy("action").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_a"),
        F.sum("reward").alias("sr"),
    )
    joined = agg.crossJoin(F.broadcast(tot))
    return joined.select(
        F.col("action").alias("policy_action"),
        F.col("n_a").alias("n_match"),
        F.round(F.col("n_a").cast("double") / F.col("n"), 6).alias("propensity"),
        F.round(
            F.col("sr").cast("double") * F.col("k") / F.col("n"), 6
        ).alias("ips_value"),
        F.round(F.col("sr").cast("double") / F.col("n_a"), 6).alias(
            "snips_value"
        ),
        F.col("n_a").alias("effective_sample_size"),
    ).orderBy("policy_action")


@query(
    "q320_doubly_robust",
    oracle=f"""
    WITH {_LOG_CTE},
    ubin AS (
      SELECT user_id, CAST(FLOOR(COUNT(*) / 5) AS INT) AS bin
      FROM logged GROUP BY user_id
    ),
    ctx AS (
      SELECT l.user_id, l.action, l.reward, u.bin
      FROM logged l JOIN ubin u ON u.user_id = l.user_id
    ),
    mu AS (
      SELECT bin, action,
             CAST(SUM(reward) AS DOUBLE) / COUNT(*) AS mu_hat
      FROM ctx GROUP BY bin, action
    ),
    -- DR per candidate action A: mean over i of
    --   mu_hat(bin_i, A) + 1[a_i = A] * (r_i - mu_hat(bin_i, A)) / p(A)
    terms AS (
      SELECT m.action AS policy_action,
             CAST(ROUND(m.mu_hat
               + CASE WHEN c.action = m.action
                      THEN (CAST(c.reward AS DOUBLE) - m.mu_hat)
                           / (CAST(p.n_a AS DOUBLE) / p.n)
                      ELSE 0 END, 9) AS DECIMAL(38,9)) AS term
      FROM ctx c
      JOIN mu m ON m.bin = c.bin
      JOIN prop p ON p.action = m.action
    )
    SELECT policy_action,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND(CAST(SUM(term) AS DOUBLE) / COUNT(*), 6) AS dr_value
    FROM terms GROUP BY policy_action ORDER BY policy_action
    """,
)
def q320_doubly_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-robust off-policy values: augment IPS with a reward
    model mu_hat(segment, action) — per activity-bin x action mean
    reward — so the estimate stays consistent if EITHER the
    propensities or the model is right. Each logged row contributes
    mu_hat for the candidate action plus the propensity-weighted
    residual when the logged action matches. Scale: the reward-model
    table is tiny (bins x 5 actions) and broadcasts back onto the
    log; terms round 9-dp into DECIMAL so the big sum is exact; the
    candidate-action expansion multiplies the log by 5 via the
    broadcast join, never a shuffle."""
    ev = load_table(spark, sf_dir, "events")
    logged = ev.select(
        F.col("user_id"),
        F.col("event_type").alias("action"),
        F.round(F.col("value") / 100.0, 6).cast("decimal(38,6)").alias("reward"),
    )
    tot = logged.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    prop = logged.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_a")
    ).crossJoin(F.broadcast(tot))
    ubin = logged.groupBy("user_id").agg(
        F.floor(F.count(F.lit(1)) / 5).cast("int").alias("bin")
    )
    ctx = logged.join(ubin, "user_id")
    mu = ctx.groupBy("bin", F.col("action").alias("m_action")).agg(
        (F.sum("reward").cast("double") / F.count(F.lit(1))).alias("mu_hat")
    )
    terms = (
        ctx.join(F.broadcast(mu), "bin")
        .join(
            F.broadcast(
                prop.select(F.col("action").alias("m_action"), "n_a", "n")
            ),
            "m_action",
        )
        .select(
            F.col("m_action").alias("policy_action"),
            F.round(
                F.col("mu_hat")
                + F.when(
                    F.col("action") == F.col("m_action"),
                    (F.col("reward").cast("double") - F.col("mu_hat"))
                    / (F.col("n_a").cast("double") / F.col("n")),
                ).otherwise(0.0),
                9,
            )
            .cast("decimal(38,9)")
            .alias("term"),
        )
    )
    return (
        terms.groupBy("policy_action")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.round(
                F.sum("term").cast("double") / F.count(F.lit(1)), 6
            ).alias("dr_value"),
        )
        .orderBy("policy_action")
    )
