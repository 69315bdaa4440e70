"""Causal-inference & survey-weighting batch 36 (q307-q309):
coarsened exact matching (CEM) for an observational treatment
effect, post-stratification weights for sample-to-population
reweighting, and iterative proportional fitting (raking) to two
marginal targets. Together with q156 (diff-in-diff) and q249
(CUPED) these complete the observational-causal toolkit an
experimentation platform runs outside randomized tests.

Determinism: strata and coarsening are integer expressions; every
mean is an exact-count division done once per output cell; IPF
unrolls TWO full raking cycles with 12-dp rounding between scaling
steps so double order can't drift across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

# ---------------------------------------------------------------------------
# q307 — coarsened exact matching: ATT of 'signup' on purchase spend

_USERS_CTE = """
    users AS (
      SELECT user_id,
             CAST(FLOOR(COUNT(*) / 5) AS INT) AS activity_bin,
             CAST(FLOOR(DATE_DIFF('day', DATE '1970-01-01',
                            CAST(MIN(ts) AS DATE)) / 7) AS INT) AS week_bucket,
             CASE WHEN ARG_MIN(event_type, event_id) = 'signup'
                  THEN 1 ELSE 0 END AS treated,
             SUM(CASE WHEN event_type = 'purchase'
                 THEN CAST(ROUND(value, 6) AS DECIMAL(38,6))
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS spend
      FROM events GROUP BY user_id
    )
"""


@query(
    "q307_cem_att",
    oracle=f"""
    WITH {_USERS_CTE},
    strata AS (
      SELECT activity_bin, week_bucket,
             CAST(SUM(treated) AS BIGINT) AS n_treated,
             CAST(COUNT(*) - SUM(treated) AS BIGINT) AS n_control,
             SUM(CASE WHEN treated = 1 THEN spend
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS spend_t,
             SUM(CASE WHEN treated = 0 THEN spend
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS spend_c
      FROM users GROUP BY activity_bin, week_bucket
    ),
    matched AS (
      SELECT * FROM strata WHERE n_treated > 0 AND n_control > 0
    ),
    tot AS (SELECT SUM(n_treated) AS nt FROM matched)
    SELECT m.activity_bin, m.week_bucket, m.n_treated, m.n_control,
           ROUND(CAST(m.spend_t AS DOUBLE) / m.n_treated, 6) AS y_treated,
           ROUND(CAST(m.spend_c AS DOUBLE) / m.n_control, 6) AS y_control,
           ROUND((CAST(m.spend_t AS DOUBLE) / m.n_treated
                  - CAST(m.spend_c AS DOUBLE) / m.n_control)
                 * m.n_treated / t.nt, 6) AS att_term
    FROM matched m, tot t
    ORDER BY m.activity_bin, m.week_bucket
    """,
)
def q307_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coarsened exact matching: do signup-first users (first
    recorded event is a signup — the acquisition-channel proxy)
    spend more on purchases? Users are coarsened on (width-5 activity-count
    bin, first-seen week);
    strata containing both treated and control users survive, and
    the ATT is the treated-weighted sum of within-stratum mean
    differences (sum of att_term = ATT, the q201-style term
    decomposition). CEM is the causal design that needs no fitted
    propensity model — exactly the kind of closed-form method that
    stays oracle-checkable. Scale: one user-level aggregate (shuffle
    on user_id), one stratum aggregate (a few hundred keys), then
    tiny-table algebra."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.floor(F.count(F.lit(1)) / 5).cast("int").alias("activity_bin"),
        F.floor(
            F.datediff(F.min("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            / 7
        )
        .cast("int")
        .alias("week_bucket"),
        F.when(F.min_by("event_type", "event_id") == "signup", 1)
        .otherwise(0)
        .alias("treated"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round("value", 6).cast("decimal(38,6)"),
            ).otherwise(F.lit(0).cast("decimal(38,6)"))
        ).alias("spend"),
    )
    zero = F.lit(0).cast("decimal(38,6)")
    strata = users.groupBy("activity_bin", "week_bucket").agg(
        F.sum("treated").cast("bigint").alias("n_treated"),
        (F.count(F.lit(1)) - F.sum("treated")).cast("bigint").alias("n_control"),
        F.sum(F.when(F.col("treated") == 1, F.col("spend")).otherwise(zero)).alias(
            "spend_t"
        ),
        F.sum(F.when(F.col("treated") == 0, F.col("spend")).otherwise(zero)).alias(
            "spend_c"
        ),
    )
    matched = strata.filter((F.col("n_treated") > 0) & (F.col("n_control") > 0))
    tot = matched.agg(F.sum("n_treated").alias("nt"))
    y_t = F.col("spend_t").cast("double") / F.col("n_treated")
    y_c = F.col("spend_c").cast("double") / F.col("n_control")
    return (
        matched.join(F.broadcast(tot))
        .select(
            "activity_bin",
            "week_bucket",
            "n_treated",
            "n_control",
            F.round(y_t, 6).alias("y_treated"),
            F.round(y_c, 6).alias("y_control"),
            F.round((y_t - y_c) * F.col("n_treated") / F.col("nt"), 6).alias(
                "att_term"
            ),
        )
        .orderBy("activity_bin", "week_bucket")
    )


# ---------------------------------------------------------------------------
# q308 — post-stratification weights

_SAMPLE_CTE = """
    pop AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(COUNT(*) AS BIGINT) AS pop_n,
             SUM(CAST(ROUND(c_acctbal, 6) AS DECIMAL(38,6))) AS pop_bal
      FROM customer GROUP BY 1, 2
    ),
    buyers AS (SELECT DISTINCT o_custkey FROM orders),
    samp AS (
      SELECT c_nationkey AS nation, c_mktsegment AS segment,
             CAST(COUNT(*) AS BIGINT) AS samp_n,
             SUM(CAST(ROUND(c_acctbal, 6) AS DECIMAL(38,6))) AS samp_bal
      FROM customer JOIN buyers ON o_custkey = c_custkey
      GROUP BY 1, 2
    )
"""


@query(
    "q308_poststrat_weights",
    oracle=f"""
    WITH {_SAMPLE_CTE},
    tots AS (
      SELECT (SELECT SUM(pop_n) FROM pop) AS pop_t,
             (SELECT SUM(samp_n) FROM samp) AS samp_t
    )
    SELECT p.nation, p.segment, p.pop_n, s.samp_n,
           ROUND((CAST(p.pop_n AS DOUBLE) / t.pop_t)
                 / (CAST(s.samp_n AS DOUBLE) / t.samp_t), 6) AS weight,
           ROUND(CAST(s.samp_bal AS DOUBLE) / s.samp_n, 6) AS samp_mean_bal,
           ROUND(CAST(p.pop_bal AS DOUBLE) / p.pop_n, 6) AS pop_mean_bal
    FROM pop p JOIN samp s ON s.nation = p.nation AND s.segment = p.segment,
         tots t
    ORDER BY p.nation, p.segment
    """,
)
def q308_poststrat_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratification: customers who placed orders are the
    'respondents'; reweight them so every (nation, segment) stratum
    recovers its population share — weight = pop share / sample
    share, the design-weight every survey-style estimator multiplies
    in before averaging. Reports the stratum weight beside sample
    and population mean balances so the selection bias is visible
    per cell. Scale: two grouped aggregates (customer scan + a semi
    join against distinct buyers) meeting on ~125 stratum keys."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    bal6 = F.round("c_acctbal", 6).cast("decimal(38,6)")
    pop = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("pop_n"),
        F.sum(bal6).alias("pop_bal"),
    )
    buyers = orders.select(F.col("o_custkey")).distinct()
    samp = (
        cust.join(buyers, cust.c_custkey == buyers.o_custkey, "left_semi")
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("samp_n"),
            F.sum(bal6).alias("samp_bal"),
        )
    )
    tots = pop.agg(F.sum("pop_n").alias("pop_t")).join(
        samp.agg(F.sum("samp_n").alias("samp_t"))
    )
    return (
        pop.join(samp, ["nation", "segment"])
        .join(F.broadcast(tots))
        .select(
            "nation",
            "segment",
            "pop_n",
            "samp_n",
            F.round(
                (F.col("pop_n").cast("double") / F.col("pop_t"))
                / (F.col("samp_n").cast("double") / F.col("samp_t")),
                6,
            ).alias("weight"),
            F.round(F.col("samp_bal").cast("double") / F.col("samp_n"), 6).alias(
                "samp_mean_bal"
            ),
            F.round(F.col("pop_bal").cast("double") / F.col("pop_n"), 6).alias(
                "pop_mean_bal"
            ),
        )
        .orderBy("nation", "segment")
    )


# ---------------------------------------------------------------------------
# q309 — IPF raking to two marginals

_IPF_ROUND = 12


def _ipf_oracle() -> str:
    """Two unrolled raking cycles: scale to nation marginal, then to
    segment marginal, twice; weights rounded 12 dp between steps."""
    steps = []
    prev = "w0"
    for it, (dim, tgt) in enumerate(
        [("nation", "tn"), ("segment", "ts"),
         ("nation", "tn"), ("segment", "ts")],
        start=1,
    ):
        steps.append(
            f"""
    cur{it} AS (
      SELECT c.{dim} AS k, SUM(c.n * p.w) AS cur
      FROM cells c JOIN {prev} p
        ON p.nation = c.nation AND p.segment = c.segment
      GROUP BY c.{dim}
    ),
    w{it} AS (
      SELECT c.nation, c.segment,
             ROUND(p.w * t.target / cur{it}.cur, {_IPF_ROUND}) AS w
      FROM cells c
      JOIN {prev} p ON p.nation = c.nation AND p.segment = c.segment
      JOIN cur{it} ON cur{it}.k = c.{dim}
      JOIN {tgt} t ON t.k = c.{dim}
    )"""
        )
        prev = f"w{it}"
    return f"""
    WITH {_SAMPLE_CTE},
    cells AS (SELECT nation, segment, samp_n AS n FROM samp),
    tn AS (
      SELECT nation AS k, CAST(SUM(pop_n) AS DOUBLE) AS target
      FROM pop GROUP BY nation
    ),
    ts AS (
      SELECT segment AS k, CAST(SUM(pop_n) AS DOUBLE) AS target
      FROM pop GROUP BY segment
    ),
    w0 AS (
      SELECT nation, segment, CAST(1.0 AS DOUBLE) AS w FROM cells
    ),
    {",".join(steps)}
    SELECT c.nation, c.segment, CAST(c.n AS BIGINT) AS samp_n,
           ROUND(w4.w, 6) AS rake_weight,
           ROUND(c.n * w4.w, 4) AS raked_n
    FROM cells c JOIN w4 ON w4.nation = c.nation AND w4.segment = c.segment
    ORDER BY c.nation, c.segment
    """


@query("q309_ipf_raking", oracle=_ipf_oracle())
def q309_ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative proportional fitting (raking): adjust the sample
    (nation, segment) cross-tab so BOTH one-way marginals match the
    full-customer population — two unrolled raking cycles (nation
    scale, segment scale, repeated), the survey-weighting workhorse
    when only marginal targets are known. Fixed depth keeps it
    closed-form on both engines; the final pass scales segments, so
    segment marginals land exactly and nation marginals within
    raking tolerance (asserted in tests). Scale: the cross-tab and
    targets are tiny aggregates of the customer table; every raking
    join runs on the ~125-cell table."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    buyers = orders.select("o_custkey").distinct()
    # Checkpoint both corpus aggregates: the raking loop's lineage
    # references `cells` once per round plus twice inside each w level,
    # so Catalyst re-expanded the customer x orders semi-join ~16x
    # (496 Exchanges in the before plan; P3 pattern, guide §2.4). The
    # 125-cell cross-tab and marginal targets are bounded at any scale.
    pop = (
        cust.groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("pop_n"))
        .localCheckpoint(eager=True)
    )
    cells = (
        cust.join(buyers, cust.c_custkey == buyers.o_custkey, "left_semi")
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tn = pop.groupBy("nation").agg(
        F.sum("pop_n").cast("double").alias("t_nation")
    )
    ts = pop.groupBy("segment").agg(
        F.sum("pop_n").cast("double").alias("t_segment")
    )
    w = cells.select("nation", "segment", F.lit(1.0).cast("double").alias("w"))
    for dim, tgt, tcol in [
        ("nation", tn, "t_nation"),
        ("segment", ts, "t_segment"),
        ("nation", tn, "t_nation"),
        ("segment", ts, "t_segment"),
    ]:
        joined = cells.join(w, ["nation", "segment"])
        cur = joined.groupBy(dim).agg(
            F.sum(F.col("n") * F.col("w")).alias("cur")
        )
        w = (
            joined.join(F.broadcast(cur), dim)
            .join(F.broadcast(tgt), dim)
            .select(
                "nation",
                "segment",
                F.round(
                    F.col("w") * F.col(tcol) / F.col("cur"), _IPF_ROUND
                ).alias("w"),
            )
        )
    return (
        cells.join(w, ["nation", "segment"])
        .select(
            "nation",
            "segment",
            F.col("n").cast("bigint").alias("samp_n"),
            F.round("w", 6).alias("rake_weight"),
            F.round(F.col("n") * F.col("w"), 4).alias("raked_n"),
        )
        .orderBy("nation", "segment")
    )
