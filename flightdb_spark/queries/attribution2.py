"""Attribution & uplift batch 60 (q373-q374): exact Shapley-value
channel attribution (the game-theoretic split of conversion credit
across touchpoint channels — computable in closed form here because
3 channels mean only 8 coalitions) and the Qini/uplift decile table
(does the treatment lift conversion, and for WHOM — the targeting
view of the q330-q333 experiment readouts).

Determinism: coalition values are exact count ratios; Shapley
weights for 3 players are literal rationals; uplift deciles reuse
the q303 broadcast-cutpoint binning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

# ---------------------------------------------------------------------------
# q373 — exact Shapley channel attribution

_CH = ["click", "view", "signup"]


@query(
    "q373_shapley_attribution",
    oracle="""
    WITH users AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2,
             MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c3,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    cells AS (
      SELECT c1, c2, c3,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS DOUBLE) / COUNT(*) AS v
      FROM users GROUP BY c1, c2, c3
    ),
    -- coalition value v(S): conversion rate among users whose channel
    -- PRESENCE PATTERN is exactly S (the fully-saturated cell model)
    v AS (
      SELECT
        MAX(CASE WHEN c1=0 AND c2=0 AND c3=0 THEN v ELSE 0 END) AS v000,
        MAX(CASE WHEN c1=1 AND c2=0 AND c3=0 THEN v ELSE 0 END) AS v100,
        MAX(CASE WHEN c1=0 AND c2=1 AND c3=0 THEN v ELSE 0 END) AS v010,
        MAX(CASE WHEN c1=0 AND c2=0 AND c3=1 THEN v ELSE 0 END) AS v001,
        MAX(CASE WHEN c1=1 AND c2=1 AND c3=0 THEN v ELSE 0 END) AS v110,
        MAX(CASE WHEN c1=1 AND c2=0 AND c3=1 THEN v ELSE 0 END) AS v101,
        MAX(CASE WHEN c1=0 AND c2=1 AND c3=1 THEN v ELSE 0 END) AS v011,
        MAX(CASE WHEN c1=1 AND c2=1 AND c3=1 THEN v ELSE 0 END) AS v111
      FROM cells
    ),
    shap AS (
      SELECT 'click' AS channel,
             ((v100 - v000) * 2 + (v110 - v010) + (v101 - v001)
              + (v111 - v011) * 2) / 6.0 AS phi
      FROM v
      UNION ALL
      SELECT 'view',
             ((v010 - v000) * 2 + (v110 - v100) + (v011 - v001)
              + (v111 - v101) * 2) / 6.0
      FROM v
      UNION ALL
      SELECT 'signup',
             ((v001 - v000) * 2 + (v101 - v100) + (v011 - v010)
              + (v111 - v110) * 2) / 6.0
      FROM v
    )
    SELECT channel, ROUND(phi, 6) AS shapley_value
    FROM shap ORDER BY channel
    """,
)
def q373_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley channel attribution: the characteristic function
    v(S) is the conversion rate of users whose touchpoint pattern is
    exactly S (click/view/signup presence), and each channel's
    credit is the standard 3-player Shapley average of its marginal
    contributions over all join orders (weights 2/6, 1/6, 1/6, 2/6 —
    literal rationals) — the game-theoretic alternative to q199's
    rule-based attribution, satisfying efficiency: the values sum to
    v(grand) - v(empty) (asserted in tests). Scale: one user
    aggregate into 8 coalition cells; everything after is 8-row
    algebra."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        *[
            F.max(
                F.when(F.col("event_type") == ch, 1).otherwise(0)
            ).alias(f"c{i+1}")
            for i, ch in enumerate(_CH)
        ],
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    )
    cells = users.groupBy("c1", "c2", "c3").agg(
        (F.sum("y").cast("double") / F.count(F.lit(1))).alias("v")
    )

    def cell(a, b, c):
        return F.max(
            F.when(
                (F.col("c1") == a) & (F.col("c2") == b) & (F.col("c3") == c),
                F.col("v"),
            ).otherwise(0.0)
        )

    v = cells.agg(
        cell(0, 0, 0).alias("v000"),
        cell(1, 0, 0).alias("v100"),
        cell(0, 1, 0).alias("v010"),
        cell(0, 0, 1).alias("v001"),
        cell(1, 1, 0).alias("v110"),
        cell(1, 0, 1).alias("v101"),
        cell(0, 1, 1).alias("v011"),
        cell(1, 1, 1).alias("v111"),
    )
    phi_click = (
        (F.col("v100") - F.col("v000")) * 2
        + (F.col("v110") - F.col("v010"))
        + (F.col("v101") - F.col("v001"))
        + (F.col("v111") - F.col("v011")) * 2
    ) / 6.0
    phi_view = (
        (F.col("v010") - F.col("v000")) * 2
        + (F.col("v110") - F.col("v100"))
        + (F.col("v011") - F.col("v001"))
        + (F.col("v111") - F.col("v101")) * 2
    ) / 6.0
    phi_signup = (
        (F.col("v001") - F.col("v000")) * 2
        + (F.col("v101") - F.col("v100"))
        + (F.col("v011") - F.col("v010"))
        + (F.col("v111") - F.col("v110")) * 2
    ) / 6.0
    rows = [
        ("click", phi_click),
        ("view", phi_view),
        ("signup", phi_signup),
    ]
    out = None
    for name, phi in rows:
        r = v.select(
            F.lit(name).alias("channel"), F.round(phi, 6).alias("shapley_value")
        )
        out = r if out is None else out.unionByName(r)
    return out.orderBy("channel")


# ---------------------------------------------------------------------------
# q374 — Qini/uplift deciles

UPLIFT_QS = [i / 5.0 for i in range(1, 5)]  # quintiles


@query(
    "q374_qini_uplift",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                       ::BIGINT % 2 = 0 THEN 1 ELSE 0 END AS treated,
             CAST(COUNT(*) AS DOUBLE) AS activity,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
      FROM events GROUP BY user_id
    ),
    cuts AS (
      SELECT list_transform(quantile_cont(activity, {UPLIFT_QS!r}),
                            c -> ROUND(c, 6)) AS cs
      FROM users
    ),
    binned AS (
      SELECT u.treated, u.y,
             5 - len(list_filter(c.cs, c -> ROUND(u.activity, 6) > c))
               AS quintile
      FROM users u, cuts c
    )
    SELECT quintile,
           CAST(SUM(treated) AS BIGINT) AS n_treated,
           CAST(SUM(1 - treated) AS BIGINT) AS n_control,
           ROUND(SUM(CASE WHEN treated = 1 THEN y ELSE 0 END) * 1.0
                 / NULLIF(SUM(treated), 0), 6) AS rate_treated,
           ROUND(SUM(CASE WHEN treated = 0 THEN y ELSE 0 END) * 1.0
                 / NULLIF(SUM(1 - treated), 0), 6) AS rate_control,
           ROUND(SUM(CASE WHEN treated = 1 THEN y ELSE 0 END) * 1.0
                 / NULLIF(SUM(treated), 0)
                 - SUM(CASE WHEN treated = 0 THEN y ELSE 0 END) * 1.0
                 / NULLIF(SUM(1 - treated), 0), 6) AS uplift
    FROM binned GROUP BY quintile ORDER BY quintile
    """,
)
def q374_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift quintiles (the Qini table): split users into activity
    quintiles (broadcast exact cutpoints, the q303 binning — quintile
    1 = most active) and report treated vs control conversion and
    their difference per quintile — the heterogeneous-treatment view
    that says WHO to target, where q330-q333 only say WHETHER the
    treatment works. Treatment is the md5-parity variant, so both
    engines assign identically. Scale: one user aggregate, broadcast
    cutpoints, a 5-key rollup."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("activity"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y"),
    ).select(
        F.when(bucket % 2 == 0, 1).otherwise(0).alias("treated"),
        "activity",
        "y",
    )
    cuts = users.agg(
        F.transform(
            F.percentile("activity", F.array(*[F.lit(q) for q in UPLIFT_QS])),
            lambda c: F.round(c, 6),
        ).alias("cs")
    )
    binned = users.join(F.broadcast(cuts)).select(
        "treated",
        "y",
        (
            F.lit(5)
            - F.size(
                F.filter("cs", lambda c: F.round(F.col("activity"), 6) > c)
            )
        ).alias("quintile"),
    )
    rt = F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0)) * 1.0 / F.nullif(
        F.sum("treated"), F.lit(0)
    )
    rc = F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0)) * 1.0 / F.nullif(
        F.sum(1 - F.col("treated")), F.lit(0)
    )
    return (
        binned.groupBy("quintile")
        .agg(
            F.sum("treated").cast("bigint").alias("n_treated"),
            F.sum(1 - F.col("treated")).cast("bigint").alias("n_control"),
            F.round(rt, 6).alias("rate_treated"),
            F.round(rc, 6).alias("rate_control"),
            F.round(rt - rc, 6).alias("uplift"),
        )
        .orderBy("quintile")
    )
