"""Survey-sampling batch 114 (q636-q640) — the sampling designs a
data-pipeline engineer actually deploys, each with its estimator
checked against the frame, in exact integer arithmetic:

- q636 hash-Bernoulli sampling at p = 0.2 (the exact integer
  threshold k < 2^20/5) with the Horvitz-Thompson total estimator
  per event type and its exact relative error vs the frame total;
- q637 systematic sampling (every 50th by rank over a packed
  distinct key) with a stratification audit: per-type sample share
  vs population share;
- q638 Hamilton (largest-remainder) apportionment of a 1,000-row
  budget across event-type strata — floor quotas + remainder ranks
  on the 5-row strata table, all integer;
- q639 PPS (probability proportional to size) inclusion
  probabilities over parts with TWO unrolled certainty rounds:
  units with n*s_i > S take pi = 1 and the remainder rescales —
  cross-multiplied integer certainty tests;
- q640 cluster design effect: users as clusters — one-way ANOVA
  sums in DECIMAL(38,0), the intraclass correlation, and
  DEFF = 1 + (m_bar - 1) * rho.

100 TB shape: sample membership is a stateless map-side hash test;
the systematic rank uses the distributed prefix scan; apportionment/
PPS run on bounded strata tables; ANOVA is one (cluster) aggregate
plus one global aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.operators.prefix import bucketed_cumsum
from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

DENOM = 1 << 20
BERNOULLI_NUM = DENOM // 5  # p = 0.2 exactly
SYSTEMATIC_K = 50
BUDGET = 1000
PPS_N = 50
PACK = 10_000_000


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("events", "lineitem"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _h20(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 5), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, 5))::BIGINT)"


def _idiv(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


# ---------------------------------------------------------------------------
# q636 — Bernoulli + Horvitz-Thompson


def _bernoulli_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    h = _h20(dialect, f"concat('bern:', CAST(event_id AS {s}))")
    return f"""
    WITH tagged AS (
      SELECT event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN {h} < {BERNOULLI_NUM} THEN 1 ELSE 0 END AS in_sample
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS frame_n,
           CAST(SUM(in_sample) AS BIGINT) AS sample_n,
           CAST(SUM(cents) AS BIGINT) AS true_total_cents,
           -- HT total: sampled sum / p = sampled sum * 5, exact
           CAST(SUM(in_sample * cents) * 5 AS BIGINT) AS ht_total_cents,
           ROUND(CAST(SUM(in_sample * cents) * 5 - SUM(cents) AS DOUBLE)
                 / SUM(cents), 6) AS ht_relative_error
    FROM tagged
    GROUP BY event_type
    ORDER BY event_type
    """


@query("q636_bernoulli_ht", oracle=_bernoulli_sql("duck"))
def q636_bernoulli_ht(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-Bernoulli sampling at exactly p = 1/5 (integer threshold
    on the 2^20 hash) and the Horvitz-Thompson total estimator
    (sampled sum * 5 — exact) per event type, with its relative error
    against the frame total. Membership is a stateless map-side test;
    one aggregate does everything."""
    _views(spark, sf_dir)
    return spark.sql(_bernoulli_sql("spark"))


# ---------------------------------------------------------------------------
# q637 — systematic sampling

_SYS_ORACLE = f"""
    WITH ranked AS (
      SELECT event_type,
             ROW_NUMBER() OVER (ORDER BY event_id) AS rn
      FROM events
    ),
    pop AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pop
      FROM events GROUP BY event_type
    ),
    samp AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_samp
      FROM ranked WHERE rn % {SYSTEMATIC_K} = 1
      GROUP BY event_type
    ),
    tot AS (
      SELECT CAST(SUM(n_pop) AS BIGINT) AS np,
             CAST((SELECT SUM(n_samp) FROM samp) AS BIGINT) AS ns
      FROM pop
    )
    SELECT p.event_type, p.n_pop, COALESCE(s.n_samp, 0) AS n_samp,
           ROUND(CAST(p.n_pop AS DOUBLE) / t.np, 6) AS pop_share,
           ROUND(CAST(COALESCE(s.n_samp, 0) AS DOUBLE) / t.ns, 6)
             AS sample_share
    FROM pop p
    LEFT JOIN samp s ON s.event_type = p.event_type
    CROSS JOIN tot t
    ORDER BY p.event_type
    """


@query("q637_systematic_sample", oracle=_SYS_ORACLE)
def q637_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic sampling: every 50th row in event_id order, with the
    stratification audit (per-type sample share vs population share —
    systematic designs inherit frame-order structure, which this
    table makes visible). The Spark rank comes from the distributed
    prefix scan over the distinct event_id key (no global window);
    the oracle uses the plain window."""
    _views(spark, sf_dir)
    ev = spark.table("events").select(
        "event_type", F.col("event_id").alias("okey"), F.lit(1).cast("long").alias("one")
    )
    cum = bucketed_cumsum(ev, "okey", ["one"])
    samp = (
        cum.filter((F.col("cum_one") % SYSTEMATIC_K) == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_samp"))
    )
    pop = (
        spark.table("events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pop"))
    )
    tot = pop.agg(
        F.sum("n_pop").cast("bigint").alias("np"),
    ).crossJoin(samp.agg(F.sum("n_samp").cast("bigint").alias("ns")))
    return (
        pop.join(samp, "event_type", "left")
        .join(F.broadcast(tot))
        .select(
            "event_type",
            "n_pop",
            F.coalesce(F.col("n_samp"), F.lit(0)).cast("bigint").alias("n_samp"),
            F.round(F.col("n_pop").cast("double") / F.col("np"), 6).alias(
                "pop_share"
            ),
            F.round(
                F.coalesce(F.col("n_samp"), F.lit(0)).cast("double") / F.col("ns"),
                6,
            ).alias("sample_share"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q638 — Hamilton apportionment


def _hamilton_sql(dialect: str) -> str:
    return f"""
    WITH strata AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nh
      FROM events GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(nh) AS BIGINT) AS n FROM strata),
    quotas AS (
      SELECT /*+ BROADCAST(t) */ s.event_type, s.nh,
             {_idiv(dialect, f's.nh * {BUDGET}', 't.n')} AS floor_quota,
             (s.nh * {BUDGET}) % t.n AS remainder
      FROM strata s CROSS JOIN tot t
    ),
    ranked AS (
      SELECT a.event_type, a.nh, a.floor_quota, a.remainder,
             CAST(COUNT(*) AS BIGINT) AS rem_rank
      FROM quotas a JOIN quotas b
        ON b.remainder > a.remainder
        OR (b.remainder = a.remainder AND b.event_type <= a.event_type)
      GROUP BY a.event_type, a.nh, a.floor_quota, a.remainder
    ),
    leftover AS (
      SELECT CAST({BUDGET} - SUM(floor_quota) AS BIGINT) AS k FROM quotas
    )
    SELECT /*+ BROADCAST(l) */ r.event_type, r.nh, r.floor_quota, r.remainder, r.rem_rank,
           CAST(r.floor_quota
                + CASE WHEN r.rem_rank <= l.k THEN 1 ELSE 0 END AS BIGINT)
             AS allocated
    FROM ranked r CROSS JOIN leftover l
    ORDER BY r.event_type
    """


@query("q638_hamilton_allocation", oracle=_hamilton_sql("duck"))
def q638_hamilton_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment of a 1,000-row sample
    budget across event-type strata: exact floor quotas
    (nh*B div N), remainder ranks from a 5-row triangle join (ties
    broken by stratum name), and +1 seats to the top leftover ranks.
    The allocation sums to the budget by construction — all
    integer."""
    _views(spark, sf_dir)
    return spark.sql(_hamilton_sql("spark"))


# ---------------------------------------------------------------------------
# q639 — PPS inclusion probabilities


def _pps_sql(dialect: str) -> str:
    return f"""
    WITH sizes AS (
      SELECT l_partkey AS partkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM lineitem GROUP BY l_partkey
    ),
    t1 AS (SELECT CAST(SUM(s) AS BIGINT) AS tot FROM sizes),
    r1 AS (
      SELECT /*+ BROADCAST(t) */ z.partkey, z.s,
             CASE WHEN z.s * {PPS_N} >= t.tot THEN 1 ELSE 0 END AS cert1
      FROM sizes z CROSS JOIN t1 t
    ),
    t2 AS (
      SELECT CAST(SUM(CASE WHEN cert1 = 0 THEN s ELSE 0 END) AS BIGINT)
               AS tot2,
             CAST(SUM(cert1) AS BIGINT) AS nc1
      FROM r1
    ),
    r2 AS (
      SELECT /*+ BROADCAST(t) */ r.partkey, r.s, r.cert1,
             CASE WHEN r.cert1 = 0
                   AND r.s * ({PPS_N} - t.nc1) >= t.tot2 THEN 1 ELSE 0 END
               AS cert2
      FROM r1 r CROSS JOIN t2 t
    ),
    t3 AS (
      SELECT CAST(SUM(CASE WHEN cert1 = 0 AND cert2 = 0 THEN s ELSE 0 END)
                  AS BIGINT) AS tot3,
             CAST(SUM(cert1 + cert2) AS BIGINT) AS nc
      FROM r2
    )
    SELECT /*+ BROADCAST(t) */ CAST(COUNT(*) AS BIGINT) AS n_units,
           CAST(MAX(t.nc) AS BIGINT) AS n_certainty,
           CAST(SUM(CASE WHEN r.cert1 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS certainty_round1,
           CAST(SUM(CASE WHEN r.cert2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS certainty_round2,
           -- sum of inclusion probs must equal the target n
           ROUND(MAX(t.nc)
                 + CAST(({PPS_N} - MAX(t.nc)) AS DOUBLE)
                   * SUM(CASE WHEN r.cert1 = 0 AND r.cert2 = 0
                              THEN r.s ELSE 0 END) / MAX(t.tot3), 6)
             AS sum_pi
    FROM r2 r CROSS JOIN t3 t
    """


@query("q639_pps_inclusion", oracle=_pps_sql("duck"))
def q639_pps_inclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPS inclusion probabilities for an n=50 draw over parts sized
    by revenue, with TWO unrolled certainty rounds: any unit whose
    scaled size reaches the threshold takes pi = 1 and the remainder
    rescales (cross-multiplied integer certainty tests, s*n >= total
    — never a double compare). sum_pi must come back 50.0 exactly up
    to the terminal division."""
    _views(spark, sf_dir)
    return spark.sql(_pps_sql("spark"))


# ---------------------------------------------------------------------------
# q640 — cluster design effect


def _deff_sql(dialect: str) -> str:
    return """
    WITH rows_c AS (
      SELECT user_id, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    clusters AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(cents) AS BIGINT) AS sc,
             SUM(CAST(cents AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)))
               AS scc
      FROM rows_c GROUP BY user_id
    ),
    clusters2 AS (
      -- sc^2/m rounded at 4 dp per cluster then DECIMAL-accumulated:
      -- decimal DIVISION scale rules differ per engine (q627 lesson)
      SELECT user_id, m, sc, scc,
             CAST(ROUND(CAST(sc AS DOUBLE) * sc / m, 4) AS DECIMAL(38,4))
               AS sbterm
      FROM clusters
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(sc) AS BIGINT) AS s,
             SUM(scc) AS ss,
             SUM(sbterm) AS sb_num
      FROM clusters2
    )
    SELECT k AS n_clusters, n AS n_rows,
           ROUND(CAST(n AS DOUBLE) / k, 4) AS mean_cluster_size,
           -- one-way ANOVA: SSB = sum(sc^2/m) - s^2/n ; SSW = ss - sum(sc^2/m)
           ROUND((CAST(sb_num AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                 / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n), 6)
             AS between_share,
           ROUND(((CAST(sb_num AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                    / (k - 1)
                  - (CAST(ss AS DOUBLE) - CAST(sb_num AS DOUBLE)) / (n - k))
                 / ((CAST(sb_num AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                      / (k - 1)
                    + (CAST(n AS DOUBLE) / k - 1)
                      * (CAST(ss AS DOUBLE) - CAST(sb_num AS DOUBLE))
                      / (n - k)), 6) AS icc_anova,
           ROUND(1.0 + (CAST(n AS DOUBLE) / k - 1)
                 * (((CAST(sb_num AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                       / (k - 1)
                     - (CAST(ss AS DOUBLE) - CAST(sb_num AS DOUBLE)) / (n - k))
                    / ((CAST(sb_num AS DOUBLE) - CAST(s AS DOUBLE) * s / n)
                         / (k - 1)
                       + (CAST(n AS DOUBLE) / k - 1)
                         * (CAST(ss AS DOUBLE) - CAST(sb_num AS DOUBLE))
                         / (n - k))), 6) AS design_effect
    FROM g
    """


@query("q640_design_effect", oracle=_deff_sql("duck"))
def q640_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-sampling design effect with users as clusters: one-way
    ANOVA sums in exact DECIMAL moments (sc^2/m kept as DECIMAL
    division by the integer m — identical on both engines since every
    cluster divides its own exact integers), the ANOVA intraclass
    correlation, and DEFF = 1 + (m_bar - 1) * rho. Two aggregates
    total."""
    _views(spark, sf_dir)
    return spark.sql(_deff_sql("spark"))
