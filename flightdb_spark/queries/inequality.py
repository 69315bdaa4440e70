"""Inequality-and-concentration batch 107 (q601-q605) — the
distributional-equity toolkit over customer revenue (exact integer
cents, per-row FLOOR(x*100+0.5) before any sum), built on the repo's
DISTRIBUTED PREFIX SCAN (operators/prefix.bucketed_cumsum) so no
cumulative ever runs a global-order window over corpus rows:

- q601 Lorenz + Gini: Lorenz ordinates at the population quartiles
  and the exact rank-sum Gini (sum x_i(2i - N - 1) / (N X), an
  integer numerator) from one bucketed prefix scan;
- q602 Theil-T decomposition: within-region and between-region
  inequality (ln terms under the DETERMINISM.md contract: rounded at
  9 dp, DECIMAL-accumulated, output at 5 dp);
- q603 Atkinson index (eps=1): 1 - geometric/arithmetic mean ratio,
  one terminal exp();
- q604 Palma and top-shares: top-10%/bottom-40% ratio plus top-1%
  and top-5% revenue shares from the same prefix scan;
- q605 ABC/XYZ cross-tab: parts classed A/B/C by cumulative revenue
  (80%/95% cuts via the prefix scan over descending revenue) and
  X/Y/Z by demand variability (CV^2 thresholds compared with
  cross-multiplied exact integers).

100 TB shape: each query is (one per-entity aggregate) -> (bucketed
prefix scan: bounded window over per-bucket totals only, the
__cumsum_bucket exemption in planlint) -> (one terminal aggregate).
Order keys are made DISTINCT by packing (cents, entity-key) into one
BIGINT, so the prefix scan's tie-break caveat never applies. Oracles
use plain SUM() OVER (ORDER BY ...) windows — DuckDB is the
single-node reference, the Spark plan is the scale path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.operators.prefix import bucketed_cumsum
from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

PACK = 10_000_000  # order-key packing: cents * PACK + entity_key (key < PACK)


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("orders", "customer", "nation", "region", "lineitem"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _cust_cents(spark: SparkSession) -> DataFrame:
    """Per-customer revenue in exact integer cents with a DISTINCT
    packed order key (ascending revenue, custkey tie-break)."""
    return spark.sql(
        f"""
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
        """
    ).select(
        "custkey",
        "cents",
        (F.col("cents") * PACK + F.col("custkey")).alias("okey"),
        F.lit(1).cast("long").alias("one"),
    ).localCheckpoint(eager=True)
    # checkpointed: bucketed_cumsum re-executes its input lineage three
    # times (edges, windows, totals) and q601/q604 read the cumulative
    # twice more — without this the orders corpus aggregate re-ran 4-5x
    # per query (70 Exchanges in q601's before plan; P3, guide §2.4)


_CUST_CTE = """percust AS (
      SELECT o_custkey AS custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ),
    cum AS (
      SELECT custkey, cents,
             SUM(cents) OVER (ORDER BY cents, custkey) AS cum_cents,
             CAST(ROW_NUMBER() OVER (ORDER BY cents, custkey) AS BIGINT)
               AS cum_n
      FROM percust
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS x
      FROM percust
    )"""


# ---------------------------------------------------------------------------
# q601 — Lorenz ordinates + exact Gini

_LORENZ_ORACLE = f"""
    WITH {_CUST_CTE}
    SELECT t.n AS n_customers, t.x AS total_cents,
           ROUND(CAST(MAX(CASE WHEN 4 * c.cum_n <= t.n THEN c.cum_cents END)
                      AS DOUBLE) / t.x, 6) AS lorenz_q1,
           ROUND(CAST(MAX(CASE WHEN 4 * c.cum_n <= 2 * t.n THEN c.cum_cents END)
                      AS DOUBLE) / t.x, 6) AS lorenz_q2,
           ROUND(CAST(MAX(CASE WHEN 4 * c.cum_n <= 3 * t.n THEN c.cum_cents END)
                      AS DOUBLE) / t.x, 6) AS lorenz_q3,
           ROUND(CAST(SUM(c.cents * (2 * c.cum_n - t.n - 1)) AS DOUBLE)
                 / (CAST(t.n AS DOUBLE) * t.x), 6) AS gini
    FROM cum c CROSS JOIN tot t
    GROUP BY t.n, t.x
    """


@query("q601_lorenz_gini", oracle=_LORENZ_ORACLE)
def q601_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz ordinates at the population quartiles and the exact
    rank-sum Gini over per-customer revenue cents. The cumulative
    comes from the repo's bucketed prefix scan (bounded window over
    per-bucket totals — never a corpus-order window); ranks are
    unambiguous because the order key packs (cents, custkey) into one
    distinct BIGINT. Gini numerator sum x_i(2i-N-1) is an exact
    integer."""
    _views(spark, sf_dir)
    cum = bucketed_cumsum(_cust_cents(spark), "okey", ["cents", "one"])
    return _lorenz_spark(cum)


def _lorenz_spark(cum: DataFrame) -> DataFrame:
    tot = cum.agg(
        F.max("cum_one").cast("bigint").alias("n"),
        F.max("cum_cents").cast("bigint").alias("x"),
    )
    return (
        cum.select("cents", "cum_cents", F.col("cum_one").alias("cum_n"))
        .join(F.broadcast(tot))
        .agg(
            F.max("n").alias("n_customers"),
            F.max("x").alias("total_cents"),
            F.round(
                F.max(
                    F.when(4 * F.col("cum_n") <= F.col("n"), F.col("cum_cents"))
                ).cast("double")
                / F.max("x"),
                6,
            ).alias("lorenz_q1"),
            F.round(
                F.max(
                    F.when(4 * F.col("cum_n") <= 2 * F.col("n"), F.col("cum_cents"))
                ).cast("double")
                / F.max("x"),
                6,
            ).alias("lorenz_q2"),
            F.round(
                F.max(
                    F.when(4 * F.col("cum_n") <= 3 * F.col("n"), F.col("cum_cents"))
                ).cast("double")
                / F.max("x"),
                6,
            ).alias("lorenz_q3"),
            F.round(
                F.sum(
                    F.col("cents") * (2 * F.col("cum_n") - F.col("n") - 1)
                ).cast("double")
                / (F.max("n").cast("double") * F.max("x")),
                6,
            ).alias("gini"),
        )
    )


# ---------------------------------------------------------------------------
# q602 — Theil-T decomposition by region


def _theil_sql(dialect: str) -> str:
    ln = "ln" if dialect == "spark" else "ln"
    return f"""
    WITH revenue AS (
      SELECT r.r_name AS region,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents,
             o.o_custkey
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name, o.o_custkey
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS x
      FROM revenue
    ),
    grp AS (
      SELECT region, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(cents) AS BIGINT) AS xg
      FROM revenue GROUP BY region
    ),
    within AS (
      SELECT r.region,
             CAST(SUM(CAST(ROUND(
               (CAST(r.cents AS DOUBLE) / g.xg)
               * {ln}(CAST(r.cents AS DOUBLE) * g.ng / g.xg), 9)
             AS DECIMAL(38,9))) AS DOUBLE) AS t_g
      FROM revenue r JOIN grp g ON g.region = r.region
      GROUP BY r.region
    )
    SELECT g.region, g.ng AS n_customers,
           ROUND(CAST(g.xg AS DOUBLE) / t.x, 6) AS revenue_share,
           ROUND(w.t_g, 5) AS theil_within,
           -- single term: 9 dp intermediate for ULP insurance, DOUBLE out
           ROUND(ROUND(
             (CAST(g.xg AS DOUBLE) / t.x)
             * {ln}((CAST(g.xg AS DOUBLE) / t.x) / (CAST(g.ng AS DOUBLE) / t.n)),
             9), 5) AS between_term
    FROM grp g
    JOIN within w ON w.region = g.region
    CROSS JOIN tot t
    ORDER BY g.region
    """


@query("q602_theil_decomposition", oracle=_theil_sql("duck"))
def q602_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-T inequality decomposed by region: within-region T_g
    (population-share-weighted in the summary identity) and each
    region's between-group term s_g ln(s_g/p_g). Transcendental terms
    follow the ln contract (9 dp round, DECIMAL accumulate, 5 dp out).
    One customer aggregate, 5-row group joins broadcast."""
    _views(spark, sf_dir)
    return spark.sql(_theil_sql("spark"))


# ---------------------------------------------------------------------------
# q603 — Atkinson index (eps = 1)


def _atkinson_sql(dialect: str) -> str:
    return """
    WITH percust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           ROUND(1.0 - exp(CAST(SUM(CAST(ROUND(ln(CAST(cents AS DOUBLE)), 9)
                                        AS DECIMAL(38,9))) AS DOUBLE)
                           / COUNT(*))
                       / (CAST(SUM(cents) AS DOUBLE) / COUNT(*)), 6)
             AS atkinson_eps1
    FROM percust
    """


@query("q603_atkinson_index", oracle=_atkinson_sql("duck"))
def q603_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality at eps=1: one minus the geometric-to-
    arithmetic mean ratio of customer revenue. The ln terms follow the
    9 dp/DECIMAL contract; the single terminal exp() runs on an
    identical double on both engines. One aggregate, no joins."""
    _views(spark, sf_dir)
    return spark.sql(_atkinson_sql("spark"))


# ---------------------------------------------------------------------------
# q604 — Palma ratio and top shares

_PALMA_ORACLE = f"""
    WITH {_CUST_CTE}
    SELECT t.n AS n_customers,
           ROUND(CAST(t.x - MAX(CASE WHEN 10 * c.cum_n <= 9 * t.n
                                     THEN c.cum_cents END) AS DOUBLE)
                 / t.x, 6) AS top10_share,
           ROUND(CAST(MAX(CASE WHEN 10 * c.cum_n <= 4 * t.n
                               THEN c.cum_cents END) AS DOUBLE)
                 / t.x, 6) AS bottom40_share,
           ROUND(CAST(t.x - MAX(CASE WHEN 10 * c.cum_n <= 9 * t.n
                                     THEN c.cum_cents END) AS DOUBLE)
                 / (MAX(CASE WHEN 10 * c.cum_n <= 4 * t.n
                             THEN c.cum_cents END)), 6) AS palma_ratio,
           ROUND(CAST(t.x - MAX(CASE WHEN 100 * c.cum_n <= 99 * t.n
                                     THEN c.cum_cents END) AS DOUBLE)
                 / t.x, 6) AS top1_share,
           ROUND(CAST(t.x - MAX(CASE WHEN 100 * c.cum_n <= 95 * t.n
                                     THEN c.cum_cents END) AS DOUBLE)
                 / t.x, 6) AS top5_share
    FROM cum c CROSS JOIN tot t
    GROUP BY t.n, t.x
    """


@query("q604_palma_top_shares", oracle=_PALMA_ORACLE)
def q604_palma_top_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Palma ratio (top-10% revenue over bottom-40%) and top-1%/
    top-5% shares, all read off the same bucketed prefix scan as
    q601 — threshold selections are integer-cross-multiplied
    (10*cum_n <= 9*N), never percent doubles."""
    _views(spark, sf_dir)
    cum = bucketed_cumsum(_cust_cents(spark), "okey", ["cents", "one"])
    c = cum.select("cents", "cum_cents", F.col("cum_one").alias("cum_n"))
    tot = c.agg(
        F.max("cum_n").cast("bigint").alias("n"),
        F.max("cum_cents").cast("bigint").alias("x"),
    )
    j = c.join(F.broadcast(tot))

    def below(mult_n: int, mult_k: int):
        return F.max(
            F.when(
                mult_n * F.col("cum_n") <= mult_k * F.col("n"), F.col("cum_cents")
            )
        )

    return j.agg(
        F.max("n").alias("n_customers"),
        F.round((F.max("x") - below(10, 9)).cast("double") / F.max("x"), 6).alias(
            "top10_share"
        ),
        F.round(below(10, 4).cast("double") / F.max("x"), 6).alias("bottom40_share"),
        F.round(
            (F.max("x") - below(10, 9)).cast("double") / below(10, 4), 6
        ).alias("palma_ratio"),
        F.round((F.max("x") - below(100, 99)).cast("double") / F.max("x"), 6).alias(
            "top1_share"
        ),
        F.round((F.max("x") - below(100, 95)).cast("double") / F.max("x"), 6).alias(
            "top5_share"
        ),
    )


# ---------------------------------------------------------------------------
# q605 — ABC/XYZ cross-tab

CV2_X = (1, 4)  # CV^2 < 1/4  -> X (stable)
CV2_Y = (1, 1)  # CV^2 < 1    -> Y
ABC_A = (80, 100)
ABC_B = (95, 100)


def _abcxyz_sql(dialect: str) -> str:
    if dialect == "spark":
        cumw = None  # spark side is DataFrame code
    return f"""
    WITH perpart AS (
      SELECT l_partkey AS partkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                  AS BIGINT) AS sqq
      FROM lineitem GROUP BY l_partkey
    ),
    cum AS (
      SELECT partkey, cents, n_lines, sq, sqq,
             SUM(cents) OVER (ORDER BY cents DESC, partkey) AS cum_cents
      FROM perpart
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS x FROM perpart),
    classed AS (
      SELECT CASE WHEN {ABC_A[1]} * c.cum_cents <= {ABC_A[0]} * t.x THEN 'A'
                  WHEN {ABC_B[1]} * c.cum_cents <= {ABC_B[0]} * t.x THEN 'B'
                  ELSE 'C' END AS abc,
             -- CV^2 = (n*sqq - sq^2) / sq^2, compared cross-multiplied
             CASE WHEN (c.n_lines * c.sqq - c.sq * c.sq) * {CV2_X[1]}
                       < c.sq * c.sq * {CV2_X[0]} THEN 'X'
                  WHEN (c.n_lines * c.sqq - c.sq * c.sq) * {CV2_Y[1]}
                       < c.sq * c.sq * {CV2_Y[0]} THEN 'Y'
                  ELSE 'Z' END AS xyz,
             c.cents
      FROM cum c CROSS JOIN tot t
    )
    SELECT abc, xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM classed
    GROUP BY abc, xyz
    ORDER BY abc, xyz
    """


@query("q605_abc_xyz", oracle=_abcxyz_sql("duck"))
def q605_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ABC/XYZ inventory cross-tab: parts classed by cumulative
    revenue contribution (A = first 80%, B = to 95%, C = rest —
    integer-cross-multiplied thresholds on the DESCENDING prefix
    scan) and by demand variability (CV^2 of line quantities as the
    exact rational (n*sqq - sq^2)/sq^2, cross-multiplied). Spark runs
    the descending cumulative through bucketed_cumsum on a negated
    packed key — no global window."""
    _views(spark, sf_dir)
    per = spark.sql(
        """
        SELECT l_partkey AS partkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
               CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                    AS BIGINT) AS sqq
        FROM lineitem GROUP BY l_partkey
        """
    ).withColumn("okey", -(F.col("cents") * PACK) + F.col("partkey"))
    # checkpointed for the same reason as _cust_cents: the prefix scan
    # re-executes its input 3x and `tot` reads it a 4th time
    per = per.localCheckpoint(eager=True)
    cum = bucketed_cumsum(per, "okey", ["cents"])
    tot = per.agg(F.sum("cents").cast("bigint").alias("x"))
    var_num = F.col("n_lines") * F.col("sqq") - F.col("sq") * F.col("sq")
    sq2 = F.col("sq") * F.col("sq")
    return (
        cum.join(F.broadcast(tot))
        .select(
            F.when(
                ABC_A[1] * F.col("cum_cents") <= ABC_A[0] * F.col("x"), F.lit("A")
            )
            .when(ABC_B[1] * F.col("cum_cents") <= ABC_B[0] * F.col("x"), F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc"),
            F.when(var_num * CV2_X[1] < sq2 * CV2_X[0], F.lit("X"))
            .when(var_num * CV2_Y[1] < sq2 * CV2_Y[0], F.lit("Y"))
            .otherwise(F.lit("Z"))
            .alias("xyz"),
            "cents",
        )
        .groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("abc", "xyz")
    )
