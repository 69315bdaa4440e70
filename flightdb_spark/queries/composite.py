"""Composite-indicator batch 161 (q871-q875) — the OECD-handbook
methodology audit for building a single "brand health index" out of
three sub-indicators (revenue, customer reach, and revenue
consistency): every choice in the pipeline — normalization,
weighting, aggregation — moves the ranking, and this batch measures
by exactly how much.

- q871 the indicator table: the three raw metrics and their min-max
  normalizations per brand (exact integer ratios);
- q872 arithmetic vs geometric composites with both ranks —
  geometric punishes imbalance (no full compensation);
- q873 weight-scheme sensitivity: four weight vectors (equal and
  each metric double-weighted) -> per-brand rank range across
  schemes;
- q874 normalization sensitivity: min-max vs rank-based
  normalization, with the exact Kendall distance between the two
  resulting composite rankings;
- q875 compensability census: brands whose arithmetic rank beats
  their geometric rank by >= 2 (the compensation beneficiaries — a
  weak pillar hidden by a strong one).

100 TB shape: one fact pass to three 25-row brand aggregates; all
index arithmetic, ranks (inequality-count joins), and comparisons
run on the bounded brand table.

Determinism: metrics quantized to exact integers (cents; customer
counts; consistency = nano-quantized 1/(1+CV) from integer moments);
min-max normalization in exact micro-units; geometric means via
nano-quantized LN terms summed as BIGINTs with display-rounded EXP
(q762 lesson); every rank is an integer count with name ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

BASE_MONTH = 1995 * 12
NANO = "1000000000"
MICRO = "1000000"

# q873 weight schemes (integer weights summing to 4)
SCHEMES = {
    "equal": (1, 1, 1),
    "revenue_heavy": (2, 1, 1),
    "reach_heavy": (1, 2, 1),
    "consistency_heavy": (1, 1, 2),
}


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "orders", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _metrics_cte() -> str:
    """Three exact integer metrics per brand + min-max normalization."""
    return f"""fact AS (
      SELECT p.p_brand AS b, o.o_custkey AS cust,
             (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
               - {BASE_MONTH}) AS m,
             CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
    ),
    monthly AS (
      SELECT b, m, CAST(SUM(cents) AS BIGINT) AS mc
      FROM fact GROUP BY b, m
    ),
    cons AS (
      SELECT b,
             CAST(FLOOR(CAST({NANO} AS DOUBLE)
                  / (1 + SQRT(CAST(COUNT(*) AS DOUBLE)
                       * CAST(SUM(CAST(mc AS DECIMAL(38,0)) * mc) AS DOUBLE)
                       - CAST(SUM(mc) AS DOUBLE) * SUM(mc))
                    / SUM(mc)) + 0.5) AS BIGINT) AS consistency_n
      FROM monthly GROUP BY b
    ),
    raw AS (
      SELECT f.b,
             CAST(SUM(f.cents) AS BIGINT) AS revenue_cents,
             CAST(COUNT(DISTINCT f.cust) AS BIGINT) AS n_customers,
             CAST(MAX(c.consistency_n) AS BIGINT) AS consistency_n
      FROM fact f JOIN cons c ON c.b = f.b
      GROUP BY f.b
    ),
    ext AS (
      SELECT CAST(MIN(revenue_cents) AS BIGINT) AS rev_lo,
             CAST(MAX(revenue_cents) AS BIGINT) AS rev_hi,
             CAST(MIN(n_customers) AS BIGINT) AS cus_lo,
             CAST(MAX(n_customers) AS BIGINT) AS cus_hi,
             CAST(MIN(consistency_n) AS BIGINT) AS con_lo,
             CAST(MAX(consistency_n) AS BIGINT) AS con_hi
      FROM raw
    ),
    norm AS (
      SELECT /*+ BROADCAST(e) */ r.b,
             r.revenue_cents, r.n_customers, r.consistency_n,
             CAST(FLOOR(CAST(r.revenue_cents - e.rev_lo AS DOUBLE)
                  * {MICRO} / (e.rev_hi - e.rev_lo) + 0.5) AS BIGINT) AS z1,
             CAST(FLOOR(CAST(r.n_customers - e.cus_lo AS DOUBLE)
                  * {MICRO} / (e.cus_hi - e.cus_lo) + 0.5) AS BIGINT) AS z2,
             CAST(FLOOR(CAST(r.consistency_n - e.con_lo AS DOUBLE)
                  * {MICRO} / (e.con_hi - e.con_lo) + 0.5) AS BIGINT) AS z3
      FROM raw r CROSS JOIN ext e
    )"""


_NORM_VIEW = "composite_norm_mv"


def _norm_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the 25-row normalized indicator table once (guide
    §2.4): under CTE inlining the `fact` 3-table corpus join ran twice
    per query (monthly-consistency path + raw metrics path) and the
    whole chain re-ran once per `norm` reference. The build itself
    does ONE corpus pass to the (brand, customer, month) grain
    (exact integer partial sums), checkpoints it, and derives
    monthly/consistency/raw/ext/norm from that bounded table with the
    exact `_metrics_cte` expressions. The oracle keeps the
    one-statement form."""
    _views(spark, sf_dir)
    f2 = spark.sql(
        f"""
    SELECT p.p_brand AS b, o.o_custkey AS cust,
           (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
             - {BASE_MONTH}) AS m,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand, o.o_custkey,
             (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
               - {BASE_MONTH})
    """
    )
    f2.localCheckpoint(eager=True).createOrReplaceTempView("composite_f2_mv")
    norm = spark.sql(
        f"""
    WITH monthly AS (
      SELECT b, m, CAST(SUM(cents) AS BIGINT) AS mc
      FROM composite_f2_mv GROUP BY b, m
    ),
    cons AS (
      SELECT b,
             CAST(FLOOR(CAST({NANO} AS DOUBLE)
                  / (1 + SQRT(CAST(COUNT(*) AS DOUBLE)
                       * CAST(SUM(CAST(mc AS DECIMAL(38,0)) * mc) AS DOUBLE)
                       - CAST(SUM(mc) AS DOUBLE) * SUM(mc))
                    / SUM(mc)) + 0.5) AS BIGINT) AS consistency_n
      FROM monthly GROUP BY b
    ),
    raw AS (
      SELECT f.b,
             CAST(SUM(f.cents) AS BIGINT) AS revenue_cents,
             CAST(COUNT(DISTINCT f.cust) AS BIGINT) AS n_customers,
             CAST(MAX(c.consistency_n) AS BIGINT) AS consistency_n
      FROM composite_f2_mv f JOIN cons c ON c.b = f.b
      GROUP BY f.b
    ),
    ext AS (
      SELECT CAST(MIN(revenue_cents) AS BIGINT) AS rev_lo,
             CAST(MAX(revenue_cents) AS BIGINT) AS rev_hi,
             CAST(MIN(n_customers) AS BIGINT) AS cus_lo,
             CAST(MAX(n_customers) AS BIGINT) AS cus_hi,
             CAST(MIN(consistency_n) AS BIGINT) AS con_lo,
             CAST(MAX(consistency_n) AS BIGINT) AS con_hi
      FROM raw
    )
    SELECT /*+ BROADCAST(e) */ r.b,
           r.revenue_cents, r.n_customers, r.consistency_n,
           CAST(FLOOR(CAST(r.revenue_cents - e.rev_lo AS DOUBLE)
                * {MICRO} / (e.rev_hi - e.rev_lo) + 0.5) AS BIGINT) AS z1,
           CAST(FLOOR(CAST(r.n_customers - e.cus_lo AS DOUBLE)
                * {MICRO} / (e.cus_hi - e.cus_lo) + 0.5) AS BIGINT) AS z2,
           CAST(FLOOR(CAST(r.consistency_n - e.con_lo AS DOUBLE)
                * {MICRO} / (e.con_hi - e.con_lo) + 0.5) AS BIGINT) AS z3
    FROM raw r CROSS JOIN ext e
    """
    )
    norm.localCheckpoint(eager=True).createOrReplaceTempView(_NORM_VIEW)


def _spark_sql(full_sql: str) -> str:
    """The shared SQL text with the metrics chain swapped for the
    materialized 25-row norm view."""
    return full_sql.replace(
        _metrics_cte(),
        f"norm AS (SELECT * FROM {_NORM_VIEW})",
        1,
    )


# ---------------------------------------------------------------------------
# q871 — indicator table

_Q871_SQL = f"""
    WITH {_metrics_cte()}
    SELECT b AS brand, revenue_cents, n_customers,
           CAST(consistency_n AS DOUBLE) / {NANO} AS consistency,
           CAST(z1 AS DOUBLE) / {MICRO} AS norm_revenue,
           CAST(z2 AS DOUBLE) / {MICRO} AS norm_customers,
           CAST(z3 AS DOUBLE) / {MICRO} AS norm_consistency
    FROM norm
    ORDER BY b
    """


@query("q871_indicator_table", oracle=_Q871_SQL)
def q871_indicator_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three sub-indicators per brand (revenue, distinct-customer
    reach, 1/(1+CV) revenue consistency from integer monthly moments)
    and their exact min-max normalizations in micro-units."""
    _norm_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q871_SQL))


# ---------------------------------------------------------------------------
# q872 — arithmetic vs geometric composite

def _rank(over: str, alias: str) -> str:
    return f"""{alias} AS (
      SELECT /*+ BROADCAST(z) */ x.b,
             CAST(1 + SUM(CASE WHEN z.{over} > x.{over}
                          OR (z.{over} = x.{over} AND z.b < x.b)
                          THEN 1 ELSE 0 END) AS BIGINT) AS rnk
      FROM scored x JOIN scored z ON z.b <> x.b
      GROUP BY x.b, x.{over}
    )"""


_Q872_SQL = f"""
    WITH {_metrics_cte()},
    scored AS (
      SELECT b,
             CAST(z1 + z2 + z3 AS BIGINT) AS arith3,
             CAST(FLOOR(EXP((CAST(FLOOR(LN(GREATEST(z1, 1)) * {NANO} + 0.5)
                  AS BIGINT) + CAST(FLOOR(LN(GREATEST(z2, 1)) * {NANO}
                  + 0.5) AS BIGINT) + CAST(FLOOR(LN(GREATEST(z3, 1))
                  * {NANO} + 0.5) AS BIGINT))
                  / CAST(3 AS DOUBLE) / {NANO}) + 0.5) AS BIGINT) AS geom
      FROM norm
    ),
    {_rank('arith3', 'ra')},
    {_rank('geom', 'rg')}
    SELECT s.b AS brand,
           CAST(s.arith3 AS DOUBLE) / 3 / {MICRO} AS arithmetic_index,
           CAST(s.geom AS DOUBLE) / {MICRO} AS geometric_index,
           ra.rnk AS arithmetic_rank,
           rg.rnk AS geometric_rank
    FROM scored s
    JOIN ra ON ra.b = s.b
    JOIN rg ON rg.b = s.b
    ORDER BY s.b
    """


@query("q872_composite_scores", oracle=_Q872_SQL)
def q872_composite_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic vs geometric composites with both rankings: the
    geometric mean (nano-quantized LN sums, FLOOR-quantized EXP back
    to integer micro-units) can't be rescued by one strong pillar —
    AM >= GM rowwise (test-asserted)."""
    _norm_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q872_SQL))


# ---------------------------------------------------------------------------
# q873 — weight sensitivity

_SCHEME_ROWS = "\n      UNION ALL\n      ".join(
    f"SELECT '{name}' AS scheme, {w1} AS w1, {w2} AS w2, {w3} AS w3"
    for name, (w1, w2, w3) in SCHEMES.items()
)

_Q873_SQL = f"""
    WITH {_metrics_cte()},
    schemes AS (
      {_SCHEME_ROWS}
    ),
    scored AS (
      SELECT /*+ BROADCAST(s) */ s.scheme, n.b,
             CAST(s.w1 * n.z1 + s.w2 * n.z2 + s.w3 * n.z3 AS BIGINT) AS v
      FROM norm n CROSS JOIN schemes s
    ),
    ranked AS (
      SELECT /*+ BROADCAST(z) */ x.scheme, x.b,
             CAST(1 + SUM(CASE WHEN z.v > x.v
                          OR (z.v = x.v AND z.b < x.b)
                          THEN 1 ELSE 0 END) AS BIGINT) AS rnk
      FROM scored x JOIN scored z
        ON z.scheme = x.scheme AND z.b <> x.b
      GROUP BY x.scheme, x.b, x.v
    )
    SELECT b AS brand,
           CAST(MIN(rnk) AS BIGINT) AS best_rank,
           CAST(MAX(rnk) AS BIGINT) AS worst_rank,
           CAST(MAX(rnk) - MIN(rnk) AS BIGINT) AS rank_swing
    FROM ranked
    GROUP BY b
    ORDER BY b
    """


@query("q873_weight_sensitivity", oracle=_Q873_SQL)
def q873_weight_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each brand's rank range across four weight schemes (equal plus
    each pillar double-weighted): a large swing means the headline
    rank is a weighting artifact, not a fact about the brand."""
    _norm_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q873_SQL))


# ---------------------------------------------------------------------------
# q874 — normalization sensitivity

_Q874_SQL = f"""
    WITH {_metrics_cte()},
    rk AS (
      SELECT /*+ BROADCAST(z) */ x.b,
             CAST(SUM(CASE WHEN z.revenue_cents < x.revenue_cents
                      OR (z.revenue_cents = x.revenue_cents AND z.b < x.b)
                      THEN 1 ELSE 0 END) AS BIGINT) AS r1,
             CAST(SUM(CASE WHEN z.n_customers < x.n_customers
                      OR (z.n_customers = x.n_customers AND z.b < x.b)
                      THEN 1 ELSE 0 END) AS BIGINT) AS r2,
             CAST(SUM(CASE WHEN z.consistency_n < x.consistency_n
                      OR (z.consistency_n = x.consistency_n AND z.b < x.b)
                      THEN 1 ELSE 0 END) AS BIGINT) AS r3
      FROM norm x JOIN norm z ON z.b <> x.b
      GROUP BY x.b, x.revenue_cents, x.n_customers, x.consistency_n
    ),
    bothn AS (
      SELECT n.b,
             CAST(n.z1 + n.z2 + n.z3 AS BIGINT) AS v_minmax,
             CAST(r.r1 + r.r2 + r.r3 AS BIGINT) AS v_rank
      FROM norm n JOIN rk r ON r.b = n.b
    ),
    pairs AS (
      SELECT /*+ BROADCAST(z) */
        CASE WHEN SIGN(x.v_minmax - z.v_minmax)
                  * SIGN(x.v_rank - z.v_rank) < 0
             THEN 1 ELSE 0 END AS discordant
      FROM bothn x JOIN bothn z ON x.b < z.b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(discordant) AS BIGINT) AS rank_flips,
           CAST(SUM(discordant) AS DOUBLE) / COUNT(*)
             AS normalization_kendall_distance
    FROM pairs
    """


@query("q874_normalization_sensitivity", oracle=_Q874_SQL)
def q874_normalization_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-max vs rank-based normalization feeding the same equal-
    weight composite: the exact Kendall distance between the two
    resulting orderings — the methodology-choice footprint."""
    _norm_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q874_SQL))


# ---------------------------------------------------------------------------
# q875 — compensability census

_Q875_SQL = f"""
    WITH {_metrics_cte()},
    scored AS (
      SELECT b,
             CAST(z1 + z2 + z3 AS BIGINT) AS arith3,
             CAST(FLOOR(EXP((CAST(FLOOR(LN(GREATEST(z1, 1)) * {NANO} + 0.5)
                  AS BIGINT) + CAST(FLOOR(LN(GREATEST(z2, 1)) * {NANO}
                  + 0.5) AS BIGINT) + CAST(FLOOR(LN(GREATEST(z3, 1))
                  * {NANO} + 0.5) AS BIGINT))
                  / CAST(3 AS DOUBLE) / {NANO}) + 0.5) AS BIGINT) AS geom,
             CAST(LEAST(z1, LEAST(z2, z3)) AS BIGINT) AS weakest_pillar
      FROM norm
    ),
    {_rank('arith3', 'ra')},
    {_rank('geom', 'rg')}
    SELECT s.b AS brand,
           ra.rnk AS arithmetic_rank, rg.rnk AS geometric_rank,
           CAST(rg.rnk - ra.rnk AS BIGINT) AS rank_penalty_under_gm,
           CAST(s.weakest_pillar AS DOUBLE) / {MICRO} AS weakest_pillar,
           CASE WHEN rg.rnk - ra.rnk >= 2 THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS compensation_beneficiary
    FROM scored s
    JOIN ra ON ra.b = s.b
    JOIN rg ON rg.b = s.b
    ORDER BY s.b
    """


@query("q875_compensability_census", oracle=_Q875_SQL)
def q875_compensability_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Who benefits from full compensability: brands whose geometric
    rank is >= 2 worse than their arithmetic rank, beside their
    weakest normalized pillar (the thing the arithmetic mean was
    hiding)."""
    _norm_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q875_SQL))
