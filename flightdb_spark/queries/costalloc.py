"""Cooperative cost-allocation batch 179 (q962-q966) — game-theoretic
sharing of a joint cost over the 25 nations (the airport game,
Littlechild-Owen 1973) and voting-power indices over the 5 regions
(Banzhaf 1965; Shapley-Shubik 1954). The same math splits a shared
cluster bill across tenants or weighs shard owners in a quorum.

Airport game: each nation's standalone requirement c_i is its largest
single order (max o_totalprice in exact cents); serving a coalition
costs max_{i in S} c_i. The Shapley value has the closed prefix form
phi_(i) = sum_{j<=i} (c_(j) - c_(j-1)) / (n - j + 1) over the
c-sorted order — pure prefix arithmetic, no 2^n enumeration.

- q962 airport-game Shapley per nation (closed form, nano-quantized
  terms summed as exact integers);
- q963 Shapley vs proportional-to-standalone allocation: divergence
  per nation — what naive pro-rata gets wrong (small players
  overpay);
- q964 Banzhaf power over the 5 regions (weights = customer counts,
  majority quota): all 32 coalitions enumerated as a literal bit
  grid; swing counts are exact integers;
- q965 Shapley-Shubik power: same swings weighted |S|!(4-|S|)!/5!
  with literal factorials — emitted as exact /120 numerators beside
  the terminal double index;
- q966 core check of the proportional allocation: for the airport
  game the binding coalitions are the c-sorted PREFIX sets, so the
  2^25 constraints reduce to 25 prefix rows, compared by exact
  integer cross-products (never a double division).

100 TB shape: ONE fact aggregate each (orders -> 25-row cost table;
customer -> 5-row weight table); everything after is literal-bounded
(25 prefix rows, 32 coalitions). Nothing beyond the first aggregate
touches fact rows.

Determinism: costs/weights exact integers; Shapley increments
d/(n-j+1) are per-value double divisions quantized to BIGINT
nano-cents via FLOOR before the prefix sum (integer, order-free);
power indices are integer swing counts with terminal ratios; core
slacks are exact integer cross-products.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("orders", "customer"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


# shared: per-nation standalone cost (max order, exact cents), c-sorted
def _costs_cte() -> str:
    return """costs AS (
      SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
             CAST(MAX(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT) AS c
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY c.c_nationkey
    ),
    sorted_c AS (
      SELECT nation, c,
             ROW_NUMBER() OVER (ORDER BY c, nation) AS rk,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM costs
    )"""


# Shapley: nano-cent-quantized increment terms, exact-integer prefix sum
def _shapley_cte() -> str:
    return f"""{_costs_cte()},
    incr AS (
      SELECT nation, c, rk, n,
             CAST(FLOOR(
               CAST(c - COALESCE(LAG(c) OVER (ORDER BY rk), 0) AS DOUBLE)
               / CAST(n - rk + 1 AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
               AS term_u
      FROM sorted_c
    ),
    shap AS (
      SELECT nation, c, rk, n,
             CAST(SUM(term_u) OVER (ORDER BY rk
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS phi_u
      FROM incr
    )"""


_Q962_SQL = f"""
    WITH {_shapley_cte()}
    SELECT nation, c AS standalone_cents, rk AS cost_rank,
           phi_u AS shapley_nanocents,
           CAST(phi_u AS DOUBLE) / 1000000000 AS shapley_cents
    FROM shap ORDER BY nation
    """


@query("q962_airport_shapley", oracle=_Q962_SQL)
def q962_airport_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Airport-game Shapley cost shares (Littlechild-Owen): each
    nation pays the prefix sum of cost increments split among all
    nations that need at least that much — the closed form that makes
    the 2^25 coalition sum a 25-row window. Terms nano-quantize
    BEFORE the prefix sum so the accumulation is exact-integer on
    both engines."""
    _views(spark, sf_dir)
    return spark.sql(_Q962_SQL)


_Q963_SQL = f"""
    WITH {_shapley_cte()},
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS sum_c, CAST(MAX(c) AS BIGINT) AS c_max
      FROM costs
    ),
    prop AS (
      SELECT /*+ BROADCAST(t) */ s.nation, s.c, s.phi_u,
             CAST(FLOOR(CAST(s.c AS DOUBLE) * t.c_max / t.sum_c
                        * 1000000000 + 0.5) AS BIGINT) AS prop_u
      FROM shap s CROSS JOIN tot t
    )
    SELECT nation,
           CAST(phi_u AS DOUBLE) / 1000000000 AS shapley_cents,
           CAST(prop_u AS DOUBLE) / 1000000000 AS proportional_cents,
           CAST(prop_u - phi_u AS BIGINT) AS overpay_nanocents,
           CAST(CASE WHEN prop_u > phi_u THEN 1 ELSE 0 END AS INT)
             AS prorata_overcharges
    FROM prop ORDER BY nation
    """


@query("q963_shapley_vs_prorata", oracle=_Q963_SQL)
def q963_shapley_vs_prorata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley vs proportional-to-standalone shares of the same joint
    cost (c_max): pro-rata ignores that large requirements should
    absorb the increments only they need, so small nations overpay
    under it — the per-nation divergence table a tenant-billing
    fairness review reads."""
    _views(spark, sf_dir)
    return spark.sql(_Q963_SQL)


# --- weighted voting over the 5 regions ------------------------------------

# 32 coalitions as a literal bit grid; region keys are 0..4 in TPC-H
_BITS = ",\n      ".join(
    f"({m}, {m & 1}, {(m >> 1) & 1}, {(m >> 2) & 1}, {(m >> 3) & 1}, {(m >> 4) & 1})"
    for m in range(32)
)


_WEIGHTS_VIEW = "costalloc_weights_mv"


def _weights_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE customer x nation aggregate -> checkpointed 5-row weights.

    The voting-power chain references `weights` ~8x (quota, five
    coalition joins, the swing scan, the final join), and Catalyst
    inlining re-ran the corpus aggregate per reference (160 Exchanges
    in q964's before plan; P3 pattern, guide §2.4)."""
    _views(spark, sf_dir)
    ensure_parallelism(
        load_table(spark, sf_dir, "nation")
    ).createOrReplaceTempView("nation")
    df = spark.sql(
        """
    SELECT CAST(n.n_regionkey AS BIGINT) AS region,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_regionkey
    """
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_WEIGHTS_VIEW)


def _power_cte(staged: bool = False) -> str:
    if staged:
        w = f"""weights AS (
      SELECT region, w FROM {_WEIGHTS_VIEW}
    ),"""
    else:
        w = """weights AS (
      SELECT CAST(n.n_regionkey AS BIGINT) AS region,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_regionkey
    ),"""
    return w + f"""
    quota AS (
      SELECT CAST(SUM(w) AS BIGINT) AS total,
             CAST(SUM(w) / 2 + 1 AS BIGINT) AS q
      FROM weights
    ),
    grid(m, b0, b1, b2, b3, b4) AS (VALUES {_BITS}),
    coalw AS (
      SELECT /*+ BROADCAST(w0) BROADCAST(w1) BROADCAST(w2) BROADCAST(w3)
                 BROADCAST(w4) */
             g.m, g.b0, g.b1, g.b2, g.b3, g.b4,
             CAST(g.b0 * w0.w + g.b1 * w1.w + g.b2 * w2.w
                + g.b3 * w3.w + g.b4 * w4.w AS BIGINT) AS cw,
             CAST(g.b0 + g.b1 + g.b2 + g.b3 + g.b4 AS BIGINT) AS sz
      FROM grid g
      JOIN weights w0 ON w0.region = 0
      JOIN weights w1 ON w1.region = 1
      JOIN weights w2 ON w2.region = 2
      JOIN weights w3 ON w3.region = 3
      JOIN weights w4 ON w4.region = 4
    ),
    -- a coalition NOT containing r is a swing for r iff it loses
    -- alone and wins with r's weight added
    swings AS (
      SELECT r.region,
             CAST(SUM(CASE WHEN c.cw < q.q AND c.cw + r.w >= q.q
                           THEN 1 ELSE 0 END) AS BIGINT) AS swing_count,
             CAST(SUM(CASE WHEN c.cw < q.q AND c.cw + r.w >= q.q
                           THEN CASE c.sz WHEN 0 THEN 24 WHEN 1 THEN 6
                                WHEN 2 THEN 4 WHEN 3 THEN 6 WHEN 4 THEN 24
                                ELSE 0 END
                           ELSE 0 END) AS BIGINT) AS ss_num_120
      FROM weights r
      CROSS JOIN quota q
      JOIN coalw c ON (CASE r.region WHEN 0 THEN c.b0 WHEN 1 THEN c.b1
                       WHEN 2 THEN c.b2 WHEN 3 THEN c.b3 ELSE c.b4 END) = 0
      GROUP BY r.region
    )"""


def _q964_sql(staged: bool = False) -> str:
    return f"""
    WITH {_power_cte(staged)},
    tot AS (SELECT CAST(SUM(swing_count) AS BIGINT) AS all_swings FROM swings)
    SELECT /*+ BROADCAST(t) */ s.region, w.w AS weight, s.swing_count,
           CAST(s.swing_count AS DOUBLE) / NULLIF(t.all_swings, 0)
             AS banzhaf_index
    FROM swings s
    JOIN weights w ON w.region = s.region
    CROSS JOIN tot t
    ORDER BY s.region
    """


_Q964_SQL = _q964_sql()


@query("q964_banzhaf_power", oracle=_Q964_SQL)
def q964_banzhaf_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized Banzhaf power index over the 5 regions under
    majority voting by customer weight: all 32 coalitions enumerated
    as a literal bit grid (bounded by the PLAYER count, never the
    data), swings counted as exact integers. Weight is famously NOT
    power — near-tied weights can hold zero swings."""
    _weights_view(spark, sf_dir)
    return spark.sql(_q964_sql(staged=True))


def _q965_sql(staged: bool = False) -> str:
    return f"""
    WITH {_power_cte(staged)}
    SELECT region, swing_count, ss_num_120,
           CAST(ss_num_120 AS DOUBLE) / 120 AS shapley_shubik_index
    FROM swings ORDER BY region
    """


_Q965_SQL = _q965_sql()


@query("q965_shapley_shubik", oracle=_Q965_SQL)
def q965_shapley_shubik(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shapley-Shubik power index: the same swing coalitions weighted
    by |S|!(4-|S|)!/5! — the probability the region is PIVOTAL in a
    uniformly random join order. Factorial weights are inlined
    literals over 120, so every index is an exact /120 rational
    emitted beside its double."""
    _weights_view(spark, sf_dir)
    return spark.sql(_q965_sql(staged=True))


_Q966_SQL = f"""
    WITH {_costs_cte()},
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS sum_c, CAST(MAX(c) AS BIGINT) AS c_max
      FROM costs
    ),
    -- binding coalitions of the airport game are the c-sorted
    -- prefixes; constraint: sum of prefix allocations <= prefix max.
    -- Proportional allocation x_i = c_i * c_max / sum_c compared via
    -- exact cross-products: sum_prefix(c) * c_max <= c_(j) * sum_c
    prefix AS (
      SELECT rk, nation, c,
             CAST(SUM(c) OVER (ORDER BY rk
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS pref_c
      FROM sorted_c
    )
    SELECT /*+ BROADCAST(t) */ p.rk AS prefix_rank, p.nation AS boundary_nation,
           p.c AS prefix_max_cents,
           CAST(p.c * t.sum_c - p.pref_c * t.c_max AS BIGINT)
             AS core_slack_cross,
           CAST(CASE WHEN p.pref_c * t.c_max <= p.c * t.sum_c
                THEN 1 ELSE 0 END AS INT) AS satisfied
    FROM prefix p CROSS JOIN tot t
    ORDER BY p.rk
    """


@query("q966_core_check_prorata", oracle=_Q966_SQL)
def q966_core_check_prorata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is the proportional allocation in the CORE of the airport
    game? The exponential constraint family collapses to the 25
    c-sorted prefix coalitions (the binding ones), each checked by an
    exact integer cross-product — violated rows are coalitions that
    would secede and self-fund. (The Shapley allocation is always in
    this core; pro-rata usually is not.)"""
    _views(spark, sf_dir)
    return spark.sql(_Q966_SQL)
