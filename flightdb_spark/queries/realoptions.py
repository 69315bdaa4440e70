"""Real-options batch 145 (q791-q795) — Cox-Ross-Rubinstein binomial
pricing of revenue options per brand, the valuation a strategy team
puts on "the option to expand" when monthly revenue is volatile.
A 12-step CRR lattice with zero rate prices European calls/puts on
each brand's latest monthly revenue under five volatility scenarios
(u = (100+g)/100, so the risk-neutral probability is EXACTLY
p = 100/(200+g)).

Everything lattice-shaped is precomputed in PYTHON as exact doubles
and inlined as e0 literals (q681 lesson): binomial weights
C(12,k) p^k (1-p)^(12-k) and node ratios u^(2k-12) — so neither
engine ever calls POWER/EXP (whose 1-ulp divergence is the q762
failure class). The SQL side only does: payoff = max(S0*ratio - K, 0)
per node, quantize to integer cents, and sum 13 BIGINT terms.

- q791 price table: European call and put per (brand, vol scenario),
  struck 5% out of the money;
- q792 put-call parity audit: C - P - (S0 - K) per row (zero rate)
  — bounded by the cent quantization, test-asserted;
- q793 delta by central difference: (C(1.01 S0) - C(0.99 S0)) /
  (0.02 S0), in [0, 1] for calls;
- q794 implied-scenario lookup: which grid volatility reprices a
  reference quote (the g=15 price) most closely — the implied-vol
  table lookup, exact integer-cent argmin;
- q795 value decomposition: intrinsic vs time value per row, time
  value nonnegative (test-asserted).

100 TB shape: one fact pass to the (brand, month) spine for S0
(latest-month revenue via a bounded month argmax join); the lattice
is a 13-row constant VALUES table crossed with 25 brands x 5
scenarios — all broadcast-sized. The corpus is touched exactly once.

Determinism: S0/K in exact integer cents; every per-node term is
FLOOR(x + 0.5)-quantized to WHOLE cents before the 13-term BIGINT
sum (at 1e8-cent magnitudes a nano quantizer would sit below the
double ulp — unit-cent is the right grain); coefficients are
identical inlined literals on both engines.
"""

from __future__ import annotations

from math import comb

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

T_STEPS = 12
G_GRID = [5, 10, 15, 20, 25]  # per-step up-move in percent
BASE_MONTH = 1995 * 12
K_FACTOR = "1.05e0"  # strike = 105% of S0 (5% OTM call)
REF_G = 15


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _lit(x: float) -> str:
    """Exact double literal that parses via strtod on BOTH engines: an
    exponent form (append e0 only when repr lacks one — q681 lesson)."""
    r = repr(x)
    return r if "e" in r else f"{r}e0"


def _lattice_rows() -> str:
    """(g, k, weight, ratio) rows as exact inlined double literals."""
    rows = []
    for g in G_GRID:
        u = (100 + g) / 100.0
        p = 100.0 / (200 + g)
        for k in range(T_STEPS + 1):
            w = comb(T_STEPS, k) * p**k * (1 - p) ** (T_STEPS - k)
            ratio = u ** (2 * k - T_STEPS)
            rows.append(
                f"({g}, {k}, CAST({_lit(w)} AS DOUBLE), "
                f"CAST({_lit(ratio)} AS DOUBLE))"
            )
    return ",\n      ".join(rows)


def _s0_cte() -> str:
    """Latest-month revenue cents per brand (bounded argmax join)."""
    return f"""rev AS (
      SELECT p.p_brand AS brand,
             (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
               - {BASE_MONTH}) AS m,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand,
               (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
                 - {BASE_MONTH})
    ),
    lastm AS (
      SELECT brand, MAX(m) AS mx FROM rev GROUP BY brand
    ),
    s0 AS (
      SELECT r.brand, r.cents AS s0_cents,
             CAST(FLOOR(r.cents * CAST({K_FACTOR} AS DOUBLE) + 0.5)
                  AS BIGINT) AS k_cents
      FROM rev r JOIN lastm l ON l.brand = r.brand AND l.mx = r.m
    )"""


def _priced_cte(spot: str = "s.s0_cents") -> str:
    """Per-(brand, g) call/put prices in integer cents from spot expr."""
    return f"""lattice(g, k, w, ratio) AS (VALUES
      {_lattice_rows()}
    ),
    nodes AS (
      SELECT /*+ BROADCAST(l) */ s.brand, l.g,
             CAST(FLOOR(l.w * GREATEST({spot} * l.ratio - s.k_cents,
                  CAST(0 AS DOUBLE)) + 0.5) AS BIGINT) AS call_term,
             CAST(FLOOR(l.w * GREATEST(s.k_cents - {spot} * l.ratio,
                  CAST(0 AS DOUBLE)) + 0.5) AS BIGINT) AS put_term
      FROM s0 s CROSS JOIN lattice l
    ),
    priced AS (
      SELECT brand, g,
             CAST(SUM(call_term) AS BIGINT) AS call_cents,
             CAST(SUM(put_term) AS BIGINT) AS put_cents
      FROM nodes GROUP BY brand, g
    )"""


# ---------------------------------------------------------------------------
# q791 — price table

_Q791_SQL = f"""
    WITH {_s0_cte()},
    {_priced_cte()}
    SELECT p.brand, CAST(p.g AS BIGINT) AS vol_pct_per_step,
           s.s0_cents, s.k_cents,
           p.call_cents, p.put_cents,
           CAST(p.call_cents AS DOUBLE) / s.s0_cents AS call_over_spot
    FROM priced p JOIN s0 s ON s.brand = p.brand
    ORDER BY p.brand, p.g
    """


@query("q791_crr_price_table", oracle=_Q791_SQL)
def q791_crr_price_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """European call/put prices on each brand's latest monthly revenue
    across five CRR volatility scenarios — lattice weights and node
    ratios inlined as exact Python-computed literals, payoffs
    cent-quantized, 13-term BIGINT sums. Prices increase in
    volatility (test-asserted)."""
    _views(spark, sf_dir)
    return spark.sql(_Q791_SQL)


# ---------------------------------------------------------------------------
# q792 — put-call parity

_Q792_SQL = f"""
    WITH {_s0_cte()},
    {_priced_cte()}
    SELECT p.brand, CAST(p.g AS BIGINT) AS vol_pct_per_step,
           CAST(p.call_cents - p.put_cents AS BIGINT) AS c_minus_p,
           CAST(s.s0_cents - s.k_cents AS BIGINT) AS s_minus_k,
           CAST(p.call_cents - p.put_cents
                - (s.s0_cents - s.k_cents) AS BIGINT) AS parity_residual
    FROM priced p JOIN s0 s ON s.brand = p.brand
    ORDER BY p.brand, p.g
    """


@query("q792_put_call_parity", oracle=_Q792_SQL)
def q792_put_call_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The no-arbitrage audit: with zero rate, C - P must equal
    S0 - K exactly up to the per-node cent quantization (|residual|
    <= 13 cents, test-asserted). Same lattice, both legs."""
    _views(spark, sf_dir)
    return spark.sql(_Q792_SQL)


# ---------------------------------------------------------------------------
# q793 — central-difference delta

_Q793_SQL = f"""
    WITH {_s0_cte()},
    {_priced_cte(spot="(s.s0_cents * CAST(1.01e0 AS DOUBLE))")},
    up AS (SELECT brand, g, call_cents FROM priced),
    {_priced_cte(spot="(s.s0_cents * CAST(0.99e0 AS DOUBLE))").replace(
        "lattice(", "lattice2(").replace("FROM s0 s CROSS JOIN lattice l",
        "FROM s0 s CROSS JOIN lattice2 l").replace(
        "nodes AS", "nodes2 AS").replace("FROM nodes", "FROM nodes2").replace(
        "priced AS", "priced2 AS")}
    SELECT u.brand, CAST(u.g AS BIGINT) AS vol_pct_per_step,
           (CAST(u.call_cents AS DOUBLE) - d.call_cents)
             / (CAST(0.02e0 AS DOUBLE) * s.s0_cents) AS call_delta
    FROM up u
    JOIN priced2 d ON d.brand = u.brand AND d.g = u.g
    JOIN s0 s ON s.brand = u.brand
    ORDER BY u.brand, u.g
    """


@query("q793_crr_delta", oracle=_Q793_SQL)
def q793_crr_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Call delta by central difference on the same lattice (reprice
    at 1.01 S0 and 0.99 S0): in [0, 1] for European calls
    (test-asserted). Two broadcast lattice crossings, no corpus
    rescan."""
    _views(spark, sf_dir)
    return spark.sql(_Q793_SQL)


# ---------------------------------------------------------------------------
# q794 — implied-scenario lookup

_Q794_SQL = f"""
    WITH {_s0_cte()},
    {_priced_cte()},
    quote AS (
      SELECT brand, call_cents AS quote_cents FROM priced WHERE g = {REF_G}
    ),
    diffs AS (
      SELECT p.brand, p.g,
             ABS(CAST(p.call_cents - q.quote_cents AS BIGINT)) AS adiff
      FROM priced p JOIN quote q ON q.brand = p.brand
    ),
    best AS (
      SELECT brand, MIN(adiff) AS mn FROM diffs GROUP BY brand
    )
    SELECT d.brand,
           CAST(MIN(d.g) AS BIGINT) AS implied_vol_pct,
           CAST(b.mn AS BIGINT) AS abs_repricing_error_cents
    FROM diffs d JOIN best b ON b.brand = d.brand AND b.mn = d.adiff
    GROUP BY d.brand, b.mn
    ORDER BY d.brand
    """


@query("q794_implied_scenario", oracle=_Q794_SQL)
def q794_implied_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The implied-volatility table lookup: which grid scenario
    reprices the g=15 reference quote with the smallest absolute
    integer-cent error (ties to the lowest vol — MIN over the argmin
    rows). Must recover g=15 exactly (test-asserted).

    r10 P3 staging: `priced` is referenced by quote AND diffs, and
    diffs by best AND the final argmin join — each re-running the
    corpus s0 aggregate + lattice crossing under Catalyst inlining
    (8 duplicate scans in the static plan). ONE corpus pass
    checkpoints the (brand x vol-grid)-bounded priced table; the
    downstream algebra re-reads the checkpoint only."""
    _views(spark, sf_dir)
    priced = spark.sql(
        f"WITH {_s0_cte()},\n    {_priced_cte()} "
        "SELECT brand, g, call_cents FROM priced"
    ).localCheckpoint(eager=True)
    priced.createOrReplaceTempView("realopt_priced_mv")
    return spark.sql(
        f"""
    WITH priced AS (SELECT brand, g, call_cents FROM realopt_priced_mv),
    quote AS (
      SELECT brand, call_cents AS quote_cents FROM priced WHERE g = {REF_G}
    ),
    diffs AS (
      SELECT /*+ BROADCAST(q) */ p.brand, p.g,
             ABS(CAST(p.call_cents - q.quote_cents AS BIGINT)) AS adiff
      FROM priced p JOIN quote q ON q.brand = p.brand
    ),
    best AS (
      SELECT brand, MIN(adiff) AS mn FROM diffs GROUP BY brand
    )
    SELECT /*+ BROADCAST(b) */ d.brand,
           CAST(MIN(d.g) AS BIGINT) AS implied_vol_pct,
           CAST(b.mn AS BIGINT) AS abs_repricing_error_cents
    FROM diffs d JOIN best b ON b.brand = d.brand AND b.mn = d.adiff
    GROUP BY d.brand, b.mn
    ORDER BY d.brand
    """
    )


# ---------------------------------------------------------------------------
# q795 — value decomposition

_Q795_SQL = f"""
    WITH {_s0_cte()},
    {_priced_cte()}
    SELECT p.brand, CAST(p.g AS BIGINT) AS vol_pct_per_step,
           CAST(GREATEST(s.s0_cents - s.k_cents, CAST(0 AS BIGINT))
                AS BIGINT) AS intrinsic_cents,
           CAST(p.call_cents - GREATEST(s.s0_cents - s.k_cents,
                CAST(0 AS BIGINT)) AS BIGINT) AS time_value_cents,
           CAST(p.call_cents - GREATEST(s.s0_cents - s.k_cents,
                CAST(0 AS BIGINT)) AS DOUBLE) / s.s0_cents
             AS time_value_over_spot
    FROM priced p JOIN s0 s ON s.brand = p.brand
    ORDER BY p.brand, p.g
    """


@query("q795_option_value_split", oracle=_Q795_SQL)
def q795_option_value_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each option's value split into intrinsic (max(S0-K, 0), zero
    here — 5% OTM strikes) and time value, which must be nonnegative
    and increasing in volatility (test-asserted)."""
    _views(spark, sf_dir)
    return spark.sql(_Q795_SQL)
