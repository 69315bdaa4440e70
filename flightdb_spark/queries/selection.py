"""Selection-inference batch 156 (q846-q850) — the winner's-curse /
regression-to-the-mean audits a leaderboard owner runs before
believing period-one champions: split the shipping window in half,
compare each brand's first-half standing with its second-half
reality, in exact integer arithmetic (revenue quantized to $100
units so every cross-brand moment product stays below 2^53).

- q846 rank stability: exact Kendall tau-a between the half-one and
  half-two brand revenue rankings (300 cross-multiplied sign tests);
- q847 winner's curse census: the half-one top-5's mean rank in
  half one vs half two — the drop IS the curse;
- q848 the regression-to-the-mean slope: OLS of demeaned half-two
  revenue on demeaned half-one revenue across brands (< 1 means
  extremes regress);
- q849 shrinkage forecast comparison: predict half two by raw half
  one, by the grand mean, and by the RTM-slope shrinkage — in-sample
  SSE of the shrinkage fit can never exceed either baseline
  (test-asserted, it IS the OLS fit);
- q850 repeat-champion census: top-k overlap between the two halves
  for k = 1, 3, 5, 10.

100 TB shape: one fact pass to the 50-cell (brand, half) table;
everything else is bounded 25-row arithmetic (rank joins with
broadcast hints, integer moments).

Determinism: halves split by exact day arithmetic (dialect
datediff); revenue quantized to $100 BIGINT units; ranks and tau by
integer cross-multiplication with brand-name ties; slopes/SSEs from
exact BIGINT moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

TOPKS = [1, 3, 5, 10]


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _days(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _halves_cte(dialect: str) -> str:
    """(brand, h1_units, h2_units) in exact $100 units."""
    return f"""bounds AS (
      SELECT CAST(MIN(l_shipdate) AS DATE) AS d0,
             CAST(MAX(l_shipdate) AS DATE) AS d1
      FROM lineitem
    ),
    lab AS (
      SELECT p.p_brand AS b,
             CASE WHEN 2 * {_days(dialect, 'bo.d0', 'l.l_shipdate')}
                       <= {_days(dialect, 'bo.d0', 'bo.d1')}
                  THEN 1 ELSE 2 END AS half,
             CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      CROSS JOIN bounds bo
    ),
    halves AS (
      SELECT b,
             CAST(FLOOR(SUM(CASE WHEN half = 1 THEN cents ELSE 0 END)
                  / 10000.0) AS BIGINT) AS v1,
             CAST(FLOOR(SUM(CASE WHEN half = 2 THEN cents ELSE 0 END)
                  / 10000.0) AS BIGINT) AS v2
      FROM lab GROUP BY b
    )"""


# --- Spark-side staging (oracle strings keep the single-statement CTE
# form) ----------------------------------------------------------------------
#
# r10 P3 staging: `halves` (the brand-bounded half-revenue table) is
# referenced 2-4x per query (both rank-join sides in q847/q850, both
# pair sides in q846, fit + errs in q849) and each reference re-ran
# the lineitem x part corpus join under Catalyst inlining (8 duplicate
# scans in q847/q850's static plans). ONE corpus pass checkpoints it.

_HALVES_MV = "selection_halves_mv"


def _halves_view(spark: SparkSession, sf_dir: str) -> None:
    _views(spark, sf_dir)
    df = spark.sql(
        f"WITH {_halves_cte('spark')} SELECT b, v1, v2 FROM halves"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_HALVES_MV)


def _staged(full_sql: str) -> str:
    head = f"WITH {_halves_cte('spark')},"
    assert head in full_sql, "selection: halves head drifted"
    return full_sql.replace(
        head,
        f"WITH halves AS (SELECT b, v1, v2 FROM {_HALVES_MV}),",
        1,
    )


# ---------------------------------------------------------------------------
# q846 — rank stability

def _q846_sql(dialect: str) -> str:
    return f"""
    WITH {_halves_cte(dialect)},
    pairs AS (
      SELECT /*+ BROADCAST(z) */
        CASE WHEN SIGN(x.v1 - z.v1) * SIGN(x.v2 - z.v2) > 0
             THEN 1 ELSE 0 END AS concordant,
        CASE WHEN SIGN(x.v1 - z.v1) * SIGN(x.v2 - z.v2) < 0
             THEN 1 ELSE 0 END AS discordant
      FROM halves x JOIN halves z ON x.b < z.b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(concordant) AS BIGINT) AS concordant,
           CAST(SUM(discordant) AS BIGINT) AS discordant,
           CAST(SUM(concordant) - SUM(discordant) AS DOUBLE) / COUNT(*)
             AS kendall_tau_a
    FROM pairs
    """


@query("q846_rank_stability", oracle=_q846_sql("duckdb"))
def q846_rank_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a between the half-one and half-two brand revenue
    rankings — 300 integer sign tests, ties counted as neither. High
    tau means leaderboards persist; low tau means they're noise."""
    _halves_view(spark, sf_dir)
    return spark.sql(_staged(_q846_sql("spark")))


# ---------------------------------------------------------------------------
# q847 — winner's curse census

def _q847_sql(dialect: str) -> str:
    return f"""
    WITH {_halves_cte(dialect)},
    r1 AS (
      SELECT /*+ BROADCAST(z) */ x.b,
             CAST(1 + SUM(CASE WHEN z.v1 > x.v1
                          OR (z.v1 = x.v1 AND z.b < x.b)
                          THEN 1 ELSE 0 END) AS BIGINT) AS rk1
      FROM halves x JOIN halves z ON z.b <> x.b
      GROUP BY x.b, x.v1
    ),
    r2 AS (
      SELECT /*+ BROADCAST(z) */ x.b,
             CAST(1 + SUM(CASE WHEN z.v2 > x.v2
                          OR (z.v2 = x.v2 AND z.b < x.b)
                          THEN 1 ELSE 0 END) AS BIGINT) AS rk2
      FROM halves x JOIN halves z ON z.b <> x.b
      GROUP BY x.b, x.v2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_winners,
           CAST(SUM(r1.rk1) AS DOUBLE) / COUNT(*) AS mean_rank_h1,
           CAST(SUM(r2.rk2) AS DOUBLE) / COUNT(*) AS mean_rank_h2,
           CAST(SUM(r2.rk2 - r1.rk1) AS DOUBLE) / COUNT(*)
             AS mean_rank_drop
    FROM r1 JOIN r2 ON r2.b = r1.b
    WHERE r1.rk1 <= 5
    """


@query("q847_winners_curse", oracle=_q847_sql("duckdb"))
def q847_winners_curse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The half-one top-5's average rank in each half: selection
    guarantees mean_rank_h1 = 3; any positive mean_rank_drop is the
    winner's curse made visible. Exact integer ranks with name
    ties."""
    _halves_view(spark, sf_dir)
    return spark.sql(_staged(_q847_sql("spark")))


# ---------------------------------------------------------------------------
# q848 — regression-to-the-mean slope

def _mom_cte(dialect: str) -> str:
    return f"""{_halves_cte(dialect)},
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v1) AS BIGINT) AS s1,
             CAST(SUM(v2) AS BIGINT) AS s2,
             CAST(SUM(v1 * v1) AS BIGINT) AS s11,
             CAST(SUM(v1 * v2) AS BIGINT) AS s12,
             CAST(SUM(v2 * v2) AS BIGINT) AS s22
      FROM halves
    )"""


def _q848_sql(dialect: str) -> str:
    return f"""
    WITH {_mom_cte(dialect)}
    SELECT n AS n_brands,
           (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)
             / (CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
             AS rtm_slope,
           (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)
             / SQRT((CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
                    * (CAST(n AS DOUBLE) * s22 - CAST(s2 AS DOUBLE) * s2))
             AS half_correlation
    FROM mom
    """


@query("q848_rtm_slope", oracle=_q848_sql("duckdb"))
def q848_rtm_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The regression-to-the-mean slope of half-two revenue on
    half-one revenue across brands, with the half-to-half
    correlation. Slope = correlation x sd ratio; under equal
    variances a slope below 1 IS the correlation — extremes regress
    by exactly that factor."""
    _views(spark, sf_dir)
    return spark.sql(_q848_sql("spark"))


# ---------------------------------------------------------------------------
# q849 — shrinkage forecast comparison

def _q849_sql(dialect: str) -> str:
    return f"""
    WITH {_mom_cte(dialect)},
    fit AS (
      SELECT n, s1, s2,
             (CAST(n AS DOUBLE) * s12 - CAST(s1 AS DOUBLE) * s2)
               / (CAST(n AS DOUBLE) * s11 - CAST(s1 AS DOUBLE) * s1)
               AS lam
      FROM mom
    ),
    errs AS (
      SELECT h.b,
             CAST(h.v2 - h.v1 AS BIGINT) AS e_raw,
             CAST(FLOOR(CAST(h.v2 AS DOUBLE)
                  - CAST(f.s2 AS DOUBLE) / f.n + 0.5) AS BIGINT) AS e_mean,
             CAST(FLOOR(CAST(h.v2 AS DOUBLE)
                  - (CAST(f.s2 AS DOUBLE) / f.n
                     + f.lam * (h.v1 - CAST(f.s1 AS DOUBLE) / f.n)) + 0.5)
                  AS BIGINT) AS e_shrunk
      FROM halves h CROSS JOIN fit f
    )
    SELECT CAST(SUM(e_raw * e_raw) AS BIGINT) AS sse_raw,
           CAST(SUM(e_mean * e_mean) AS BIGINT) AS sse_grand_mean,
           CAST(SUM(e_shrunk * e_shrunk) AS BIGINT) AS sse_shrunk
    FROM errs
    """


@query("q849_shrinkage_forecast", oracle=_q849_sql("duckdb"))
def q849_shrinkage_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predict half two three ways: raw half one, the grand mean, and
    the RTM-slope shrinkage toward the mean. The shrinkage fit is the
    in-sample OLS, so its SSE can exceed neither baseline
    (test-asserted up to the unit quantization)."""
    _halves_view(spark, sf_dir)
    return spark.sql(_staged(_q849_sql("spark")))


# ---------------------------------------------------------------------------
# q850 — repeat-champion census

def _q850_sql(dialect: str) -> str:
    ks = ", ".join(f"({k})" for k in TOPKS)
    return f"""
    WITH {_halves_cte(dialect)},
    r1 AS (
      SELECT /*+ BROADCAST(z) */ x.b,
             CAST(1 + SUM(CASE WHEN z.v1 > x.v1
                          OR (z.v1 = x.v1 AND z.b < x.b)
                          THEN 1 ELSE 0 END) AS BIGINT) AS rk1
      FROM halves x JOIN halves z ON z.b <> x.b
      GROUP BY x.b, x.v1
    ),
    r2 AS (
      SELECT /*+ BROADCAST(z) */ x.b,
             CAST(1 + SUM(CASE WHEN z.v2 > x.v2
                          OR (z.v2 = x.v2 AND z.b < x.b)
                          THEN 1 ELSE 0 END) AS BIGINT) AS rk2
      FROM halves x JOIN halves z ON z.b <> x.b
      GROUP BY x.b, x.v2
    ),
    ks(k) AS (VALUES {ks})
    SELECT /*+ BROADCAST(ks) */ ks.k AS top_k,
           CAST(SUM(CASE WHEN r1.rk1 <= ks.k AND r2.rk2 <= ks.k
                    THEN 1 ELSE 0 END) AS BIGINT) AS overlap,
           CAST(SUM(CASE WHEN r1.rk1 <= ks.k AND r2.rk2 <= ks.k
                    THEN 1 ELSE 0 END) AS DOUBLE) / ks.k AS overlap_share
    FROM r1 JOIN r2 ON r2.b = r1.b CROSS JOIN ks
    GROUP BY ks.k
    ORDER BY ks.k
    """


@query("q850_repeat_champions", oracle=_q850_sql("duckdb"))
def q850_repeat_champions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many half-one top-k brands stay top-k in half two, for
    k = 1, 3, 5, 10 — the persistence table behind 'is the
    leaderboard real'. Exact integer ranks."""
    _halves_view(spark, sf_dir)
    return spark.sql(_staged(_q850_sql("spark")))
