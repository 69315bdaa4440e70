"""L-moments batch 160 (q866-q870) — EXACT distributed L-moments per
event type, the robust alternative to classical skew/kurtosis that
hydrologists fit distributions with (Hosking 1990). L-moments are
linear in ORDER STATISTICS, which normally means a global sort; here
they are computed exactly with NO sort at all:

probability-weighted moments decompose over the discrete value
support — for a value v occupying ranks (lo, hi] the hockey-stick
identity gives sum_{i=lo+1..hi} C(i-1, k) = C(hi, k+1) - C(lo, k+1),
so b_k = sum_v x_v (ff_{k+1}(hi_v) - ff_{k+1}(lo_v))
         / ((k+1) * n * ff_k(n-1))
with ff_j the falling factorial (= j! C(., j), the j! cancels).
Rank ranges come from the two-level bucket cumulative (the q807
machinery): a 96-bucket cumulative plus in-bucket prefixes, both
bounded by the VALUE DOMAIN, never by row count.

- q866 the support census per type (n, distinct values, buckets,
  heaviest rank block);
- q867 the PWM table b0..b3 (display-rounded — the DECIMAL>2^53 to
  double cast is the q679 one-ulp class);
- q868 L-moments lambda1..lambda4 with lambda1 checked against the
  directly-computed mean;
- q869 the L-ratio table: L-CV, L-skewness tau3, L-kurtosis tau4;
- q870 L-ratio-diagram classification: nearest reference
  distribution (uniform / normal / exponential) in (tau3, tau4)
  space, reference points inlined as exact literals.

100 TB shape: one aggregate to the (type, value) support (domain-
bounded, <= 49k cells); cumulative ranks via bucket-level (<= 96^2)
and in-bucket (<= 512 wide) inequality joins; everything after is
per-support-cell arithmetic. The classical path would sort the
corpus; this one never does.

Determinism: ranks/counts exact integers; falling factorials in
DECIMAL(24,0) operands (int128 path on DuckDB — the q245 widening
lesson) summed in DECIMAL(38,0); terminal b_k/lambda/tau values are
display-rounded doubles (q679 half-window rule over the >2^53
casts)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

WIDTH = 512  # cents per rank bucket


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _ff(expr: str, j: int) -> str:
    """Falling factorial expr*(expr-1)*...*(expr-j+1) in DECIMAL(24,0)
    operands (exact int128 multiplication on both engines)."""
    if j == 0:
        return "CAST(1 AS DECIMAL(24,0))"
    factors = [f"CAST(({expr}) - {i} AS DECIMAL(24,0))" for i in range(j)]
    return "(" + " * ".join(factors) + ")"


def _ranks_cte() -> str:
    """Per-(type, value) rank intervals (lo, hi] via two-level cums."""
    return f"""vals AS (
      SELECT event_type AS et,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
             CAST(FLOOR(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  / {WIDTH}.0) AS BIGINT) AS bkt,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT),
             CAST(FLOOR(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  / {WIDTH}.0) AS BIGINT)
    ),
    bsum AS (
      SELECT et, bkt, CAST(SUM(cnt) AS BIGINT) AS bc
      FROM vals GROUP BY et, bkt
    ),
    bbase AS (
      SELECT /*+ BROADCAST(b2) */ b.et, b.bkt,
             CAST(COALESCE(SUM(b2.bc), 0) AS BIGINT) AS base
      FROM bsum b LEFT JOIN bsum b2 ON b2.et = b.et AND b2.bkt < b.bkt
      GROUP BY b.et, b.bkt
    ),
    ranks AS (
      SELECT /*+ BROADCAST(v2) */ x.et, x.v, x.cnt,
             CAST(bb.base + COALESCE(SUM(CASE WHEN v2.v < x.v
                  THEN v2.cnt ELSE 0 END), 0) AS BIGINT) AS lo,
             CAST(bb.base + COALESCE(SUM(CASE WHEN v2.v < x.v
                  THEN v2.cnt ELSE 0 END), 0) + x.cnt AS BIGINT) AS hi
      FROM vals x
      JOIN bbase bb ON bb.et = x.et AND bb.bkt = x.bkt
      LEFT JOIN vals v2 ON v2.et = x.et AND v2.bkt = x.bkt AND v2.v < x.v
      GROUP BY x.et, x.v, x.cnt, bb.base
    ),
    totals AS (
      SELECT et, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(SUM(v * cnt) AS BIGINT) AS sv
      FROM vals GROUP BY et
    )"""


def _pwm_cte() -> str:
    """b0..b3 per type — exact DECIMAL numerators, terminal doubles."""
    nums = ",\n             ".join(
        f"CAST(SUM(CAST(r.v AS DECIMAL(24,0)) * ({_ff('r.hi', k + 1)}"
        f" - {_ff('r.lo', k + 1)})) AS DECIMAL(38,0)) AS num{k}"
        for k in range(4)
    )
    bs = ",\n             ".join(
        f"CAST(p.num{k} AS DOUBLE) / ({k + 1} * t.n"
        f" * CAST({_ff('t.n - 1', k)} AS DOUBLE)) AS b{k}"
        for k in range(4)
    )
    return f"""{_ranks_cte()},
    pwm_num AS (
      SELECT r.et,
             {nums}
      FROM ranks r GROUP BY r.et
    ),
    pwm AS (
      SELECT p.et, t.n, t.sv,
             {bs}
      FROM pwm_num p JOIN totals t ON t.et = p.et
    )"""


def _lmom_exprs() -> dict[str, str]:
    return {
        "l1": "b0",
        "l2": "2 * b1 - b0",
        "l3": "6 * b2 - 6 * b1 + b0",
        "l4": "20 * b3 - 30 * b2 + 12 * b1 - b0",
    }


# ---------------------------------------------------------------------------
# q866 — support census

_Q866_SQL = f"""
    WITH {_ranks_cte()}
    SELECT r.et AS event_type,
           t.n AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_values,
           CAST(COUNT(DISTINCT CAST(FLOOR(r.v / {WIDTH}.0) AS BIGINT))
                AS BIGINT) AS n_buckets,
           CAST(MAX(r.cnt) AS BIGINT) AS heaviest_block,
           CAST(MAX(r.hi) AS BIGINT) AS max_rank
    FROM ranks r JOIN totals t ON t.et = r.et
    GROUP BY r.et, t.n
    ORDER BY r.et
    """


@query("q866_rank_support_census", oracle=_Q866_SQL)
def q866_rank_support_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-interval structure behind the sort-free L-moments:
    per type, rows vs distinct support values vs buckets, and the
    sanity max_rank == n_rows (test-asserted)."""
    _views(spark, sf_dir)
    return spark.sql(_Q866_SQL)


# ---------------------------------------------------------------------------
# q867 — PWM table

_Q867_SQL = f"""
    WITH {_pwm_cte()}
    SELECT et AS event_type, n AS n_rows,
           0.0 + ROUND(b0, 6) AS b0,
           0.0 + ROUND(b1, 6) AS b1,
           0.0 + ROUND(b2, 6) AS b2,
           0.0 + ROUND(b3, 6) AS b3
    FROM pwm
    ORDER BY et
    """


@query("q867_pwm_table", oracle=_Q867_SQL)
def q867_pwm_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-weighted moments b0..b3 per type via the
    hockey-stick block decomposition — exact DECIMAL numerators over
    the value support, one terminal division each, display-rounded
    at 6dp (the >2^53 cast ulp)."""
    _views(spark, sf_dir)
    return spark.sql(_Q867_SQL)


# ---------------------------------------------------------------------------
# q868 — L-moments

_LM = _lmom_exprs()

_Q868_SQL = f"""
    WITH {_pwm_cte()}
    SELECT et AS event_type,
           0.0 + ROUND({_LM['l1']}, 6) AS lambda1,
           0.0 + ROUND({_LM['l2']}, 6) AS lambda2,
           0.0 + ROUND({_LM['l3']}, 6) AS lambda3,
           0.0 + ROUND({_LM['l4']}, 6) AS lambda4,
           0.0 + ROUND(CAST(sv AS DOUBLE) / n, 6) AS direct_mean
    FROM pwm
    ORDER BY et
    """


@query("q868_l_moments", oracle=_Q868_SQL)
def q868_l_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first four L-moments per type (Hosking's linear
    combinations of the PWMs), with lambda1 checked against the
    directly computed mean — they must agree (test-asserted), which
    validates the whole rank-interval machinery end to end."""
    _views(spark, sf_dir)
    return spark.sql(_Q868_SQL)


# ---------------------------------------------------------------------------
# q869 — L-ratios

_Q869_SQL = f"""
    WITH {_pwm_cte()}
    SELECT et AS event_type,
           0.0 + ROUND(({_LM['l2']}) / ({_LM['l1']}), 9) AS l_cv,
           0.0 + ROUND(({_LM['l3']}) / ({_LM['l2']}), 9) AS tau3_l_skew,
           0.0 + ROUND(({_LM['l4']}) / ({_LM['l2']}), 9) AS tau4_l_kurt
    FROM pwm
    ORDER BY et
    """


@query("q869_l_ratios", oracle=_Q869_SQL)
def q869_l_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-free L-ratio table: L-CV (lambda2/lambda1, in (0,1)
    for positive data), L-skewness and L-kurtosis (both in (-1,1),
    tau4 >= (5 tau3^2 - 1)/4 — the feasibility bound the test
    asserts). The robust shape summary classical moments can't give
    on heavy tails."""
    _views(spark, sf_dir)
    return spark.sql(_Q869_SQL)


# ---------------------------------------------------------------------------
# q870 — L-ratio diagram classification

# (tau3, tau4) reference points: uniform, normal, exponential
_REFS = [
    ("uniform", 0.0, 0.0),
    ("normal", 0.0, 0.1226),
    ("exponential", 1.0 / 3.0, 1.0 / 6.0),
]


def _lit(x: float) -> str:
    r = repr(x)
    return r if "e" in r else f"{r}e0"


_REF_ROWS = ",\n      ".join(
    f"('{name}', CAST({_lit(t3)} AS DOUBLE), CAST({_lit(t4)} AS DOUBLE))"
    for name, t3, t4 in _REFS
)

_Q870_SQL = f"""
    WITH {_pwm_cte()},
    ratios AS (
      SELECT et,
             0.0 + ROUND(({_LM['l3']}) / ({_LM['l2']}), 9) AS t3,
             0.0 + ROUND(({_LM['l4']}) / ({_LM['l2']}), 9) AS t4
      FROM pwm
    ),
    refs(dist, r3, r4) AS (VALUES
      {_REF_ROWS}
    ),
    dists AS (
      SELECT /*+ BROADCAST(f) */ r.et, f.dist,
             0.0 + ROUND(SQRT((r.t3 - f.r3) * (r.t3 - f.r3)
                  + (r.t4 - f.r4) * (r.t4 - f.r4)), 9) AS d
      FROM ratios r CROSS JOIN refs f
    ),
    best AS (
      SELECT et, MIN(d) AS dmin FROM dists GROUP BY et
    )
    SELECT d.et AS event_type,
           MIN(d.dist) AS nearest_distribution,
           b.dmin AS distance
    FROM dists d JOIN best b ON b.et = d.et AND b.dmin = d.d
    GROUP BY d.et, b.dmin
    ORDER BY d.et
    """


@query("q870_l_ratio_diagram", oracle=_Q870_SQL)
def q870_l_ratio_diagram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each type's position on the L-moment-ratio diagram classified
    to the nearest reference distribution (uniform / normal /
    exponential points inlined as exact literals; ties broken by
    name via MIN over the argmin rows) — the distribution-fitting
    shortcut L-moments were invented for.

    r10 P3 staging: `dists` is referenced twice (the per-type MIN and
    the argmin join) and each reference re-ran the PWM corpus
    aggregate under Catalyst inlining (10 duplicate events scans in
    the static plan). ONE corpus pass checkpoints the 15-row
    (type x reference) distance table; the oracle keeps the
    one-statement form."""
    _views(spark, sf_dir)
    marker = ",\n    best AS ("
    head, sep, _ = _Q870_SQL.partition(marker)
    assert sep, "q870: dists CTE marker drifted"
    dists = spark.sql(
        head + "\n    SELECT et, dist, d FROM dists"
    ).localCheckpoint(eager=True)
    dists.createOrReplaceTempView("lmom_dists_mv")
    return spark.sql(
        """
    WITH dists AS (SELECT et, dist, d FROM lmom_dists_mv),
    best AS (
      SELECT et, MIN(d) AS dmin FROM dists GROUP BY et
    )
    SELECT d.et AS event_type,
           MIN(d.dist) AS nearest_distribution,
           b.dmin AS distance
    FROM dists d JOIN best b ON b.et = d.et AND b.dmin = d.d
    GROUP BY d.et, b.dmin
    ORDER BY d.et
    """
    )
