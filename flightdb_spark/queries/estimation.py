"""Estimation-sketch batch 77 (q451-q455) — the sketches a planner or
pipeline scheduler reads INSTEAD of scanning. Each query computes a
cheap estimate next to its exact ground truth, so the estimator's
error is itself an audited number (the q375/q422-q426 optimizer-stats
philosophy extended to the classic streaming sketches).

- q451 AMS (tug-of-war) F2: second frequency moment of
  events.user_id — the self-join size — from 16 signed-sum sketches
  (mean + median-of-16 estimators) vs exact SUM(c^2). Alon-Matias-
  Szegedy 1996.
- q452 weighted reservoir: deterministic priority sample (hash /
  weight, the A-ES shape with the hash standing in for -ln(u)) of 3
  orders per priority class — the weight-proportional pick a
  data-mixing stage makes at scale. Efraimidis-Spiliotis 2006.
- q453 HLL registers: an explicit 16-register HyperLogLog built from
  md5 nibbles — register index from the first 4 hex chars, leading-
  zero rank from the next 6 via string ops (no log2) — estimate vs
  exact NDV of orders.o_custkey. The cross-engine-checkable twin of
  q365's native sketch. Flajolet et al. 2007.
- q454 Count-Sketch heavy hitters: d=5 x w=256 signed counters over
  events.user_id; per-user median-of-5 estimate vs exact count for
  the top-10 users. Charikar-Chen-Farach-Colton 2002.
- q455 sampled join size: |orders JOIN lineitem| estimated from a
  1/16 KEY-DOMAIN hash sample of both sides, scaled up, vs the exact
  join count. Sampling the key domain (not rows) keeps the fanout
  unbiased — both sides keep or drop the same keys.

Determinism: every hash is an md5-derived integer; sketch sums are
BIGINT; the HLL 2^-M terms are exact doubles (powers of two — every
partial sum is exactly representable, so even the double SUM is
order-free); medians are order statistics over integers; terminal
divisions only (DETERMINISM.md rules 1, 2, 5, 7, 15).

100 TB shapes: every sketch is a map-side expression + a bounded
aggregate (16 / 16 / 1280 cells); the exact anchors (SUM(c^2), NDV,
join count) are one keyed shuffle each and exist only to grade the
estimators — at scale you run the sketch alone. The reference has no
sketch surface; this extends its report aggregates (report/report.go
histogram/funnel counters) with the estimators those counters need
at fleet scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

AMS_SKETCHES = 16
HLL_M = 16
HLL_ALPHA = 0.673  # standard alpha_16 (Flajolet et al. 2007, fig. 3)
CS_D = 5
CS_W = 256
CS_TOPK = 10
RESERVOIR_K = 3
JOIN_SAMPLE_INV = 16  # keep keys whose md5 starts with '0' = 1/16


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, name)).createOrReplaceTempView(name)


def _str_t(dialect: str) -> str:
    return "STRING" if dialect == "spark" else "VARCHAR"


def _hex16(dialect: str, str_expr: str) -> str:
    """First 16 bits of md5(str_expr) as BIGINT — identical on both engines.

    str_expr must already be a string-typed SQL expression.
    """
    if dialect == "spark":
        return f"CAST(conv(substring(md5({str_expr}), 1, 4), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({str_expr}), 1, 4))::BIGINT)"


def _salted(dialect: str, expr: str, salt_expr: str) -> str:
    """md5 input string: CAST(expr AS str) || '_' || salt_expr."""
    return f"CAST({expr} AS {_str_t(dialect)}) || '_' || {salt_expr}"


def _grid(dialect: str, n: int, col: str) -> str:
    lits = ", ".join(str(v) for v in range(n))
    if dialect == "spark":
        return f"(SELECT explode(array({lits})) AS {col})"
    return f"(SELECT unnest([{lits}]) AS {col})"


# ---------------------------------------------------------------------------
# q451 — AMS / tug-of-war F2 sketch


def _ams_sql(dialect: str) -> str:
    jstr = f"CAST(j.j AS {_str_t(dialect)})"
    sign = f"(1 - 2 * ({_hex16(dialect, _salted(dialect, 'c.user_id', jstr))} % 2))"
    mid_lo, mid_hi = AMS_SKETCHES // 2, AMS_SKETCHES // 2 + 1
    return f"""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    exact AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2 FROM counts),
    sketch AS (
      -- one signed sum per sketch row j; sign = parity of md5(user, j)
      SELECT j.j, CAST(SUM({sign} * c.c) AS BIGINT) AS x
      FROM {_grid(dialect, AMS_SKETCHES, "j")} j CROSS JOIN counts c
      GROUP BY j.j
    ),
    ests AS (
      SELECT x * x AS est,
             ROW_NUMBER() OVER (ORDER BY x * x, j) AS rn
      FROM sketch
    )
    SELECT e.f2 AS exact_f2,
           ROUND(CAST(SUM(s.est) AS DOUBLE) / {AMS_SKETCHES}, 2)
             AS ams_mean_est,
           ROUND(CAST(SUM(CASE WHEN s.rn IN ({mid_lo}, {mid_hi})
                               THEN s.est ELSE 0 END) AS DOUBLE) / 2, 2)
             AS ams_median_est,
           ROUND(ABS(CAST(SUM(s.est) AS DOUBLE) / {AMS_SKETCHES} - e.f2)
                 / e.f2, 6) AS mean_rel_error
    FROM ests s CROSS JOIN exact e
    GROUP BY e.f2
    """


@query("q451_ams_f2", oracle=_ams_sql("duck"))
def q451_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war estimate of F2 (self-join size) of events.user_id:
    16 independent +/-1 signed sums of the per-user counts, squared;
    mean and median-of-16 estimators next to the exact SUM(c^2). The
    sketch is what a planner consults before choosing a self-join
    strategy (skew: F2 >> n means heavy keys). Per-user counts are one
    shuffle; the sketch itself is a 16-cell aggregate over the
    vocab-sized count table. The rn window is bounded by the sketch
    count (16 rows), not the corpus (DETERMINISM.md rule 15)."""
    _view(spark, sf_dir, "events")
    return spark.sql(_ams_sql("spark"))


# ---------------------------------------------------------------------------
# q452 — deterministic weighted reservoir sample


def _reservoir_sql(dialect: str) -> str:
    h = _hex16(dialect, f"CAST(o_orderkey AS {_str_t(dialect)}) || '_w'")
    return f"""
    WITH keyed AS (
      -- priority = hash / weight: higher weight -> smaller key ->
      -- earlier pick. h and the 2-dp price cast exactly to DOUBLE, and
      -- IEEE division is exactly rounded, so the priority is
      -- bit-identical on any engine; ordering doubles is then total
      -- with the orderkey tie-break.
      SELECT o_orderpriority, o_orderkey,
             CAST({h} AS DOUBLE) / CAST(o_totalprice AS DOUBLE) AS pri
      FROM orders
    ),
    ranked AS (
      SELECT o_orderpriority, o_orderkey, pri,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY pri, o_orderkey) AS rn
      FROM keyed
    )
    SELECT o_orderpriority, rn AS pick, o_orderkey,
           CAST(FLOOR(pri * 1000000000) AS BIGINT) AS priority_e9
    FROM ranked WHERE rn <= {RESERVOIR_K}
    """


@query("q452_weighted_reservoir", oracle=_reservoir_sql("duck"))
def q452_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample: 3 orders per priority class with
    inclusion odds increasing in o_totalprice — priority key =
    md5-hash / weight (the Efraimidis-Spiliotis reservoir shape with
    the hash standing in for -ln(u), DETERMINISM.md rule 7: hashes,
    not RNG). One window shuffle on the 5-value priority class; at
    100 TB this is exactly how a mixing stage picks
    weight-proportional exemplars without a global sort. The key is
    exported as FLOOR(pri * 1e9) — an exact double multiply + floor —
    instead of ROUND (rule 16)."""
    _view(spark, sf_dir, "orders")
    return spark.sql(_reservoir_sql("spark"))


# ---------------------------------------------------------------------------
# q453 — explicit HyperLogLog registers


def _hll_sql(dialect: str) -> str:
    key = f"CAST(o_custkey AS {_str_t(dialect)}) || '_h'"
    idx = f"({_hex16(dialect, key)} % {HLL_M})"
    hex6 = f"substr(md5({key}), 5, 6)"
    shift = "shiftleft(CAST(1 AS BIGINT), r.m)" if dialect == "spark" else "(1::BIGINT << r.m)"
    est_num = repr(HLL_ALPHA * HLL_M * HLL_M)
    return f"""
    WITH hashed AS (
      SELECT {idx} AS idx,
             TRIM(LEADING '0' FROM {hex6}) AS rest
      FROM orders
    ),
    rho AS (
      -- leading-zero rank of the 24-bit suffix via string ops: each
      -- stripped hex char is 4 zero bits; the first surviving char
      -- adds 0-3 more. All-zero suffix -> rank 25 (the cap).
      SELECT idx,
             (6 - LENGTH(rest)) * 4
             + CASE WHEN substr(rest, 1, 1) = '1' THEN 3
                    WHEN substr(rest, 1, 1) IN ('2', '3') THEN 2
                    WHEN substr(rest, 1, 1) IN ('4', '5', '6', '7') THEN 1
                    ELSE 0 END + 1 AS r
      FROM hashed
    ),
    regs AS (
      -- full register domain: empty registers count as 2^0
      SELECT g.idx, COALESCE(MAX(rho.r), 0) AS m
      FROM {_grid(dialect, HLL_M, "idx")} g
      LEFT JOIN rho ON rho.idx = g.idx
      GROUP BY g.idx
    ),
    harm AS (
      -- 2^-m terms are exact doubles (powers of two); every partial
      -- sum is exactly representable, so this double SUM is order-free
      SELECT SUM(CAST(1 AS DOUBLE) / CAST({shift} AS DOUBLE)) AS sum_inv,
             CAST(COUNT(*) AS BIGINT) AS m_regs
      FROM regs r
    ),
    exact AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ndv FROM orders)
    SELECT h.m_regs AS m,
           e.ndv AS exact_ndv,
           ROUND({est_num} / h.sum_inv, 2) AS hll_estimate,
           ROUND(ABS({est_num} / h.sum_inv - e.ndv) / e.ndv, 6) AS rel_error
    FROM harm h CROSS JOIN exact e
    """


@query("q453_hll_registers", oracle=_hll_sql("duck"))
def q453_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit 16-register HyperLogLog over orders.o_custkey, built
    entirely from md5 string ops (register = first 4 hex chars mod 16;
    rank = leading zeros of the next 24 bits counted by stripping '0'
    hex chars — no runtime log2 anywhere, rule 5), next to the exact
    NDV. This is the cross-engine-checkable twin of q365's native
    hll_sketch_agg (rows-only): same estimator, every register value
    hash-verified against DuckDB. m=16 keeps the testdata NDV (150 at
    sf0.001) above the 2.5m small-range-correction threshold, so the
    raw estimator applies; std error 1.04/sqrt(16) = 26%. MAX per
    register is order-free; the 2^-M harmonic terms are exact doubles.
    At 100 TB: registers aggregate map-side to 16 cells — the NDV scan
    this replaces is the expensive thing."""
    _view(spark, sf_dir, "orders")
    return spark.sql(_hll_sql("spark"))


# ---------------------------------------------------------------------------
# q454 — Count-Sketch heavy-hitter estimates


def _cs_sql(dialect: str) -> str:
    jstr = f"CAST(j.j AS {_str_t(dialect)})"

    # salt 'b' for the bucket hash, 'g' for the sign hash
    def b_expr(user: str) -> str:
        s = f"CAST({user} AS {_str_t(dialect)}) || '_b_' || {jstr}"
        return f"({_hex16(dialect, s)} % {CS_W})"

    def g_expr(user: str) -> str:
        s = f"CAST({user} AS {_str_t(dialect)}) || '_g_' || {jstr}"
        return f"(1 - 2 * ({_hex16(dialect, s)} % 2))"

    mid = CS_D // 2 + 1
    return f"""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id
    ),
    cells AS (
      -- d x w signed counters, built from the vocab-sized count table
      SELECT j.j, {b_expr("c.user_id")} AS bucket,
             CAST(SUM({g_expr("c.user_id")} * c.c) AS BIGINT) AS s
      FROM {_grid(dialect, CS_D, "j")} j CROSS JOIN counts c
      GROUP BY j.j, {b_expr("c.user_id")}
    ),
    top AS (
      SELECT user_id, c,
             ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS rn
      FROM counts
    ),
    cand AS (SELECT user_id, c FROM top WHERE rn <= {CS_TOPK}),
    est_rows AS (
      SELECT cand.user_id, cand.c, j.j,
             {g_expr("cand.user_id")} * cells.s AS est_j
      FROM cand
      CROSS JOIN {_grid(dialect, CS_D, "j")} j
      JOIN cells ON cells.j = j.j AND cells.bucket = {b_expr("cand.user_id")}
    ),
    med AS (
      SELECT user_id, c, est_j,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY est_j, j) AS rn
      FROM est_rows
    )
    SELECT user_id, c AS exact_count,
           CAST(est_j AS BIGINT) AS cs_estimate,
           CAST(ABS(est_j - c) AS BIGINT) AS abs_error
    FROM med WHERE rn = {mid}
    """


@query("q454_countsketch_heavy", oracle=_cs_sql("duck"))
def q454_countsketch_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Sketch (signed CountMin — the q348 sketch with +/-1 signs
    that cancel collision bias) over events.user_id: d=5 rows x w=256
    buckets; each of the top-10 users gets a median-of-5 estimate next
    to its exact count. All counters are BIGINT; the median is an
    order statistic (rn = 3 of 5 integer estimates). The top-k window
    runs over the user-count table — vocab-bounded, rule 15. At
    100 TB the cells CTE is a 1,280-cell aggregate computed map-side;
    the exact counts exist only to grade it."""
    _view(spark, sf_dir, "events")
    return spark.sql(_cs_sql("spark"))


# ---------------------------------------------------------------------------
# q455 — join size from a key-domain hash sample


def _joinsize_sql(dialect: str) -> str:
    def keep(col: str) -> str:
        return f"substr(md5(CAST({col} AS {_str_t(dialect)})), 1, 1) = '0'"

    return f"""
    WITH exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ),
    so AS (SELECT o_orderkey FROM orders WHERE {keep("o_orderkey")}),
    sl AS (SELECT l_orderkey FROM lineitem WHERE {keep("l_orderkey")}),
    samp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM so JOIN sl ON so.o_orderkey = sl.l_orderkey
    )
    SELECT e.n AS exact_rows,
           s.n * {JOIN_SAMPLE_INV} AS estimated_rows,
           ROUND(ABS(CAST(s.n * {JOIN_SAMPLE_INV} AS DOUBLE) - e.n) / e.n, 6)
             AS rel_error
    FROM exact e CROSS JOIN samp s
    """


@query("q455_sampled_join_size", oracle=_joinsize_sql("duck"))
def q455_sampled_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimate from a 1/16 KEY-DOMAIN sample: both
    sides keep exactly the keys whose md5 starts with '0' (the same
    hash on the same join key, so sampled-join = full join restricted
    to sampled keys and the scaled count is unbiased — row-level
    sampling would square the inclusion probability and bias the
    fanout). Complements q375's NDV-formula estimate with the
    sampling estimator an AQE-style runtime would actually run: the
    sample join touches ~1/16 of each side, map-side filterable at
    the scan. Exact join count is the anchor."""
    _view(spark, sf_dir, "orders")
    _view(spark, sf_dir, "lineitem")
    return spark.sql(_joinsize_sql("spark"))
