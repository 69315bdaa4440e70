"""Optimizer-statistics batch 71 (q422-q426) — the stats subsystem
around q375/q376's cardinality audits; everything a cost-based planner
(or a data profiler feeding one) derives from the data itself:

- q422 equi-depth histogram selectivity: build a 10-bucket histogram
  on o_totalprice from exact decile cutpoints, estimate a range
  predicate's selectivity by bucket interpolation, compare to actual
  — the estimator inside every CBO's range-predicate costing;
- q423 sample-based NDV estimation: Chao1 (d + f1^2/(2 f2)) and the
  first-order jackknife from a deterministic 10% hash sample vs the
  true distinct count — the estimator ANALYZE runs when a full scan
  is too expensive;
- q424 runtime-filter benefit audit: for a dim-filtered join, the
  fact rows a pushed semi-join filter would skip vs the full scan —
  the number that justifies Bloom/DPP runtime filters;
- q425 approximate functional dependencies: violation rate of A -> B
  per column pair (share of A-groups with >1 B value, and the row
  mass under non-modal B) — TANE-lite data profiling that feeds both
  planners and data-quality rules;
- q426 Cramér's V association matrix: chi-square-normalized
  association for the categorical column pairs of orders — the
  correlated-columns detection that tells a planner its independence
  assumption (q376) will lie.

Determinism: cutpoints/selectivities are exact integer counts with
terminal divisions; Chao1/jackknife are closed forms on exact
frequency-of-frequency counts; chi-square accumulates 9-dp DECIMAL
cell terms.

100 TB shapes: single-pass aggregates to bounded tables (buckets,
frequency-of-frequencies, column-pair contingency cells); the
histogram build uses one exact-percentile aggregate broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

HIST_BUCKETS = 10
RANGE_LO = 50_000.0
RANGE_HI = 150_000.0
SAMPLE_MOD = 10  # 10% hash sample


def _orders_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "orders")).createOrReplaceTempView(
        "orders"
    )


def _li_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "lineitem")
    ).createOrReplaceTempView("lineitem")


# ---------------------------------------------------------------------------
# q422 — equi-depth histogram selectivity


def _hist_sql(dialect: str) -> str:
    qs = ", ".join(str(i / HIST_BUCKETS) for i in range(1, HIST_BUCKETS))
    # binning compares 6-dp-rounded cutpoints to 6-dp-rounded values:
    # the two engines' exact-percentile interpolation can differ in the
    # last bits, which must not flip a row across a bucket edge
    if dialect == "spark":
        cuts = f"percentile(o_totalprice, array({qs}))"
        nbelow = (
            "size(filter(cs, c -> round(c, 6) < round(o_totalprice, 6)))"
        )
    else:
        cuts = f"quantile_cont(o_totalprice, [{qs}])"
        nbelow = (
            "len(list_filter(cs, c -> round(c, 6) < round(o_totalprice, 6)))"
        )
    return f"""
    WITH cuts AS (SELECT {cuts} AS cs FROM orders),
    binned AS (
      SELECT o_totalprice, {nbelow} AS bucket FROM orders CROSS JOIN cuts
    ),
    hist AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_b,
             MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
      FROM binned GROUP BY bucket
    ),
    tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM hist),
    -- estimated rows in [RANGE_LO, RANGE_HI]: full buckets inside the
    -- range + linear interpolation of the two partial buckets
    est AS (
      SELECT CAST(SUM(CASE
               WHEN lo >= {RANGE_LO} AND hi <= {RANGE_HI} THEN CAST(n_b AS DOUBLE)
               WHEN hi < {RANGE_LO} OR lo > {RANGE_HI} THEN 0.0
               ELSE n_b * (LEAST(hi, {RANGE_HI}) - GREATEST(lo, {RANGE_LO}))
                    / NULLIF(hi - lo, 0)
             END) AS DOUBLE) AS est_rows
      FROM hist
    ),
    act AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS actual_rows FROM orders
      WHERE o_totalprice BETWEEN {RANGE_LO} AND {RANGE_HI}
    )
    SELECT t.n AS n_rows,
           ROUND(e.est_rows, 2) AS estimated_rows,
           a.actual_rows,
           ROUND(e.est_rows / t.n, 6) AS est_selectivity,
           ROUND(CAST(a.actual_rows AS DOUBLE) / t.n, 6) AS actual_selectivity,
           ROUND(GREATEST(e.est_rows / a.actual_rows,
                          a.actual_rows / e.est_rows), 4) AS q_error
    FROM est e CROSS JOIN act a CROSS JOIN tot t
    """


@query("q422_histogram_selectivity", oracle=_hist_sql("duck"))
def q422_histogram_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram range-selectivity estimation: a 10-bucket
    histogram from EXACT decile cutpoints (one percentile aggregate
    broadcast back — both engines' exact linear-interpolation
    percentile agrees on identical input doubles), a range predicate
    estimated by whole-buckets-plus-linear-interpolation (the textbook
    CBO formula), and the q-error against the true count — how good a
    10-bucket histogram actually is on this column. One corpus
    aggregate + one filtered count."""
    _orders_view(spark, sf_dir)
    return spark.sql(_hist_sql("spark"))


# ---------------------------------------------------------------------------
# q423 — sample-based NDV estimation


def _ndv_sql(dialect: str) -> str:
    h = (
        "CAST(conv(substring(md5(CAST(o_custkey AS STRING) || '_nv'), 1, 4), 16, 10) AS BIGINT)"
        if dialect == "spark"
        else "(('0x' || substr(md5(CAST(o_custkey AS VARCHAR) || '_nv'), 1, 4))::BIGINT)"
    )
    return f"""
    WITH sample_ AS (
      SELECT o_custkey FROM orders WHERE ({h}) % {SAMPLE_MOD} = 0
    ),
    freq AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS f
      FROM sample_ GROUP BY o_custkey
    ),
    fof AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
             CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
             CAST(SUM(f) AS BIGINT) AS n_s
      FROM freq
    ),
    truth AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS true_ndv
      FROM orders
    )
    SELECT f.d AS sample_ndv, f.f1, f.f2, f.n_s AS sample_rows,
           t.true_ndv,
           -- Chao1: d + f1^2 / (2 f2)  (bias-corrected form when f2=0)
           ROUND(f.d + CASE WHEN f.f2 > 0
                            THEN CAST(f.f1 AS DOUBLE) * f.f1 / (2.0 * f.f2)
                            ELSE CAST(f.f1 AS DOUBLE) * (f.f1 - 1) / 2.0
                       END, 2) AS chao1_ndv,
           -- first-order jackknife: d + f1 * (n-1)/n
           ROUND(f.d + CAST(f.f1 AS DOUBLE) * (f.n_s - 1) / f.n_s, 2)
             AS jackknife_ndv
    FROM fof f CROSS JOIN truth t
    """


@query("q423_sample_ndv", oracle=_ndv_sql("duck"))
def q423_sample_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-based distinct-count estimation: from a deterministic 10%
    hash sample of orders' customer keys, the Chao1 estimator
    (d + f1^2/2f2 on the frequency-of-frequency counts) and the
    first-order jackknife, against the true NDV — the ANALYZE-on-a-
    sample estimators a planner falls back to when a full distinct
    scan is too expensive (q231's KMV sketches the full stream; this
    estimates from a sample). Exact integer f-of-f counts; closed
    forms."""
    _orders_view(spark, sf_dir)
    return spark.sql(_ndv_sql("spark"))


# ---------------------------------------------------------------------------
# q424 — runtime-filter benefit audit


def _rtf_sql(dialect: str) -> str:
    return """
    WITH dim AS (
      SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    counts AS (
      SELECT
        CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS fact_rows,
        CAST((SELECT COUNT(*) FROM lineitem l
              WHERE l.l_orderkey IN (SELECT o_orderkey FROM dim))
          AS BIGINT) AS surviving_rows,
        CAST((SELECT COUNT(*) FROM dim) AS BIGINT) AS dim_rows,
        CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS dim_total
    )
    SELECT fact_rows, surviving_rows, dim_rows, dim_total,
           ROUND(CAST(surviving_rows AS DOUBLE) / fact_rows, 6)
             AS survival_rate,
           ROUND(1.0 - CAST(surviving_rows AS DOUBLE) / fact_rows, 6)
             AS skippable_fraction
    FROM counts
    """


@query("q424_runtime_filter_audit", oracle=_rtf_sql("duck"))
def q424_runtime_filter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter benefit audit: for the URGENT-orders join, the
    fraction of fact-side rows a pushed semi-join filter (Bloom /
    dynamic partition pruning) would skip before the join — the
    number that decides whether building the filter pays. The Spark
    side IS the semi-join (left_semi against the broadcast dim —
    exactly the plan a runtime filter produces); integer counts, one
    division. ~80% skippable here (asserted), the classic
    selective-dim case."""
    _orders_view(spark, sf_dir)
    _li_view(spark, sf_dir)
    return spark.sql(_rtf_sql("spark"))


# ---------------------------------------------------------------------------
# q425 — approximate functional dependencies


def _fd_sql(dialect: str) -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    WITH pairs AS (
      SELECT 'o_custkey->o_orderstatus' AS fd,
             CAST(o_custkey AS {str_t}) AS a,
             o_orderstatus AS b FROM orders
      UNION ALL
      SELECT 'o_orderpriority->o_orderstatus', o_orderpriority,
             o_orderstatus FROM orders
      UNION ALL
      SELECT 'o_orderkey->o_orderpriority', CAST(o_orderkey AS {str_t}),
             o_orderpriority FROM orders
    ),
    groups_ AS (
      SELECT fd, a,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS n_b,
             CAST(SUM(cnt) AS BIGINT) AS m,
             CAST(MAX(cnt) AS BIGINT) AS modal
      FROM (
        SELECT fd, a, b, COUNT(*) AS cnt FROM pairs GROUP BY fd, a, b
      ) t GROUP BY fd, a
    )
    SELECT fd,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n_b > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS violating_groups,
           ROUND(CAST(SUM(CASE WHEN n_b > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS group_violation_rate,
           -- g3 error: min rows to delete to make the FD exact
           ROUND(CAST(SUM(m - modal) AS DOUBLE) / SUM(m), 6) AS g3_error
    FROM groups_ GROUP BY fd ORDER BY fd
    """


@query("q425_functional_dependencies", oracle=_fd_sql("duck"))
def q425_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate functional-dependency profiling (TANE's g3 measure):
    for candidate FDs A -> B, the share of A-groups carrying more than
    one B value and the g3 error (the minimum row fraction whose
    deletion makes the FD exact — computed as non-modal mass). The
    orderkey -> priority FD is exact by construction (keys are unique;
    asserted 0), the others genuinely approximate — the profile a
    schema-discovery or planner-constraint pass reads. One (fd, a, b)
    aggregate, integer counting."""
    _orders_view(spark, sf_dir)
    return spark.sql(_fd_sql("spark"))


# ---------------------------------------------------------------------------
# q426 — Cramér's V association matrix


def _cramer_sql(dialect: str) -> str:
    return """
    WITH pairs AS (
      SELECT 'status_x_priority' AS pair, o_orderstatus AS a,
             o_orderpriority AS b FROM orders
    ),
    cells AS (
      SELECT pair, a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
      FROM pairs GROUP BY pair, a, b
    ),
    ma AS (SELECT pair, a, CAST(SUM(n_ab) AS BIGINT) AS n_a FROM cells
           GROUP BY pair, a),
    mb AS (SELECT pair, b, CAST(SUM(n_ab) AS BIGINT) AS n_b FROM cells
           GROUP BY pair, b),
    tot AS (SELECT pair, CAST(SUM(n_ab) AS BIGINT) AS n FROM cells
            GROUP BY pair),
    chi AS (
      SELECT c.pair,
             SUM(CAST(ROUND(
               POWER(c.n_ab - CAST(ma.n_a AS DOUBLE) * mb.n_b / t.n, 2)
               / (CAST(ma.n_a AS DOUBLE) * mb.n_b / t.n), 9)
               AS DECIMAL(38,9))) AS chi2,
             MAX(t.n) AS n,
             CAST(COUNT(DISTINCT c.a) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT c.b) AS BIGINT) AS k
      FROM cells c
      JOIN ma ON ma.pair = c.pair AND ma.a = c.a
      JOIN mb ON mb.pair = c.pair AND mb.b = c.b
      JOIN tot t ON t.pair = c.pair
      GROUP BY c.pair
    )
    SELECT pair, n, r AS card_a, k AS card_b,
           ROUND(CAST(chi2 AS DOUBLE), 6) AS chi2,
           ROUND(SQRT(CAST(chi2 AS DOUBLE)
                      / (n * (LEAST(r, k) - 1))), 6) AS cramers_v
    FROM chi ORDER BY pair
    """


@query("q426_cramers_v", oracle=_cramer_sql("duck"))
def q426_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V column association: chi-square over the
    (status, priority) contingency table normalized to [0, 1] —
    the correlated-columns statistic that tells a planner exactly when
    q376's independence multiplication will misestimate (V near 0
    here: the synthetic columns are independent, and the audit proves
    it rather than assumes it). Contingency cells are one integer
    aggregate; chi-square terms accumulate 9-dp DECIMAL; only-observed
    cells contribute (zero cells add zero)."""
    _orders_view(spark, sf_dir)
    return spark.sql(_cramer_sql("spark"))
