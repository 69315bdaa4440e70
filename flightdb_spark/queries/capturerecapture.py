"""Capture-recapture batch 159 (q861-q865) — population-size
estimation from overlapping observation windows, the ecology
machinery a growth team reuses to ask "how many customers exist,
counting the ones we never saw": treat each half of the event window
as a capture occasion (a user is 'marked' if seen).

- q861 Lincoln-Petersen and the bias-corrected Chapman estimator of
  the total user population from the two halves, with the exact
  capture/recapture counts;
- q862 the Schnabel multi-occasion estimator over six equal windows
  (sum of catch x previously-marked over total recaptures);
- q863 per-event-type populations: which behaviors reach the most
  of the (estimated) population;
- q864 window-length sensitivity: the Chapman estimate at 1/2, 1/3,
  and 1/6 occasion widths — stability is the closure diagnostic;
- q865 closure-violation census: users seen ONLY early vs ONLY late
  (apparent 'deaths'/'births') whose imbalance breaks the closed-
  population assumption the estimators need.

100 TB shape: every quantity is a conditional-count aggregate over
the events table keyed by user (one shuffle to per-user occupancy
bitmaps via conditional MAX, then bounded arithmetic). No joins
beyond broadcast scalars.

Determinism: occasions are integer micro-timestamp arithmetic
(unix_micros/epoch_us dialect, exact span fractions); all captures
are integer counts; estimators are terminal exact-ratio doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

N_OCC = 6


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _occ_cte(dialect: str, n_occ: int, alias: str = "occ") -> str:
    """Per-user occupancy flags over n_occ equal time windows."""
    flags = ",\n             ".join(
        f"CAST(MAX(CASE WHEN slot = {k} THEN 1 ELSE 0 END) AS BIGINT) AS o{k}"
        for k in range(n_occ)
    )
    return f"""span_{alias} AS (
      SELECT CAST(MIN({_us(dialect)}) AS BIGINT) AS t0,
             CAST(MAX({_us(dialect)}) - MIN({_us(dialect)}) + 1 AS BIGINT)
               AS w
      FROM events
    ),
    slotted_{alias} AS (
      SELECT /*+ BROADCAST(s) */ e.user_id AS u,
             CAST(LEAST(CAST(FLOOR((CAST({_us(dialect)} AS BIGINT) - s.t0)
                  * {n_occ} / CAST(s.w AS DOUBLE)) AS BIGINT),
                  {n_occ - 1}) AS BIGINT) AS slot
      FROM events e CROSS JOIN span_{alias} s
    ),
    {alias} AS (
      SELECT u, {flags}
      FROM slotted_{alias} GROUP BY u
    )"""


# ---------------------------------------------------------------------------
# q861 — Lincoln-Petersen / Chapman

def _q861_sql(dialect: str) -> str:
    return f"""
    WITH {_occ_cte(dialect, 2)}
    SELECT CAST(SUM(o0) AS BIGINT) AS n_marked_h1,
           CAST(SUM(o1) AS BIGINT) AS n_caught_h2,
           CAST(SUM(o0 * o1) AS BIGINT) AS n_recaptured,
           CAST(COUNT(*) AS BIGINT) AS n_observed_total,
           CAST(SUM(o0) AS DOUBLE) * SUM(o1) / SUM(o0 * o1)
             AS lincoln_petersen,
           (CAST(SUM(o0) AS DOUBLE) + 1) * (SUM(o1) + 1)
             / (SUM(o0 * o1) + 1) - 1 AS chapman
    FROM occ
    """


@query("q861_lincoln_petersen", oracle=_q861_sql("duckdb"))
def q861_lincoln_petersen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-occasion population estimate: mark in half one,
    recapture in half two — Lincoln-Petersen M*C/R and the
    bias-corrected Chapman form, beside the directly observed user
    count (the estimate should be >= it when capture is incomplete)."""
    _views(spark, sf_dir)
    return spark.sql(_q861_sql("spark"))


# ---------------------------------------------------------------------------
# q862 — Schnabel multi-occasion

def _q862_sql(dialect: str) -> str:
    # marked before occasion k = seen in any earlier occasion
    terms_num = []
    terms_den = []
    for k in range(1, N_OCC):
        prev = " + ".join(f"o{j}" for j in range(k))
        terms_num.append(
            f"SUM(CAST(o{k} AS BIGINT)"
            f" * (SELECT CAST(SUM(CASE WHEN {prev} > 0 THEN 1 ELSE 0 END)"
            f" AS BIGINT) FROM occ))"
        )
        terms_den.append(
            f"SUM(CASE WHEN o{k} = 1 AND ({prev}) > 0 THEN 1 ELSE 0 END)"
        )
    return f"""
    WITH {_occ_cte(dialect, N_OCC)}
    SELECT CAST({" + ".join(terms_den)} AS BIGINT) AS total_recaptures,
           CAST({" + ".join(terms_num)} AS DOUBLE)
             / ({" + ".join(terms_den)}) AS schnabel_estimate,
           CAST(COUNT(*) AS BIGINT) AS n_observed_total
    FROM occ
    """


def _q862_spark_sql() -> str:
    """One-aggregate Schnabel (r9): the oracle's five marked-before
    scalar subqueries each re-expanded occ -> slotted -> events under
    CTE inlining (12 events scans, 102 Exchanges). But every term is
    an aggregate over the SAME occupancy table, and SUM(o_k * M_k) ==
    SUM(o_k) * M_k exactly for the scalar M_k, so one pass computes
    catches c_k, marked-before m_k and recaptures r_k, and the
    estimator is scalar arithmetic over that single row."""
    cols, num, den = [], [], []
    for k in range(1, N_OCC):
        prev = " + ".join(f"o{j}" for j in range(k))
        cols.append(f"CAST(SUM(o{k}) AS BIGINT) AS c{k}")
        cols.append(
            f"CAST(SUM(CASE WHEN {prev} > 0 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS m{k}"
        )
        cols.append(
            f"CAST(SUM(CASE WHEN o{k} = 1 AND ({prev}) > 0 THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS r{k}"
        )
        num.append(f"c{k} * m{k}")
        den.append(f"r{k}")
    cols_sql = ",\n             ".join(cols)
    return f"""
    WITH {_occ_cte("spark", N_OCC)},
    agg AS (
      SELECT {cols_sql},
             CAST(COUNT(*) AS BIGINT) AS n
      FROM occ
    )
    SELECT CAST({" + ".join(den)} AS BIGINT) AS total_recaptures,
           CAST({" + ".join(num)} AS DOUBLE)
             / ({" + ".join(den)}) AS schnabel_estimate,
           n AS n_observed_total
    FROM agg
    """


@query("q862_schnabel", oracle=_q862_sql("duckdb"))
def q862_schnabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Schnabel multi-occasion estimator over six windows:
    sum_k(catch_k x marked-before_k) / total recaptures — pools all
    the pairwise information Lincoln-Petersen throws away. Spark runs
    it as ONE aggregate over the occupancy table (catch_k times the
    scalar marked-before_k factors out of the row-level sum exactly);
    the oracle keeps the scalar-subquery form."""
    _views(spark, sf_dir)
    return spark.sql(_q862_spark_sql())


# ---------------------------------------------------------------------------
# q863 — per-event-type populations

def _q863_sql(dialect: str) -> str:
    return f"""
    WITH span2 AS (
      SELECT CAST(MIN({_us(dialect)}) AS BIGINT) AS t0,
             CAST(MAX({_us(dialect)}) - MIN({_us(dialect)}) + 1 AS BIGINT)
               AS w
      FROM events
    ),
    occ2 AS (
      SELECT /*+ BROADCAST(s) */ e.event_type AS et, e.user_id AS u,
             CAST(MAX(CASE WHEN 2 * (CAST({_us(dialect)} AS BIGINT) - s.t0)
                      < s.w THEN 1 ELSE 0 END) AS BIGINT) AS o0,
             CAST(MAX(CASE WHEN 2 * (CAST({_us(dialect)} AS BIGINT) - s.t0)
                      >= s.w THEN 1 ELSE 0 END) AS BIGINT) AS o1
      FROM events e CROSS JOIN span2 s
      GROUP BY e.event_type, e.user_id
    )
    SELECT et AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_observed,
           CAST(SUM(o0 * o1) AS BIGINT) AS n_recaptured,
           (CAST(SUM(o0) AS DOUBLE) + 1) * (SUM(o1) + 1)
             / (SUM(o0 * o1) + 1) - 1 AS chapman_population
    FROM occ2
    GROUP BY et
    ORDER BY et
    """


@query("q863_population_by_type", oracle=_q863_sql("duckdb"))
def q863_population_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chapman population estimates per event type (who would EVER do
    this, not just who we saw) — each type's capture halves computed
    in the same per-(type,user) aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_q863_sql("spark"))


# ---------------------------------------------------------------------------
# q864 — window-length sensitivity

def _chapman_pair(n_occ: int, alias: str) -> str:
    """Chapman estimate from the FIRST TWO of n_occ windows."""
    return f"""SELECT CAST({n_occ} AS BIGINT) AS n_windows,
           (CAST(SUM(o0) AS DOUBLE) + 1) * (SUM(o1) + 1)
             / (SUM(o0 * o1) + 1) - 1 AS chapman_estimate,
           CAST(SUM(o0 * o1) AS BIGINT) AS n_recaptured
    FROM {alias}
    WHERE o0 + o1 > 0"""


def _q864_sql(dialect: str) -> str:
    return f"""
    WITH {_occ_cte(dialect, 2, "occ2w")},
    {_occ_cte(dialect, 3, "occ3w")},
    {_occ_cte(dialect, 6, "occ6w")}
    {_chapman_pair(2, "occ2w")}
    UNION ALL
    {_chapman_pair(3, "occ3w")}
    UNION ALL
    {_chapman_pair(6, "occ6w")}
    ORDER BY n_windows
    """


@query("q864_window_sensitivity", oracle=_q864_sql("duckdb"))
def q864_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Chapman estimate from the first two occasions at three
    window widths (halves, thirds, sixths): shorter windows catch
    less, so the estimate should stay stable ONLY if capture is
    roughly uniform — drift across rows is the assumption check."""
    _views(spark, sf_dir)
    return spark.sql(_q864_sql("spark"))


# ---------------------------------------------------------------------------
# q865 — closure-violation census

def _q865_sql(dialect: str) -> str:
    return f"""
    WITH {_occ_cte(dialect, 2)}
    SELECT CAST(SUM(CASE WHEN o0 = 1 AND o1 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS only_early,
           CAST(SUM(CASE WHEN o0 = 0 AND o1 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS only_late,
           CAST(SUM(o0 * o1) AS BIGINT) AS both_halves,
           CAST(SUM(CASE WHEN o0 = 1 AND o1 = 0 THEN 1 ELSE 0 END)
                - SUM(CASE WHEN o0 = 0 AND o1 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS net_attrition,
           CAST(ABS(SUM(CASE WHEN o0 = 1 AND o1 = 0 THEN 1 ELSE 0 END)
                - SUM(CASE WHEN o0 = 0 AND o1 = 1 THEN 1 ELSE 0 END))
                AS DOUBLE) / COUNT(*) AS closure_violation_share
    FROM occ
    """


@query("q865_closure_audit", oracle=_q865_sql("duckdb"))
def q865_closure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The closed-population assumption audited: users seen only
    early (apparent deaths) vs only late (apparent births) and the
    net imbalance — large asymmetry biases every estimator in the
    batch, so it ships beside them."""
    _views(spark, sf_dir)
    return spark.sql(_q865_sql("spark"))
