"""Scorecard batch 110 (q616-q620) — the credit-risk / classifier
evaluation toolkit on PLANTED exact-rational scores: every event row
gets score k = first-5-hex(md5) in [0, 2^20) and label
y = 1 iff j < k for an independent second hash j — so
P(y=1 | score k) = k/2^20 exactly, and every metric below reduces to
integer arithmetic on (bin, n, n_pos) tables:

- q616 WoE / IV: weight-of-evidence per 64 equal-width score bins
  (Laplace +1 smoothing keeps the odds rational; ln under the 9 dp /
  DECIMAL contract) with information-value terms;
- q617 AUC / Somers' D from the binned histogram: 2*P*N*AUC =
  sum_b pos_b * (2*cum_neg_below + neg_b), an EXACT integer
  (tie-bins handled by the midpoint term), cumulative via a 64-row
  triangle join — no window;
- q618 KS separation: argmax over bins of |cum_pos*N - cum_neg*P|
  (exact integer compare), TakeOrdered 1;
- q619 gains/lift deciles: capture rate and lift per score decile
  (decile = (k*10) div 2^20, exact);
- q620 calibration + Brier: per-bin predicted-vs-observed rates and
  the Brier score from sum (k - y*2^20)^2 in DECIMAL(38,0) — the
  2^40-scaled exact form.

100 TB shape: ONE aggregate collapses the corpus to 64 bins (or 10
deciles); everything after runs on that bounded table via triangle
joins and TakeOrdered — no global window, no allowlist entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

DENOM = 1 << 20
N_BINS = 64
BIN_W = DENOM // N_BINS


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _h20(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 5), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, 5))::BIGINT)"


def _idiv(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def _scored_cte(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    k = _h20(dialect, f"concat('s:', CAST(event_id AS {s}))")
    j = _h20(dialect, f"concat('l:', CAST(event_id AS {s}))")
    return f"""scored AS (
      SELECT {k} AS k,
             CASE WHEN {j} < {k} THEN 1 ELSE 0 END AS y
      FROM events
    )"""


def _bins_cte(dialect: str) -> str:
    return f"""{_scored_cte(dialect)},
    bins AS (
      SELECT {_idiv(dialect, 'k', str(BIN_W))} AS b,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM scored GROUP BY {_idiv(dialect, 'k', str(BIN_W))}
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn,
             CAST(SUM(n_pos) AS BIGINT) AS p,
             CAST(SUM(n - n_pos) AS BIGINT) AS q
      FROM bins
    )"""


# ---------------------------------------------------------------------------
# q616 — WoE / IV


def _woe_sql(dialect: str) -> str:
    return f"""
    WITH {_bins_cte(dialect)}
    SELECT b.b AS score_bin, b.n, b.n_pos,
           -- Laplace-smoothed odds keep the ratio rational and nonzero;
           -- single terms: 9 dp intermediate, DOUBLE out (q602 lesson)
           ROUND(ROUND(
             ln((CAST(b.n_pos AS DOUBLE) + 1) / (t.p + {N_BINS})
                / ((CAST(b.n - b.n_pos AS DOUBLE) + 1) / (t.q + {N_BINS}))),
             9), 5) AS woe,
           ROUND(ROUND(
             ((CAST(b.n_pos AS DOUBLE) + 1) / (t.p + {N_BINS})
              - (CAST(b.n - b.n_pos AS DOUBLE) + 1) / (t.q + {N_BINS}))
             * ln((CAST(b.n_pos AS DOUBLE) + 1) / (t.p + {N_BINS})
                  / ((CAST(b.n - b.n_pos AS DOUBLE) + 1) / (t.q + {N_BINS}))),
             9), 6) AS iv_term
    FROM bins b CROSS JOIN tot t
    ORDER BY score_bin
    """


@query("q616_woe_iv", oracle=_woe_sql("duck"))
def q616_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight of evidence and information-value terms per score bin —
    the scorecard binning table. Laplace +1 smoothing keeps every
    odds ratio finite and rational; ln terms follow the 9 dp/DECIMAL
    contract. One corpus aggregate to 64 bins, then bounded-table
    expressions only."""
    _views(spark, sf_dir)
    return spark.sql(_woe_sql("spark"))


# ---------------------------------------------------------------------------
# q617 — AUC / Somers' D


def _auc_sql(dialect: str) -> str:
    return f"""
    WITH {_bins_cte(dialect)},
    cumneg AS (
      SELECT a.b, a.n_pos, a.n - a.n_pos AS n_neg,
             CAST(COALESCE(SUM(CASE WHEN c.b < a.b
                                    THEN c.n - c.n_pos END), 0) AS BIGINT)
               AS neg_below
      FROM bins a LEFT JOIN bins c ON c.b < a.b
      GROUP BY a.b, a.n_pos, a.n
    ),
    num AS (
      SELECT CAST(SUM(n_pos * (2 * neg_below + n_neg)) AS BIGINT) AS auc2
      FROM cumneg
    )
    SELECT t.p AS n_pos, t.q AS n_neg,
           ROUND(CAST(n.auc2 AS DOUBLE) / (2.0 * t.p * t.q), 6) AS auc,
           ROUND(CAST(n.auc2 AS DOUBLE) / (CAST(t.p AS DOUBLE) * t.q) - 1.0, 6)
             AS somers_d
    FROM num n CROSS JOIN tot t
    """


@query("q617_auc_somers", oracle=_auc_sql("duck"))
def q617_auc_somers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC and Somers' D from the binned score histogram: 2*P*N*AUC =
    sum_b pos_b*(2*cum_neg_below + neg_b) — an exact integer with the
    tie-bin midpoint built in. The cumulative is a 64-row triangle
    join (4k pairs), the corpus is touched once."""
    _views(spark, sf_dir)
    return spark.sql(_auc_sql("spark"))


# ---------------------------------------------------------------------------
# q618 — KS separation


def _ks_sql(dialect: str) -> str:
    return f"""
    WITH {_bins_cte(dialect)},
    cums AS (
      SELECT a.b,
             CAST(SUM(CASE WHEN c.b <= a.b THEN c.n_pos ELSE 0 END) AS BIGINT)
               AS cum_pos,
             CAST(SUM(CASE WHEN c.b <= a.b THEN c.n - c.n_pos ELSE 0 END)
                  AS BIGINT) AS cum_neg
      FROM bins a CROSS JOIN bins c
      GROUP BY a.b
    )
    SELECT c.b AS ks_bin,
           c.cum_pos, c.cum_neg,
           ROUND(ABS(CAST(c.cum_pos AS DOUBLE) / t.p
                     - CAST(c.cum_neg AS DOUBLE) / t.q), 6) AS ks_stat
    FROM cums c CROSS JOIN tot t
    ORDER BY ABS(c.cum_pos * t.q - c.cum_neg * t.p) DESC, c.b
    LIMIT 1
    """


@query("q618_ks_separation", oracle=_ks_sql("duck"))
def q618_ks_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KS separation statistic: the bin maximizing
    |cum_pos/P - cum_neg/N|, selected by the EXACT integer order key
    |cum_pos*N - cum_neg*P| (TakeOrdered 1 — never a double compare).
    Cumulatives via the bounded 64x64 bin cross join."""
    _views(spark, sf_dir)
    return spark.sql(_ks_sql("spark"))


# ---------------------------------------------------------------------------
# q619 — gains / lift deciles


def _gains_sql(dialect: str) -> str:
    dec = _idiv(dialect, "k * 10", str(DENOM))
    return f"""
    WITH {_scored_cte(dialect)},
    decs AS (
      SELECT {dec} AS dec,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM scored GROUP BY {dec}
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(n_pos) AS BIGINT) AS p
      FROM decs
    ),
    cums AS (
      SELECT a.dec,
             CAST(SUM(CASE WHEN c.dec >= a.dec THEN c.n_pos ELSE 0 END)
                  AS BIGINT) AS cap_pos,
             CAST(SUM(CASE WHEN c.dec >= a.dec THEN c.n ELSE 0 END) AS BIGINT)
               AS cap_n
      FROM decs a CROSS JOIN decs c
      GROUP BY a.dec
    )
    SELECT c.dec AS score_decile,
           c.cap_n AS targeted, c.cap_pos AS captured_pos,
           ROUND(CAST(c.cap_pos AS DOUBLE) / t.p, 6) AS capture_rate,
           ROUND(CAST(c.cap_pos AS DOUBLE) * t.nn
                 / (CAST(c.cap_n AS DOUBLE) * t.p), 6) AS lift
    FROM cums c CROSS JOIN tot t
    ORDER BY score_decile DESC
    """


@query("q619_gains_lift", oracle=_gains_sql("duck"))
def q619_gains_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gains/lift table: targeting everyone at-or-above each score
    decile, the positive capture rate and lift vs random. Decile =
    (k*10) div 2^20, exact; cumulatives from the 10x10 decile cross
    join; lifts are terminal divisions of exact integers."""
    _views(spark, sf_dir)
    return spark.sql(_gains_sql("spark"))


# ---------------------------------------------------------------------------
# q620 — calibration + Brier


def _brier_sql(dialect: str) -> str:
    return f"""
    WITH {_scored_cte(dialect)},
    bins AS (
      SELECT {_idiv(dialect, 'k', str(BIN_W))} AS b,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(SUM(k) AS BIGINT) AS sum_k,
             SUM(CAST(k - y * {DENOM} AS DECIMAL(19,0))
                 * CAST(k - y * {DENOM} AS DECIMAL(19,0))) AS sq_err
      FROM scored GROUP BY {_idiv(dialect, 'k', str(BIN_W))}
    )
    SELECT b AS score_bin, n,
           ROUND(CAST(sum_k AS DOUBLE) / (CAST(n AS DOUBLE) * {DENOM}), 6)
             AS mean_predicted,
           ROUND(CAST(n_pos AS DOUBLE) / n, 6) AS observed_rate,
           ROUND(CAST(n_pos AS DOUBLE) / n
                 - CAST(sum_k AS DOUBLE) / (CAST(n AS DOUBLE) * {DENOM}), 6)
             AS calibration_gap,
           ROUND(CAST(sq_err AS DOUBLE)
                 / (CAST(n AS DOUBLE) * {DENOM} * {DENOM}), 6) AS brier
    FROM bins
    ORDER BY score_bin
    """


@query("q620_calibration_brier", oracle=_brier_sql("duck"))
def q620_calibration_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bin calibration (mean predicted k/2^20 vs observed rate —
    the gap should be ~0 by the planting construction) and the Brier
    score from sum (k - y*2^20)^2 accumulated in DECIMAL(38,0): the
    2^40-scaled exact form, divided once at the end."""
    _views(spark, sf_dir)
    return spark.sql(_brier_sql("spark"))
