"""Multiple-testing batch 98 (q556-q560) — the family-wise / FDR
correction layer every metrics platform needs once it runs hundreds of
segment tests per day (beside q470 permutation test, q192 Mann-Whitney,
q415 threshold sweep). The batch operates where that layer actually
sits: ON a table of per-hypothesis p-values produced upstream.

P-values are planted as EXACT RATIONALS k / 2^20 (k = first 5 md5 hex
digits of the hypothesis key — identical integers on both engines),
with a deterministic 10% signal subset scaled down by 2^-10; every
rejection decision is a cross-multiplied integer comparison
(DETERMINISM.md §3), so Bonferroni / Holm / BH become pure integer
arithmetic with terminal-double display columns only:

- q556 Bonferroni + Holm step-down: per-hypothesis adjusted p-values
  and the rejection counts of the naive, Bonferroni, and Holm
  procedures at alpha = 0.05;
- q557 Benjamini-Hochberg step-up: the BH cutoff rank, rejections,
  and monotone q-values (running min from the bottom);
- q558 p-value histogram + Storey pi0: the diagnostic analysts look
  at FIRST (a healthy null is flat; an excess near 0 is signal),
  with the lambda = 0.5 null-share estimate;
- q559 FDR threshold sweep: planted ground truth -> empirical FDR
  and power of BH at alpha in {1, 5, 10, 20}% — the operating curve;
- q560 family-structured testing: within-family Bonferroni gates vs
  the flat global BH — how grouping changes what survives.

m (the hypothesis count) is bounded by construction — hypotheses are
(event_type x 64 user-buckets) AGGREGATES, a few hundred rows whatever
the corpus size — so the rank windows here run over a bounded table
(q76's class; allowlisted in tools/planlint.py where partition-less).
At 100 TB only the first aggregate touches the corpus; everything
after is broadcast-size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

DENOM = 1 << 20  # p = k / 2^20, k in [1, 2^20]
SIG_SHIFT = 10  # signals: p -> p / 2^10
ALPHA_NUM, ALPHA_DEN = 1, 20  # alpha = 0.05 as an exact rational


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _hyp_fixed(dialect: str) -> str:
    """The hypothesis table: one row per (event_type, user bucket) with
    an exact-rational planted p-value k/2^20 (k >= 1), a deterministic
    ~12.5% signal subset ceil-shifted down by 2^10. `k` is the integer
    numerator — every procedure below compares only k, never p."""
    st = "STRING" if dialect == "spark" else "VARCHAR"
    idiv = "DIV" if dialect == "spark" else "//"
    # first 5 hex digits of md5 -> integer in [0, 2^20); +1 avoids p=0.
    hexint = (
        f"CAST(conv(substr(md5(concat(event_type, ':', CAST(user_id % 64 AS "
        f"{st}))), 1, 5), 16, 10) AS BIGINT)"
        if dialect == "spark"
        else (
            "('0x' || substr(md5(concat(event_type, ':', CAST(user_id % 64 AS "
            "VARCHAR))), 1, 5))::BIGINT"
        )
    )
    sig = (
        "substr(md5(concat('sig|', event_type, ':', CAST(user_id % 64 AS "
        f"{st}))), 1, 1) IN ('0', '1')"  # ~2/16 = 12.5% signals
    )
    shift = 1 << SIG_SHIFT
    return f"""hyp AS (
      SELECT family, bucket,
             CASE WHEN is_sig = 1
                  THEN CAST((k0 + {shift}) {idiv} {shift} AS BIGINT)
                  ELSE k0 + 1 END AS k,
             is_sig
      FROM (
        SELECT event_type AS family,
               CAST(user_id % 64 AS BIGINT) AS bucket,
               {hexint} AS k0,
               CASE WHEN {sig} THEN 1 ELSE 0 END AS is_sig
        FROM events
        GROUP BY event_type, user_id % 64
      ) g
    )"""


# ---------------------------------------------------------------------------
# q556 — Bonferroni + Holm step-down


def _holm_sql(dialect: str) -> str:
    return f"""
    WITH {_hyp_fixed(dialect)},
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM hyp),
    ranked AS (
      SELECT h.family, h.bucket, h.k, h.is_sig, m.m,
             ROW_NUMBER() OVER (ORDER BY h.k, h.family, h.bucket) AS i
      FROM hyp h CROSS JOIN m
    ),
    holm AS (
      -- Holm rejects ranks 1..i* where every j <= i has
      -- k_j * (m - j + 1) <= alpha * 2^20, i.e. a prefix-AND:
      -- running max of the violation flag.
      SELECT family, bucket, k, is_sig, m, i,
             MAX(CASE WHEN k * (m - i + 1) * {ALPHA_DEN}
                           > {ALPHA_NUM} * {DENOM} * 1
                      THEN 1 ELSE 0 END)
               OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS blocked
      FROM ranked
    )
    SELECT CAST(m AS BIGINT) AS m_hypotheses,
           CAST(SUM(CASE WHEN k * {ALPHA_DEN} <= {ALPHA_NUM} * {DENOM}
                    THEN 1 ELSE 0 END) AS BIGINT) AS naive_rejections,
           CAST(SUM(CASE WHEN k * m * {ALPHA_DEN} <= {ALPHA_NUM} * {DENOM}
                    THEN 1 ELSE 0 END) AS BIGINT) AS bonferroni_rejections,
           CAST(SUM(1 - blocked) AS BIGINT) AS holm_rejections,
           CAST(SUM(is_sig) AS BIGINT) AS n_true_signals
    FROM holm
    GROUP BY m
    """


@query("q556_bonferroni_holm", oracle=_holm_sql("duck"))
def q556_bonferroni_holm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family-wise error control on the planted hypothesis table:
    naive, Bonferroni (k*m*20 <= 2^20 — cross-multiplied integers),
    and Holm step-down (prefix-AND via a running max over the rank
    order) rejection counts at alpha = 0.05, with the planted signal
    count for reference. Holm always rejects at least as much as
    Bonferroni — the test asserts it."""
    _views(spark, sf_dir)
    return spark.sql(_holm_sql("spark"))


# ---------------------------------------------------------------------------
# q557 — Benjamini-Hochberg step-up + q-values


def _bh_sql(dialect: str) -> str:
    return f"""
    WITH {_hyp_fixed(dialect)},
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM hyp),
    ranked AS (
      SELECT h.k, h.is_sig, m.m,
             ROW_NUMBER() OVER (ORDER BY h.k, h.family, h.bucket) AS i
      FROM hyp h CROSS JOIN m
    ),
    flags AS (
      -- BH: reject ranks 1..i* where i* = max i with
      -- k_i * m * 20 <= i * 2^20. suffix-MAX of the pass flag marks
      -- every rank at or below some passing rank.
      SELECT k, is_sig, m, i,
             MAX(CASE WHEN k * m * {ALPHA_DEN} <= i * {ALPHA_NUM} * {DENOM}
                      THEN 1 ELSE 0 END)
               OVER (ORDER BY i ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS rejected,
             -- q-value: monotone running min from the bottom of m*p/i
             MIN(ROUND(CAST(k AS DOUBLE) * m / (CAST(i AS DOUBLE) * {DENOM}), 8))
               OVER (ORDER BY i ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS q_value
      FROM ranked
    )
    SELECT CAST(m AS BIGINT) AS m_hypotheses,
           CAST(SUM(rejected) AS BIGINT) AS bh_rejections,
           CAST(SUM(CASE WHEN rejected = 1 AND is_sig = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS true_discoveries,
           ROUND(MIN(CASE WHEN rejected = 0 THEN q_value END), 8)
             AS min_unrejected_q
    FROM flags
    GROUP BY m
    """


@query("q557_benjamini_hochberg", oracle=_bh_sql("duck"))
def q557_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg step-up at alpha = 0.05: the rejection set
    via a suffix running-max of the exact integer pass flag
    (k*m*20 <= i*2^20), monotone q-values via a suffix running-min,
    and the true-discovery count against the planted signals. The
    rank windows run over the bounded hypothesis table — a few
    hundred rows regardless of corpus size."""
    _views(spark, sf_dir)
    return spark.sql(_bh_sql("spark"))


# ---------------------------------------------------------------------------
# q558 — p-value histogram + Storey pi0


def _hist_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    return f"""
    WITH {_hyp_fixed(dialect)},
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(CASE WHEN 2 * k > {DENOM} THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_above_half
          FROM hyp)
    SELECT CAST((k - 1) * 20 {idiv} {DENOM} AS BIGINT) AS bin_idx,
           ROUND(CAST((k - 1) * 20 {idiv} {DENOM} AS DOUBLE) / 20, 2)
             AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_pvalues,
           CAST(SUM(is_sig) AS BIGINT) AS n_signals,
           -- Storey pi0 at lambda = 0.5: #(p > 1/2) / (m * 1/2)
           ROUND(CAST(2 * MAX(m.n_above_half) AS DOUBLE) / MAX(m.m), 6)
             AS storey_pi0
    FROM hyp CROSS JOIN m
    GROUP BY 1, 2
    ORDER BY bin_idx
    """


@query("q558_pvalue_histogram", oracle=_hist_sql("duck"))
def q558_pvalue_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20-bin p-value histogram (the first diagnostic a metrics
    reviewer looks at — flat = null, spike at 0 = signal) with planted
    signal counts per bin and the Storey pi0 estimate at lambda = 0.5
    repeated on every row. Bins are exact integer arithmetic on the
    rational numerator ((k-1)*20 div 2^20)."""
    _views(spark, sf_dir)
    return spark.sql(_hist_sql("spark"))


# ---------------------------------------------------------------------------
# q559 — FDR operating curve


def _sweep_sql(dialect: str) -> str:
    alphas = "(VALUES (1, 100), (5, 100), (10, 100), (20, 100)) AS a(an, ad)"
    return f"""
    WITH {_hyp_fixed(dialect)},
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM hyp),
    ranked AS (
      SELECT h.k, h.is_sig, m.m,
             ROW_NUMBER() OVER (ORDER BY h.k, h.family, h.bucket) AS i
      FROM hyp h CROSS JOIN m
    ),
    per_alpha AS (
      SELECT a.an, a.ad, r.k, r.is_sig, r.m, r.i,
             MAX(CASE WHEN CAST(r.k AS BIGINT) * r.m * a.ad
                            <= CAST(r.i AS BIGINT) * a.an * {DENOM}
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY a.an, a.ad
                     ORDER BY r.i ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS rejected
      FROM ranked r CROSS JOIN {alphas}
    )
    SELECT ROUND(CAST(an AS DOUBLE) / ad, 2) AS alpha,
           CAST(SUM(rejected) AS BIGINT) AS n_rejected,
           CAST(SUM(CASE WHEN rejected = 1 AND is_sig = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS false_discoveries,
           ROUND(CAST(SUM(CASE WHEN rejected = 1 AND is_sig = 0
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(rejected), 0), 6) AS empirical_fdr,
           ROUND(CAST(SUM(CASE WHEN rejected = 1 AND is_sig = 1
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(is_sig), 0), 6) AS power
    FROM per_alpha
    GROUP BY an, ad
    ORDER BY alpha
    """


@query("q559_fdr_threshold_sweep", oracle=_sweep_sql("duck"))
def q559_fdr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BH operating curve: rejections, false discoveries (against
    the planted truth), empirical FDR, and power at alpha in
    {1, 5, 10, 20}% — one suffix-max window per alpha (PARTITION BY
    alpha), all integer comparisons. This is the sweep a platform runs
    once to pick its default alpha."""
    _views(spark, sf_dir)
    return spark.sql(_sweep_sql("spark"))


# ---------------------------------------------------------------------------
# q560 — family-structured vs flat testing


def _family_sql(dialect: str) -> str:
    return f"""
    WITH {_hyp_fixed(dialect)},
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM hyp),
    fam AS (
      SELECT family, CAST(COUNT(*) AS BIGINT) AS m_f FROM hyp GROUP BY family
    ),
    flat AS (
      SELECT h.family, h.k, m.m,
             ROW_NUMBER() OVER (ORDER BY h.k, h.family, h.bucket) AS i
      FROM hyp h CROSS JOIN m
    ),
    flat_rej AS (
      SELECT family,
             MAX(CASE WHEN k * m * {ALPHA_DEN} <= i * {ALPHA_NUM} * {DENOM}
                      THEN 1 ELSE 0 END)
               OVER (ORDER BY i ROWS BETWEEN CURRENT ROW
                     AND UNBOUNDED FOLLOWING) AS rejected
      FROM flat
    ),
    within AS (
      -- within-family Bonferroni at the family's alpha share
      SELECT h.family,
             CASE WHEN h.k * f.m_f * {ALPHA_DEN} <= {ALPHA_NUM} * {DENOM}
                  THEN 1 ELSE 0 END AS rejected
      FROM hyp h JOIN fam f ON f.family = h.family
    )
    SELECT f.family,
           f.m_f AS family_size,
           CAST((SELECT SUM(rejected) FROM flat_rej fr
                 WHERE fr.family = f.family) AS BIGINT) AS flat_bh_rejections,
           CAST((SELECT SUM(rejected) FROM within w
                 WHERE w.family = f.family) AS BIGINT)
             AS family_bonferroni_rejections
    FROM fam f
    ORDER BY f.family
    """


@query("q560_family_structured_testing", oracle=_family_sql("duck"))
def q560_family_structured_testing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Family-structured multiplicity: per family (event_type), how
    many hypotheses the FLAT global BH rejects vs a within-family
    Bonferroni at the same alpha — the structure-vs-power tradeoff
    that decides how a metrics platform groups its tests. All
    decisions are exact integer comparisons; correlated subqueries
    collapse to broadcast joins on the bounded family table."""
    _views(spark, sf_dir)
    return spark.sql(_family_sql("spark"))
