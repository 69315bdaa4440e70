"""Psychometrics batch 158 (q856-q860) — scale-reliability analysis
treating the five event types as items of a "engagement scale" and
users as respondents (score = event count): the internal-consistency
toolkit a survey/metrics team runs before averaging items into an
index, all from ONE wide user aggregate and exact integer moments.

- q856 Cronbach's alpha: k/(k-1) (1 - sum var_i / var_total) with
  the variance components shown;
- q857 corrected item-total correlations (each item vs the sum of
  the OTHERS — the item-screening column);
- q858 alpha-if-item-deleted per item (from the full covariance
  algebra, no re-aggregation);
- q859 split-half reliability (odd vs even items by name order) with
  the Spearman-Brown step-up;
- q860 the inter-item correlation matrix with the mean-r
  (standardized) alpha beside q856's raw-score alpha.

100 TB shape: one fact pass pivots events to a (user, 5-item) wide
table (conditional aggregate — the only shuffle); every statistic is
integer moments over that table, and the item-level algebra is
25-cell arithmetic.

Determinism: scores are exact integer counts; all sums/products are
BIGINT (bounded well under 2^53 — counts are small); population
(biased, /n) variances on BOTH engines; correlations and alphas are
terminal straight-line doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

ITEMS = ["click", "error", "purchase", "signup", "view"]
K = len(ITEMS)


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _wide_cte() -> str:
    cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN event_type = '{it}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS x{i}"
        for i, it in enumerate(ITEMS)
    )
    return f"""wide AS (
      SELECT user_id AS u,
             {cols}
      FROM events GROUP BY user_id
    )"""


def _mom_cte() -> str:
    """All first/second moments incl. the total score, one aggregate."""
    tot = " + ".join(f"x{i}" for i in range(K))
    pieces = [f"CAST(COUNT(*) AS BIGINT) AS n"]
    for i in range(K):
        pieces.append(f"CAST(SUM(x{i}) AS BIGINT) AS s{i}")
        pieces.append(f"CAST(SUM(x{i} * x{i}) AS BIGINT) AS s{i}{i}")
    for i in range(K):
        for j in range(i + 1, K):
            pieces.append(f"CAST(SUM(x{i} * x{j}) AS BIGINT) AS s{i}{j}")
    pieces.append(f"CAST(SUM(({tot}) * ({tot})) AS BIGINT) AS stt")
    pieces.append(f"CAST(SUM({tot}) AS BIGINT) AS st")
    return f"""{_wide_cte()},
    mom AS (
      SELECT {', '.join(pieces)}
      FROM wide
    )"""


def _var(i: int) -> str:
    return f"(CAST(s{i}{i} AS DOUBLE) / n - (CAST(s{i} AS DOUBLE) / n) * (CAST(s{i} AS DOUBLE) / n))"


def _cov(i: int, j: int) -> str:
    a, b = min(i, j), max(i, j)
    return (
        f"(CAST(s{a}{b} AS DOUBLE) / n - (CAST(s{a} AS DOUBLE) / n)"
        f" * (CAST(s{b} AS DOUBLE) / n))"
    )


_VAR_T = "(CAST(stt AS DOUBLE) / n - (CAST(st AS DOUBLE) / n) * (CAST(st AS DOUBLE) / n))"
_SUM_VARS = " + ".join(_var(i) for i in range(K))


# ---------------------------------------------------------------------------
# q856 — Cronbach's alpha

_Q856_SQL = f"""
    WITH {_mom_cte()}
    SELECT n AS n_respondents,
           CAST({K} AS BIGINT) AS k_items,
           {_SUM_VARS} AS sum_item_variances,
           {_VAR_T} AS total_variance,
           CAST({K} AS DOUBLE) / {K - 1}
             * (1 - ({_SUM_VARS}) / ({_VAR_T})) AS cronbach_alpha
    FROM mom
    """


@query("q856_cronbach_alpha", oracle=_Q856_SQL)
def q856_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha for the 5-item engagement scale: exact integer
    moments from one wide aggregate, population variances, one
    terminal expression. Alpha <= 1 always; negative alpha means the
    items don't belong together."""
    _views(spark, sf_dir)
    return spark.sql(_Q856_SQL)


# ---------------------------------------------------------------------------
# q857 — corrected item-total correlations

def _rest_terms(i: int) -> tuple[str, str]:
    """(cov(x_i, T - x_i), var(T - x_i)) in moment algebra."""
    cov_it = " + ".join(_cov(i, j) for j in range(K) if j != i)
    var_rest = (
        f"({_VAR_T} + {_var(i)} - 2 * ({cov_it} + {_var(i)}))"
    )
    return cov_it, var_rest


_Q857_ROWS = "\n    UNION ALL\n    ".join(
    f"""SELECT '{ITEMS[i]}' AS item,
           ({_rest_terms(i)[0]})
             / SQRT({_var(i)} * {_rest_terms(i)[1]}) AS item_total_corr
    FROM mom"""
    for i in range(K)
)

_Q857_SQL = f"""
    WITH {_mom_cte()}
    {_Q857_ROWS}
    ORDER BY item
    """


@query("q857_item_total_corr", oracle=_Q857_SQL)
def q857_item_total_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrected item-total correlations: each item against the sum
    of the OTHER four (cov(x_i, T - x_i) via the covariance algebra —
    no second pass). The screening column: items below ~0.2 usually
    get dropped."""
    _views(spark, sf_dir)
    return spark.sql(_Q857_SQL)


# ---------------------------------------------------------------------------
# q858 — alpha if item deleted

def _alpha_without(i: int) -> str:
    sum_vars_rest = " + ".join(_var(j) for j in range(K) if j != i)
    _, var_rest = _rest_terms(i)
    return (
        f"CAST({K - 1} AS DOUBLE) / {K - 2}"
        f" * (1 - ({sum_vars_rest}) / {var_rest})"
    )


_Q858_ROWS = "\n    UNION ALL\n    ".join(
    f"""SELECT '{ITEMS[i]}' AS deleted_item,
           {_alpha_without(i)} AS alpha_without
    FROM mom"""
    for i in range(K)
)

_Q858_SQL = f"""
    WITH {_mom_cte()},
    base AS (
      SELECT CAST({K} AS DOUBLE) / {K - 1}
               * (1 - ({_SUM_VARS}) / ({_VAR_T})) AS alpha_full
      FROM mom
    )
    SELECT d.deleted_item, d.alpha_without, b.alpha_full,
           d.alpha_without - b.alpha_full AS alpha_gain
    FROM (
    {_Q858_ROWS}
    ) d CROSS JOIN base b
    ORDER BY d.deleted_item
    """


@query("q858_alpha_if_deleted", oracle=_Q858_SQL)
def q858_alpha_if_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha recomputed with each item removed (pure covariance
    algebra over the same moments — var(T - x_i) expands exactly),
    with the gain vs the full scale: a positive gain flags an item
    that HURTS consistency."""
    _views(spark, sf_dir)
    return spark.sql(_Q858_SQL)


# ---------------------------------------------------------------------------
# q859 — split-half + Spearman-Brown

_H1 = [0, 2, 4]  # click, purchase, view (odd positions by name order)
_H2 = [1, 3]  # error, signup


def _half_terms() -> tuple[str, str, str]:
    var_h1 = " + ".join(_var(i) for i in _H1) + " + 2 * (" + " + ".join(
        _cov(a, b) for ai, a in enumerate(_H1) for b in _H1[ai + 1:]
    ) + ")"
    var_h2 = " + ".join(_var(i) for i in _H2) + " + 2 * (" + " + ".join(
        _cov(a, b) for ai, a in enumerate(_H2) for b in _H2[ai + 1:]
    ) + ")"
    cov_h = " + ".join(_cov(a, b) for a in _H1 for b in _H2)
    return var_h1, var_h2, cov_h


_VH1, _VH2, _CH = _half_terms()

_Q859_SQL = f"""
    WITH {_mom_cte()}
    SELECT ({_CH}) / SQRT(({_VH1}) * ({_VH2})) AS split_half_corr,
           2 * (({_CH}) / SQRT(({_VH1}) * ({_VH2})))
             / (1 + ({_CH}) / SQRT(({_VH1}) * ({_VH2})))
             AS spearman_brown
    FROM mom
    """


@query("q859_split_half", oracle=_Q859_SQL)
def q859_split_half(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-half reliability (items split odd/even by name order;
    half variances and the cross-half covariance expanded from the
    same moment table) with the Spearman-Brown full-length step-up
    2r/(1+r)."""
    _views(spark, sf_dir)
    return spark.sql(_Q859_SQL)


# ---------------------------------------------------------------------------
# q860 — inter-item matrix + standardized alpha

_Q860_ROWS = "\n    UNION ALL\n    ".join(
    f"""SELECT '{ITEMS[i]}' AS item_a, '{ITEMS[j]}' AS item_b,
           ({_cov(i, j)}) / SQRT({_var(i)} * {_var(j)}) AS corr
    FROM mom"""
    for i in range(K)
    for j in range(i + 1, K)
)

_MEAN_R = (
    "("
    + " + ".join(
        f"({_cov(i, j)}) / SQRT({_var(i)} * {_var(j)})"
        for i in range(K)
        for j in range(i + 1, K)
    )
    + f") / {K * (K - 1) // 2}"
)

_MOM_MV = "psy_mom_mv"


def _mom_view(spark: SparkSession, sf_dir: str) -> None:
    """r10 P3 staging: q860 references `mom` 11x (ten UNION ALL
    correlation arms + summary) and each reference re-ran the wide
    user aggregate over the events corpus under Catalyst inlining
    (11 duplicate events scans in the static plan). ONE corpus pass
    checkpoints the single-row moment table; the oracle keeps the
    one-statement form."""
    _views(spark, sf_dir)
    df = spark.sql(f"WITH {_mom_cte()} SELECT * FROM mom")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_MOM_MV)


def _q860_body(mom_head: str) -> str:
    return f"""
    WITH {mom_head},
    pairs AS (
    {_Q860_ROWS}
    ),
    summary AS (
      SELECT {_MEAN_R} AS mean_r,
             {K} * ({_MEAN_R}) / (1 + ({K} - 1) * ({_MEAN_R}))
               AS standardized_alpha,
             CAST({K} AS DOUBLE) / {K - 1}
               * (1 - ({_SUM_VARS}) / ({_VAR_T})) AS raw_alpha
      FROM mom
    )
    SELECT p.item_a, p.item_b, p.corr,
           s.mean_r, s.standardized_alpha, s.raw_alpha
    FROM pairs p CROSS JOIN summary s
    ORDER BY p.item_a, p.item_b
    """


_Q860_SQL = _q860_body(_mom_cte())
_Q860_SQL_STAGED = _q860_body(f"mom AS (SELECT * FROM {_MOM_MV})")


@query("q860_interitem_matrix", oracle=_Q860_SQL)
def q860_interitem_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10 inter-item correlations with the mean-r standardized
    alpha (k r / (1 + (k-1) r)) beside the raw-score alpha — the two
    diverge exactly when item variances are unequal, which this table
    makes visible."""
    _mom_view(spark, sf_dir)
    return spark.sql(_Q860_SQL_STAGED)
