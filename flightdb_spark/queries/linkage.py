"""Record-linkage & estimation batch 74 (q437-q441):

- q437 duplicated-substring length bands (the suffix-array dedup
  question of Lee et al. 2021 "Deduplicating Training Data Makes LMs
  Better", answered scalably): for each doc, the longest n-gram width
  from a fixed ladder (8/16/32/64) that also appears in ANOTHER doc —
  per-source band census. Each ladder step is one hashed n-gram
  equi-join; no suffix array, no pairs;
- q438 Fellegi-Sunter linkage weights: m/u probabilities and
  log2-likelihood agreement weights for three comparison fields,
  estimated from a deterministic perturbed-copy match universe — the
  probabilistic scoring that turns q248's blocked candidate pairs
  into ranked link decisions;
- q439 Horvitz-Thompson estimation: an unequal-probability hash
  sample (10% / 50% tiers by user activity) expanded by 1/pi — the
  design-unbiased total estimator survey sampling and billing audits
  run, checked against the known truth;
- q440 panel fixed-effects (within) estimator: user-demeaned OLS of
  purchase value on event hour — the econometric workhorse that
  removes per-user level confounds, as two exact-moment aggregates;
- q441 difference-in-differences: the 2x2 (group x period) means and
  the DiD interaction estimate with a PLANTED treatment lift —
  the canonical before/after-with-control readout (q411's ITS has no
  control group; this does).

Determinism: ladder joins and band census are integer; FS weights are
log2 of exact count ratios; HT/FE/DiD reduce to exact integer/decimal
moments with terminal double algebra.

100 TB shapes: q437 is log-ladder many hashed equi-joins, each
map-side salted by the gram hash; q438 aggregates candidate pairs to
8 agreement-pattern cells; q439-q441 are one or two keyed aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

LADDER = (8, 16, 32, 64)
HT_HI_RATE = 5  # 1-in-5 sampling for heavy users
HT_LO_RATE = 10  # 1-in-10 for light users
DID_LIFT_UNITS = 100  # planted well above cell-mean noise at every SF


def _docs_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    ).createOrReplaceTempView("documents")


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _cust_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "customer")
    ).createOrReplaceTempView("customer")


def _h(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 4), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, 4))::BIGINT)"


# ---------------------------------------------------------------------------
# q437 — duplicated-substring length bands


def _dupband_sql(dialect: str) -> str:
    if dialect == "spark":
        toks = "split(text, ' ')"
        gram = (
            "md5(array_join(slice(toks, i + 1, {n}), ' '))"
        )
        idx = (
            "CASE WHEN size(toks) >= {n} THEN sequence(0, size(toks) - {n}) "
            "ELSE CAST(array() AS ARRAY<INT>) END"
        )
        expl = "explode"
    else:
        toks = "string_split(text, ' ')"
        gram = "md5(array_to_string(toks[i + 1 : i + {n}], ' '))"
        idx = "range(0, GREATEST(len(toks) - {n} + 1, 0))"
        expl = "unnest"
    steps = []
    for n in LADDER:
        steps.append(
            f"""g{n} AS (
      SELECT doc_id, {expl}({idx.format(n=n)}) AS i, toks
      FROM tok
    ),
    h{n} AS (
      SELECT doc_id, {gram.format(n=n)} AS g FROM g{n}
    ),
    shared{n} AS (
      SELECT DISTINCT a.doc_id FROM h{n} a
      JOIN (SELECT g, COUNT(DISTINCT doc_id) AS nd FROM h{n} GROUP BY g) s
        ON s.g = a.g AND s.nd > 1
    )"""
        )
    bands = "\n             ".join(
        f"WHEN s{n}.doc_id IS NOT NULL THEN {n}" for n in reversed(LADDER)
    )
    joins = "\n      ".join(
        f"LEFT JOIN shared{n} s{n} ON s{n}.doc_id = t.doc_id" for n in LADDER
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, source, {toks} AS toks FROM documents
    ),
    {', '.join(steps)},
    banded AS (
      SELECT t.source,
             CASE {bands}
             ELSE 0 END AS dup_band
      FROM tok t
      {joins}
    )
    SELECT source, CAST(dup_band AS INT) AS dup_band,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM banded GROUP BY source, dup_band ORDER BY source, dup_band
    """


@query("q437_dup_substring_bands", oracle=_dupband_sql("duck"))
def q437_dup_substring_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring census (the Lee 2021 exact-substring dedup
    question without a suffix array): per doc, the widest ladder width
    (8/16/32/64 tokens) at which one of its n-grams also occurs in a
    DIFFERENT doc, rolled up per (source, band); band 0 docs are clean
    at every width. Integer counting throughout.

    Spark plan (guide §2.3/§2.4, rewritten r9): ONE corpus scan emits
    per-doc DISTINCT (width, gram-hash) pairs for all four widths via
    transform-before-explode — the old per-width CTEs re-tokenized the
    corpus 8x and carried the full token array through every exploded
    row (O(len²) bytes per doc). A (width, gram)-partitioned count
    window finds grams in >1 doc (per-doc pairs are already distinct,
    so COUNT(*) == COUNT(DISTINCT doc_id)), and the per-doc max width
    joins back to the doc spine. The oracle keeps the textbook
    per-width equi-join form, so two formulations must agree."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    _docs_view(spark, sf_dir)
    tok = spark.sql(
        "SELECT doc_id, source, split(text, ' ') AS toks FROM documents"
    ).localCheckpoint(eager=False)
    width_arrays = ", ".join(
        f"CASE WHEN size(toks) >= {n} THEN array_distinct(transform("
        f"sequence(0, size(toks) - {n}), "
        f"i -> named_struct('n', {n}, 'g', "
        f"md5(array_join(slice(toks, i + 1, {n}), ' '))))) "
        f"ELSE CAST(array() AS ARRAY<STRUCT<n: INT, g: STRING>>) END"
        for n in LADDER
    )
    pairs = tok.select(
        "doc_id",
        F.explode(F.expr(f"flatten(array({width_arrays}))")).alias("p"),
    ).select("doc_id", F.col("p.n").alias("n"), F.col("p.g").alias("g"))
    shared = (
        pairs.withColumn(
            "nd", F.count(F.lit(1)).over(Window.partitionBy("n", "g"))
        )
        .filter(F.col("nd") > 1)
        .groupBy("doc_id")
        .agg(F.max("n").alias("band"))
    )
    banded = tok.select("doc_id", "source").join(shared, "doc_id", "left")
    return (
        banded.groupBy(
            "source",
            F.coalesce(F.col("band"), F.lit(0)).cast("int").alias("dup_band"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("source", "dup_band")
    )


# ---------------------------------------------------------------------------
# q438 — Fellegi-Sunter linkage weights


def _fs_sql(dialect: str) -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    h = _h(dialect, f"CAST(c_custkey AS {str_t}) || '_p'")
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH base AS (
      SELECT c_custkey, c_name, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
             c_nationkey
      FROM customer
    ),
    -- perturbed copy: ~30% of names corrupted, the linkage noise
    dirty AS (
      SELECT c_custkey,
             CASE WHEN ({h}) % 10 < 3
                  THEN CONCAT(c_name, '~') ELSE c_name END AS c_name,
             c_mktsegment, bal_band, c_nationkey
      FROM base
    ),
    -- candidate universe: block on nationkey (q248's blocking);
    -- m/u use +0.5/+1 smoothing (unique names give raw u = 0,
    -- which a log-weight cannot take)
    cand AS (
      SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
             CASE WHEN a.c_name = b.c_name THEN 1 ELSE 0 END AS agr_name,
             CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END
               AS agr_seg,
             CASE WHEN a.bal_band = b.bal_band THEN 1 ELSE 0 END AS agr_bal,
             CASE WHEN a.c_custkey = b.c_custkey THEN 1 ELSE 0 END AS is_match
      FROM base a JOIN dirty b ON b.c_nationkey = a.c_nationkey
    ),
    probs AS (
      SELECT 'name' AS field,
             (CAST(SUM(CASE WHEN is_match = 1 THEN agr_name ELSE 0 END)
               AS DOUBLE) + 0.5)
               / (SUM(is_match) + 1) AS m_prob,
             (CAST(SUM(CASE WHEN is_match = 0 THEN agr_name ELSE 0 END)
               AS DOUBLE) + 0.5)
               / (SUM(1 - is_match) + 1) AS u_prob
      FROM cand
      UNION ALL
      SELECT 'segment',
             (CAST(SUM(CASE WHEN is_match = 1 THEN agr_seg ELSE 0 END)
               AS DOUBLE) + 0.5) / (SUM(is_match) + 1),
             (CAST(SUM(CASE WHEN is_match = 0 THEN agr_seg ELSE 0 END)
               AS DOUBLE) + 0.5) / (SUM(1 - is_match) + 1)
      FROM cand
      UNION ALL
      SELECT 'balance_band',
             (CAST(SUM(CASE WHEN is_match = 1 THEN agr_bal ELSE 0 END)
               AS DOUBLE) + 0.5) / (SUM(is_match) + 1),
             (CAST(SUM(CASE WHEN is_match = 0 THEN agr_bal ELSE 0 END)
               AS DOUBLE) + 0.5) / (SUM(1 - is_match) + 1)
      FROM cand
    )
    SELECT field,
           ROUND(m_prob, 6) AS m_prob,
           ROUND(u_prob, 6) AS u_prob,
           ROUND(LOG2(m_prob / u_prob), 6) AS agreement_weight,
           ROUND(LOG2((1 - m_prob) / (1 - u_prob)), 6)
             AS disagreement_weight
    FROM probs ORDER BY field
    """


@query("q438_fellegi_sunter", oracle=_fs_sql("duck"))
def q438_fellegi_sunter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage: per comparison
    field, m = P(agree | match) and u = P(agree | non-match) estimated
    on a nationkey-blocked candidate universe between the customer
    table and a deterministically perturbed copy (30% of names
    corrupted), with the log2 agreement/disagreement weights a linker
    sums per candidate pair — the scoring layer on top of q248's
    blocked ER. The blocked join is per-nation bounded; probabilities
    are exact count ratios; weights are terminal log2s."""
    _cust_view(spark, sf_dir)
    return spark.sql(_fs_sql("spark"))


# ---------------------------------------------------------------------------
# q439 — Horvitz-Thompson estimation


def _ht_sql(dialect: str) -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    h = _h(dialect, f"CAST(user_id AS {str_t}) || '_ht'")
    return f"""
    WITH users AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS activity,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(38,2))) AS DOUBLE)
               AS total_value
      FROM events GROUP BY user_id
    ),
    designed AS (
      -- heavy users sampled at 1/{HT_HI_RATE}, light at 1/{HT_LO_RATE}
      SELECT user_id, activity, total_value,
             CASE WHEN activity >= 65 THEN 1.0 / {HT_HI_RATE}
                  ELSE 1.0 / {HT_LO_RATE} END AS pi,
             CASE WHEN activity >= 65
                  THEN CASE WHEN ({h}) % {HT_HI_RATE} = 0 THEN 1 ELSE 0 END
                  ELSE CASE WHEN ({h}) % {HT_LO_RATE} = 0 THEN 1 ELSE 0 END
             END AS sampled
      FROM users
    ),
    est AS (
      SELECT CAST(SUM(sampled) AS BIGINT) AS n_sampled,
             CAST(SUM(CASE WHEN sampled = 1
                           THEN CAST(ROUND(total_value / pi, 9)
                                     AS DECIMAL(38,9)) END) AS DOUBLE)
               AS ht_total,
             CAST(SUM(CAST(ROUND(total_value, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS true_total
      FROM designed
    )
    SELECT n_sampled,
           ROUND(ht_total, 2) AS ht_total,
           ROUND(true_total, 2) AS true_total,
           ROUND(ht_total / true_total, 6) AS ratio_to_truth
    FROM est
    """


@query("q439_horvitz_thompson", oracle=_ht_sql("duck"))
def q439_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson total estimation under an unequal-probability
    design: heavy users sampled 1-in-{HT_HI_RATE}, light 1-in-
    {HT_LO_RATE} (md5-deterministic), each sampled user's value
    expanded by 1/pi — the design-unbiased estimator a billing audit
    or survey pipeline runs on a stratified sample, checked against
    the known full total (ratio near 1 asserted). Per-user values
    accumulate 2-dp DECIMAL; expansions round 9 dp into DECIMAL."""
    _events_view(spark, sf_dir)
    return spark.sql(_ht_sql("spark"))


# ---------------------------------------------------------------------------
# q440 — panel fixed-effects (within) estimator


def _fe_sql(dialect: str) -> str:
    hr = (
        "CAST(date_format(ts, 'H') AS BIGINT)"
        if dialect == "spark"
        else "CAST(date_part('hour', ts) AS BIGINT)"
    )
    return f"""
    WITH panel AS (
      SELECT user_id, {hr} AS x, value AS y FROM events
    ),
    umeans AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_i,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(38,2))) AS DOUBLE) AS sy
      FROM panel GROUP BY user_id
    ),
    demeaned AS (
      SELECT p.user_id,
             p.x - CAST(u.sx AS DOUBLE) / u.n_i AS xd,
             p.y - u.sy / u.n_i AS yd
      FROM panel p JOIN umeans u ON u.user_id = p.user_id
    ),
    mom AS (
      SELECT CAST(SUM(CAST(ROUND(xd * yd, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(xd * xd, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS sxx,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM demeaned
    )
    SELECT n, n_users,
           ROUND(sxy / sxx, 6) AS beta_within,
           ROUND(sxx / (n - n_users), 6) AS x_within_variance
    FROM mom
    """


@query("q440_fixed_effects", oracle=_fe_sql("duck"))
def q440_fixed_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Panel fixed-effects (within) estimator: regress event value on
    hour-of-day with USER fixed effects — demean both variables within
    each user (one keyed aggregate broadcast back), then pooled OLS on
    the demeaned data — the econometric workhorse that removes every
    user-level confound q408 stratified on. Demeaned cross-moments
    round to 9 dp into DECIMAL; the within-variance denominator uses
    the honest n - n_users degrees of freedom."""
    _events_view(spark, sf_dir)
    return spark.sql(_fe_sql("spark"))


# ---------------------------------------------------------------------------
# q441 — difference-in-differences


def _did_sql(dialect: str) -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    h = _h(dialect, f"CAST(user_id AS {str_t}) || '_dd'")
    if dialect == "spark":
        di = "datediff(CAST(ts AS DATE), DATE '1970-01-01')"
    else:
        di = "(CAST(ts AS DATE) - DATE '1970-01-01')"
    return f"""
    WITH bounds AS (
      SELECT CAST(MIN({di}) AS BIGINT) AS lo, CAST(MAX({di}) AS BIGINT) AS hi
      FROM events
    ),
    rows_ AS (
      SELECT CASE WHEN ({h}) % 2 = 0 THEN 1 ELSE 0 END AS treated,
             CASE WHEN CAST({di} AS BIGINT) * 2 >= b.lo + b.hi
                  THEN 1 ELSE 0 END AS post,
             -- planted lift: treated-post rows gain {DID_LIFT_UNITS} units
             value + CASE WHEN ({h}) % 2 = 0
                           AND CAST({di} AS BIGINT) * 2 >= b.lo + b.hi
                          THEN CAST({DID_LIFT_UNITS} AS DOUBLE)
                          ELSE CAST(0 AS DOUBLE) END AS y
      FROM events CROSS JOIN bounds b
    ),
    cells AS (
      SELECT treated, post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sy
      FROM rows_ GROUP BY treated, post
    ),
    means AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND post = 1 THEN sy / n END) AS t1,
        MAX(CASE WHEN treated = 1 AND post = 0 THEN sy / n END) AS t0,
        MAX(CASE WHEN treated = 0 AND post = 1 THEN sy / n END) AS c1,
        MAX(CASE WHEN treated = 0 AND post = 0 THEN sy / n END) AS c0
      FROM cells
    )
    SELECT ROUND(t0, 6) AS treated_pre, ROUND(t1, 6) AS treated_post,
           ROUND(c0, 6) AS control_pre, ROUND(c1, 6) AS control_post,
           ROUND((t1 - t0) - (c1 - c0), 6) AS did_estimate
    FROM means
    """


@query("q441_diff_in_diff", oracle=_did_sql("duck"))
def q441_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: 2x2 (treated x post-period) means of
    event value with a PLANTED {DID_LIFT_UNITS}-unit lift on the
    treated-post cell — the DiD interaction must recover it (asserted
    within sampling noise), which is the estimator's whole claim:
    group and period level differences cancel, only the differential
    change survives (q411's ITS lacks the control arm this adds).
    Integer midpoint split via the doubled-comparison trick (no
    division at all); cell sums accumulate 6-dp DECIMAL."""
    _events_view(spark, sf_dir)
    return spark.sql(_did_sql("spark"))
