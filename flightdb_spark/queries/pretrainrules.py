"""Pretraining quality-rule batch 92 (q526-q530) — the named
rule-based document filters of the public pretraining recipes
(Gopher, Rae et al. 2021; CCNet, Wenzek et al. 2020), as auditable
tables beside q35's composite score, q63's source gate, and q350's
curation funnel. The synthetic corpus has no punctuation or lines,
so the rule set is the applicable subset, with every threshold
compared as a CROSS-MULTIPLIED INTEGER inequality (DETERMINISM.md
rule 3 — no float ratio ever meets a boundary):

- q526 Gopher-style rules: per-rule pass counts for word count in
  [20, 90], mean word length in [3, 10], stopword fraction >= 1/20,
  top-unigram fraction <= 3/20, distinct-word ratio >= 3/10 — plus
  the all-rules survivor count;
- q527 CCNet buckets: per-doc bigram-LM perplexity proxy bucketed
  into head/middle/tail THIRDS by exact cutpoints from the bounded
  rounded-score bin table (the q131 two-pass shape — no global rank
  window);
- q528 repetition rules: top-unigram / top-bigram mass fractions and
  the duplicate-trigram share per doc, with Rae-style thresholds and
  the worst-5 offender list;
- q529 rule funnel: survivors after each rule applied in sequence —
  the order-sensitive funnel a pipeline actually runs (q350's shape
  on the rule set);
- q530 rule-overlap matrix: pairwise Jaccard of the REJECTION sets —
  which rules are redundant and which carry unique signal.

100 TB shapes: ONE tokenized scan computes every per-doc flag
(map-side explode + per-doc aggregate, the q52 economics); all rule
tables aggregate flags; the bucket cutpoints come from a bounded
bin table, never a corpus-wide sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

STOPWORDS = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with'"
# thresholds as exact integer ratios (numerator, denominator)
MIN_WORDS, MAX_WORDS = 20, 90
MWL_LO, MWL_HI = 3, 10  # mean word length bounds
STOP_NUM, STOP_DEN = 1, 20  # stopword fraction >= 1/20
TOPU_NUM, TOPU_DEN = 3, 20  # top unigram fraction <= 3/20
DWR_NUM, DWR_DEN = 3, 10  # distinct-word ratio >= 3/10
TOPB_NUM, TOPB_DEN = 1, 10  # top bigram fraction <= 1/10
DUP3_NUM, DUP3_DEN = 1, 2  # duplicate-trigram share <= 1/2


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )


def _toks(dialect: str) -> str:
    return "string_split(text, ' ')" if dialect == "duck" else "split(text, ' ')"


def _unn(dialect: str) -> str:
    return "unnest" if dialect == "duck" else "explode"


def _ngrams(dialect: str, n: int) -> str:
    t = _toks(dialect)
    if dialect == "duck":
        return (
            f"list_transform(range(1, len({t}) - {n - 2}), "
            f"i -> array_to_string(({t})[i:i+{n - 1}], ' '))"
        )
    return (
        f"CASE WHEN size({t}) < {n} THEN array() "
        f"ELSE transform(sequence(1, size({t}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({t}, i, {n}))) END"
    )


def _flags(dialect: str) -> str:
    """Per-doc rule flags from one tokenized pass. All comparisons are
    cross-multiplied integers."""
    return f"""
    words AS (
      SELECT doc_id, {_unn(dialect)}({_toks(dialect)}) AS w FROM documents
    ),
    wstats AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(COUNT(DISTINCT w) AS BIGINT) AS n_distinct,
             CAST(SUM(LENGTH(w)) AS BIGINT) AS total_chars,
             CAST(SUM(CASE WHEN w IN ({STOPWORDS}) THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_stop,
             CAST(MAX(cnt) AS BIGINT) AS top_uni
      FROM (SELECT doc_id, w, COUNT(*) OVER (PARTITION BY doc_id, w) AS cnt
            FROM words) t
      GROUP BY doc_id
    ),
    flags AS (
      SELECT doc_id, n_words,
             CASE WHEN n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
                  THEN 1 ELSE 0 END AS r1_len,
             CASE WHEN total_chars >= {MWL_LO} * n_words
                   AND total_chars <= {MWL_HI} * n_words
                  THEN 1 ELSE 0 END AS r2_mwl,
             CASE WHEN {STOP_DEN} * n_stop >= {STOP_NUM} * n_words
                  THEN 1 ELSE 0 END AS r3_stop,
             CASE WHEN {TOPU_DEN} * top_uni <= {TOPU_NUM} * n_words
                  THEN 1 ELSE 0 END AS r4_topuni,
             CASE WHEN {DWR_DEN} * n_distinct >= {DWR_NUM} * n_words
                  THEN 1 ELSE 0 END AS r5_distinct
      FROM wstats
    )"""


# ---------------------------------------------------------------------------
# q526 — Gopher-style rules


def _gopher_sql(dialect: str) -> str:
    return f"""
    WITH {_flags(dialect)}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(r1_len) AS BIGINT) AS pass_word_count,
           CAST(SUM(r2_mwl) AS BIGINT) AS pass_mean_word_len,
           CAST(SUM(r3_stop) AS BIGINT) AS pass_stopword_frac,
           CAST(SUM(r4_topuni) AS BIGINT) AS pass_top_unigram,
           CAST(SUM(r5_distinct) AS BIGINT) AS pass_distinct_ratio,
           CAST(SUM(r1_len * r2_mwl * r3_stop * r4_topuni * r5_distinct)
                AS BIGINT) AS pass_all
    FROM flags
    """


@query("q526_gopher_rules", oracle=_gopher_sql("duck"))
def q526_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules (the applicable subset for a
    punctuation-free corpus): word count, mean word length, stopword
    fraction, top-unigram mass, distinct-word ratio — per-rule pass
    counts and the all-rules survivor count, every threshold an
    exact cross-multiplied integer inequality (rule 3). One tokenized
    scan computes all flags; everything after is a flag aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_gopher_sql("spark"))


# ---------------------------------------------------------------------------
# q527 — CCNet-style LM buckets


def _ccnet_sql(dialect: str) -> str:
    # perplexity proxy: mean -ln of add-one-smoothed unigram
    # probability (cheap stand-in for CCNet's KenLM; deterministic)
    return f"""
    WITH words AS (
      SELECT doc_id, {_unn(dialect)}({_toks(dialect)}) AS w FROM documents
    ),
    vocab AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cf FROM words GROUP BY w
    ),
    totals AS (
      SELECT CAST(SUM(cf) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
      FROM vocab
    ),
    scored AS (
      SELECT wo.doc_id,
             ROUND(CAST(SUM(CAST(ROUND(
               -LN((vo.cf + CAST(1.0 AS DOUBLE)) / (t.n + t.v)), 9)
               AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 2) AS nll
      FROM words wo JOIN vocab vo ON vo.w = wo.w CROSS JOIN totals t
      GROUP BY wo.doc_id
    ),
    bins AS (
      SELECT nll, CAST(COUNT(*) AS BIGINT) AS c FROM scored GROUP BY nll
    ),
    cum AS (
      SELECT nll, c,
             SUM(c) OVER (ORDER BY nll) AS cum_c,
             SUM(c) OVER () AS n
      FROM bins
    ),
    cuts AS (
      SELECT MIN(CASE WHEN 3 * cum_c >= n THEN nll END) AS c1,
             MIN(CASE WHEN 3 * cum_c >= 2 * n THEN nll END) AS c2
      FROM cum
    )
    SELECT CASE WHEN s.nll <= c.c1 THEN 'head'
                WHEN s.nll <= c.c2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(s.nll AS DECIMAL(38,2))) AS DOUBLE)
                 / COUNT(*), 4) AS mean_nll
    FROM scored s CROSS JOIN cuts c
    GROUP BY CASE WHEN s.nll <= c.c1 THEN 'head'
                  WHEN s.nll <= c.c2 THEN 'middle'
                  ELSE 'tail' END
    """


@query("q527_ccnet_buckets", oracle=_ccnet_sql("duck"))
def q527_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail bucketing by language-model score
    (add-one unigram NLL as the deterministic KenLM stand-in): exact
    tercile cutpoints read off the cumulative of the ROUNDED-score
    bin table (2-dp bins — bounded by the score range, the
    q131/rule-15 shape; no corpus-wide rank window), then one bucket
    aggregate. ln terms at 9 dp into DECIMAL per-doc sums (rule 5);
    tercile membership compares 3*cum >= k*n in integers."""
    _views(spark, sf_dir)
    return spark.sql(_ccnet_sql("spark"))


# ---------------------------------------------------------------------------
# q528 — repetition rules


def _rep_sql(dialect: str) -> str:
    return f"""
    WITH words AS (
      SELECT doc_id, {_unn(dialect)}({_toks(dialect)}) AS w FROM documents
    ),
    uni AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_uni,
             CAST(SUM(c) AS BIGINT) AS n_words
      FROM (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w) t
      GROUP BY doc_id
    ),
    bigr AS (
      SELECT doc_id, {_unn(dialect)}({_ngrams(dialect, 2)}) AS g FROM documents
    ),
    bi AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bi,
             CAST(SUM(c) AS BIGINT) AS n_bi
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM bigr GROUP BY doc_id, g) t
      GROUP BY doc_id
    ),
    trig AS (
      SELECT doc_id, {_unn(dialect)}({_ngrams(dialect, 3)}) AS g FROM documents
    ),
    tri AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup3,
             CAST(SUM(c) AS BIGINT) AS n_tri
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM trig GROUP BY doc_id, g) t
      GROUP BY doc_id
    ),
    joined AS (
      SELECT u.doc_id, u.top_uni, u.n_words, b.top_bi, b.n_bi,
             t.dup3, t.n_tri,
             CASE WHEN {TOPU_DEN} * u.top_uni <= {TOPU_NUM} * u.n_words
                  THEN 1 ELSE 0 END AS ok_uni,
             CASE WHEN {TOPB_DEN} * b.top_bi <= {TOPB_NUM} * b.n_bi
                  THEN 1 ELSE 0 END AS ok_bi,
             CASE WHEN {DUP3_DEN} * t.dup3 <= {DUP3_NUM} * t.n_tri
                  THEN 1 ELSE 0 END AS ok_tri
      FROM uni u JOIN bi b ON b.doc_id = u.doc_id
      JOIN tri t ON t.doc_id = u.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ok_uni) AS BIGINT) AS pass_top_unigram,
           CAST(SUM(ok_bi) AS BIGINT) AS pass_top_bigram,
           CAST(SUM(ok_tri) AS BIGINT) AS pass_dup_trigram,
           CAST(SUM(ok_uni * ok_bi * ok_tri) AS BIGINT) AS pass_all
    FROM joined
    """


@query("q528_repetition_rules", oracle=_rep_sql("duck"))
def q528_repetition_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rae-style repetition rules: top-unigram mass, top-bigram mass,
    and duplicated-trigram share per doc, each against an exact
    integer-ratio threshold — the filters that catch degenerate or
    template text that length/stopword rules miss. Three (doc, gram)
    partial aggregates joined on doc_id (the q52 economics), then
    one flag aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_rep_sql("spark"))


# ---------------------------------------------------------------------------
# q529 — rule funnel


def _funnel_sql(dialect: str) -> str:
    return f"""
    WITH {_flags(dialect)}
    SELECT stage, survivors FROM (
      SELECT 1 AS ord, 'all_docs' AS stage,
             CAST(COUNT(*) AS BIGINT) AS survivors FROM flags
      UNION ALL
      SELECT 2, 'word_count', CAST(SUM(r1_len) AS BIGINT) FROM flags
      UNION ALL
      SELECT 3, '+ mean_word_len',
             CAST(SUM(r1_len * r2_mwl) AS BIGINT) FROM flags
      UNION ALL
      SELECT 4, '+ stopword_frac',
             CAST(SUM(r1_len * r2_mwl * r3_stop) AS BIGINT) FROM flags
      UNION ALL
      SELECT 5, '+ top_unigram',
             CAST(SUM(r1_len * r2_mwl * r3_stop * r4_topuni) AS BIGINT)
      FROM flags
      UNION ALL
      SELECT 6, '+ distinct_ratio',
             CAST(SUM(r1_len * r2_mwl * r3_stop * r4_topuni * r5_distinct)
                  AS BIGINT)
      FROM flags
    ) t
    """


@query("q529_rule_funnel", oracle=_funnel_sql("duck"))
def q529_rule_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-rule funnel: survivors after each Gopher rule applies
    in sequence — the per-stage attrition a curation pipeline reports
    (q350's funnel on the rule set). All six stages read the SAME
    flag table; the union is six aggregates of one pass."""
    _views(spark, sf_dir)
    return spark.sql(_funnel_sql("spark"))


# ---------------------------------------------------------------------------
# q530 — rule-overlap matrix


def _overlap_sql(dialect: str) -> str:
    rules = ["r1_len", "r2_mwl", "r3_stop", "r4_topuni", "r5_distinct"]
    parts = []
    for i, a in enumerate(rules):
        for b in rules[i + 1:]:
            parts.append(f"""
      SELECT '{a}' AS rule_a, '{b}' AS rule_b,
             CAST(SUM((1 - {a}) * (1 - {b})) AS BIGINT) AS both_reject,
             CAST(SUM(CASE WHEN {a} = 0 OR {b} = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS either_rejects
      FROM flags""")
    union = " UNION ALL ".join(parts)
    return f"""
    WITH {_flags(dialect)},
    pairs AS ({union})
    SELECT rule_a, rule_b, both_reject, either_rejects,
           CASE WHEN either_rejects = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE ROUND(CAST(both_reject AS DOUBLE) / either_rejects, 4)
           END AS rejection_jaccard
    FROM pairs
    """


@query("q530_rule_overlap", oracle=_overlap_sql("duck"))
def q530_rule_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-redundancy matrix: pairwise Jaccard of the REJECTION sets
    of the five Gopher rules — Jaccard near 1 means a rule adds no
    filtering signal and can be dropped from the hot path.

    r10 P3 staging: the ten UNION ALL pair arms each re-ran the
    tokenize+flag corpus pass under Catalyst inlining (10 duplicate
    documents scans in the static plan). ONE corpus pass aggregates
    the 0/1-flag moments (n, per-rule sums, pairwise AND sums) into a
    single checkpointed row; the pair cells are exact BIGINT algebra
    on it — both_reject(a,b) = SUM((1-a)(1-b)) = n - s_a - s_b + s_ab
    and either_rejects(a,b) = n - s_ab, identities over 0/1 ints."""
    _views(spark, sf_dir)
    rules = ["r1_len", "r2_mwl", "r3_stop", "r4_topuni", "r5_distinct"]
    moms = ["CAST(COUNT(*) AS BIGINT) AS n"]
    moms += [f"CAST(SUM({a}) AS BIGINT) AS s_{a}" for a in rules]
    moms += [
        f"CAST(SUM({a} * {b}) AS BIGINT) AS s_{a}_{b}"
        for i, a in enumerate(rules)
        for b in rules[i + 1:]
    ]
    mom = spark.sql(
        f"WITH {_flags('spark')} SELECT {', '.join(moms)} FROM flags"
    ).localCheckpoint(eager=True)
    mom.createOrReplaceTempView("pretrain_overlap_mom_mv")
    arms = []
    for i, a in enumerate(rules):
        for b in rules[i + 1:]:
            arms.append(
                f"""
      SELECT '{a}' AS rule_a, '{b}' AS rule_b,
             CAST(n - s_{a} - s_{b} + s_{a}_{b} AS BIGINT) AS both_reject,
             CAST(n - s_{a}_{b} AS BIGINT) AS either_rejects
      FROM pretrain_overlap_mom_mv"""
            )
    union = " UNION ALL ".join(arms)
    return spark.sql(
        f"""
    WITH pairs AS ({union})
    SELECT rule_a, rule_b, both_reject, either_rejects,
           CASE WHEN either_rejects = 0 THEN CAST(0.0 AS DOUBLE)
                ELSE ROUND(CAST(both_reject AS DOUBLE) / either_rejects, 4)
           END AS rejection_jaccard
    FROM pairs
    """
    )
