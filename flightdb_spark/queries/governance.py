"""Governance / optimizer-statistics batch (q178-q181): k-anonymity
auditing, deterministic bootstrap confidence intervals, per-source
data-contract validation, and join-cardinality statistics — the
compliance and planner-feedback surfaces of a production engine
(beside q62 PII redaction, q104 profiling, q119 dataset cards, q160
referential integrity).

All bounded-aggregate compositions; the bootstrap's replica fan-out is
a constant (64) explode, never data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

_K_ANON = 5


@query(
    "q178_k_anonymity",
    oracle=f"""
    WITH deciled AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM customer
    ),
    groups AS (
      SELECT c_nationkey, c_mktsegment, bal_band, COUNT(*) AS gsize
      FROM deciled GROUP BY c_nationkey, c_mktsegment, bal_band
    )
    SELECT CASE WHEN gsize >= {_K_ANON} THEN 'anonymous' ELSE 'at_risk' END
             AS klass,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(gsize) AS BIGINT) AS n_rows,
           CAST(MIN(gsize) AS BIGINT) AS min_group,
           CAST(MAX(gsize) AS BIGINT) AS max_group
    FROM groups GROUP BY klass ORDER BY klass
    """,
)
def q178_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier tuple (nation,
    market segment, $1000 balance band): rows whose QI group has
    fewer than k={_K_ANON} members are re-identifiable and must be
    suppressed or generalized before the table ships as training
    data — the governance gate beside q62's span redaction. Plan: one
    shuffle on the QI tuple, then a 2-row class rollup; at 100 TB the
    QI cardinality (25 x 5 x ~10) stays constant, so the audit is one
    pass regardless of row count."""
    c = load_table(spark, sf_dir, "customer")
    groups = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("gsize"))
    return (
        groups.groupBy(
            F.when(F.col("gsize") >= _K_ANON, "anonymous")
            .otherwise("at_risk")
            .alias("klass")
        )
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("gsize").alias("n_rows"),
            F.min("gsize").cast("long").alias("min_group"),
            F.max("gsize").cast("long").alias("max_group"),
        )
        .orderBy("klass")
    )


_BOOT_REPS = 64


@query(
    "q179_bootstrap_ci",
    oracle=f"""
    WITH reps AS (SELECT unnest(range({_BOOT_REPS})) AS rep),
    included AS (
      SELECT r.rep, e.value
      FROM events e CROSS JOIN reps r
      WHERE ('0x' || substr(md5(CAST(r.rep AS VARCHAR) || ':' ||
               CAST(e.event_id AS VARCHAR)), 1, 1))::INTEGER % 2 = 0
    ),
    rep_means AS (
      SELECT rep,
             ROUND(CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM included GROUP BY rep
    )
    SELECT ROUND(CAST(SUM(CAST(m AS DECIMAL(38,6))) AS DOUBLE)
                 / {_BOOT_REPS}, 4) AS mean_of_means,
           ROUND(quantile_cont(m, 0.025), 4) AS ci_lo,
           ROUND(quantile_cont(m, 0.975), 4) AS ci_hi,
           CAST(COUNT(*) AS BIGINT) AS n_reps
    FROM rep_means
    """,
)
def q179_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic half-sample bootstrap: {_BOOT_REPS} replicas,
    each keeping ~half the events by md5(rep:event_id) parity
    (m-out-of-n subsampling — reproducible across engines AND runs,
    unlike rand()-seeded resampling whose row order Spark does not
    fix), replica means, and the 2.5/97.5 percentile interval — the
    error bar an experimentation platform attaches to any metric.
    Plan: constant 64-way explode (map side), ONE shuffle on rep for
    the replica means (64-row table), percentile over 64 rows.
    Replica sums accumulate per-row-rounded DECIMAL."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    reps = spark.range(_BOOT_REPS).select(F.col("id").alias("rep"))
    inc_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col("rep").cast("string"), F.col("event_id").cast("string")
                )
            ),
            1,
            1,
        ),
        16,
        10,
    ).cast("int")
    rep_means = (
        ev.crossJoin(F.broadcast(reps))
        .filter(inc_hash % 2 == 0)
        .groupBy("rep")
        .agg(
            F.round(
                F.sum(F.round("value", 6).cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("m")
        )
    )
    return rep_means.agg(
        F.round(
            F.sum(F.col("m").cast("decimal(38,6)")).cast("double") / _BOOT_REPS, 4
        ).alias("mean_of_means"),
        F.round(F.expr("percentile(m, 0.025)"), 4).alias("ci_lo"),
        F.round(F.expr("percentile(m, 0.975)"), 4).alias("ci_hi"),
        F.count(F.lit(1)).alias("n_reps"),
    )


@query(
    "q180_contract_validation",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) FILTER (WHERE text IS NULL OR text = '') AS BIGINT)
             AS empty_text,
           CAST(COUNT(*) FILTER (WHERE lang NOT IN ('en','de','fr','es','pt'))
             AS BIGINT) AS bad_lang,
           CAST(COUNT(*) FILTER (WHERE n_chars <> length(text)) AS BIGINT)
             AS stale_n_chars,
           CAST(COUNT(*) FILTER (WHERE n_chars <= 0) AS BIGINT) AS bad_len,
           ROUND(COUNT(*) FILTER (WHERE text IS NOT NULL AND text <> ''
                   AND lang IN ('en','de','fr','es','pt')
                   AND n_chars = length(text) AND n_chars > 0) * 1.0
                 / COUNT(*), 6) AS pass_rate
    FROM documents GROUP BY source ORDER BY source
    """,
)
def q180_contract_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-contract validation: null/empty text, language
    allowlist, derived-column consistency (n_chars must equal
    length(text)), positive length — with a per-source pass rate.
    The ingest gate a pipeline runs BEFORE q63's quality gate (broken
    contract != low quality). Plan: every rule is a conditional count
    in ONE aggregate over one scan; rules are row-local so the audit
    is embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    langs = ["en", "de", "fr", "es", "pt"]
    empty = F.col("text").isNull() | (F.col("text") == "")
    bad_lang = ~F.col("lang").isin(langs)
    stale = F.col("n_chars") != F.length("text")
    bad_len = F.col("n_chars") <= 0
    ok = ~empty & ~bad_lang & ~stale & ~bad_len
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            cnt(empty).alias("empty_text"),
            cnt(bad_lang).alias("bad_lang"),
            cnt(stale).alias("stale_n_chars"),
            cnt(bad_len).alias("bad_len"),
            F.round(cnt(ok) / F.count(F.lit(1)), 6).alias("pass_rate"),
        )
        .orderBy("source")
    )


@query(
    "q181_join_stats_audit",
    oracle="""
    WITH l AS (
      SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_keys
      FROM lineitem
    ),
    o AS (
      SELECT COUNT(*) AS n_rows, COUNT(DISTINCT o_orderkey) AS n_keys
      FROM orders
    ),
    j AS (
      SELECT COUNT(*) AS n_out
      FROM lineitem li JOIN orders od ON od.o_orderkey = li.l_orderkey
    )
    SELECT CAST(l.n_rows AS BIGINT) AS left_rows,
           CAST(l.n_keys AS BIGINT) AS left_keys,
           CAST(o.n_rows AS BIGINT) AS right_rows,
           CAST(o.n_keys AS BIGINT) AS right_keys,
           CAST(j.n_out AS BIGINT) AS join_rows,
           -- the textbook estimator |L||R| / max(V(L,k), V(R,k))
           CAST(l.n_rows * o.n_rows
                / greatest(l.n_keys, o.n_keys) AS BIGINT) AS est_rows,
           ROUND(j.n_out * 1.0 / (l.n_rows * o.n_rows
                / greatest(l.n_keys, o.n_keys)), 4) AS est_ratio
    FROM l, o, j
    """,
)
def q181_join_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality statistics audit: the System-R estimator
    |L||R| / max(V(L,k), V(R,k)) against the ACTUAL lineitem⋈orders
    output — the feedback loop an adaptive optimizer (and a capacity
    planner sizing shuffle partitions) closes after every run. An
    est_ratio far from 1 means stale NDV statistics. Plan: two
    1-row distinct-count aggregates, the measured join count, then
    pure arithmetic on three 1-row broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    l_stats = li.agg(
        F.count(F.lit(1)).alias("left_rows"),
        F.countDistinct("l_orderkey").alias("left_keys"),
    )
    r_stats = o.agg(
        F.count(F.lit(1)).alias("right_rows"),
        F.countDistinct("o_orderkey").alias("right_keys"),
    )
    j = (
        li.select("l_orderkey")
        .join(o.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("join_rows"))
    )
    est = (
        F.col("left_rows")
        * F.col("right_rows")
        / F.greatest("left_keys", "right_keys")
    )
    return (
        l_stats.join(F.broadcast(r_stats))
        .join(F.broadcast(j))
        .select(
            "left_rows",
            "left_keys",
            "right_rows",
            "right_keys",
            "join_rows",
            est.cast("long").alias("est_rows"),
            F.round(F.col("join_rows") / est, 4).alias("est_ratio"),
        )
    )
