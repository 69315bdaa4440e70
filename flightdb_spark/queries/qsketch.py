"""Quantile-sketch batch 148 (q806-q810) — the histogram-sketch
machinery a distributed engine actually uses for percentiles at
100 TB: a fixed-width integer histogram (mergeable, one map-side
aggregate) for approximate quantiles with a PROVABLE rank-error
bound, and the two-pass refinement that upgrades any histogram
bucket to EXACT order statistics without ever sorting the corpus.

- q806 the coarse histogram: 256-cent buckets over event-value
  cents with cumulative counts/shares (cumulative via a bounded
  inequality join over ~192 bucket rows — never a window over data);
- q807 EXACT quantiles (p = 1, 5, 25, 50, 75, 95, 99) by two-pass
  refinement: locate each target's bucket in the coarse cumulative,
  then resolve the exact value INSIDE that bucket (a <=256-value
  bounded cumulative) — the scalable exact-percentile algorithm;
- q808 sketch-vs-exact error table: the bucket-upper-bound estimate
  against the exact quantile, with value error and achieved rank
  error (bounded by the bucket's mass share);
- q809 budget sweep: bucket widths 4096/1024/256 -> worst-case rank
  error bound (max bucket mass) and achieved median rank error per
  budget — the accuracy/space tradeoff table;
- q810 mergeability audit: per-shard histograms (user_id mod 4)
  merged by summing counts must equal the global build bucket for
  bucket (the property that makes the sketch distributable) —
  mismatches test-asserted to zero.

100 TB shape: every build is ONE map-side-combining aggregate into a
value-domain-bounded table (192 buckets at width 256); refinement
touches only the target buckets' rows (a pushdown-friendly filter);
the coarse cumulative is a bounded inequality join with a BROADCAST
hint; the in-bucket cumulative is a window PARTITIONED by target (each
partition <= 256 distinct cent values). Nothing sorts, nothing windows
the corpus.

Determinism: cents are exact integers; bucket ids are FLOOR of an
exact power-of-two division; all counts/ranks integer; target ranks
ceil(p*n/100) in integer arithmetic; shares terminal ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

WIDTH = 256  # cents per bucket
PCTS = [1, 5, 25, 50, 75, 95, 99]


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


_HIST_MV = "qsketch_hist_mv"

# the exact hist body inside _hist_cte(), swapped for the materialized
# view on the Spark side (oracle keeps the one-statement form)
_HIST_BODY = """hist AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM vals GROUP BY bucket
    ),"""


def _hist_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the 256-cent bucket census ONCE per query (r9 P3
    staging): under CTE inlining every `hist` reference — cum's two
    self-join sides, tot, shards' comparison — re-ran the corpus
    aggregate (11-13 events scans in q807/q808's static plans). The
    checkpoint is value-domain-bounded (~192 rows)."""
    _views(spark, sf_dir)
    h = spark.sql(f"WITH {_hist_cte()} SELECT bucket, cnt FROM hist")
    h.localCheckpoint(eager=True).createOrReplaceTempView(_HIST_MV)


def _spark_sql(full_sql: str) -> str:
    """Shared SQL with hist swapped for the checkpoint; the in-bucket
    refinement join gets an explicit BROADCAST on the <= 7-row target
    side (a LogicalRDD lineage reports the default size estimate, so
    auto-broadcast no longer fires — the q645 lesson)."""
    # drift guard (r10 ADVICE): a silent str.replace no-op would drop the
    # checkpoint/hint without any error — fail loudly instead
    assert _HIST_BODY in full_sql, "qsketch: _HIST_BODY drifted from _hist_cte()"
    out = full_sql.replace(
        _HIST_BODY, f"hist AS (SELECT bucket, cnt FROM {_HIST_MV}),", 1
    )
    anchor = "SELECT b.p, b.rank_target, v.cents,"
    if anchor in out:
        out = out.replace(
            anchor,
            "SELECT /*+ BROADCAST(b) */ b.p, b.rank_target, v.cents,",
            1,
        )
    return out


def _hist_cte() -> str:
    return f"""vals AS (
      SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             CAST(FLOOR(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  / {WIDTH}.0) AS BIGINT) AS bucket,
             user_id
      FROM events
    ),
    hist AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM vals GROUP BY bucket
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
    cum AS (
      SELECT /*+ BROADCAST(b) */ a.bucket, a.cnt,
             CAST(SUM(b.cnt) AS BIGINT) AS cum_cnt
      FROM hist a JOIN hist b ON b.bucket <= a.bucket
      GROUP BY a.bucket, a.cnt
    )"""


def _targets_cte() -> str:
    ps = ", ".join(f"({p})" for p in PCTS)
    return f"""pcts(p) AS (VALUES {ps}),
    targets AS (
      SELECT p, CAST(FLOOR((p * t.n + 99) / 100.0) AS BIGINT) AS rank_target,
             t.n
      FROM pcts CROSS JOIN tot t
    ),
    located AS (
      SELECT /*+ BROADCAST(tg) */ tg.p, tg.rank_target, tg.n,
             MIN(c.bucket) AS bucket
      FROM targets tg JOIN cum c ON c.cum_cnt >= tg.rank_target
      GROUP BY tg.p, tg.rank_target, tg.n
    ),
    base AS (
      -- count strictly below the located bucket: the inclusive
      -- cumulative at that bucket minus its own count (an EQUI join on
      -- bucket; the correlated "MAX(cum_cnt) WHERE bucket < l.bucket"
      -- form decorrelates to a CartesianProduct and is avoided)
      SELECT l.p, l.rank_target, l.n, l.bucket,
             CAST(c.cum_cnt - c.cnt AS BIGINT) AS below
      FROM located l JOIN cum c ON c.bucket = l.bucket
    )"""


# ---------------------------------------------------------------------------
# q806 — coarse histogram

_Q806_SQL = f"""
    WITH {_hist_cte()}
    SELECT c.bucket,
           CAST(c.bucket * {WIDTH} AS BIGINT) AS lo_cents,
           CAST((c.bucket + 1) * {WIDTH} - 1 AS BIGINT) AS hi_cents,
           c.cnt, c.cum_cnt,
           CAST(c.cum_cnt AS DOUBLE) / t.n AS cum_share,
           CAST(c.cnt AS DOUBLE) / t.n AS mass_share
    FROM cum c CROSS JOIN tot t
    ORDER BY c.bucket
    """


@query("q806_value_histogram", oracle=_Q806_SQL)
def q806_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable 256-cent histogram with cumulative counts and
    shares — one map-side aggregate plus a bounded bucket-level
    cumulative join. The max mass_share is q808's rank-error bound."""
    _hist_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q806_SQL))


# ---------------------------------------------------------------------------
# q807 — exact quantiles by two-pass refinement

_Q807_SQL = f"""
    WITH {_hist_cte()},
    {_targets_cte()},
    fine AS (
      SELECT b.p, b.rank_target, v.cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM base b JOIN vals v ON v.bucket = b.bucket
      GROUP BY b.p, b.rank_target, v.cents
    ),
    fcum AS (
      SELECT p, rank_target, cents,
             CAST(SUM(cnt) OVER (PARTITION BY p ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS incum
      FROM fine
    )
    SELECT b.p AS pct,
           b.rank_target,
           CAST(MIN(f.cents) AS BIGINT) AS exact_quantile_cents
    FROM base b JOIN fcum f
      ON f.p = b.p AND b.below + f.incum >= b.rank_target
    GROUP BY b.p, b.rank_target
    ORDER BY b.p
    """


@query("q807_exact_quantiles", oracle=_Q807_SQL)
def q807_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order statistics without a global sort: the coarse
    cumulative locates each target's bucket, then a bounded in-bucket
    cumulative (a window PARTITIONED by target, <= 256 distinct values
    per partition — never a join, never a global window) resolves the
    exact value. At cluster scale pass two reads only the target
    buckets' rows."""
    _hist_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q807_SQL))


# ---------------------------------------------------------------------------
# q808 — sketch vs exact

_Q808_SQL = f"""
    WITH {_hist_cte()},
    {_targets_cte()},
    fine AS (
      SELECT b.p, b.rank_target, v.cents,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM base b JOIN vals v ON v.bucket = b.bucket
      GROUP BY b.p, b.rank_target, v.cents
    ),
    fcum AS (
      SELECT p, rank_target, cents,
             CAST(SUM(cnt) OVER (PARTITION BY p ORDER BY cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS incum
      FROM fine
    ),
    exact AS (
      SELECT b.p, b.rank_target, b.n, b.bucket, b.below,
             CAST(MIN(f.cents) AS BIGINT) AS exact_cents
      FROM base b JOIN fcum f
        ON f.p = b.p AND b.below + f.incum >= b.rank_target
      GROUP BY b.p, b.rank_target, b.n, b.bucket, b.below
    ),
    est AS (
      SELECT e.p, e.rank_target, e.n, e.exact_cents,
             CAST((e.bucket + 1) * {WIDTH} - 1 AS BIGINT) AS est_cents,
             c.cum_cnt AS est_rank
      FROM exact e JOIN cum c ON c.bucket = e.bucket
    )
    SELECT p AS pct,
           exact_cents, est_cents,
           CAST(est_cents - exact_cents AS BIGINT) AS value_error_cents,
           CAST(est_rank - rank_target AS DOUBLE) / n AS rank_error
    FROM est
    ORDER BY p
    """


@query("q808_sketch_error", oracle=_Q808_SQL)
def q808_sketch_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the histogram alone would answer (bucket upper bound)
    against the exact quantile: value error < bucket width and rank
    error <= the bucket's mass share (test-asserted) — the guarantee
    that makes the one-pass sketch trustworthy."""
    _hist_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q808_SQL))


# ---------------------------------------------------------------------------
# q809 — budget sweep

_WIDTHS = [4096, 1024, 256]

_Q809_SQL = f"""
    WITH vals AS (
      SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM vals),
    sweeps AS (
      {" UNION ALL ".join(
        f'''SELECT CAST({w} AS BIGINT) AS width,
               CAST(FLOOR(cents / {w}.0) AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM vals GROUP BY CAST(FLOOR(cents / {w}.0) AS BIGINT)'''
        for w in _WIDTHS)}
    )
    SELECT s.width AS bucket_width_cents,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(s.cnt) AS BIGINT) AS max_bucket_count,
           CAST(MAX(s.cnt) AS DOUBLE) / t.n AS worst_rank_error_bound
    FROM sweeps s CROSS JOIN tot t
    GROUP BY s.width, t.n
    ORDER BY s.width DESC
    """


# Spark side: every sweep width is a multiple of the 256-cent build,
# and FLOOR(FLOOR(x/m)/k) == FLOOR(x/(m*k)) exactly (any sign), so all
# three sweeps re-aggregate the ONE checkpointed histogram — 4 corpus
# scans (3 sweeps + tot) -> 1. The oracle keeps the 3-scan UNION form.
_Q809_SPARK = f"""
    WITH tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM {_HIST_MV}),
    sweeps AS (
      SELECT CAST(w.w AS BIGINT) AS width,
             CAST(FLOOR(h.bucket / (w.w / {WIDTH}.0)) AS BIGINT) AS bucket,
             CAST(SUM(h.cnt) AS BIGINT) AS cnt
      FROM {_HIST_MV} h
      CROSS JOIN (VALUES {", ".join(f"({w})" for w in _WIDTHS)}) AS w(w)
      GROUP BY CAST(w.w AS BIGINT),
               CAST(FLOOR(h.bucket / (w.w / {WIDTH}.0)) AS BIGINT)
    )
    SELECT s.width AS bucket_width_cents,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(MAX(s.cnt) AS BIGINT) AS max_bucket_count,
           CAST(MAX(s.cnt) AS DOUBLE) / t.n AS worst_rank_error_bound
    FROM sweeps s CROSS JOIN tot t
    GROUP BY s.width, t.n
    ORDER BY s.width DESC
    """


@query("q809_sketch_budget_sweep", oracle=_Q809_SQL)
def q809_sketch_budget_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The accuracy/space frontier: for 4096/1024/256-cent buckets,
    the bucket count (space) and the worst-case rank-error bound (the
    heaviest bucket's mass share). Finer buckets: more space, tighter
    bound (test-asserted monotone). All three sweeps derive exactly
    from the one checkpointed 256-cent build."""
    _hist_view(spark, sf_dir)
    return spark.sql(_Q809_SPARK)


# ---------------------------------------------------------------------------
# q810 — mergeability audit

_Q810_SQL = f"""
    WITH {_hist_cte()},
    shards AS (
      SELECT CAST(user_id % 4 AS BIGINT) AS shard, bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM vals GROUP BY CAST(user_id % 4 AS BIGINT), bucket
    ),
    merged AS (
      SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM shards GROUP BY bucket
    ),
    cmp AS (
      SELECT COALESCE(m.bucket, h.bucket) AS bucket,
             COALESCE(m.cnt, 0) AS merged_cnt,
             COALESCE(h.cnt, 0) AS global_cnt
      FROM merged m FULL OUTER JOIN hist h ON h.bucket = m.bucket
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(merged_cnt) AS BIGINT) AS merged_total,
           CAST(SUM(global_cnt) AS BIGINT) AS global_total,
           CAST(SUM(CASE WHEN merged_cnt <> global_cnt THEN 1 ELSE 0 END)
                AS BIGINT) AS mismatched_buckets,
           CAST(COUNT(DISTINCT CAST(4 AS BIGINT)) * 4 AS BIGINT) AS n_shards
    FROM cmp
    """


@query("q810_sketch_mergeability", oracle=_Q810_SQL)
def q810_sketch_mergeability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributability proof: four per-shard histograms merged by
    summing counts equal the single-build histogram bucket for bucket
    (mismatched_buckets = 0, test-asserted) — exactly how the sketch
    combines across executors."""
    _hist_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q810_SQL))
