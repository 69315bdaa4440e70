"""Similarity joins, time series, graph, sampling (q91-q93, q96-q97).

- q91 prefix-filtered exact Jaccard join (PPJoin-style, Xiao et al.):
  the EXACT alternative to the LSH chain (q31/q48) — no recall loss.
  Candidates come from an equi-join on shingle prefixes under a global
  rarest-first ordering; the classic theorem (prefix length
  |d| - ceil(t*|d|) + 1 under any fixed global order) guarantees no
  pair above the threshold is missed, so the oracle can be the plain
  all-pairs definition.
- q92 time-series resample + forward fill: the hourly-grid gap-filling
  join every metrics pipeline runs, built on the generic as-of
  operator (operators/asof.py), DuckDB native ASOF LEFT JOIN oracle.
- q93 triangle counting over the co-purchase graph (parts sharing an
  order): the canonical two-equi-join triangle enumeration on oriented
  edges (a<b<c), all-integer and exactly SQL-expressible.

Thresholds compare as exact integers (10*inter >= 7*union for t=0.7),
never as float ratios, so pair membership cannot drift by an ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import ensure_parallelism, load_table
from . import query
from .textops import _SHINGLES_DUCK, _shingle_exploded

# --- q91: prefix-filtered exact Jaccard self-join ----------------------------------
J_NUM, J_DEN = 7, 10  # threshold t = 0.7 as an exact rational
JACCARD_BCAST_DOCS = 500_000  # per-doc shingle-set table broadcast gate


def _shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return _shingle_exploded(docs, "doc_id").distinct()


@query(
    "q91_prefix_jaccard_join",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, list_distinct({_SHINGLES_DUCK}) AS w
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    p AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             len(list_intersect(a.w, b.w)) AS inter,
             len(a.w) AS la, len(b.w) AS lb
      FROM toks a JOIN toks b ON a.doc_id < b.doc_id
      WHERE len(a.w) > 0 AND len(b.w) > 0
    )
    SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
           ROUND(inter * 1.0 / (la + lb - inter), 6) AS jaccard
    FROM p WHERE {J_DEN} * inter >= {J_NUM} * (la + lb - inter)
    """,
)
def q91_prefix_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.7 self-join over 3-gram shingle sets via
    prefix filtering: order every doc's shingles rarest-first (global
    (freq, shingle) order), keep only the first |d| - ceil(0.7|d|) + 1
    as the prefix, and generate candidates from an equi-join on prefix
    shingles — two docs whose prefixes are disjoint provably cannot
    reach the threshold, so this finds EXACTLY the all-pairs answer
    (which is what the oracle computes) without LSH's recall loss or
    the n² pair join. Verification is PPJoin-style: each candidate
    pair picks up both docs' full shingle ARRAYS (broadcast lookups
    while the set table fits, shuffle joins above the gate) and
    intersects them JVM-side — the token-level re-join (candidates x
    doc size rows through two shuffles) never materializes.
    Shuffles: shingle freq, per-doc window, prefix equi-join, pair
    dedupe — all on natural keys."""
    # toks feeds the freq/rank lineage and the per-doc set table;
    # materialize once instead of re-running the scan+explode+distinct
    # lineage per consumer (same discipline as q86/q93)
    toks = _shingle_rows(spark, sf_dir).localCheckpoint()
    freq = toks.groupBy("sh").agg(F.count(F.lit(1)).alias("f"))
    wdoc = W.partitionBy("doc_id")
    ranked = (
        toks.join(freq, "sh")
        .withColumn("sz", F.count(F.lit(1)).over(wdoc))
        .withColumn(
            "rk",
            F.row_number().over(wdoc.orderBy(F.asc("f"), F.asc("sh"))),
        )
    )
    # prefix length |d| - ceil(t*|d|) + 1, all-integer: ceil(7d/10)
    plen = F.col("sz") - F.expr(f"({J_NUM} * sz + {J_DEN} - 1) div {J_DEN}") + 1
    prefix = ranked.filter(F.col("rk") <= plen).select("doc_id", "sh")
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # per-doc shingle sets as arrays (toks is already distinct); gate the
    # lookup strategy on the doc count — under the gate the whole set
    # table broadcasts and verification is map-side, above it the two
    # joins shuffle candidate-sized rows (never candidates x doc size)
    sets_ = toks.groupBy("doc_id").agg(F.collect_list("sh").alias("w"))
    # plan-shaping eager count (broadcast-vs-shuffle strategy gate, the
    # role AQE stats play) — not a data-flow scalar
    n_docs = sets_.count()
    maybe_bcast = F.broadcast if n_docs <= JACCARD_BCAST_DOCS else (lambda df: df)
    out = (
        cand.join(
            maybe_bcast(
                sets_.select(F.col("doc_id").alias("doc_a"), F.col("w").alias("wa"))
            ),
            "doc_a",
        )
        .join(
            maybe_bcast(
                sets_.select(F.col("doc_id").alias("doc_b"), F.col("w").alias("wb"))
            ),
            "doc_b",
        )
        .withColumn("inter", F.size(F.array_intersect("wa", "wb")).cast("bigint"))
        .withColumn(
            "uni", F.size("wa") + F.size("wb") - F.col("inter")
        )
        .filter(J_DEN * F.col("inter") >= J_NUM * F.col("uni"))
    )
    return out.select(
        "doc_a",
        "doc_b",
        "inter",
        F.round(F.col("inter") * F.lit(1.0) / F.col("uni"), 6).alias("jaccard"),
    )


# --- q92: hourly resample + forward fill -------------------------------------------
RESAMPLE_USERS = 15


@query(
    "q92_resample_ffill",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS _rn
      FROM events WHERE user_id < {RESAMPLE_USERS}
    ),
    e1 AS (SELECT user_id, ts, value FROM ev WHERE _rn = 1),
    b AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS mn, MAX(ts) AS mx
      FROM e1 GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS grid_ts
      FROM b
    )
    SELECT g.user_id, g.grid_ts, e.ts AS last_event_ts,
           ROUND(e.value, 6) AS last_value
    FROM grid g ASOF LEFT JOIN e1 e
      ON g.user_id = e.user_id AND g.grid_ts >= e.ts
    """,
)
def q92_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample of each user's event stream with forward fill:
    build the per-user hour grid (sequence explode from a bounded
    per-user min/max aggregate — no driver loop), then backward as-of
    join the last event at or before each grid point (operators/
    asof.py: union + one shuffle on user_id, never a range join).
    Same-timestamp ties pre-collapse to the max event_id row so the
    fill is deterministic. Grid cardinality = users x hours — output-
    sized, not event-sized."""
    from ..operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") < RESAMPLE_USERS
    )
    dedup = (
        ev.withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "value")
    )
    bounds = dedup.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"), F.max("ts").alias("mx")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.expr("sequence(mn, mx, interval 1 hour)")
        ).alias("grid_ts"),
    )
    joined = asof_join_backward(
        grid,
        dedup,
        on="user_id",
        left_ts="grid_ts",
        right_ts="ts",
        value_cols=("value",),
    )
    return joined.select(
        "user_id",
        "grid_ts",
        F.col("ts_asof").alias("last_event_ts"),
        F.round("value_asof", 6).alias("last_value"),
    )


# --- q93: triangle counting over the co-purchase graph -----------------------------
TRIANGLE_BCAST_EDGES = 3_000_000  # ~48 MB of (long, long) — under the 64 MB cap


@query(
    "q93_triangle_count",
    oracle="""
    WITH e AS (
      SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT CAST(tri.n_triangles AS BIGINT) AS n_triangles,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(COUNT(DISTINCT x) AS BIGINT)
            FROM (SELECT a AS x FROM e UNION ALL SELECT b FROM e)) AS n_nodes
    FROM tri
    """,
)
def q93_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph (parts co-occurring in
    an order): oriented edges a<b; each edge (a, b) counts the common
    ORIENTED out-neighbors of its endpoints, |N+(a) ∩ N+(b)| — triangle
    a<b<c is found exactly once, at its lowest edge (a, b), as c sits
    in both out-lists. This is edge-iterator triangle counting: the
    wedge stream of the two-join enumeration (Σ in·out ≈ 200M rows at
    sf0.1 on this near-uniform ~2M-edge graph) is never materialized or
    shuffled; the intersection runs JVM-side (array_intersect) over
    adjacency arrays whose total size is exactly the edge count.

    Edge build: per-order collect_set → in-array pair expansion (one
    shuffle on the order key; fan-out bounded by basket size) — ~40%
    faster than the self-join form, whose SMJ sorts the lineitem scan
    twice. The materialized edge count (needed for the n_edges output
    anyway) picks the join strategy: under ~3M edges the adjacency
    table broadcasts (the edge stream never shuffles); above, the two
    lookups fall back to shuffle joins on a and b — two edge-sized
    exchanges, still never the wedge stream. A pathological hub node
    at 100x scale would fatten one adjacency array; degree-ordering
    the orientation (lowest-degree endpoint first) is the documented
    escape hatch, count-invariant by symmetry."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(ps, (a, i) -> "
                "transform(slice(ps, i + 2, size(ps)), b -> struct(a AS a, b AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    e = pairs.distinct().localCheckpoint()
    n_edges = e.count()  # already required for the n_edges output column
    maybe_bcast = (
        F.broadcast if n_edges <= TRIANGLE_BCAST_EDGES else (lambda df: df)
    )
    adj = e.groupBy(F.col("a").alias("node")).agg(
        F.collect_list("b").alias("nbrs")
    )
    tri = (
        e.join(
            maybe_bcast(
                adj.select(F.col("node").alias("a"), F.col("nbrs").alias("na"))
            ),
            "a",
        )
        .join(
            # left: the highest-ordered node of an edge may have no out-edges
            maybe_bcast(
                adj.select(F.col("node").alias("b"), F.col("nbrs").alias("nb"))
            ),
            "b",
            "left",
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("nb").isNull(), F.lit(0)).otherwise(
                        F.size(F.array_intersect("na", "nb"))
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_triangles")
        )
    )
    stats = e.select(F.explode(F.array("a", "b")).alias("x")).agg(
        F.countDistinct("x").alias("n_nodes")
    )
    return (
        tri.withColumn("_k", F.lit(1))
        .join(stats.withColumn("_k", F.lit(1)), "_k")
        .select(
            "n_triangles",
            F.lit(n_edges).cast("bigint").alias("n_edges"),
            "n_nodes",
        )
    )


# --- q96: interval overlap join via day-bucket explosion ---------------------------
OUTAGE_MIN_ERRORS = 75


@query(
    "q96_interval_bucket_join",
    oracle=f"""
    WITH spans AS (
      SELECT user_id, event_type, MIN(ts) AS a_start, MAX(ts) AS a_end
      FROM events GROUP BY user_id, event_type
    ),
    outages AS (
      SELECT d AS w_start, d + INTERVAL 1 DAY AS w_end
      FROM (
        SELECT date_trunc('day', ts) AS d, COUNT(*) AS n
        FROM events WHERE event_type = 'error' GROUP BY 1
      ) WHERE n >= {OUTAGE_MIN_ERRORS}
    )
    SELECT s.user_id, s.event_type, o.w_start,
           CAST(LEAST(epoch_us(s.a_end), epoch_us(o.w_end))
                - GREATEST(epoch_us(s.a_start), epoch_us(o.w_start))
                AS BIGINT) AS overlap_us
    FROM spans s JOIN outages o
      ON s.a_start < o.w_end AND o.w_start <= s.a_end
    """,
)
def q96_interval_bucket_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval overlap join — activity spans vs high-error outage
    days — by DAY-BUCKET EXPLOSION: each span explodes into the days
    it covers and the join becomes a hash equi-join on the day key.
    The oracle states the same semantics as the theta range join; at
    100 TB the theta join is a nested-loop disaster while the bucketed
    form shuffles on the day and costs span-length x windows-per-day.
    Overlap durations are integer microseconds (epoch_us both engines)
    — no float anywhere."""
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("a_start"), F.max("ts").alias("a_end")
    )
    outages = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("w_start"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= OUTAGE_MIN_ERRORS)
        .select("w_start", F.expr("w_start + interval 1 day").alias("w_end"))
    )
    exploded = spans.select(
        "user_id",
        "event_type",
        "a_start",
        "a_end",
        F.explode(
            F.expr(
                "sequence(date_trunc('day', a_start), date_trunc('day', a_end), "
                "interval 1 day)"
            )
        ).alias("w_start"),
    )
    joined = exploded.join(outages, "w_start").filter(
        (F.col("a_start") < F.col("w_end")) & (F.col("w_start") <= F.col("a_end"))
    )
    overlap = F.least(
        F.unix_micros("a_end"), F.unix_micros("w_end")
    ) - F.greatest(F.unix_micros("a_start"), F.unix_micros("w_start"))
    return joined.select(
        "user_id", "event_type", "w_start", overlap.alias("overlap_us")
    )


# --- q97: deterministic weighted sampling ------------------------------------------
SAMPLE_PER_LANG = 20


@query(
    "q97_weighted_sample",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, lang, n_chars,
             ROUND(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                   * 1.0 / n_chars, 9) AS priority
      FROM documents WHERE n_chars > 0
    ),
    ranked AS (
      SELECT doc_id, lang, n_chars, priority,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY priority, doc_id) AS rk
      FROM pri
    )
    SELECT doc_id, lang, n_chars, priority, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {SAMPLE_PER_LANG}
    """,
)
def q97_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic size-weighted sampling: top-{SAMPLE_PER_LANG} docs
    per language by hash-priority / weight (longer docs -> smaller
    priority -> more likely sampled), the reproducible stand-in for
    weighted reservoir sampling — same sample on any engine, any run,
    any partitioning. Priority is one double division rounded to 9
    with a doc_id tie-break; the per-lang rank is a WindowGroupLimit
    (partial top-k before the one shuffle on lang)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    bucket = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as bigint)"
    )
    pri = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(bucket * F.lit(1.0) / F.col("n_chars"), 9).alias("priority"),
    )
    w = W.partitionBy("lang").orderBy(F.asc("priority"), F.asc("doc_id"))
    return (
        pri.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= SAMPLE_PER_LANG)
    )
