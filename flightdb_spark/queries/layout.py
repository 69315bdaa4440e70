"""Data-layout / engine-internals batch (q170-q173): Z-order
clustering keys, compaction bin-packing plans, bloom-filter partition
skipping, and iterative Lloyd k-means — the write-path and
maintenance-path operators a 100 TB lakehouse engine runs beside its
read-path queries.

The reference has no analog for any of these (its datastore is an App
Engine entity store with opaque blobs); they exist because a Spark
engine at fleet scale spends as much time ORGANIZING data (clustered
writes, compaction, skipping indexes) as scanning it. Every query
stays a bounded-aggregate / broadcast composition; the only iteration
(k-means) is two unrolled rounds in one lazy DAG — no driver loop, no
collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.operators.prefix import bucketed_cumsum
from flightdb_spark.tables import load_table

from . import query

# --- q170: Z-order clustering key + file-skipping stats ------------------------------
# 8 bits per dimension interleaved into a 16-bit Morton code. The
# same arithmetic rendered for each engine: Spark's shiftleft/
# shiftright functions, DuckDB's <</>> operators.
_Z_BITS = 8
_Z_FILES = 16


def _z_duck(x: str, y: str) -> str:
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


def _z_spark(x: F.Column, y: F.Column) -> F.Column:
    z = F.lit(0).cast("long")
    for b in range(_Z_BITS):
        z = z + F.shiftleft(F.shiftright(x, b).bitwiseAND(1), 2 * b)
        z = z + F.shiftleft(F.shiftright(y, b).bitwiseAND(1), 2 * b + 1)
    return z


@query(
    "q170_zorder_layout",
    oracle=f"""
    WITH cells AS (
      SELECT CAST(user_id AS BIGINT) AS ux,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS dy
      FROM events
    ),
    z AS (
      SELECT ux, dy, ({_z_duck('ux', 'dy')}) AS zval FROM cells
    )
    SELECT CAST(zval // {65536 // _Z_FILES} AS BIGINT) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(ux) AS min_user, MAX(ux) AS max_user,
           MIN(dy) AS min_day, MAX(dy) AS max_day
    FROM z GROUP BY file_id ORDER BY file_id
    """,
)
def q170_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, event day) and
    the min/max skipping stats of the {_Z_FILES}-file layout it
    produces — the write-path half of multi-dimensional file skipping
    (Delta/Iceberg OPTIMIZE ZORDER BY): a point query on EITHER
    dimension prunes most files because interleaved bits keep both
    min/max ranges narrow per file. Plan: the code is pure map-side
    bit arithmetic on the scan; the stats rollup is one shuffle on the
    16-value file id. At 100 TB the same expression feeds
    repartitionByRange(zval) before the writer — the stats table IS
    what the skipping index stores."""
    ev = load_table(spark, sf_dir, "events")
    ux = F.col("user_id").cast("long")
    dy = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).cast(
        "long"
    )
    z = (
        ev.select(ux.alias("ux"), dy.alias("dy"))
        .withColumn("zval", _z_spark(F.col("ux"), F.col("dy")))
    )
    return (
        z.groupBy(
            (F.col("zval") / (65536 // _Z_FILES)).cast("long").alias("file_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ux").alias("min_user"),
            F.max("ux").alias("max_user"),
            F.min("dy").alias("min_day"),
            F.max("dy").alias("max_day"),
        )
        .orderBy("file_id")
    )


# --- q171: compaction bin-packing plan -----------------------------------------------
_COMPACT_TARGET = 20_000  # chars per output file


@query(
    "q171_compaction_plan",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, n_chars,
             SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents
    ),
    binned AS (
      SELECT doc_id, n_chars, (cum - n_chars) // {_COMPACT_TARGET} AS bin_id
      FROM sized
    )
    SELECT CAST(bin_id AS BIGINT) AS bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS largest,
           CAST(MIN(n_chars) AS BIGINT) AS smallest
    FROM binned GROUP BY bin_id ORDER BY bin_id
    """,
)
def q171_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan: documents stand in for data files
    (n_chars = file bytes); sort size-descending and fill
    ~{_COMPACT_TARGET}-char output bins by exclusive running total —
    the deterministic next-fit-decreasing plan an OPTIMIZE command
    executes. Plan: the running total uses operators/prefix.py's
    bucketed scan-then-offset (the only global-ordered window is over
    the <=64-row bucket totals), so the planner itself scales to a
    fleet-sized file inventory; the per-bin rollup is one bounded
    shuffle. Sizes are integers — no float order sensitivity."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # one synthetic integer order key = (size desc, doc_id asc), so the
    # prefix operator's single order column is distinct per row
    keyed = docs.withColumn(
        "__ord", -(F.col("n_chars") * 100000 - F.col("doc_id"))
    )
    cum = bucketed_cumsum(keyed, "__ord", ["n_chars"])
    return (
        cum.withColumn(
            "bin_id",
            ((F.col("cum_n_chars") - F.col("n_chars")) / _COMPACT_TARGET).cast(
                "long"
            ),
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_chars").alias("total_chars"),
            F.max("n_chars").cast("long").alias("largest"),
            F.min("n_chars").cast("long").alias("smallest"),
        )
        .orderBy("bin_id")
    )


# --- q172: bloom-filter partition skipping -------------------------------------------
# 240-bit bloom per day-partition: 4 x 60-bit BIGINT lanes, 3 hash
# probes from disjoint md5 hex substrings (the q12/q64 portable-hash
# idiom). Lane arithmetic stays under 2^60 so neither engine's shift
# overflows.
_BLOOM_BITS = 240
_BLOOM_LANE = 60
_BLOOM_SEEDS = (1, 3, 5)  # md5 hex-char offsets (1-based), 2 chars each


def _bloom_pos_duck(key: str, off: int) -> str:
    return f"(('0x' || substr(md5(CAST({key} AS VARCHAR)), {off}, 2))::BIGINT % {_BLOOM_BITS})"


def _bloom_pos_spark(key: F.Column, off: int) -> F.Column:
    return (
        F.conv(F.substring(F.md5(key.cast("string")), off, 2), 16, 10).cast("long")
        % _BLOOM_BITS
    )


@query(
    "q172_bloom_prune",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    bits AS (
      SELECT day, user_id,
             {", ".join(f"{_bloom_pos_duck('user_id', o)} AS p{i}" for i, o in enumerate(_BLOOM_SEEDS))}
      FROM days
    ),
    lanes AS (
      SELECT day, u.lane, bit_or(1::BIGINT << u.bit) AS mask
      FROM bits, LATERAL (
        SELECT unnest([p0 // {_BLOOM_LANE}, p1 // {_BLOOM_LANE}, p2 // {_BLOOM_LANE}]) AS lane,
               unnest([p0 % {_BLOOM_LANE}, p1 % {_BLOOM_LANE}, p2 % {_BLOOM_LANE}]) AS bit
      ) u
      GROUP BY day, u.lane
    ),
    probes AS (
      SELECT DISTINCT user_id,
             {", ".join(f"{_bloom_pos_duck('user_id', o)} AS p{i}" for i, o in enumerate(_BLOOM_SEEDS))}
      FROM events WHERE user_id % 7 = 0
    ),
    probe_bits AS (
      SELECT p.user_id, u.lane, u.bit
      FROM probes p, LATERAL (
        SELECT unnest([p.p0 // {_BLOOM_LANE}, p.p1 // {_BLOOM_LANE}, p.p2 // {_BLOOM_LANE}]) AS lane,
               unnest([p.p0 % {_BLOOM_LANE}, p.p1 % {_BLOOM_LANE}, p.p2 % {_BLOOM_LANE}]) AS bit
      ) u
    ),
    hits AS (
      SELECT pb.user_id, d.day,
             BOOL_AND(COALESCE(l.mask & (1::BIGINT << pb.bit), 0) <> 0) AS positive
      FROM probe_bits pb
      CROSS JOIN (SELECT DISTINCT day FROM days) d
      LEFT JOIN lanes l ON l.day = d.day AND l.lane = pb.lane
      GROUP BY pb.user_id, d.day
    ),
    act AS (SELECT user_id, day FROM days)
    SELECT h.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(COUNT(*) FILTER (WHERE h.positive) AS BIGINT) AS n_scanned,
           CAST(COUNT(a.user_id) AS BIGINT) AS n_actual,
           CAST(COUNT(*) FILTER (WHERE h.positive) - COUNT(a.user_id) AS BIGINT)
             AS n_false_positive
    FROM hits h LEFT JOIN act a ON a.user_id = h.user_id AND a.day = h.day
    GROUP BY h.user_id ORDER BY h.user_id
    """,
)
def q172_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition skipping via per-day bloom filters: build a 240-bit
    bloom (4 BIGINT lanes, 3 md5-derived probes) over each day's user
    set, probe every 7th user against every day, and report scanned vs
    actually-needed days — the measured false-positive cost of the
    skipping index, the audit a lakehouse runs before trusting bloom
    metadata. Plan: the filter build is one (day, lane) aggregate of
    shifted bits (bit_or); the probe side is a probes x days
    broadcast nested-loop over BOUNDED dims (the bloom table, never
    the fact table) followed by one bounded rollup; events are
    touched exactly twice, both as aggregates."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    pos = [
        _bloom_pos_spark(F.col("user_id"), o).alias(f"p{i}")
        for i, o in enumerate(_BLOOM_SEEDS)
    ]
    bits = days.select("day", "user_id", *pos)
    lanes_arr = F.array(
        *[F.col(f"p{i}") / _BLOOM_LANE for i in range(len(_BLOOM_SEEDS))]
    )
    bits_arr = F.array(
        *[F.col(f"p{i}") % _BLOOM_LANE for i in range(len(_BLOOM_SEEDS))]
    )
    lanes = (
        bits.select(
            "day",
            F.explode(
                F.arrays_zip(
                    lanes_arr.cast("array<long>").alias("lane"),
                    bits_arr.alias("bit"),
                )
            ).alias("u"),
        )
        .select("day", F.col("u.lane").alias("lane"), F.col("u.bit").alias("bit"))
        .groupBy("day", "lane")
        # shiftleft by a COLUMN needs the SQL form (the PySpark helper
        # only accepts a literal shift amount)
        .agg(
            F.bit_or(
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
            ).alias("mask")
        )
    )
    probes = (
        ev.filter(F.col("user_id") % 7 == 0)
        .select("user_id")
        .distinct()
        .select("user_id", *pos)
    )
    probe_bits = probes.select(
        "user_id",
        F.explode(
            F.arrays_zip(
                F.array(*[F.col(f"p{i}") / _BLOOM_LANE for i in range(3)])
                .cast("array<long>")
                .alias("lane"),
                F.array(*[F.col(f"p{i}") % _BLOOM_LANE for i in range(3)]).alias(
                    "bit"
                ),
            )
        ).alias("u"),
    ).select("user_id", F.col("u.lane").alias("lane"), F.col("u.bit").alias("bit"))
    all_days = days.select("day").distinct()
    hits = (
        probe_bits.crossJoin(F.broadcast(all_days))
        .join(F.broadcast(lanes), ["day", "lane"], "left")
        .withColumn(
            "bit_set",
            F.coalesce(
                F.col("mask").bitwiseAND(
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))")
                ),
                F.lit(0),
            )
            != 0,
        )
        .groupBy("user_id", "day")
        .agg(F.min("bit_set").alias("positive"))
    )
    act = days.withColumnRenamed("user_id", "a_user").withColumnRenamed(
        "day", "a_day"
    )
    return (
        hits.join(
            act,
            (F.col("user_id") == F.col("a_user")) & (F.col("day") == F.col("a_day")),
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.when(F.col("positive"), 1).otherwise(0)).alias("n_scanned"),
            F.count("a_user").alias("n_actual"),
            (
                F.sum(F.when(F.col("positive"), 1).otherwise(0))
                - F.count("a_user")
            ).alias("n_false_positive"),
        )
        .orderBy("user_id")
    )


# --- q173: Lloyd k-means, two unrolled rounds ----------------------------------------
_KMEANS_K = 4


def _kmeans_assign_duck(vec_cte: str, cent_cte: str, out: str) -> str:
    """One assignment round: cosine to each centroid, rounded at 8 dp,
    argmax with centroid-id tie-break."""
    return f"""
    {out}_cos AS (
      SELECT e.vec_id, c.cid,
             ROUND(list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i]))
             / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(c.cv, x -> x * x)))), 8) AS cs
      FROM {vec_cte} e, {cent_cte} c
    ),
    {out} AS (
      SELECT vec_id, cid, cs FROM (
        SELECT vec_id, cid, cs,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        FROM {out}_cos
      ) WHERE rn = 1
    )"""


def _kmeans_cent_duck(assign_cte: str, out: str) -> str:
    """Recompute centroids as per-dim DECIMAL means of members."""
    return f"""
    {out}_dims AS (
      SELECT a.cid, u.dim, CAST(u.x AS DOUBLE) AS x
      FROM {assign_cte} a JOIN embeddings e ON e.vec_id = a.vec_id,
           LATERAL (SELECT unnest(e.embedding) AS x,
                           generate_subscripts(e.embedding, 1) AS dim) u
    ),
    {out} AS (
      SELECT cid, array_agg(m ORDER BY dim) AS cv FROM (
        SELECT cid, dim,
               CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS m
        FROM {out}_dims GROUP BY cid, dim
      ) GROUP BY cid
    )"""


@query(
    "q173_kmeans_lloyd",
    oracle=f"""
    WITH init AS (
      SELECT vec_id AS cid,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      FROM embeddings ORDER BY vec_id LIMIT {_KMEANS_K}
    ),
    {_kmeans_assign_duck('embeddings', 'init', 'a1')},
    {_kmeans_cent_duck('a1', 'c1')},
    {_kmeans_assign_duck('embeddings', 'c1', 'a2')}
    SELECT cid AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(CAST(SUM(CAST(cs AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*), 5)
             AS mean_cosine
    FROM a2 GROUP BY cid ORDER BY cid
    """,
)
def q173_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means (k={_KMEANS_K}), two unrolled rounds in one lazy
    DAG: deterministic init (the k smallest vec_ids), cosine
    assignment (rounded at 8 dp, centroid-id tie-break), per-dim
    DECIMAL centroid means, reassignment — the iterative-ML primitive
    (MLlib's own KMeans is this loop) expressed as pure DataFrame
    ops: centroids stay a k-row broadcast table, members NEVER
    shuffle for assignment, and each round adds one bounded
    (k x dims) aggregate. No collect, no driver loop; at 100 TB more
    rounds chain the same two stages with a localCheckpoint every few
    rounds (q51's lineage discipline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # seed ids ARE the centroid ids (no ranking window needed; the
    # orderBy().limit() compiles to TakeOrdered)
    init = (
        emb.orderBy("vec_id")
        .limit(_KMEANS_K)
        .select(
            F.col("vec_id").alias("cid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cv"),
        )
    )

    def assign(cents: DataFrame) -> DataFrame:
        dot = F.aggregate(
            F.zip_with("embedding", "cv", lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        vnorm = F.sqrt(
            F.aggregate(
                F.transform(
                    "embedding", lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        cnorm = F.sqrt(
            F.aggregate(
                F.transform("cv", lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        cos = emb.join(F.broadcast(cents)).select(
            "vec_id", "cid", F.round(dot / (vnorm * cnorm), 8).alias("cs")
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("cs"), "cid")
        return (
            cos.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cid", "cs")
        )

    def recenter(assigned: DataFrame) -> DataFrame:
        dims = (
            assigned.join(emb, "vec_id")
            .select("cid", F.posexplode("embedding").alias("d0", "xf"))
            .select("cid", (F.col("d0") + 1).alias("dim"), F.col("xf").cast("double").alias("x"))
        )
        cent = dims.groupBy("cid", "dim").agg(
            (
                F.sum(F.col("x").cast("decimal(38,10)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        return cent.groupBy("cid").agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("cv")
        )

    a1 = assign(init)
    c1 = recenter(a1)
    a2 = assign(c1)
    return (
        a2.groupBy(F.col("cid").alias("cluster_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(
                F.sum(F.col("cs").cast("decimal(38,8)")).cast("double")
                / F.count(F.lit(1)),
                5,
            ).alias("mean_cosine"),
        )
        .orderBy("cluster_id")
    )
