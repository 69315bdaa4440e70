"""Sketch-engineering batch 50 (q348-q349): a count-min sketch built
and probed entirely in SQL (the streaming frequency-estimation
workhorse, with its one-sided overestimate measured against exact
counts) and a Bloom filter with its FALSE-POSITIVE RATE measured
against ground truth — the two sketches every large-scale pipeline
leans on for heavy-hitter gating and join pruning (q172 uses an
engine-side bloom to prune; this builds one from first principles
and audits it; q231/q260 are the KMV cardinality siblings).

Hashes are md5-derived bucket integers (the q64 discipline), so both
engines build bit-identical sketches. Everything is exact integer
counting — no estimator noise beyond the sketches' own documented
bias.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOPK = 10

BLOOM_BITS = 4096
BLOOM_K = 3

# ---------------------------------------------------------------------------
# q348 — count-min sketch


def _cms_bucket_duck(j: int) -> str:
    return (
        f"('0x' || substr(md5('{j}:' || w), 1, 8))::BIGINT % {CMS_WIDTH}"
    )


@query(
    "q348_countmin_sketch",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    truth AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY w
    ),
    rows_ AS (
      {" UNION ALL ".join(
        f"SELECT {j} AS j, {_cms_bucket_duck(j)} AS bucket, c FROM truth"
        for j in range(CMS_DEPTH)
      )}
    ),
    counters AS (
      SELECT j, bucket, SUM(c) AS cnt FROM rows_ GROUP BY j, bucket
    ),
    probes AS (
      SELECT w, c FROM truth ORDER BY c DESC, w LIMIT {CMS_TOPK}
    )
    SELECT p.w AS token, p.c AS true_count,
           CAST(MIN(co.cnt) AS BIGINT) AS cms_estimate,
           CAST(MIN(co.cnt) - p.c AS BIGINT) AS overestimate
    FROM probes p
    JOIN (
      {" UNION ALL ".join(
        f"SELECT {j} AS j, {_cms_bucket_duck(j)} AS bucket, w FROM probes"
        for j in range(CMS_DEPTH)
      )}
    ) ph ON ph.w = p.w
    JOIN counters co ON co.j = ph.j AND co.bucket = ph.bucket
    GROUP BY p.w, p.c
    ORDER BY true_count DESC, token
    """,
)
def q348_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch ({CMS_DEPTH} x {CMS_WIDTH}, md5 bucket
    hashes): fold exact token counts into the counter grid, then
    estimate the top-{CMS_TOPK} tokens as the MIN over their
    {CMS_DEPTH} counters and report the (always >= 0) overestimate
    against truth — the collision bias a CMS user sizes width
    against. Scale: the sketch build is a {CMS_DEPTH}-way map-side
    expansion of the ALREADY-AGGREGATED vocabulary (never the token
    stream) into {CMS_DEPTH * CMS_WIDTH} counters; probes ride a
    broadcast top-k."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("w"))
    truth = toks.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))

    def bucket(j: int, col: str = "w"):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), F.col(col))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % CMS_WIDTH
        )

    rows = None
    for j in range(CMS_DEPTH):
        part = truth.select(
            F.lit(j).alias("j"), bucket(j).alias("bucket"), "c"
        )
        rows = part if rows is None else rows.unionByName(part)
    counters = rows.groupBy("j", "bucket").agg(F.sum("c").alias("cnt"))
    probes = (
        truth.orderBy(F.col("c").desc(), "w").limit(CMS_TOPK).localCheckpoint()
    )
    ph = None
    for j in range(CMS_DEPTH):
        part = probes.select(
            "w", "c", F.lit(j).alias("j"), bucket(j).alias("bucket")
        )
        ph = part if ph is None else ph.unionByName(part)
    return (
        ph.join(counters, ["j", "bucket"])
        .groupBy(F.col("w").alias("token"), F.col("c").alias("true_count"))
        .agg(
            F.min("cnt").cast("bigint").alias("cms_estimate"),
            (F.min("cnt") - F.first("c")).cast("bigint").alias("overestimate"),
        )
        .orderBy(F.col("true_count").desc(), "token")
    )


# ---------------------------------------------------------------------------
# q349 — Bloom filter false-positive rate


def _bloom_bucket_duck(j: int, col: str) -> str:
    return (
        f"('0x' || substr(md5('{j}:' || CAST({col} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {BLOOM_BITS}"
    )


@query(
    "q349_bloom_fpr",
    oracle=f"""
    WITH members AS (SELECT DISTINCT o_custkey AS k FROM orders),
    bits AS (
      {" UNION ALL ".join(
        f"SELECT DISTINCT {_bloom_bucket_duck(j, 'k')} AS bit FROM members"
        for j in range(BLOOM_K)
      )}
    ),
    bitset AS (SELECT DISTINCT bit FROM bits),
    probes AS (
      SELECT c.c_custkey AS k,
             CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS is_member
      FROM customer c LEFT JOIN members m ON m.k = c.c_custkey
    ),
    checks AS (
      SELECT p.k, p.is_member,
             (CASE WHEN b0.bit IS NULL THEN 0 ELSE 1 END) + (CASE WHEN b1.bit IS NULL THEN 0 ELSE 1 END) + (CASE WHEN b2.bit IS NULL THEN 0 ELSE 1 END) AS hits
      FROM probes p
      LEFT JOIN bitset b0 ON b0.bit = ('0x' || substr(md5('0:' || CAST(p.k AS VARCHAR)), 1, 8))::BIGINT % 4096
      LEFT JOIN bitset b1 ON b1.bit = ('0x' || substr(md5('1:' || CAST(p.k AS VARCHAR)), 1, 8))::BIGINT % 4096
      LEFT JOIN bitset b2 ON b2.bit = ('0x' || substr(md5('2:' || CAST(p.k AS VARCHAR)), 1, 8))::BIGINT % 4096
    )
    SELECT CAST(SUM(is_member) AS BIGINT) AS n_members,
           CAST(SUM(1 - is_member) AS BIGINT) AS n_non_members,
           CAST(SUM(CASE WHEN hits = {BLOOM_K} AND is_member = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS false_positives,
           CAST(SUM(CASE WHEN hits < {BLOOM_K} AND is_member = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS false_negatives,
           ROUND(SUM(CASE WHEN hits = {BLOOM_K} AND is_member = 0
                     THEN 1 ELSE 0 END) * 1.0
                 / NULLIF(SUM(1 - is_member), 0), 6) AS fpr
    FROM checks
    """,
)
def q349_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter from first principles: insert every ordering
    customer into a {BLOOM_BITS}-bit / {BLOOM_K}-hash filter (the
    set of set bit positions), probe ALL customers, and measure the
    realized false-positive rate against exact membership — with
    false_negatives asserted zero (the Bloom guarantee). What q172
    delegates to the engine, built transparently so the FPR-vs-size
    tradeoff is measurable. Scale: the bitset is <= {BLOOM_BITS}
    rows and broadcasts; probes expand {BLOOM_K}-way map-side and
    semi-join the bitset — no shuffle of the probe stream beyond the
    final 1-row aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    members = orders.select(F.col("o_custkey").alias("k")).distinct()

    def bucket(j: int, col):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), col.cast("string"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % BLOOM_BITS
        )

    bits = None
    for j in range(BLOOM_K):
        part = members.select(bucket(j, F.col("k")).alias("bit"))
        bits = part if bits is None else bits.unionByName(part)
    bitset = bits.distinct().localCheckpoint()
    probes = (
        cust.select(F.col("c_custkey").alias("k"))
        .join(
            members.select(F.col("k"), F.lit(1).alias("is_m")), "k", "left"
        )
        .select("k", F.coalesce(F.col("is_m"), F.lit(0)).alias("is_member"))
    )
    checked = probes
    for j in range(BLOOM_K):
        hit = (
            bitset.select(F.col("bit").alias(f"bit{j}"))
        )
        checked = checked.join(
            F.broadcast(hit),
            bucket(j, F.col("k")) == F.col(f"bit{j}"),
            "left",
        ).withColumn(
            f"hit{j}", F.when(F.col(f"bit{j}").isNotNull(), 1).otherwise(0)
        ).drop(f"bit{j}")
    hits = sum(F.col(f"hit{j}") for j in range(BLOOM_K))
    agg = checked.select("is_member", hits.alias("hits"))
    return agg.agg(
        F.sum("is_member").cast("bigint").alias("n_members"),
        F.sum(1 - F.col("is_member")).cast("bigint").alias("n_non_members"),
        F.sum(
            F.when((F.col("hits") == BLOOM_K) & (F.col("is_member") == 0), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("false_positives"),
        F.sum(
            F.when((F.col("hits") < BLOOM_K) & (F.col("is_member") == 1), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("false_negatives"),
        F.round(
            F.sum(
                F.when(
                    (F.col("hits") == BLOOM_K) & (F.col("is_member") == 0), 1
                ).otherwise(0)
            )
            * 1.0
            / F.nullif(F.sum(1 - F.col("is_member")), F.lit(0)),
            6,
        ).alias("fpr"),
    )
