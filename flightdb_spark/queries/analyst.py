"""Analyst-toolkit batch 41 (q321-q323): price-volume-mix
decomposition (the FP&A bridge explaining WHY revenue moved),
t-closeness (completing the privacy trio after q178 k-anonymity and
q185 l-diversity), and Dunning's log-likelihood-ratio collocations
(the statistically-sound sibling of q157's PMI — G2 doesn't blow up
on rare pairs).

Determinism: PVM effects are algebra over DECIMAL revenue/quantity
sums (the identity delta = price_effect + volume_effect holds
exactly); t-closeness is total-variation distance over exact count
shares; G2 ln terms are computed on exact integer counts and the
statistic rounds once, with ordering on the rounded value plus a
token tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# ---------------------------------------------------------------------------
# q321 — price-volume-mix revenue bridge


@query(
    "q321_price_volume_mix",
    oracle="""
    WITH m0 AS (
      SELECT CAST(date_trunc('month', MIN(l_shipdate)) AS DATE) AS m1
      FROM lineitem
    ),
    per AS (
      SELECT p.p_type AS ptype,
             CASE WHEN CAST(date_trunc('month', l.l_shipdate) AS DATE) = m0.m1
                  THEN 1 ELSE 2 END AS period,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                 AS DECIMAL(38,4))) AS rev,
             SUM(CAST(ROUND(l.l_quantity, 2) AS DECIMAL(38,2))) AS vol
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey, m0
      WHERE CAST(date_trunc('month', l.l_shipdate) AS DATE)
              IN (m0.m1, m0.m1 + INTERVAL 1 MONTH)
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT a.ptype,
             CAST(a.rev AS DOUBLE) AS r1, CAST(a.vol AS DOUBLE) AS v1,
             CAST(b.rev AS DOUBLE) AS r2, CAST(b.vol AS DOUBLE) AS v2
      FROM per a JOIN per b ON b.ptype = a.ptype
      WHERE a.period = 1 AND b.period = 2
    )
    SELECT ptype,
           ROUND(r1, 2) AS rev_m1, ROUND(r2, 2) AS rev_m2,
           ROUND(r2 - r1, 2) AS delta,
           ROUND((r2 / v2 - r1 / v1) * v2, 2) AS price_effect,
           ROUND((v2 - v1) * (r1 / v1), 2) AS volume_effect
    FROM wide ORDER BY ptype
    """,
)
def q321_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix bridge between the first two shipping months,
    per part type: delta revenue decomposes exactly into a price
    effect (p2 - p1) * v2 and a volume effect (v2 - v1) * p1 — the
    finance bridge that answers 'did we sell more, or sell dearer?'
    (q296 flags WHICH segments shifted; this explains the total).
    The identity delta = price + volume holds to the cent because
    both effects derive from the same DECIMAL sums. Scale: one
    month-filtered scan (partition-prunable predicate), a
    (type, month) aggregate, and a 2-way pivot on ~150 type keys."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    part = load_table(spark, sf_dir, "part")
    first_month = (
        li.agg(
            F.date_trunc("month", F.min("l_shipdate")).cast("date").alias("m1")
        )
    )
    j = li.join(part, li.l_partkey == part.p_partkey).join(
        F.broadcast(first_month)
    )
    month = F.date_trunc("month", F.col("l_shipdate")).cast("date")
    per = (
        j.filter(
            (month == F.col("m1"))
            | (month == F.add_months(F.col("m1"), 1))
        )
        .groupBy(
            F.col("p_type").alias("ptype"),
            F.when(month == F.col("m1"), 1).otherwise(2).alias("period"),
        )
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(38,4)")
            ).alias("rev"),
            F.sum(F.round("l_quantity", 2).cast("decimal(38,2)")).alias("vol"),
        )
    )
    a = per.filter(F.col("period") == 1).select(
        "ptype",
        F.col("rev").cast("double").alias("r1"),
        F.col("vol").cast("double").alias("v1"),
    )
    b = per.filter(F.col("period") == 2).select(
        F.col("ptype").alias("ptype2"),
        F.col("rev").cast("double").alias("r2"),
        F.col("vol").cast("double").alias("v2"),
    )
    wide = a.join(b, a.ptype == b.ptype2)
    return wide.select(
        "ptype",
        F.round("r1", 2).alias("rev_m1"),
        F.round("r2", 2).alias("rev_m2"),
        F.round(F.col("r2") - F.col("r1"), 2).alias("delta"),
        F.round(
            (F.col("r2") / F.col("v2") - F.col("r1") / F.col("v1"))
            * F.col("v2"),
            2,
        ).alias("price_effect"),
        F.round(
            (F.col("v2") - F.col("v1")) * (F.col("r1") / F.col("v1")), 2
        ).alias("volume_effect"),
    ).orderBy("ptype")


# ---------------------------------------------------------------------------
# q322 — t-closeness audit

T_CLOSE_THRESHOLD = 0.15


@query(
    "q322_t_closeness",
    oracle=f"""
    WITH gdist AS (
      SELECT c_mktsegment AS seg,
             COUNT(*) * 1.0 / (SELECT COUNT(*) FROM customer) AS q
      FROM customer GROUP BY 1
    ),
    grp AS (
      SELECT c_nationkey AS nation, c_mktsegment AS seg,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2
    ),
    gtot AS (SELECT nation, SUM(n) AS nt FROM grp GROUP BY nation),
    tvd AS (
      SELECT t.nation, t.nt,
             0.5 * SUM(ABS(COALESCE(g.n, 0) * 1.0 / t.nt - gl.q)) AS t_dist
      FROM gtot t
      CROSS JOIN gdist gl
      LEFT JOIN grp g ON g.nation = t.nation AND g.seg = gl.seg
      GROUP BY t.nation, t.nt
    )
    SELECT nation, CAST(nt AS BIGINT) AS group_size,
           ROUND(t_dist, 6) AS t_closeness,
           CAST(CASE WHEN t_dist > {T_CLOSE_THRESHOLD} THEN 1 ELSE 0 END
             AS INT) AS violates
    FROM tvd ORDER BY nation
    """,
)
def q322_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit: for each quasi-identifier group (nation),
    the total-variation distance between its sensitive-attribute
    (market segment) distribution and the global one — a group whose
    segment mix diverges more than t leaks membership information
    even if it is k-anonymous (q178) and l-diverse (q185); this
    completes the anonymization audit trio. Scale: two grouped
    aggregates of the customer table; the TVD join runs on
    25 nations x 5 segments."""
    cust = load_table(spark, sf_dir, "customer")
    tot = cust.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    glob = (
        cust.groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).alias("segn"))
        .crossJoin(F.broadcast(tot))
        .select("seg", (F.col("segn") * 1.0 / F.col("n_total")).alias("q"))
    )
    grp = cust.groupBy(
        F.col("c_nationkey").alias("g_nation"),
        F.col("c_mktsegment").alias("g_seg"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    gtot = grp.groupBy(F.col("g_nation").alias("nation")).agg(
        F.sum("n").alias("nt")
    )
    expanded = gtot.join(F.broadcast(glob)).join(
        grp,
        (F.col("nation") == F.col("g_nation"))
        & (F.col("seg") == F.col("g_seg")),
        "left",
    ).select(
        F.col("nation").alias("nat"),
        "nt",
        "q",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    tvd = expanded.groupBy(F.col("nat").alias("nation"), F.col("nt")).agg(
        (0.5 * F.sum(F.abs(F.col("n") * 1.0 / F.col("nt") - F.col("q"))))
        .alias("t_dist")
    )
    return tvd.select(
        "nation",
        F.col("nt").cast("bigint").alias("group_size"),
        F.round("t_dist", 6).alias("t_closeness"),
        F.when(F.col("t_dist") > T_CLOSE_THRESHOLD, 1)
        .otherwise(0)
        .cast("int")
        .alias("violates"),
    ).orderBy("nation")


# ---------------------------------------------------------------------------
# q323 — Dunning log-likelihood-ratio collocations

LLR_TOPK = 20
LLR_MIN_PAIR = 5


@query(
    "q323_llr_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    bigrams AS (
      SELECT unnest(list_transform(
               range(1, len(ts)),
               i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) AS bg
      FROM toks
    ),
    pairs AS (
      SELECT bg.w1 AS w1, bg.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS k11
      FROM bigrams GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(k11) AS n FROM pairs),
    left_c AS (SELECT w1, SUM(k11) AS c1 FROM pairs GROUP BY w1),
    right_c AS (SELECT w2, SUM(k11) AS c2 FROM pairs GROUP BY w2),
    cells AS (
      SELECT p.w1, p.w2, p.k11,
             l.c1 - p.k11 AS k12,
             r.c2 - p.k11 AS k21,
             t.n - l.c1 - r.c2 + p.k11 AS k22,
             l.c1 AS c1, r.c2 AS c2, t.n AS n
      FROM pairs p
      JOIN left_c l ON l.w1 = p.w1
      JOIN right_c r ON r.w2 = p.w2, tot t
      WHERE p.k11 >= {LLR_MIN_PAIR}
    ),
    g2 AS (
      SELECT w1, w2, k11,
             ROUND(2 * (
               (CASE WHEN k11 > 0 THEN k11 * LN(k11 * 1.0 * n / (c1 * c2))
                ELSE 0 END)
             + (CASE WHEN k12 > 0 THEN k12 * LN(k12 * 1.0 * n
                    / (c1 * (n - c2))) ELSE 0 END)
             + (CASE WHEN k21 > 0 THEN k21 * LN(k21 * 1.0 * n
                    / ((n - c1) * c2)) ELSE 0 END)
             + (CASE WHEN k22 > 0 THEN k22 * LN(k22 * 1.0 * n
                    / ((n - c1) * (n - c2))) ELSE 0 END)), 6) AS llr
      FROM cells
    )
    SELECT w1, w2, k11 AS pair_count, llr
    FROM g2
    ORDER BY llr DESC, w1, w2
    LIMIT {LLR_TOPK}
    """,
)
def q323_llr_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood-ratio collocations: score every adjacent
    token bigram (>= {LLR_MIN_PAIR} occurrences) by G2 over its 2x2
    contingency against the corpus — the collocation statistic that,
    unlike q157's PMI, stays calibrated for rare pairs — and return
    the top-{LLR_TOPK}. Scale: bigrams come from an in-row adjacent-
    pair transform (no self-join), counts collapse in one shuffle,
    the marginal joins ride broadcast-size token tables, and the
    top-k orders by the ROUNDED statistic with a token tie-break so
    both engines cut the same boundary."""
    docs = load_table(spark, sf_dir, "documents")
    ts = F.split(F.col("text"), " ")
    # tokenize once: element_at(split(...)) inside the lambda was
    # re-evaluated per bigram (O(len²) characters per doc)
    bigrams = docs.select(ts.alias("_w")).select(
        F.explode(
            F.expr(
                "transform(slice(_w, 1, size(_w) - 1),"
                " (w, i) -> struct(w AS w1,"
                " element_at(_w, i + 2) AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    pairs = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("k11")
    )
    tot = pairs.agg(F.sum("k11").alias("n"))
    left_c = pairs.groupBy("w1").agg(F.sum("k11").alias("c1"))
    right_c = pairs.groupBy("w2").agg(F.sum("k11").alias("c2"))
    cells = (
        pairs.filter(F.col("k11") >= LLR_MIN_PAIR)
        .join(F.broadcast(left_c), "w1")
        .join(F.broadcast(right_c), "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "k11",
            (F.col("c1") - F.col("k11")).alias("k12"),
            (F.col("c2") - F.col("k11")).alias("k21"),
            (F.col("n") - F.col("c1") - F.col("c2") + F.col("k11")).alias(
                "k22"
            ),
            "c1",
            "c2",
            "n",
        )
    )

    def ll(k, num, den):
        return F.when(
            k > 0, k * F.log(k * 1.0 * F.col("n") / (num * den))
        ).otherwise(0.0)

    g2 = cells.select(
        "w1",
        "w2",
        F.col("k11").alias("pair_count"),
        F.round(
            2
            * (
                ll(F.col("k11"), F.col("c1"), F.col("c2"))
                + ll(F.col("k12"), F.col("c1"), F.col("n") - F.col("c2"))
                + ll(F.col("k21"), F.col("n") - F.col("c1"), F.col("c2"))
                + ll(
                    F.col("k22"),
                    F.col("n") - F.col("c1"),
                    F.col("n") - F.col("c2"),
                )
            ),
            6,
        ).alias("llr"),
    )
    return g2.orderBy(F.col("llr").desc(), "w1", "w2").limit(LLR_TOPK)
