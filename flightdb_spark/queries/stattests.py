"""Statistics / curation batch 9 (q192-q197): distributed two-sample
hypothesis tests over the bucketed prefix-sum primitive (Mann-Whitney
U with tie correction, Kolmogorov-Smirnov), one-way ANOVA from
single-pass group moments, a Benford first-digit audit, token-budget
data selection (the "best docs until the budget runs out" curation
move), and SemDeDup-style semantic dedup scoped to IVF cells.

Like the other extension batches these have no reference analog (the
reference's statistics stop at histogram mean/stddev/percentiles,
report/report.go:224-230); they are the operations a training-data
pipeline runs at 100 TB, built from the same primitives the
flight-domain operators use (operators/prefix.py, the q50 IVF cell
machinery).

Determinism per DETERMINISM.md: rank statistics stay in exact integer
arithmetic until one final assembled DOUBLE expression (§2-3); double
accumulation is per-row-rounded DECIMAL (§1); Benford's expected
shares are shared 6-dp literals, never engine-computed log10 (§5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.operators import vectors
from flightdb_spark.operators.prefix import ecdf_counts
from flightdb_spark.tables import load_table

from . import query
from .vector import _emb, N_CENTROIDS

# ---------------------------------------------------------------------------
# q192 — Mann-Whitney U rank-sum test (two-sample, tie-corrected)

MW_A = "click"
MW_B = "view"

# Shared final-expression text: the z statistic assembled from exact
# integer aggregates (r1x2 = 2*R1, ties = sum(t^3 - t)) in ONE double
# expression whose shape is identical on both engines ( / and * are
# IEEE-exact, sqrt is correctly rounded).
_MW_Z = """
ROUND(((r1x2 - n1 * (n1 + 1)) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0)
      / sqrt((CAST(n1 AS DOUBLE) * n2 / 12.0)
             * ((n1 + n2 + 1)
                - CAST(ties AS DOUBLE) / ((n1 + n2) * (n1 + n2 - 1.0)))), 6)
"""


@query(
    "q192_mann_whitney",
    oracle=f"""
    WITH labeled AS (
      SELECT value,
             SUM(CASE WHEN event_type = '{MW_A}' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN event_type = '{MW_B}' THEN 1 ELSE 0 END) AS nb
      FROM events WHERE event_type IN ('{MW_A}', '{MW_B}')
      GROUP BY value
    ),
    scan AS (
      SELECT na, nb, na + nb AS t,
             SUM(na + nb) OVER (ORDER BY value) - (na + nb) AS t_below
      FROM labeled
    ),
    agg AS (
      SELECT SUM(na) AS n1, SUM(nb) AS n2,
             SUM(na * (2 * t_below + t + 1)) AS r1x2,
             SUM(t * t * t - t) AS ties
      FROM scan
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           CAST(r1x2 - n1 * (n1 + 1) AS BIGINT) AS u_x2,
           {_MW_Z} AS z
    FROM agg
    """,
)
def q192_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between two event types' value
    distributions (normal approximation with the standard tie
    correction, no continuity correction). Average ranks over ties are
    carried as 2*R1 so everything is integer: per distinct value,
    na * (2*below + t + 1); U1*2 = 2*R1 - n1*(n1+1). The rank scan is
    operators/prefix.py's bucketed prefix sum — distinct-value keys,
    per-bucket windows, no global sort (q135's AUC is this same U as a
    ranking metric; this is the hypothesis-test form). One z
    expression at the end, identical text on both engines."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(MW_A, MW_B)
    )
    scan = ecdf_counts(
        ev,
        "value",
        {
            "na": F.when(F.col("event_type") == MW_A, 1).otherwise(0),
            "nb": F.when(F.col("event_type") == MW_B, 1).otherwise(0),
        },
        n_buckets=64,
    ).select(
        "na",
        "nb",
        (F.col("na") + F.col("nb")).alias("t"),
        (F.col("cum_na") + F.col("cum_nb") - F.col("na") - F.col("nb")).alias(
            "t_below"
        ),
    )
    agg = scan.agg(
        F.sum("na").alias("n1"),
        F.sum("nb").alias("n2"),
        F.sum(F.col("na") * (2 * F.col("t_below") + F.col("t") + 1)).alias("r1x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
    )
    return agg.select(
        F.col("n1").cast("bigint").alias("n_a"),
        F.col("n2").cast("bigint").alias("n_b"),
        (F.col("r1x2") - F.col("n1") * (F.col("n1") + 1))
        .cast("bigint")
        .alias("u_x2"),
        F.expr(_MW_Z).alias("z"),
    )


# ---------------------------------------------------------------------------
# q193 — Kolmogorov-Smirnov two-sample statistic

KS_A = "purchase"
KS_B = "error"


@query(
    "q193_ks_test",
    oracle=f"""
    WITH labeled AS (
      SELECT value,
             SUM(CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END) AS na,
             SUM(CASE WHEN event_type = '{KS_B}' THEN 1 ELSE 0 END) AS nb
      FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
      GROUP BY value
    ),
    scan AS (
      SELECT SUM(na) OVER (ORDER BY value) AS cna,
             SUM(nb) OVER (ORDER BY value) AS cnb
      FROM labeled
    ),
    tot AS (SELECT SUM(na) AS n1, SUM(nb) AS n2 FROM labeled)
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           CAST(MAX(ABS(cna * n2 - cnb * n1)) AS BIGINT) AS d_num,
           ROUND(CAST(MAX(ABS(cna * n2 - cnb * n1)) AS DOUBLE)
                 / (CAST(n1 AS DOUBLE) * n2), 6) AS d
    FROM scan, tot
    GROUP BY n1, n2
    """,
)
def q193_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic D = sup|F_a - F_b| over
    the two ECDFs, compared as exact cross-multiplied integers
    (|cum_a*n_b - cum_b*n_a|, DETERMINISM.md §3) so the sup is found
    on integers and divided exactly once. Same bucketed-prefix-scan
    shape as q192 — distinct-value keys, no global sort. The two
    global counts ride in as a broadcast single-row frame. (At
    extreme corpus sizes the integer product needs headroom — n_a*n_b
    must stay under 2^63, true through ~3e9 rows per side.)"""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(KS_A, KS_B)
    )
    scan = ecdf_counts(
        ev,
        "value",
        {
            "na": F.when(F.col("event_type") == KS_A, 1).otherwise(0),
            "nb": F.when(F.col("event_type") == KS_B, 1).otherwise(0),
        },
        n_buckets=64,
    )
    tot = scan.agg(
        F.sum("na").cast("bigint").alias("n1"), F.sum("nb").cast("bigint").alias("n2")
    )
    joined = scan.join(F.broadcast(tot))
    return (
        joined.select(
            "n1",
            "n2",
            F.abs(F.col("cum_na") * F.col("n2") - F.col("cum_nb") * F.col("n1")).alias(
                "dn"
            ),
        )
        .groupBy("n1", "n2")
        .agg(F.max("dn").alias("d_num"))
        .select(
            F.col("n1").alias("n_a"),
            F.col("n2").alias("n_b"),
            F.col("d_num").cast("bigint").alias("d_num"),
            F.round(
                F.col("d_num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2")),
                6,
            ).alias("d"),
        )
    )


# ---------------------------------------------------------------------------
# q194 — one-way ANOVA across event types


@query(
    "q194_anova_f",
    oracle="""
    WITH grp AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6))) AS sy,
             SUM(CAST(ROUND(value * value, 6) AS DECIMAL(38,6))) AS syy
      FROM events GROUP BY event_type
    ),
    comb AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(sy) AS DOUBLE) AS s,
             CAST(SUM(CAST(ROUND(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n, 6)
                           AS DECIMAL(38,6))) AS DOUBLE) AS ssq_grp,
             CAST(SUM(syy) AS DOUBLE) AS syy
      FROM grp
    )
    SELECT k, n,
           ROUND(((ssq_grp - s * s / n) / (k - 1))
                 / ((syy - ssq_grp) / (n - k)), 6) AS f,
           ROUND((ssq_grp - s * s / n) / (syy - s * s / n), 6) AS eta_sq
    FROM comb
    """,
)
def q194_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F across all event types (does mean value differ
    by type?) plus the eta-squared effect size, from single-pass group
    moments: per-group n / sum(y) / sum(y^2) with per-row-rounded
    DECIMAL accumulators, then the k-row combine keeps every cross-row
    sum in DECIMAL (the per-group sy^2/n term is rounded to 6 dp
    before the decimal re-sum, so merge order can't drift it) and
    assembles F in one final double expression. Plan: one shuffle on
    event_type into a |types|-row table; everything after is on
    bounded data."""
    ev = load_table(spark, sf_dir, "events")
    grp = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round("value", 6).cast("decimal(38,6)")).alias("sy"),
        F.sum(F.round(F.col("value") * F.col("value"), 6).cast("decimal(38,6)")).alias(
            "syy"
        ),
    )
    comb = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sy").cast("double").alias("s"),
        F.sum(
            F.round(F.col("sy").cast("double") * F.col("sy").cast("double") / F.col("n"), 6)
            .cast("decimal(38,6)")
        )
        .cast("double")
        .alias("ssq_grp"),
        F.sum("syy").cast("double").alias("syy"),
    )
    ssb = F.col("ssq_grp") - F.col("s") * F.col("s") / F.col("n")
    return comb.select(
        "k",
        "n",
        F.round(
            (ssb / (F.col("k") - 1)) / ((F.col("syy") - F.col("ssq_grp")) / (F.col("n") - F.col("k"))),
            6,
        ).alias("f"),
        F.round(
            ssb / (F.col("syy") - F.col("s") * F.col("s") / F.col("n")), 6
        ).alias("eta_sq"),
    )


# ---------------------------------------------------------------------------
# q195 — Benford first-digit audit

# log10(1 + 1/d) to 6 dp, as shared literals — NEVER engine-computed
# log10 (DETERMINISM.md §5: ln/log are not ulp-identical across libms).
BENFORD = {
    1: "0.301030",
    2: "0.176091",
    3: "0.124939",
    4: "0.096910",
    5: "0.079181",
    6: "0.066947",
    7: "0.057992",
    8: "0.051153",
    9: "0.045757",
}

_BENFORD_VALUES_SQL = ", ".join(f"({d}, {p})" for d, p in BENFORD.items())


@query(
    "q195_benford_audit",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                          AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
    ),
    obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit),
    tot AS (SELECT SUM(n) AS total FROM obs),
    exp_tbl(digit, p) AS (VALUES {_BENFORD_VALUES_SQL})
    SELECT e.digit, COALESCE(o.n, 0) AS n_orders, e.p AS expected_frac,
           ROUND(CAST(COALESCE(o.n, 0) AS DOUBLE) / total, 6) AS observed_frac,
           ROUND((COALESCE(o.n, 0) - total * e.p) * (COALESCE(o.n, 0) - total * e.p)
                 / (total * e.p), 6) AS chi_term
    FROM exp_tbl e LEFT JOIN obs o ON o.digit = e.digit, tot
    ORDER BY e.digit
    """,
)
def q195_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data / data-quality screen. The first significant digit
    is taken from the INTEGER cents value's decimal string (exact in
    both engines; log10/pow on doubles would waver at powers of ten),
    counted per digit, and compared against the shared 6-dp Benford
    literals with a per-digit chi-square term. Map-side digit extract,
    one 9-row aggregate — scan-bound at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = obs.agg(F.sum("n").alias("total"))
    exp_tbl = spark.createDataFrame(
        [(d, float(p)) for d, p in BENFORD.items()], "digit int, p double"
    )
    joined = (
        exp_tbl.join(obs, "digit", "left")
        .join(F.broadcast(tot))
        .select("digit", F.coalesce("n", F.lit(0)).alias("n"), "p", "total")
    )
    dev = F.col("n") - F.col("total") * F.col("p")
    return joined.select(
        "digit",
        F.col("n").alias("n_orders"),
        F.col("p").alias("expected_frac"),
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("observed_frac"),
        F.round(dev * dev / (F.col("total") * F.col("p")), 6).alias("chi_term"),
    ).orderBy("digit")


# ---------------------------------------------------------------------------
# q196 — token-budget data selection

TOKEN_BUDGET = 700  # tokens per source


@query(
    "q196_token_budget",
    oracle=f"""
    WITH scored AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             ROUND(CAST(n_chars AS DOUBLE)
                   / len(string_split(text, ' ')), 6) AS score
      FROM documents
    ),
    ranked AS (
      SELECT source, doc_id, n_tok, score,
             SUM(n_tok) OVER (PARTITION BY source
                              ORDER BY score DESC, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tok
      FROM scored
    )
    SELECT source, doc_id, n_tok, score, CAST(cum_tok AS BIGINT) AS cum_tok
    FROM ranked WHERE cum_tok <= {TOKEN_BUDGET}
    ORDER BY source, cum_tok
    """,
)
def q196_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data selection: per source, take documents in
    descending quality order (mean word length as the junk-filter
    proxy, 6-dp rounded with doc_id tie-break — DETERMINISM.md §4)
    until the per-source token budget is spent — the curation move
    behind 'best N tokens per domain' dataset mixes. One shuffle on
    source; the running total is a per-source window (bounded by the
    largest source — for a pathologically dominant source, swap in
    operators/prefix.bucketed_cumsum keyed inside that source, same
    values)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        F.round(
            F.col("n_chars").cast("double") / F.size(F.split("text", " ")), 6
        ).alias("score"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("score").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tok", F.sum("n_tok").over(w).cast("bigint"))
        .filter(F.col("cum_tok") <= TOKEN_BUDGET)
        .select("source", "doc_id", "n_tok", "score", "cum_tok")
        .orderBy("source", "cum_tok")
    )


# ---------------------------------------------------------------------------
# q197 — semantic dedup scoped to IVF cells

SEM_TH = "0.25"  # cosine threshold as a literal string shared by both sides
SEM_CELL_TARGET = 64  # target mean cell population: k = max(8, ceil(n/64))
SEM_MAX_CELL = 512  # circuit breaker: cells beyond this never pair


@query(
    "q197_semantic_dedup",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
      SELECT vec_id AS cid, v AS cv FROM e
      WHERE vec_id < (SELECT GREATEST({N_CENTROIDS},
                        CAST(CEIL(COUNT(*) / {SEM_CELL_TARGET}.0) AS BIGINT))
                      FROM e)
    ),
    asg AS (
      SELECT e.vec_id, e.v, cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, cv) / sqrt(list_inner_product(cv, cv)) DESC,
                        cid) AS rn
      FROM e, cents
    ),
    cells AS (SELECT vec_id, v, cid AS cell FROM asg WHERE rn = 1),
    pops AS (SELECT cell, COUNT(*) AS m FROM cells GROUP BY cell),
    kept AS (
      SELECT c.vec_id, c.v, c.cell FROM cells c
      JOIN pops p ON p.cell = c.cell AND p.m <= {SEM_MAX_CELL}
    ),
    dup AS (
      SELECT b.vec_id, b.cell, MIN(a.vec_id) AS canonical_id,
             MAX(ROUND(list_cosine_similarity(a.v, b.v), 6)) AS max_sim
      FROM kept a JOIN kept b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {SEM_TH}
      GROUP BY b.vec_id, b.cell
    )
    SELECT vec_id, cell, canonical_id, max_sim FROM dup
    ORDER BY vec_id
    """,
)
def q197_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: embeddings are assigned to their
    nearest coarse centroid (q50's map-side IVF assignment — broadcast
    centroid row + HOF argmax, zero shuffle), then near-duplicates are
    resolved ONLY within a cell: a vector is dropped when a lower-id
    cell-mate sits above the cosine threshold (greedy keep-lowest-id,
    the SemDeDup rule). Reports each dropped vector with its keeper
    and best similarity.

    Scale contract (the r6 sf1 rehearsal lesson — a FIXED k went 139x
    on 10x dup-dense data): the centroid count now tracks the corpus,
    k = max({N_CENTROIDS}, ceil(n/{SEM_CELL_TARGET})), so mean cell
    population stays ~{SEM_CELL_TARGET} and total pair work stays
    LINEAR in n (SemDeDup's own recipe — clusters sized ~constant);
    and semantic_dedup_drops' max_cell={SEM_MAX_CELL} circuit breaker
    excludes any dup-dense cell that still outgrows its budget from
    pair generation instead of going m^2. Both rules are mirrored in
    the oracle (k via a COUNT subquery, the cap via a cell-population
    join) so parity holds at every SF. The one eager action (count to
    size k) is plan-shaping, not data-flow — the same role AQE stats
    play. Cosine compared on the shared 6-dp rounding.
    Implementation: operators/vectors.py::semantic_dedup_drops (also a
    pipelines.py stage)."""
    e = _emb(spark, sf_dir)
    n = e.count()
    k = max(N_CENTROIDS, -(-n // SEM_CELL_TARGET))
    return vectors.semantic_dedup_drops(
        e, n_centroids=k, threshold=float(SEM_TH), max_cell=SEM_MAX_CELL
    ).orderBy("vec_id")
