"""Advanced-statistics batch 46 (q337-q339): Neyman allocation (the
optimal stratified sampling design — budget proportional to stratum
size times stratum spread), Burrows' delta (the stylometry distance
used for authorship attribution, here measuring which sources write
most alike), and a Granger-style causality F-test (does yesterday's
event volume explain today's revenue beyond revenue's own lag?).

Determinism: every statistic assembles from per-row-rounded DECIMAL
moment sums. The Granger test runs ONE shared SQL text through both
engines (the q114 discipline) so the closed-form 3x3 Cramer solve is
character-identical on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

# ---------------------------------------------------------------------------
# q337 — Neyman allocation

NEYMAN_BUDGET = 1000


@query(
    "q337_neyman_allocation",
    oracle=f"""
    WITH mom AS (
      SELECT source, COUNT(*) AS n,
             CAST(SUM(CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(n_chars AS DECIMAL(38,0))
                      * CAST(n_chars AS DECIMAL(38,0))) AS DOUBLE) AS s2
      FROM documents GROUP BY source
    ),
    spread AS (
      SELECT source, n,
             SQRT((s2 - s1 * s1 / n) / (n - 1)) AS sd
      FROM mom WHERE n >= 2
    ),
    tot AS (
      SELECT SUM(CAST(ROUND(n * sd, 6) AS DECIMAL(38,6))) AS z FROM spread
    )
    SELECT s.source, CAST(s.n AS BIGINT) AS stratum_n,
           ROUND(s.sd, 4) AS stratum_sd,
           ROUND({NEYMAN_BUDGET} * (s.n * s.sd) / CAST(t.z AS DOUBLE), 2)
             AS neyman_alloc,
           ROUND({NEYMAN_BUDGET} * s.n
                 / (SELECT SUM(n) FROM spread), 2) AS proportional_alloc
    FROM spread s, tot t
    ORDER BY s.source
    """,
)
def q337_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman allocation for a {NEYMAN_BUDGET}-document stratified
    sample over sources: each stratum gets budget proportional to
    N_h * S_h (its size times its length spread) — minimum-variance
    stratified design, shown against naive proportional allocation so
    the variance win is visible per stratum (q53 executes stratified
    samples; this computes how big each stratum's sample SHOULD be).
    Scale: one source-keyed exact-moment aggregate (~20 rows), then
    closed-form assembly."""
    docs = load_table(spark, sf_dir, "documents")
    nchars = F.col("n_chars").cast("decimal(38,0)")
    mom = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(nchars).cast("double").alias("s1"),
        F.sum(nchars * nchars).cast("double").alias("s2"),
    )
    spread = mom.filter(F.col("n") >= 2).select(
        "source",
        "n",
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    tot = spread.agg(
        F.sum(F.round(F.col("n") * F.col("sd"), 6).cast("decimal(38,6)"))
        .alias("z"),
        F.sum("n").alias("nt"),
    )
    return (
        spread.join(F.broadcast(tot))
        .select(
            "source",
            F.col("n").cast("bigint").alias("stratum_n"),
            F.round("sd", 4).alias("stratum_sd"),
            F.round(
                NEYMAN_BUDGET * (F.col("n") * F.col("sd"))
                / F.col("z").cast("double"),
                2,
            ).alias("neyman_alloc"),
            F.round(
                NEYMAN_BUDGET * F.col("n") / F.col("nt"), 2
            ).alias("proportional_alloc"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q338 — Burrows' delta stylometry

DELTA_WORDS = 20
DELTA_TOPK = 20


@query(
    "q338_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    topw AS (
      SELECT w FROM toks GROUP BY w
      ORDER BY COUNT(*) DESC, w LIMIT {DELTA_WORDS}
    ),
    stot AS (SELECT source, COUNT(*) AS nt FROM toks GROUP BY source),
    freq AS (
      SELECT t.source, t.w, COUNT(*) * 1.0 / MAX(st.nt) AS f
      FROM toks t
      JOIN topw ON topw.w = t.w
      JOIN stot st ON st.source = t.source
      GROUP BY t.source, t.w
    ),
    grid AS (
      SELECT st.source, topw.w, COALESCE(fr.f, 0) AS f
      FROM stot st CROSS JOIN topw
      LEFT JOIN freq fr ON fr.source = st.source AND fr.w = topw.w
    ),
    wmom AS (
      SELECT w, COUNT(*) AS k,
             CAST(SUM(CAST(ROUND(f, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(f * f, 12) AS DECIMAL(38,12))) AS DOUBLE)
               AS s2
      FROM grid GROUP BY w
    ),
    z AS (
      SELECT g.source, g.w,
             (g.f - m.s1 / m.k)
               / SQRT(m.s2 / m.k - (m.s1 / m.k) * (m.s1 / m.k) + 1e-12)
               AS zval
      FROM grid g JOIN wmom m ON m.w = g.w
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             SUM(CAST(ROUND(ABS(a.zval - b.zval), 9) AS DECIMAL(38,9))) AS sd
      FROM z a JOIN z b ON b.w = a.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT src_a, src_b,
           ROUND(CAST(sd AS DOUBLE) / {DELTA_WORDS}, 6) AS delta
    FROM pairs
    ORDER BY delta, src_a, src_b
    LIMIT {DELTA_TOPK}
    """,
)
def q338_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' delta between sources: z-score each source's relative
    frequency of the {DELTA_WORDS} most common words (the 'function
    word' profile), and rank source pairs by the mean absolute
    z-difference — the stylometric distance used for authorship
    attribution, returning the {DELTA_TOPK} most similar pairs. A
    duplicate-provenance signal q121's fingerprint overlap can't see
    (style matches even when content differs). Scale: one token
    explode with a broadcast top-words join, a ~20x20 dense grid,
    and 190 pair rows — everything after the explode is tiny-table
    algebra with 9/12-dp DECIMAL moments."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(F.split("text", " ")).alias("w"))
    topw = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(DELTA_WORDS)
        .select("w")
        .localCheckpoint()
    )
    # r10 P3 staging: stot (per-source totals, <= #sources rows) was
    # referenced by freq AND grid, and z's grid pipeline was referenced
    # by BOTH pair sides — each reference re-ran the token explode under
    # Catalyst inlining (12 duplicate documents scans in the static
    # plan). Checkpoint the two bounded tables (stot, z) so the corpus
    # is exploded exactly twice (topw census + freq counts).
    stot = (
        toks.groupBy("source")
        .agg(F.count(F.lit(1)).alias("nt"))
        .localCheckpoint(eager=True)
    )
    freq = (
        toks.join(F.broadcast(topw), "w")
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .join(F.broadcast(stot), "source")
        .select("source", "w", (F.col("c") * 1.0 / F.col("nt")).alias("f"))
    )
    grid = (
        stot.select("source")
        .join(F.broadcast(topw))
        .join(freq, ["source", "w"], "left")
        .select("source", "w", F.coalesce(F.col("f"), F.lit(0.0)).alias("f"))
    )
    wmom = grid.groupBy("w").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(F.round("f", 9).cast("decimal(38,9)")).cast("double").alias(
            "s1"
        ),
        F.sum(F.round(F.col("f") * F.col("f"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s2"),
    )
    m = F.col("s1") / F.col("k")
    z = grid.join(F.broadcast(wmom), "w").select(
        "source",
        "w",
        (
            (F.col("f") - m)
            / F.sqrt(F.col("s2") / F.col("k") - m * m + 1e-12)
        ).alias("zval"),
    )
    # bounded: DELTA_WORDS x #sources rows; the pair self-join below
    # reads the checkpoint twice instead of the corpus pipeline twice
    z = z.localCheckpoint(eager=True)
    za = z.select(
        F.col("source").alias("src_a"), "w", F.col("zval").alias("z_a")
    )
    zb = z.select(
        F.col("source").alias("src_b"),
        F.col("w").alias("wb"),
        F.col("zval").alias("z_b"),
    )
    pairs = (
        za.join(
            F.broadcast(zb),
            (F.col("w") == F.col("wb")) & (F.col("src_a") < F.col("src_b")),
        )
        .groupBy("src_a", "src_b")
        .agg(
            F.sum(
                F.round(F.abs(F.col("z_a") - F.col("z_b")), 9).cast(
                    "decimal(38,9)"
                )
            ).alias("sd")
        )
    )
    return (
        pairs.select(
            "src_a",
            "src_b",
            F.round(F.col("sd").cast("double") / DELTA_WORDS, 6).alias(
                "delta"
            ),
        )
        .orderBy("delta", "src_a", "src_b")
        .limit(DELTA_TOPK)
    )


# ---------------------------------------------------------------------------
# q339 — Granger-style F test (shared SQL text on both engines)

_GRANGER_SQL = """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS DOUBLE) AS x,
             CAST(SUM(CAST(ROUND(value, 4) AS DECIMAL(38,4))) AS DOUBLE) AS y
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    lagged AS (
      SELECT d, y,
             LAG(y) OVER (ORDER BY d) AS yl,
             LAG(x) OVER (ORDER BY d) AS xl
      FROM daily
    ),
    obs AS (
      SELECT y, yl, xl FROM lagged WHERE yl IS NOT NULL AND xl IS NOT NULL
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(ROUND(y, 4) AS DECIMAL(38,4))) AS sy,
             SUM(CAST(ROUND(yl, 4) AS DECIMAL(38,4))) AS sa,
             SUM(CAST(ROUND(xl, 4) AS DECIMAL(38,4))) AS sb,
             SUM(CAST(ROUND(yl * yl, 6) AS DECIMAL(38,6))) AS saa,
             SUM(CAST(ROUND(xl * xl, 6) AS DECIMAL(38,6))) AS sbb,
             SUM(CAST(ROUND(yl * xl, 6) AS DECIMAL(38,6))) AS sab,
             SUM(CAST(ROUND(y * yl, 6) AS DECIMAL(38,6))) AS sya,
             SUM(CAST(ROUND(y * xl, 6) AS DECIMAL(38,6))) AS syb,
             SUM(CAST(ROUND(y * y, 6) AS DECIMAL(38,6))) AS syy
      FROM obs
    ),
    cent AS (
      SELECT CAST(n AS DOUBLE) AS n,
             CAST(saa AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
               / n AS caa,
             CAST(sbb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
               / n AS cbb,
             CAST(sab AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
               / n AS cab,
             CAST(sya AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sa AS DOUBLE)
               / n AS cya,
             CAST(syb AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sb AS DOUBLE)
               / n AS cyb,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
               / n AS cyy
      FROM mom
    ),
    fit AS (
      SELECT n,
             -- restricted: y ~ 1 + yl
             cyy - cya * cya / caa AS rss_r,
             -- unrestricted: y ~ 1 + yl + xl (2x2 solve on centered moments)
             cyy - (cya * (cbb * cya - cab * cyb)
                    + cyb * (caa * cyb - cab * cya))
                   / (caa * cbb - cab * cab) AS rss_u
      FROM cent
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(rss_r, 4) AS rss_restricted,
           ROUND(rss_u, 4) AS rss_unrestricted,
           ROUND(((rss_r - rss_u) / 1) / (rss_u / (n - 3)), 6) AS f_stat
    FROM fit
"""


@query("q339_granger_f", oracle=_GRANGER_SQL)
def q339_granger_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger-style causality F: does yesterday's event VOLUME
    explain today's revenue beyond revenue's own one-day lag? Fit
    the restricted AR(1) and the unrestricted model with the lagged
    exogenous regressor closed-form (centered normal equations,
    Cramer 2x2) and report F = ((RSS_r - RSS_u)/1)/(RSS_u/(n-3)) —
    the time-series sibling of q184's grouped OLS (q247's xcorr
    finds the lag; this tests it). The IDENTICAL SQL text runs on
    Spark and DuckDB (q114 discipline), so the algebra cannot
    diverge. Scale: one daily aggregate, one ordered lag over the
    tiny day table, a single-row moment reduction."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_GRANGER_SQL)
