"""Mining batch 13 (q229-q235): rank correlations at scale (Spearman
via the bucketed prefix scan, Kendall tau-b via a bounded contingency),
a mergeable KMV distinct-count sketch audited against exact NDV,
T5-style deterministic span corruption (denoising training prep),
pairwise loss-of-separation conflict detection (the flight-domain
range join through a time+cell bucket equi-join), iterative k-core
decomposition (rows-only), and the Brier score with its
reliability/resolution/uncertainty decomposition.

Determinism per DETERMINISM.md: rank statistics keep every moment as
exact integers (average ranks DOUBLED into integers; tie terms carried
un-halved so no division happens before the final assembly) in
DECIMAL(38,0) accumulators, assembled once in double; the KMV
estimator is pure integer order statistics plus one final division;
span corruption is md5-gated index set algebra; conflicts threshold on
3-dp-rounded haversine so both engines make identical accept
decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.functions.geo import HAVERSINE_SQL
from flightdb_spark.operators.prefix import bucketed_cumsum
from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .synth import SYNTH_TP_CTE, synth_trackpoints

_DEC = "decimal(38,0)"

# ---------------------------------------------------------------------------
# q229 — Spearman rank correlation (quantity vs extended price)


@query(
    "q229_spearman",
    oracle="""
    WITH rows_ AS (
      SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem
    ),
    xr AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS t FROM rows_ GROUP BY x),
    xc AS (
      SELECT x, 2 * (SUM(t) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) - t)
               + t + 1 AS drx
      FROM xr
    ),
    yr AS (SELECT y, CAST(COUNT(*) AS BIGINT) AS t FROM rows_ GROUP BY y),
    yc AS (
      SELECT y, 2 * (SUM(t) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING) - t)
               + t + 1 AS dry
      FROM yr
    ),
    ranked AS (
      SELECT drx, dry FROM rows_ JOIN xc USING (x) JOIN yc USING (y)
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(drx AS DECIMAL(38,0))) AS sx,
             SUM(CAST(dry AS DECIMAL(38,0))) AS sy,
             SUM(CAST(drx AS DECIMAL(38,0)) * CAST(drx AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(dry AS DECIMAL(38,0)) * CAST(dry AS DECIMAL(38,0))) AS syy,
             SUM(CAST(drx AS DECIMAL(38,0)) * CAST(dry AS DECIMAL(38,0))) AS sxy
      FROM ranked
    )
    SELECT n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS spearman_rho
    FROM mom
    """,
)
def q229_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of quantity vs extended price — the
    monotone-association companion to q206's Pearson matrix (and, like
    q192's Mann-Whitney, a rank statistic that never sorts the corpus):
    average tied ranks come from per-DISTINCT-VALUE cumulative counts
    (the bucketed prefix scan; only its bucket-totals window is
    global), DOUBLED so every rank is an exact integer. Rows pick up
    their two ranks through natural-key equi-joins (the 50-value
    quantity rank table broadcasts), the five moments accumulate in
    DECIMAL(38,0) (order-free, exact), and rho is ONE assembled double
    expression — bit-identical across engines because every input to
    it is an exact integer."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x"), F.col("l_extendedprice").alias("y")
    )

    # x-rank table: ~50 distinct quantities, broadcastable.
    # Checkpointed: bucketed_cumsum re-executes its input 3x (edges,
    # windows, totals), so the lazy form re-ran the corpus aggregate
    # per reference (20 lineitem scans in the before plan).
    xdist = (
        li.groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .localCheckpoint(eager=True)
    )
    xc = bucketed_cumsum(xdist, "x", ["t"]).select(
        "x", (2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1).alias("drx")
    )

    # Collapse to the DISTINCT-y grain in ONE map-side-partial
    # aggregate, carrying the x-rank partial sums along: the cross
    # moment factors as sum_rows(drx*dry) = sum_y(dry * sum_{rows@y}
    # drx) because dry is constant within a y group, and likewise for
    # every other moment. This replaces the row-level shuffle join of
    # the full lineitem against the near-unique y rank table (the
    # query's dominant shuffle) with a single groupBy(y) whose partial
    # aggregation shrinks the shuffle to the distinct-y grain
    # (guide §2.3/§2.4). All partial sums stay exact DECIMAL(38,0).
    dxr = F.col("drx").cast(_DEC)
    ycells = (
        li.join(F.broadcast(xc), "x")
        .groupBy("y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("t"),
            F.sum(dxr).alias("sdrx"),
            F.sum(dxr * dxr).alias("sdrx2"),
        )
        # checkpointed: the y-grain prefix scan re-executes its input
        # 3x, re-running THIS corpus join+aggregate (the query's
        # dominant pass) per reference — noop 8.6-10.2 s lazy vs 3.3 s
        # checkpointed, 118 -> 18 Exchanges (xdist-only variant
        # measured worse on both: 86 Exchanges, noop 11.3 s)
        .localCheckpoint(eager=True)
    )
    ycum = bucketed_cumsum(ycells, "y", ["t"])
    ranked = ycum.select(
        "t", "sdrx", "sdrx2",
        (2 * (F.col("cum_t") - F.col("t")) + F.col("t") + 1).alias("dry"),
    )
    dy = F.col("dry").cast(_DEC)
    tt = F.col("t").cast(_DEC)
    mom = ranked.agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum("sdrx").alias("sx"),
        F.sum(tt * dy).alias("sy"),
        F.sum("sdrx2").alias("sxx"),
        F.sum(tt * dy * dy).alias("syy"),
        F.sum(dy * F.col("sdrx")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    rho = (d("n") * d("sxy") - d("sx") * d("sy")) / F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return mom.select("n", F.round(rho, 6).alias("spearman_rho"))


# ---------------------------------------------------------------------------
# q230 — Kendall tau-b over a bounded contingency table


@query(
    "q230_kendall_tau",
    oracle="""
    WITH cells AS (
      SELECT CAST(l_quantity AS BIGINT) AS x, CAST(l_linenumber AS BIGINT) AS y,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM lineitem GROUP BY 1, 2
    ),
    cd AS (
      SELECT COALESCE(SUM(CASE WHEN b.y > a.y
                      THEN CAST(a.c AS DECIMAL(38,0)) * b.c END), 0) AS conc,
             COALESCE(SUM(CASE WHEN b.y < a.y
                      THEN CAST(a.c AS DECIMAL(38,0)) * b.c END), 0) AS disc
      FROM cells a JOIN cells b ON b.x > a.x
    ),
    nx AS (
      SELECT SUM(CAST(tx AS DECIMAL(38,0)) * (tx - 1)) AS n1_2
      FROM (SELECT SUM(c) AS tx FROM cells GROUP BY x)
    ),
    ny AS (
      SELECT SUM(CAST(ty AS DECIMAL(38,0)) * (ty - 1)) AS n2_2
      FROM (SELECT SUM(c) AS ty FROM cells GROUP BY y)
    ),
    nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells)
    SELECT n,
           ROUND(2.0 * (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * (n - 1) - CAST(n1_2 AS DOUBLE))
                        * (CAST(n AS DOUBLE) * (n - 1) - CAST(n2_2 AS DOUBLE))),
                 6) AS kendall_tau_b
    FROM cd, nx, ny, nt
    """,
)
def q230_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between quantity and line number, computed ENTIRELY
    from the bounded contingency table (<= 50 x 7 cells): concordant /
    discordant pair mass is a cell-pair join (cells², never rows²), tie
    corrections come from the marginals, and every term stays an exact
    un-halved integer (n0-n1 = (n(n-1) - Σt(t-1))/2, so tau_b =
    2(C-D)/sqrt(...) needs no division before the final double
    assembly). The pairwise-concordance sibling of q229's Spearman —
    tau reads pair agreement, rho reads rank linearity; both at
    aggregate-output cost. One shuffle into the cell aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("bigint").alias("x"),
        F.col("l_linenumber").cast("bigint").alias("y"),
    )
    cells = li.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    b = cells.select(
        F.col("x").alias("xb"), F.col("y").alias("yb"), F.col("c").alias("cb")
    )
    prod = F.col("c").cast(_DEC) * F.col("cb")
    cd = (
        cells.join(F.broadcast(b), F.col("xb") > F.col("x"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("yb") > F.col("y"), prod)), F.lit(0).cast(_DEC)
            ).alias("conc"),
            F.coalesce(
                F.sum(F.when(F.col("yb") < F.col("y"), prod)), F.lit(0).cast(_DEC)
            ).alias("disc"),
        )
    )
    nx = (
        cells.groupBy("x")
        .agg(F.sum("c").alias("tx"))
        .agg(F.sum(F.col("tx").cast(_DEC) * (F.col("tx") - 1)).alias("n1_2"))
    )
    ny = (
        cells.groupBy("y")
        .agg(F.sum("c").alias("ty"))
        .agg(F.sum(F.col("ty").cast(_DEC) * (F.col("ty") - 1)).alias("n2_2"))
    )
    nt = cells.agg(F.sum("c").cast("bigint").alias("n"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    tau = (
        2.0
        * (d("conc") - d("disc"))
        / F.sqrt(
            (d("n") * (F.col("n") - 1) - d("n1_2"))
            * (d("n") * (F.col("n") - 1) - d("n2_2"))
        )
    )
    return (
        cd.join(F.broadcast(nx))
        .join(F.broadcast(ny))
        .join(F.broadcast(nt))
        .select("n", F.round(tau, 6).alias("kendall_tau_b"))
    )


# ---------------------------------------------------------------------------
# q231 — KMV (k minimum values) distinct-count sketch vs exact NDV

KMV_K = 64
KMV_DOMAIN = float(1 << 60)  # 15 hex digits of md5 → [0, 2^60)

_H_SPARK = (
    "cast(conv(substring(md5(cast(o_custkey as string)), 1, 15), 16, 10) "
    "as bigint)"
)
_H_DUCK = "('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT"


@query(
    "q231_kmv_ndv",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS grp, {_H_DUCK} AS hv
      FROM orders
    ),
    pg AS (
      SELECT grp, hv,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY hv) AS rn,
             COUNT(*) OVER (PARTITION BY grp) AS nd
      FROM h
    ),
    per_grp AS (
      SELECT grp,
             CASE WHEN MAX(nd) < {KMV_K} THEN CAST(MAX(nd) AS DOUBLE)
                  ELSE ({KMV_K} - 1) * {KMV_DOMAIN} / MAX(CASE WHEN rn = {KMV_K}
                       THEN hv END)
             END AS est,
             CAST(MAX(nd) AS BIGINT) AS exact_ndv
      FROM pg WHERE rn <= {KMV_K} GROUP BY grp
    ),
    mh AS (SELECT DISTINCT hv FROM h),
    mg AS (
      SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn,
             COUNT(*) OVER () AS nd
      FROM mh
    ),
    merged AS (
      SELECT 'ALL' AS grp,
             CASE WHEN MAX(nd) < {KMV_K} THEN CAST(MAX(nd) AS DOUBLE)
                  ELSE ({KMV_K} - 1) * {KMV_DOMAIN} / MAX(CASE WHEN rn = {KMV_K}
                       THEN hv END)
             END AS est,
             CAST(MAX(nd) AS BIGINT) AS exact_ndv
      FROM mg WHERE rn <= {KMV_K}
    ),
    un AS (SELECT * FROM per_grp UNION ALL SELECT * FROM merged)
    SELECT grp, ROUND(est, 2) AS est_ndv, exact_ndv,
           ROUND((est - exact_ndv) / exact_ndv, 4) AS rel_err
    FROM un
    """,
)
def q231_kmv_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch of active customers
    per order month, audited against exact NDV — the MERGEABLE
    cardinality sketch: a group's sketch is its {KMV_K} smallest
    60-bit md5 hashes, the union's sketch is the k smallest of the
    per-group sketch union (computed here over the same hash set), and
    the estimate is (k-1)·H/h_k. Unlike q56's HLL (rows-only, RNG-free
    but engine-internal), KMV is pure integer order statistics, so the
    WHOLE sketch pipeline is oracle-checked — per-group k-min is a
    keyed WindowGroupLimit top-k (partial before the shuffle), groups
    under k fall back to their exact count, and the 'ALL' row audits
    mergeability. The file-statistics NDV pattern of storage.py's
    manifest, as a query."""
    o = load_table(spark, sf_dir, "orders")
    h = (
        o.select(
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM").alias("grp"),
            F.expr(_H_SPARK).alias("hv"),
        )
        .distinct()
    )
    wk = Window.partitionBy("grp").orderBy("hv")
    wc = Window.partitionBy("grp")
    est_expr = (
        F.when(
            F.max("nd") < KMV_K, F.max("nd").cast("double")
        ).otherwise(
            F.lit(float(KMV_K - 1))
            * F.lit(KMV_DOMAIN)
            / F.max(F.when(F.col("rn") == KMV_K, F.col("hv")))
        )
    )
    per_grp = (
        h.withColumn("rn", F.row_number().over(wk))
        .withColumn("nd", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("grp")
        .agg(est_expr.alias("est"), F.max("nd").cast("bigint").alias("exact_ndv"))
    )
    mh = h.select("hv").distinct()
    # global k smallest: TakeOrdered(k), then one tiny aggregate; the
    # total distinct count comes from a separate full aggregate
    mk = mh.orderBy("hv").limit(KMV_K)
    nd_all = mh.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    merged = (
        mk.agg(
            F.max("hv").alias("hk"), F.count(F.lit(1)).alias("got")
        )
        .join(F.broadcast(nd_all))
        .select(
            F.lit("ALL").alias("grp"),
            F.when(F.col("nd") < KMV_K, F.col("nd").cast("double"))
            .otherwise(F.lit(float(KMV_K - 1)) * F.lit(KMV_DOMAIN) / F.col("hk"))
            .alias("est"),
            F.col("nd").alias("exact_ndv"),
        )
    )
    un = per_grp.unionByName(merged)
    return un.select(
        "grp",
        F.round("est", 2).alias("est_ndv"),
        "exact_ndv",
        F.round((F.col("est") - F.col("exact_ndv")) / F.col("exact_ndv"), 4).alias(
            "rel_err"
        ),
    )


# ---------------------------------------------------------------------------
# q232 — T5-style deterministic span corruption (denoising prep)

CORRUPT_SPAN = 3     # tokens per masked span
CORRUPT_MOD = 5      # every-3rd position masked when hash16 % 5 == 0 (~20%)

_GATE_SPARK = (
    "cast(conv(substring(md5(concat(cast(doc_id as string), ':', "
    "cast(pos as string))), 1, 4), 16, 10) as bigint)"
)
_GATE_DUCK = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
    "CAST(pos AS VARCHAR)), 1, 4))::BIGINT"
)


@query(
    "q232_span_corruption",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    tokpos AS (
      SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos, unnest(tk) AS tok,
             len(tk) AS n
      FROM toks
    ),
    starts AS (
      SELECT doc_id, pos,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS sidx
      FROM tokpos
      WHERE pos % {CORRUPT_SPAN} = 0 AND pos + {CORRUPT_SPAN} <= n
        AND {_GATE_DUCK} % {CORRUPT_MOD} = 0
    ),
    cov AS (
      SELECT s.doc_id, s.pos AS start, s.sidx, s.pos + d AS pos
      FROM starts s, unnest(range(0, {CORRUPT_SPAN})) r(d)
    ),
    masked_rows AS (
      SELECT t.doc_id, t.pos,
             CASE WHEN c.pos IS NULL THEN t.tok
                  WHEN c.pos = c.start THEN '<extra_id_' || c.sidx || '>'
             END AS tok
      FROM tokpos t
      LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
      WHERE c.pos IS NULL OR c.pos = c.start
    ),
    masked AS (
      SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS mtext
      FROM masked_rows GROUP BY doc_id
    ),
    targets AS (
      SELECT c.doc_id,
             string_agg(CASE WHEN c.pos = c.start
                             THEN '<extra_id_' || c.sidx || '> ' || t.tok
                             ELSE t.tok END,
                        ' ' ORDER BY c.pos) AS ttext
      FROM cov c JOIN tokpos t ON t.doc_id = c.doc_id AND t.pos = c.pos
      GROUP BY c.doc_id
    ),
    spans AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans FROM starts
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           COALESCE(s.n_spans, 0) AS n_spans,
           COALESCE(s.n_spans, 0) * {CORRUPT_SPAN} AS n_masked,
           md5(COALESCE(m.mtext, '')) AS masked_hash,
           md5(COALESCE(g.ttext, '')) AS targets_hash
    FROM toks t
    LEFT JOIN spans s USING (doc_id)
    LEFT JOIN masked m USING (doc_id)
    LEFT JOIN targets g USING (doc_id)
    """,
)
def q232_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020) as deterministic
    data prep: every 3rd token position opens a candidate span, an
    md5(doc, pos) gate keeps ~1/{CORRUPT_MOD} of them (≈20% of tokens
    masked, no RNG — the same corruption on any engine, any run, any
    partitioning), each masked span of {CORRUPT_SPAN} tokens collapses
    to a '<extra_id_k>' sentinel in the input and reappears after its
    sentinel in the target sequence. Spans start on multiples of
    {CORRUPT_SPAN} so they can never overlap — no greedy scan needed.
    Outputs ship md5(masked)/md5(targets) + exact counts. Shuffles:
    doc_id only (token explode, sentinel rank window, two per-doc
    reassemblies) — the q227 economics."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.split("text", " ").alias("tk"))
    tokpos = toks.select(
        "doc_id", F.size("tk").alias("n"), F.posexplode("tk").alias("pos", "tok")
    )
    ws = Window.partitionBy("doc_id").orderBy("pos")
    starts = (
        tokpos.filter(
            (F.col("pos") % CORRUPT_SPAN == 0)
            & (F.col("pos") + CORRUPT_SPAN <= F.col("n"))
            & (F.expr(_GATE_SPARK) % CORRUPT_MOD == 0)
        )
        .select("doc_id", "pos")
        .withColumn("sidx", F.row_number().over(ws) - 1)
    )
    cov = starts.select(
        "doc_id",
        F.col("pos").alias("start"),
        "sidx",
        F.explode(F.expr(f"sequence(pos, pos + {CORRUPT_SPAN - 1})")).alias("pos"),
    )
    joined = tokpos.join(cov, ["doc_id", "pos"], "left")
    masked_rows = joined.filter(
        F.col("start").isNull() | (F.col("pos") == F.col("start"))
    ).select(
        "doc_id",
        "pos",
        F.when(F.col("start").isNull(), F.col("tok")).otherwise(
            F.concat(F.lit("<extra_id_"), F.col("sidx"), F.lit(">"))
        ).alias("mtok"),
    )
    masked = masked_rows.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(sort_array(collect_list(struct(pos, mtok))), "
            "x -> x.mtok), ' ')"
        ).alias("mtext")
    )
    targets = (
        joined.filter(F.col("start").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.when(
                F.col("pos") == F.col("start"),
                F.concat(
                    F.lit("<extra_id_"), F.col("sidx"), F.lit("> "), F.col("tok")
                ),
            ).otherwise(F.col("tok")).alias("ttok"),
        )
        .groupBy("doc_id")
        .agg(
            F.expr(
                "array_join(transform(sort_array(collect_list(struct(pos, ttok))), "
                "x -> x.ttok), ' ')"
            ).alias("ttext")
        )
    )
    spans = starts.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans")
    )
    return (
        toks.join(spans, "doc_id", "left")
        .join(masked, "doc_id", "left")
        .join(targets, "doc_id", "left")
        .select(
            "doc_id",
            F.size("tk").cast("bigint").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            (F.coalesce("n_spans", F.lit(0)) * CORRUPT_SPAN).alias("n_masked"),
            F.md5(F.coalesce("mtext", F.lit(""))).alias("masked_hash"),
            F.md5(F.coalesce("ttext", F.lit(""))).alias("targets_hash"),
        )
    )


# ---------------------------------------------------------------------------
# q233 — pairwise loss-of-separation conflicts (time+cell bucket join)

# Encounter thresholds scaled to the sparse synthetic tracks (real
# loss-of-separation would be ~9 km / 1000 ft at a seconds cadence —
# same plan, tighter constants): 5-min co-time buckets, 10 km / 5000 ft.
# Cell 0.12° is >= 10 km in BOTH axes at these latitudes (lon shrinks to
# ~86.7 km/deg at 38.8°N, 0.12° = 10.4 km), so the 3x3 expansion is an
# exact cover of the radius.
SEP_SLOT_US = 300_000_000    # 5-minute co-time buckets
SEP_CELL_DEG = 0.12          # >= SEP_KM in both axes -> exact 3x3 cover
SEP_KM = 10.0                # horizontal proximity threshold
SEP_ALT_FT = 5000.0          # vertical proximity threshold


@query(
    "q233_separation_conflicts",
    oracle=f"""
    WITH {SYNTH_TP_CTE.strip()},
    pts AS (
      SELECT flight_id, lat, lon, alt_ft,
             epoch_us(ts) // {SEP_SLOT_US} AS slot,
             CAST(FLOOR(lat / {SEP_CELL_DEG}) AS BIGINT) AS cy,
             CAST(FLOOR(lon / {SEP_CELL_DEG}) AS BIGINT) AS cx
      FROM trackpoints
    ),
    expanded AS (
      SELECT flight_id, lat, lon, alt_ft, slot, cy + dy AS cy, cx + dx AS cx
      FROM pts, (VALUES (-1), (0), (1)) d1(dy), (VALUES (-1), (0), (1)) d2(dx)
    ),
    hits AS (
      SELECT a.flight_id AS flight_a, b.flight_id AS flight_b, a.slot,
             ROUND({HAVERSINE_SQL.format(lat1='a.lat', lon1='a.lon',
                                         lat2='b.lat', lon2='b.lon')}, 3) AS d_km,
             ABS(a.alt_ft - b.alt_ft) AS d_alt
      FROM pts a JOIN expanded b
        ON a.slot = b.slot AND a.cy = b.cy AND a.cx = b.cx
           AND a.flight_id < b.flight_id
    ),
    conf AS (
      SELECT DISTINCT flight_a, flight_b, slot, d_km, d_alt
      FROM hits WHERE d_km < {SEP_KM} AND d_alt < {SEP_ALT_FT}
    )
    SELECT flight_a, flight_b,
           CAST(COUNT(DISTINCT slot) AS BIGINT) AS n_slots,
           MIN(d_km) AS min_d_km
    FROM conf GROUP BY flight_a, flight_b
    """,
)
def q233_separation_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity-encounter detection: pairs of flights within {SEP_KM} km
    horizontally AND {SEP_ALT_FT} ft vertically in the same 1-minute
    slot — the airspace-safety range join, rewritten as a hash
    equi-join on (slot, cell) with one side expanded to its 3x3 cell
    neighborhood (the q47/q96 bucketing trick: cells are sized so the
    radius cannot escape the neighborhood, making the rewrite exact,
    and the join never approaches points²). Distances threshold on the
    3-dp-ROUNDED haversine so both engines accept identical pairs;
    altitudes are exact integral doubles by construction. At 100 TB the
    stream shuffles once on the natural (slot, cy, cx) key and hot
    cells ride AQE skew splitting."""
    tp = synth_trackpoints(spark, sf_dir).select(
        "flight_id", "lat", "lon", "alt_ft", "ts"
    )
    pts = tp.select(
        "flight_id",
        "lat",
        "lon",
        "alt_ft",
        F.expr(f"unix_micros(ts) div {SEP_SLOT_US}").alias("slot"),
        F.floor(F.col("lat") / SEP_CELL_DEG).alias("cy"),
        F.floor(F.col("lon") / SEP_CELL_DEG).alias("cx"),
    )
    offs = F.explode(
        F.array(
            *[
                F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
                for dy in (-1, 0, 1)
                for dx in (-1, 0, 1)
            ]
        )
    )
    expanded = pts.select(
        F.col("flight_id").alias("flight_b"),
        F.col("lat").alias("lat_b"),
        F.col("lon").alias("lon_b"),
        F.col("alt_ft").alias("alt_b"),
        "slot",
        "cy",
        "cx",
        offs.alias("o"),
    ).select(
        "flight_b",
        "lat_b",
        "lon_b",
        "alt_b",
        "slot",
        (F.col("cy") + F.col("o.dy")).alias("cy"),
        (F.col("cx") + F.col("o.dx")).alias("cx"),
    )
    d_km = F.round(
        F.expr(
            HAVERSINE_SQL.format(lat1="lat", lon1="lon", lat2="lat_b", lon2="lon_b")
        ),
        3,
    )
    conf = (
        pts.join(
            expanded,
            ["slot", "cy", "cx"],
        )
        .filter(F.col("flight_id") < F.col("flight_b"))
        .select(
            F.col("flight_id").alias("flight_a"),
            "flight_b",
            "slot",
            d_km.alias("d_km"),
            F.abs(F.col("alt_ft") - F.col("alt_b")).alias("d_alt"),
        )
        .filter((F.col("d_km") < SEP_KM) & (F.col("d_alt") < SEP_ALT_FT))
        .distinct()
    )
    return conf.groupBy("flight_a", "flight_b").agg(
        F.countDistinct("slot").cast("bigint").alias("n_slots"),
        F.min("d_km").alias("min_d_km"),
    )


# ---------------------------------------------------------------------------
# q234 — k-core decomposition (rows-only: data-dependent iteration count)

KCORE_K = 4
KCORE_MAX_ROUNDS = 30


def kcore(edges: DataFrame, k: int, max_rounds: int = KCORE_MAX_ROUNDS) -> DataFrame:
    """Nodes of the k-core of an undirected simple graph: repeatedly
    delete every node with degree < k until a fixpoint — the maximal
    subgraph where everyone keeps >= k neighbors. Each round is one
    degree aggregate + two semi-joins to restrict the edge list to
    surviving nodes, lineage truncated by localCheckpoint (use a
    reliable checkpoint dir on a cluster); the edge set only shrinks.
    The densest-region primitive beside q93's triangles and the
    connected-components operator. ``edges`` needs columns (a, b),
    one row per undirected edge, no self-loops required."""
    e = (
        edges.select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("a").alias("x"))
            .union(e.select(F.col("b").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("x")
        e2 = (
            e.join(keep.withColumnRenamed("x", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("x", "b"), "b", "left_semi")
            .localCheckpoint()
        )
        # plan-shaping eager counts: k-core fixed-point detection on the
        # localCheckpointed edge set (loop termination, not data flow)
        if e2.count() == e.count():
            e = e2
            break
        e = e2
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    return deg


def _q234_oracle() -> str:
    """Fixed {KCORE_MAX_ROUNDS}-round unroll of the peeling loop (the
    r8 q213-DTW unroll idea applied to a FIXPOINT): the Spark operator
    itself caps at KCORE_MAX_ROUNDS, and peeling rounds past the
    fixpoint delete nothing, so an unconditional 30-round chain
    computes the identical edge set — the data-dependent round count
    stops being an obstacle once both sides share the cap. Every round
    is MATERIALIZED (multi-referenced; the q813 CTE-inlining
    lesson)."""
    rounds = []
    for r in range(1, KCORE_MAX_ROUNDS + 1):
        p = f"e{r - 1}"
        rounds.append(f"""d{r} AS MATERIALIZED (
      SELECT x, COUNT(*) AS deg FROM (
        SELECT a AS x FROM {p} UNION ALL SELECT b AS x FROM {p}) u
      GROUP BY x
    ),
    k{r} AS MATERIALIZED (SELECT x FROM d{r} WHERE deg >= {KCORE_K}),
    e{r} AS MATERIALIZED (
      SELECT e.a, e.b FROM {p} e
      JOIN k{r} ka ON ka.x = e.a
      JOIN k{r} kb ON kb.x = e.b
    )""")
        chain = ",\n    ".join(rounds)
    return f"""
    WITH po AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
      FROM po a JOIN po b
        ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    {chain}
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
      SELECT a AS node FROM e{KCORE_MAX_ROUNDS}
      UNION ALL
      SELECT b AS node FROM e{KCORE_MAX_ROUNDS}) u
    GROUP BY node
    """


@query("q234_kcore", oracle=_q234_oracle())
def q234_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core of the co-purchase graph (q93's edge build):
    surviving parts with their in-core degree. Iterative peeling —
    degree aggregate + two semi-joins per round on a shrinking edge
    list, the q51-family loop discipline. HASH-VERIFIED since r8: the
    operator caps at KCORE_MAX_ROUNDS rounds and post-fixpoint rounds
    are no-ops, so the oracle unrolls exactly KCORE_MAX_ROUNDS peeling
    rounds (textbook self-join edges) and must produce the identical
    core; the pure-Python reference on hand-built graphs remains in
    tests/test_mining3_queries.py."""
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
    return kcore(pairs, KCORE_K)


# ---------------------------------------------------------------------------
# q235 — Brier score + reliability / resolution / uncertainty

BRIER_BINS = 10


@query(
    "q235_brier",
    oracle=f"""
    WITH lbl AS (
      SELECT value / 100.0 AS conf,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR(conf * {BRIER_BINS}) AS INT), {BRIER_BINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(ROUND(conf, 9) AS DECIMAL(38,9))) AS sconf,
             CAST(SUM(y) AS BIGINT) AS pos,
             SUM(CAST(ROUND((conf - y) * (conf - y), 9) AS DECIMAL(38,9))) AS sq
      FROM lbl GROUP BY 1
    ),
    tot AS (
      SELECT SUM(n) AS nt, SUM(pos) AS post, SUM(sq) AS sqt FROM binned
    ),
    terms AS (
      SELECT b.bin, b.n,
             CAST(b.sconf AS DOUBLE) / b.n AS cbar,
             CAST(b.pos AS DOUBLE) / b.n AS obar,
             CAST(t.post AS DOUBLE) / t.nt AS obar_g,
             t.nt, t.sqt
      FROM binned b, tot t
    )
    SELECT ROUND(CAST(MAX(sqt) AS DOUBLE) / MAX(nt), 6) AS brier,
           ROUND(SUM(n * (cbar - obar) * (cbar - obar)) / MAX(nt), 6)
             AS reliability,
           ROUND(SUM(n * (obar - obar_g) * (obar - obar_g)) / MAX(nt), 6)
             AS resolution,
           ROUND(MAX(obar_g) * (1 - MAX(obar_g)), 6) AS uncertainty
    FROM terms
    """,
)
def q235_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score of 'value/100 predicts purchase' with the Murphy
    decomposition over {BRIER_BINS} confidence bins: reliability (how
    far bin confidence sits from bin outcome — q201's ECE squared),
    resolution (how much the bins separate outcomes), uncertainty
    (base-rate variance); brier ≈ reliability - resolution +
    uncertainty up to within-bin confidence variance. The probability-
    quality triad next to q135 (ranking) and q201 (calibration). One
    shuffle into the 10-row bin aggregate; squared errors accumulate
    per-row-rounded DECIMAL, every output is one assembled double over
    the bounded bin table."""
    ev = load_table(spark, sf_dir, "events")
    conf = F.col("value") / 100.0
    lbl = ev.select(
        conf.alias("conf"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    binned = lbl.groupBy(
        F.least(
            F.floor(F.col("conf") * BRIER_BINS).cast("int"), F.lit(BRIER_BINS - 1)
        ).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round("conf", 9).cast("decimal(38,9)")).alias("sconf"),
        F.sum("y").cast("bigint").alias("pos"),
        F.sum(
            F.round((F.col("conf") - F.col("y")) * (F.col("conf") - F.col("y")), 9)
            .cast("decimal(38,9)")
        ).alias("sq"),
    )
    tot = binned.agg(
        F.sum("n").alias("nt"), F.sum("pos").alias("post"), F.sum("sq").alias("sqt")
    )
    cbar = F.col("sconf").cast("double") / F.col("n")
    obar = F.col("pos").cast("double") / F.col("n")
    obar_g = F.col("post").cast("double") / F.col("nt")
    terms = binned.join(F.broadcast(tot)).select(
        "bin",
        "n",
        cbar.alias("cbar"),
        obar.alias("obar"),
        obar_g.alias("obar_g"),
        "nt",
        "sqt",
    )
    return terms.agg(
        F.round(F.max("sqt").cast("double") / F.max("nt"), 6).alias("brier"),
        F.round(
            F.sum(
                F.col("n") * (F.col("cbar") - F.col("obar"))
                * (F.col("cbar") - F.col("obar"))
            )
            / F.max("nt"),
            6,
        ).alias("reliability"),
        F.round(
            F.sum(
                F.col("n") * (F.col("obar") - F.col("obar_g"))
                * (F.col("obar") - F.col("obar_g"))
            )
            / F.max("nt"),
            6,
        ).alias("resolution"),
        F.round(F.max("obar_g") * (1 - F.max("obar_g")), 6).alias("uncertainty"),
    )
