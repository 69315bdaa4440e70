"""Mining batches 10-11 (q198-q221): graph reachability (BFS),
multi-touch attribution, KL drift, calibration (ECE / confusion /
average precision), Douglas-Peucker and DTW track geometry, BPE
tokenizer train+encode, survival (Kaplan-Meier), Mann-Kendall trend,
one-scan correlation matrix, audio silence runs, two-scan k-fold CV,
join-skew audit, quantile normalization, quality-aware dedup
canonicalization, DAU/WAU stickiness, airspace occupancy, repeat
intervals, the oracle-verified Spark-4 Python Data Source, GROUPING
SETS, and airway conformance. Each docstring names the sibling
operator it extends and its 100 TB plan shape (PLANS.md has the
audit).

Determinism: BFS/BPE are pure integer computations; attribution
credits are integer flags plus per-row-rounded DECIMAL linear shares;
KL rounds transcendental terms 4 decimals finer than the output
(DETERMINISM.md §5); ECE is exact double arithmetic in one assembled
shape per term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.operators.prefix import ecdf_counts
from flightdb_spark.operators.simplify import douglas_peucker
from flightdb_spark.tables import load_table

from . import query
from .synth import synth_trackpoints

# ---------------------------------------------------------------------------
# q198 — BFS hop distances (bounded-depth reachability)

BFS_HOPS = 3

_BFS_EDGES = """
    e0 AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    seed AS (SELECT MIN(l_partkey) * 2 AS node FROM lineitem),
    d0 AS (SELECT node, 0 AS hops FROM seed)
"""


def _bfs_oracle() -> str:
    layers = ["d0"]
    chain = []
    for h in range(1, BFS_HOPS + 1):
        prev = layers[-1]
        seen = " UNION ALL ".join(f"SELECT node FROM {d}" for d in layers)
        chain.append(
            f"""f{h} AS (
      SELECT DISTINCT e.dst AS node FROM edges e JOIN {prev} p ON p.node = e.src
    ),
    d{h} AS (
      SELECT node, {h} AS hops FROM f{h}
      WHERE node NOT IN ({seen})
    )"""
        )
        layers.append(f"d{h}")
    union = " UNION ALL ".join(f"SELECT * FROM {d}" for d in layers)
    chain_sql = ",\n    ".join(chain)
    return f"""
    WITH {_BFS_EDGES},
    {chain_sql}
    SELECT CASE WHEN node % 2 = 0 THEN 'p' || CAST(node // 2 AS VARCHAR)
                ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
           CAST(hops AS INT) AS hops
    FROM ({union})
    ORDER BY hops, node
    """


@query("q198_bfs_hops", oracle=_bfs_oracle())
def q198_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop distance (<= BFS_HOPS) from the lowest part node to
    every reachable node in the undirected part<->supplier graph —
    frontier-expansion BFS, the canonical iterative-join shape: each
    round is ONE equi-join of the (shrinking) frontier against the
    edge list plus a left-anti against the visited set; newly found
    nodes are localCheckpoint-ed so lineage stays flat (q86/q173
    discipline; reliable checkpoint dir on a cluster). Integer node
    ids and hop counts — nothing to round."""
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        li.select(
            (F.col("l_partkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seed = li.agg((F.min("l_partkey") * 2).alias("node"))
    visited = seed.withColumn("hops", F.lit(0)).localCheckpoint()
    frontier = visited.select("node")
    for h in range(1, BFS_HOPS + 1):
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        newly = (
            nxt.join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint()
        )
        visited = visited.union(newly)
        frontier = newly.select("node")
    return visited.select(
        F.concat(
            F.when(F.col("node") % 2 == 0, F.lit("p")).otherwise(F.lit("s")),
            F.expr("CAST(node div 2 AS STRING)"),
        ).alias("node"),
        F.col("hops").cast("int").alias("hops"),
    ).orderBy("hops", "node")


# ---------------------------------------------------------------------------
# q199 — multi-touch attribution

ATTR_HORIZON_US = 1_800_000_000  # 30 minutes


@query(
    "q199_attribution",
    oracle=f"""
    WITH clicks AS (
      SELECT event_id AS click_id, user_id, ts AS c_ts FROM events
      WHERE event_type = 'click'
    ),
    purch AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events
      WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT c.click_id, p.purchase_id, c.c_ts
      FROM clicks c JOIN purch p
        ON p.user_id = c.user_id
       AND epoch_us(p.p_ts) - epoch_us(c.c_ts) BETWEEN 1 AND {ATTR_HORIZON_US}
    ),
    ranked AS (
      SELECT click_id, purchase_id,
             COUNT(*) OVER (PARTITION BY purchase_id) AS k,
             ROW_NUMBER() OVER (PARTITION BY purchase_id
                                ORDER BY c_ts, click_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY purchase_id
                                ORDER BY c_ts DESC, click_id DESC) AS rn_last
      FROM pairs
    )
    SELECT click_id,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS first_touch,
           CAST(SUM(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS last_touch,
           ROUND(CAST(SUM(CAST(ROUND(1.0 / k, 9) AS DECIMAL(38,9)))
                      AS DOUBLE), 6) AS linear_credit
    FROM ranked
    GROUP BY click_id
    ORDER BY click_id
    """,
)
def q199_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: every purchase credits the clicks of
    the same user in the preceding 30 minutes under three models at
    once — first-touch, last-touch (integer flags from per-purchase
    rank windows with full (ts, id) tie-breaks) and linear (1/k
    per-row-rounded into DECIMAL). q80 answers 'did it convert'; this
    distributes the credit. The interval predicate compares integer
    microseconds (engine-identical); the join + windows all key on
    purchase_id/user_id — bounded fan-out per user, no global state."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    lag_us = F.unix_micros("p_ts") - F.unix_micros("c_ts")
    pairs = clicks.join(
        purch,
        (F.col("p_user") == F.col("user_id"))
        & (lag_us >= 1)
        & (lag_us <= ATTR_HORIZON_US),
    ).select("click_id", "purchase_id", "c_ts")
    wp = Window.partitionBy("purchase_id")
    ranked = pairs.select(
        "click_id",
        "purchase_id",
        F.count(F.lit(1)).over(wp).alias("k"),
        F.row_number()
        .over(wp.orderBy(F.col("c_ts").asc(), F.col("click_id").asc()))
        .alias("rn_first"),
        F.row_number()
        .over(wp.orderBy(F.col("c_ts").desc(), F.col("click_id").desc()))
        .alias("rn_last"),
    )
    return (
        ranked.groupBy("click_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("first_touch"),
            F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("last_touch"),
            F.round(
                F.sum(F.round(F.lit(1.0) / F.col("k"), 9).cast("decimal(38,9)")).cast(
                    "double"
                ),
                6,
            ).alias("linear_credit"),
        )
        .orderBy("click_id")
    )


# ---------------------------------------------------------------------------
# q200 — per-source KL divergence vs the corpus token distribution


@query(
    "q200_kl_divergence",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
           FROM toks GROUP BY source, tok),
    stot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cs FROM st GROUP BY source),
    gt AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS g FROM st GROUP BY tok),
    ntot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM st),
    terms AS (
      SELECT st.source,
             ROUND((CAST(st.c AS DOUBLE) / stot.cs)
                   * ln(CAST(st.c * ntot.n AS DOUBLE)
                        / CAST(stot.cs * gt.g AS DOUBLE)), 9) AS term
      FROM st
      JOIN stot ON stot.source = st.source
      JOIN gt ON gt.tok = st.tok, ntot
    )
    SELECT t.source, s.cs AS n_tokens,
           ROUND(CAST(SUM(CAST(t.term AS DECIMAL(38,9))) AS DOUBLE), 5) AS kl
    FROM terms t JOIN stot s ON s.source = t.source
    GROUP BY t.source, s.cs
    ORDER BY t.source
    """,
)
def q200_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source || corpus) over unigram token distributions — which
    sources are most unlike the pooled corpus (domain skew, template
    spam). q128's PSI bins a scalar; this compares whole vocabularies.
    Every probability is a ratio of exact BIGINT counts; the single ln
    per (source, token) takes an argument built from integer products
    (exact in double through ~2^53 — at larger corpora shift to
    per-thousand scaled counts, same plan) and its term rounds at 9 dp,
    four finer than the 5-dp output (DETERMINISM.md §5). Plan: one
    (source, tok) aggregate off the explode, a vocab-sized equi-join on
    tok, 20-row + 1-row broadcasts; output is |sources| rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    st = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    stot = st.groupBy("source").agg(F.sum("c").cast("bigint").alias("cs"))
    gt = st.groupBy("tok").agg(F.sum("c").cast("bigint").alias("g"))
    ntot = st.agg(F.sum("c").cast("bigint").alias("n"))
    terms = (
        st.join(F.broadcast(stot), "source")
        .join(gt, "tok")
        .join(F.broadcast(ntot))
        .select(
            "source",
            F.round(
                (F.col("c").cast("double") / F.col("cs"))
                * F.log(
                    (F.col("c") * F.col("n")).cast("double")
                    / (F.col("cs") * F.col("g")).cast("double")
                ),
                9,
            ).alias("term"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.round(
                F.sum(F.col("term").cast("decimal(38,9)")).cast("double"), 5
            ).alias("kl")
        )
        .join(F.broadcast(stot), "source")
        .select("source", F.col("cs").alias("n_tokens"), "kl")
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q201 — expected calibration error

ECE_BINS = 10


@query(
    "q201_ece_calibration",
    oracle=f"""
    WITH lbl AS (
      SELECT value / 100.0 AS conf,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR(conf * {ECE_BINS}) AS INT), {ECE_BINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(ROUND(conf, 9) AS DECIMAL(38,9))) AS sconf,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM lbl GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS nt FROM binned)
    SELECT bin, n,
           ROUND(CAST(sconf AS DOUBLE) / n, 6) AS avg_conf,
           ROUND(CAST(pos AS DOUBLE) / n, 6) AS frac_pos,
           ROUND(ABS(CAST(sconf AS DOUBLE) / n - CAST(pos AS DOUBLE) / n)
                 * n / nt, 6) AS ece_term
    FROM binned, tot
    ORDER BY bin
    """,
)
def q201_ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error of 'value/100 predicts purchase':
    10 equal-width confidence bins, each reporting mean confidence,
    observed positive rate, and its |conf - acc| * n/N contribution
    (sum of ece_term = ECE). q135's AUC measures ranking; this
    measures whether the probabilities mean what they say — the model
    evaluation pair. Confidences accumulate per-row-rounded DECIMAL;
    every output is one assembled double expression over the 10-row
    bin table. One shuffle into a constant-size aggregate."""
    ev = load_table(spark, sf_dir, "events")
    conf = F.col("value") / 100.0
    lbl = ev.select(
        conf.alias("conf"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    binned = lbl.groupBy(
        F.least(
            F.floor(F.col("conf") * ECE_BINS).cast("int"), F.lit(ECE_BINS - 1)
        ).alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round("conf", 9).cast("decimal(38,9)")).alias("sconf"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    tot = binned.agg(F.sum("n").alias("nt"))
    avg_conf = F.col("sconf").cast("double") / F.col("n")
    frac_pos = F.col("pos").cast("double") / F.col("n")
    return (
        binned.join(F.broadcast(tot))
        .select(
            "bin",
            "n",
            F.round(avg_conf, 6).alias("avg_conf"),
            F.round(frac_pos, 6).alias("frac_pos"),
            F.round(
                F.abs(avg_conf - frac_pos) * F.col("n") / F.col("nt"), 6
            ).alias("ece_term"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q202 — Douglas-Peucker track simplification (rows-only: recursive
# geometry, not SQL-expressible; exactness pinned by unit tests)

DP_EPSILON_KM = 30.0


@query("q202_track_simplify")
def q202_track_simplify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flight Douglas-Peucker simplification summary (epsilon =
    30 km against the synthetic tracks' ~200 km extent): original vs
    kept point counts and the kept fraction. The Arrow stage receives
    one flight per group after a JVM-side projection (the same
    deliberate boundary as the intersect crawl); unit tests pin the
    kept-set on hand-built geometries and the <=2-point edge cases
    (tests/test_simplify.py)."""
    tp = synth_trackpoints(spark, sf_dir)
    simplified = douglas_peucker(tp, DP_EPSILON_KM)
    orig = tp.groupBy("flight_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )
    kept = simplified.groupBy("flight_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept")
    )
    return (
        orig.join(kept, "flight_id")
        .select(
            "flight_id",
            "n_points",
            "n_kept",
            F.round(F.col("n_kept").cast("double") / F.col("n_points"), 6).alias(
                "kept_frac"
            ),
        )
        .orderBy("flight_id")
    )


# ---------------------------------------------------------------------------
# q203 — distributed BPE merge training (rows-only: k chained
# corpus-wide argmax iterations have no SQL-oracle form; exactness is
# pinned against a pure-Python reference in tests/test_bpe.py)

BPE_MERGES = 5

def _merge_expr() -> str:
    # Greedy left-to-right application of ONE merge rule (la, lb) -> lm
    # to a symbol array, as a JVM-side fold: 'pend' holds the symbol
    # that may still start a merge. No Python in the loop.
    fold = """
aggregate(
  syms,
  named_struct('out', cast(array() as array<string>),
               'pend', cast(null as string)),
  (acc, x) -> CASE
    WHEN acc.pend IS NULL
      THEN named_struct('out', acc.out, 'pend', x)
    WHEN acc.pend = la AND x = lb
      THEN named_struct('out', array_append(acc.out, lm),
                        'pend', cast(null as string))
    ELSE named_struct('out', array_append(acc.out, acc.pend), 'pend', x)
  END,
  acc -> CASE WHEN acc.pend IS NULL THEN acc.out
              ELSE array_append(acc.out, acc.pend) END
)
"""
    return f"CASE WHEN size(syms) < 2 THEN syms ELSE {fold} END"


def _bpe_train(spark: SparkSession, sf_dir: str):
    """Shared BPE training loop: returns (vocab, merge_frames) where
    vocab is the (word, freq, syms) frame AFTER all merges and
    merge_frames is one 1-row frame per learned rule. Used by q203
    (report the rules) and q211 (encode the corpus with them)."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.expr("filter(split(word, ''), s -> s <> '')"))
        .select("word", "freq", "syms")
        .localCheckpoint()
    )
    merge_frames = []
    for step in range(1, BPE_MERGES + 1):
        pairs = words.select(
            "freq",
            F.explode(
                F.expr(
                    "zip_with(slice(syms, 1, size(syms) - 1),"
                    "         slice(syms, 2, size(syms) - 1),"
                    "         (x, y) -> named_struct('a', x, 'b', y))"
                )
            ).alias("p"),
        )
        cnt = pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
            F.sum("freq").cast("bigint").alias("cnt")
        )
        top1 = (
            cnt.orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .select(
                F.col("a").alias("la"),
                F.col("b").alias("lb"),
                F.concat("a", "b").alias("lm"),
                "cnt",
            )
        )
        merge_frames.append(
            top1.select(
                F.lit(step).alias("step"),
                F.col("la").alias("left_sym"),
                F.col("lb").alias("right_sym"),
                F.col("lm").alias("merged"),
                F.col("cnt").alias("pair_count"),
            )
        )
        words = (
            words.join(F.broadcast(top1.select("la", "lb", "lm")))
            .withColumn("syms", F.expr(_merge_expr()))
            .select("word", "freq", "syms")
            .localCheckpoint()
        )
    return words, merge_frames


@query("q203_bpe_train")
def q203_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first BPE_MERGES byte-pair-encoding merge rules over
    the whole corpus — the tokenizer-training step of a data pipeline,
    distributed: words collapse once to a vocab-bounded (word, freq)
    table; each round counts adjacent symbol pairs (slice+zip_with,
    map-side), takes the global argmax (TakeOrdered over the bounded
    pair table; ties break lexicographically), and applies the merge
    with a JVM-side fold over the symbol array (no Python anywhere).
    Counts are exact integers, so the learned merges are deterministic
    at any partitioning. localCheckpoint per round keeps lineage flat
    (q86 discipline). Output: one row per merge step."""
    _, merge_frames = _bpe_train(spark, sf_dir)
    out = merge_frames[0]
    for fr in merge_frames[1:]:
        out = out.union(fr)
    return out.orderBy("step")


# ---------------------------------------------------------------------------
# q204 — Kaplan-Meier survival (signup -> first purchase, censored)

_HOUR_US = 3_600_000_000


@query(
    "q204_kaplan_meier",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, MIN(ts) AS t0, MAX(ts) AS tmax,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY user_id
    ),
    subj AS (
      SELECT CASE WHEN tp IS NOT NULL
                  THEN (epoch_us(tp) - epoch_us(t0)) // {_HOUR_US}
                  ELSE (epoch_us(tmax) - epoch_us(t0)) // {_HOUR_US} END AS dur,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_user
    ),
    keys AS (
      SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM subj GROUP BY dur
    ),
    tot AS (SELECT CAST(SUM(d) + SUM(c) AS BIGINT) AS n FROM keys),
    scan AS (
      SELECT dur, d, c,
             n - (SUM(d + c) OVER (ORDER BY dur) - (d + c)) AS n_risk
      FROM keys, tot
    ),
    terms AS (
      SELECT dur, d, c, n_risk,
             CASE WHEN n_risk = d THEN CAST(0 AS DECIMAL(38,9))
                  ELSE CAST(ROUND(ln(CAST(n_risk - d AS DOUBLE) / n_risk), 9)
                            AS DECIMAL(38,9)) END AS lnterm,
             CASE WHEN n_risk = d THEN 1 ELSE 0 END AS hit_zero
      FROM scan
    ),
    km AS (
      SELECT dur, d, c, n_risk,
             SUM(lnterm) OVER (ORDER BY dur) AS cum_ln,
             MAX(hit_zero) OVER (ORDER BY dur) AS z
      FROM terms
    )
    SELECT CAST(dur AS BIGINT) AS duration_h,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           d AS d_events, c AS c_censored,
           CASE WHEN z = 1 THEN 0.0
                ELSE ROUND(exp(CAST(cum_ln AS DOUBLE)), 5) END AS survival
    FROM km WHERE d > 0 ORDER BY duration_h
    """,
)
def q204_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase in whole
    hours since each user's first event, right-censored at the user's
    last event — the retention/conversion estimator that handles
    users who simply haven't converted YET (q162's cohort triangle
    ignores censoring). Plan: one user_id aggregate collapses events
    to one (duration, event) row per subject; durations collapse again
    to distinct hour keys, which are CALENDAR-bounded (<= era hours,
    independent of corpus size), so the risk-set scan and the log-sum
    scan are windows over a provably bounded table. The product
    survives as a DECIMAL sum of 9-dp-rounded ln terms (4 finer than
    the 5-dp output, DETERMINISM.md §5) exponentiated once."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("tmax"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    has = F.col("tp").isNotNull()
    subj = per_user.select(
        F.when(
            has,
            F.expr(f"(unix_micros(tp) - unix_micros(t0)) div {_HOUR_US}"),
        )
        .otherwise(F.expr(f"(unix_micros(tmax) - unix_micros(t0)) div {_HOUR_US}"))
        .alias("dur"),
        F.when(has, 1).otherwise(0).alias("ev"),
    )
    keys = subj.groupBy("dur").agg(
        F.sum("ev").cast("bigint").alias("d"),
        F.sum(1 - F.col("ev")).cast("bigint").alias("c"),
    )
    tot = keys.agg((F.sum("d") + F.sum("c")).cast("bigint").alias("n"))
    w = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scan = keys.join(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n") - (F.sum(F.col("d") + F.col("c")).over(w) - (F.col("d") + F.col("c"))),
    )
    exhausted = F.col("n_risk") == F.col("d")
    terms = scan.withColumn(
        "lnterm",
        F.when(exhausted, F.lit(0).cast("decimal(38,9)")).otherwise(
            F.round(
                F.log(
                    (F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk")
                ),
                9,
            ).cast("decimal(38,9)")
        ),
    ).withColumn("hit_zero", F.when(exhausted, 1).otherwise(0))
    km = terms.withColumn("cum_ln", F.sum("lnterm").over(w)).withColumn(
        "z", F.max("hit_zero").over(w)
    )
    return (
        km.filter(F.col("d") > 0)
        .select(
            F.col("dur").cast("bigint").alias("duration_h"),
            F.col("n_risk").cast("bigint").alias("n_at_risk"),
            F.col("d").alias("d_events"),
            F.col("c").alias("c_censored"),
            F.when(F.col("z") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("cum_ln").cast("double")), 5))
            .alias("survival"),
        )
        .orderBy("duration_h")
    )


# ---------------------------------------------------------------------------
# q205 — Mann-Kendall trend test over daily order counts


@query(
    "q205_mann_kendall",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT CAST(SUM(CASE WHEN b.n > a.n THEN 1
                           WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT) AS s
      FROM daily a JOIN daily b ON b.day > a.day
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM daily),
    ties AS (
      SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tt
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY n) g
      WHERE t > 1
    )
    SELECT m.m AS n_days, s.s AS s_stat,
           ROUND(CASE WHEN s.s > 0 THEN (s.s - 1)
                      WHEN s.s < 0 THEN (s.s + 1)
                      ELSE 0 END
                 / sqrt((m.m * (m.m - 1) * (2 * m.m + 5) - ties.tt) / 18.0),
                 6) AS z
    FROM s, m, ties
    """,
)
def q205_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotonic-trend test over the daily order count
    series — the nonparametric companion to q184's parametric OLS
    slope (no linearity or normality assumption; robust to outliers).
    The raw scan collapses to one row per day, so the pairwise
    sign sum runs over a CALENDAR-bounded self-join (days², not
    rows²); S and the tie term are exact integers, and the
    continuity-corrected z is one assembled double expression."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    b = daily.select(F.col("day").alias("day_b"), F.col("n").alias("n_b"))
    s = (
        daily.join(b, F.col("day_b") > F.col("day"))
        .agg(
            F.sum(
                F.when(F.col("n_b") > F.col("n"), 1)
                .when(F.col("n_b") < F.col("n"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s")
        )
    )
    m = daily.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    ties = (
        daily.groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tt")
        )
    )
    joined = s.join(F.broadcast(m)).join(F.broadcast(ties))
    corrected = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(0)
    )
    var = (
        F.col("m") * (F.col("m") - 1) * (2 * F.col("m") + 5) - F.col("tt")
    ) / 18.0
    return joined.select(
        F.col("m").alias("n_days"),
        F.col("s").alias("s_stat"),
        F.round(corrected / F.sqrt(var), 6).alias("z"),
    )


# ---------------------------------------------------------------------------
# q206 — correlation matrix of lineitem numeric columns

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for c in _CORR_COLS:
        aggs.append(
            f"CAST(SUM(CAST(ROUND({c}, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s_{c}"
        )
        aggs.append(
            f"CAST(SUM(CAST(ROUND({c} * {c}, 6) AS DECIMAL(38,6))) AS DOUBLE)"
            f" AS sq_{c}"
        )
    selects = []
    for i, a in enumerate(_CORR_COLS):
        for bcol in _CORR_COLS[i + 1 :]:
            aggs.append(
                f"CAST(SUM(CAST(ROUND({a} * {bcol}, 6) AS DECIMAL(38,6))) AS DOUBLE)"
                f" AS x_{a}_{bcol}"
            )
            selects.append(
                f"SELECT '{a}' AS col_a, '{bcol}' AS col_b,"
                f" ROUND((n * x_{a}_{bcol} - s_{a} * s_{bcol})"
                f" / (sqrt(n * sq_{a} - s_{a} * s_{a})"
                f"    * sqrt(n * sq_{bcol} - s_{bcol} * s_{bcol})), 6) AS corr"
                f" FROM mom"
            )
    union = " UNION ALL ".join(selects)
    return f"""
    WITH mom AS (SELECT {", ".join(aggs)} FROM lineitem)
    SELECT * FROM ({union}) ORDER BY col_a, col_b
    """


@query("q206_corr_matrix", oracle=_corr_oracle())
def q206_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the lineitem numeric
    columns in ONE scan: a single aggregate computes every first and
    second moment (per-row-rounded DECIMAL — merge-order-free), and
    the 6 upper-triangle correlations are assembled from that 1-row
    frame with identically-shaped double expressions (q75 does one
    pair; this is the all-pairs audit). Cost at any scale = the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for c in _CORR_COLS:
        aggs.append(
            F.sum(F.round(F.col(c), 6).cast("decimal(38,6)"))
            .cast("double")
            .alias(f"s_{c}")
        )
        aggs.append(
            F.sum(F.round(F.col(c) * F.col(c), 6).cast("decimal(38,6)"))
            .cast("double")
            .alias(f"sq_{c}")
        )
    pairs = []
    for i, a in enumerate(_CORR_COLS):
        for bcol in _CORR_COLS[i + 1 :]:
            aggs.append(
                F.sum(F.round(F.col(a) * F.col(bcol), 6).cast("decimal(38,6)"))
                .cast("double")
                .alias(f"x_{a}_{bcol}")
            )
            pairs.append((a, bcol))
    mom = li.agg(*aggs)
    outs = []
    for a, bcol in pairs:
        corr = F.round(
            (F.col("n") * F.col(f"x_{a}_{bcol}") - F.col(f"s_{a}") * F.col(f"s_{bcol}"))
            / (
                F.sqrt(F.col("n") * F.col(f"sq_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * F.sqrt(
                    F.col("n") * F.col(f"sq_{bcol}")
                    - F.col(f"s_{bcol}") * F.col(f"s_{bcol}")
                )
            ),
            6,
        )
        outs.append(
            mom.select(
                F.lit(a).alias("col_a"), F.lit(bcol).alias("col_b"), corr.alias("corr")
            )
        )
    out = outs[0]
    for fr in outs[1:]:
        out = out.union(fr)
    return out.orderBy("col_a", "col_b")


# ---------------------------------------------------------------------------
# q207 — audio silence-run segmentation

SILENCE_RMS = 99  # silent frame: rms < 99  <=>  s2 < 99^2 * n  (exact ints)
MIN_SILENCE_RUN = 2


@query(
    "q207_audio_silence",
    oracle=f"""
    WITH a AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1
    ),
    chars AS (
      SELECT media_id,
             ascii(unnest(regexp_extract_all(text, '.'))) AS s,
             generate_subscripts(regexp_extract_all(text, '.'), 1) AS pos
      FROM a
    ),
    fr AS (
      SELECT media_id, (pos - 1) // 256 AS frame_idx,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(s * s) AS BIGINT) AS s2
      FROM chars GROUP BY media_id, (pos - 1) // 256
    ),
    silent AS (
      SELECT media_id, frame_idx FROM fr
      WHERE s2 < {SILENCE_RMS * SILENCE_RMS} * n
    ),
    runs AS (
      SELECT media_id, frame_idx,
             frame_idx - ROW_NUMBER() OVER (PARTITION BY media_id
                                            ORDER BY frame_idx) AS run_key
      FROM silent
    )
    SELECT media_id,
           CAST(MIN(frame_idx) AS BIGINT) AS start_frame,
           CAST(COUNT(*) AS BIGINT) AS n_frames
    FROM runs GROUP BY media_id, run_key
    HAVING COUNT(*) >= {MIN_SILENCE_RUN}
    ORDER BY media_id, start_frame
    """,
)
def q207_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence segmentation over the audio corpus: consecutive
    low-energy 256-sample frames collapse to (start, length) runs —
    the trim/VAD preprocessing step beside q90's energy summary and
    q188's visual scene cuts. The silence test is EXACT integer
    arithmetic (s2 < rms²·n — no sqrt, no rounding contract at all);
    runs are q26's gaps-and-islands on the frame index. One shuffle on
    media_id serves framing, the run window, and the run aggregate."""
    from ..multimodal import audio_frame_stats
    from .multimodal import synth_media, _docs

    media = synth_media(_docs(spark, sf_dir)).filter(F.col("kind") == "audio")
    frames = audio_frame_stats(media, frame_len=256)
    silent = frames.filter(
        F.col("sum_sq") < SILENCE_RMS * SILENCE_RMS * F.col("n_samples")
    ).select("media_id", "frame_idx")
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    runs = silent.withColumn(
        "run_key", F.col("frame_idx") - F.row_number().over(w)
    )
    return (
        runs.groupBy("media_id", "run_key")
        .agg(
            F.min("frame_idx").cast("bigint").alias("start_frame"),
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
        )
        .filter(F.col("n_frames") >= MIN_SILENCE_RUN)
        .select("media_id", "start_frame", "n_frames")
        .orderBy("media_id", "start_frame")
    )


# ---------------------------------------------------------------------------
# q208 — k-fold cross-validated regression via leave-fold-out moments

CV_FOLDS = 5
_T0 = 1_704_067_200_000_000  # 2024-01-01 UTC in microseconds


@query(
    "q208_cv_regression",
    oracle=f"""
    WITH pts AS (
      SELECT ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))::BIGINT
               % {CV_FOLDS} AS fold,
             (epoch_us(ts) - {_T0}) // {_HOUR_US} AS x,
             ROUND(value, 6) AS y
      FROM events
    ),
    fm AS (
      SELECT fold,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             SUM(CAST(y AS DECIMAL(38,6))) AS sy,
             SUM(CAST(ROUND(x * y, 6) AS DECIMAL(38,6))) AS sxy
      FROM pts GROUP BY fold
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(sx) AS BIGINT) AS tsx,
             CAST(SUM(sxx) AS BIGINT) AS tsxx,
             SUM(sy) AS tsy, SUM(sxy) AS tsxy
      FROM fm
    ),
    loo AS (
      SELECT fold,
             (tn - n) AS ln_, (tsx - sx) AS lsx, (tsxx - sxx) AS lsxx,
             CAST(tsy - sy AS DOUBLE) AS lsy, CAST(tsxy - sxy AS DOUBLE) AS lsxy
      FROM fm, tot
    ),
    coef AS (
      SELECT fold,
             ROUND((ln_ * lsxy - lsx * lsy) / (ln_ * lsxx - CAST(lsx AS DOUBLE) * lsx), 8)
               AS slope,
             ROUND((lsy - (ln_ * lsxy - lsx * lsy)
                          / (ln_ * lsxx - CAST(lsx AS DOUBLE) * lsx) * lsx) / ln_, 8)
               AS intercept
      FROM loo
    ),
    resid AS (
      SELECT p.fold, c.slope, c.intercept,
             CAST(ROUND((p.y - (c.intercept + c.slope * p.x))
                        * (p.y - (c.intercept + c.slope * p.x)), 6)
                  AS DECIMAL(38,6)) AS r2
      FROM pts p JOIN coef c ON c.fold = p.fold
    )
    SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_test,
           ANY_VALUE(slope) AS slope, ANY_VALUE(intercept) AS intercept,
           ROUND(sqrt(CAST(SUM(r2) AS DOUBLE) / COUNT(*)), 6) AS rmse
    FROM resid GROUP BY fold ORDER BY fold
    """,
)
def q208_cv_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation of the q184 regression (value ~ hours
    since 2024-01-01) WITHOUT k training passes: per-fold moment sums
    are computed once, each fold's leave-fold-out coefficients come
    from TOTAL-minus-FOLD algebra on the k-row table (exact integer
    x-moments, DECIMAL y-moments), and one second pass scores every
    row against its own fold's held-out model (8-dp-rounded
    coefficients shared by both engines; residuals per-row-rounded
    into DECIMAL). Two scans total, independent of k — the textbook
    form is k+1. Folds are md5 buckets (q64's engine-stable split)."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        (
            F.expr("cast(conv(substring(md5(cast(event_id as string)),1,4),16,10) as bigint)")
            % CV_FOLDS
        ).alias("fold"),
        F.expr(f"(unix_micros(ts) - {_T0}) div {_HOUR_US}").alias("x"),
        F.round("value", 6).alias("y"),
    )
    fm = pts.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,6)")).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(38,6)")).alias("sxy"),
    )
    tot = fm.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("sx").cast("bigint").alias("tsx"),
        F.sum("sxx").cast("bigint").alias("tsxx"),
        F.sum("sy").alias("tsy"),
        F.sum("sxy").alias("tsxy"),
    )
    loo = fm.join(F.broadcast(tot)).select(
        "fold",
        (F.col("tn") - F.col("n")).alias("ln_"),
        (F.col("tsx") - F.col("sx")).alias("lsx"),
        (F.col("tsxx") - F.col("sxx")).alias("lsxx"),
        (F.col("tsy") - F.col("sy")).cast("double").alias("lsy"),
        (F.col("tsxy") - F.col("sxy")).cast("double").alias("lsxy"),
    )
    den = F.col("ln_") * F.col("lsxx") - F.col("lsx").cast("double") * F.col("lsx")
    num = F.col("ln_") * F.col("lsxy") - F.col("lsx") * F.col("lsy")
    coef = loo.select(
        "fold",
        F.round(num / den, 8).alias("slope"),
        F.round((F.col("lsy") - num / den * F.col("lsx")) / F.col("ln_"), 8).alias(
            "intercept"
        ),
    )
    resid = pts.join(F.broadcast(coef), "fold").select(
        "fold",
        "slope",
        "intercept",
        F.round(
            (F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x")))
            * (F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x"))),
            6,
        )
        .cast("decimal(38,6)")
        .alias("r2"),
    )
    return (
        resid.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.any_value(F.col("slope")).alias("slope"),
            F.any_value(F.col("intercept")).alias("intercept"),
            F.round(
                F.sqrt(F.sum("r2").cast("double") / F.count(F.lit(1))), 6
            ).alias("rmse"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# q209 — join-key skew audit

SKEW_PARTITIONS = 32  # the planner's assumed shuffle partition count

_SKEW_KEYS = [("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
              ("orders", "o_custkey")]


def _skew_oracle() -> str:
    selects = []
    for tbl, col in _SKEW_KEYS:
        selects.append(f"""
    SELECT '{tbl}.{col}' AS key_col,
           CAST(COUNT(*) AS BIGINT) AS ndv,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(MAX(c) AS BIGINT) AS max_per_key,
           ROUND(CAST(SUM(c) AS DOUBLE) / COUNT(*), 4) AS avg_per_key,
           ROUND(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 4) AS skew_ratio,
           CAST(CEIL(CAST(MAX(c) AS DOUBLE) * {SKEW_PARTITIONS} / SUM(c)) AS BIGINT)
             AS rec_salt
    FROM (SELECT {col} AS k, COUNT(*) AS c FROM {tbl} GROUP BY {col})""")
    union = " UNION ALL ".join(selects)
    return f"SELECT * FROM ({union}) ORDER BY key_col"


@query("q209_skew_audit", oracle=_skew_oracle())
def q209_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit for the three workhorse join keys: NDV,
    per-key max vs mean, the skew ratio, and a recommended salt factor
    (ceil(max_per_key · P / n_rows) — the replication that brings the
    hottest key's task back to the average task size at P shuffle
    partitions). This is the measurement half of operators/skew.py's
    salted joins: run the audit, salt only where skew_ratio says so.
    One (key → count) aggregate per audited column; everything after
    is a constant-size rollup."""
    frames = []
    for tbl, col in _SKEW_KEYS:
        t = load_table(spark, sf_dir, tbl)
        per_key = t.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        )
        frames.append(
            per_key.agg(
                F.count(F.lit(1)).cast("bigint").alias("ndv"),
                F.sum("c").cast("bigint").alias("n_rows"),
                F.max("c").cast("bigint").alias("max_per_key"),
            ).select(
                F.lit(f"{tbl}.{col}").alias("key_col"),
                "ndv",
                "n_rows",
                "max_per_key",
                F.round(F.col("n_rows").cast("double") / F.col("ndv"), 4).alias(
                    "avg_per_key"
                ),
                F.round(
                    F.col("max_per_key").cast("double")
                    * F.col("ndv")
                    / F.col("n_rows"),
                    4,
                ).alias("skew_ratio"),
                F.ceil(
                    F.col("max_per_key").cast("double")
                    * SKEW_PARTITIONS
                    / F.col("n_rows")
                )
                .cast("bigint")
                .alias("rec_salt"),
            )
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.union(fr)
    return out.orderBy("key_col")


# ---------------------------------------------------------------------------
# q210 — quantile normalization of per-source length distributions


@query(
    "q210_quantile_normalize",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM documents
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    targets AS (
      SELECT doc_id, source, n_chars,
             CASE WHEN ns = 1 THEN (n - 1) // 2
                  ELSE ((r - 1) * (n - 1) * 2 + (ns - 1)) // (2 * (ns - 1))
             END AS k
      FROM ranked, tot
    ),
    vals AS (
      SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents
      GROUP BY n_chars
    ),
    scan AS (
      SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS cum FROM vals
    ),
    pooled AS (
      SELECT CAST(u.k AS BIGINT) AS k, v
      FROM scan, LATERAL (
        SELECT unnest(range(CAST(cum - cnt AS BIGINT), CAST(cum AS BIGINT))) AS k
      ) u
    )
    SELECT t.doc_id, t.source, t.n_chars,
           CAST(p.v AS BIGINT) AS qnorm_chars
    FROM targets t JOIN pooled p ON p.k = t.k
    ORDER BY t.doc_id
    """,
)
def q210_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document lengths across sources: each
    doc's n_chars is replaced by the POOLED order statistic at the
    doc's within-source rank position — after which every source has
    an identical length distribution (the cross-batch normalization
    move from expression arrays, applied to corpus features). All
    arithmetic is integer: the target pooled index is a floor((x+.5))
    rational on ranks, and the pooled (index -> value) table comes
    from exploding each distinct value's cumulative-count interval —
    N rows total, an equi-join on k, never a non-equi rank lookup.
    Windows run per source (bounded); the pooled scan is over distinct
    values. At 100 TB swap the distinct-value scan onto
    operators/prefix.bucketed_cumsum (same values)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).alias("r"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("ns"),
    )
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    targets = ranked.join(F.broadcast(tot)).select(
        "doc_id",
        "source",
        "n_chars",
        F.when(
            F.col("ns") == 1, F.expr("(n - 1) div 2")
        )
        .otherwise(
            F.expr("((r - 1) * (n - 1) * 2 + (ns - 1)) div (2 * (ns - 1))")
        )
        .alias("k"),
    )
    vals = docs.groupBy(F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scan = vals.withColumn("cum", F.sum("cnt").over(wv))
    pooled = scan.select(
        F.explode(F.expr("sequence(cum - cnt, cum - 1)")).alias("k"),
        F.col("v"),
    )
    return (
        targets.join(pooled, "k")
        .select(
            "doc_id", "source", "n_chars", F.col("v").cast("bigint").alias("qnorm_chars")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q211 — BPE encode (apply the learned merges to the corpus; rows-only:
# the k-round train+apply chain has no SQL-oracle form, exactness is
# pinned against the pure-Python reference in tests/test_bpe.py)


@query("q211_bpe_encode")
def q211_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode the corpus with the BPE rules q203 just learned — the
    apply half of tokenizer training. The merges fold into the
    DISTINCT-word vocab during training (so encoding costs nothing
    extra per occurrence); each doc then joins its words against the
    vocab's final symbol counts and aggregates. Output per doc:
    whitespace word count, character-token count (pre-BPE), BPE token
    count after BPE_MERGES merges, and the exact compression ratio as
    a 6-dp round of a ratio of integers. Join keys: word (vocab side
    broadcast — vocabulary-bounded), doc_id."""
    vocab, _ = _bpe_train(spark, sf_dir)
    vocab_counts = vocab.select(
        "word",
        F.length(F.concat_ws("", "syms")).alias("n_chars_w"),
        F.size("syms").alias("n_bpe_w"),
    )
    docs = load_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.length("word") > 0)
    joined = doc_words.join(F.broadcast(vocab_counts), "word")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_chars_w").cast("bigint").alias("n_char_tokens"),
            F.sum("n_bpe_w").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_char_tokens",
            "n_bpe_tokens",
            F.round(
                F.col("n_char_tokens").cast("double") / F.col("n_bpe_tokens"), 6
            ).alias("compression"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q212 — quality-aware canonical selection for dedup clusters


def _q212_oracle() -> str:
    from .textops import _dedup_clusters_oracle

    cc = _dedup_clusters_oracle().strip()
    # reuse the recursive-CTE component computation, swap the reporting
    body = cc[: cc.rindex("SELECT doc_id, cluster_id,")].rstrip()
    return f"""
    {body},
    ranked AS (
      SELECT c.doc_id, c.cluster_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn,
             FIRST_VALUE(c.doc_id) OVER (PARTITION BY c.cluster_id
                                         ORDER BY d.n_chars DESC, c.doc_id)
               AS keeper_id
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT doc_id, cluster_id, keeper_id, CAST(n_chars AS BIGINT) AS n_chars
    FROM ranked WHERE rn > 1
    ORDER BY doc_id
    """


@query("q212_quality_canonical", oracle=_q212_oracle())
def q212_quality_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup resolution: within each LSH near-dup
    cluster keep the HIGHEST-QUALITY member (longest doc, doc_id
    tie-break) instead of q51's lowest-id convention — what a real
    pipeline ships, since near-dup clusters usually contain one full
    document plus truncated/boilerplate variants. Output: every
    DROPPED doc with its cluster and keeper. Plan: the q51 component
    labels (edge-contraction CC) joined once against doc lengths, one
    rank window per cluster (bounded by cluster size)."""
    from flightdb_spark.operators import textdedup

    from .textops import _MINHASH_SEEDS, _docs

    docs = _docs(spark, sf_dir)
    shingled = textdedup.shingles(docs)
    sigs = textdedup.minhash_signatures(shingled, seeds=tuple(_MINHASH_SEEDS))
    bands = textdedup.lsh_bands(sigs, seeds=tuple(_MINHASH_SEEDS))
    pairs = textdedup.lsh_candidate_pairs(bands)
    comp = textdedup.connected_components(pairs)
    scored = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    ranked = scored.select(
        "doc_id",
        "cluster_id",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.first("doc_id").over(w).alias("keeper_id"),
    )
    return (
        ranked.filter(F.col("rn") > 1)
        .select(
            "doc_id", "cluster_id", "keeper_id", F.col("n_chars").cast("bigint")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q213 — DTW trajectory similarity, grid-gated. The banded DP unrolls
# into SQL (r7 VERDICT item 4, the q576-Viterbi pattern): the per-row
# recurrence cur[j] = cost[j] + min(prev[j], prev[j-1], cur[j-1]) is a
# min-plus prefix — cur[j] = C[j] + MIN_{k<=j}(m[k] - C[k-1]) with
# C = the row's cost prefix sum and m[k] = min(prev[k], prev[k-1]) —
# so each of the <=64 rows is ONE windowed CTE, and the whole DP is an
# exact-integer (micro-km) chain both engines compute identically.


def _q213_oracle() -> str:
    from flightdb_spark.operators.trajectory import DTW_BAND, DTW_MAX_POINTS

    from .extras import _GRID_PAIRS_SQL
    from .synth import SYNTH_TP_CTE

    k = DTW_MAX_POINTS
    inf = 1 << 60
    steps = [f"""v1 AS MATERIALIZED (
      SELECT flight_a, flight_b, j,
             SUM(c) OVER (PARTITION BY flight_a, flight_b ORDER BY j) AS e
      FROM cost WHERE i = 1
    )"""]
    for i in range(2, k + 1):
        steps.append(f"""v{i} AS MATERIALIZED (
      SELECT x.flight_a, x.flight_b, x.j,
             x.cum + MIN(x.term) OVER (PARTITION BY x.flight_a, x.flight_b
                                       ORDER BY x.j) AS e
      FROM (
        SELECT c.flight_a, c.flight_b, c.j, c.c,
               SUM(c.c) OVER (PARTITION BY c.flight_a, c.flight_b
                              ORDER BY c.j) AS cum,
               COALESCE(LEAST(p0.e, p1.e), {inf})
                 - (SUM(c.c) OVER (PARTITION BY c.flight_a, c.flight_b
                                   ORDER BY c.j) - c.c) AS term
        FROM cost c
        LEFT JOIN v{i - 1} p0 ON p0.flight_a = c.flight_a
          AND p0.flight_b = c.flight_b AND p0.j = c.j
        LEFT JOIN v{i - 1} p1 ON p1.flight_a = c.flight_a
          AND p1.flight_b = c.flight_b AND p1.j = c.j - 1
        WHERE c.i = {i}
      ) x
    )""")
    finals = "\n      UNION ALL\n      ".join(
        f"SELECT {i} AS i, flight_a, flight_b, j, e FROM v{i}"
        for i in range(1, k + 1)
    )
    steps_sql = ",\n    ".join(steps)
    return f"""
    WITH {SYNTH_TP_CTE},
    pts AS (
      SELECT flight_id, ts, lat, lon FROM trackpoints WHERE flight_id < 40
    ),
    {_GRID_PAIRS_SQL},
    seq AS (
      SELECT flight_id, CAST(lat AS DOUBLE) AS lat, CAST(lon AS DOUBLE) AS lon,
             ROW_NUMBER() OVER (PARTITION BY flight_id
                                ORDER BY ts, lat, lon) - 1 AS i,
             COUNT(*) OVER (PARTITION BY flight_id) AS n
      FROM pts
    ),
    kept AS (
      SELECT flight_id, lat, lon, i FROM seq
      WHERE n <= {k} OR i = 0 OR (i * {k} // n) <> ((i - 1) * {k} // n)
    ),
    dsd AS (
      SELECT flight_id, lat, lon,
             ROW_NUMBER() OVER (PARTITION BY flight_id ORDER BY i) AS j,
             COUNT(*) OVER (PARTITION BY flight_id) AS len,
             SUM(CAST(FLOOR(lat * 1000000 + 0.5) AS BIGINT))
               OVER (PARTITION BY flight_id) AS slat_u
      FROM kept
    ),
    fl AS (
      SELECT flight_id, MAX(len) AS len, MAX(slat_u) AS slat_u
      FROM dsd GROUP BY flight_id
    ),
    dims AS (
      SELECT p.flight_a, p.flight_b, a.len AS m, b.len AS n,
             GREATEST({DTW_BAND}, ABS(a.len - b.len) + 1) AS band,
             CAST(111.32 AS DOUBLE) * COS(RADIANS(
               CAST(a.slat_u + b.slat_u AS DOUBLE)
               / CAST((a.len + b.len) * 1000000 AS DOUBLE))) AS kx
      FROM pairs p
      JOIN fl a ON a.flight_id = p.flight_a
      JOIN fl b ON b.flight_id = p.flight_b
    ),
    cost AS MATERIALIZED (
      SELECT d.flight_a, d.flight_b, sa.j AS i, sb.j AS j,
             CAST(FLOOR(SQRT(
               (sa.lon * d.kx - sb.lon * d.kx)
                 * (sa.lon * d.kx - sb.lon * d.kx)
               + (sa.lat * CAST(111.32 AS DOUBLE)
                    - sb.lat * CAST(111.32 AS DOUBLE))
                 * (sa.lat * CAST(111.32 AS DOUBLE)
                      - sb.lat * CAST(111.32 AS DOUBLE))
             ) * 1000000 + 0.5) AS BIGINT) AS c
      FROM dims d
      JOIN dsd sa ON sa.flight_id = d.flight_a
      JOIN dsd sb ON sb.flight_id = d.flight_b
      WHERE sb.j BETWEEN GREATEST(1, sa.j - d.band)
                     AND LEAST(d.n, sa.j + d.band)
    ),
    {steps_sql},
    allv AS (
      {finals}
    )
    SELECT d.flight_a, d.flight_b,
           CAST(d.m AS INT) AS n_a, CAST(d.n AS INT) AS n_b,
           CAST(v.e AS BIGINT) AS dtw_ukm
    FROM dims d
    JOIN allv v ON v.flight_a = d.flight_a AND v.flight_b = d.flight_b
               AND v.i = d.m AND v.j = d.n
    ORDER BY d.flight_a, d.flight_b
    """


@query("q213_dtw_similarity", oracle=_q213_oracle())
def q213_dtw_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DTW distance for every grid-candidate flight pair — the
    order-respecting companion to q47's Hausdorff (a reversed track is
    FAR under DTW, identical under Hausdorff). Candidates come from
    the same 3x3-expanded cell equi-join as q47; each flight is evenly
    downsampled to <=64 points JVM-side before the Arrow stage, so the
    per-pair dynamic program is a bounded 64x64 band in EXACT integer
    micro-km (operators/trajectory.py::dtw_via_pairs) — which is what
    lets the oracle unroll the same DP as 64 windowed CTEs and
    hash-match bit-for-bit. Output: pair, downsampled lengths,
    dtw_ukm."""
    from flightdb_spark.operators.trajectory import (
        candidate_pairs_by_grid,
        dtw_via_pairs,
    )

    tp = synth_trackpoints(spark, sf_dir).filter(F.col("flight_id") < 40)
    pairs = candidate_pairs_by_grid(tp)
    return (
        dtw_via_pairs(tp, pairs)
        .select("flight_a", "flight_b", "n_a", "n_b", "dtw_ukm")
        .orderBy("flight_a", "flight_b")
    )


# ---------------------------------------------------------------------------
# q214 — DAU/WAU stickiness ratio


@query(
    "q214_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day),
    wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM days d JOIN du u
        ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           ROUND(CAST(dau.dau AS DOUBLE) / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON wau.day = dau.day
    ORDER BY dau.day
    """,
)
def q214_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — daily actives over trailing-7-day
    actives, the engagement ratio a product dashboard runs forever.
    Events collapse once to DISTINCT (day, user); the trailing-window
    distinct is the day-bucket explode trick (each (day,user) row
    serves the 7 window-ends it can influence — q151's shape), so no
    windowed COUNT DISTINCT state ever exists. Both aggregates key on
    the calendar-bounded day table."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    ends = du.select(
        F.explode(
            F.expr("sequence(day, date_add(day, 6), interval 1 day)")
        ).alias("day"),
        "user_id",
    )
    days = du.select("day").distinct()
    wau = (
        ends.join(days, "day", "left_semi")
        .groupBy("day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q215 — airspace occupancy time series

OCC_BUCKET_MIN = 30


@query(
    "q215_airspace_occupancy",
    oracle=f"""
    WITH spans AS (
      SELECT user_id AS flight_id,
             epoch_us(MIN(ts)) // ({OCC_BUCKET_MIN} * 60000000) AS b0,
             epoch_us(MAX(ts)) // ({OCC_BUCKET_MIN} * 60000000) AS b1
      FROM events GROUP BY user_id
    ),
    buckets AS (
      SELECT CAST(u.b AS BIGINT) AS bucket, flight_id
      FROM spans, LATERAL (
        SELECT unnest(range(CAST(b0 AS BIGINT), CAST(b1 + 1 AS BIGINT))) AS b
      ) u
    )
    SELECT bucket,
           make_timestamp(bucket * {OCC_BUCKET_MIN} * 60 * 1000000)
             AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n_aloft
    FROM buckets GROUP BY bucket
    ORDER BY bucket
    """,
)
def q215_airspace_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Airspace occupancy: how many flights are aloft in each 30-min
    bucket — the historical load curve behind the reference's realtime
    airspace view (SURVEY §2.11), and exactly the reference's timeslot
    quantization (flightdb.go:6-11, 30-min slots a flight's span
    overlaps). Per-flight spans collapse first (one aggregate), then
    explode to their covered slots — fan-out is span/30min per flight,
    the same bounded interval-explode as q96 — and a slot-keyed count
    finishes. The slot table is calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    us = OCC_BUCKET_MIN * 60_000_000
    spans = ev.groupBy(F.col("user_id").alias("flight_id")).agg(
        F.expr(f"unix_micros(min(ts)) div {us}").alias("b0"),
        F.expr(f"unix_micros(max(ts)) div {us}").alias("b1"),
    )
    buckets = spans.select(
        F.explode(F.expr("sequence(b0, b1)")).alias("bucket"), "flight_id"
    )
    return (
        buckets.groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_aloft"))
        .select(
            "bucket",
            F.timestamp_seconds(F.col("bucket") * OCC_BUCKET_MIN * 60).alias(
                "bucket_start"
            ),
            "n_aloft",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q216 — repeat-purchase interval distribution


@query(
    "q216_repeat_intervals",
    oracle="""
    WITH o AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn,
             LAG(CAST(o_orderdate AS DATE)) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_d
      FROM orders
    ),
    gaps AS (
      SELECT o_custkey, (d - prev_d) AS gap_days FROM o WHERE prev_d IS NOT NULL
    )
    SELECT CAST(gap_days AS BIGINT) AS gap_days,
           CAST(COUNT(*) AS BIGINT) AS n_gaps
    FROM gaps GROUP BY gap_days ORDER BY gap_days
    """,
)
def q216_repeat_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of days between a customer's consecutive orders —
    the inter-purchase-interval histogram behind repeat-rate and churn
    models (q204's KM curve estimates time-to-FIRST conversion; this
    is the repeat cadence). One shuffle on o_custkey for the lag
    window (order ties broken by o_orderkey), then a histogram keyed
    on the integer day gap — output bounded by the calendar span."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        o.select(
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("d"),
            F.lag(F.col("o_orderdate").cast("date")).over(w).alias("prev_d"),
        )
        .filter(F.col("prev_d").isNotNull())
        .select(F.datediff("d", "prev_d").alias("gap_days"))
    )
    return (
        gaps.groupBy(F.col("gap_days").cast("bigint").alias("gap_days"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"))
        .orderBy("gap_days")
    )


# ---------------------------------------------------------------------------
# q217 — custom Python Data Source, oracle-checked

PYDS_FLIGHTS = 50
PYDS_POINTS = 120


@query(
    "q217_python_datasource",
    oracle=f"""
    WITH grid AS (
      SELECT f.f AS flight_id, s.s AS seq,
             ('0x' || substr(md5(f.f || ':' || s.s), 1, 15))::BIGINT AS h
      FROM (SELECT unnest(range({PYDS_FLIGHTS})) AS f) f,
           (SELECT unnest(range({PYDS_POINTS})) AS s) s
    ),
    pts AS (
      SELECT flight_id,
             37.0 + (h % 18000) / 10000.0 AS lat,
             -122.5 + ((h // 18000) % 22900) / 10000.0 AS lon,
             CAST(1000 + ((h // (18000 * 22900)) % 350) * 100 AS BIGINT) AS alt
      FROM grid
    )
    SELECT flight_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(MIN(lat), 4) AS min_lat, ROUND(MAX(lat), 4) AS max_lat,
           ROUND(MIN(lon), 4) AS min_lon, ROUND(MAX(lon), 4) AS max_lon,
           CAST(SUM(alt) AS BIGINT) AS alt_sum
    FROM pts GROUP BY flight_id ORDER BY flight_id
    """,
)
def q217_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python Data Source (sources/pyds.py — Spark 4
    ``pyspark.sql.datasource``) exercised end-to-end: the engine plans
    one InputPartition per flight shard, executors GENERATE their
    shard's trackpoints (no driver data), and the per-flight bounding
    boxes + altitude sums are aggregated downstream. Because
    generation is md5-folded integer arithmetic, the DuckDB oracle
    rebuilds the identical rows from range()+md5() — the connector
    itself is value-hash-verified, not just smoke-tested. (sf_dir is
    unused: the source generates its input.)"""
    from flightdb_spark.sources import pyds

    pyds.register(spark)
    df = (
        spark.read.format("synthetic_tracks")
        .option("n_flights", PYDS_FLIGHTS)
        .option("points_per_flight", PYDS_POINTS)
        .option("n_partitions", 8)
        .load()
    )
    return (
        df.groupBy("flight_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.min("lat"), 4).alias("min_lat"),
            F.round(F.max("lat"), 4).alias("max_lat"),
            F.round(F.min("lon"), 4).alias("min_lon"),
            F.round(F.max("lon"), 4).alias("max_lon"),
            F.sum(F.col("alt_ft").cast("bigint")).cast("bigint").alias("alt_sum"),
        )
        .orderBy("flight_id")
    )


# ---------------------------------------------------------------------------
# q218 — GROUPING SETS with grouping_id


@query(
    "q218_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    ORDER BY gid, priority, status
    """,
)
def q218_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS over (priority, status) — the four-way subtotal
    lattice in ONE Expand pass (q72's cube restricted to the sets a
    dashboard actually wants), with grouping_id disambiguating NULL
    group values from the 'ALL' rollup rows. Revenue accumulates
    per-row-rounded DECIMAL. Catalyst plans a single Expand +
    aggregate — no union of scans."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("q218_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(o_orderstatus, 'ALL') AS status,
               grouping(o_orderpriority) * 2 + grouping(o_orderstatus) AS gid,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue
        FROM q218_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), (o_orderstatus), ())
        ORDER BY gid, priority, status
        """
    )


# ---------------------------------------------------------------------------
# q220 — confusion matrix + precision/recall/F1 at a threshold

CLS_THRESHOLD = 50.0


@query(
    "q219_confusion_matrix",
    oracle=f"""
    WITH lbl AS (
      SELECT CASE WHEN value >= {CLS_THRESHOLD} THEN 1 ELSE 0 END AS pred,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    cm AS (
      SELECT CAST(SUM(pred * y) AS BIGINT) AS tp,
             CAST(SUM(pred * (1 - y)) AS BIGINT) AS fp,
             CAST(SUM((1 - pred) * y) AS BIGINT) AS fn,
             CAST(SUM((1 - pred) * (1 - y)) AS BIGINT) AS tn
      FROM lbl
    )
    SELECT tp, fp, fn, tn,
           ROUND(CAST(tp AS DOUBLE) / (tp + fp), 6) AS precision,
           ROUND(CAST(tp AS DOUBLE) / (tp + fn), 6) AS recall,
           ROUND(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1
    FROM cm
    """,
)
def q219_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-classification readout of 'value >= 50 predicts
    purchase': confusion counts as exact integer conditional sums in
    ONE aggregate, precision/recall/F1 assembled from them (the
    threshold-metric companion to q135's AUC and q201's ECE). Scan-
    bound at any scale."""
    ev = load_table(spark, sf_dir, "events")
    pred = F.when(F.col("value") >= CLS_THRESHOLD, 1).otherwise(0)
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    cm = ev.select(pred.alias("pred"), y.alias("y")).agg(
        F.sum(F.col("pred") * F.col("y")).cast("bigint").alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("y"))).cast("bigint").alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("y")).cast("bigint").alias("fn"),
        F.sum((1 - F.col("pred")) * (1 - F.col("y"))).cast("bigint").alias("tn"),
    )
    return cm.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 6).alias(
            "precision"
        ),
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fn")), 6).alias(
            "recall"
        ),
        F.round(
            2.0 * F.col("tp") / (2.0 * F.col("tp") + F.col("fp") + F.col("fn")), 6
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# q221 — step-wise average precision (AUC-PR)


@query(
    "q220_average_precision",
    oracle="""
    WITH lbl AS (
      SELECT value AS score,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos,
             COUNT(*) AS t
      FROM events GROUP BY value
    ),
    scan AS (
      SELECT SUM(pos) OVER (ORDER BY score DESC) AS cum_pos,
             SUM(t) OVER (ORDER BY score DESC) AS cum_t,
             pos
      FROM lbl
    ),
    tot AS (SELECT SUM(pos) AS p FROM lbl),
    terms AS (
      SELECT CAST(ROUND((CAST(pos AS DOUBLE) / tot.p)
                        * (CAST(cum_pos AS DOUBLE) / cum_t), 9)
                  AS DECIMAL(38,9)) AS term
      FROM scan, tot WHERE pos > 0
    )
    SELECT CAST(tot.p AS BIGINT) AS n_pos,
           ROUND(CAST(SUM(term) AS DOUBLE), 6) AS avg_precision
    FROM terms, tot GROUP BY tot.p
    """,
)
def q220_average_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Step-wise average precision (area under the precision-recall
    curve evaluated at distinct score thresholds — well-defined under
    ties because scores collapse to distinct values first, q135
    discipline): AP = sum over thresholds of delta-recall x precision.
    The descending cumulative scan runs through the bucketed prefix
    primitive (distinct scores, per-bucket windows); each term rounds
    at 9 dp into DECIMAL, output at 6. Completes the ranking-metric
    family: AUC (q135) scores order, ECE (q201) scores probability
    truth, AP scores the retrieval tradeoff."""
    ev = load_table(spark, sf_dir, "events")
    is_pos = F.col("event_type") == "purchase"
    scan = ecdf_counts(
        ev.select((-F.col("value")).alias("neg_score"), is_pos.alias("y")),
        "neg_score",
        {
            "pos": F.when(F.col("y"), 1).otherwise(0),
            "t": F.lit(1),
        },
        n_buckets=64,
    )
    tot = scan.agg(F.sum("pos").cast("bigint").alias("p"))
    terms = (
        scan.filter(F.col("pos") > 0)
        .join(F.broadcast(tot))
        .select(
            F.round(
                (F.col("pos").cast("double") / F.col("p"))
                * (F.col("cum_pos").cast("double") / F.col("cum_t")),
                9,
            )
            .cast("decimal(38,9)")
            .alias("term"),
            "p",
        )
    )
    return terms.groupBy("p").agg(
        F.round(F.sum("term").cast("double"), 6).alias("avg_precision")
    ).select(F.col("p").alias("n_pos"), "avg_precision")


# ---------------------------------------------------------------------------
# q221 — airway conformance (cross-track deviation from a fixed route)

# Airway EPICK -> EDDYY -> MENLO (geo.py waypoint fixtures), projected
# to planar km. All segment constants are Python-precomputed literals
# (DETERMINISM.md §11) so both engines evaluate identical arithmetic.
_AIRWAY = [(37.50, -122.00), (37.80, -121.50), (38.00, -121.00)]
_KY = 111.32
_KX = 88.018  # 111.32 * cos(radians(37.75)) at the airway's mid-latitude

AIRWAY_NEAR_KM = 5.0


def _seg_d2_exprs() -> list[str]:
    """Squared point-to-segment distances, one expression per airway
    leg, over (px, py) columns — identical text for Spark and DuckDB."""
    out = []
    for (lat1, lon1), (lat2, lon2) in zip(_AIRWAY, _AIRWAY[1:]):
        x1, y1 = round(lon1 * _KX, 6), round(lat1 * _KY, 6)
        x2, y2 = round(lon2 * _KX, 6), round(lat2 * _KY, 6)
        dx, dy = round(x2 - x1, 6), round(y2 - y1, 6)
        l2 = round(dx * dx + dy * dy, 6)
        t = f"LEAST(GREATEST(((px - {x1}) * {dx} + (py - {y1}) * {dy}) / {l2}, 0.0), 1.0)"
        out.append(
            f"((px - ({x1} + {t} * {dx})) * (px - ({x1} + {t} * {dx}))"
            f" + (py - ({y1} + {t} * {dy})) * (py - ({y1} + {t} * {dy})))"
        )
    return out


def _airway_oracle() -> str:
    d2 = f"LEAST({', '.join(_seg_d2_exprs())})"
    from .synth import SYNTH_TP_CTE

    return f"""
    WITH {SYNTH_TP_CTE},
    proj AS (
      SELECT flight_id, lon * {_KX} AS px, lat * {_KY} AS py FROM trackpoints
    ),
    dev AS (
      SELECT flight_id, ROUND(sqrt({d2}), 6) AS dev_km FROM proj
    )
    SELECT flight_id,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(MAX(dev_km), 4) AS max_dev_km,
           CAST(SUM(CASE WHEN dev_km <= {AIRWAY_NEAR_KM} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_on_airway,
           ROUND(CAST(SUM(CASE WHEN dev_km <= {AIRWAY_NEAR_KM} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS frac_on_airway
    FROM dev GROUP BY flight_id ORDER BY flight_id
    """


@query("q221_airway_conformance", oracle=_airway_oracle())
def q221_airway_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Airway conformance: each trackpoint's cross-track distance to
    the EPICK->EDDYY->MENLO route (min over clamped point-to-segment
    projections in planar km), rolled up per flight as max deviation
    and the fraction of points within 5 km — the route-adherence
    audit an ANSP runs (the reference's vertical-plane gates answer
    'did it cross'; this answers 'did it FOLLOW'). Segment constants
    are Python-precomputed 6-dp literals shared by both engines; the
    per-point math is one straight-line double expression, map-side;
    one flight_id aggregate finishes."""
    tp = synth_trackpoints(spark, sf_dir)
    d2 = f"LEAST({', '.join(_seg_d2_exprs())})"
    dev = tp.select(
        "flight_id",
        (F.col("lon") * _KX).alias("px"),
        (F.col("lat") * _KY).alias("py"),
    ).select("flight_id", F.expr(f"ROUND(sqrt({d2}), 6)").alias("dev_km"))
    on_air = F.when(F.col("dev_km") <= AIRWAY_NEAR_KM, 1).otherwise(0)
    return (
        dev.groupBy("flight_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_points"),
            F.round(F.max("dev_km"), 4).alias("max_dev_km"),
            F.sum(on_air).cast("bigint").alias("n_on_airway"),
            F.round(
                F.sum(on_air).cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_on_airway"),
        )
        .orderBy("flight_id")
    )


# ---------------------------------------------------------------------------
# q222 — quarter-over-quarter churned customers


@query(
    "q222_churned_customers",
    oracle="""
    WITH q1 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
    ),
    q2 AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderdate >= DATE '1995-04-01' AND o_orderdate < DATE '1995-07-01'
    ),
    churned AS (
      SELECT o_custkey FROM q1
      WHERE o_custkey NOT IN (SELECT o_custkey FROM q2)
    )
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_churned
    FROM churned ch JOIN customer c ON c.c_custkey = ch.o_custkey
    GROUP BY c.c_mktsegment ORDER BY segment
    """,
)
def q222_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter-over-quarter churn: customers who ordered in 1995-Q1
    but not in 1995-Q2, counted per market segment — the semi-join
    THEN anti-join composition (q73 exercises a single anti; churn
    needs both on the same fact table). Both quarter scans carry
    pushed date filters; the anti-join probes the (distinct,
    customer-bounded) Q2 key set; the segment dim joins broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    q1 = (
        o.filter(
            (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1995-04-01")
        )
        .select("o_custkey")
        .distinct()
    )
    q2 = (
        o.filter(
            (F.col("o_orderdate") >= "1995-04-01")
            & (F.col("o_orderdate") < "1995-07-01")
        )
        .select("o_custkey")
        .distinct()
    )
    churned = q1.join(q2, "o_custkey", "left_anti")
    return (
        churned.join(c, churned.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
        .orderBy("segment")
    )
