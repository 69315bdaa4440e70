"""HMM-decoding batch 102 (q576-q580) — hidden-state inference over
user event sequences in EXACT INTEGER SEMIRINGS, so dynamic
programming is oracle-checkable bit-for-bit (no transcendental
likelihoods anywhere):

- q576 Viterbi decode (max-plus semiring): best-path score over the
  first N=6 events per user, iterated as a DataFrame loop (the
  q306/q312 pattern: tiny per-iteration state, localCheckpoint each
  round, broadcast model tables) against an UNROLLED 6-step CTE
  oracle;
- q577 forward path mass (sum-product semiring with positive integer
  weights): the unnormalized likelihood as an exact BIGINT, users
  bucketed by mass digit-count;
- q578 decode margin: best minus second-best final Viterbi score —
  the decode-confidence histogram;
- q579 local-decode runs: per-event emission argmax (a pure CASE
  expression) segmented into runs per user (gaps-and-islands), the
  zero-DP baseline the Viterbi decode improves on;
- q580 switching gain: Viterbi best score vs the best
  SINGLE-STATE path (init + emissions + 5 self-transitions) — the
  integer excess that motivates a sequence model at all.

The model (3 states x 5 event types) is a literal constant table
rendered into both engines. 100 TB shape: the per-iteration state is
(user x 3 states) rows keyed by user_id; model tables broadcast; the
step-index window partitions by user_id. The DP loop is 5 bounded
joins, each localCheckpointed so lineage stays flat.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

N_STEPS = 6

# state 0 = browse, 1 = shop, 2 = churnrisk
STATES = (0, 1, 2)
EVENTS = ("click", "error", "purchase", "signup", "view")
EMIT = {
    0: {"view": 3, "click": 1, "signup": 2, "purchase": -2, "error": 0},
    1: {"view": 1, "click": 3, "signup": 0, "purchase": 4, "error": -1},
    2: {"view": -1, "click": -1, "signup": 0, "purchase": -3, "error": 3},
}
TRANS = {
    (0, 0): 2, (0, 1): 1, (0, 2): -1,
    (1, 0): 0, (1, 1): 2, (1, 2): -1,
    (2, 0): 0, (2, 1): -1, (2, 2): 2,
}
INIT = {0: 1, 1: 0, 2: 0}

# positive-weight variants for the sum-product semiring (q577)
F_SHIFT_E, F_SHIFT_T, F_SHIFT_I = 4, 2, 1

# local decode: emission argmax per event type, min-state tie-break
LOCAL_STATE = {
    ev: min(STATES, key=lambda s: (-EMIT[s][ev], s)) for ev in EVENTS
}


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _seq_cte() -> str:
    return f"""seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS step
      FROM events
    ),
    capped AS (SELECT * FROM seq WHERE step <= {N_STEPS})"""


def _model_ctes(forward: bool = False) -> str:
    se, st, si = (F_SHIFT_E, F_SHIFT_T, F_SHIFT_I) if forward else (0, 0, 0)
    emit = ", ".join(
        f"({s}, '{ev}', {EMIT[s][ev] + se})" for s in STATES for ev in EVENTS
    )
    trans = ", ".join(
        f"({a}, {b}, {TRANS[(a, b)] + st})" for a in STATES for b in STATES
    )
    init = ", ".join(f"({s}, {INIT[s] + si})" for s in STATES)
    return f"""emit(state, event_type, e) AS (VALUES {emit}),
    trans(s_from, s_to, t) AS (VALUES {trans}),
    init(state, i0) AS (VALUES {init})"""


def _dp_ctes(op: str) -> str:
    """Unrolled N-step DP in the given semiring ('MAX' or 'SUM')."""
    steps = [
        """v1 AS (
      SELECT c.user_id, e.state, CAST(i.i0 + e.e AS BIGINT) AS score
      FROM capped c
      JOIN emit e ON e.event_type = c.event_type
      JOIN init i ON i.state = e.state
      WHERE c.step = 1
    )"""
    ]
    for i in range(2, N_STEPS + 1):
        steps.append(f"""v{i} AS (
      SELECT m.user_id, m.s_to AS state, CAST(m.best + e.e AS BIGINT) AS score
      FROM (
        SELECT v.user_id, t.s_to, {op}(v.score + t.t) AS best
        FROM v{i - 1} v JOIN trans t ON t.s_from = v.state
        GROUP BY v.user_id, t.s_to
      ) m
      JOIN capped c ON c.user_id = m.user_id AND c.step = {i}
      JOIN emit e ON e.event_type = c.event_type AND e.state = m.s_to
    )""")
    return ",\n    ".join(steps)


def _emit_case(s: int, var: str, shift: int) -> str:
    whens = " ".join(
        f"WHEN {var} = '{ev}' THEN CAST({EMIT[s][ev] + shift} AS BIGINT)"
        for ev in EVENTS
    )
    return f"(CASE {whens} END)"


def _dp_fold_expr(op: str, forward: bool = False) -> str:
    """The whole N_STEPS-step DP as ONE higher-order fold over a
    user's ordered event array `evs` (guide §4.2/§2.4: the loop state
    is 3 BIGINTs per user, so the five per-round shuffles + the five
    re-derivations of the events window collapse into a single JVM
    expression). Semantics are exactly `_dp_ctes`: v1 = init + emit,
    v_k[j] = OP_i(v_{k-1}[i] + trans[i][j]) + emit[j], all BIGINT."""
    se, st, si = (F_SHIFT_E, F_SHIFT_T, F_SHIFT_I) if forward else (0, 0, 0)
    init = ", ".join(
        f"CAST({INIT[s] + si} AS BIGINT) + {_emit_case(s, 'element_at(evs, 1)', se)}"
        for s in STATES
    )
    steps = []
    for j in STATES:
        terms = [
            f"(element_at(acc, {i + 1}) + CAST({TRANS[(i, j)] + st} AS BIGINT))"
            for i in STATES
        ]
        combined = (
            f"greatest({', '.join(terms)})" if op == "MAX" else " + ".join(terms)
        )
        steps.append(f"{combined} + {_emit_case(j, 'x', se)}")
    return (
        f"aggregate(slice(evs, 2, size(evs) - 1), array({init}), "
        f"(acc, x) -> array({', '.join(steps)}))"
    )


def _user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered first-N_STEPS event array: one window pass +
    one aggregation (array_sort on the unique step key makes the
    collect_list order deterministic)."""
    _views(spark, sf_dir)
    seq = spark.sql(
        f"WITH {_seq_cte()} SELECT user_id, event_type, step FROM capped"
    )
    return seq.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(step, event_type))), "
            "p -> p.event_type)"
        ).alias("evs")
    )


def _viterbi_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-plus Viterbi DP per user as one higher-order fold (see
    `_dp_fold_expr`) — same (user_id, state, score) table the old
    5-round DataFrame loop produced, without the per-round shuffles."""
    evs = _user_events(spark, sf_dir)
    return evs.select(
        "user_id",
        F.posexplode(F.expr(_dp_fold_expr("MAX"))).alias("state", "score"),
    )


# ---------------------------------------------------------------------------
# q576 — Viterbi decode


def _viterbi_sql() -> str:
    return f"""
    WITH {_seq_cte()},
    {_model_ctes()},
    {_dp_ctes('MAX')},
    ranked AS (
      SELECT user_id, state, score,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY score DESC, state) AS rn
      FROM v{N_STEPS}
    )
    SELECT state AS final_state,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(score) AS BIGINT) AS total_score,
           CAST(MIN(score) AS BIGINT) AS min_score,
           CAST(MAX(score) AS BIGINT) AS max_score
    FROM ranked WHERE rn = 1
    GROUP BY state
    ORDER BY final_state
    """


@query("q576_viterbi_decode", oracle=_viterbi_sql())
def q576_viterbi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Viterbi best-path decode (max-plus, exact integers) over each
    user's first 6 events, as a 5-round DataFrame DP loop with
    broadcast model tables and per-round localCheckpoint; the final
    state takes the min-state tie-break. The oracle is the same DP
    unrolled into 6 CTEs — loop and closed form must agree exactly."""
    from pyspark.sql import Window

    v = _viterbi_final(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("state"))
    best = v.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.groupBy(F.col("state").alias("final_state"))
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("score").cast("bigint").alias("total_score"),
            F.min("score").cast("bigint").alias("min_score"),
            F.max("score").cast("bigint").alias("max_score"),
        )
        .orderBy("final_state")
    )


# ---------------------------------------------------------------------------
# q577 — forward path mass (sum-product)


def _forward_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    WITH {_seq_cte()},
    {_model_ctes(forward=True)},
    {_dp_ctes('SUM')},
    mass AS (
      SELECT user_id, CAST(SUM(score) AS BIGINT) AS path_mass
      FROM v{N_STEPS} GROUP BY user_id
    )
    SELECT CAST(LENGTH(CAST(path_mass AS {s})) AS BIGINT) AS mass_digits,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(path_mass) AS BIGINT) AS min_mass,
           CAST(MAX(path_mass) AS BIGINT) AS max_mass
    FROM mass
    GROUP BY LENGTH(CAST(path_mass AS {s}))
    ORDER BY mass_digits
    """


@query("q577_forward_path_mass", oracle=_forward_sql("duck"))
def q577_forward_path_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forward algorithm in the sum-product semiring with
    positive integer weights: each user's total path mass (the exact
    unnormalized sequence likelihood, a BIGINT — no logs, no libm),
    users bucketed by mass digit count. Same unrolled-DP oracle
    shape as q576 with MAX swapped for SUM; the Spark side runs the
    same one-fold DP as q576 (see `_dp_fold_expr`)."""
    evs = _user_events(spark, sf_dir)
    mass = evs.select(
        F.expr(
            f"aggregate({_dp_fold_expr('SUM', forward=True)}, "
            "CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("path_mass")
    )
    return (
        mass.groupBy(
            F.length(F.col("path_mass").cast("string"))
            .cast("bigint")
            .alias("mass_digits")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("path_mass").cast("bigint").alias("min_mass"),
            F.max("path_mass").cast("bigint").alias("max_mass"),
        )
        .orderBy("mass_digits")
    )


# ---------------------------------------------------------------------------
# q578 — decode margin


def _margin_sql() -> str:
    return f"""
    WITH {_seq_cte()},
    {_model_ctes()},
    {_dp_ctes('MAX')},
    ranked AS (
      SELECT user_id, score,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY score DESC, state) AS rn
      FROM v{N_STEPS}
    ),
    margins AS (
      SELECT a.user_id, CAST(a.score - b.score AS BIGINT) AS margin
      FROM ranked a JOIN ranked b
        ON b.user_id = a.user_id AND a.rn = 1 AND b.rn = 2
    )
    SELECT margin, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM margins
    GROUP BY margin
    ORDER BY margin
    """


@query("q578_decode_margin", oracle=_margin_sql())
def q578_decode_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode confidence: best minus second-best final Viterbi score
    per user (exact integer margin), as a histogram. Margin 0 means
    the decode is ambiguous at the final step; large margins mean the
    hidden state is unmistakable. Reuses the DataFrame DP loop."""
    from pyspark.sql import Window

    v = _viterbi_final(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("score"), F.asc("state"))
    ranked = v.withColumn("rn", F.row_number().over(w))
    a = ranked.filter(F.col("rn") == 1).select("user_id", F.col("score").alias("s1"))
    b = ranked.filter(F.col("rn") == 2).select("user_id", F.col("score").alias("s2"))
    return (
        a.join(b, "user_id")
        .select((F.col("s1") - F.col("s2")).cast("bigint").alias("margin"))
        .groupBy("margin")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("margin")
    )


# ---------------------------------------------------------------------------
# q579 — local-decode runs


def _local_runs_sql() -> str:
    case = " ".join(
        f"WHEN event_type = '{ev}' THEN {LOCAL_STATE[ev]}" for ev in EVENTS
    )
    return f"""
    WITH seq AS (
      SELECT user_id,
             CASE {case} END AS lstate,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS step
      FROM events
    ),
    grp AS (
      SELECT user_id, lstate, step,
             step - ROW_NUMBER() OVER (PARTITION BY user_id, lstate
                                       ORDER BY step) AS island
      FROM seq
    ),
    runs AS (
      SELECT user_id, lstate, island, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM grp GROUP BY user_id, lstate, island
    )
    SELECT lstate AS local_state,
           CAST(COUNT(*) AS BIGINT) AS n_runs,
           CAST(SUM(run_len) AS BIGINT) AS total_steps,
           CAST(MAX(run_len) AS BIGINT) AS max_run,
           ROUND(CAST(SUM(run_len) AS DOUBLE) / COUNT(*), 6) AS avg_run
    FROM runs
    GROUP BY lstate
    ORDER BY local_state
    """


@query("q579_local_decode_runs", oracle=_local_runs_sql())
def q579_local_decode_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The zero-DP baseline: decode each event independently by
    emission argmax (a CASE expression, min-state tie-break baked in
    at query-build time) and segment each user's full timeline into
    runs of identical local states (gaps-and-islands). Run-length
    stats per state show how much temporal smoothing the Viterbi
    decode adds. All windows partition by user."""
    _views(spark, sf_dir)
    return spark.sql(_local_runs_sql())


# ---------------------------------------------------------------------------
# q580 — switching gain vs best single-state path


def _single_state_cte() -> str:
    per_state = []
    for s in STATES:
        case = " ".join(
            f"WHEN event_type = '{ev}' THEN {EMIT[s][ev]}" for ev in EVENTS
        )
        per_state.append(
            f"""SELECT user_id, {s} AS state,
               CAST({INIT[s]} + {(N_STEPS - 1) * TRANS[(s, s)]}
                    + SUM(CASE {case} END) AS BIGINT) AS score
        FROM capped GROUP BY user_id"""
        )
    union = "\n        UNION ALL\n        ".join(per_state)
    return f"""single AS (
      SELECT user_id, MAX(score) AS best_single FROM (
        {union}
      ) s GROUP BY user_id
    )"""


def _switch_sql() -> str:
    return f"""
    WITH {_seq_cte()},
    {_model_ctes()},
    {_dp_ctes('MAX')},
    vbest AS (
      SELECT user_id, MAX(score) AS best FROM v{N_STEPS} GROUP BY user_id
    ),
    {_single_state_cte()}
    SELECT CAST(v.best - s.best_single AS BIGINT) AS switching_gain,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM vbest v JOIN single s ON s.user_id = v.user_id
    GROUP BY v.best - s.best_single
    ORDER BY switching_gain
    """


@query("q580_switching_gain", oracle=_switch_sql())
def q580_switching_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much the sequence model buys: Viterbi best score minus the
    best SINGLE-state path (init + 5 self-transitions + emission sums,
    computed per state in one aggregate) per user, as an exact integer
    histogram. Gain 0 = one hidden state explains the user; positive
    gain = the decode genuinely switches states."""
    _views(spark, sf_dir)
    vbest = (
        _viterbi_final(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("score").alias("best"))
    )
    single = spark.sql(
        f"WITH {_seq_cte()}, {_single_state_cte()} SELECT * FROM single"
    )
    return (
        vbest.join(single, "user_id")
        .select(
            (F.col("best") - F.col("best_single")).cast("bigint").alias("switching_gain")
        )
        .groupBy("switching_gain")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("switching_gain")
    )
