"""Critical-path-method batch 190 (q1017-q1021) — CPM/PERT project
scheduling (Kelley & Walker 1959; Malcolm et al. 1959) over an
order-fulfillment activity network: the forward/backward longest-path
passes, slack and the critical path, one-at-a-time crash sensitivity,
PERT three-point estimates, and the resource (WIP) histogram.

The activity network is a LITERAL 10-node / 12-edge DAG (intake ->
credit/pick -> consolidation/audit -> packing/hold -> shipping ->
invoicing -> settlement); durations are integer hours DERIVED FROM
DATA — each activity reads the order count of one o_orderpriority
class mod an activity-specific literal, so durations vary with scale
factor but are bit-identical across engines.

Longest paths run as BOUNDED Bellman rounds (the q259 min-plus shape,
max-plus here): 6 rounds cover the 7-node max depth. Per the q812
lesson taken to its conclusion (round-9 guide section 4.2: bounded
state, so the whole iteration is one vectorized task), the Spark side
runs the max-plus fixpoint in ONE cogrouped-Arrow pass over the
checkpointed 10-row duration census — the previously unrolled es0..es6
/ ld0..ld6 CTE chain re-expanded each level's two references of the
level below, growing the static plan near-exponentially (q1021: 1024
Exchanges / 248 SortMergeJoins over <= 20 rows). The DuckDB oracle
keeps the unrolled chain with the same CTEs AS MATERIALIZED
(byte-identical oracle strings; Python int max-plus == SQL MAX/+ on
BIGINT exactly).

- q1017 forward pass: earliest start/finish per activity (exact
  integer hours) + the project makespan;
- q1018 slack analysis: backward pass via longest-tail distances,
  latest start/finish, total float, critical flag;
- q1019 crash sensitivity: re-run the forward pass under 11 literal
  scenarios (baseline + crash each activity to 3/4 duration):
  makespan delta per crashed activity — only critical-path activities
  shorten the project;
- q1020 PERT: three-point (o=3d/4, m=d, p=3d/2+2) estimates carried
  in exact sixth-units (te6 = o+4m+p), activity variance in exact
  36th-units, critical-path totals;
- q1021 resource histogram: WIP step function of the earliest-start
  schedule via +1/-1 endpoint events and a bounded cumulative sum —
  peak concurrency and its interval.

100 TB shape: ONE orders scan to a 5-row priority census; everything
downstream is literal-bounded (10 nodes, 12 edges, 11 scenarios).

Determinism: integer hours end-to-end; integer div via dialect
div/'//'; ties in critical-path ordering break on activity id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# (activity, priority class feeding its duration, base hours, modulus)
ACTS = [
    ("A_intake", "1-URGENT", 5, 13),
    ("B_credit", "2-HIGH", 8, 11),
    ("C_pick", "3-MEDIUM", 12, 17),
    ("D_consolidation", "4-NOT SPECIFIED", 6, 7),
    ("E_audit", "5-LOW", 9, 13),
    ("F_pack", "1-URGENT", 7, 11),
    ("G_hold", "2-HIGH", 10, 17),
    ("H_ship", "3-MEDIUM", 14, 19),
    ("I_invoice", "4-NOT SPECIFIED", 4, 7),
    ("J_settle", "5-LOW", 6, 11),
]

EDGES = [
    ("A_intake", "B_credit"),
    ("A_intake", "C_pick"),
    ("B_credit", "D_consolidation"),
    ("C_pick", "D_consolidation"),
    ("C_pick", "E_audit"),
    ("D_consolidation", "F_pack"),
    ("E_audit", "F_pack"),
    ("E_audit", "G_hold"),
    ("F_pack", "H_ship"),
    ("G_hold", "H_ship"),
    ("H_ship", "I_invoice"),
    ("I_invoice", "J_settle"),
]

ROUNDS = 6  # max path depth is 7 nodes = 6 edges


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _acts_values() -> str:
    return ", ".join(f"('{a}', '{p}', {b}, {m})" for a, p, b, m in ACTS)


def _edges_values() -> str:
    return ", ".join(f"('{u}', '{v}')" for u, v in EDGES)


def _dur_sql() -> str:
    """(act, dur) from the orders priority census — engine-neutral."""
    return f"""
    prio AS (
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY o_orderpriority
    ),
    actspec(act, prio, base, md) AS (VALUES {_acts_values()}),
    actdur AS (
      SELECT a.act, CAST(a.base + (p.cnt % a.md) AS BIGINT) AS dur
      FROM actspec a JOIN prio p ON p.o_orderpriority = a.prio
    ),
    eg(src, dst) AS (VALUES {_edges_values()})
    """


def _esld_pandas(key, pdf):  # pragma: no cover - runs on executors
    """Forward (es) and backward-tail (ld) max-plus fixpoints over the
    bounded 10-node / 12-edge network in ONE in-process pass — the
    exact `_fwd_rounds` / `_tail_rounds` recurrences run for exactly
    ROUNDS rounds in Python ints (non-negative BIGINTs, so Python max/+
    == SQL MAX/+ bit-exactly)."""
    import pandas as pd

    dur = {str(a): int(x) for a, x in zip(pdf["act"], pdf["dur"])}
    # a priority class absent from the orders census drops its activity
    # from actdur; the old SQL chain degraded silently (the JOIN just
    # dropped those edges) — mirror that by skipping incomplete edges
    # instead of raising KeyError in the executor (r10 ADVICE)
    edges = [(u, v) for u, v in EDGES if u in dur and v in dur]
    es = {a: 0 for a in dur}
    for _ in range(ROUNDS):
        prev = dict(es)
        for u, v in edges:
            cand = prev[u] + dur[u]
            if cand > es[v]:
                es[v] = cand
    ld = dict(dur)
    for _ in range(ROUNDS):
        prev = dict(ld)
        for u, v in edges:
            cand = dur[u] + prev[v]
            if cand > ld[u]:
                ld[u] = cand
    rows = [(n, dur[n], es[n], ld[n]) for n in sorted(dur)]
    return pd.DataFrame(rows, columns=["node", "dur", "es", "ld"])


def _ses_pandas(key, pdf):  # pragma: no cover - runs on executors
    """All 11 crash scenarios' forward fixpoints (q1019) in one pass:
    scenario s crashes activity s to (dur*3) div 4 — Python // on
    non-negative ints == SQL div — then the same es recurrence."""
    import pandas as pd

    base = {str(a): int(x) for a, x in zip(pdf["act"], pdf["dur"])}
    # same incomplete-census guard as _esld_pandas (r10 ADVICE)
    edges = [(u, v) for u, v in EDGES if u in base and v in base]
    rows = []
    for scen in ["baseline"] + [a for a, _, _, _ in ACTS]:
        dur = {a: ((v * 3) // 4 if a == scen else v) for a, v in base.items()}
        es = {a: 0 for a in dur}
        for _ in range(ROUNDS):
            prev = dict(es)
            for u, v in edges:
                cand = prev[u] + dur[u]
                if cand > es[v]:
                    es[v] = cand
        rows.extend((scen, n, es[n], dur[n]) for n in sorted(dur))
    return pd.DataFrame(rows, columns=["scen", "node", "es", "dur"])


def _prep(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the tiny duration census once (q812 lesson: never
    let a round chain re-inline the fact scan), then solve both
    max-plus fixpoints in one Arrow pass -> cpm_esld view."""
    from pyspark.sql import functions as F

    _views(spark, sf_dir, "orders")
    durs = spark.sql(
        f"WITH {_dur_sql().strip()} SELECT act, dur FROM actdur"
    ).localCheckpoint(eager=True)
    durs.createOrReplaceTempView("cpm_durs")
    esld = (
        durs.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(_esld_pandas, "node string, dur bigint, es bigint, ld bigint")
    )
    esld.localCheckpoint(eager=True).createOrReplaceTempView("cpm_esld")


def _fwd_rounds(src: str, durs: str, mat: str) -> str:
    """es_k chain: es_k(n) = max(es_{k-1}(n), max over preds
    es_{k-1}(u) + dur(u)). es_0 = 0 for every node."""
    out = [f"es0 AS {mat}(SELECT act AS node, CAST(0 AS BIGINT) AS es FROM {durs})"]
    for k in range(1, ROUNDS + 1):
        out.append(
            f"""es{k} AS {mat}(
      SELECT node, MAX(es) AS es FROM (
        SELECT node, es FROM es{k - 1}
        UNION ALL
        SELECT e.dst AS node, d.es + e.src_dur AS es
        FROM es{k - 1} d JOIN {src} e ON e.src = d.node
      ) t GROUP BY node
    )"""
        )
    return ",\n    ".join(out)


def _tail_rounds(src: str, durs: str, mat: str) -> str:
    """ld_k chain: longest duration-sum from the START of n to project
    end. ld_0 = dur(n); ld_k(n) = max(ld_{k-1}(n), dur(n) +
    max over succ ld_{k-1}(v))."""
    out = [f"ld0 AS {mat}(SELECT act AS node, dur, dur AS ld FROM {durs})"]
    for k in range(1, ROUNDS + 1):
        out.append(
            f"""ld{k} AS {mat}(
      SELECT node, MAX(dur) AS dur, MAX(ld) AS ld FROM (
        SELECT node, dur, ld FROM ld{k - 1}
        UNION ALL
        SELECT e.src AS node, e.src_dur AS dur, e.src_dur + d.ld AS ld
        FROM ld{k - 1} d JOIN {src} e ON e.dst = d.node
      ) t GROUP BY node
    )"""
        )
    return ",\n    ".join(out)


def _oracle_head(*chains: str) -> str:
    """Oracle WITH-head: data-derived durations + materialized edge
    list + the requested round chains (each AS MATERIALIZED)."""
    return (
        f"WITH {_dur_sql()},\n    eg_d AS MATERIALIZED (SELECT e.src, e.dst,"
        " du.dur AS src_dur, dd.dur AS dst_dur FROM eg e"
        " JOIN actdur du ON du.act = e.src"
        " JOIN actdur dd ON dd.act = e.dst),\n    "
        + ",\n    ".join(chains)
    )


def _q1017_sql(d: str) -> str:
    if d == "spark":
        return """
    SELECT f.node AS activity, f.dur, f.es,
           f.es + f.dur AS ef,
           CAST((SELECT MAX(f2.es + f2.dur) FROM cpm_esld f2) AS BIGINT)
             AS makespan
    FROM cpm_esld f
    ORDER BY f.es, f.node
    """
    head = _oracle_head(_fwd_rounds("eg_d", "actdur", "MATERIALIZED "))
    durs = "actdur"
    return f"""
    {head}
    SELECT f.node AS activity, du.dur, f.es,
           f.es + du.dur AS ef,
           CAST((SELECT MAX(f2.es + d2.dur) FROM es{ROUNDS} f2
                 JOIN {durs} d2 ON d2.act = f2.node) AS BIGINT) AS makespan
    FROM es{ROUNDS} f JOIN {durs} du ON du.act = f.node
    ORDER BY f.es, f.node
    """


@query("q1017_cpm_forward", oracle=_q1017_sql("duckdb"))
def q1017_cpm_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CPM forward pass: earliest start/finish per activity via six
    unrolled max-plus Bellman rounds over the materialized 12-edge
    network, plus the project makespan — exact integer hours derived
    from the orders priority census."""
    _prep(spark, sf_dir)
    return spark.sql(_q1017_sql("spark"))


def _q1018_sql(d: str) -> str:
    if d == "spark":
        return """
    WITH mk AS (SELECT MAX(es + dur) AS t FROM cpm_esld)
    SELECT f.node AS activity, f.dur,
           f.es, f.es + f.dur AS ef,
           mk.t - f.ld AS ls,
           mk.t - f.ld + f.dur AS lf,
           (mk.t - f.ld) - f.es AS total_float,
           CAST(CASE WHEN (mk.t - f.ld) - f.es = 0 THEN 1 ELSE 0 END AS INT)
             AS is_critical
    FROM cpm_esld f CROSS JOIN mk
    ORDER BY f.es, f.node
    """
    durs = "actdur"
    head = _oracle_head(
        _fwd_rounds("eg_d", "actdur", "MATERIALIZED "),
        _tail_rounds("eg_d", "actdur", "MATERIALIZED "),
    )
    return f"""
    {head},
    mk AS (SELECT MAX(es + dur) AS t FROM es{ROUNDS} f
           JOIN {durs} du ON du.act = f.node)
    SELECT f.node AS activity, du.dur,
           f.es, f.es + du.dur AS ef,
           mk.t - l.ld AS ls,
           mk.t - l.ld + du.dur AS lf,
           (mk.t - l.ld) - f.es AS total_float,
           CAST(CASE WHEN (mk.t - l.ld) - f.es = 0 THEN 1 ELSE 0 END AS INT)
             AS is_critical
    FROM es{ROUNDS} f
    JOIN {durs} du ON du.act = f.node
    JOIN ld{ROUNDS} l ON l.node = f.node
    CROSS JOIN mk
    ORDER BY f.es, f.node
    """


@query("q1018_cpm_slack", oracle=_q1018_sql("duckdb"))
def q1018_cpm_slack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CPM slack analysis: latest start/finish from the backward
    (longest-tail) pass, total float and the critical flag — the
    zero-float chain IS the critical path. Six max-plus rounds each
    way on the materialized bounded network."""
    _prep(spark, sf_dir)
    return spark.sql(_q1018_sql("spark"))


def _scen_values() -> str:
    return ", ".join(["('baseline')"] + [f"('{a}')" for a, _, _, _ in ACTS])


def _sdur_sedge_sql(d: str, durs: str, edges: str) -> tuple[str, str]:
    """Scenario-crossed duration/edge tables (bounded 110/132 rows)."""
    intdiv = "div" if d == "spark" else "//"
    sdur = f"""
      SELECT /*+ BROADCAST(s) */ s.scen, a.act,
             CASE WHEN s.scen = a.act
               THEN (a.dur * 3) {intdiv} 4 ELSE a.dur END AS dur
      FROM scen s CROSS JOIN {durs} a"""
    sedge = f"""
      SELECT /*+ BROADCAST(s) */ s.scen, e.src, e.dst, du.dur AS src_dur
      FROM scen s CROSS JOIN {edges} e
      JOIN sdur du ON du.scen = s.scen AND du.act = e.src"""
    return sdur, sedge


def _q1019_sql(d: str) -> str:
    # oracle (duckdb) form only: the Spark side solves all scenarios in
    # one Arrow pass (_ses_pandas) and never renders this SQL (the old
    # spark branch referenced cpm_sdur/cpm_sedge views _prep no longer
    # creates — removed as dead code, r10 ADVICE)
    pre = _oracle_head() + "\n    "
    sdur_t, sedge_t = "sdur", "sedge"
    mat = "MATERIALIZED "
    sdur_sql, sedge_sql = _sdur_sedge_sql(d, "actdur", "eg_d")
    rounds = [
        f"""sdur AS {mat}({sdur_sql}
    ),
    sedge AS {mat}({sedge_sql}
    ),
    ses0 AS {mat}(SELECT scen, act AS node, CAST(0 AS BIGINT) AS es
                  FROM sdur)"""
    ]
    for k in range(1, ROUNDS + 1):
        rounds.append(
            f"""ses{k} AS {mat}(
      SELECT scen, node, MAX(es) AS es FROM (
        SELECT scen, node, es FROM ses{k - 1}
        UNION ALL
        SELECT e.scen, e.dst AS node, d.es + e.src_dur AS es
        FROM ses{k - 1} d JOIN {sedge_t} e
          ON e.scen = d.scen AND e.src = d.node
      ) t GROUP BY scen, node
    )"""
        )
    chain = ",\n    ".join(rounds)
    scen_head = f"scen(scen) AS (VALUES {_scen_values()}),\n    "
    return f"""
    {pre}{scen_head}{chain},
    mk AS (
      SELECT f.scen, MAX(f.es + du.dur) AS makespan
      FROM ses{ROUNDS} f JOIN {sdur_t} du
        ON du.scen = f.scen AND du.act = f.node
      GROUP BY f.scen
    )
    SELECT /*+ BROADCAST(b) */ m.scen AS crashed_activity, m.makespan,
           b.makespan AS baseline_makespan,
           b.makespan - m.makespan AS saved_hours
    FROM mk m CROSS JOIN (SELECT makespan FROM mk WHERE scen = 'baseline') b
    ORDER BY m.scen
    """


@query("q1019_crash_sensitivity", oracle=_q1019_sql("duckdb"))
def q1019_crash_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crash (tornado) sensitivity: rerun the forward pass under 11
    literal scenarios — baseline plus each activity crashed to 3/4
    duration — and report makespan savings. Only critical-path
    activities save hours; the scenario key rides through the same six
    unrolled rounds (110 rows max)."""
    _prep(spark, sf_dir)
    from pyspark.sql import functions as F

    # all 11 scenarios' forward fixpoints in ONE Arrow pass over the
    # checkpointed 10-row duration census (was: two scenario-crossed
    # checkpoints + 6 join/agg rounds with 3 more checkpoints — ~11
    # tiny jobs of pure scheduling overhead)
    ses = (
        spark.table("cpm_durs")
        .withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            _ses_pandas, "scen string, node string, es bigint, dur bigint"
        )
    )
    mk = ses.groupBy("scen").agg(
        F.max(F.col("es") + F.col("dur")).alias("makespan")
    )
    base = mk.filter(F.col("scen") == "baseline").select(
        F.col("makespan").alias("baseline_makespan")
    )
    return (
        mk.crossJoin(F.broadcast(base))
        .select(
            F.col("scen").alias("crashed_activity"),
            "makespan",
            "baseline_makespan",
            (F.col("baseline_makespan") - F.col("makespan")).alias(
                "saved_hours"
            ),
        )
        .orderBy("crashed_activity")
    )


def _q1020_sql(d: str) -> str:
    intdiv = "div" if d == "spark" else "//"
    if d == "spark":
        return """
    WITH mk AS (SELECT MAX(es + dur) AS t FROM cpm_esld),
    pert AS (
      SELECT f.node AS activity, f.dur,
             (f.dur * 3) div 4 AS o_hours,
             f.dur AS m_hours,
             (f.dur * 3) div 2 + 2 AS p_hours,
             CAST((f.dur * 3) div 4 + 4 * f.dur
                  + (f.dur * 3) div 2 + 2 AS BIGINT) AS te6,
             CAST(((f.dur * 3) div 2 + 2 - (f.dur * 3) div 4)
                  * ((f.dur * 3) div 2 + 2 - (f.dur * 3) div 4)
               AS BIGINT) AS var36,
             CAST(CASE WHEN (mk.t - f.ld) - f.es = 0 THEN 1 ELSE 0 END AS INT)
               AS is_critical
      FROM cpm_esld f CROSS JOIN mk
    )
    SELECT activity, dur, o_hours, m_hours, p_hours, te6, var36,
           CAST(te6 AS DOUBLE) / 6.0 AS te_hours,
           is_critical,
           CAST(SUM(CASE WHEN is_critical = 1 THEN te6 ELSE 0 END)
                OVER () AS BIGINT) AS critical_te6,
           CAST(SUM(CASE WHEN is_critical = 1 THEN var36 ELSE 0 END)
                OVER () AS BIGINT) AS critical_var36
    FROM pert
    ORDER BY activity
    """
    durs = "actdur"
    head = _oracle_head(
        _fwd_rounds("eg_d", "actdur", "MATERIALIZED "),
        _tail_rounds("eg_d", "actdur", "MATERIALIZED "),
    )
    return f"""
    {head},
    mk AS (SELECT MAX(es + dur) AS t FROM es{ROUNDS} f
           JOIN {durs} du ON du.act = f.node),
    pert AS (
      SELECT f.node AS activity, du.dur,
             (du.dur * 3) {intdiv} 4 AS o_hours,
             du.dur AS m_hours,
             (du.dur * 3) {intdiv} 2 + 2 AS p_hours,
             CAST((du.dur * 3) {intdiv} 4 + 4 * du.dur
                  + (du.dur * 3) {intdiv} 2 + 2 AS BIGINT) AS te6,
             CAST(((du.dur * 3) {intdiv} 2 + 2 - (du.dur * 3) {intdiv} 4)
                  * ((du.dur * 3) {intdiv} 2 + 2 - (du.dur * 3) {intdiv} 4)
               AS BIGINT) AS var36,
             CAST(CASE WHEN (mk.t - l.ld) - f.es = 0 THEN 1 ELSE 0 END AS INT)
               AS is_critical
      FROM es{ROUNDS} f
      JOIN {durs} du ON du.act = f.node
      JOIN ld{ROUNDS} l ON l.node = f.node
      CROSS JOIN mk
    )
    SELECT activity, dur, o_hours, m_hours, p_hours, te6, var36,
           CAST(te6 AS DOUBLE) / 6.0 AS te_hours,
           is_critical,
           CAST(SUM(CASE WHEN is_critical = 1 THEN te6 ELSE 0 END)
                OVER () AS BIGINT) AS critical_te6,
           CAST(SUM(CASE WHEN is_critical = 1 THEN var36 ELSE 0 END)
                OVER () AS BIGINT) AS critical_var36
    FROM pert
    ORDER BY activity
    """


@query("q1020_pert_estimates", oracle=_q1020_sql("duckdb"))
def q1020_pert_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERT three-point estimates: optimistic/modal/pessimistic from
    deterministic transforms of the CPM durations, expected duration
    in EXACT sixth-units (te6 = o+4m+p) and variance in 36th-units,
    plus critical-path totals — the project-level mean/variance a
    PERT risk read-out needs, with no floating point until te_hours."""
    _prep(spark, sf_dir)
    return spark.sql(_q1020_sql("spark"))


def _q1021_sql(d: str) -> str:
    if d == "spark":
        return """
    WITH sched AS (
      SELECT f.node, f.es, f.es + f.dur AS ef FROM cpm_esld f
    ),
    events AS (
      SELECT es AS t, 1 AS delta FROM sched
      UNION ALL
      SELECT ef AS t, -1 AS delta FROM sched
    ),
    steps AS (
      SELECT t, SUM(delta) AS net
      FROM events GROUP BY t
    ),
    profile AS (
      SELECT t,
             CAST(SUM(net) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS wip
      FROM steps
    )
    SELECT t AS from_hour,
           COALESCE(LEAD(t) OVER (ORDER BY t), t) AS to_hour,
           wip,
           CAST(CASE WHEN wip = (SELECT MAX(wip) FROM profile)
                THEN 1 ELSE 0 END AS INT) AS is_peak
    FROM profile
    ORDER BY t
    """
    durs = "actdur"
    head = _oracle_head(_fwd_rounds("eg_d", "actdur", "MATERIALIZED "))
    return f"""
    {head},
    sched AS (
      SELECT f.node, f.es, f.es + du.dur AS ef
      FROM es{ROUNDS} f JOIN {durs} du ON du.act = f.node
    ),
    events AS (
      SELECT es AS t, 1 AS delta FROM sched
      UNION ALL
      SELECT ef AS t, -1 AS delta FROM sched
    ),
    steps AS (
      SELECT t, SUM(delta) AS net
      FROM events GROUP BY t
    ),
    profile AS (
      SELECT t,
             CAST(SUM(net) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS wip
      FROM steps
    )
    SELECT t AS from_hour,
           COALESCE(LEAD(t) OVER (ORDER BY t), t) AS to_hour,
           wip,
           CAST(CASE WHEN wip = (SELECT MAX(wip) FROM profile)
                THEN 1 ELSE 0 END AS INT) AS is_peak
    FROM profile
    ORDER BY t
    """


@query("q1021_resource_histogram", oracle=_q1021_sql("duckdb"))
def q1021_resource_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource (work-in-progress) histogram of the earliest-start
    schedule as a step function: +1/-1 endpoint events, a bounded
    cumulative sum (<= 20 rows — the allowlisted tiny-window class),
    peak concurrency flagged. The capacity view a staffing plan reads
    off a CPM schedule."""
    _prep(spark, sf_dir)
    return spark.sql(_q1021_sql("spark"))
