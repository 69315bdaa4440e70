"""Markov-attribution batch 149 (q811-q815) — removal-effect channel
attribution over user journeys (Anderl et al. 2014, the model
marketing platforms run beside last-touch): journeys are each user's
event sequence up to their first purchase (or censored into a NULL
absorber), a first-order Markov chain is estimated on them, and a
channel's credit is how much the START->CONVERSION absorption
probability drops when that channel is removed (paths through it
die).

Absorption probabilities are computed by K = 12 unrolled backward
iterations a_{k+1}(s) = P(s->conv) + sum_t Q(s,t) a_k(t) — and ALL
five variants (full chain + each channel removed) iterate together
as a `variant` column on one <=25-row state table, so the unroll is
12 tiny CTE rounds, not 60.

- q811 the transition matrix (START/channels -> channels/CONV/NULL)
  with exact counts and probabilities;
- q812 absorption probabilities per variant after K iterations;
- q813 removal effects and the normalized Markov attribution shares;
- q814 four attribution models side by side: first-touch,
  last-touch, linear, Markov;
- q815 journey-pattern census: the most common 4-step journey
  prefixes with their conversion rates.

100 TB shape: one window pass (user-partitioned) builds journeys;
transitions are one aggregate to a <=42-cell matrix; everything
after runs on that bounded matrix. The iteration state is 25 rows
regardless of corpus size.

Determinism: transition probabilities nano-quantized BIGINTs;
iteration products p_n * a_n stay in BIGINT (<= 1e18 per term, <= 4
terms) and the per-round renormalization uses exact integer division
(dialect div//), so every iterate is bit-identical on both engines;
attribution shares are terminal integer-ratio doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

K_ITERS = 12
NANO = 1_000_000_000
CHANNELS = ["click", "error", "signup", "view"]  # transient, name order


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _idiv(dialect: str, a: str, b: str) -> str:
    return f"(({a}) div ({b}))" if dialect == "spark" else f"(({a}) // ({b}))"


def _jour_cte() -> str:
    """Per-user journey states (seq -> jour)."""
    return """seq AS (
      SELECT user_id AS u, event_type AS et,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    fp AS (
      SELECT u, MIN(rn) AS conv_rn FROM seq WHERE et = 'purchase' GROUP BY u
    ),
    jour AS (
      SELECT s.u, s.rn,
             CASE WHEN s.et = 'purchase' THEN 'CONV' ELSE s.et END AS st,
             f.conv_rn,
             MAX(s.rn) OVER (PARTITION BY s.u) AS last_rn
      FROM seq s LEFT JOIN fp f ON f.u = s.u
      WHERE f.conv_rn IS NULL OR s.rn <= f.conv_rn
    )"""


def _pmat_cte() -> str:
    """steps -> transition counts -> nano-quantized probabilities."""
    return """
    steps AS (
      SELECT u, st AS from_st,
             LEAD(st) OVER (PARTITION BY u ORDER BY rn) AS to_st,
             rn, conv_rn, last_rn
      FROM jour
    ),
    trans_raw AS (
      SELECT 'START' AS from_st, j.st AS to_st
      FROM jour j WHERE j.rn = 1
      UNION ALL
      SELECT from_st, to_st FROM steps WHERE to_st IS NOT NULL
      UNION ALL
      SELECT from_st, 'NULL' AS to_st
      FROM steps
      WHERE to_st IS NULL AND conv_rn IS NULL AND rn = last_rn
    ),
    tmat AS (
      SELECT from_st, to_st, CAST(COUNT(*) AS BIGINT) AS n
      FROM trans_raw GROUP BY from_st, to_st
    ),
    outdeg AS (
      SELECT from_st, CAST(SUM(n) AS BIGINT) AS tot FROM tmat GROUP BY from_st
    ),
    pmat AS (
      SELECT t.from_st, t.to_st, t.n,
             CAST(FLOOR(CAST(t.n AS DOUBLE) / o.tot * {NANO} + 0.5)
                  AS BIGINT) AS p_n
      FROM tmat t JOIN outdeg o ON o.from_st = t.from_st
    )""".replace("{NANO}", str(NANO))


def _variants_cte(pmat: str) -> str:
    vs = ", ".join(f"('{c}')" for c in CHANNELS)
    return f"""variants(dropped) AS (VALUES ('none'), {vs}),
    states AS (SELECT DISTINCT from_st AS s FROM {pmat}),
    basev AS (
      SELECT v.dropped, st.s,
             COALESCE(p.p_n, CAST(0 AS BIGINT)) AS pconv_n
      FROM states st CROSS JOIN variants v
      LEFT JOIN {pmat} p ON p.from_st = st.s AND p.to_st = 'CONV'
      WHERE st.s <> v.dropped
    ),
    transv AS (
      SELECT v.dropped, p.from_st AS s, p.to_st AS t, p.p_n
      FROM {pmat} p CROSS JOIN variants v
      WHERE p.to_st NOT IN ('CONV', 'NULL')
        AND p.to_st <> v.dropped
        AND p.from_st <> v.dropped
    )"""


def _iter_ctes(dialect: str) -> str:
    """K unrolled backward-absorption rounds over (variant, state)."""
    parts = ["a0 AS (SELECT dropped, s, CAST(0 AS BIGINT) AS av_n FROM basev)"]
    for k in range(1, K_ITERS + 1):
        total = (
            f"b.pconv_n * {NANO} + COALESCE(SUM(tv.p_n * a.av_n), "
            f"CAST(0 AS BIGINT))"
        )
        parts.append(
            f"""a{k} AS (
      SELECT b.dropped, b.s,
             CAST({_idiv(dialect, f'{total} + {NANO // 2}', str(NANO))}
                  AS BIGINT) AS av_n
      FROM basev b
      LEFT JOIN transv tv ON tv.dropped = b.dropped AND tv.s = b.s
      LEFT JOIN a{k - 1} a ON a.dropped = tv.dropped AND a.s = tv.t
      GROUP BY b.dropped, b.s, b.pconv_n
    )"""
        )
    return ",\n    ".join(parts)


def _journey_full() -> str:
    return _jour_cte() + "," + _pmat_cte()


_PMAT_VIEW = "markov_pmat_mv"


def _pmat_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the <=42-row transition matrix once — inlining the
    journey-window chain at every reference of the 12-round iteration
    made Spark planning explode (same lesson as the matching batch);
    localCheckpoint truncates the lineage. DuckDB materializes CTEs
    natively, so the oracle keeps the single-statement form.

    r9: the BUILD itself is now one events pass. The oracle-shaped
    form re-expanded the window chain under CTE inlining (fp re-ran
    seq, trans_raw's three UNION branches re-ran jour/steps, tmat's
    outdeg join re-ran tmat — 12 events scans). Here: fp's per-user
    first-purchase join becomes a window MIN over the same partition,
    the three trans_raw branches become one exploded conditional
    emission per step row (identical multiset), and outdeg becomes
    SUM OVER (PARTITION BY from_st) on the 42-row tmat."""
    _views(spark, sf_dir)
    df = spark.sql(
        f"""
    WITH seq AS (
      SELECT user_id AS u, event_type AS et,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    seq2 AS (
      SELECT u, rn, CASE WHEN et = 'purchase' THEN 'CONV' ELSE et END AS st,
             MIN(CASE WHEN et = 'purchase' THEN rn END)
               OVER (PARTITION BY u) AS conv_rn
      FROM seq
    ),
    jour AS (
      SELECT u, rn, st, conv_rn, MAX(rn) OVER (PARTITION BY u) AS last_rn
      FROM seq2 WHERE conv_rn IS NULL OR rn <= conv_rn
    ),
    steps AS (
      SELECT u, st AS from_st,
             LEAD(st) OVER (PARTITION BY u ORDER BY rn) AS to_st,
             rn, conv_rn, last_rn
      FROM jour
    ),
    trans_raw AS (
      SELECT tr.f AS from_st, tr.t AS to_st
      FROM steps
      LATERAL VIEW explode(filter(array(
        IF(rn = 1, named_struct('f', 'START', 't', from_st), NULL),
        IF(to_st IS NOT NULL, named_struct('f', from_st, 't', to_st), NULL),
        IF(to_st IS NULL AND conv_rn IS NULL AND rn = last_rn,
           named_struct('f', from_st, 't', 'NULL'), NULL)
      ), x -> x IS NOT NULL)) ex AS tr
    ),
    tmat AS (
      SELECT from_st, to_st, CAST(COUNT(*) AS BIGINT) AS n
      FROM trans_raw GROUP BY from_st, to_st
    )
    SELECT from_st, to_st, n,
           CAST(FLOOR(CAST(n AS DOUBLE)
                / SUM(n) OVER (PARTITION BY from_st) * {NANO} + 0.5)
                AS BIGINT) AS p_n
    FROM tmat
    """
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_PMAT_VIEW)


def _chain_oracle(dialect: str) -> str:
    txt = (
        f"{_journey_full()},\n    {_variants_cte('pmat')},"
        f"\n    {_iter_ctes(dialect)}"
    )
    # DuckDB inlines single-reference CTEs; the 12-round chain then
    # re-expands the journey windows per round. Force materialization
    # (DuckDB-only syntax — this text never runs on Spark).
    for name in ["jour", "steps", "tmat", "pmat", "basev", "transv"] + [
        f"a{k}" for k in range(0, K_ITERS + 1)
    ]:
        txt = txt.replace(f"{name} AS (", f"{name} AS MATERIALIZED (")
    return txt


def _chain_spark(dialect: str) -> str:
    return f"{_variants_cte(_PMAT_VIEW)},\n    {_iter_ctes(dialect)}"


_ABSORB_VIEW = "markov_absorb_mv"
_A12_VIEW = "markov_a12_mv"


def _a12_pandas(key, pdf):  # pragma: no cover - runs on executors
    """All five variants' K_ITERS backward-absorption rounds over the
    bounded (<= 42 row) transition matrix in ONE in-process pass —
    the exact `_iter_ctes` recurrence: a_{k+1}(s) = (pconv_n * NANO +
    sum_t p_n(s,t) * a_k(t) + NANO/2) div NANO, with a missing a_k(t)
    contributing nothing (the SQL LEFT JOIN + SUM-ignores-NULL). All
    arithmetic in exact Python ints (operands non-negative, so // ==
    SQL div)."""
    import pandas as pd

    pmat = [
        (str(f), str(t), int(p))
        for f, t, p in zip(pdf["from_st"], pdf["to_st"], pdf["p_n"])
    ]
    states = sorted({f for f, _, _ in pmat})
    pconv = {s: 0 for s in states}
    for f, t, p in pmat:
        if t == "CONV":
            pconv[f] = p
    rows = []
    for v in ["none", *CHANNELS]:
        vstates = [s for s in states if s != v]
        trans = [
            (f, t, p)
            for f, t, p in pmat
            if t not in ("CONV", "NULL") and t != v and f != v
        ]
        a = {s: 0 for s in vstates}
        for _ in range(K_ITERS):
            prev = a
            a = {
                s: (
                    pconv[s] * NANO
                    + sum(p * prev[t] for f, t, p in trans if f == s and t in prev)
                    + NANO // 2
                )
                // NANO
                for s in vstates
            }
        rows.extend((v, s, a[s]) for s in vstates)
    return pd.DataFrame(rows, columns=["dropped", "s", "av_n"])


def _a12_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the full (variant, state, a_K) table: the 12
    unrolled CTE rounds over tiny state were 12 joins of planning and
    scheduling overhead per referencing query (guide §4.2 — bounded
    state, so the whole iteration is one vectorized task over the
    checkpointed pmat view)."""
    _pmat_view(spark, sf_dir)
    from pyspark.sql import functions as F

    a12 = (
        spark.table(_PMAT_VIEW)
        .withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(_a12_pandas, "dropped string, s string, av_n bigint")
    )
    a12.localCheckpoint(eager=True).createOrReplaceTempView(_A12_VIEW)


def _absorb_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the 5-row (variant, START-absorption) result: the
    downstream attribution queries reference it several times, and
    each reference re-expands the 12-round chain in the Spark plan."""
    _a12_view(spark, sf_dir)
    df = spark.sql(
        f"SELECT dropped, av_n FROM {_A12_VIEW} WHERE s = 'START'"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_ABSORB_VIEW)


_LAST = f"a{K_ITERS}"


# ---------------------------------------------------------------------------
# q811 — transition matrix

_Q811_SQL = f"""
    WITH {_journey_full()}
    SELECT p.from_st AS from_state, p.to_st AS to_state, p.n,
           CAST(p.p_n AS DOUBLE) / {NANO} AS prob
    FROM pmat p
    ORDER BY p.from_st, p.to_st
    """


@query("q811_journey_transitions", oracle=_Q811_SQL)
def q811_journey_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The journey Markov chain: exact transition counts and
    nano-quantized probabilities over START, the four channels, and
    the CONV/NULL absorbers. One user-partitioned window pass into
    the checkpointed matrix (the oracle's one-statement form re-ran
    the window chain 12x under CTE inlining), one bounded aggregate."""
    _pmat_view(spark, sf_dir)
    return spark.sql(
        f"""
    SELECT from_st AS from_state, to_st AS to_state, n,
           CAST(p_n AS DOUBLE) / {NANO} AS prob
    FROM {_PMAT_VIEW}
    ORDER BY from_st, to_st
    """
    )


# ---------------------------------------------------------------------------
# q812 — absorption probabilities

def _q812_sql(dialect: str) -> str:
    chain = _chain_oracle(dialect) if dialect == "duckdb" else _chain_spark(dialect)
    return f"""
    WITH {chain}
    SELECT a.dropped AS variant,
           CAST(a.av_n AS DOUBLE) / {NANO} AS p_convert_from_start,
           CAST({K_ITERS} AS BIGINT) AS iterations
    FROM {_LAST} a
    WHERE a.s = 'START'
    ORDER BY a.dropped
    """


@query("q812_absorption_probability", oracle=_q812_sql("duckdb"))
def q812_absorption_probability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """START->conversion absorption probability after 12 backward
    iterations, for the full chain and each channel-removed variant
    in one 25-row iteration (a `variant` column, not five unrolls).
    Removing a channel can only lower it (test-asserted)."""
    _a12_view(spark, sf_dir)
    return spark.sql(
        f"""
    SELECT a.dropped AS variant,
           CAST(a.av_n AS DOUBLE) / {NANO} AS p_convert_from_start,
           CAST({K_ITERS} AS BIGINT) AS iterations
    FROM {_A12_VIEW} a
    WHERE a.s = 'START'
    ORDER BY a.dropped
    """
    )


# ---------------------------------------------------------------------------
# q813 — removal-effect attribution

def _q813_sql(dialect: str) -> str:
    if dialect == "duckdb":
        head = (f"{_chain_oracle(dialect)},\n    absorb AS (\n"
                f"      SELECT dropped, av_n FROM {_LAST} WHERE s = 'START'\n"
                f"    ),")
    else:
        head = (f"absorb AS (\n"
                f"      SELECT dropped, av_n FROM {_ABSORB_VIEW}\n    ),")
    return f"""
    WITH {head}
    full_p AS (SELECT av_n AS f_n FROM absorb WHERE dropped = 'none'),
    removal AS (
      SELECT /*+ BROADCAST(f) */ a.dropped AS channel,
             CAST(f.f_n - a.av_n AS BIGINT) AS drop_n,
             f.f_n
      FROM absorb a CROSS JOIN full_p f
      WHERE a.dropped <> 'none'
    ),
    tot AS (SELECT CAST(SUM(drop_n) AS BIGINT) AS s FROM removal)
    SELECT /*+ BROADCAST(t) */ r.channel,
           CAST(r.drop_n AS DOUBLE) / r.f_n AS removal_effect,
           CAST(r.drop_n AS DOUBLE) / t.s AS markov_share
    FROM removal r CROSS JOIN tot t
    ORDER BY r.channel
    """


@query("q813_removal_attribution", oracle=_q813_sql("duckdb"))
def q813_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal effects (relative conversion loss when a channel's
    paths die) and the normalized Markov attribution shares — exact
    integer differences of the iterated absorptions."""
    _absorb_view(spark, sf_dir)
    return spark.sql(_q813_sql("spark"))


# ---------------------------------------------------------------------------
# q814 — four attribution models

# q814 staging: the jour window pass was referenced by conv_j AND
# touches, and touches by ft/lt/lin — ~8 re-expansions of the
# user-partitioned window under Catalyst inlining (198 Exchanges in
# the before plan). ONE window pass checkpoints jour; the touch table
# (3 consumers) is checkpointed from it (P3 pattern, guide §2.4).
_JOUR_VIEW = "markovattr_jour_mv"
_TOUCH_VIEW = "markovattr_touch_mv"


def _touch_view(spark: SparkSession, sf_dir: str) -> None:
    _views(spark, sf_dir)
    jour = spark.sql(
        f"WITH {_jour_cte()} SELECT u, rn, st, conv_rn, last_rn FROM jour"
    )
    jour.localCheckpoint(eager=True).createOrReplaceTempView(_JOUR_VIEW)
    touches = spark.sql(
        f"""
    WITH jour AS (SELECT u, rn, st, conv_rn, last_rn FROM {_JOUR_VIEW}),
    conv_j AS (
      SELECT j.u, j.conv_rn FROM (SELECT DISTINCT u, conv_rn FROM jour) j
      WHERE j.conv_rn IS NOT NULL
    )
    SELECT s.u, s.st, s.rn, c.conv_rn
    FROM jour s JOIN conv_j c ON c.u = s.u
    WHERE s.st <> 'CONV' AND s.rn < c.conv_rn
    """
    )
    touches.localCheckpoint(eager=True).createOrReplaceTempView(_TOUCH_VIEW)


def _q814_sql(dialect: str, staged: bool = False) -> str:
    if dialect == "duckdb":
        chain = _chain_oracle(dialect)
        absorb_src = f"(SELECT dropped, av_n FROM {_LAST} WHERE s = 'START') z"
    else:
        chain = _jour_cte()
        absorb_src = _ABSORB_VIEW
    if staged:
        head = f"""
    WITH touches AS (
      SELECT u, st, rn, conv_rn FROM {_TOUCH_VIEW}
    ),"""
    else:
        head = f"""
    WITH {chain},
    conv_j AS (
      SELECT j.u, j.conv_rn FROM (SELECT DISTINCT u, conv_rn FROM jour) j
      WHERE j.conv_rn IS NOT NULL
    ),
    touches AS (
      SELECT s.u, s.st, s.rn, c.conv_rn
      FROM jour s JOIN conv_j c ON c.u = s.u
      WHERE s.st <> 'CONV' AND s.rn < c.conv_rn
    ),"""
    return head + f"""
    ft AS (
      SELECT t.st AS channel, CAST(COUNT(*) AS BIGINT) AS n
      FROM touches t
      WHERE t.rn = 1
      GROUP BY t.st
    ),
    lt AS (
      SELECT t.st AS channel, CAST(COUNT(*) AS BIGINT) AS n
      FROM touches t
      WHERE t.rn = t.conv_rn - 1
      GROUP BY t.st
    ),
    lin AS (
      SELECT t.st AS channel,
             CAST(SUM(CAST(FLOOR(CAST({NANO} AS DOUBLE) / (t.conv_rn - 1)
                  + 0.5) AS BIGINT)) AS BIGINT) AS w_n
      FROM touches t
      GROUP BY t.st
    ),
    absorb AS (
      SELECT dropped, av_n FROM {absorb_src}
    ),
    mk AS (
      SELECT /*+ BROADCAST(f) */ a.dropped AS channel,
             CAST(f.av_n - a.av_n AS BIGINT) AS drop_n
      FROM absorb a
      CROSS JOIN (SELECT av_n FROM absorb WHERE dropped = 'none') f
      WHERE a.dropped <> 'none'
    ),
    tots AS (
      SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM ft) AS ft_t,
             (SELECT CAST(SUM(n) AS BIGINT) FROM lt) AS lt_t,
             (SELECT CAST(SUM(w_n) AS BIGINT) FROM lin) AS lin_t,
             (SELECT CAST(SUM(drop_n) AS BIGINT) FROM mk) AS mk_t
    )
    SELECT /*+ BROADCAST(t) */ m.channel,
           CAST(COALESCE(f.n, 0) AS DOUBLE) / t.ft_t AS first_touch,
           CAST(COALESCE(l.n, 0) AS DOUBLE) / t.lt_t AS last_touch,
           CAST(COALESCE(w.w_n, 0) AS DOUBLE) / t.lin_t AS linear_touch,
           CAST(m.drop_n AS DOUBLE) / t.mk_t AS markov
    FROM mk m
    LEFT JOIN ft f ON f.channel = m.channel
    LEFT JOIN lt l ON l.channel = m.channel
    LEFT JOIN lin w ON w.channel = m.channel
    CROSS JOIN tots t
    ORDER BY m.channel
    """


@query("q814_attribution_models", oracle=_q814_sql("duckdb"))
def q814_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch, last-touch, linear, and Markov shares side by
    side per channel — the table that shows how much the model choice
    moves budget. Each column sums to 1 (test-asserted)."""
    _absorb_view(spark, sf_dir)
    _touch_view(spark, sf_dir)
    return spark.sql(_q814_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q815 — journey-pattern census

_Q815_SQL = f"""
    WITH {_jour_cte()},
    pre AS (
      SELECT u,
             MAX(CASE WHEN rn = 1 THEN st END) AS s1,
             MAX(CASE WHEN rn = 2 THEN st END) AS s2,
             MAX(CASE WHEN rn = 3 THEN st END) AS s3,
             MAX(CASE WHEN rn = 4 THEN st END) AS s4,
             MAX(CASE WHEN conv_rn IS NOT NULL THEN 1 ELSE 0 END) AS conv
      FROM jour GROUP BY u
    ),
    pats AS (
      SELECT CONCAT(COALESCE(s1, '-'), '>', COALESCE(s2, '-'), '>',
                    COALESCE(s3, '-'), '>', COALESCE(s4, '-')) AS pattern,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(conv) AS BIGINT) AS n_converted
      FROM pre GROUP BY CONCAT(COALESCE(s1, '-'), '>', COALESCE(s2, '-'),
                    '>', COALESCE(s3, '-'), '>', COALESCE(s4, '-'))
    )
    SELECT pattern, n_users, n_converted,
           CAST(n_converted AS DOUBLE) / n_users AS conversion_rate
    FROM pats
    ORDER BY n_users DESC, pattern
    LIMIT 20
    """


@query("q815_journey_patterns", oracle=_Q815_SQL)
def q815_journey_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most common 4-step journey prefixes with conversion
    rates — the qualitative companion to the Markov shares. Patterns
    are a bounded alphabet, the census one aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_Q815_SQL)
