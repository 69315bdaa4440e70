"""Optimal-stopping batch 153 (q831-q835) — the secretary problem and
prophet inequality REPLAYED exactly on each user's event-value
sequence: accept/reject decisions are deterministic functions of the
observed prefix, so the whole policy evaluation is windows and joins,
and the classic guarantees become testable census numbers.

- q831 secretary (1/e) rule replay: observe the first floor(0.36788 n)
  values, then take the first one beating that prefix's max (last if
  none) — per-user outcome census and the success rate against the
  asymptotic 1/e;
- q832 observation-fraction sweep: the same rule at 10..60% learning
  fractions — the empirical optimality curve around 37%;
- q833 prophet-inequality check: the single-threshold rule at half
  the empirical mean maximum must capture at least ~half the prophet
  value (the classic bound, test-asserted with slack);
- q834 rank-of-pick distribution for the 1/e rule (how bad are the
  failures, not just how often);
- q835 regret comparison: secretary vs prophet-threshold vs
  take-last, mean relative regret (max - pick)/max.

100 TB shape: everything partitions by user over that user's own
events (bounded per-user sequences) — prefix maxima, conditional
cutoff maxima (all six fractions in ONE aggregate via CASE), and
first-acceptance argmins; one extra user-keyed self-join resolves
the accepted value. No global state anywhere.

Determinism: values in exact BIGINT cents; cutoffs are integer
arithmetic (n * 36788 / 100000 with nonnegative integer division on
both engines via FLOOR of an exact-double quotient); "beats" is
strict >; first-acceptance picks MIN(rn); success compares integer
cents; rates are terminal integer ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

INV_E_PCT5 = 36788  # 1/e at 5 decimals, as parts-per-100000
FRACS = [10, 20, 30, 40, 50, 60]  # q832 observation percentages


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _seq_cte() -> str:
    return """seq AS (
      SELECT user_id AS u,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    stats AS (
      SELECT u, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(v) AS BIGINT) AS vmax
      FROM seq GROUP BY u
    )"""


def _secretary_cte(cut_expr: str, alias: str) -> str:
    """Replay the learning-then-leap rule at a given cutoff expr."""
    return f"""cuts_{alias} AS (
      SELECT u, n, vmax,
             CAST(FLOOR(CAST(n AS DOUBLE) * {cut_expr}) AS BIGINT) AS r
      FROM stats
    ),
    thr_{alias} AS (
      SELECT s.u, c.n, c.vmax, c.r,
             CAST(MAX(CASE WHEN s.rn <= c.r THEN s.v END) AS BIGINT) AS t
      FROM seq s JOIN cuts_{alias} c ON c.u = s.u
      GROUP BY s.u, c.n, c.vmax, c.r
    ),
    pick_{alias} AS (
      SELECT t.u, t.n, t.vmax, t.r,
             CAST(MIN(CASE WHEN s.rn > t.r
                      AND (t.t IS NULL OR s.v > t.t)
                      THEN s.rn END) AS BIGINT) AS pick_rn
      FROM thr_{alias} t JOIN seq s ON s.u = t.u
      GROUP BY t.u, t.n, t.vmax, t.r
    ),
    out_{alias} AS (
      SELECT p.u, p.n, p.vmax,
             COALESCE(p.pick_rn, p.n) AS chosen_rn,
             s.v AS chosen_v
      FROM pick_{alias} p
      JOIN seq s ON s.u = p.u AND s.rn = COALESCE(p.pick_rn, p.n)
    )"""


# --- Spark-side staging (oracle strings keep the single-statement CTE
# form) -----------------------------------------------------------------------
#
# Every secretary/prophet CTE chain references `seq` 3-4x (threshold,
# pick, chosen-value resolution) and q832 runs SIX replays — so the
# per-user ROW_NUMBER window over the event stream re-executed up to
# ~24x per query under Catalyst inlining (144 Exchanges in q832's
# before plan; exchange reuse dedupes the shuffle but NOT the window
# sort above it). ONE window pass checkpoints seq; stats (user grain)
# is checkpointed beside it (P3 pattern, guide §2.4).

_SEQ_VIEW = "stopping_seq_mv"
_STATS_VIEW = "stopping_stats_mv"

_SEQ_MV_CTE = f"""seq AS (
      SELECT u, v, rn FROM {_SEQ_VIEW}
    ),
    stats AS (
      SELECT u, n, vmax FROM {_STATS_VIEW}
    )"""


def _seq_views(spark: SparkSession, sf_dir: str) -> None:
    """ONE per-user window pass -> checkpointed seq + stats."""
    _views(spark, sf_dir)
    head, sep, tail = _seq_cte().partition("),\n    stats AS (")
    assert sep, "seq CTE marker drifted"
    df = spark.sql(f"WITH {head}) SELECT u, v, rn FROM seq")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_SEQ_VIEW)
    st = spark.sql(
        f"WITH seq AS (SELECT u, v, rn FROM {_SEQ_VIEW}),\n    stats AS ("
        + tail
        + " SELECT u, n, vmax FROM stats"
    )
    st.localCheckpoint(eager=True).createOrReplaceTempView(_STATS_VIEW)


# ---------------------------------------------------------------------------
# q831 — secretary replay

def _q831_sql(seq: str | None = None) -> str:
    return f"""
    WITH {seq or _seq_cte()},
    {_secretary_cte(f"{INV_E_PCT5} / 100000.0", "e")}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN chosen_v = vmax THEN 1 ELSE 0 END) AS BIGINT)
             AS n_success,
           CAST(SUM(CASE WHEN chosen_v = vmax THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS success_rate,
           CAST({INV_E_PCT5} AS DOUBLE) / 100000 AS asymptotic_rate
    FROM out_e
    """


_Q831_SQL = _q831_sql()


@query("q831_secretary_replay", oracle=_Q831_SQL)
def q831_secretary_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1/e rule replayed on every user's sequence: learn on the
    first 36.788%, then leap at the first record — success means the
    chosen value IS the sequence maximum. Finite-n rates sit near but
    not at 1/e (the census shows how near)."""
    _seq_views(spark, sf_dir)
    return spark.sql(_q831_sql(_SEQ_MV_CTE))


# ---------------------------------------------------------------------------
# q832 — observation-fraction sweep

def _q832_branch(f: int) -> str:
    return f"""SELECT CAST({f} AS BIGINT) AS frac_pct,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN chosen_v = vmax THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS success_rate
    FROM out_f{f}"""


def _q832_sql(seq: str | None = None) -> str:
    return (
    "\n    WITH "
    + (seq or _seq_cte())
    + ",\n    "
    + ",\n    ".join(
        _secretary_cte(f"{f} / 100.0", f"f{f}") for f in FRACS
    )
    + "\n    "
    + "\n    UNION ALL\n    ".join(_q832_branch(f) for f in FRACS)
    + "\n    ORDER BY frac_pct\n    "
    )


_Q832_SQL = _q832_sql()


@query("q832_observation_sweep", oracle=_Q832_SQL)
def q832_observation_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The secretary success rate at learning fractions 10..60% — the
    empirical curve that peaks near 1/e. Six replays share the one
    sequence table; each is two bounded user-keyed aggregates."""
    _seq_views(spark, sf_dir)
    return spark.sql(_q832_sql(_SEQ_MV_CTE))


# ---------------------------------------------------------------------------
# q833 — prophet inequality

def _q833_sql(seq: str | None = None) -> str:
    return f"""
    WITH {seq or _seq_cte()},
    prophet AS (
      SELECT CAST(SUM(vmax) AS BIGINT) AS sum_max,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM stats
    ),
    thr AS (
      SELECT CAST(FLOOR(CAST(sum_max AS DOUBLE) / n_users / 2) AS BIGINT)
               AS c,
             sum_max, n_users
      FROM prophet
    ),
    pick AS (
      SELECT s.u,
             CAST(MIN(CASE WHEN s.v >= t.c THEN s.rn END) AS BIGINT)
               AS pick_rn
      FROM seq s CROSS JOIN thr t
      GROUP BY s.u
    ),
    chosen AS (
      SELECT p.u, s.v
      FROM pick p
      JOIN stats st ON st.u = p.u
      JOIN seq s ON s.u = p.u AND s.rn = COALESCE(p.pick_rn, st.n)
    )
    SELECT t.c AS threshold_cents,
           CAST(t.sum_max AS DOUBLE) / t.n_users AS mean_prophet_value,
           (SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) FROM chosen)
             AS mean_rule_value,
           (SELECT CAST(SUM(v) AS DOUBLE) / COUNT(*) FROM chosen)
             / (CAST(t.sum_max AS DOUBLE) / t.n_users) AS capture_ratio
    FROM thr t
    """


_Q833_SQL = _q833_sql()


@query("q833_prophet_inequality", oracle=_Q833_SQL)
def q833_prophet_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single-threshold prophet rule at c = E[max]/2: mean
    accepted value against the prophet's mean maximum. The classic
    bound says the ratio is at least 1/2 for independent sequences —
    test-asserted with finite-sample slack."""
    _seq_views(spark, sf_dir)
    return spark.sql(_q833_sql(_SEQ_MV_CTE))


# ---------------------------------------------------------------------------
# q834 — rank of pick

def _q834_sql(seq: str | None = None) -> str:
    return f"""
    WITH {seq or _seq_cte()},
    {_secretary_cte(f"{INV_E_PCT5} / 100000.0", "e")},
    ranked AS (
      SELECT o.u,
             CAST(1 + SUM(CASE WHEN s.v > o.chosen_v THEN 1 ELSE 0 END)
                  AS BIGINT) AS pick_rank
      FROM out_e o JOIN seq s ON s.u = o.u
      GROUP BY o.u
    )
    SELECT pick_rank,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM ranked) AS share
    FROM ranked
    WHERE pick_rank <= 10
    GROUP BY pick_rank
    ORDER BY pick_rank
    """


_Q834_SQL = _q834_sql()


@query("q834_pick_rank_distribution", oracle=_Q834_SQL)
def q834_pick_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How good the secretary rule's pick is when it isn't the best:
    the distribution of the chosen value's rank within the user's own
    sequence (1 = the maximum), truncated at rank 10."""
    _seq_views(spark, sf_dir)
    return spark.sql(_q834_sql(_SEQ_MV_CTE))


# ---------------------------------------------------------------------------
# q835 — regret comparison

def _q835_sql(seq: str | None = None) -> str:
    return f"""
    WITH {seq or _seq_cte()},
    {_secretary_cte(f"{INV_E_PCT5} / 100000.0", "e")},
    prophet AS (
      SELECT CAST(FLOOR(CAST(SUM(vmax) AS DOUBLE) / COUNT(*) / 2) AS BIGINT)
               AS c
      FROM stats
    ),
    tpick AS (
      SELECT s.u,
             CAST(MIN(CASE WHEN s.v >= t.c THEN s.rn END) AS BIGINT)
               AS pick_rn
      FROM seq s CROSS JOIN prophet t
      GROUP BY s.u
    ),
    tout AS (
      SELECT p.u, st.vmax, s.v AS chosen_v
      FROM tpick p
      JOIN stats st ON st.u = p.u
      JOIN seq s ON s.u = p.u AND s.rn = COALESCE(p.pick_rn, st.n)
    ),
    lastout AS (
      SELECT st.u, st.vmax, s.v AS chosen_v
      FROM stats st JOIN seq s ON s.u = st.u AND s.rn = st.n
    )
    SELECT r.rule,
           CAST(SUM(CAST(FLOOR((CAST(r.vmax - r.chosen_v AS DOUBLE) / r.vmax)
                * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 / COUNT(*)
             AS mean_relative_regret,
           CAST(SUM(CASE WHEN r.chosen_v = r.vmax THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS hit_rate
    FROM (
      SELECT 'secretary_1e' AS rule, vmax, chosen_v FROM out_e
      UNION ALL
      SELECT 'prophet_half' AS rule, vmax, chosen_v FROM tout
      UNION ALL
      SELECT 'take_last' AS rule, vmax, chosen_v FROM lastout
    ) r
    GROUP BY r.rule
    ORDER BY r.rule
    """


_Q835_SQL = _q835_sql()


@query("q835_stopping_regret", oracle=_Q835_SQL)
def q835_stopping_regret(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three stopping rules head-to-head: mean relative regret
    (max - pick)/max (micro-quantized terms before the mean) and
    exact-hit rate. Take-last is the floor everyone should beat
    (test-asserted for the secretary rule's hit rate)."""
    _seq_views(spark, sf_dir)
    return spark.sql(_q835_sql(_SEQ_MV_CTE))
