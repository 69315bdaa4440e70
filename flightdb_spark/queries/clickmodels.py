"""Click-model batch 172 (q932-q936) — position-bias analysis of
ranked impressions (Craswell et al.'s examination/cascade models, the
COEC industry metric), on a deterministic SERP built from events: a
session is a user-day, its first 10 events (by ts, event_id) are the
ranked results at positions 1..10, a result is clicked when its event
type is 'click', and the "item" shown is the event's value decile.

- q932 position-CTR curve: the raw click rate per rank — position
  bias in one table;
- q933 PBM examination propensities: CTR@k / CTR@1, the
  position-based-model ratio estimator under constant relevance
  (what inverse-propensity-weighted LTR divides by);
- q934 cascade model: the first-click position distribution,
  abandonment rate, and expected scan depth;
- q935 COEC per item: clicks over expected clicks, expected = the sum
  of the global position-CTR over the item's impressions — the
  position-debiased item quality score;
- q936 rank-biased precision mass per session (p = 0.8, exact literal
  weights), the persistence-weighted engagement distribution.

100 TB shape: ONE user-day shuffle ranks the impressions; every model
is then a position-keyed (<= 10 rows) or item-keyed (10 deciles)
aggregate; COEC joins impressions to the 10-row position-CTR table by
broadcast. No corpus self-joins anywhere.

Determinism: positions come from ROW_NUMBER over the unique
(ts, event_id) order; deciles are integer arithmetic on exact cents
against a 1-row broadcast range; RBP weights are inlined Python-exact
literals; all rates terminal ratios of integer counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MAX_POS = 10
RBP_P = 0.8


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _idiv(d: str, a: str, b: str) -> str:
    return f"({a}) div ({b})" if d == "spark" else f"({a}) // ({b})"


def _serp_cte(d: str) -> str:
    return f"""ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS clicked,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS pos
      FROM events
    ),
    serp AS (
      SELECT user_id, day, pos, cents, clicked
      FROM ranked WHERE pos <= {MAX_POS}
    )"""


def _item_cte(d: str) -> str:
    """Item id = value decile over the observed cent range."""
    dec = _idiv(d, "(s.cents - r.mn) * 10", "(r.mx - r.mn) + 1")
    return f"""{_serp_cte(d)},
    rng AS (SELECT CAST(MIN(cents) AS BIGINT) AS mn,
                   CAST(MAX(cents) AS BIGINT) AS mx FROM serp),
    items AS (
      SELECT /*+ BROADCAST(r) */ s.user_id, s.day, s.pos, s.clicked,
             CAST({dec} AS BIGINT) AS item
      FROM serp s CROSS JOIN rng r
    )"""


# ---------------------------------------------------------------------------
# q932 — position CTR curve


def _q932_sql(d: str) -> str:
    return f"""
    WITH {_serp_cte(d)}
    SELECT pos,
           CAST(COUNT(*) AS BIGINT) AS n_impressions,
           CAST(SUM(clicked) AS BIGINT) AS n_clicks,
           ROUND(CAST(SUM(clicked) AS DOUBLE) / COUNT(*), 6) AS ctr
    FROM serp
    GROUP BY pos
    ORDER BY pos
    """


@query("q932_position_ctr", oracle=_q932_sql("duckdb"))
def q932_position_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw position-CTR curve over the first {MAX_POS} ranks: one
    session window (user-day partitions), one 10-row position
    aggregate. Every click model downstream conditions on this
    table."""
    _views(spark, sf_dir)
    return spark.sql(_q932_sql("spark"))


# ---------------------------------------------------------------------------
# q933 — PBM examination propensities


def _q933_sql(d: str) -> str:
    return f"""
    WITH {_serp_cte(d)},
    bypos AS (
      SELECT pos,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(clicked) AS BIGINT) AS c
      FROM serp GROUP BY pos
    ),
    top1 AS (SELECT CAST(c AS DOUBLE) / n AS ctr1 FROM bypos WHERE pos = 1)
    SELECT /*+ BROADCAST(t) */ b.pos,
           ROUND(CAST(b.c AS DOUBLE) / b.n, 6) AS ctr,
           ROUND(CAST(b.c AS DOUBLE) / b.n / NULLIF(t.ctr1, 0), 6)
             AS examination_prob
    FROM bypos b CROSS JOIN top1 t
    ORDER BY b.pos
    """


@query("q933_pbm_examination", oracle=_q933_sql("duckdb"))
def q933_pbm_examination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based-model examination propensities by the ratio
    estimator: theta_k = CTR@k / CTR@1 (exact under PBM with
    position-independent relevance). These are the inverse propensities
    an unbiased LTR pipeline divides clicks by; position 1 pins
    theta = 1."""
    _views(spark, sf_dir)
    return spark.sql(_q933_sql("spark"))


# ---------------------------------------------------------------------------
# q934 — cascade model


def _q934_sql(d: str) -> str:
    return f"""
    WITH {_serp_cte(d)},
    firsts AS (
      SELECT user_id, day,
             MIN(CASE WHEN clicked = 1 THEN pos END) AS first_click
      FROM serp GROUP BY user_id, day
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions FROM firsts)
    SELECT /*+ BROADCAST(t) */
           COALESCE(CAST(first_click AS BIGINT), CAST(0 AS BIGINT))
             AS first_click_pos,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(t.n_sessions), 6)
             AS session_share
    FROM firsts CROSS JOIN tot t
    GROUP BY first_click
    ORDER BY first_click_pos
    """


@query("q934_cascade_first_click", oracle=_q934_sql("duckdb"))
def q934_cascade_first_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cascade model's sufficient statistic: where the FIRST click
    lands per session (position 0 = abandonment — scanned, never
    clicked). Under cascade scanning the tail of this distribution is
    the continuation probability; one session aggregate, a <= 11-row
    rollup."""
    _views(spark, sf_dir)
    return spark.sql(_q934_sql("spark"))


# ---------------------------------------------------------------------------
# q935 — COEC


def _q935_sql(d: str) -> str:
    return f"""
    WITH {_item_cte(d)},
    posctr AS (
      SELECT pos, CAST(SUM(clicked) AS DOUBLE) / COUNT(*) AS ctr
      FROM items GROUP BY pos
    )
    SELECT /*+ BROADCAST(p) */ i.item,
           CAST(COUNT(*) AS BIGINT) AS n_impressions,
           CAST(SUM(i.clicked) AS BIGINT) AS n_clicks,
           ROUND(SUM(p.ctr), 6) AS expected_clicks,
           ROUND(CAST(SUM(i.clicked) AS DOUBLE) / NULLIF(SUM(p.ctr), 0), 6)
             AS coec
    FROM items i JOIN posctr p ON p.pos = i.pos
    GROUP BY i.item
    ORDER BY i.item
    """


@query("q935_coec", oracle=_q935_sql("duckdb"))
def q935_coec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks over expected clicks per item (value decile): expected =
    the global position-CTR summed over the item's impressions, so an
    item shown mostly at rank 8 is not punished for its placement.
    COEC > 1 means better-than-position-average. The 10-row CTR table
    broadcasts back onto impressions."""
    _views(spark, sf_dir)
    return spark.sql(_q935_sql("spark"))


# ---------------------------------------------------------------------------
# q936 — rank-biased precision mass


def _q936_sql(d: str) -> str:
    # exact literal weights (1-p) * p^(k-1), Python-computed once
    weights = {k: (1 - RBP_P) * RBP_P ** (k - 1) for k in range(1, MAX_POS + 1)}
    # CAST AS DOUBLE: bare decimal literals parse as DECIMAL in both
    # engines, and decimal/double mixing hash-mismatches (q936 lesson)
    wcase = " ".join(
        f"WHEN {k} THEN CAST({weights[k]!r} AS DOUBLE)"
        for k in range(1, MAX_POS + 1)
    )
    return f"""
    WITH {_serp_cte(d)},
    persess AS (
      SELECT user_id, day,
             ROUND(SUM(CASE WHEN clicked = 1
                       THEN CASE pos {wcase} ELSE CAST(0.0 AS DOUBLE) END
                       ELSE CAST(0.0 AS DOUBLE) END), 9) AS rbp
      FROM serp GROUP BY user_id, day
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           ROUND(CAST(SUM(CAST(rbp AS DECIMAL(18,9))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_rbp,
           ROUND(MAX(rbp), 6) AS max_rbp,
           CAST(SUM(CASE WHEN rbp = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS zero_rbp_sessions
    FROM persess
    """


@query("q936_rbp_mass", oracle=_q936_sql("duckdb"))
def q936_rbp_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased precision (Moffat & Zobel, p = {RBP_P}) per session:
    clicked positions weighted by the persistence distribution, with
    the weights inlined as Python-exact literals so both engines sum
    identical doubles (9-dp rounded into DECIMAL for the corpus mean).
    The engagement metric that never needs the session's length."""
    _views(spark, sf_dir)
    return spark.sql(_q936_sql("spark"))
