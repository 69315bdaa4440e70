"""Pipeline design-sweep batch 94 (q536-q540) — the sizing tables a
pipeline designer reads before picking constants, extending the
stream-hygiene sweeps (q447-q450) from watermarks to vocabularies,
feature dims, join buffers, and state stores:

- q536 vocabulary-size sweep: OOV token share at vocab sizes
  100/500/1k/5k from ONE frequency table — the tokenizer-budget
  curve behind q68's single-point OOV rate;
- q537 hash-dimension sweep: feature-hashing collision rate AND
  colliding token-mass share at dims 2^8..2^14 — the table q420's
  hashing trick should be sized from (type collisions vs mass
  collisions diverge on Zipfian vocabularies);
- q538 join-buffer sizing: for purchase events, time since the same
  user's last click — the stream-stream join gap distribution, and
  the match-capture share per buffer-window candidate;
- q539 CDC conflation: updates per (user, minute) — the conflation
  ratio a last-write-wins cache would deliver, plus the per-key
  burst histogram;
- q540 state-size projection: projected state rows and MB for the
  repo's streaming operators (2 h dedup window, 30 min sessionizer,
  the q538 join buffer) from measured rates, with literal bytes/row
  — the memory-budget line a cluster sizing doc quotes.

Determinism: every sweep derives from one integer aggregate; shares
are exact rationals; cumulative vocab mass rides a vocab-bounded
window (rule 15); hashes are md5 (rule 7); all state math is
straight-line arithmetic on one moment row.

100 TB shapes: one (key[, bucket]) aggregate per query — the grids
multiply bounded frequency/stat tables, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

VOCAB_SIZES = (100, 500, 1000, 5000)
HASH_DIMS = (256, 1024, 4096, 16384)
BUFFER_MIN = (1, 5, 15, 60)
HOUR_US = 3_600_000_000
DEDUP_WINDOW_H = 2
SESSION_GAP_MIN = 30
BYTES_DEDUP_ROW = 48  # key hash + timestamp + overhead
BYTES_SESSION_ROW = 96  # per-user open-session struct
BYTES_JOIN_ROW = 120  # buffered left row


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _toks(dialect: str) -> str:
    return "string_split(text, ' ')" if dialect == "duck" else "split(text, ' ')"


def _unn(dialect: str) -> str:
    return "unnest" if dialect == "duck" else "explode"


def _grid(dialect: str, vals: tuple, col: str) -> str:
    lits = ", ".join(str(v) for v in vals)
    if dialect == "spark":
        return f"(SELECT explode(array({lits})) AS {col})"
    return f"(SELECT unnest([{lits}]) AS {col})"


def _h16(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


# ---------------------------------------------------------------------------
# q536 — vocabulary-size sweep


def _vocab_sql(dialect: str) -> str:
    return f"""
    WITH words AS (
      SELECT {_unn(dialect)}({_toks(dialect)}) AS w FROM documents
    ),
    vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cf FROM words GROUP BY w),
    ranked AS (
      SELECT cf,
             ROW_NUMBER() OVER (ORDER BY cf DESC, w) AS rk,
             SUM(cf) OVER (ORDER BY cf DESC, w) AS cum,
             SUM(cf) OVER () AS total
      FROM vocab
    )
    SELECT g.k AS vocab_size,
           CAST(MAX(CASE WHEN r.rk <= g.k THEN r.cum END) AS BIGINT)
             AS covered_tokens,
           CAST(MAX(r.total) AS BIGINT) AS total_tokens,
           ROUND(CAST(1.0 AS DOUBLE)
                 - CAST(MAX(CASE WHEN r.rk <= g.k THEN r.cum END) AS DOUBLE)
                   / MAX(r.total), 6) AS oov_share
    FROM {_grid(dialect, VOCAB_SIZES, "k")} g CROSS JOIN ranked r
    GROUP BY g.k
    """


@query("q536_vocab_size_sweep", oracle=_vocab_sql("duck"))
def q536_vocab_size_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OOV-share curve over vocabulary sizes: one corpus frequency
    table, ranked by count, with cumulative coverage read at each
    candidate vocab size — the tokenizer-budget table behind q68's
    single-point OOV rate. The rank/cumulative windows run over the
    AGGREGATED vocabulary (q76's bounded class); the size grid
    multiplies that bounded table only."""
    _views(spark, sf_dir, "documents")
    return spark.sql(_vocab_sql("spark"))


# ---------------------------------------------------------------------------
# q537 — hash-dimension sweep


def _hashdim_sql(dialect: str) -> str:
    h = _h16(dialect, "w")
    return f"""
    WITH words AS (
      SELECT {_unn(dialect)}({_toks(dialect)}) AS w FROM documents
    ),
    vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cf FROM words GROUP BY w),
    buckets AS (
      SELECT g.d, ({h}) % g.d AS b,
             CAST(COUNT(*) AS BIGINT) AS n_types,
             CAST(SUM(cf) AS BIGINT) AS mass
      FROM {_grid(dialect, HASH_DIMS, "d")} g CROSS JOIN vocab
      GROUP BY g.d, ({h}) % g.d
    ),
    per_d AS (
      SELECT d,
             CAST(SUM(n_types) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS used_buckets,
             CAST(SUM(CASE WHEN n_types > 1 THEN n_types ELSE 0 END)
                  AS BIGINT) AS colliding_types,
             CAST(SUM(CASE WHEN n_types > 1 THEN mass ELSE 0 END)
                  AS BIGINT) AS colliding_mass,
             CAST(SUM(mass) AS BIGINT) AS total_mass
      FROM buckets GROUP BY d
    )
    SELECT d AS hash_dim, v AS vocab_types,
           ROUND(CAST(colliding_types AS DOUBLE) / v, 6) AS type_collision_share,
           ROUND(CAST(colliding_mass AS DOUBLE) / total_mass, 6)
             AS mass_collision_share
    FROM per_d
    """


@query("q537_hash_dim_sweep", oracle=_hashdim_sql("duck"))
def q537_hash_dim_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing collision sweep: for each candidate dimension,
    the share of vocabulary TYPES that share a bucket and the share
    of token MASS in shared buckets — the two curves diverge on
    Zipfian vocabularies (head words rarely collide; the type rate
    overstates the damage), which is exactly the q420 sizing
    question. One vocab aggregate; the dim grid multiplies it."""
    _views(spark, sf_dir, "documents")
    return spark.sql(_hashdim_sql("spark"))


# ---------------------------------------------------------------------------
# q538 — join-buffer sizing


def _joinbuf_sql(dialect: str) -> str:
    us = _us(dialect)
    return f"""
    WITH seq AS (
      SELECT user_id, event_type, {us} AS t,
             MAX(CASE WHEN event_type = 'click' THEN {us} END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_click
      FROM events
    ),
    gaps AS (
      SELECT (t - last_click) AS gap_us
      FROM seq WHERE event_type = 'purchase' AND last_click IS NOT NULL
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM seq
              WHERE event_type = 'purchase') AS n_purchases
      FROM gaps
    ),
    dist AS (
      SELECT gap_us, CAST(COUNT(*) AS BIGINT) AS c FROM gaps GROUP BY gap_us
    )
    SELECT g.w AS buffer_minutes,
           t.n_purchases,
           CAST(SUM(CASE WHEN d.gap_us <= CAST(g.w AS BIGINT) * 60000000 THEN d.c ELSE 0 END)
                AS BIGINT) AS matched,
           ROUND(CAST(SUM(CASE WHEN d.gap_us <= CAST(g.w AS BIGINT) * 60000000 THEN d.c
                          ELSE 0 END) AS DOUBLE) / t.n_purchases, 4)
             AS match_share
    FROM {_grid(dialect, BUFFER_MIN, "w")} g
    CROSS JOIN dist d CROSS JOIN tot t
    GROUP BY g.w, t.n_purchases
    """


@query("q538_join_buffer_sizing", oracle=_joinbuf_sql("duck"))
def q538_join_buffer_sizing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream join buffer sizing: for each purchase, the time
    since the same user's LAST click (a user-keyed running-max
    window), then the share of purchases a join buffer of each
    candidate size would match — the completeness-vs-state dial for
    a click->purchase attribution join (q447's shape, specialized to
    the two-stream case). The window grid sweeps the pre-aggregated
    gap distribution; one corpus pass."""
    _views(spark, sf_dir, "events")
    return spark.sql(_joinbuf_sql("spark"))


# ---------------------------------------------------------------------------
# q539 — CDC conflation


def _cdc_sql(dialect: str) -> str:
    us = _us(dialect)
    return f"""
    WITH keyed AS (
      SELECT user_id,
             CAST(FLOOR(CAST({us} AS DOUBLE) / 60000000) AS BIGINT) AS minute_b
      FROM events
    ),
    per_key AS (
      SELECT user_id, minute_b, CAST(COUNT(*) AS BIGINT) AS updates
      FROM keyed GROUP BY user_id, minute_b
    ),
    stats AS (
      SELECT CAST(SUM(updates) AS BIGINT) AS n_events,
             CAST(COUNT(*) AS BIGINT) AS n_versions,
             CAST(MAX(updates) AS BIGINT) AS max_burst
      FROM per_key
    )
    SELECT n_events, n_versions AS conflated_writes, max_burst,
           ROUND(CAST(1.0 AS DOUBLE)
                 - CAST(n_versions AS DOUBLE) / n_events, 4)
             AS conflation_saving
    FROM stats
    """


@query("q539_cdc_conflation", oracle=_cdc_sql("duck"))
def q539_cdc_conflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC conflation audit: collapsing each user's events to one
    last-write-wins version per minute — writes saved by conflation
    and the worst per-key burst. The number that decides whether a
    downstream materialized view subscribes to raw changes or to a
    minute-conflated feed (q176's CDC upsert is the consumer). One
    (key, minute) aggregate."""
    _views(spark, sf_dir, "events")
    return spark.sql(_cdc_sql("spark"))


# ---------------------------------------------------------------------------
# q540 — state-size projection


def _state_sql(dialect: str) -> str:
    us = _us(dialect)
    return f"""
    WITH rates AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
             CAST(MAX({us}) - MIN({us}) AS BIGINT) AS span_us
      FROM events
    ),
    proj AS (
      SELECT n_events, n_users,
             -- events per dedup window (uniform-rate projection)
             CAST(n_events AS DOUBLE) * ({DEDUP_WINDOW_H} * {HOUR_US})
               / span_us AS dedup_rows,
             CAST(n_users AS DOUBLE) AS session_rows,
             CAST(n_events AS DOUBLE) * (15 * 60000000.0) / span_us
               AS join_rows
      FROM rates
    )
    SELECT 'dedup_2h' AS operator,
           CAST(FLOOR(dedup_rows) AS BIGINT) AS projected_state_rows,
           ROUND(dedup_rows * {BYTES_DEDUP_ROW} / 1048576, 4)
             AS projected_state_mb
    FROM proj
    UNION ALL
    SELECT 'sessionizer_30m',
           CAST(FLOOR(session_rows) AS BIGINT),
           ROUND(session_rows * {BYTES_SESSION_ROW} / 1048576, 4)
    FROM proj
    UNION ALL
    SELECT 'join_buffer_15m',
           CAST(FLOOR(join_rows) AS BIGINT),
           ROUND(join_rows * {BYTES_JOIN_ROW} / 1048576, 4)
    FROM proj
    """


@query("q540_state_size_projection", oracle=_state_sql("duck"))
def q540_state_size_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-state memory projection: rows and MB for the repo's
    three stateful operators — the 2 h dedup window (q449's TTL), the
    30-min sessionizer (one open session per active user), and the
    15-min join buffer (q538's pick) — from measured event rates and
    literal bytes/row. The uniform-rate projection is the sizing
    line a cluster doc quotes; q447-q449 supply the tail corrections.
    One aggregate; three arithmetic rows."""
    _views(spark, sf_dir, "events")
    return spark.sql(_state_sql("spark"))
