"""Sequential-rating batch 180 (q967-q971) — table-based Elo over a
chronological match log (Elo 1978; the bucketed expected-score TABLE
is how FIDE actually administers it, which is also what makes it
exact-integer and therefore engine-exact). Matches derive from
events: each hour's two most active users "play", the busier one
wins (equal counts draw). The same sequential-update shape rates
items from pairwise feedback (chess, ranking from A/B duels, player
matchmaking).

Everything is integer milli-rating units: R0 = 1,500,000; expected
score for the higher-rated side comes from a 15-bucket literal table
(bucket = |diff| div 50,000, capped), and the K=16 update is
delta = 16 * (S_mill - E_mill) — no division anywhere, so the whole
trajectory is exact integer arithmetic both engines replay
identically.

- q967 the match log: per-hour pairing, outcome, match index — the
  deterministic derivation every later query consumes;
- q968 final Elo ratings: the sequential replay;
- q969 rating trajectories: per-player peak/trough over time;
- q970 K-factor sensitivity: final ratings under K=16 vs K=32 (same
  match log, two replays — K scales volatility, not ordering of the
  update rule);
- q971 rating-vs-winrate concordance: Kendall-style concordant /
  discordant pair counts between final rating and raw win counts —
  what the rating adds beyond win totals (opponent strength).

Spark plan: ONE events aggregate to the hourly table; the match log
is calendar-bounded (one match per hour — 10x data is 10x events per
hour, the SAME number of matches), so the inherently sequential
replay runs in a single Arrow-batched applyInPandas group over ~720
rows — the documented bounded-recurrence pattern (q261 Holt). The
ORACLE replays the identical integer recursion as a DuckDB recursive
CTE over a LIST-of-structs state (one row per step, single recursive
reference, no windows — PostgreSQL-style recursion restrictions
respected), so q968-q971 are hash-verified end to end.

Determinism: pure integer state; bucket uses div on a NONNEGATIVE
|diff| (Spark div truncates toward zero, DuckDB // floors — identical
only for nonnegative operands, hence the ABS-first contract);
pairing/outcome tie-break on user_id; K never divides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

R0_MILL = 1_500_000
K_BASE = 16
K_ALT = 32
BUCKET_MILL = 50_000
N_BUCKETS = 15

# expected score (mill) for the HIGHER-rated player at the bucket
# midpoint d = 50*b + 25 rating points: round(1000 / (1 + 10^(-d/400))).
# Computed once here and inlined as literals into BOTH the SQL oracle
# and the Python replay — the engines never evaluate 10^x themselves.
E_TABLE = [
    int(round(1000.0 / (1.0 + 10.0 ** (-(50 * b + 25) / 400.0))))
    for b in range(N_BUCKETS)
]


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


# --- shared match-log SQL (both dialects) -----------------------------------


def _matches_cte() -> str:
    return """hourly AS (
      SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id, hr
    ),
    rankedh AS (
      SELECT user_id, hr, cnt,
             ROW_NUMBER() OVER (PARTITION BY hr
                                ORDER BY cnt DESC, user_id) AS rn
      FROM hourly
    ),
    matches AS (
      SELECT a.hr,
             CAST(a.user_id AS BIGINT) AS pa,
             CAST(b.user_id AS BIGINT) AS pb,
             CAST(CASE WHEN a.cnt > b.cnt THEN 1000 ELSE 500 END AS BIGINT)
               AS sa
      FROM (SELECT * FROM rankedh WHERE rn = 1) a
      JOIN (SELECT * FROM rankedh WHERE rn = 2) b ON b.hr = a.hr
    ),
    seq AS (
      SELECT hr, pa, pb, sa,
             ROW_NUMBER() OVER (ORDER BY hr) AS t
      FROM matches
    )"""


def _e_case(diff_expr: str) -> str:
    """Expected mill score for the HIGHER side, bucketed literal table."""
    whens = " ".join(
        f"WHEN {b} THEN {E_TABLE[b]}" for b in range(N_BUCKETS)
    )
    return (
        f"CASE LEAST(ABS({diff_expr}) // {BUCKET_MILL}, {N_BUCKETS - 1})"
        f" {whens} END"
    )


_SHARED_ELO_CTES = """players AS (
      SELECT DISTINCT p FROM (
        SELECT pa AS p FROM matches UNION SELECT pb AS p FROM matches) u
    ),
    nsteps AS (SELECT CAST(MAX(t) AS BIGINT) AS mx FROM seq)"""


def _elo_recursive_cte(k: int, name: str) -> str:
    """DuckDB list-state Elo recursion: one row per step carrying the
    full (player, rating) list; a single recursive reference and no
    windows. Emits ({name}.t, state). Requires _SHARED_ELO_CTES."""
    e_high = _e_case("ra - rb")
    return f"""init_{name} AS (
      SELECT 0 AS t,
             LIST(struct_pack(p := p, r := CAST({R0_MILL} AS BIGINT))
                  ORDER BY p) AS st
      FROM players
    ),
    {name} AS (
      SELECT t, st FROM init_{name}
      UNION ALL
      SELECT e.t + 1,
             list_transform(e.st, x -> CASE
               WHEN x.p = s.pa THEN struct_pack(p := x.p,
                 r := x.r + {k} * (s.sa - z.ea))
               WHEN x.p = s.pb THEN struct_pack(p := x.p,
                 r := x.r - {k} * (s.sa - z.ea))
               ELSE x END) AS st
      FROM {name} e
      JOIN seq s ON s.t = e.t + 1
      CROSS JOIN LATERAL (
        SELECT CASE WHEN ra >= rb THEN eh ELSE 1000 - eh END AS ea
        FROM (
          SELECT ra, rb, CAST({e_high} AS BIGINT) AS eh
          FROM (
            SELECT list_extract(list_filter(e.st, x -> x.p = s.pa), 1).r AS ra,
                   list_extract(list_filter(e.st, x -> x.p = s.pb), 1).r AS rb
          ) q0
        ) q1
      ) z
    )"""


# --- Spark-side replay -------------------------------------------------------


def _matches_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir)
    return spark.sql(f"WITH {_matches_cte()} SELECT t, hr, pa, pb, sa FROM seq")


_TRAJ_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("p", LongType()),
        StructField("r", LongType()),
    ]
)


def elo_replay(pdf, k: int = K_BASE):
    """Exact-integer table-Elo replay over the chronological match
    log; emits (0, p, R0) for every player plus the two updated rows
    per step. Pure function shared with the parity tests; the SQL
    oracle's list recursion computes the identical integers."""
    import pandas as pd

    pdf = pdf.sort_values("t").reset_index(drop=True)
    players = sorted(set(pdf["pa"].tolist()) | set(pdf["pb"].tolist()))
    r = {p: R0_MILL for p in players}
    rows = [(0, p, R0_MILL) for p in players]
    for rec in pdf.itertuples(index=False):
        t, pa, pb, sa = int(rec.t), int(rec.pa), int(rec.pb), int(rec.sa)
        ra, rb = r[pa], r[pb]
        b = min(abs(ra - rb) // BUCKET_MILL, N_BUCKETS - 1)
        eh = E_TABLE[b]
        ea = eh if ra >= rb else 1000 - eh
        delta = k * (sa - ea)
        r[pa] = ra + delta
        r[pb] = rb - delta
        rows.append((t, pa, r[pa]))
        rows.append((t, pb, r[pb]))
    return pd.DataFrame(rows, columns=["t", "p", "r"])


def _trajectory(spark: SparkSession, sf_dir: str, k: int = K_BASE) -> DataFrame:
    m = _matches_df(spark, sf_dir)

    def _apply(pdf):
        return elo_replay(pdf, k=k)

    # groupBy(lit(1)) trips an unresolved-ordinal internal error on
    # Spark 4's flatMapGroupsInPandas; a materialized constant column
    # routes around it
    return (
        m.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(_apply, schema=_TRAJ_SCHEMA)
    )


# --- q967 — the match log ----------------------------------------------------

_Q967_SQL = f"""
    WITH {_matches_cte()}
    SELECT t AS match_idx, hr, pa AS player_a, pb AS player_b,
           sa AS score_a_mill
    FROM seq ORDER BY t
    """


@query("q967_match_log", oracle=_Q967_SQL)
def q967_match_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic match log every rating query consumes: per
    hour, the two most active users play; the busier wins (1000
    mill), equal counts draw (500); ties in activity break on
    user_id. Calendar-bounded: one match per hour regardless of SF —
    the property that keeps the sequential replay bounded at 100 TB."""
    return (
        _matches_df(spark, sf_dir)
        .select(
            F.col("t").alias("match_idx"),
            "hr",
            F.col("pa").alias("player_a"),
            F.col("pb").alias("player_b"),
            F.col("sa").alias("score_a_mill"),
        )
        .orderBy("match_idx")
    )


# --- q968 — final ratings ----------------------------------------------------


def _q968_oracle() -> str:
    return f"""
    WITH RECURSIVE {_matches_cte()},
    {_SHARED_ELO_CTES},
    {_elo_recursive_cte(K_BASE, 'elo')},
    fin AS (
      SELECT st FROM elo e CROSS JOIN nsteps n WHERE e.t = n.mx
    )
    SELECT u.x.p AS player, u.x.r AS rating_mill
    FROM (SELECT UNNEST(st) AS x FROM fin) u
    ORDER BY player
    """


@query("q968_elo_final", oracle=_q968_oracle())
def q968_elo_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final table-Elo ratings after the full chronological replay —
    exact integer milli-units, K=16. Spark runs the bounded
    applyInPandas recurrence; the oracle replays the identical
    integers as a list-state recursive CTE, so the whole sequential
    operator is hash-verified."""
    traj = _trajectory(spark, sf_dir)
    w_last = F.max(F.struct("t", "r"))
    return (
        traj.groupBy(F.col("p").alias("player"))
        .agg(w_last.alias("last"))
        .select("player", F.col("last.r").alias("rating_mill"))
        .orderBy("player")
    )


# --- q969 — trajectory extremes ----------------------------------------------


def _q969_oracle() -> str:
    return f"""
    WITH RECURSIVE {_matches_cte()},
    {_SHARED_ELO_CTES},
    {_elo_recursive_cte(K_BASE, 'elo')},
    touched AS (
      SELECT e.t, u.x.p AS p, u.x.r AS r
      FROM elo e JOIN seq s ON s.t = e.t,
           UNNEST(e.st) u(x)
      WHERE u.x.p = s.pa OR u.x.p = s.pb
      UNION ALL
      SELECT 0 AS t, u.x.p, u.x.r
      FROM elo e, UNNEST(e.st) u(x) WHERE e.t = 0
    )
    SELECT p AS player,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_matches,
           CAST(MAX(r) AS BIGINT) AS peak_mill,
           CAST(MIN(r) AS BIGINT) AS trough_mill,
           CAST(MAX(r) - MIN(r) AS BIGINT) AS swing_mill
    FROM touched GROUP BY p ORDER BY p
    """


@query("q969_elo_trajectory", oracle=_q969_oracle())
def q969_elo_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-player rating trajectory extremes — peak, trough, total
    swing and matches played — the volatility view a matchmaking
    system monitors. Same replay; the oracle reads its recursion's
    intermediate states (the recursive CTE accumulates every step)."""
    traj = _trajectory(spark, sf_dir)
    return (
        traj.groupBy(F.col("p").alias("player"))
        .agg(
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_matches"),
            F.max("r").cast("bigint").alias("peak_mill"),
            F.min("r").cast("bigint").alias("trough_mill"),
            (F.max("r") - F.min("r")).cast("bigint").alias("swing_mill"),
        )
        .orderBy("player")
    )


# --- q970 — K sensitivity ----------------------------------------------------


def _q970_oracle() -> str:
    return f"""
    WITH RECURSIVE {_matches_cte()},
    {_SHARED_ELO_CTES},
    {_elo_recursive_cte(K_BASE, 'elo16')},
    {_elo_recursive_cte(K_ALT, 'elo32')},
    f16 AS (
      SELECT u.x.p AS p, u.x.r AS r16
      FROM (SELECT st FROM elo16 e CROSS JOIN nsteps n WHERE e.t = n.mx) f,
           UNNEST(f.st) u(x)
    ),
    f32 AS (
      SELECT u.x.p AS p, u.x.r AS r32
      FROM (SELECT st FROM elo32 e CROSS JOIN nsteps n WHERE e.t = n.mx) f,
           UNNEST(f.st) u(x)
    )
    SELECT f16.p AS player, f16.r16 AS rating_k16_mill,
           f32.r32 AS rating_k32_mill,
           CAST(ABS(f32.r32 - {R0_MILL}) - ABS(f16.r16 - {R0_MILL})
             AS BIGINT) AS extra_displacement_mill
    FROM f16 JOIN f32 ON f32.p = f16.p
    ORDER BY player
    """


@query("q970_elo_k_sensitivity", oracle=_q970_oracle())
def q970_elo_k_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same match log replayed under K=16 and K=32: K scales
    per-match volatility, so displacement from R0 (almost always)
    widens — the knob a matchmaking operator tunes against rating
    churn. Two bounded replays, two recursions in one oracle."""
    t16 = _trajectory(spark, sf_dir, k=K_BASE)
    t32 = _trajectory(spark, sf_dir, k=K_ALT)
    last = F.max(F.struct("t", "r"))
    f16 = (
        t16.groupBy(F.col("p").alias("player"))
        .agg(last.alias("l"))
        .select("player", F.col("l.r").alias("rating_k16_mill"))
    )
    f32 = (
        t32.groupBy(F.col("p").alias("player"))
        .agg(last.alias("l"))
        .select("player", F.col("l.r").alias("rating_k32_mill"))
    )
    return (
        f16.join(f32, "player")
        .select(
            "player",
            "rating_k16_mill",
            "rating_k32_mill",
            (
                F.abs(F.col("rating_k32_mill") - R0_MILL)
                - F.abs(F.col("rating_k16_mill") - R0_MILL)
            )
            .cast("bigint")
            .alias("extra_displacement_mill"),
        )
        .orderBy("player")
    )


# --- q971 — rating vs win-rate concordance -----------------------------------


def _q971_oracle() -> str:
    return f"""
    WITH RECURSIVE {_matches_cte()},
    {_SHARED_ELO_CTES},
    {_elo_recursive_cte(K_BASE, 'elo')},
    fin AS (
      SELECT u.x.p AS p, u.x.r AS r
      FROM (SELECT st FROM elo e CROSS JOIN nsteps n WHERE e.t = n.mx) f,
           UNNEST(f.st) u(x)
    ),
    wins AS (
      SELECT p, CAST(SUM(w) AS BIGINT) AS wins FROM (
        SELECT pa AS p, CASE WHEN sa = 1000 THEN 1 ELSE 0 END AS w
        FROM matches
        UNION ALL
        SELECT pb AS p, 0 AS w FROM matches) u
      GROUP BY p
    ),
    joined AS (
      SELECT f.p, f.r, w.wins FROM fin f JOIN wins w ON w.p = f.p
    ),
    pairs AS (
      SELECT CASE WHEN (a.r - b.r) * (a.wins - b.wins) > 0 THEN 1 ELSE 0 END
               AS conc,
             CASE WHEN (a.r - b.r) * (a.wins - b.wins) < 0 THEN 1 ELSE 0 END
               AS disc
      FROM joined a JOIN joined b ON a.p < b.p
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(SUM(disc) AS BIGINT) AS discordant,
           CAST(SUM(conc) - SUM(disc) AS DOUBLE) / COUNT(*) AS kendall_tau_a
    FROM pairs
    """


@query("q971_elo_winrate_concordance", oracle=_q971_oracle())
def q971_elo_winrate_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-a between final Elo and raw win counts over player
    pairs (exact integer sign products): high but below 1 — the gap
    is opponent-strength information the rating carries and win
    totals cannot. Pair join runs on the BOUNDED player table (one
    row per player, calendar-bounded match log), never on facts."""
    traj = _trajectory(spark, sf_dir)
    last = F.max(F.struct("t", "r"))
    fin = (
        traj.groupBy("p").agg(last.alias("l")).select("p", F.col("l.r").alias("r"))
    )
    m = _matches_df(spark, sf_dir)
    wins = (
        m.select(F.col("pa").alias("p"), (F.col("sa") == 1000).cast("int").alias("w"))
        .unionByName(m.select(F.col("pb").alias("p"), F.lit(0).alias("w")))
        .groupBy("p")
        .agg(F.sum("w").cast("bigint").alias("wins"))
    )
    joined = fin.join(wins, "p").localCheckpoint(eager=True)
    a = joined.select(
        F.col("p").alias("ap"), F.col("r").alias("ar"), F.col("wins").alias("aw")
    )
    b = joined.select(
        F.col("p").alias("bp"), F.col("r").alias("br"), F.col("wins").alias("bw")
    )
    pairs = a.join(F.broadcast(b), F.col("ap") < F.col("bp")).select(
        (
            ((F.col("ar") - F.col("br")) * (F.col("aw") - F.col("bw")) > 0)
        ).cast("int").alias("conc"),
        (
            ((F.col("ar") - F.col("br")) * (F.col("aw") - F.col("bw")) < 0)
        ).cast("int").alias("disc"),
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("conc").cast("bigint").alias("concordant"),
        F.sum("disc").cast("bigint").alias("discordant"),
        (
            (F.sum("conc") - F.sum("disc")).cast("double") / F.count(F.lit(1))
        ).alias("kendall_tau_a"),
    )
