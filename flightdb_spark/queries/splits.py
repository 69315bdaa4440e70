"""Data-split design batch 100 (q566-q570) — the train/eval split
toolkit a training-data pipeline runs BEFORE any model sees a row
(beside q350's curation funnel and q59/q123 packing): temporal CV
design, leakage audits, and resampling plans, all as exact set
arithmetic over the events table.

- q566 rolling-origin splits: K expanding-window folds (train up to
  an origin day, test the next H days) with per-fold day/row counts;
- q567 purged k-fold with embargo: contiguous day blocks as folds,
  an E-day embargo purged around each test block (Lopez de Prado's
  purged CV, re-expressed as integer day-index set algebra);
- q568 blocked bootstrap: moving-block bootstrap replicates with
  deterministic md5-derived block starts — per-replicate coverage
  and multiplicity-weighted row counts;
- q569 group-split leakage: hash-by-user vs naive hash-by-row
  80/10/10 splits, counting users that span splits and contaminated
  eval rows (zero by construction for the group scheme);
- q570 target-leakage audit: per-user first-purchase labels vs a
  naive all-history feature join — how many feature rows postdate
  their own label.

100 TB shape: day spines collapse the corpus to a bounded day table
(one exchange); fold/replicate expansion cross-joins a <=50-row spec
against that bounded table; split assignment is a stateless hash
expression evaluated map-side (no shuffle at all for q569's counts
beyond one aggregate); the leakage joins are per-user equi-joins.
Day indices come from datediff against a broadcast scalar min — no
global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

K_FOLDS = 5
EMBARGO_DAYS = 3
BLOCK_LEN = 7
N_REPLICATES = 10
HORIZON = 3


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _days(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _idiv(dialect: str, a: str, b: str) -> str:
    """Exact integer division on BOTH engines (DuckDB `/` on integers
    yields DOUBLE and CAST rounds; Spark's cast truncates — the
    q307/q367 divergence)."""
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def _h64(dialect: str, expr: str) -> str:
    """Deterministic 32-hex-bit integer from md5 — the q538 idiom."""
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def _day_spine(dialect: str) -> str:
    """Bounded day table with idx = days since corpus min date."""
    return f"""spine AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    bounds AS (SELECT MIN(d) AS d0, CAST(COUNT(*) AS BIGINT) AS n_days FROM spine),
    idxd AS (
      SELECT s.d, s.n_rows,
             CAST({_days(dialect, 'b.d0', 's.d')} AS BIGINT) AS idx,
             b.n_days
      FROM spine s CROSS JOIN bounds b
    )"""


# ---------------------------------------------------------------------------
# q566 — rolling-origin splits


def _rolling_sql(dialect: str) -> str:
    folds = ", ".join(f"({k})" for k in range(K_FOLDS))
    return f"""
    WITH {_day_spine(dialect)},
    folds(fold) AS (VALUES {folds}),
    tagged AS (
      SELECT f.fold, i.d, i.n_rows, i.idx,
             {_idiv(dialect, 'i.n_days * (5 + f.fold)', '10')} AS origin
      FROM idxd i CROSS JOIN folds f
    )
    SELECT fold,
           CAST(SUM(CASE WHEN idx < origin THEN 1 ELSE 0 END) AS BIGINT)
             AS train_days,
           CAST(COALESCE(SUM(CASE WHEN idx < origin THEN n_rows END), 0)
                AS BIGINT) AS train_rows,
           COALESCE(MAX(CASE WHEN idx < origin THEN d END),
                    DATE '1900-01-01') AS train_end,
           CAST(SUM(CASE WHEN idx >= origin AND idx < origin + {HORIZON}
                         THEN 1 ELSE 0 END) AS BIGINT) AS test_days,
           CAST(COALESCE(SUM(CASE WHEN idx >= origin
                                   AND idx < origin + {HORIZON}
                              THEN n_rows END), 0) AS BIGINT) AS test_rows,
           COALESCE(MIN(CASE WHEN idx >= origin AND idx < origin + {HORIZON}
                        THEN d END), DATE '1900-01-01') AS test_start
    FROM tagged
    GROUP BY fold
    ORDER BY fold
    """


@query("q566_rolling_origin_splits", oracle=_rolling_sql("duck"))
def q566_rolling_origin_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin (expanding-window) CV design: fold k trains on
    the first (5+k)/10 of the day span (exact integer-div origins)
    and tests the next 3 days. The corpus collapses
    to a bounded day spine (one aggregate); the 5-fold expansion and
    all counts run on that spine. Day index = datediff from a
    broadcast scalar min — no window."""
    _views(spark, sf_dir)
    return spark.sql(_rolling_sql("spark"))


# ---------------------------------------------------------------------------
# q567 — purged k-fold with embargo


def _purged_sql(dialect: str) -> str:
    return f"""
    WITH {_day_spine(dialect)},
    foldof AS (
      SELECT d, n_rows, idx, n_days,
             {_idiv(dialect, f'idx * {K_FOLDS}', 'n_days')} AS fold
      FROM idxd
    ),
    blocks AS (
      SELECT fold, MIN(idx) AS lo, MAX(idx) AS hi FROM foldof GROUP BY fold
    ),
    classified AS (
      SELECT b.fold, f.d, f.n_rows,
             CASE
               WHEN f.idx BETWEEN b.lo AND b.hi THEN 'test'
               WHEN f.idx BETWEEN b.lo - {EMBARGO_DAYS} AND b.hi + {EMBARGO_DAYS}
                 THEN 'embargo'
               ELSE 'train'
             END AS role
      FROM foldof f CROSS JOIN blocks b
    )
    SELECT fold,
           CAST(SUM(CASE WHEN role = 'test' THEN 1 ELSE 0 END) AS BIGINT)
             AS test_days,
           CAST(SUM(CASE WHEN role = 'test' THEN n_rows ELSE 0 END) AS BIGINT)
             AS test_rows,
           CAST(SUM(CASE WHEN role = 'embargo' THEN 1 ELSE 0 END) AS BIGINT)
             AS embargo_days,
           CAST(SUM(CASE WHEN role = 'train' THEN 1 ELSE 0 END) AS BIGINT)
             AS train_days,
           CAST(SUM(CASE WHEN role = 'train' THEN n_rows ELSE 0 END) AS BIGINT)
             AS train_rows
    FROM classified
    GROUP BY fold
    ORDER BY fold
    """


@query("q567_purged_kfold_embargo", oracle=_purged_sql("duck"))
def q567_purged_kfold_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purged k-fold with a 3-day embargo: contiguous day blocks as
    test folds (fold = idx*K div n_days, exact integer block
    assignment), train = everything outside test +/- embargo. All set
    algebra on the bounded day spine; the fold-block bounds table is
    5 rows cross-joined back (broadcast)."""
    _views(spark, sf_dir)
    return spark.sql(_purged_sql("spark"))


# ---------------------------------------------------------------------------
# q568 — blocked bootstrap


def _bootstrap_sql(dialect: str) -> str:
    reps = ", ".join(f"({r})" for r in range(N_REPLICATES))
    h = _h64(dialect, "concat('rep:', CAST(r.rep AS STRING), ':', CAST(g.b AS STRING))")
    if dialect != "spark":
        h = _h64(
            dialect, "concat('rep:', CAST(r.rep AS VARCHAR), ':', CAST(g.b AS VARCHAR))"
        )
    # B blocks of length L per replicate; B = number of full blocks that
    # tile the spine (n_days div L, at least 1).
    return f"""
    WITH {_day_spine(dialect)},
    meta AS (
      SELECT n_days,
             n_days - {BLOCK_LEN} + 1 AS n_starts,
             GREATEST({_idiv(dialect, 'n_days', str(BLOCK_LEN))}, 1) AS n_blocks
      FROM idxd GROUP BY n_days
    ),
    reps(rep) AS (VALUES {reps}),
    blockno AS (
      SELECT i.idx AS b FROM idxd i CROSS JOIN meta m
      WHERE i.idx < m.n_blocks
    ),
    draws AS (
      SELECT r.rep, g.b,
             {h} % m.n_starts AS start_idx
      FROM reps r CROSS JOIN blockno g CROSS JOIN meta m
    ),
    covered AS (
      SELECT dr.rep, i.d, i.n_rows
      FROM draws dr
      JOIN idxd i ON i.idx >= dr.start_idx
                 AND i.idx < dr.start_idx + {BLOCK_LEN}
    )
    SELECT c.rep,
           CAST(COUNT(*) AS BIGINT) AS day_slots,
           CAST(COUNT(DISTINCT c.d) AS BIGINT) AS distinct_days,
           ROUND(CAST(COUNT(DISTINCT c.d) AS DOUBLE) / MAX(m.n_days), 6)
             AS coverage_ratio,
           CAST(SUM(c.n_rows) AS BIGINT) AS sampled_rows
    FROM covered c CROSS JOIN meta m
    GROUP BY c.rep
    ORDER BY c.rep
    """


@query("q568_blocked_bootstrap", oracle=_bootstrap_sql("duck"))
def q568_blocked_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-block bootstrap design: 10 replicates each draw
    n_days/7 blocks of 7 consecutive days with md5-derived
    deterministic start offsets; per replicate the day-slot count,
    distinct-day coverage, and multiplicity-weighted sampled rows.
    The block->day expansion is a bounded range join on the day
    spine (<=50 blocks x 7 days); the corpus is touched once.

    r10 P3 staging: `idxd` (the calendar-bounded day spine) is
    referenced by meta, blockno and covered — and meta itself 3x —
    each re-running the corpus day aggregate under Catalyst inlining
    (10 duplicate events scans in the static plan). ONE corpus pass
    checkpoints the spine; the staged SQL swaps only the WITH-head
    (oracle keeps the one-statement form)."""
    _views(spark, sf_dir)
    full = _bootstrap_sql("spark")
    head = f"WITH {_day_spine('spark')},"
    assert head in full, "q568: day-spine head drifted"
    idxd = spark.sql(
        f"WITH {_day_spine('spark')} SELECT d, n_rows, idx, n_days FROM idxd"
    ).localCheckpoint(eager=True)
    idxd.createOrReplaceTempView("splits_idxd_mv")
    staged = full.replace(
        head,
        "WITH idxd AS (SELECT d, n_rows, idx, n_days FROM splits_idxd_mv),",
        1,
    )
    return spark.sql(staged)


# ---------------------------------------------------------------------------
# q569 — group-split leakage


def _leak_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    hu = _h64(dialect, f"concat('u:', CAST(user_id AS {s}))")
    he = _h64(dialect, f"concat('e:', CAST(event_id AS {s}))")
    return f"""
    WITH assigned AS (
      SELECT user_id, event_id,
             CASE WHEN {hu} % 10 < 8 THEN 'train'
                  WHEN {hu} % 10 = 8 THEN 'val' ELSE 'test' END AS group_split,
             CASE WHEN {he} % 10 < 8 THEN 'train'
                  WHEN {he} % 10 = 8 THEN 'val' ELSE 'test' END AS row_split
      FROM events
    ),
    schemes AS (
      SELECT 'group_hash' AS scheme, user_id, group_split AS split FROM assigned
      UNION ALL
      SELECT 'row_hash', user_id, row_split FROM assigned
    ),
    per_user AS (
      SELECT scheme, user_id,
             CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
             CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS u_train,
             CAST(SUM(CASE WHEN split <> 'train' THEN 1 ELSE 0 END) AS BIGINT)
               AS u_eval
      FROM schemes GROUP BY scheme, user_id
    )
    SELECT scheme,
           CAST(SUM(u_train) AS BIGINT) AS train_rows,
           CAST(SUM(u_eval) AS BIGINT) AS eval_rows,
           CAST(SUM(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS users_spanning_splits,
           CAST(SUM(CASE WHEN u_train > 0 THEN u_eval ELSE 0 END) AS BIGINT)
             AS contaminated_eval_rows,
           ROUND(CAST(SUM(CASE WHEN u_train > 0 THEN u_eval ELSE 0 END)
                      AS DOUBLE)
                 / NULLIF(SUM(u_eval), 0), 6) AS contamination_share
    FROM per_user
    GROUP BY scheme
    ORDER BY scheme
    """


@query("q569_group_split_leakage", oracle=_leak_sql("duck"))
def q569_group_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware (hash user_id) vs naive (hash event_id) 80/10/10
    splits, audited for leakage: users spanning multiple splits and
    eval rows whose user also has training rows. The group scheme is
    contamination-free by construction; the naive scheme's
    contamination share is the quantified argument for group splits.
    Split assignment is a stateless map-side hash; one user-keyed
    aggregate does the audit."""
    _views(spark, sf_dir)
    return spark.sql(_leak_sql("spark"))


# ---------------------------------------------------------------------------
# q570 — target-leakage audit


def _target_sql(dialect: str) -> str:
    return """
    WITH labels AS (
      SELECT user_id, MIN(ts) AS label_ts
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    joined AS (
      SELECT e.user_id, e.ts, l.label_ts
      FROM events e JOIN labels l ON l.user_id = e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM labels) AS BIGINT) AS n_labeled_users,
           CAST(COUNT(*) AS BIGINT) AS naive_feature_rows,
           CAST(SUM(CASE WHEN ts >= label_ts THEN 1 ELSE 0 END) AS BIGINT)
             AS future_rows,
           CAST(SUM(CASE WHEN ts < label_ts THEN 1 ELSE 0 END) AS BIGINT)
             AS safe_feature_rows,
           ROUND(CAST(SUM(CASE WHEN ts >= label_ts THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS leak_share,
           CAST(COUNT(DISTINCT CASE WHEN ts >= label_ts THEN user_id END)
                AS BIGINT) AS users_with_future_rows
    FROM joined
    """


@query("q570_target_leakage_audit", oracle=_target_sql("duck"))
def q570_target_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target-leakage audit: label each user at their FIRST purchase,
    then count how many feature rows a naive all-history join would
    include that postdate the label (and how many users are affected).
    One per-user label aggregate + one user-keyed equi-join; the
    at-or-after-label comparison is a map-side timestamp compare."""
    _views(spark, sf_dir)
    return spark.sql(_target_sql("spark"))
