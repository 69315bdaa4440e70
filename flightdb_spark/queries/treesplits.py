"""Tree-split batch 112 (q626-q630) — the decision-tree fitting
primitives a distributed GBM/forest trainer runs, on the planted
exact-rational features of the scorecard battery: f1 = k1 in
[0, 2^20) with P(y=1|k1) = k1/2^20 (so f1 is informative by
construction), and f2 = an independent hash SHIFTED by +200000 (mod
2^20) when y=1 (so f2 is informative too, differently). Histograms,
not row sorts: every split search runs on a 64-bin aggregate — the
standard histogram-based tree-growing shape (LightGBM-style) that
scales because candidate evaluation never touches rows twice.

- q626 best split by Gini: weighted Gini impurity at all 63 bin
  thresholds (cumulative counts via the 64x64 triangle join), top-5
  splits;
- q627 information gain by feature: parent entropy minus weighted
  child entropy for four candidate features (f1 bands, f2 bands,
  event_type, day-of-week), ln contract;
- q628 stump fit: the best f1 threshold as a one-level tree —
  confusion counts and training accuracy, all integer;
- q629 depth-2 greedy tree: root on f1, each child independently
  split on f2 (per-side argmin rank, partitioned) — the four leaves
  with counts and majority predictions;
- q630 oblivious vs greedy depth-2: the SAME f2 threshold forced on
  both children (CatBoost-style oblivious layer) vs q629's greedy
  per-child choice — the impurity cost of obliviousness.

100 TB shape: one corpus aggregate to (bin[, side]) tables; all
candidate evaluation on bounded tables via triangle joins,
TakeOrdered, or side-partitioned rank windows. Impurities are
doubles computed from exact integer counts — identical IEEE on both
engines; ties break on the threshold index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

DENOM = 1 << 20
N_BINS = 64
BIN_W = DENOM // N_BINS
F2_SHIFT = 200_000


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _h20(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 5), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, 5))::BIGINT)"


def _idiv(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def _feat_cte(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    k1 = _h20(dialect, f"concat('f1:', CAST(event_id AS {s}))")
    k2 = _h20(dialect, f"concat('f2:', CAST(event_id AS {s}))")
    j = _h20(dialect, f"concat('l:', CAST(event_id AS {s}))")
    return f"""feat AS (
      SELECT event_id, event_type, ts,
             {k1} AS k1,
             CASE WHEN {j} < {k1}
                  THEN ({k2} + {F2_SHIFT}) % {DENOM}
                  ELSE {k2} END AS k2,
             CASE WHEN {j} < {k1} THEN 1 ELSE 0 END AS y
      FROM events
    )"""


def _gini_terms(nl: str, pl: str, nr: str, pr: str) -> str:
    """Weighted Gini impurity * N, from exact integer counts:
    nL*(1 - pL^2 - qL^2) + nR*(...), expanded to avoid 0/0 on empty
    sides: n*(1-p^2-q^2) = 2*(pos*neg)/n."""
    # CAST(2 AS DOUBLE) forces the double chain: a bare 2.0 literal is
    # DECIMAL in Spark and the decimal scale rules diverge from DuckDB
    return (
        f"(CASE WHEN {nl} = 0 THEN CAST(0 AS DOUBLE) ELSE "
        f"CAST(2 AS DOUBLE) * {pl} * ({nl} - {pl}) / {nl} END"
        f" + CASE WHEN {nr} = 0 THEN CAST(0 AS DOUBLE) ELSE "
        f"CAST(2 AS DOUBLE) * {pr} * ({nr} - {pr}) / {nr} END)"
    )


def _cands_cte() -> str:
    """Threshold candidates from the 64-bin triangle (dialect-free)."""
    return """cands AS (
      SELECT a.b AS t,
             CAST(SUM(CASE WHEN c.b < a.b THEN c.n ELSE 0 END) AS BIGINT)
               AS nl,
             CAST(SUM(CASE WHEN c.b < a.b THEN c.pos ELSE 0 END) AS BIGINT)
               AS pl,
             CAST(SUM(CASE WHEN c.b >= a.b THEN c.n ELSE 0 END) AS BIGINT)
               AS nr,
             CAST(SUM(CASE WHEN c.b >= a.b THEN c.pos ELSE 0 END) AS BIGINT)
               AS pr
      FROM bins a CROSS JOIN bins c
      WHERE a.b > 0
      GROUP BY a.b
    )"""


def _bins1_cte(dialect: str) -> str:
    return f"""{_feat_cte(dialect)},
    bins AS (
      SELECT {_idiv(dialect, 'k1', str(BIN_W))} AS b,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM feat GROUP BY {_idiv(dialect, 'k1', str(BIN_W))}
    ),
    {_cands_cte()}"""


# --- Spark-side staging (oracle strings keep the single-statement CTE
# form; DuckDB materializes CTEs natively) -----------------------------------
#
# `feat` (three md5+conv hash derivations per corpus row) re-expanded
# per CTE reference under Catalyst inlining: q626/q628's bin triangle
# referenced `bins` twice (2 corpus passes), and q629/q630's
# root -> sided -> cands2 -> bestchild chain compounded to feat x6-x12.
# The fix (P3 + guide §2.4): ONE corpus pass aggregates feat to the
# 64x64 (b1, b2) histogram, checkpointed; every marginal, triangle and
# per-side histogram is then an exact BIGINT re-aggregation of the
# bounded grid (b1 = k1 div BIN_W, so k1 < t*BIN_W <=> b1 < t exactly;
# b2 is the same binning q629's sided CTE applies row-wise).

_HIST2_VIEW = "treesplits_hist2_mv"

# bins marginal re-aggregated from the checkpointed grid (SUM of cell
# counts == the row-grain COUNT per b1, exact BIGINT)
_BINS1_MV_CTE = f"""bins AS (
      SELECT b1 AS b, CAST(SUM(n) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS pos
      FROM {_HIST2_VIEW} GROUP BY b1
    ),
    {_cands_cte()}"""


def _hist2_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE feat pass -> checkpointed 64x64 (b1, b2, n, pos) grid."""
    _views(spark, sf_dir)
    b1 = _idiv("spark", "k1", str(BIN_W))
    b2 = _idiv("spark", "k2", str(BIN_W))
    df = spark.sql(
        f"""
    WITH {_feat_cte('spark')}
    SELECT {b1} AS b1, {b2} AS b2,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS pos
    FROM feat GROUP BY {b1}, {b2}
    """
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_HIST2_VIEW)


# ---------------------------------------------------------------------------
# q626 — best split by Gini


def _gini_sql(dialect: str, bins: str | None = None) -> str:
    g = _gini_terms("nl", "pl", "nr", "pr")
    return f"""
    WITH {bins or _bins1_cte(dialect)}
    SELECT t AS threshold_bin, nl, pl, nr, pr,
           ROUND({g} / (nl + nr), 6) AS weighted_gini
    FROM cands
    ORDER BY {g} ASC, t
    LIMIT 5
    """


@query("q626_best_split_gini", oracle=_gini_sql("duck"))
def q626_best_split_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram split search: weighted Gini impurity (as
    2*pos*neg/n per side — exact-integer-derived doubles) at all 63
    f1 bin thresholds, top-5 ascending. Cumulative side counts come
    from the 64x64 bin triangle join; the corpus is touched once."""
    _hist2_view(spark, sf_dir)
    return spark.sql(_gini_sql("spark", _BINS1_MV_CTE))


# ---------------------------------------------------------------------------
# q627 — information gain by feature


_IG_CELLS_VIEW = "treesplits_igcells_mv"


def _labeled_cte(dialect: str) -> str:
    f1band = _idiv(dialect, "k1", str(DENOM // 4))
    f2band = _idiv(dialect, "k2", str(DENOM // 4))
    dow = "dayofweek(ts)" if dialect == "spark" else "dayofweek(ts) + 1"
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""labeled AS (
      SELECT CAST({f1band} AS {s}) AS f1_band,
             CAST({f2band} AS {s}) AS f2_band,
             event_type,
             CAST({dow} AS {s}) AS dow,
             y
      FROM feat
    )"""


def _ig_cells_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE feat pass -> checkpointed (f1_band, f2_band, event_type,
    dow) cells: every per-feature arm is an exact BIGINT marginal."""
    _views(spark, sf_dir)
    df = spark.sql(
        f"""
    WITH {_feat_cte('spark')},
    {_labeled_cte('spark')}
    SELECT f1_band, f2_band, event_type, dow,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(y) AS BIGINT) AS pos
    FROM labeled GROUP BY f1_band, f2_band, event_type, dow
    """
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_IG_CELLS_VIEW)


# the four feature arms re-aggregated from the checkpointed cells
# (SUM of cell counts == the row-grain COUNT per band, exact BIGINT)
_IG_GROUPS_MV_CTE = f"""groups AS (
      SELECT 'f1_band' AS feature, f1_band AS val,
             CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(pos) AS BIGINT) AS pos
      FROM {_IG_CELLS_VIEW} GROUP BY f1_band
      UNION ALL
      SELECT 'f2_band', f2_band, CAST(SUM(n) AS BIGINT),
             CAST(SUM(pos) AS BIGINT) FROM {_IG_CELLS_VIEW} GROUP BY f2_band
      UNION ALL
      SELECT 'event_type', event_type, CAST(SUM(n) AS BIGINT),
             CAST(SUM(pos) AS BIGINT) FROM {_IG_CELLS_VIEW} GROUP BY event_type
      UNION ALL
      SELECT 'dow', dow, CAST(SUM(n) AS BIGINT),
             CAST(SUM(pos) AS BIGINT) FROM {_IG_CELLS_VIEW} GROUP BY dow
    )"""


def _infogain_sql(dialect: str, staged: bool = False) -> str:
    # entropy term contract: ROUND(p*ln(p), 9) accumulated in DECIMAL
    def ent(n: str, pos: str) -> str:
        p = f"(CAST({pos} AS DOUBLE) / {n})"
        q = f"(CAST({n} - {pos} AS DOUBLE) / {n})"
        return (
            f"(CASE WHEN {pos} = 0 OR {pos} = {n} THEN CAST(0.0 AS DECIMAL(38,9))"
            f" ELSE CAST(ROUND(-({p} * ln({p}) + {q} * ln({q})), 9)"
            f" AS DECIMAL(38,9)) END)"
        )

    if staged:
        head = f"""
    WITH {_IG_GROUPS_MV_CTE},"""
    else:
        head = f"""
    WITH {_feat_cte(dialect)},
    {_labeled_cte(dialect)},
    groups AS (
      SELECT 'f1_band' AS feature, f1_band AS val,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
      FROM labeled GROUP BY f1_band
      UNION ALL
      SELECT 'f2_band', f2_band, CAST(COUNT(*) AS BIGINT),
             CAST(SUM(y) AS BIGINT) FROM labeled GROUP BY f2_band
      UNION ALL
      SELECT 'event_type', event_type, CAST(COUNT(*) AS BIGINT),
             CAST(SUM(y) AS BIGINT) FROM labeled GROUP BY event_type
      UNION ALL
      SELECT 'dow', dow, CAST(COUNT(*) AS BIGINT),
             CAST(SUM(y) AS BIGINT) FROM labeled GROUP BY dow
    ),"""
    return f"""{head}
    parent AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(pos) AS BIGINT) AS pp
      FROM groups WHERE feature = 'f1_band'
    )
    SELECT g.feature,
           CAST(COUNT(*) AS BIGINT) AS n_values,
           ROUND(CAST(MAX({ent('p.nn', 'p.pp')}) AS DOUBLE), 5)
             AS parent_entropy,
           -- sum n*ent exactly in DECIMAL, divide by nn ONCE as DOUBLE
           -- (decimal-by-integer division scale rules differ per engine)
           ROUND(CAST(SUM(g.n * {ent('g.n', 'g.pos')}) AS DOUBLE)
                 / MAX(p.nn), 5) AS child_entropy,
           ROUND(CAST(MAX({ent('p.nn', 'p.pp')}) AS DOUBLE)
                 - CAST(SUM(g.n * {ent('g.n', 'g.pos')}) AS DOUBLE)
                   / MAX(p.nn), 5) AS info_gain
    FROM groups g CROSS JOIN parent p
    GROUP BY g.feature
    ORDER BY info_gain DESC, g.feature
    """


@query("q627_information_gain", oracle=_infogain_sql("duck"))
def q627_information_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information gain of four candidate features (f1/f2 quartile
    bands, event type, day of week): parent entropy minus the
    count-weighted child entropy, every entropy term under the 9 dp/
    DECIMAL contract. f1 must rank first by construction; dow must be
    ~0. ONE corpus pass (the checkpointed 4-key cell grid); each
    feature arm is a bounded marginal of it."""
    _ig_cells_view(spark, sf_dir)
    return spark.sql(_infogain_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q628 — stump fit


def _stump_sql(dialect: str, bins: str | None = None) -> str:
    g = _gini_terms("nl", "pl", "nr", "pr")
    return f"""
    WITH {bins or _bins1_cte(dialect)},
    best AS (
      SELECT t, nl, pl, nr, pr FROM cands
      ORDER BY {g} ASC, t
      LIMIT 1
    )
    SELECT t AS threshold_bin,
           CASE WHEN 2 * pl > nl THEN 1 ELSE 0 END AS left_pred,
           CASE WHEN 2 * pr > nr THEN 1 ELSE 0 END AS right_pred,
           nl + nr AS n_rows,
           -- correct = majority count on each side
           CAST(GREATEST(pl, nl - pl) + GREATEST(pr, nr - pr) AS BIGINT)
             AS n_correct,
           ROUND(CAST(GREATEST(pl, nl - pl) + GREATEST(pr, nr - pr)
                      AS DOUBLE) / (nl + nr), 6) AS train_accuracy
    FROM best
    """


@query("q628_stump_fit", oracle=_stump_sql("duck"))
def q628_stump_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fitted decision stump: q626's argmin threshold with
    majority-class leaf predictions (an exact 2*pos > n integer
    compare) and training accuracy from exact majority counts."""
    _hist2_view(spark, sf_dir)
    return spark.sql(_stump_sql("spark", _BINS1_MV_CTE))


# ---------------------------------------------------------------------------
# q629 — depth-2 greedy tree


def _depth2_ctes(dialect: str, staged: bool = False) -> str:
    g = _gini_terms("nl", "pl", "nr", "pr")
    if staged:
        # staged sided: the per-side f2 histogram re-aggregated from
        # the checkpointed grid (k1 < t*BIN_W <=> b1 < t, exact)
        head = f"""{_BINS1_MV_CTE},
    root AS (
      SELECT t FROM cands ORDER BY {g} ASC, t LIMIT 1
    ),
    sided AS (
      SELECT /*+ BROADCAST(r) */
             CASE WHEN h.b1 < r.t THEN 'L' ELSE 'R' END AS side,
             h.b2 AS b2,
             CAST(SUM(h.n) AS BIGINT) AS n,
             CAST(SUM(h.pos) AS BIGINT) AS pos
      FROM {_HIST2_VIEW} h CROSS JOIN root r
      GROUP BY CASE WHEN h.b1 < r.t THEN 'L' ELSE 'R' END, h.b2
    )"""
    else:
        head = f"""{_bins1_cte(dialect)},
    root AS (
      SELECT t FROM cands ORDER BY {g} ASC, t LIMIT 1
    ),
    sided AS (
      SELECT /*+ BROADCAST(r) */
             CASE WHEN f.k1 < r.t * {BIN_W} THEN 'L' ELSE 'R' END AS side,
             {_idiv(dialect, 'f.k2', str(BIN_W))} AS b2,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(f.y) AS BIGINT) AS pos
      FROM feat f CROSS JOIN root r
      GROUP BY CASE WHEN f.k1 < r.t * {BIN_W} THEN 'L' ELSE 'R' END,
               {_idiv(dialect, 'f.k2', str(BIN_W))}
    )"""
    return f"""{head},
    cands2 AS (
      SELECT a.side, a.b2 AS t2,
             CAST(SUM(CASE WHEN c.b2 < a.b2 THEN c.n ELSE 0 END) AS BIGINT)
               AS nl,
             CAST(SUM(CASE WHEN c.b2 < a.b2 THEN c.pos ELSE 0 END) AS BIGINT)
               AS pl,
             CAST(SUM(CASE WHEN c.b2 >= a.b2 THEN c.n ELSE 0 END) AS BIGINT)
               AS nr,
             CAST(SUM(CASE WHEN c.b2 >= a.b2 THEN c.pos ELSE 0 END) AS BIGINT)
               AS pr
      FROM sided a JOIN sided c ON c.side = a.side
      WHERE a.b2 > 0
      GROUP BY a.side, a.b2
    ),
    bestchild AS (
      SELECT side, t2, nl, pl, nr, pr FROM (
        SELECT side, t2, nl, pl, nr, pr,
               ROW_NUMBER() OVER (PARTITION BY side
                                  ORDER BY {g} ASC, t2) AS rn
        FROM cands2
      ) x WHERE rn = 1
    )"""


def _depth2_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_depth2_ctes(dialect, staged)}
    SELECT side, 'lo' AS leaf, t2 AS child_threshold,
           nl AS n, pl AS pos,
           CASE WHEN 2 * pl > nl THEN 1 ELSE 0 END AS pred
    FROM bestchild
    UNION ALL
    SELECT side, 'hi', t2, nr, pr,
           CASE WHEN 2 * pr > nr THEN 1 ELSE 0 END
    FROM bestchild
    ORDER BY side, leaf
    """


@query("q629_depth2_tree", oracle=_depth2_sql("duck"))
def q629_depth2_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The greedy depth-2 tree: q626's root split on f1, then each
    side independently searches its own 63 f2 thresholds (per-side
    argmin = a rank window PARTITIONED by side). Four leaves with
    counts and majority predictions. ONE corpus pass total (the
    checkpointed 64x64 grid; root and sided are grid marginals)."""
    _hist2_view(spark, sf_dir)
    return spark.sql(_depth2_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q630 — oblivious vs greedy


def _oblivious_sql(dialect: str, staged: bool = False) -> str:
    g = _gini_terms("nl", "pl", "nr", "pr")
    return f"""
    WITH {_depth2_ctes(dialect, staged)},
    obl_cands AS (
      SELECT t2,
             {g.replace('nl', 'nl').replace('pl', 'pl')} AS imp
      FROM (
        SELECT a.b2 AS t2, a.side,
               CAST(SUM(CASE WHEN c.b2 < a.b2 THEN c.n ELSE 0 END) AS BIGINT)
                 AS nl,
               CAST(SUM(CASE WHEN c.b2 < a.b2 THEN c.pos ELSE 0 END)
                    AS BIGINT) AS pl,
               CAST(SUM(CASE WHEN c.b2 >= a.b2 THEN c.n ELSE 0 END) AS BIGINT)
                 AS nr,
               CAST(SUM(CASE WHEN c.b2 >= a.b2 THEN c.pos ELSE 0 END)
                    AS BIGINT) AS pr
        FROM sided a JOIN sided c ON c.side = a.side
        WHERE a.b2 > 0
        GROUP BY a.b2, a.side
      ) per_side
    ),
    obl AS (
      SELECT t2, SUM(imp) AS total_imp, CAST(COUNT(*) AS BIGINT) AS n_sides
      FROM obl_cands GROUP BY t2
      HAVING COUNT(*) = 2
    ),
    best_obl AS (
      SELECT t2, total_imp FROM obl ORDER BY total_imp ASC, t2 LIMIT 1
    ),
    greedy AS (
      SELECT SUM({g}) AS total_imp FROM bestchild
    )
    SELECT b.t2 AS oblivious_threshold,
           ROUND(b.total_imp, 6) AS oblivious_impurity,
           ROUND(g2.total_imp, 6) AS greedy_impurity,
           ROUND(b.total_imp - g2.total_imp, 6) AS oblivious_cost
    FROM best_obl b CROSS JOIN greedy g2
    """


@query("q630_oblivious_vs_greedy", oracle=_oblivious_sql("duck"))
def q630_oblivious_vs_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oblivious-tree tradeoff: force ONE f2 threshold on both
    root children (the CatBoost layer constraint, argmin of the
    summed per-side impurity over thresholds valid on both sides) vs
    q629's greedy per-child choice. oblivious_cost >= 0 by
    construction — the price of the vectorization-friendly layout."""
    _hist2_view(spark, sf_dir)
    return spark.sql(_oblivious_sql("spark", staged=True))
