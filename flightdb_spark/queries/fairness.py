"""Fairness-audit batch 69 (q412-q416): the group-fairness metrics a
model-governance review runs on any scored population — computed over
a deterministic synthetic scoring with a PLANTED group bias (group B's
scores are shifted down 150 mills while outcomes depend on the
unshifted signal, so every audit below has a real effect to find):

- q412 demographic parity + disparate impact: per-group selection
  rates, the parity gap, the min/max impact ratio, and the EEOC
  four-fifths-rule flag;
- q413 equalized odds: per-group TPR/FPR and their gaps (Hardt et al.
  2016) — the error-rate-balance view that parity alone misses;
- q414 group calibration: per-(group, decile) confidence vs outcome
  with per-group ECE contributions (the q398 machinery sliced by
  group — miscalibration that only hits one group is a fairness
  defect, not just a modeling one);
- q415 threshold sweep: parity gap and overall accuracy across a
  decision-threshold grid — the fairness/accuracy tradeoff curve a
  threshold choice is made from;
- q416 Kamiran-Calders reweighing: w(g,y) = P(g)P(y) / P(g,y)
  preprocessing weights, with the weighted outcome rates shown
  equalized across groups (the invariant the method guarantees).

Determinism: groups, scores, and outcomes are md5-derived integers;
every metric is exact integer counting with single terminal double
divisions; weighted sums accumulate 9-dp DECIMAL.

100 TB shapes: one map-side scoring pass into group/decile/threshold-
bounded aggregates; the threshold sweep explodes a literal grid over
the AGGREGATED (group, score-bucket) table, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

BIAS_SHIFT = 150  # mills subtracted from group B's observed score
DECISION_CUT = 500
THRESH_GRID = (300, 400, 500, 600, 700)


def _docs_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    ).createOrReplaceTempView("documents")


def _h(dialect: str, suffix: str) -> str:
    if dialect == "spark":
        return (
            f"CAST(conv(substring(md5(CAST(doc_id AS STRING) || '{suffix}'),"
            f" 1, 4), 16, 10) AS BIGINT)"
        )
    return (
        f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{suffix}'),"
        f" 1, 4))::BIGINT)"
    )


def _scored_cte(dialect: str) -> str:
    """The shared scored population: grp (A 2/3, B 1/3), raw signal,
    OBSERVED score (group B shifted down — the planted bias), outcome
    drawn against the RAW signal."""
    hg = _h(dialect, "_g")
    hs = _h(dialect, "_s")
    hy = _h(dialect, "_y")
    return f"""
    scored AS (
      SELECT doc_id,
             CASE WHEN ({hg}) % 3 = 0 THEN 'B' ELSE 'A' END AS grp,
             ({hs}) % 1000 AS raw,
             CASE WHEN ({hg}) % 3 = 0
                  THEN GREATEST(({hs}) % 1000 - {BIAS_SHIFT}, 0)
                  ELSE ({hs}) % 1000 END AS score,
             CASE WHEN ({hy}) % 1000 < ({hs}) % 1000 THEN 1 ELSE 0 END AS y
      FROM documents
    )"""


# ---------------------------------------------------------------------------
# q412 — demographic parity + disparate impact


def _parity_sql(dialect: str) -> str:
    return f"""
    WITH {_scored_cte(dialect)},
    rates AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN score >= {DECISION_CUT} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_selected
      FROM scored GROUP BY grp
    ),
    gaps AS (
      SELECT MAX(CAST(n_selected AS DOUBLE) / n) AS rmax,
             MIN(CAST(n_selected AS DOUBLE) / n) AS rmin
      FROM rates
    )
    SELECT r.grp, r.n, r.n_selected,
           ROUND(CAST(r.n_selected AS DOUBLE) / r.n, 6) AS selection_rate,
           ROUND(g.rmax - g.rmin, 6) AS parity_gap,
           ROUND(g.rmin / g.rmax, 6) AS disparate_impact_ratio,
           CASE WHEN g.rmin / g.rmax < 0.8 THEN 1 ELSE 0 END
             AS fails_four_fifths
    FROM rates r CROSS JOIN gaps g ORDER BY r.grp
    """


@query("q412_demographic_parity", oracle=_parity_sql("duck"))
def q412_demographic_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demographic parity audit at the production threshold: per-group
    selection rates, the absolute parity gap, the disparate-impact
    ratio (min rate / max rate), and the EEOC four-fifths-rule flag —
    the first table any fairness review opens. The planted -{BIAS_SHIFT}
    mill score shift on group B guarantees a real gap to detect
    (asserted in tests). One map-side scoring pass, 2-group rollup."""
    _docs_view(spark, sf_dir)
    return spark.sql(_parity_sql("spark"))


# ---------------------------------------------------------------------------
# q413 — equalized odds


def _eo_sql(dialect: str) -> str:
    return f"""
    WITH {_scored_cte(dialect)},
    cells AS (
      SELECT grp,
             CAST(SUM(CASE WHEN y = 1 AND score >= {DECISION_CUT}
                           THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN y = 0 AND score >= {DECISION_CUT}
                           THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg
      FROM scored GROUP BY grp
    ),
    gaps AS (
      SELECT MAX(CAST(tp AS DOUBLE) / pos) - MIN(CAST(tp AS DOUBLE) / pos)
               AS tpr_gap,
             MAX(CAST(fp AS DOUBLE) / neg) - MIN(CAST(fp AS DOUBLE) / neg)
               AS fpr_gap
      FROM cells
    )
    SELECT c.grp, c.pos, c.neg,
           ROUND(CAST(c.tp AS DOUBLE) / c.pos, 6) AS tpr,
           ROUND(CAST(c.fp AS DOUBLE) / c.neg, 6) AS fpr,
           ROUND(g.tpr_gap, 6) AS tpr_gap,
           ROUND(g.fpr_gap, 6) AS fpr_gap
    FROM cells c CROSS JOIN gaps g ORDER BY c.grp
    """


@query("q413_equalized_odds", oracle=_eo_sql("duck"))
def q413_equalized_odds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equalized-odds audit (Hardt et al. 2016): per-group true- and
    false-positive rates at the production threshold plus the cross-
    group gaps — error-rate balance, which a decision can violate even
    when selection rates are equal (and vice versa; that's why both
    q412 and this ship). The planted shift depresses group B's TPR by
    construction. Integer 2x2 cells per group, terminal divisions."""
    _docs_view(spark, sf_dir)
    return spark.sql(_eo_sql("spark"))


# ---------------------------------------------------------------------------
# q414 — group calibration


def _groupcal_sql(dialect: str) -> str:
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH {_scored_cte(dialect)},
    bins AS (
      SELECT grp, CAST(score {idiv} 100 AS INT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM(score) AS BIGINT) AS score_sum,
             CAST(SUM(y) AS BIGINT) AS hits
      FROM scored GROUP BY grp, 2
    ),
    tot AS (SELECT grp, CAST(SUM(n_b) AS BIGINT) AS n FROM bins GROUP BY grp)
    SELECT b.grp, b.bin, b.n_b,
           ROUND(CAST(b.score_sum AS DOUBLE) / 1000.0 / b.n_b, 6)
             AS avg_confidence,
           ROUND(CAST(b.hits AS DOUBLE) / b.n_b, 6) AS outcome_rate,
           ROUND(ABS(CAST(b.score_sum AS DOUBLE) / 1000.0 / b.n_b
                     - CAST(b.hits AS DOUBLE) / b.n_b) * b.n_b / t.n, 6)
             AS ece_contribution
    FROM bins b JOIN tot t ON t.grp = b.grp
    ORDER BY b.grp, b.bin
    """


@query("q414_group_calibration", oracle=_groupcal_sql("duck"))
def q414_group_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-group calibration: per (group, score decile) the mean
    stated confidence (score/1000) vs the realized outcome rate, with
    per-group ECE contributions — the fairness reading of calibration
    (a model can be calibrated on average while systematically
    under-predicting one group; here group B's shifted scores are
    UNDER-confident by construction while group A stays calibrated —
    asserted in tests). Exact BIGINT moments per cell; the q398
    machinery with a group key."""
    _docs_view(spark, sf_dir)
    return spark.sql(_groupcal_sql("spark"))


# ---------------------------------------------------------------------------
# q415 — threshold sweep


def _sweep_sql(dialect: str) -> str:
    grid = ", ".join(str(t) for t in THRESH_GRID)
    expl = (
        f"(SELECT explode(array({grid})) AS thr)"
        if dialect == "spark"
        else f"(SELECT unnest([{grid}]) AS thr)"
    )
    return f"""
    WITH {_scored_cte(dialect)},
    cells AS (
      -- bounded pre-aggregation: (group, score-centile) cells, so the
      -- grid explode below never touches corpus rows
      SELECT grp, score, y, COUNT(*) AS m,
             CAST(SUM(y) AS BIGINT) AS ys
      FROM scored GROUP BY grp, score, y
    ),
    sweep AS (
      SELECT g.thr, c.grp,
             CAST(SUM(c.m) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN c.score >= g.thr THEN c.m ELSE 0 END)
               AS BIGINT) AS sel,
             CAST(SUM(CASE WHEN (c.score >= g.thr AND c.y = 1)
                             OR (c.score < g.thr AND c.y = 0)
                           THEN c.m ELSE 0 END) AS BIGINT) AS correct
      FROM {expl} g CROSS JOIN cells c
      GROUP BY g.thr, c.grp
    )
    SELECT thr,
           ROUND(MAX(CAST(sel AS DOUBLE) / n)
                 - MIN(CAST(sel AS DOUBLE) / n), 6) AS parity_gap,
           ROUND(CAST(SUM(correct) AS DOUBLE) / SUM(n), 6) AS accuracy
    FROM sweep GROUP BY thr ORDER BY thr
    """


@query("q415_threshold_sweep", oracle=_sweep_sql("duck"))
def q415_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fairness/accuracy tradeoff curve: parity gap and overall
    decision accuracy at each threshold in the grid — the table a
    threshold choice (or per-group threshold argument) is actually
    made from. The corpus collapses to (group, score, y) cells FIRST;
    the literal grid explodes over that bounded table, so sweeping 5
    or 500 thresholds costs the same one corpus pass."""
    _docs_view(spark, sf_dir)
    return spark.sql(_sweep_sql("spark"))


# ---------------------------------------------------------------------------
# q416 — Kamiran-Calders reweighing


def _reweigh_sql(dialect: str) -> str:
    return f"""
    WITH {_scored_cte(dialect)},
    cells AS (
      SELECT grp, y, CAST(COUNT(*) AS BIGINT) AS n_gy
      FROM scored GROUP BY grp, y
    ),
    margins AS (
      SELECT CAST(SUM(n_gy) AS BIGINT) AS n FROM cells
    ),
    gm AS (SELECT grp, CAST(SUM(n_gy) AS BIGINT) AS n_g FROM cells GROUP BY grp),
    ym AS (SELECT y, CAST(SUM(n_gy) AS BIGINT) AS n_y FROM cells GROUP BY y),
    weights AS (
      SELECT c.grp, c.y, c.n_gy,
             CAST(gm.n_g AS DOUBLE) * ym.n_y / (m.n * c.n_gy) AS w
      FROM cells c
      JOIN gm ON gm.grp = c.grp
      JOIN ym ON ym.y = c.y
      CROSS JOIN margins m
    ),
    wrates AS (
      -- weighted outcome rate per group: sum(w*y*n)/sum(w*n) —
      -- reweighing makes this EQUAL across groups (= P(y=1))
      SELECT grp,
             CAST(SUM(CAST(ROUND(w * n_gy * y, 9) AS DECIMAL(38,9)))
                  AS DOUBLE)
             / CAST(SUM(CAST(ROUND(w * n_gy, 9) AS DECIMAL(38,9)))
                    AS DOUBLE) AS wrate
      FROM weights GROUP BY grp
    )
    SELECT w.grp, w.y, w.n_gy,
           ROUND(w.w, 6) AS weight,
           ROUND(r.wrate, 6) AS weighted_outcome_rate
    FROM weights w JOIN wrates r ON r.grp = w.grp
    ORDER BY w.grp, w.y
    """


@query("q416_reweighing", oracle=_reweigh_sql("duck"))
def q416_reweighing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kamiran-Calders reweighing: the preprocessing weights
    w(g,y) = P(g)P(y)/P(g,y) that make group and outcome independent
    in the weighted data — the output column every in-processing
    trainer consumes, with the verification built in: the weighted
    outcome rate per group (shown on every row) equals the marginal
    P(y=1) for BOTH groups (asserted exactly in tests). Four cells of
    exact integer counts; weights are single divisions."""
    _docs_view(spark, sf_dir)
    return spark.sql(_reweigh_sql("spark"))
