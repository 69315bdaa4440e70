"""Decision-curve batch 186 (q997-q1001) — net-benefit analysis
(Vickers-Elkin 2006) and threshold economics for a probabilistic
classifier: the clinical/ops framework that answers "at which risk
threshold is ACTING on the model better than treat-all or
treat-none?". Reuses q398's deterministic planted scorer (md5-derived
per-mill score s and outcome hitting at rate s) so the curve has known
shape and both engines see identical integers.

Thresholds are exact rationals t = t20/20 (t20 in 1..19); every
classification test is the integer cross-product s_mill * 20 >=
t20 * 1000, and every net-benefit value is carried as an exact
num/den rational until one terminal double:

  NB(t) = TP/N - FP/N * t/(1-t)
        = (TP*(20-t20) - FP*t20) / (N*(20-t20))

- q997 confusion table per threshold (TP/FP/FN/TN, sensitivity and
  specificity as terminal doubles);
- q998 the decision curve: model NB vs treat-all NB vs treat-none
  (zero) per threshold, all exact rationals;
- q999 the operating point: the threshold maximizing NB (exact
  cross-product argmax with t20 tie-break) and its margin over both
  default strategies;
- q1000 expected utility with a literal cost matrix in cents
  (u_tp/u_fp/u_fn/u_tn), argmax threshold — the money view of q999;
- q1001 prevalence sensitivity: standardized NB(pi) over a literal
  prevalence grid at fixed thresholds — where the operating point
  moves when the base rate shifts (deployment-population drift).

100 TB shape: ONE documents pass to the 19-row (threshold x
confusion) aggregate via a literal threshold grid crossed map-side;
everything after is literal-bounded. No windows over facts.

Determinism: md5-derived integers; cross-product thresholding;
num/den rationals; literal cost/prevalence grids; terminal doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

T20S = list(range(1, 20))
U_TP, U_FP, U_FN, U_TN = 10_000, -3_000, -8_000, 500  # cents
PREV10 = [1, 3, 5, 7, 9]  # prevalence grid pi = p10/10
Q1001_T20S = [4, 8, 12, 16]


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )


def _hash_mill(d: str, salt: str) -> str:
    if d == "spark":
        return (
            f"cast(conv(substring(md5(concat(cast(doc_id as string), "
            f"'_{salt}')), 1, 4), 16, 10) as bigint) % 1000"
        )
    return (
        f"(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_{salt}'), 1, 4))"
        f"::BIGINT) % 1000"
    )


def _conf_cte(d: str) -> str:
    grid = ", ".join(f"({t})" for t in T20S)
    return f"""scored AS (
      SELECT doc_id,
             {_hash_mill(d, 's')} AS s_mill,
             {_hash_mill(d, 'o')} AS o_mill
      FROM documents
    ),
    lab AS (
      SELECT s_mill,
             CASE WHEN o_mill < s_mill THEN 1 ELSE 0 END AS y
      FROM scored
    ),
    tgrid(t20) AS (VALUES {grid}),
    conf AS (
      SELECT g.t20,
             CAST(SUM(CASE WHEN l.s_mill * 20 >= g.t20 * 1000
                  AND l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN l.s_mill * 20 >= g.t20 * 1000
                  AND l.y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN l.s_mill * 20 < g.t20 * 1000
                  AND l.y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN l.s_mill * 20 < g.t20 * 1000
                  AND l.y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM lab l CROSS JOIN tgrid g
      GROUP BY g.t20
    )"""


def _q997_sql(d: str) -> str:
    return f"""
    WITH {_conf_cte(d)}
    SELECT t20, tp, fp, fn, tn,
           CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0) AS sensitivity,
           CAST(tn AS DOUBLE) / NULLIF(tn + fp, 0) AS specificity
    FROM conf ORDER BY t20
    """


@query("q997_threshold_confusion", oracle=_q997_sql("duckdb"))
def q997_threshold_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The confusion table at every t20/20 threshold: one fact pass
    crossed with the 19-row literal grid (map-side), integer counts,
    terminal-double sensitivity/specificity. The base every
    decision-curve row below reads."""
    _views(spark, sf_dir)
    return spark.sql(_q997_sql("spark"))


def _q998_sql(d: str) -> str:
    return f"""
    WITH {_conf_cte(d)}
    SELECT t20,
           CAST(tp * (20 - t20) - fp * t20 AS BIGINT) AS nb_model_num,
           CAST((tp + fn) * (20 - t20) - (fp + tn) * t20 AS BIGINT)
             AS nb_all_num,
           CAST((tp + fp + fn + tn) * (20 - t20) AS BIGINT) AS nb_den,
           CAST(tp * (20 - t20) - fp * t20 AS DOUBLE)
             / ((tp + fp + fn + tn) * (20 - t20)) AS nb_model,
           CAST((tp + fn) * (20 - t20) - (fp + tn) * t20 AS DOUBLE)
             / ((tp + fp + fn + tn) * (20 - t20)) AS nb_treat_all
    FROM conf ORDER BY t20
    """


@query("q998_decision_curve", oracle=_q998_sql("duckdb"))
def q998_decision_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision curve: the model's net benefit vs treat-all
    (treat-none is identically zero) at each threshold, carried as
    exact integer num/den rationals with one terminal double — the
    plot that justifies deploying a classifier in a workflow at all."""
    _views(spark, sf_dir)
    return spark.sql(_q998_sql("spark"))


def _q999_sql(d: str) -> str:
    return f"""
    WITH {_conf_cte(d)},
    nb AS (
      SELECT t20,
             CAST(tp * (20 - t20) - fp * t20 AS BIGINT) AS num,
             CAST((tp + fn) * (20 - t20) - (fp + tn) * t20 AS BIGINT)
               AS num_all,
             CAST((tp + fp + fn + tn) * (20 - t20) AS BIGINT) AS den
      FROM conf
    ),
    best AS (
      -- exact-rational argmax: a beats b iff num_a*den_b > num_b*den_a;
      -- implemented as "no other threshold strictly beats me", lowest
      -- t20 among maximizers
      SELECT a.t20, a.num, a.num_all, a.den
      FROM nb a
      WHERE NOT EXISTS (
        SELECT 1 FROM nb b
        WHERE b.num * a.den > a.num * b.den
           OR (b.num * a.den = a.num * b.den AND b.t20 < a.t20)
      )
    )
    SELECT t20 AS best_t20,
           CAST(num AS DOUBLE) / den AS nb_model,
           CAST(num_all AS DOUBLE) / den AS nb_treat_all,
           CAST(num - num_all AS DOUBLE) / den AS margin_over_all,
           CAST(num AS DOUBLE) / den AS margin_over_none
    FROM best
    """


@query("q999_operating_point", oracle=_q999_sql("duckdb"))
def q999_operating_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The net-benefit-optimal threshold by EXACT rational comparison
    (num_a*den_b cross-products — fractions with different
    denominators never become doubles before the argmax), with its
    margins over treat-all and treat-none."""
    _views(spark, sf_dir)
    return spark.sql(_q999_sql("spark"))


def _q1000_sql(d: str) -> str:
    return f"""
    WITH {_conf_cte(d)}
    SELECT t20,
           CAST({U_TP} * tp + {U_FP} * fp + {U_FN} * fn + {U_TN} * tn
             AS BIGINT) AS utility_cents,
           CAST(CASE WHEN {U_TP} * tp + {U_FP} * fp + {U_FN} * fn
                  + {U_TN} * tn
                  = (SELECT MAX({U_TP} * c2.tp + {U_FP} * c2.fp
                       + {U_FN} * c2.fn + {U_TN} * c2.tn) FROM conf c2)
                THEN 1 ELSE 0 END AS INT) AS is_optimal
    FROM conf ORDER BY t20
    """


@query("q1000_utility_curve", oracle=_q1000_sql("duckdb"))
def q1000_utility_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected utility per threshold under a literal cents cost
    matrix (reward TP, charge FP/FN, small TN credit) — the money
    translation of the decision curve; the flagged row is the
    threshold a cost-aware deployment picks. Pure integer arithmetic
    end to end."""
    _views(spark, sf_dir)
    return spark.sql(_q1000_sql("spark"))


def _q1001_sql(d: str) -> str:
    pgrid = ", ".join(f"({p})" for p in PREV10)
    tsel = ", ".join(str(t) for t in Q1001_T20S)
    return f"""
    WITH {_conf_cte(d)},
    pgrid(p10) AS (VALUES {pgrid}),
    sel AS (SELECT * FROM conf WHERE t20 IN ({tsel})),
    sweep AS (
      SELECT s.t20, p.p10,
             -- standardized NB(pi) = pi*sens - (1-pi)*fpr*t/(1-t), as
             -- the exact rational
             -- (p10*tp*(fp+tn)*(20-t20) - (10-p10)*fp*(tp+fn)*t20)
             --   / (10*(tp+fn)*(fp+tn)*(20-t20))
             CAST(p.p10 * s.tp * (s.fp + s.tn) * (20 - s.t20)
               - (10 - p.p10) * s.fp * (s.tp + s.fn) * s.t20 AS BIGINT)
               AS nb_num,
             CAST(10 * (s.tp + s.fn) * (s.fp + s.tn) * (20 - s.t20)
               AS BIGINT) AS nb_den
      FROM sel s CROSS JOIN pgrid p
    )
    SELECT t20, p10,
           nb_num, nb_den,
           CAST(nb_num AS DOUBLE) / nb_den AS nb_standardized
    FROM sweep ORDER BY t20, p10
    """


@query("q1001_prevalence_sweep", oracle=_q1001_sql("duckdb"))
def q1001_prevalence_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prevalence-standardized net benefit over a literal base-rate
    grid at four thresholds: sensitivity/FPR stay the sample's, the
    prevalence reweights them — where the operating point moves when
    the deployment population shifts. Exact rationals (BIGINT
    cross-products), terminal doubles."""
    _views(spark, sf_dir)
    return spark.sql(_q1001_sql("spark"))
