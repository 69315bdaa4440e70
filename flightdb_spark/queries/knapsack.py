"""Budgeted-selection (knapsack) batch 174 (q937-q941) — the greedy
density knapsack that curation actually runs ("pick the best documents
that fit the token budget") with its LP certificate, over documents:
value = 1000 x distinct-token count (an integer quality proxy), weight
= token count, budget = {BUDGET} tokens.

The global greedy needs a cumulative sum over the density order —
the classic 100 TB cliff if done with a global window — so the Spark
side routes it through operators/prefix.py::bucketed_cumsum (the
scan-then-offset primitive built for exactly this; q59/q123 pattern),
while the oracle keeps the textbook global-window SQL. The total
order is the COMPOSITE (okey = -density micro-units, doc_id): doc_id
is the full-width unique tie-break column on both engines (Spark via
bucketed_cumsum's tie_col, SQL via ORDER BY okey, doc_id), so the
per-row cumulative is engine-deterministic over the entire doc_id
domain — no bit-packed key, hence no modulus collisions at scale.

- q937 greedy selection: items taken in integer-density order until
  the budget; count/weight/value/utilization;
- q938 the LP certificate: greedy value + fractional next item is an
  UPPER bound on any feasible selection — the gap is at most one
  item (integrality gap, test-asserted);
- q939 budget sensitivity: the same cumulative read at B/2, B, 2B;
- q940 per-source knapsacks: independent budgets per source — the
  partitioned variant needs only a source-partitioned window;
- q941 density-greedy vs value-greedy: the same budget under the two
  orderings — density never loses by more than the LP gap.

100 TB shape: one documents pass to (doc, weight, value); the global
cumulative is the bucketed two-pass scan (no single-task window on
the Spark side); everything after is 1-row or per-source bounded
aggregates.

Determinism: weights/values exact integers; density quantized to
integer micro-units; order keys unique; all outputs integer sums or
terminal ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.operators.prefix import bucketed_cumsum
from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

BUDGET = 20_000  # tokens
VAL_SCALE = 1000


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )


# ---------------------------------------------------------------------------
# shared item table


def _items_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w, v, dens_u, okey): exact integer weight/value/density
    and a UNIQUE ascending order key (smaller okey = better density)."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    df = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("w"),
        (F.size(F.array_distinct(toks)) * VAL_SCALE).cast("bigint").alias("v"),
    ).filter(F.col("w") > 0)
    # exact integer division (expr div): a double divide + cast would
    # truncate one off the oracle's // on exact-integer quotients
    dens = F.expr("v * 1000000 div w")
    # ascending key: high density first -> negate; doc_id is the
    # separate full-width tie-break column (never packed into okey)
    #
    # Round-9 note: checkpointing this table (bucketed_cumsum re-runs
    # its input lineage 3x) was measured and REJECTED — the split/
    # array_distinct tokenize is cheap enough at bench scale that the
    # eager materialization cost exceeded the saved re-runs on every
    # query in the family (q938 1.9->2.9 s, q939 1.5->2.2 s, q940
    # 0.7->1.1 s, q941 2.1->3.9 s count-action; guide §1 measure-first).
    return df.withColumn("dens_u", dens).withColumn("okey", -F.col("dens_u"))


_ITEMS_SQL = f"""items AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
             CAST(len(list_distinct(string_split(text, ' '))) * {VAL_SCALE}
               AS BIGINT) AS v
      FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ),
    keyed AS (
      SELECT doc_id, w, v,
             CAST(v * 1000000 // w AS BIGINT) AS dens_u,
             CAST(-(v * 1000000 // w) AS BIGINT) AS okey
      FROM items
    ),
    cum AS (
      SELECT doc_id, w, v, dens_u, okey,
             CAST(SUM(w) OVER (ORDER BY okey, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_w,
             CAST(SUM(v) OVER (ORDER BY okey, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_v
      FROM keyed
    )"""


def _cum_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the oracle's `cum` CTE, via bucketed_cumsum (no
    global window — the two-pass scan-then-offset primitive)."""
    return bucketed_cumsum(
        _items_df(spark, sf_dir), "okey", ["w", "v"], tie_col="doc_id"
    ).withColumnRenamed("cum_w", "cum_w").withColumnRenamed("cum_v", "cum_v")


# ---------------------------------------------------------------------------
# q937 — greedy selection

_Q937_SQL = f"""
    WITH {_ITEMS_SQL}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(w) AS BIGINT) AS total_weight,
           CAST(SUM(v) AS BIGINT) AS total_value,
           ROUND(CAST(SUM(w) AS DOUBLE) / {BUDGET}, 6) AS budget_utilization
    FROM cum WHERE cum_w <= {BUDGET}
    """


@query("q937_greedy_knapsack", oracle=_Q937_SQL)
def q937_greedy_knapsack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The density-greedy knapsack: documents in integer-density order
    until the token budget. The prefix sums come from bucketed_cumsum
    (operators/prefix.py) — two bounded passes, never a single-task
    global window; the oracle keeps the textbook window so the two
    formulations must agree."""
    cum = _cum_df(spark, sf_dir).filter(F.col("cum_w") <= BUDGET)
    return cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_selected"),
        F.sum("w").cast("bigint").alias("total_weight"),
        F.sum("v").cast("bigint").alias("total_value"),
        F.round(F.sum("w").cast("double") / BUDGET, 6).alias(
            "budget_utilization"
        ),
    )


# ---------------------------------------------------------------------------
# q938 — LP certificate

_Q938_SQL = f"""
    WITH {_ITEMS_SQL},
    taken AS (
      SELECT CAST(COALESCE(SUM(v), 0) AS BIGINT) AS greedy_v,
             CAST(COALESCE(SUM(w), 0) AS BIGINT) AS greedy_w
      FROM cum WHERE cum_w <= {BUDGET}
    ),
    nxt AS (
      SELECT v AS nv, w AS nw
      FROM cum WHERE cum_w > {BUDGET}
      ORDER BY okey, doc_id LIMIT 1
    )
    SELECT t.greedy_v,
           t.greedy_w,
           n.nv AS next_item_value,
           ROUND(t.greedy_v
                 + CAST(({BUDGET} - t.greedy_w) AS DOUBLE) * n.nv / n.nw,
                 4) AS lp_upper_bound,
           ROUND(CAST(t.greedy_v AS DOUBLE)
                 / (t.greedy_v
                    + CAST(({BUDGET} - t.greedy_w) AS DOUBLE) * n.nv / n.nw),
                 6) AS greedy_over_bound
    FROM taken t CROSS JOIN nxt n
    """


@query("q938_lp_certificate", oracle=_Q938_SQL)
def q938_lp_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LP-relaxation certificate: greedy value plus the FRACTIONAL
    next item upper-bounds every feasible selection (Dantzig), so
    greedy_over_bound is a per-run optimality guarantee — the gap is
    at most one item's value (test-asserted). Same cumulative, two
    1-row aggregates."""
    cum = _cum_df(spark, sf_dir)
    taken = cum.filter(F.col("cum_w") <= BUDGET).agg(
        F.coalesce(F.sum("v"), F.lit(0)).cast("bigint").alias("greedy_v"),
        F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("greedy_w"),
    )
    nxt = (
        cum.filter(F.col("cum_w") > BUDGET)
        .orderBy("okey", "doc_id")
        .limit(1)
        .select(F.col("v").alias("nv"), F.col("w").alias("nw"))
    )
    frac = (BUDGET - F.col("greedy_w")).cast("double") * F.col("nv") / F.col(
        "nw"
    )
    return taken.crossJoin(F.broadcast(nxt)).select(
        "greedy_v",
        "greedy_w",
        F.col("nv").alias("next_item_value"),
        F.round(F.col("greedy_v") + frac, 4).alias("lp_upper_bound"),
        F.round(
            F.col("greedy_v").cast("double") / (F.col("greedy_v") + frac), 6
        ).alias("greedy_over_bound"),
    )


# ---------------------------------------------------------------------------
# q939 — budget sensitivity


def _q939_sql() -> str:
    rows = []
    for label, b in (("a_half", BUDGET // 2), ("b_base", BUDGET), ("c_double", BUDGET * 2)):
        rows.append(f"""
      SELECT '{label}' AS budget_label,
             CAST({b} AS BIGINT) AS budget_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_selected,
             CAST(COALESCE(SUM(v), 0) AS BIGINT) AS total_value
      FROM cum WHERE cum_w <= {b}""")
    union = "\n      UNION ALL\n      ".join(rows)
    return f"""
    WITH {_ITEMS_SQL}
    SELECT * FROM (
      {union}
    ) u ORDER BY budget_label
    """


@query("q939_budget_sensitivity", oracle=_q939_sql())
def q939_budget_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-of-budget curve: the SAME cumulative read at half, base
    and double budget — concavity (diminishing returns per token) is
    the expected shape and is test-asserted. No recomputation per
    budget; just three filters of one prefix-scanned table."""
    cum = _cum_df(spark, sf_dir).localCheckpoint()
    outs = []
    for label, b in (
        ("a_half", BUDGET // 2),
        ("b_base", BUDGET),
        ("c_double", BUDGET * 2),
    ):
        outs.append(
            cum.filter(F.col("cum_w") <= b).agg(
                F.lit(label).alias("budget_label"),
                F.lit(b).cast("bigint").alias("budget_tokens"),
                F.count(F.lit(1)).cast("bigint").alias("n_selected"),
                F.coalesce(F.sum("v"), F.lit(0))
                .cast("bigint")
                .alias("total_value"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("budget_label")


# ---------------------------------------------------------------------------
# q940 — per-source knapsacks

SRC_BUDGET = 5_000

_Q940_SQL = f"""
    WITH items AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
             CAST(len(list_distinct(string_split(text, ' '))) * {VAL_SCALE}
               AS BIGINT) AS v
      FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ),
    keyed AS (
      SELECT doc_id, source, w, v,
             CAST(-(v * 1000000 // w) AS BIGINT) AS okey
      FROM items
    ),
    cum AS (
      SELECT source, doc_id, w, v,
             CAST(SUM(w) OVER (PARTITION BY source ORDER BY okey, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_w
      FROM keyed
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(w) AS BIGINT) AS tokens_used,
           CAST(SUM(v) AS BIGINT) AS total_value,
           ROUND(CAST(SUM(w) AS DOUBLE) / {SRC_BUDGET}, 6) AS utilization
    FROM cum WHERE cum_w <= {SRC_BUDGET}
    GROUP BY source
    ORDER BY source
    """


@query("q940_per_source_knapsack", oracle=_Q940_SQL)
def q940_per_source_knapsack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independent token budgets per source (the mix-balancing form of
    the curation knapsack): here the cumulative window PARTITIONS BY
    source, so no global scan is ever needed — the partitioned variant
    is cheap precisely where the global one needs the bucketed
    primitive."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    items = docs.select(
        "doc_id",
        "source",
        F.size(toks).cast("bigint").alias("w"),
        (F.size(F.array_distinct(toks)) * VAL_SCALE).cast("bigint").alias("v"),
    ).filter(F.col("w") > 0)
    keyed = items.withColumn("okey", -F.expr("v * 1000000 div w"))
    w = (
        Window.partitionBy("source")
        .orderBy("okey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = keyed.withColumn("cum_w", F.sum("w").over(w))
    return (
        cum.filter(F.col("cum_w") <= SRC_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_selected"),
            F.sum("w").cast("bigint").alias("tokens_used"),
            F.sum("v").cast("bigint").alias("total_value"),
            F.round(F.sum("w").cast("double") / SRC_BUDGET, 6).alias(
                "utilization"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q941 — density vs value greedy

_Q941_SQL = f"""
    WITH {_ITEMS_SQL},
    vkeyed AS (
      SELECT doc_id, w, v,
             CAST(-v AS BIGINT) AS vkey
      FROM keyed
    ),
    vcum AS (
      SELECT doc_id, w, v,
             CAST(SUM(w) OVER (ORDER BY vkey, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_w
      FROM vkeyed
    ),
    dv AS (
      SELECT CAST(COALESCE(SUM(v), 0) AS BIGINT) AS dens_value
      FROM cum WHERE cum_w <= {BUDGET}
    ),
    vv AS (
      SELECT CAST(COALESCE(SUM(v), 0) AS BIGINT) AS val_value
      FROM vcum WHERE cum_w <= {BUDGET}
    )
    SELECT d.dens_value, v.val_value,
           CAST(d.dens_value - v.val_value AS BIGINT) AS density_advantage,
           CAST(CASE WHEN d.dens_value >= v.val_value THEN 1 ELSE 0 END
             AS INT) AS density_wins
    FROM dv d CROSS JOIN vv v
    """


@query("q941_density_vs_value_greedy", oracle=_Q941_SQL)
def q941_density_vs_value_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two greedy orderings under the same budget: by density (the LP-
    optimal order) vs by raw value (the naive order that picks huge
    documents first). Both cumulatives run through bucketed_cumsum on
    the Spark side; density's advantage is the table's point."""
    items = _items_df(spark, sf_dir)  # checkpointed once, feeds BOTH orders
    dens = bucketed_cumsum(items, "okey", ["w", "v"], tie_col="doc_id")
    vcum = bucketed_cumsum(
        items.withColumn("vkey", -F.col("v")), "vkey", ["w"], tie_col="doc_id"
    )
    dv = dens.filter(F.col("cum_w") <= BUDGET).agg(
        F.coalesce(F.sum("v"), F.lit(0)).cast("bigint").alias("dens_value")
    )
    vv = vcum.filter(F.col("cum_w") <= BUDGET).agg(
        F.coalesce(F.sum("v"), F.lit(0)).cast("bigint").alias("val_value")
    )
    return dv.crossJoin(F.broadcast(vv)).select(
        "dens_value",
        "val_value",
        (F.col("dens_value") - F.col("val_value"))
        .cast("bigint")
        .alias("density_advantage"),
        F.when(F.col("dens_value") >= F.col("val_value"), 1)
        .otherwise(0)
        .cast("int")
        .alias("density_wins"),
    )
