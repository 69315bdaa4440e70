"""FIFO inventory-costing batch 135 (q741-q745) — layer-matching cost
accounting over the lineitem flow, the ledger a finance team closes
each period. Odd line numbers are receipts (inflows), even line
numbers are issues (outflows); both are ordered per part by
(ship date, order key, line number) — a total order — and FIFO
matches issue quantity against the oldest open receipt layers:

- q741 receipt-layer census per part: layers, quantities, exact
  weighted-average unit cost;
- q742 FIFO matching census: matched quantity, match count, unmet
  demand, and leftover supply per part;
- q743 cost of goods sold: per-brand COGS in exact micro-cents with
  the matched-quantity breakdown;
- q744 ending inventory valuation: per-brand leftover layer
  quantity and value at receipt cost;
- q745 holding-period aging: quantity-weighted days between receipt
  and issue for matched layers, by brand.

The FIFO match is the classic distributed prefix-range join: per
part, receipts and issues each get cumulative-quantity intervals
(layer i covers (cum_hi - qty, cum_hi]); matched quantity between
layer i and issue j is the 1-D interval overlap
LEAST(hi_i, hi_j) - GREATEST(lo_i, lo_j). No mutable running state,
no per-row loop — two partitioned prefix sums and one equi-join on
part with a range predicate.

100 TB shape: the prefix sums partition by part (operators/prefix.py
bucketed_cumsum is the same shape at cluster scale); the overlap
join is part-keyed so candidate pairs are bounded by per-part flow
counts (~30 at sf0.01), never a cross join. A part-bucketed layout
makes both the windows and the join shuffle-free (storage.py).

Determinism: quantities are exact integers; money quantized to
BIGINT cents at the source; unit cost in integer micro-cents via
FLOOR(cents * 1e4 / qty + 0.5) (exact-double or off-halfway on both
engines — the q666 money contract); every matched quantity and value
is BIGINT; terminal averages are exact integer ratios emitted
unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _days(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _flows_cte() -> str:
    """Receipts (odd linenumber) and issues (even) with prefix intervals."""
    return """flows AS (
      SELECT l_partkey AS part, l_shipdate AS d, l_orderkey AS ok,
             l_linenumber AS ln,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(FLOOR(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                  * CAST(10000 AS DOUBLE) / CAST(l_quantity AS BIGINT) + 0.5)
                  AS BIGINT) AS unit_mc,
             l_linenumber % 2 AS is_in
      FROM lineitem
      WHERE l_quantity > 0
    ),
    ins AS (
      SELECT part, d, ok, ln, qty, unit_mc,
             CAST(SUM(qty) OVER (PARTITION BY part ORDER BY d, ok, ln
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS hi
      FROM flows WHERE is_in = 1
    ),
    outs AS (
      SELECT part, d, ok, ln, qty,
             CAST(SUM(qty) OVER (PARTITION BY part ORDER BY d, ok, ln
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS hi
      FROM flows WHERE is_in = 0
    )"""


def _match_cte() -> str:
    """FIFO matches = interval overlaps between receipt and issue ranges."""
    return f"""{_flows_cte()},
    m AS (
      SELECT i.part,
             i.d AS in_d, o.d AS out_d,
             i.unit_mc,
             CAST(LEAST(i.hi, o.hi)
                  - GREATEST(i.hi - i.qty, o.hi - o.qty) AS BIGINT) AS mqty
      FROM ins i JOIN outs o
        ON o.part = i.part
       AND i.hi - i.qty < o.hi
       AND o.hi - o.qty < i.hi
    )"""


# ---------------------------------------------------------------------------
# q741 — receipt-layer census

_Q741_SQL = f"""
    WITH {_flows_cte()}
    SELECT part AS partkey,
           CAST(COUNT(*) AS BIGINT) AS n_layers,
           CAST(SUM(qty) AS BIGINT) AS total_in_qty,
           CAST(MIN(d) AS DATE) AS first_receipt,
           CAST(MAX(d) AS DATE) AS last_receipt,
           CAST(SUM(qty * unit_mc) AS BIGINT) AS supply_value_mc,
           CAST(SUM(qty * unit_mc) AS DOUBLE) / SUM(qty) AS wavg_unit_mc
    FROM ins
    GROUP BY part
    ORDER BY part
    """


@query("q741_receipt_layers", oracle=_Q741_SQL)
def q741_receipt_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part receipt-layer census: layer count, supplied quantity,
    receipt window, exact integer supply value, and the weighted
    average unit cost as an exact integer ratio. One part-partitioned
    prefix sum plus one aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_Q741_SQL)


# ---------------------------------------------------------------------------
# q742 — FIFO matching census

_Q742_SQL = f"""
    WITH {_match_cte()},
    sup AS (
      SELECT part, CAST(SUM(qty) AS BIGINT) AS in_qty FROM ins GROUP BY part
    ),
    dem AS (
      SELECT part, CAST(SUM(qty) AS BIGINT) AS out_qty FROM outs GROUP BY part
    ),
    mm AS (
      SELECT part, CAST(SUM(mqty) AS BIGINT) AS matched,
             CAST(COUNT(*) AS BIGINT) AS n_matches
      FROM m GROUP BY part
    )
    SELECT d.part AS partkey,
           COALESCE(s.in_qty, CAST(0 AS BIGINT)) AS in_qty,
           d.out_qty,
           COALESCE(mm.matched, CAST(0 AS BIGINT)) AS matched_qty,
           COALESCE(mm.n_matches, CAST(0 AS BIGINT)) AS n_matches,
           d.out_qty - COALESCE(mm.matched, CAST(0 AS BIGINT)) AS unmet_demand,
           COALESCE(s.in_qty, CAST(0 AS BIGINT))
             - COALESCE(mm.matched, CAST(0 AS BIGINT)) AS leftover_supply
    FROM dem d
    LEFT JOIN sup s ON s.part = d.part
    LEFT JOIN mm ON mm.part = d.part
    ORDER BY d.part
    """


@query("q742_fifo_match_census", oracle=_Q742_SQL)
def q742_fifo_match_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part FIFO matching: issued quantity matched against receipt
    layers via the prefix-interval overlap join; unmet demand is issue
    range beyond total supply, leftover supply the reverse. The
    invariant matched <= min(in, out) is test-asserted."""
    _views(spark, sf_dir)
    return spark.sql(_Q742_SQL)


# ---------------------------------------------------------------------------
# q743 — COGS by brand

_Q743_SQL = f"""
    WITH {_match_cte()}
    SELECT p.p_brand AS brand,
           CAST(SUM(m.mqty) AS BIGINT) AS sold_qty,
           CAST(SUM(m.mqty * m.unit_mc) AS BIGINT) AS cogs_mc,
           CAST(SUM(m.mqty * m.unit_mc) AS DOUBLE) / SUM(m.mqty)
             AS avg_unit_cost_mc
    FROM m JOIN part p ON p.p_partkey = m.part
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """


@query("q743_fifo_cogs", oracle=_Q743_SQL)
def q743_fifo_cogs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost of goods sold under FIFO, rolled up to brand: matched
    quantity times the RECEIPT layer's unit cost, exact BIGINT
    micro-cents, with the average unit cost as a terminal exact
    ratio."""
    _views(spark, sf_dir)
    return spark.sql(_Q743_SQL)


# ---------------------------------------------------------------------------
# q744 — ending inventory valuation

_Q744_SQL = f"""
    WITH {_flows_cte()},
    dem AS (
      SELECT part, CAST(SUM(qty) AS BIGINT) AS out_qty FROM outs GROUP BY part
    ),
    left_layers AS (
      SELECT i.part, i.unit_mc,
             CAST(i.hi - GREATEST(i.hi - i.qty,
                  LEAST(i.hi, COALESCE(d.out_qty, CAST(0 AS BIGINT))))
                  AS BIGINT) AS left_qty
      FROM ins i LEFT JOIN dem d ON d.part = i.part
    )
    SELECT p.p_brand AS brand,
           CAST(SUM(l.left_qty) AS BIGINT) AS inventory_qty,
           CAST(SUM(l.left_qty * l.unit_mc) AS BIGINT) AS inventory_value_mc,
           CAST(SUM(CASE WHEN l.left_qty > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS open_layers
    FROM left_layers l JOIN part p ON p.p_partkey = l.part
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """


@query("q744_ending_inventory", oracle=_Q744_SQL)
def q744_ending_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ending inventory under FIFO by brand: each receipt layer's
    unconsumed remainder (its interval beyond total issued quantity)
    valued at receipt cost. leftover(q742) == inventory_qty is the
    cross-query invariant the test asserts."""
    _views(spark, sf_dir)
    return spark.sql(_Q744_SQL)


# ---------------------------------------------------------------------------
# q745 — holding-period aging

def _q745_sql(dialect: str) -> str:
    return f"""
    WITH {_match_cte()}
    SELECT p.p_brand AS brand,
           CAST(SUM(m.mqty) AS BIGINT) AS matched_qty,
           CAST(SUM(m.mqty * CAST({_days(dialect, 'm.in_d', 'm.out_d')}
                AS BIGINT)) AS BIGINT) AS qty_days,
           CAST(SUM(m.mqty * CAST({_days(dialect, 'm.in_d', 'm.out_d')}
                AS BIGINT)) AS DOUBLE) / SUM(m.mqty) AS avg_holding_days,
           CAST(SUM(CASE WHEN {_days(dialect, 'm.in_d', 'm.out_d')} < 0
                         THEN m.mqty ELSE 0 END) AS BIGINT)
             AS backordered_qty
    FROM m JOIN part p ON p.p_partkey = m.part
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """


@query("q745_holding_period", oracle=_q745_sql("duckdb"))
def q745_holding_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted holding period (receipt date to issue date)
    for FIFO-matched layers, by brand; negative-day quantity surfaces
    issues FIFO-matched to receipts that ship later (backorders under
    the line-parity flow model) rather than hiding them in the mean."""
    _views(spark, sf_dir)
    return spark.sql(_q745_sql("spark"))
