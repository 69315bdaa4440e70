"""Unit-economics sensitivity batch 194 (q1037-q1041) — the
one-at-a-time tornado analysis, two-way grids, breakeven sweeps,
scenario waterfalls and discrete elasticities a margin model answers
with: which lever moves profit, and by how much.

The profit model is exact integer cents, built with the q257 money
idiom (ROUND(x, 6) -> DECIMAL(38,6) per row, DECIMAL SUM, FLOOR to
cents — never an integer-rounded double product):
  revenue  = sum round6(extprice * (1 - discount))        -> cents
  cogs     = 62% of gross extended price (literal rate)   -> cents
  shipping = 150c per quantity unit (literal rate)
  profit   = revenue - cogs - shipping
Scenario multipliers apply as integer percents with FLOOR division
((cents * pct) div 100 — dialect div/'//'), so every scenario profit
is an exact bigint and every comparison/argmax is integer arithmetic.

The one-row cents base is computed ONCE: the Spark side materializes
it (localCheckpoint -> temp view, the q812/cpm pattern) so the
literal scenario branches reference a leaf instead of re-scanning
lineitem; the oracle marks the same CTE AS MATERIALIZED.

- q1037 tornado: five drivers (volume, price, discount rate, cogs
  rate, shipping rate) swung to 90%/110%; per-driver swing ranked;
- q1038 two-way grid: price x volume over a literal 5x5 percent grid;
- q1039 breakeven sweep: per driver, first multiplier in the literal
  50..150 grid at which profit goes non-positive (-1 if never);
- q1040 scenario waterfall: pessimistic -> optimistic moving ONE
  driver at a time in a documented order; per-step profit deltas;
- q1041 elasticity ranking: discrete arc elasticity per driver over
  the +/-10% window as an exact rational, cross-product ranked.

100 TB shape: ONE lineitem scan to the one-row cents base; every
scenario/grid/sweep is literal-bounded arithmetic on that row.

Determinism: DECIMAL money sums; FLOOR percent multipliers; literal
grids; cross-product ranking; terminal doubles only for ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

COGS_PCT = 62
SHIP_CENTS = 150
DRIVERS = ["volume", "price", "discount", "cogs", "shipping"]
KW = {"volume": "vol", "price": "prc", "discount": "dsc",
      "cogs": "cgs", "shipping": "shp"}
WATERFALL = [("volume", 90, 110), ("price", 95, 105), ("discount", 110, 90),
             ("cogs", 105, 95), ("shipping", 110, 90)]

_BASE_SQL = """
      SELECT
        CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice, 2)
                            AS DECIMAL(38,6))) * 100) AS BIGINT) AS gross_c,
        CAST(FLOOR(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6)
                            AS DECIMAL(38,6))) * 100) AS BIGINT) AS rev_c,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem
"""


def _prep(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the one-row cents base once (q812 lesson)."""
    ensure_parallelism(load_table(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "lineitem"
    )
    spark.sql(_BASE_SQL).localCheckpoint(eager=True).createOrReplaceTempView(
        "uecon_base"
    )


def _head(d: str, *extra: str) -> tuple[str, str]:
    """(WITH-head, base table name) per dialect."""
    parts = list(extra)
    if d == "spark":
        base = "uecon_base"
    else:
        base = "base"
        parts.insert(0, f"base AS MATERIALIZED ({_BASE_SQL})")
    head = ("WITH " + ",\n    ".join(parts)) if parts else ""
    return head, base


def _profit(d: str, vol: str = "100", prc: str = "100", dsc: str = "100",
            cgs: str = "100", shp: str = "100") -> str:
    """Scenario profit in exact cents. Multipliers are integer
    percents; volume scales everything; price scales revenue and cogs
    (cogs is a rate on gross price); discount scales the discount GAP
    (gross - rev); cogs/shipping scale their own rates. All FLOOR
    integer division."""
    dv = "div" if d == "spark" else "//"
    rev = f"((b.gross_c - ((b.gross_c - b.rev_c) * {dsc}) {dv} 100) * {prc}) {dv} 100"
    cogs = f"(((b.gross_c * {COGS_PCT}) {dv} 100) * {prc} * {cgs}) {dv} 10000"
    ship = f"((b.qty * {SHIP_CENTS}) * {shp}) {dv} 100"
    return (
        f"((({rev}) * {vol}) {dv} 100"
        f" - (({cogs}) * {vol}) {dv} 100"
        f" - (({ship}) * {vol}) {dv} 100)"
    )


def _q1037_sql(d: str) -> str:
    cells = []
    for drv in DRIVERS:
        for pct in (90, 110):
            prof = _profit(d, **{KW[drv]: str(pct)})
            cells.append(
                f"SELECT '{drv}' AS driver, {pct} AS pct,"
                f" CAST({prof} AS BIGINT) AS profit_c FROM {{base}} b"
            )
    grid = "\n      UNION ALL ".join(cells)
    head, base = _head(
        d,
        f"scen AS (\n      {grid}\n    )",
        f"swing AS (\n      SELECT driver,\n"
        "             MIN(CASE WHEN pct = 90 THEN profit_c END) AS profit_low,\n"
        "             MIN(CASE WHEN pct = 110 THEN profit_c END) AS profit_high\n"
        "      FROM scen GROUP BY driver\n    )",
    )
    head = head.replace("{base}", base)
    return f"""
    {head}
    SELECT /*+ BROADCAST(b2) */ s.driver, s.profit_low, s.profit_high,
           ABS(s.profit_high - s.profit_low) AS swing_c,
           CAST(b2.base_profit AS BIGINT) AS base_profit_c,
           CAST(ROW_NUMBER() OVER (
             ORDER BY ABS(s.profit_high - s.profit_low) DESC, s.driver)
             AS INT) AS tornado_rank
    FROM swing s
    CROSS JOIN (SELECT CAST({_profit(d)} AS BIGINT) AS base_profit
                FROM {base} b) b2
    ORDER BY tornado_rank
    """


@query("q1037_tornado_swings", oracle=_q1037_sql("duckdb"))
def q1037_tornado_swings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tornado chart: profit at 90% and 110% of each driver, swing
    width and the rank ordering — exact integer cents over the
    materialized one-row base crossed with the literal driver grid."""
    _prep(spark, sf_dir)
    return spark.sql(_q1037_sql("spark"))


def _q1038_sql(d: str) -> str:
    pcts = [80, 90, 100, 110, 120]
    grid = ", ".join(f"({p}, {v})" for p in pcts for v in pcts)
    prof = _profit(d, vol="g.vol_pct", prc="g.prc_pct")
    head, base = _head(d, f"grid(prc_pct, vol_pct) AS (VALUES {grid})")
    return f"""
    {head}
    SELECT /*+ BROADCAST(b) */ g.prc_pct, g.vol_pct,
           CAST({prof} AS BIGINT) AS profit_c,
           CAST(CASE WHEN {prof} > 0 THEN 1 ELSE 0 END AS INT) AS profitable
    FROM grid g CROSS JOIN {base} b
    ORDER BY g.prc_pct, g.vol_pct
    """


@query("q1038_price_volume_grid", oracle=_q1038_sql("duckdb"))
def q1038_price_volume_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The price x volume sensitivity surface over the literal 5x5
    percent grid: scenario profit and profitability flag per cell —
    the two-way what-if table. One scan, 25 literal cells."""
    _prep(spark, sf_dir)
    return spark.sql(_q1038_sql("spark"))


def _q1039_sql(d: str) -> str:
    mults = list(range(50, 151, 10))
    grid = ", ".join(f"({m})" for m in mults)
    rows = []
    for drv in DRIVERS:
        prof = _profit(d, **{KW[drv]: "m.pct"})
        rows.append(
            f"SELECT /*+ BROADCAST(b) */ '{drv}' AS driver, m.pct,"
            f" CAST({prof} AS BIGINT) AS profit_c"
            f" FROM mgrid m CROSS JOIN {{base}} b"
        )
    sweeps = "\n      UNION ALL ".join(rows)
    head, base = _head(
        d,
        f"mgrid(pct) AS (VALUES {grid})",
        f"sweep AS (\n      {sweeps}\n    )",
    )
    head = head.replace("{base}", base)
    return f"""
    {head}
    SELECT driver,
           CAST(COALESCE(MIN(CASE WHEN profit_c <= 0 THEN pct END), -1)
             AS BIGINT) AS breakeven_pct,
           CAST(MIN(profit_c) AS BIGINT) AS min_profit_c,
           CAST(MAX(profit_c) AS BIGINT) AS max_profit_c
    FROM sweep
    GROUP BY driver
    ORDER BY driver
    """


@query("q1039_breakeven_sweep", oracle=_q1039_sql("duckdb"))
def q1039_breakeven_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breakeven sweep: walk each driver over the literal 50..150
    multiplier grid and report the first multiplier at which profit
    turns non-positive (-1 when the lever cannot sink the business
    alone), with the sweep extremes. Exact integer comparisons."""
    _prep(spark, sf_dir)
    return spark.sql(_q1039_sql("spark"))


def _q1040_sql(d: str) -> str:
    steps = []
    state = {KW[drv]: str(p) for drv, p, _ in WATERFALL}
    steps.append(("start_pessimistic", _profit(d, **state)))
    for drv, _, opt in WATERFALL:
        state = dict(state)
        state[KW[drv]] = str(opt)
        steps.append((f"move_{drv}", _profit(d, **state)))
    rows = "\n      UNION ALL ".join(
        f"SELECT {i} AS step_no, '{label}' AS step,"
        f" CAST({prof} AS BIGINT) AS profit_c FROM {{base}} b"
        for i, (label, prof) in enumerate(steps)
    )
    head, base = _head(d, f"path AS (\n      {rows}\n    )")
    head = head.replace("{base}", base)
    return f"""
    {head}
    SELECT step_no, step, profit_c,
           profit_c - LAG(profit_c, 1, profit_c)
             OVER (ORDER BY step_no) AS delta_c
    FROM path
    ORDER BY step_no
    """


@query("q1040_scenario_waterfall", oracle=_q1040_sql("duckdb"))
def q1040_scenario_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pessimistic-to-optimistic waterfall: move one driver at a
    time (documented literal order) and report each step's profit
    delta — the bridge chart between the two scenario totals. The LAG
    runs over the 6-row literal path."""
    _prep(spark, sf_dir)
    return spark.sql(_q1040_sql("spark"))


def _q1041_sql(d: str) -> str:
    rows = []
    for drv in DRIVERS:
        hi = _profit(d, **{KW[drv]: "110"})
        lo = _profit(d, **{KW[drv]: "90"})
        rows.append(
            f"SELECT '{drv}' AS driver,"
            f" CAST({hi} AS BIGINT) - CAST({lo} AS BIGINT) AS dprofit_c,"
            f" CAST({_profit(d)} AS BIGINT) AS base_c FROM {{base}} b"
        )
    grid = "\n      UNION ALL ".join(rows)
    head, base = _head(d, f"el AS (\n      {grid}\n    )")
    head = head.replace("{base}", base)
    return f"""
    {head}
    SELECT driver,
           dprofit_c AS elast_num,
           CAST(ABS(base_c) AS BIGINT) * 20 AS elast_den_x100,
           CAST(dprofit_c AS DOUBLE) * 100 / (ABS(base_c) * 20)
             AS arc_elasticity,
           CAST(ROW_NUMBER() OVER (
             ORDER BY ABS(dprofit_c * 100) DESC, driver) AS INT)
             AS elasticity_rank
    FROM el
    ORDER BY elasticity_rank
    """


@query("q1041_elasticity_ranking", oracle=_q1041_sql("duckdb"))
def q1041_elasticity_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete arc elasticity of profit to each driver over the
    +/-10% window, as an exact rational (num = profit difference in
    cents, den = 20% of |base profit|) with integer cross-product
    ranking — which lever is proportionally strongest."""
    _prep(spark, sf_dir)
    return spark.sql(_q1041_sql("spark"))
