"""Business-calendar batch 116 (q646-q650) — SLA clocks and
business-day arithmetic in CLOSED FORM (no calendar-spine explosion,
no per-day loop): with a Monday epoch, daynum d has weekday d mod 7
(0=Mon..6=Sun) and the number of business days in [epoch, d) is
ord(d) = 5*(d div 7) + LEAST(d mod 7, 5) — exact integers, so
business-minute clocks and +k-business-day offsets are O(1)
expressions a 100 TB scan evaluates map-side:

- q646 business-minute resolution clock: for each 'error' event, the
  business minutes (Mon-Fri 09:00-17:00) until the user's next
  event, via f(t) = ord(day)*480 + clamped intraday minutes;
- q647 SLA breach census: breaches of an 8-business-hour SLA per
  calendar day;
- q648 promise dates: order date + 3 business days by the ordinal
  inversion day(o) = 7*(o div 5) + o mod 5 — the promised-weekday
  census proves no promise ever lands on a weekend;
- q649 holiday adjustment: a literal holiday table shifts promises
  forward (two unrolled skip rounds); count adjusted promises;
- q650 working-hours heatmap: events by (weekday, hour) with the
  in-hours share — the load profile behind the SLA.

100 TB shape: every clock is a stateless map-side expression; the
only aggregates are the final census group-bys. The 'next event'
join in q646 is a per-user MIN chain (co-keyed). Epochs are chosen
per table (events: 2024-01-01; orders: 1995-01-02 — both Mondays)
so day arithmetic never goes negative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

BD_MINUTES = 480  # 09:00-17:00
SLA_MINUTES = 480
EVENTS_EPOCH = "2024-01-01"  # Monday
ORDERS_EPOCH = "1994-12-26"  # Monday BEFORE the first order date
# (orders start 1995-01-01, a Sunday — daynums must stay nonnegative:
# Spark div truncates toward zero while DuckDB // floors, so negative
# day arithmetic would diverge)
PROMISE_BDAYS = 3
HOLIDAYS = ("1995-01-16", "1995-05-29", "1995-09-04")  # Mondays


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("events", "orders"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _days(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _idiv(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def _daynum(dialect: str, ts: str, epoch: str) -> str:
    epoch_lit = "DATE '" + epoch + "'"
    day_expr = f"CAST({ts} AS DATE)"
    return f"CAST({_days(dialect, epoch_lit, day_expr)} AS BIGINT)"


def _ord(dialect: str, d: str) -> str:
    """Business days in [epoch, d): 5*(d div 7) + LEAST(d mod 7, 5)."""
    return f"(5 * {_idiv(dialect, d, '7')} + LEAST(({d}) % 7, 5))"


def _biz_minutes_f(dialect: str, ts: str, epoch: str) -> str:
    """f(t) = business minutes from epoch to t (piecewise-exact)."""
    d = _daynum(dialect, ts, epoch)
    mins = f"(hour({ts}) * 60 + minute({ts}))"
    intraday = (
        f"CASE WHEN ({d}) % 7 >= 5 THEN 0 "
        f"ELSE LEAST(GREATEST({mins} - 540, 0), {BD_MINUTES}) END"
    )
    return f"({_ord(dialect, d)} * {BD_MINUTES} + {intraday})"


# ---------------------------------------------------------------------------
# q646 — business-minute resolution clock


def _clock_sql(dialect: str) -> str:
    us = "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"
    f_open = _biz_minutes_f(dialect, "o.ts", EVENTS_EPOCH)
    f_close = _biz_minutes_f(dialect, "c.ts", EVENTS_EPOCH)
    return f"""
    WITH ev AS (SELECT user_id, event_id, event_type, ts, {us} AS tus
                FROM events),
    opens AS (
      SELECT user_id, event_id, ts, tus FROM ev WHERE event_type = 'error'
    ),
    nxt AS (
      SELECT o.user_id, o.event_id, MIN(c.tus) AS close_tus
      FROM opens o JOIN ev c
        ON c.user_id = o.user_id AND c.tus > o.tus
      GROUP BY o.user_id, o.event_id
    ),
    clocked AS (
      SELECT o.event_id,
             {f_close} - {f_open} AS biz_mins
      FROM opens o
      JOIN nxt n ON n.user_id = o.user_id AND n.event_id = o.event_id
      JOIN ev c ON c.user_id = o.user_id AND c.tus = n.close_tus
    )
    SELECT CAST({_idiv(dialect, 'biz_mins', '60')} AS BIGINT) AS biz_hours,
           CAST(COUNT(*) AS BIGINT) AS n_tickets,
           CAST(MIN(biz_mins) AS BIGINT) AS min_mins,
           CAST(MAX(biz_mins) AS BIGINT) AS max_mins
    FROM clocked
    GROUP BY {_idiv(dialect, 'biz_mins', '60')}
    ORDER BY biz_hours
    """


@query("q646_business_minute_clock", oracle=_clock_sql("duck"))
def q646_business_minute_clock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SLA clock: business minutes (Mon-Fri 09:00-17:00) from each
    'error' event to the same user's next event, via the closed-form
    prefix function f(t) — no calendar explosion, pure map-side
    integer arithmetic after a per-user MIN chain. Histogram by
    elapsed business hours."""
    _views(spark, sf_dir)
    return spark.sql(_clock_sql("spark"))


# ---------------------------------------------------------------------------
# q647 — SLA breach census


def _breach_sql(dialect: str) -> str:
    us = "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"
    f_open = _biz_minutes_f(dialect, "o.ts", EVENTS_EPOCH)
    f_close = _biz_minutes_f(dialect, "c.ts", EVENTS_EPOCH)
    return f"""
    WITH ev AS (SELECT user_id, event_id, event_type, ts, {us} AS tus
                FROM events),
    opens AS (
      SELECT user_id, event_id, ts, tus FROM ev WHERE event_type = 'error'
    ),
    nxt AS (
      SELECT o.user_id, o.event_id, MIN(c.tus) AS close_tus
      FROM opens o JOIN ev c
        ON c.user_id = o.user_id AND c.tus > o.tus
      GROUP BY o.user_id, o.event_id
    ),
    clocked AS (
      SELECT CAST(o.ts AS DATE) AS open_day,
             {f_close} - {f_open} AS biz_mins
      FROM opens o
      JOIN nxt n ON n.user_id = o.user_id AND n.event_id = o.event_id
      JOIN ev c ON c.user_id = o.user_id AND c.tus = n.close_tus
    )
    SELECT open_day,
           CAST(COUNT(*) AS BIGINT) AS n_tickets,
           CAST(SUM(CASE WHEN biz_mins > {SLA_MINUTES} THEN 1 ELSE 0 END)
                AS BIGINT) AS breaches,
           ROUND(CAST(SUM(CASE WHEN biz_mins > {SLA_MINUTES}
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS breach_rate
    FROM clocked
    GROUP BY open_day
    ORDER BY open_day
    """


@query("q647_sla_breach_census", oracle=_breach_sql("duck"))
def q647_sla_breach_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per open-day SLA breach census against an 8-business-hour
    target, on the same closed-form clock as q646 — the daily ops
    report. Weekend-opened tickets accrue zero clock until Monday
    09:00 by construction of f."""
    _views(spark, sf_dir)
    return spark.sql(_breach_sql("spark"))


# ---------------------------------------------------------------------------
# q648 — promise dates (+3 business days)


def _promise_core(dialect: str, k: int) -> str:
    """daynum of the k-th business day strictly after day d:
    o = ord(d+1) + k - 1; day(o) = 7*(o div 5) + o mod 5."""
    d1 = f"(dnum + 1)"
    o = f"({_ord(dialect, d1)} + {k} - 1)"
    return f"(7 * {_idiv(dialect, o, '5')} + ({o}) % 5)"


def _promise_sql(dialect: str) -> str:
    dnum = _daynum(dialect, "o_orderdate", ORDERS_EPOCH)
    return f"""
    WITH od AS (
      SELECT o_orderkey, {dnum} AS dnum FROM orders
    ),
    promised AS (
      SELECT o_orderkey, dnum,
             {_promise_core(dialect, PROMISE_BDAYS)} AS pday
      FROM od
    )
    SELECT CAST(pday % 7 AS BIGINT) AS promised_weekday,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(pday - dnum) AS BIGINT) AS min_calendar_gap,
           CAST(MAX(pday - dnum) AS BIGINT) AS max_calendar_gap
    FROM promised
    GROUP BY pday % 7
    ORDER BY promised_weekday
    """


@query("q648_promise_dates", oracle=_promise_sql("duck"))
def q648_promise_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order date + 3 business days in closed form: business ordinal
    o = ord(d+1)+2, inverted by day(o) = 7*(o div 5) + o mod 5. The
    promised-weekday census can only contain 0-4 (Mon-Fri) — the
    formula's correctness is visible in the output — and the calendar
    gap ranges 3..5 days (weekend spans)."""
    _views(spark, sf_dir)
    return spark.sql(_promise_sql("spark"))


# ---------------------------------------------------------------------------
# q649 — holiday adjustment


def _holiday_sql(dialect: str) -> str:
    dnum = _daynum(dialect, "o_orderdate", ORDERS_EPOCH)
    hol_dnums = ", ".join(
        "(" + _daynum(dialect, "DATE '" + h + "'", ORDERS_EPOCH) + ")"
        for h in HOLIDAYS
    )
    shift1 = _promise_core(dialect, 1).replace("(dnum + 1)", "(p1.pday + 1)")
    shift2 = _promise_core(dialect, 1).replace("(dnum + 1)", "(p2.pday1 + 1)")
    return f"""
    WITH hols(hd) AS (VALUES {hol_dnums}),
    od AS (SELECT o_orderkey, {dnum} AS dnum FROM orders),
    p1 AS (
      SELECT o_orderkey, dnum,
             {_promise_core(dialect, PROMISE_BDAYS)} AS pday
      FROM od
    ),
    p2 AS (
      SELECT /*+ BROADCAST(h) */ p1.o_orderkey, p1.dnum, p1.pday,
             CASE WHEN h.hd IS NULL THEN p1.pday ELSE {shift1} END AS pday1,
             CASE WHEN h.hd IS NULL THEN 0 ELSE 1 END AS shifted1
      FROM p1 LEFT JOIN hols h ON h.hd = p1.pday
    ),
    p3 AS (
      SELECT /*+ BROADCAST(h) */ p2.o_orderkey, p2.dnum, p2.shifted1,
             CASE WHEN h.hd IS NULL THEN p2.pday1 ELSE {shift2} END AS final_day,
             CASE WHEN h.hd IS NULL THEN 0 ELSE 1 END AS shifted2
      FROM p2 LEFT JOIN hols h ON h.hd = p2.pday1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(shifted1) AS BIGINT) AS shifted_once,
           CAST(SUM(shifted2) AS BIGINT) AS shifted_twice,
           CAST(SUM(CASE WHEN final_day % 7 >= 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS weekend_landings,
           CAST(MAX(final_day - dnum) AS BIGINT) AS max_calendar_gap
    FROM p3
    """


@query("q649_holiday_adjustment", oracle=_holiday_sql("duck"))
def q649_holiday_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holiday-aware promises: a literal holiday table (three 1995
    Monday holidays) shifts any promise landing on a holiday to the
    next business day, with a second unrolled round for back-to-back
    holidays. weekend_landings must be 0; the shift counts quantify
    holiday exposure. Holiday table broadcasts; everything else is
    map-side."""
    _views(spark, sf_dir)
    return spark.sql(_holiday_sql("spark"))


# ---------------------------------------------------------------------------
# q650 — working-hours heatmap


def _heatmap_sql(dialect: str) -> str:
    d = _daynum(dialect, "ts", EVENTS_EPOCH)
    return f"""
    SELECT CAST(({d}) % 7 AS BIGINT) AS weekday,
           CAST(hour(ts) AS BIGINT) AS hh,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(CASE WHEN ({d}) % 7 < 5
                          AND hour(ts) >= 9 AND hour(ts) < 17
                         THEN 1 ELSE 0 END) AS BIGINT) AS in_business_hours
    FROM events
    GROUP BY ({d}) % 7, hour(ts)
    ORDER BY weekday, hh
    """


@query("q650_working_hours_heatmap", oracle=_heatmap_sql("duck"))
def q650_working_hours_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (weekday x hour) event heatmap with the business-hours flag
    — the load profile that justifies (or indicts) the 09:00-17:00
    SLA window. Weekday from daynum mod 7 against the Monday epoch —
    engine dayofweek() conventions never enter."""
    _views(spark, sf_dir)
    return spark.sql(_heatmap_sql("spark"))
