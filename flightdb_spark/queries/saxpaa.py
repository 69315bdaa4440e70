"""SAX / PAA batch 164 (q892-q896) — Piecewise Aggregate Approximation
and Symbolic Aggregate approXimation (Lin & Keogh 2003), the symbolic
time-series compression that turns numeric series into short words so
similarity becomes hash-joinable: the standard trick for motif
discovery and indexable similarity over billions of series.

Series under study: the daily revenue-cents series (global) and each
user's personal activity series.

- q892 PAA: the day spine split into W=16 equal spans, exact-cents
  segment means — the compressed series;
- q893 SAX symbols: z-normalized PAA means cut at the 4-letter
  Gaussian breakpoints (-0.6745, 0, 0.6745) -> one letter per segment;
- q894 per-user SAX words: every user's 4-segment word over their OWN
  event-value series — 150 series symbolized in one pass;
- q895 motif collisions: users sharing a word, with pair counts
  m(m-1)/2 computed from group sizes (NEVER a pair explosion);
- q896 reconstruction error: MAE/RMSE of the PAA-reconstructed daily
  series vs the actual — the information the compression discards.

100 TB shape: segment ids come from EXACT integer date arithmetic
against a 1-row broadcast span (no ordered spine, no global window);
everything downstream of the first aggregate is bounded (16 segments,
150 users, <= 256 words). Motif matching is group-size arithmetic on
the word key — the reason SAX exists at scale.

Determinism: day indexes and segment ids are exact integer arithmetic;
segment sums are integer cents; z-scores and error stats are doubles
built from identical integer inputs with per-term 6-dp rounding into
DECIMAL sums (DETERMINISM.md section 5); breakpoint compares share the
documented measure-zero boundary risk of identically-computed doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

W_SEG = 16
U_SEG = 4
BP = "-0.6745, 0.0, 0.6745"  # 4-letter Gaussian breakpoints


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _dd(d: str, a: str, b: str) -> str:
    """Whole days from date b to date a (a - b), dialected."""
    return f"datediff({a}, {b})" if d == "spark" else f"datediff('day', {b}, {a})"


def _idiv(d: str, a: str, b: str) -> str:
    return f"({a}) div ({b})" if d == "spark" else f"({a}) // ({b})"


def _daily_cte() -> str:
    return """daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    span AS (
      SELECT MIN(d) AS d0, MAX(d) AS d1,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily
    )"""


def _seg_expr(d: str, w: int) -> str:
    """Segment id 0..w-1 from exact integer day arithmetic."""
    idx = _dd(d, "a.d", "s.d0")
    span = _dd(d, "s.d1", "s.d0")
    return f"LEAST(CAST({_idiv(d, f'({idx}) * {w}', f'({span}) + 1')} AS BIGINT), {w - 1})"


def _paa_cte(d: str) -> str:
    return f"""{_daily_cte()},
    segged AS (
      SELECT /*+ BROADCAST(s) */ a.d, a.cents,
             {_seg_expr(d, W_SEG)} AS seg
      FROM daily a CROSS JOIN span s
    ),
    paa AS (
      SELECT seg,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(cents) AS BIGINT) AS seg_cents,
             CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS paa_mean
      FROM segged GROUP BY seg
    )"""


# ---------------------------------------------------------------------------
# q892 — PAA


def _q892_sql(d: str) -> str:
    return f"""
    WITH {_paa_cte(d)}
    SELECT seg, n_days, seg_cents,
           ROUND(paa_mean, 6) AS paa_mean_cents
    FROM paa ORDER BY seg
    """


@query("q892_paa_segments", oracle=_q892_sql("duckdb"))
def q892_paa_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise Aggregate Approximation of the daily revenue series:
    {W_SEG} equal date spans (segment id = exact integer day
    arithmetic against a 1-row broadcast span — no ordered spine, no
    window), each reduced to its exact-cents mean. The 16-number
    sketch downstream symbolic queries consume."""
    _views(spark, sf_dir)
    return spark.sql(_q892_sql("spark"))


# ---------------------------------------------------------------------------
# q893 — SAX symbols


def _sax_sym(z: str) -> str:
    b1, b2, b3 = (x.strip() for x in BP.split(","))
    return (
        f"CASE WHEN {z} < {b1} THEN 'a' WHEN {z} < {b2} THEN 'b' "
        f"WHEN {z} < {b3} THEN 'c' ELSE 'd' END"
    )


def _q893_sql(d: str) -> str:
    return f"""
    WITH {_paa_cte(d)},
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(seg_cents) AS BIGINT) AS s1d,
             CAST(SUM(n_days) AS BIGINT) AS nd,
             SUM(paa_mean) AS s1,
             SUM(paa_mean * paa_mean) AS s2
      FROM paa
    ),
    z AS (
      SELECT /*+ BROADCAST(m) */ p.seg, p.paa_mean,
             CASE WHEN m.s2 - m.s1 * m.s1 / m.k <= 0 THEN 0.0
                  ELSE (p.paa_mean - m.s1 / m.k)
                       / SQRT((m.s2 - m.s1 * m.s1 / m.k) / m.k)
             END AS zval
      FROM paa p CROSS JOIN mom m
    )
    SELECT seg,
           ROUND(paa_mean, 6) AS paa_mean_cents,
           ROUND(zval, 6) AS z,
           {_sax_sym("zval")} AS symbol
    FROM z ORDER BY seg
    """


@query("q893_sax_symbols", oracle=_q893_sql("duckdb"))
def q893_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX letters for the global daily series: z-normalize the PAA
    means against their own 16-value moments (population sd; constant
    series degrade to z=0), cut at the Gaussian 4-letter breakpoints.
    All doubles derive from identical integer sums on both engines;
    breakpoint boundaries carry only the documented measure-zero 1-ulp
    risk."""
    _views(spark, sf_dir)
    return spark.sql(_q893_sql("spark"))


# ---------------------------------------------------------------------------
# q894 — per-user SAX words


def _user_words_cte(d: str) -> str:
    """Per-user {U_SEG}-letter SAX word over the user's own event
    series (event-level, micros-exact segmentation)."""
    us = "unix_micros(ts)" if d == "spark" else "epoch_us(ts)"
    if d == "spark":
        word = (
            "array_join(transform(array_sort(collect_list("
            "struct(seg, sym))), x -> x.sym), '')"
        )
    else:
        word = "string_agg(sym, '' ORDER BY seg)"
    return f"""uspan AS (
      SELECT user_id,
             CAST(MIN({us}) AS BIGINT) AS t0,
             CAST(MAX({us}) - MIN({us}) + 1 AS BIGINT) AS w
      FROM events GROUP BY user_id
    ),
    usegged AS (
      SELECT e.user_id,
             CAST(LEAST(CAST(FLOOR((CAST({us} AS BIGINT) - s.t0)
                  * {U_SEG} / CAST(s.w AS DOUBLE)) AS BIGINT),
                  {U_SEG - 1}) AS BIGINT) AS seg,
             CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT) AS cents
      FROM events e JOIN uspan s ON s.user_id = e.user_id
    ),
    useg AS (
      SELECT user_id, seg,
             CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS m
      FROM usegged GROUP BY user_id, seg
    ),
    umom AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS k,
             SUM(m) AS s1, SUM(m * m) AS s2
      FROM useg GROUP BY user_id
    ),
    usym AS (
      SELECT g.user_id, g.seg,
             {_sax_sym(
                 "CASE WHEN m.s2 - m.s1 * m.s1 / m.k <= 0 THEN 0.0 "
                 "ELSE (g.m - m.s1 / m.k) "
                 "/ SQRT((m.s2 - m.s1 * m.s1 / m.k) / m.k) END"
             )} AS sym
      FROM useg g JOIN umom m ON m.user_id = g.user_id
    ),
    words AS (
      SELECT user_id, {word} AS word
      FROM usym GROUP BY user_id
    )"""


def _q894_sql(d: str) -> str:
    return f"""
    WITH {_user_words_cte(d)}
    SELECT word,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM words
    GROUP BY word
    ORDER BY n_users DESC, word
    """


@query("q894_user_sax_words", oracle=_q894_sql("duckdb"))
def q894_user_sax_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every user's activity series symbolized to a {U_SEG}-letter SAX
    word (personal time span, personal z-normalization — the shape of
    the series, not its level), then the word census. One shuffle onto
    user keys does segmentation + moments + letters; the census is
    bounded by 4^{U_SEG} = 256 possible words."""
    _views(spark, sf_dir)
    return spark.sql(_q894_sql("spark"))


# ---------------------------------------------------------------------------
# q895 — motif collisions


def _q895_sql(d: str) -> str:
    return f"""
    WITH {_user_words_cte(d)},
    census AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM words GROUP BY word
    ),
    tot AS (
      SELECT CAST(SUM(n_users * (n_users - 1) / 2) AS BIGINT) AS all_pairs
      FROM census
    )
    SELECT /*+ BROADCAST(t) */ c.word, c.n_users,
           CAST(c.n_users * (c.n_users - 1) / 2 AS BIGINT) AS n_pairs,
           ROUND(CAST(c.n_users * (c.n_users - 1) / 2 AS DOUBLE)
                 / NULLIF(t.all_pairs, 0), 6) AS pair_share
    FROM census c CROSS JOIN tot t
    WHERE c.n_users >= 2
    ORDER BY n_pairs DESC, c.word
    """


@query("q895_motif_collisions", oracle=_q895_sql("duckdb"))
def q895_motif_collisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Motif discovery by word collision: users whose series share a
    SAX word are candidate look-alikes. Pair counts come from group
    sizes (m(m-1)/2 — 2*(m choose 2) is even, so integer /2 is exact)
    — the n^2 never materializes, which is the entire point of
    symbolizing before matching."""
    _views(spark, sf_dir)
    return spark.sql(_q895_sql("spark"))


# ---------------------------------------------------------------------------
# q896 — reconstruction error


def _q896_sql(d: str) -> str:
    return f"""
    WITH {_paa_cte(d)},
    joined AS (
      SELECT g.seg, g.cents, p.paa_mean,
             ROUND(ABS(g.cents - p.paa_mean), 6) AS abs_err,
             ROUND((g.cents - p.paa_mean) * (g.cents - p.paa_mean), 6)
               AS sq_err
      FROM segged g JOIN paa p ON p.seg = g.seg
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(CAST(abs_err AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 4) AS mae_cents,
           ROUND(SQRT(CAST(SUM(CAST(sq_err AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*)), 4) AS rmse_cents,
           ROUND(MAX(abs_err), 4) AS max_abs_err_cents
    FROM joined
    """


@query("q896_paa_reconstruction", oracle=_q896_sql("duckdb"))
def q896_paa_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the compression discards: reconstruct each day as its
    segment's PAA mean and measure MAE / RMSE / max error in cents.
    Per-day error terms round at 6 dp into DECIMAL sums (engine-stable
    accumulation); the segment join broadcasts the 16-row PAA table."""
    _views(spark, sf_dir)
    return spark.sql(_q896_sql("spark"))
