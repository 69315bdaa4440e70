"""Source-coding batch 134 (q736-q740) — entropy coding analytics
over the event stream and the brand alphabet, the sizing math a
storage/telemetry team runs before picking a dictionary encoding:

- q736 symbol census: event-type frequencies, exact integer Shannon
  code lengths (smallest k with w*2^k >= total — no float log in the
  length), and 9dp-quantized surprisal bits;
- q737 Huffman merge trace: the four greedy merges that build the
  optimal prefix tree over the 5-symbol event alphabet, unrolled as
  chained CTEs (the IRV/q728 pattern);
- q738 Huffman codebook: per-symbol code length (= merge depth),
  weighted bit contribution, and the Kraft term scaled by 2^4;
- q739 one-row compression summary: Huffman total bits vs 3-bit
  fixed width, average code length vs the entropy lower bound,
  redundancy, and the exact Kraft sum (16/16 for a full tree);
- q740 brand-alphabet Shannon census: 25 symbols weighted by
  lineitem frequency, integer Shannon lengths, Kraft slack at 2^20
  scale, per-symbol fixed-width (5-bit) savings.

100 TB shape: ONE aggregate pass collapses the stream to a <=25-row
frequency table (map-side combine does all the work); every tree /
length computation runs on that bounded table. Merge rounds use
ORDER BY .. LIMIT 2 scalar pulls (TakeOrdered), never a global
window. Code lengths are integer comparisons (w * 2^k >= t in
BIGINT), so no engine's log2 rounding can flip a length.

Determinism: merge ties break by (weight ASC, cluster ASC) over
integer weights and symbol strings — a total order defining THE
canonical tree on both engines; entropies accumulate 9dp-rounded
terms in DECIMAL(38,9) (q602 contract); expected lengths are exact
integer ratios emitted as terminal unrounded doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

N_SYM = 5  # distinct event types in the synthetic stream
MAX_LEN_BITS = 20  # Shannon-length search ceiling (2^20 * w >= t always)


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _views_part(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "lineitem"
    )
    ensure_parallelism(load_table(spark, sf_dir, "part")).createOrReplaceTempView(
        "part"
    )


def _shannon_len(w: str, t: str) -> str:
    """Smallest k in [0, MAX_LEN_BITS] with w * 2^k >= t — pure BIGINT."""
    cases = "\n".join(
        f"WHEN {w} * CAST({1 << k} AS BIGINT) >= {t} THEN CAST({k} AS BIGINT)"
        for k in range(MAX_LEN_BITS + 1)
    )
    return f"CASE {cases} ELSE CAST({MAX_LEN_BITS} AS BIGINT) END"


def _freq_cte() -> str:
    return """freq AS (
      SELECT event_type AS sym, CAST(COUNT(*) AS BIGINT) AS w
      FROM events GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS t FROM freq)"""


# --- Spark-side staging (oracle strings keep the single-statement CTE
# form; DuckDB materializes CTEs natively) -----------------------------------
#
# Catalyst inlines CTEs per reference, and the unrolled Huffman chain
# references each level 2-3x (c{k-1} in the survivor filter AND the
# union, pair{k} three times in s{k}) — so the `freq` events aggregate
# re-expanded near-exponentially: q739's before plan held 224 parquet
# scans / 582 Exchanges (plans/r09/q739_compression_summary_before.txt).
# The fix is the markovattr pattern (guide §2.4 + §4.2): materialize the
# <=5-row freq table once, replay the bounded greedy merges in ONE
# in-process pass with exact Python ints (weights are BIGINT counts;
# cluster labels are ASCII event types, so Python tuple sort == the SQL
# ORDER BY w ASC, cluster ASC), and keep every float expression (LOG2
# entropy) in Spark SQL over the materialized views.

_FREQ_VIEW = "coding_freq_mv"
_HUFF_VIEW = "coding_huff_mv"


def _freq_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE events aggregate -> checkpointed (sym, w) view."""
    _views(spark, sf_dir)
    df = spark.sql(f"WITH {_freq_cte()} SELECT sym, w FROM freq")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_FREQ_VIEW)


def _huffman_replay(pairs: list[tuple[str, int]]):
    """Replay the N_SYM-1 unrolled merge CTEs exactly: pair{k} = ORDER BY
    w ASC, cluster ASC LIMIT 2 over c{k-1}; newc{k} = (MIN cluster,
    SUM w); members of merged clusters gain one depth. Returns
    (trace rows, per-sym depth) — all exact Python-int arithmetic,
    including the degenerate <2-cluster rounds (LIMIT 2 then yields one
    row and the SQL keeps deepening its members), so tiny SFs match."""
    c = {s: int(w) for s, w in pairs}
    member = {s: s for s, _ in pairs}
    depth = {s: 0 for s, _ in pairs}
    trace = []
    for k in range(1, N_SYM):
        pair = sorted(c.items(), key=lambda t: (t[1], t[0]))[:2]
        pcl = {cl for cl, _ in pair}
        newc = min(pcl)
        neww = sum(w for _, w in pair)
        for cl in pcl:
            del c[cl]
        c[newc] = neww
        for s, cl in member.items():
            if cl in pcl:
                member[s] = newc
                depth[s] += 1
        trace.append((k, min(pcl), max(pcl), neww))
    return trace, depth


def _huff_pandas(key, pdf):  # pragma: no cover - runs on executors
    import pandas as pd

    _, depth = _huffman_replay(list(zip(pdf["sym"], pdf["w"])))
    rows = [(s, int(w), depth[s]) for s, w in zip(pdf["sym"], pdf["w"])]
    return pd.DataFrame(rows, columns=["sym", "w", "depth"])


def _trace_pandas(key, pdf):  # pragma: no cover - runs on executors
    import pandas as pd

    trace, _ = _huffman_replay(list(zip(pdf["sym"], pdf["w"])))
    return pd.DataFrame(
        trace, columns=["round", "left_cluster", "right_cluster", "merged_weight"]
    )


def _huff_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the (sym, w, depth) codebook — the exact `s{N-1} JOIN
    freq` table of the unrolled chain — via one bounded Arrow pass."""
    from pyspark.sql import functions as F

    _freq_view(spark, sf_dir)
    huff = (
        spark.table(_FREQ_VIEW)
        .withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(_huff_pandas, "sym string, w bigint, depth bigint")
    )
    huff.localCheckpoint(eager=True).createOrReplaceTempView(_HUFF_VIEW)


def _huffman_ctes() -> str:
    """N_SYM-1 unrolled greedy merges; s{k} carries (sym, cluster, depth)."""
    parts = [
        _freq_cte(),
        """c0 AS (SELECT sym AS cluster, w FROM freq),
    s0 AS (SELECT sym, sym AS cluster, CAST(0 AS BIGINT) AS depth FROM freq)""",
    ]
    for k in range(1, N_SYM):
        parts.append(
            f"""pair{k} AS (
      SELECT cluster, w FROM c{k - 1} ORDER BY w ASC, cluster ASC LIMIT 2
    ),
    newc{k} AS (
      SELECT MIN(cluster) AS cluster, CAST(SUM(w) AS BIGINT) AS w FROM pair{k}
    ),
    c{k} AS (
      SELECT cluster, w FROM c{k - 1}
      WHERE cluster NOT IN (SELECT cluster FROM pair{k})
      UNION ALL
      SELECT cluster, w FROM newc{k}
    ),
    s{k} AS (
      SELECT s.sym,
             CASE WHEN s.cluster IN (SELECT cluster FROM pair{k})
                  THEN (SELECT cluster FROM newc{k}) ELSE s.cluster END
               AS cluster,
             s.depth + CASE WHEN s.cluster IN (SELECT cluster FROM pair{k})
                            THEN 1 ELSE 0 END AS depth
      FROM s{k - 1} s
    )"""
        )
    return ",\n    ".join(parts)


# ---------------------------------------------------------------------------
# q736 — symbol census with integer Shannon lengths


def _q736_body() -> str:
    return f"""
    SELECT f.sym,
           f.w AS freq,
           CAST(f.w AS DOUBLE) / t.t AS share,
           {_shannon_len('f.w', 't.t')} AS shannon_len_bits,
           0.0 + ROUND(-LOG2(CAST(f.w AS DOUBLE) / t.t), 9) AS surprisal_bits
    FROM freq f CROSS JOIN tot t
    ORDER BY f.w DESC, f.sym
    """


_FREQ_MV_CTE = f"""freq AS (SELECT sym, w FROM {_FREQ_VIEW}),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS t FROM freq)"""

_Q736_SQL = f"""
    WITH {_freq_cte()}{_q736_body()}"""


@query("q736_symbol_census", oracle=_Q736_SQL)
def q736_symbol_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type frequency table with exact integer Shannon code
    lengths (ceil(log2(t/w)) computed as the smallest k with
    w*2^k >= t — BIGINT compares, no float log) and 9dp surprisal."""
    _freq_view(spark, sf_dir)
    return spark.sql(f"WITH {_FREQ_MV_CTE}\n    {_q736_body()}")


# ---------------------------------------------------------------------------
# q737 — Huffman merge trace

def _trace_rows() -> str:
    rows = []
    for k in range(1, N_SYM):
        rows.append(
            f"""SELECT CAST({k} AS BIGINT) AS round,
           (SELECT MIN(cluster) FROM pair{k}) AS left_cluster,
           (SELECT MAX(cluster) FROM pair{k}) AS right_cluster,
           (SELECT w FROM newc{k}) AS merged_weight"""
        )
    return "\n    UNION ALL\n    ".join(rows)


_Q737_SQL = f"""
    WITH {_huffman_ctes()}
    {_trace_rows()}
    ORDER BY round
    """


@query("q737_huffman_merge_trace", oracle=_Q737_SQL)
def q737_huffman_merge_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four greedy merges building the Huffman tree over the
    event-type alphabet: per round, the two lightest clusters (ties by
    cluster name — the canonical total order) and the merged weight.
    Spark side: one events aggregate, then the <=4 merge rounds replayed
    in one bounded Arrow pass (see _huffman_replay); the oracle keeps
    the unrolled ORDER BY .. LIMIT 2 CTE chain."""
    from pyspark.sql import functions as F

    _freq_view(spark, sf_dir)
    trace = (
        spark.table(_FREQ_VIEW)
        .withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            _trace_pandas,
            "round bigint, left_cluster string, right_cluster string, "
            "merged_weight bigint",
        )
    )
    return trace.orderBy("round")


# ---------------------------------------------------------------------------
# q738 — Huffman codebook

_LAST = f"s{N_SYM - 1}"

_Q738_SQL = f"""
    WITH {_huffman_ctes()}
    SELECT s.sym,
           f.w AS freq,
           s.depth AS code_len_bits,
           CAST(f.w * s.depth AS BIGINT) AS weighted_bits,
           CAST({2 ** (N_SYM - 1)} / CAST(POWER(CAST(2 AS DOUBLE), s.depth)
                AS BIGINT) AS BIGINT) AS kraft_term_x{2 ** (N_SYM - 1)}
    FROM {_LAST} s JOIN freq f ON f.sym = s.sym
    ORDER BY s.depth, s.sym
    """


_Q738_SPARK = f"""
    SELECT h.sym,
           h.w AS freq,
           h.depth AS code_len_bits,
           CAST(h.w * h.depth AS BIGINT) AS weighted_bits,
           CAST({2 ** (N_SYM - 1)} / CAST(POWER(CAST(2 AS DOUBLE), h.depth)
                AS BIGINT) AS BIGINT) AS kraft_term_x{2 ** (N_SYM - 1)}
    FROM {_HUFF_VIEW} h
    ORDER BY h.depth, h.sym
    """


@query("q738_huffman_codebook", oracle=_Q738_SQL)
def q738_huffman_codebook(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-symbol Huffman code lengths (merge depth after the unrolled
    rounds), the weighted bit contribution, and the Kraft term scaled
    by 2^4 (a full binary tree sums to exactly 16). Spark side runs the
    identical terminal expressions over the materialized codebook."""
    _huff_view(spark, sf_dir)
    return spark.sql(_Q738_SPARK)


# ---------------------------------------------------------------------------
# q739 — one-row compression summary

_FIXED_BITS = 3  # ceil(log2(5))

_Q739_SQL = f"""
    WITH {_huffman_ctes()},
    code AS (
      SELECT s.sym, f.w, s.depth
      FROM {_LAST} s JOIN freq f ON f.sym = s.sym
    ),
    agg AS (
      SELECT CAST(SUM(w) AS BIGINT) AS t,
             CAST(SUM(w * depth) AS BIGINT) AS huff_bits,
             CAST(SUM(CAST({2 ** (N_SYM - 1)} / CAST(POWER(CAST(2 AS DOUBLE),
                  depth) AS BIGINT) AS BIGINT)) AS BIGINT) AS kraft_x16
      FROM code
    ),
    ent AS (
      SELECT CAST(SUM(CAST(0.0 + ROUND(
               -(CAST(f.w AS DOUBLE) / t.t) * LOG2(CAST(f.w AS DOUBLE) / t.t),
               9) AS DECIMAL(38,9))) AS DOUBLE) AS h_bits
      FROM freq f CROSS JOIN tot t
    )
    SELECT a.t AS n_symbols_coded,
           a.huff_bits AS huffman_total_bits,
           CAST(a.t * {_FIXED_BITS} AS BIGINT) AS fixed_width_total_bits,
           CAST(a.huff_bits AS DOUBLE) / a.t AS avg_code_len_bits,
           e.h_bits AS entropy_bits_per_symbol,
           CAST(a.huff_bits AS DOUBLE) / a.t - e.h_bits AS redundancy_bits,
           CAST(1 AS DOUBLE) - CAST(a.huff_bits AS DOUBLE)
             / (a.t * {_FIXED_BITS}) AS savings_vs_fixed,
           a.kraft_x16
    FROM agg a CROSS JOIN ent e
    """


_Q739_SPARK = f"""
    WITH code AS (
      SELECT sym, w, depth FROM {_HUFF_VIEW}
    ),
    freq AS (SELECT sym, w FROM {_FREQ_VIEW}),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS t FROM freq),
    agg AS (
      SELECT CAST(SUM(w) AS BIGINT) AS t,
             CAST(SUM(w * depth) AS BIGINT) AS huff_bits,
             CAST(SUM(CAST({2 ** (N_SYM - 1)} / CAST(POWER(CAST(2 AS DOUBLE),
                  depth) AS BIGINT) AS BIGINT)) AS BIGINT) AS kraft_x16
      FROM code
    ),
    ent AS (
      SELECT CAST(SUM(CAST(0.0 + ROUND(
               -(CAST(f.w AS DOUBLE) / t.t) * LOG2(CAST(f.w AS DOUBLE) / t.t),
               9) AS DECIMAL(38,9))) AS DOUBLE) AS h_bits
      FROM freq f CROSS JOIN tot t
    )
    SELECT a.t AS n_symbols_coded,
           a.huff_bits AS huffman_total_bits,
           CAST(a.t * {_FIXED_BITS} AS BIGINT) AS fixed_width_total_bits,
           CAST(a.huff_bits AS DOUBLE) / a.t AS avg_code_len_bits,
           e.h_bits AS entropy_bits_per_symbol,
           CAST(a.huff_bits AS DOUBLE) / a.t - e.h_bits AS redundancy_bits,
           CAST(1 AS DOUBLE) - CAST(a.huff_bits AS DOUBLE)
             / (a.t * {_FIXED_BITS}) AS savings_vs_fixed,
           a.kraft_x16
    FROM agg a CROSS JOIN ent e
    """


@query("q739_compression_summary", oracle=_Q739_SQL)
def q739_compression_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sizing row: Huffman total bits vs 3-bit fixed width for the
    whole event stream, average code length vs the entropy lower bound
    (9dp-term DECIMAL accumulation), redundancy, and the exact scaled
    Kraft sum. Entropy <= avg_len < entropy + 1 is the textbook
    invariant the test asserts. Spark side: identical agg/ent/terminal
    SQL text over the materialized freq + codebook views."""
    _huff_view(spark, sf_dir)
    return spark.sql(_Q739_SPARK)


# ---------------------------------------------------------------------------
# q740 — brand-alphabet Shannon census

_FIXED_BRAND_BITS = 5  # ceil(log2(25))

_BFREQ_VIEW = "coding_bfreq_mv"

_BFREQ_CTE = """bfreq AS (
      SELECT p.p_brand AS sym, CAST(COUNT(*) AS BIGINT) AS w
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    )"""


def _bfreq_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE lineitem x part aggregate -> checkpointed 25-row view (the
    bfreq/btot double reference re-ran the corpus join under inlining)."""
    _views_part(spark, sf_dir)
    df = spark.sql(f"WITH {_BFREQ_CTE} SELECT sym, w FROM bfreq")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_BFREQ_VIEW)


def _q740_body() -> str:
    return f"""SELECT f.sym AS brand,
           f.w AS freq,
           {_shannon_len('f.w', 't.t')} AS shannon_len_bits,
           CAST(CAST(POWER(CAST(2 AS DOUBLE),
                {MAX_LEN_BITS} - {_shannon_len('f.w', 't.t')}) AS BIGINT)
                AS BIGINT) AS kraft_term_x{2 ** MAX_LEN_BITS},
           CAST(f.w * ({_FIXED_BRAND_BITS} - {_shannon_len('f.w', 't.t')})
                AS BIGINT) AS bits_saved_vs_fixed
    FROM bfreq f CROSS JOIN btot t
    ORDER BY f.w DESC, f.sym
    """


_Q740_SQL = f"""
    WITH {_BFREQ_CTE},
    btot AS (SELECT CAST(SUM(w) AS BIGINT) AS t FROM bfreq)
    {_q740_body()}"""

_Q740_SPARK = f"""
    WITH bfreq AS (SELECT sym, w FROM {_BFREQ_VIEW}),
    btot AS (SELECT CAST(SUM(w) AS BIGINT) AS t FROM bfreq)
    {_q740_body()}"""


@query("q740_brand_shannon_census", oracle=_Q740_SQL)
def q740_brand_shannon_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon code lengths for the 25-brand alphabet weighted by
    lineitem frequency — integer lengths, Kraft terms at 2^20 scale
    (their sum <= 2^20 is the prefix-code feasibility check the test
    asserts), and per-brand savings vs a 5-bit fixed code (negative
    for rare brands)."""
    _bfreq_view(spark, sf_dir)
    return spark.sql(_Q740_SPARK)
