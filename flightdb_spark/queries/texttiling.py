"""TextTiling batch 176 (q947-q951) — Hearst's topic-segmentation
algorithm (TextTiling, CL 1997) over the documents corpus: slice each
document into fixed token blocks, score the lexical similarity of
every adjacent block pair, find the valleys (depth scores), and cut
segments where the depth is large. The block-join formulation is the
distributed form: block similarity is an EQUI-join of block token
sets on (doc, token) — never a pairwise text comparison.

- q947 gap similarity census: corpus distribution of adjacent-block
  Jaccard (the raw TextTiling signal);
- q948 depth scores: per gap, how far similarity dips below its
  immediate neighbors — the top valleys are topic shifts;
- q949 boundary census: documents by number of cuts at the depth
  threshold;
- q950 segment lengths: the resulting segment-size distribution (in
  blocks) from the boundary positions;
- q951 coherence validation: mean similarity AT boundaries vs inside
  segments — the gap that justifies the cuts (boundaries must score
  lower, test-asserted).

100 TB shape: one token explode keyed by (doc, block); the
intersection join is equi on (doc, token) between consecutive blocks
(block fan-out is per-document bounded); depth windows PARTITION BY
doc over per-doc gap counts (bounded by document length). Nothing
global, nothing pairwise across documents.

Determinism: block ids are integer position arithmetic; similarities
are exact integer intersection/union ratios; depth thresholds compare
identically-computed doubles (measure-zero boundary class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

BLOCK = 10  # tokens per block
DEPTH_TH = 0.15


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )


def _idiv(d: str, a: str, b: str) -> str:
    return f"({a}) div ({b})" if d == "spark" else f"({a}) // ({b})"


def _gaps_cte(d: str) -> str:
    if d == "spark":
        toks = (
            "SELECT doc_id, (pos) AS pos, tok FROM documents "
            "LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok"
        )
    else:
        toks = (
            "SELECT doc_id, generate_subscripts(arr, 1) - 1 AS pos, "
            "unnest(arr) AS tok FROM "
            "(SELECT doc_id, string_split(text, ' ') AS arr FROM documents) z"
        )
    bid = _idiv(d, "pos", str(BLOCK))
    return f"""toks AS ({toks}),
    btoks AS (
      SELECT doc_id, CAST({bid} AS BIGINT) AS bid, tok
      FROM toks WHERE tok != '' GROUP BY doc_id, CAST({bid} AS BIGINT), tok
    ),
    bsizes AS (
      SELECT doc_id, bid, CAST(COUNT(*) AS BIGINT) AS n_distinct
      FROM btoks GROUP BY doc_id, bid
    ),
    inter AS (
      SELECT a.doc_id, a.bid AS g, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM btoks a JOIN btoks b
        ON b.doc_id = a.doc_id AND b.bid = a.bid + 1 AND b.tok = a.tok
      GROUP BY a.doc_id, a.bid
    ),
    gaps AS (
      SELECT s1.doc_id, s1.bid AS g,
             COALESCE(i.n_common, 0) AS n_common,
             s1.n_distinct + s2.n_distinct - COALESCE(i.n_common, 0)
               AS n_union,
             CAST(COALESCE(i.n_common, 0) AS DOUBLE)
               / (s1.n_distinct + s2.n_distinct - COALESCE(i.n_common, 0))
               AS sim
      FROM bsizes s1
      JOIN bsizes s2 ON s2.doc_id = s1.doc_id AND s2.bid = s1.bid + 1
      LEFT JOIN inter i ON i.doc_id = s1.doc_id AND i.g = s1.bid
    )"""


def _depth_cte(d: str) -> str:
    return f"""{_gaps_cte(d)},
    depth AS (
      SELECT doc_id, g, sim,
             GREATEST(COALESCE(LAG(sim) OVER w, sim) - sim, 0.0)
             + GREATEST(COALESCE(LEAD(sim) OVER w, sim) - sim, 0.0)
               AS depth
      FROM gaps
      WINDOW w AS (PARTITION BY doc_id ORDER BY g)
    )"""


# ---------------------------------------------------------------------------
# q947 — gap similarity census


def _q947_sql(d: str) -> str:
    return f"""
    WITH {_gaps_cte(d)}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(n_common) AS DOUBLE) / SUM(n_union), 6)
             AS pooled_jaccard,
           ROUND(MIN(sim), 6) AS min_sim,
           ROUND(MAX(sim), 6) AS max_sim,
           CAST(SUM(CASE WHEN n_common = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_disjoint_gaps
    FROM gaps
    """


@query("q947_gap_similarity", oracle=_q947_sql("duckdb"))
def q947_gap_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw TextTiling signal: adjacent-block token-set Jaccard per
    gap, censused corpus-wide. The intersection is an equi-join of
    block token sets on (doc, token) — per-document bounded fan-out,
    no text is ever compared pairwise."""
    _views(spark, sf_dir)
    return spark.sql(_q947_sql("spark"))


# ---------------------------------------------------------------------------
# q948 — depth scores


def _q948_sql(d: str) -> str:
    return f"""
    WITH {_depth_cte(d)}
    SELECT doc_id, g AS gap_idx,
           ROUND(sim, 6) AS sim,
           ROUND(depth, 6) AS depth
    FROM depth
    ORDER BY depth DESC, doc_id, g
    LIMIT 25
    """


@query("q948_depth_scores", oracle=_q948_sql("duckdb"))
def q948_depth_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hearst depth scores: how far each gap's similarity dips below
    its immediate neighbors (the 1-neighbor form of the valley
    measure), windowed PER DOCUMENT (bounded partitions). The top 25
    deepest valleys are the corpus's sharpest topic shifts."""
    _views(spark, sf_dir)
    return spark.sql(_q948_sql("spark"))


# ---------------------------------------------------------------------------
# q949 — boundary census


def _q949_sql(d: str) -> str:
    return f"""
    WITH {_depth_cte(d)},
    per_doc AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN depth > {DEPTH_TH} THEN 1 ELSE 0 END)
               AS BIGINT) AS n_boundaries,
             CAST(COUNT(*) AS BIGINT) AS n_gaps
      FROM depth GROUP BY doc_id
    )
    SELECT n_boundaries,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(n_gaps) AS DOUBLE) / COUNT(*), 6)
             AS mean_gaps_per_doc
    FROM per_doc
    GROUP BY n_boundaries
    ORDER BY n_boundaries
    """


@query("q949_boundary_census", oracle=_q949_sql("duckdb"))
def q949_boundary_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents by number of topic cuts at depth > {DEPTH_TH}: the
    segmentation histogram an editor reads before trusting automated
    chunking. One per-doc aggregate over the depth table."""
    _views(spark, sf_dir)
    return spark.sql(_q949_sql("spark"))


# ---------------------------------------------------------------------------
# q950 — segment lengths


def _q950_sql(d: str) -> str:
    return f"""
    WITH {_depth_cte(d)},
    cuts AS (
      SELECT doc_id, g,
             CAST(SUM(CASE WHEN depth > {DEPTH_TH} THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY g
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS seg
      FROM depth
    ),
    segs AS (
      SELECT doc_id, seg, CAST(COUNT(*) AS BIGINT) AS len_blocks
      FROM cuts GROUP BY doc_id, seg
    )
    SELECT len_blocks,
           CAST(COUNT(*) AS BIGINT) AS n_segments
    FROM segs
    GROUP BY len_blocks
    ORDER BY len_blocks
    """


@query("q950_segment_lengths", oracle=_q950_sql("duckdb"))
def q950_segment_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The segment-size distribution the cuts induce: a per-doc
    running count of boundaries labels each gap with its segment, then
    two bounded aggregates. Chunking pipelines read this to pick
    context-window sizes."""
    _views(spark, sf_dir)
    return spark.sql(_q950_sql("spark"))


# ---------------------------------------------------------------------------
# q951 — coherence validation


def _q951_sql(d: str) -> str:
    return f"""
    WITH {_depth_cte(d)}
    SELECT CAST(SUM(CASE WHEN depth > {DEPTH_TH} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_boundary_gaps,
           CAST(SUM(CASE WHEN depth <= {DEPTH_TH} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_interior_gaps,
           ROUND(CAST(SUM(CASE WHEN depth > {DEPTH_TH} THEN sim
                          ELSE 0.0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN depth > {DEPTH_TH} THEN 1
                              ELSE 0 END), 0), 6) AS mean_sim_at_boundaries,
           ROUND(CAST(SUM(CASE WHEN depth <= {DEPTH_TH} THEN sim
                          ELSE 0.0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN depth <= {DEPTH_TH} THEN 1
                              ELSE 0 END), 0), 6) AS mean_sim_interior
    FROM depth
    """


@query("q951_coherence_validation", oracle=_q951_sql("duckdb"))
def q951_coherence_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sanity check behind the cuts: gaps flagged as boundaries
    must have LOWER mean lexical similarity than interior gaps
    (test-asserted) — otherwise the threshold is cutting noise. One
    pass over the depth table."""
    _views(spark, sf_dir)
    return spark.sql(_q951_sql("spark"))
