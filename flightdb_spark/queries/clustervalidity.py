"""Cluster-validity batch 168 (q912-q916) — the internal indices that
decide whether a clustering is any good BEFORE labels exist, run over
the embeddings table with the repo's deterministic coarse quantizer
(centroids = the k lowest-id vectors, q197/q50 contract): inertia
elbow, Davies-Bouldin, Calinski-Harabasz, centroid separation, and
assignment stability across k. Complements q153's silhouette.

All indices reduce to per-(cell, dim) MOMENT SUMS (n, sum x, sum x^2 of
9-dp-quantized coordinates — exact DECIMAL accumulation, the q191 PCA
discipline): within-SS = s2 - s1^2/n needs no second pass, between-SS
and centroid distances come from the k x 64 mean table. The per-point
argmin assignment here is the dual-dialect SQL cross join with an
explicit BROADCAST(cents) hint (k <= 16 rows; BroadcastNestedLoopJoin,
never CartesianProduct — verified by planlint); the production-scale
operator is the zero-shuffle HOF argmax in operators/vectors.py::
ivf_assign, and these diagnostics match its assignments exactly.

- q912 inertia elbow: within-SS at k = 2/4/8/16 with the drop ratio;
- q913 Davies-Bouldin (RMS-scatter variant): mean over clusters of
  max_j (S_i + S_j) / M_ij;
- q914 Calinski-Harabasz: (B/(k-1)) / (W/(n-k));
- q915 centroid separation: min/mean inter-centroid distance vs the
  max RMS scatter (the centroid-Dunn ratio);
- q916 assignment stability: how points move when k doubles 8 -> 16
  (retention per k=8 cell).

Determinism: coordinates quantize to 9 dp DECIMAL before any moment
sum; means/scatters are terminal doubles from exact sums; argmin ties
break to the lower centroid id via ROW_NUMBER with a full ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

KS = (2, 4, 8, 16)
K_MAIN = 8


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "embeddings")).createOrReplaceTempView(
        "embeddings"
    )


def _dot(d: str, a: str, b: str) -> str:
    if d == "spark":
        return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (s, t) -> s + t)"
    return f"list_inner_product({a}, {b})"


def _asg_cte(d: str, k: int, p: str = "", src: str = "e") -> str:
    """Per-vector nearest-centroid assignment (cosine score, lower-id
    tie-break) — BROADCAST(cents) keeps the k-row side a BNLJ."""
    return f"""{p}cents AS (
      SELECT vec_id AS cid, v AS cv,
             SQRT({_dot(d, "v", "v")}) AS cnrm
      FROM {src} WHERE vec_id < {k}
    ),
    {p}scored AS (
      SELECT /*+ BROADCAST(c) */ e.vec_id, e.v, c.cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY {_dot(d, "e.v", "c.cv")} / c.cnrm DESC, c.cid) AS rn
      FROM {src} e CROSS JOIN {p}cents c
    ),
    {p}cells AS (
      SELECT vec_id, v, cid AS cell FROM {p}scored WHERE rn = 1
    )"""


def _e_cte(d: str, p: str = "") -> str:
    cast = "CAST(embedding AS ARRAY<DOUBLE>)" if d == "spark" else "embedding::DOUBLE[]"
    return f"{p}e AS (SELECT vec_id, {cast} AS v FROM embeddings)"


def _dims(d: str, src: str) -> str:
    """(cell, i, x9) rows: 9-dp DECIMAL-quantized coordinates."""
    if d == "spark":
        return f"""SELECT cell,
             i,
             CAST(ROUND(x, 9) AS DECIMAL(15,9)) AS x9
      FROM {src} LATERAL VIEW posexplode(v) t AS i, x"""
    return f"""SELECT cell,
             generate_subscripts(v, 1) - 1 AS i,
             CAST(ROUND(unnest(v), 9) AS DECIMAL(15,9)) AS x9
      FROM {src}"""


def _mom_cte(d: str, p: str = "") -> str:
    """Per-(cell, dim) exact moments from quantized coordinates."""
    return f"""{p}dims AS (
      {_dims(d, f"{p}cells")}
    ),
    {p}mom AS (
      SELECT cell, i,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x9) AS DOUBLE) AS s1,
             CAST(SUM(x9 * x9) AS DOUBLE) AS s2
      FROM {p}dims GROUP BY cell, i
    )"""


# ---------------------------------------------------------------------------
# q912 — inertia elbow


def _q912_sql(d: str) -> str:
    branches = []
    for k in KS:
        p = f"k{k}"
        branches.append(f"""{_asg_cte(d, k, p)},
    {_mom_cte(d, p)},
    {p}inertia AS (
      SELECT CAST({k} AS BIGINT) AS k,
             CAST(COUNT(DISTINCT cell) AS BIGINT) AS n_cells,
             ROUND(SUM(s2 - s1 * s1 / n), 6) AS within_ss
      FROM {p}mom
    )""")
    union = "\n      UNION ALL\n      ".join(f"SELECT * FROM k{k}inertia" for k in KS)
    return f"""
    WITH {_e_cte(d)},
    {",".join(branches)}
    SELECT * FROM (
      {union}
    ) u
    ORDER BY k
    """


@query("q912_inertia_elbow", oracle=_q912_sql("duckdb"))
def q912_inertia_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The elbow table: total within-cluster sum of squares at
    k = 2/4/8/16 under the deterministic lowest-id-centroid quantizer.
    Within-SS per (cell, dim) is s2 - s1^2/n from exact DECIMAL moments
    — one pass per k, no distance-to-mean join. Monotone decrease in k
    is test-asserted."""
    _views(spark, sf_dir)
    return spark.sql(_q912_sql("spark"))


# ---------------------------------------------------------------------------
# q913 — Davies-Bouldin


def _scatter_cte(d: str) -> str:
    """Per-cell RMS scatter and per-(cell, dim) means at K_MAIN."""
    return f"""{_asg_cte(d, K_MAIN)},
    {_mom_cte(d)},
    scat AS (
      SELECT cell,
             CAST(MAX(n) AS BIGINT) AS n,
             SQRT(SUM(s2 - s1 * s1 / n) / MAX(n)) AS s
      FROM mom GROUP BY cell
    ),
    means AS (
      SELECT cell, i, s1 / n AS m FROM mom
    ),
    cdist AS (
      SELECT a.cell AS ca, b.cell AS cb,
             SQRT(SUM((a.m - b.m) * (a.m - b.m))) AS mdist
      FROM means a JOIN means b ON b.i = a.i AND b.cell != a.cell
      GROUP BY a.cell, b.cell
    )"""


def _q913_sql(d: str) -> str:
    return f"""
    WITH {_e_cte(d)},
    {_scatter_cte(d)},
    ratios AS (
      SELECT c.ca AS cell,
             MAX((sa.s + sb.s) / c.mdist) AS worst_ratio
      FROM cdist c
      JOIN scat sa ON sa.cell = c.ca
      JOIN scat sb ON sb.cell = c.cb
      GROUP BY c.ca
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           ROUND(AVG(worst_ratio), 6) AS davies_bouldin,
           ROUND(MAX(worst_ratio), 6) AS worst_cluster_ratio
    FROM ratios
    """


@query("q913_davies_bouldin", oracle=_q913_sql("duckdb"))
def q913_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin (RMS-scatter variant): per-cluster scatter from
    the moment table, inter-centroid distances from the k x 64 mean
    table (a bounded dim-keyed join), DB = mean over clusters of the
    worst (S_i + S_j) / M_ij. Lower is better; everything past the one
    corpus pass runs on <= k^2 rows."""
    _views(spark, sf_dir)
    return spark.sql(_q913_sql("spark"))


# ---------------------------------------------------------------------------
# q914 — Calinski-Harabasz


def _q914_sql(d: str) -> str:
    return f"""
    WITH {_e_cte(d)},
    {_asg_cte(d, K_MAIN)},
    {_mom_cte(d)},
    within AS (
      -- n_total = sum of cell populations, read off the dim-0 rows of
      -- the moment table (plain aggregate, no window)
      SELECT SUM(s2 - s1 * s1 / n) AS w,
             CAST(SUM(CASE WHEN i = 0 THEN n ELSE 0 END) AS BIGINT)
               AS n_total,
             CAST(COUNT(DISTINCT cell) AS BIGINT) AS k
      FROM mom
    ),
    gmeans AS (
      -- 'glob' is a DuckDB reserved word (the asof/glob lesson)
      SELECT i, SUM(s1) / SUM(n) AS gm FROM mom GROUP BY i
    ),
    between_ss AS (
      SELECT SUM(m.n * (m.s1 / m.n - g.gm) * (m.s1 / m.n - g.gm)) AS b
      FROM mom m JOIN gmeans g ON g.i = m.i
    )
    SELECT /*+ BROADCAST(w) */ w.k, w.n_total,
           ROUND(b.b, 6) AS between_ss,
           ROUND(w.w, 6) AS within_ss,
           ROUND((b.b / (w.k - 1)) / (w.w / (w.n_total - w.k)), 6)
             AS calinski_harabasz
    FROM between_ss b CROSS JOIN within w
    """


@query("q914_calinski_harabasz", oracle=_q914_sql("duckdb"))
def q914_calinski_harabasz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calinski-Harabasz (variance-ratio criterion): between-SS from
    cell means vs the global mean (both derived from the SAME moment
    table — no second corpus pass), within-SS as in q912, the ratio
    scaled by (n-k)/(k-1). Higher is better."""
    _views(spark, sf_dir)
    return spark.sql(_q914_sql("spark"))


# ---------------------------------------------------------------------------
# q915 — centroid separation (Dunn-like)


def _q915_sql(d: str) -> str:
    return f"""
    WITH {_e_cte(d)},
    {_scatter_cte(d)},
    seps AS (
      SELECT MIN(mdist) AS min_sep,
             ROUND(AVG(mdist), 6) AS mean_sep
      FROM cdist WHERE ca < cb
    ),
    worst AS (
      SELECT MAX(s) AS max_scatter FROM scat
    )
    SELECT ROUND(s.min_sep, 6) AS min_centroid_sep,
           s.mean_sep AS mean_centroid_sep,
           ROUND(w.max_scatter, 6) AS max_rms_scatter,
           ROUND(s.min_sep / (2 * w.max_scatter), 6) AS centroid_dunn
    FROM seps s CROSS JOIN worst w
    """


@query("q915_centroid_separation", oracle=_q915_sql("duckdb"))
def q915_centroid_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Separation vs compactness: the minimum inter-centroid distance
    against twice the worst RMS scatter — the centroid form of the Dunn
    index (exact Dunn needs all-pairs diameters; the centroid variant
    is the one that stays bounded at scale, and the conservative
    direction is documented). Ratio > 1 means well-separated."""
    _views(spark, sf_dir)
    return spark.sql(_q915_sql("spark"))


# ---------------------------------------------------------------------------
# q916 — assignment stability 8 -> 16


def _q916_sql(d: str) -> str:
    a8 = _asg_cte(d, 8, "a", src="e")
    b16 = _asg_cte(d, 16, "b", src="e")
    return f"""
    WITH {_e_cte(d)},
    {a8},
    {b16},
    paired AS (
      SELECT a.cell AS cell8, b.cell AS cell16
      FROM acells a JOIN bcells b ON b.vec_id = a.vec_id
    )
    SELECT cell8,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN cell16 = cell8 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_retained,
           ROUND(CAST(SUM(CASE WHEN cell16 = cell8 THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS retention,
           CAST(COUNT(DISTINCT cell16) AS BIGINT) AS n_split_into
    FROM paired
    GROUP BY cell8
    ORDER BY cell8
    """


@query("q916_assignment_stability", oracle=_q916_sql("duckdb"))
def q916_assignment_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What doubling k does to the partition: per k=8 cell, the share
    of points that keep their centroid at k=16 (the first 8 centroids
    are a prefix of the 16 by construction, so retention is
    well-defined) and how many k=16 cells it splits into. The
    refinement diagnostic behind q197's scale contract (refine k when
    cells overflow). Two broadcast-argmin assignments, one vec-keyed
    join."""
    _views(spark, sf_dir)
    return spark.sql(_q916_sql("spark"))
