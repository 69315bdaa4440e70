"""Random-projection batch 162 (q876-q880) — an empirical
Johnson-Lindenstrauss audit over the embeddings table: project the
64-d vectors to k in {4, 8, 16} dimensions with a DETERMINISTIC
sign matrix (Achlioptas 2003 +-1 entries, generated in Python from a
seeded hash and inlined as VALUES — no RNG at query time, identical
on both engines) and measure exactly what the distortion costs:

- q876 norm preservation: mean ||y||^2 / ||x||^2 per k (expectation
  1 for sign projections scaled 1/sqrt(k));
- q877 pairwise distance distortion over a deterministic sample of
  190 vector pairs: mean/extreme squared-distance ratios per k;
- q878 the epsilon census: share of pairs within (1 +- eps) for
  eps in {0.1, 0.3, 0.5} per k — the JL guarantee, measured;
- q879 nearest-neighbor preservation: how often the sampled top-1
  neighbor survives the projection (what ANN actually cares about);
- q880 the dimension budget: smallest grid k achieving max
  distortion <= 50% beside the JL-bound literal 8 ln(n)/eps^2.

100 TB shape: the projection is ONE explode-join-aggregate
(vec x 64 dims x k columns, all map-side after a 1024-row broadcast
sign matrix); pair metrics run on the bounded sampled set. At
cluster scale the projection is embarrassingly parallel per vector —
exactly why JL sketches are the standard ANN preprocessing.

Determinism: embedding floats load identically from parquet on both
engines; per-dim products are micro-quantized BIGINTs before any
sum (q761 lesson), so projected coordinates and every distance are
exact integers in micro^2 units; ratios are terminal doubles.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

DIM = 64
KS = [4, 8, 16]
SAMPLE_MOD = 25  # vec_id % 25 == 0 -> 20 sampled vectors -> 190 pairs
EPSES = [0.1, 0.3, 0.5]


def _sign(j: int, d: int) -> int:
    h = hashlib.md5(f"jl:{j}:{d}".encode()).digest()
    return 1 if h[0] % 2 == 0 else -1


def _sign_values() -> str:
    rows = []
    for j in range(max(KS)):
        for d in range(DIM):
            rows.append(f"({j}, {d}, {_sign(j, d)})")
    return ",\n      ".join(rows)


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "embeddings")).createOrReplaceTempView(
        "embeddings"
    )


def _exploded(dialect: str) -> str:
    if dialect == "spark":
        return """ex AS (
      SELECT vec_id, posexplode(embedding) AS (d, xf)
      FROM embeddings
    ),
    exq AS (
      SELECT vec_id, d,
             CAST(FLOOR(CAST(xf AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
      FROM ex
    )"""
    return """ex AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d,
             unnest(embedding) AS xf
      FROM embeddings
    ),
    exq AS (
      SELECT vec_id, d,
             CAST(FLOOR(CAST(xf AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS x
      FROM ex
    )"""


def _proj_cte(dialect: str) -> str:
    """Projected micro-unit coordinates y(vec, j) for max(KS) dims."""
    return f"""{_exploded(dialect)},
    signs(j, d, s) AS (VALUES
      {_sign_values()}
    ),
    proj AS (
      SELECT /*+ BROADCAST(g) */ e.vec_id, g.j,
             CAST(SUM(g.s * e.x) AS BIGINT) AS y
      FROM exq e JOIN signs g ON g.d = e.d
      GROUP BY e.vec_id, g.j
    ),
    xnorm AS (
      SELECT vec_id, CAST(SUM(x * x) AS BIGINT) AS nx2
      FROM exq GROUP BY vec_id
    )"""


# --- Spark-side staging (oracle strings keep the single-statement CTE
# form; DuckDB materializes CTEs natively) -----------------------------------
#
# Catalyst inlines CTEs per reference, and this batch's pair machinery
# compounds worst in the registry: q879's sym references the od JOIN pd
# chain twice, mino/nno/mo{k}/nn{k} reference sym ~10x, and each
# expansion re-runs the 64-dim explode + sign projection — the before
# plan held 1062 Exchanges (q878: 396, one ratios re-expansion per
# UNION branch). The staged form makes ONE corpus pass (the sampled
# exploded coordinates, vec_id % SAMPLE_MOD = 0 -> 20 vecs x 64 dims),
# checkpoints it, derives the 190-row od⋈pd pair-distance table from
# it (projection over 20 vecs is trivial), checkpoints that, and every
# branch/nn CTE reads the bounded checkpoint. q876 (all vectors)
# checkpoints proj (vec x 16) and xnorm (vec) instead: 4 corpus passes
# -> 2.

_SEXQ_VIEW = "jl_sexq_mv"
_PAIRSD_VIEW = "jl_pairsd_mv"
_PROJ_VIEW = "jl_proj_mv"
_XNORM_VIEW = "jl_xnorm_mv"


def _pairsd_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE sampled-coordinate pass -> checkpointed pair distances."""
    _views(spark, sf_dir)
    sexq = spark.sql(
        f"""
    WITH {_exploded('spark')}
    SELECT vec_id, d, x FROM exq WHERE vec_id % {SAMPLE_MOD} = 0
    """
    )
    sexq.localCheckpoint(eager=True).createOrReplaceTempView(_SEXQ_VIEW)
    dist_branches = ",\n             ".join(
        f"CAST(SUM(CASE WHEN p1.j < {k} THEN (p1.y - p2.y) * (p1.y - p2.y)"
        f" ELSE 0 END) AS BIGINT) AS dy2_{k}"
        for k in KS
    )
    df = spark.sql(
        f"""
    WITH exq AS (SELECT vec_id, d, x FROM {_SEXQ_VIEW}),
    signs(j, d, s) AS (VALUES
      {_sign_values()}
    ),
    proj AS (
      SELECT /*+ BROADCAST(g) */ e.vec_id, g.j,
             CAST(SUM(g.s * e.x) AS BIGINT) AS y
      FROM exq e JOIN signs g ON g.d = e.d
      GROUP BY e.vec_id, g.j
    ),
    sample0 AS (
      SELECT DISTINCT vec_id FROM exq
    ),
    od AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST(SUM((ea.x - eb.x) * (ea.x - eb.x)) AS BIGINT) AS dx2
      FROM sample0 a JOIN sample0 b ON a.vec_id < b.vec_id
      JOIN exq ea ON ea.vec_id = a.vec_id
      JOIN exq eb ON eb.vec_id = b.vec_id AND eb.d = ea.d
      GROUP BY a.vec_id, b.vec_id
    ),
    pd AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             {dist_branches}
      FROM sample0 a JOIN sample0 b ON a.vec_id < b.vec_id
      JOIN proj p1 ON p1.vec_id = a.vec_id
      JOIN proj p2 ON p2.vec_id = b.vec_id AND p2.j = p1.j
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT o.va, o.vb, o.dx2, {", ".join(f"p.dy2_{k}" for k in KS)}
    FROM od o JOIN pd p ON p.va = o.va AND p.vb = o.vb
    """
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_PAIRSD_VIEW)


_RATIOS_MV_CTE = f"""ratios AS (
      SELECT va, vb, dx2,
             {", ".join(f"CAST(dy2_{k} AS DOUBLE) / {k} / dx2 AS r{k}" for k in KS)}
      FROM {_PAIRSD_VIEW}
      WHERE dx2 > 0
    )"""


def _proj_views(spark: SparkSession, sf_dir: str) -> None:
    """TWO corpus passes -> checkpointed proj (vec x 16) + xnorm."""
    _views(spark, sf_dir)
    proj = spark.sql(f"WITH {_proj_cte('spark')} SELECT vec_id, j, y FROM proj")
    proj.localCheckpoint(eager=True).createOrReplaceTempView(_PROJ_VIEW)
    xn = spark.sql(
        f"""
    WITH {_exploded('spark')}
    SELECT vec_id, CAST(SUM(x * x) AS BIGINT) AS nx2
    FROM exq GROUP BY vec_id
    """
    )
    xn.localCheckpoint(eager=True).createOrReplaceTempView(_XNORM_VIEW)


_PROJ_MV_CTE = f"""proj AS (
      SELECT vec_id, j, y FROM {_PROJ_VIEW}
    ),
    xnorm AS (
      SELECT vec_id, nx2 FROM {_XNORM_VIEW}
    )"""


def _ynorm(k: int) -> str:
    """sum of y_j^2 / k for j < k (micro^2 units, exact integers)."""
    return (
        f"(SELECT CAST(SUM(p.y * p.y) AS BIGINT) FROM proj p "
        f"WHERE p.vec_id = xn.vec_id AND p.j < {k})"
    )


# ---------------------------------------------------------------------------
# q876 — norm preservation

def _q876_sql(dialect: str, staged: bool = False) -> str:
    branches = "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({k} AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CAST(FLOOR(CAST(yn.ny2 AS DOUBLE) / {k} / xn.nx2
                * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000
             / COUNT(*) AS mean_norm_ratio
    FROM xnorm xn JOIN (
      SELECT vec_id, CAST(SUM(y * y) AS BIGINT) AS ny2
      FROM proj WHERE j < {k} GROUP BY vec_id
    ) yn ON yn.vec_id = xn.vec_id"""
        for k in KS
    )
    head = _PROJ_MV_CTE if staged else _proj_cte(dialect)
    return f"""
    WITH {head}
    {branches}
    ORDER BY k
    """


@query("q876_jl_norm_preservation", oracle=_q876_sql("duckdb"))
def q876_jl_norm_preservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean ||y||^2/(k ||x||^2) per target dimension — 1.0 in
    expectation for the sign projection; the spread around it is the
    price of the dimension cut. Micro-quantized per-vector ratios
    summed as integers."""
    _proj_views(spark, sf_dir)
    return spark.sql(_q876_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# pair machinery (q877-q879)

def _pairs_cte(dialect: str) -> str:
    """Original and projected squared distances for sampled pairs."""
    dist_branches = ",\n             ".join(
        f"CAST(SUM(CASE WHEN p1.j < {k} THEN (p1.y - p2.y) * (p1.y - p2.y)"
        f" ELSE 0 END) AS BIGINT) AS dy2_{k}"
        for k in KS
    )
    return f"""{_proj_cte(dialect)},
    sample0 AS (
      SELECT vec_id FROM embeddings WHERE vec_id % {SAMPLE_MOD} = 0
    ),
    od AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             CAST(SUM((ea.x - eb.x) * (ea.x - eb.x)) AS BIGINT) AS dx2
      FROM sample0 a JOIN sample0 b ON a.vec_id < b.vec_id
      JOIN exq ea ON ea.vec_id = a.vec_id
      JOIN exq eb ON eb.vec_id = b.vec_id AND eb.d = ea.d
      GROUP BY a.vec_id, b.vec_id
    ),
    pd AS (
      SELECT a.vec_id AS va, b.vec_id AS vb,
             {dist_branches}
      FROM sample0 a JOIN sample0 b ON a.vec_id < b.vec_id
      JOIN proj p1 ON p1.vec_id = a.vec_id
      JOIN proj p2 ON p2.vec_id = b.vec_id AND p2.j = p1.j
      GROUP BY a.vec_id, b.vec_id
    ),
    ratios AS (
      SELECT o.va, o.vb, o.dx2,
             {", ".join(
                 f"CAST(p.dy2_{k} AS DOUBLE) / {k} / o.dx2 AS r{k}"
                 for k in KS)}
      FROM od o JOIN pd p ON p.va = o.va AND p.vb = o.vb
      WHERE o.dx2 > 0
    )"""


def _q877_sql(dialect: str, staged: bool = False) -> str:
    branches = "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({k} AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(FLOOR(r{k} * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000 / COUNT(*) AS mean_ratio,
           MIN(r{k}) AS min_ratio,
           MAX(r{k}) AS max_ratio
    FROM ratios"""
        for k in KS
    )
    head = _RATIOS_MV_CTE if staged else _pairs_cte(dialect)
    return f"""
    WITH {head}
    {branches}
    ORDER BY k
    """


@query("q877_jl_distortion", oracle=_q877_sql("duckdb"))
def q877_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Squared-distance ratios (projected/k over original) for the 190
    sampled pairs: mean (micro-quantized), min, max per k — the
    distortion envelope that shrinks as k grows (test-asserted on the
    max-min spread)."""
    _pairsd_view(spark, sf_dir)
    return spark.sql(_q877_sql("spark", staged=True))


def _q878_sql(dialect: str, staged: bool = False) -> str:
    rows = []
    for k in KS:
        for eps in EPSES:
            lo, hi = 1 - eps, 1 + eps
            rows.append(
                f"""SELECT CAST({k} AS BIGINT) AS k,
           CAST({eps!r}e0 AS DOUBLE) AS eps,
           CAST(SUM(CASE WHEN r{k} >= {lo!r}e0 AND r{k} <= {hi!r}e0
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS share_within
    FROM ratios"""
            )
    branches = "\n    UNION ALL\n    ".join(rows)
    head = _RATIOS_MV_CTE if staged else _pairs_cte(dialect)
    return f"""
    WITH {head}
    {branches}
    ORDER BY k, eps
    """


@query("q878_jl_epsilon_census", oracle=_q878_sql("duckdb"))
def q878_jl_epsilon_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JL guarantee, measured: the share of sampled pairs whose
    squared-distance ratio lies within (1 +- eps) for each (k, eps)
    cell — monotone in both k and eps (test-asserted in eps)."""
    _pairsd_view(spark, sf_dir)
    return spark.sql(_q878_sql("spark", staged=True))


def _q879_sql(dialect: str, staged: bool = False) -> str:
    k_ctes = ",\n    ".join(
        f"""mo{k} AS (
      SELECT va, MIN(dy2_{k}) AS md FROM sym GROUP BY va
    ),
    nn{k} AS (
      SELECT s.va, MIN(s.vb) AS vb
      FROM sym s JOIN mo{k} m ON m.va = s.va AND s.dy2_{k} = m.md
      GROUP BY s.va
    )"""
        for k in KS
    )
    branches = "\n    UNION ALL\n    ".join(
        f"""SELECT CAST({k} AS BIGINT) AS k,
           CAST(SUM(CASE WHEN p.vb = o.vb THEN 1 ELSE 0 END) AS BIGINT)
             AS preserved,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(SUM(CASE WHEN p.vb = o.vb THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS nn_preservation
    FROM nno o JOIN nn{k} p ON p.va = o.va"""
        for k in KS
    )
    if staged:
        head = f"""sym AS (
      SELECT va, vb, dx2, {", ".join(f"dy2_{k}" for k in KS)}
      FROM {_PAIRSD_VIEW}
      UNION ALL
      SELECT vb AS va, va AS vb, dx2,
             {", ".join(f"dy2_{k}" for k in KS)}
      FROM {_PAIRSD_VIEW}
    )"""
    else:
        head = f"""{_pairs_cte(dialect)},
    sym AS (
      SELECT o.va, o.vb, o.dx2, {", ".join(f"p.dy2_{k}" for k in KS)}
      FROM od o JOIN pd p ON p.va = o.va AND p.vb = o.vb
      UNION ALL
      SELECT o.vb AS va, o.va AS vb, o.dx2,
             {", ".join(f"p.dy2_{k}" for k in KS)}
      FROM od o JOIN pd p ON p.va = o.va AND p.vb = o.vb
    )"""
    return f"""
    WITH {head},
    mino AS (
      SELECT va, MIN(dx2) AS md FROM sym GROUP BY va
    ),
    nno AS (
      SELECT s.va, MIN(s.vb) AS vb
      FROM sym s JOIN mino m ON m.va = s.va AND s.dx2 = m.md
      GROUP BY s.va
    ),
    {k_ctes}
    {branches}
    ORDER BY k
    """


@query("q879_jl_nn_preservation", oracle=_q879_sql("duckdb"))
def q879_jl_nn_preservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the nearest neighbor survive the projection? Per k, the
    share of sampled vectors whose top-1 neighbor (within the sample,
    exact integer distances, ties to the smallest id) is unchanged —
    the retrieval-relevant summary of q877's distortion."""
    _pairsd_view(spark, sf_dir)
    return spark.sql(_q879_sql("spark", staged=True))


def _q880_sql(dialect: str) -> str:
    import math

    n_sample = 20
    jl_bound = 8 * math.log(n_sample) / (0.5**2)
    worst = ",\n           ".join(
        f"MAX(GREATEST(r{k} - 1, 1 - r{k})) AS worst_{k}" for k in KS
    )
    first_ok = "CASE " + " ".join(
        f"WHEN MAX(GREATEST(r{k} - 1, 1 - r{k})) <= 0.5 THEN {k}"
        for k in KS
    ) + " ELSE -1 END"
    return f"""
    WITH {_pairs_cte(dialect)}
    SELECT {worst},
           CAST({first_ok} AS BIGINT) AS smallest_k_within_50pct,
           CAST({jl_bound!r}e0 AS DOUBLE) AS jl_bound_dims
    FROM ratios
    """


@query("q880_jl_dimension_budget", oracle=_q880_sql("duckdb"))
def q880_jl_dimension_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The budget row: worst-case distortion per grid k, the smallest
    grid k achieving <= 50% everywhere (-1 if none), and the classic
    JL bound 8 ln(n)/eps^2 for comparison — empirical projections
    usually beat the bound by a wide margin."""
    _views(spark, sf_dir)
    return spark.sql(_q880_sql("spark"))
