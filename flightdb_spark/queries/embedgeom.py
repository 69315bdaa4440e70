"""Embedding-geometry batch 91 (q521-q525) — the representation-
quality diagnostics beside q113 (dim stats), q136 (whitening), q191
(PCA), q360 (hubness), q326 (drift): the numbers that say whether an
embedding space is healthy BEFORE anyone trains on retrievals from
it:

- q521 isotropy sample: mean/std pairwise cosine over a
  deterministic 64-vector sample — anisotropic spaces (mean cosine
  >> 0, the common pathology) degrade cosine retrieval;
- q522 Fisher separability: between-class vs within-class scatter
  (trace form) over the label column — how linearly separable the
  classes are, one number;
- q523 dead dimensions: per-dimension variance census — dims
  carrying < 1% of the max variance are wasted capacity (and a sign
  of collapsed training);
- q524 intrinsic dimension: the Facco et al. 2017 two-NN MLE —
  ID = (n-1) / sum ln(r2/r1) over a 100-vector sample's first and
  second neighbor distances;
- q525 participation ratio: (sum var)^2 / sum var^2 over per-dim
  variances (the diagonal approximation of the eigen-spectrum PR;
  q191's power iteration is the exact-top-eigenvector companion) —
  the effective number of active dimensions.

Determinism: samples are TakeOrdered by md5 (hash, not RNG; no
global rank window); distances/cosines are straight-line expressions
over float->double casts; moment sums round per-row into DECIMAL
(rule 1); neighbor picks are rank-by-rounded-distance with vec_id
tie-break (rule 4); ln terms at 9 dp (rule 5).

100 TB shapes: q522/q523/q525 are one explode -> (dim[, label])
aggregate with map-side partials; q521/q524 bound the pairwise work
by sampling BEFORE the pair join (64^2 / 100^2 pairs at any corpus
size — the q464 discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

ISO_SAMPLE = 64
ID_SAMPLE = 100
DEAD_SHARE = 0.01


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "embeddings")).createOrReplaceTempView(
        "embeddings"
    )


def _sample(dialect: str, n: int) -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""(
      SELECT vec_id, embedding FROM embeddings
      ORDER BY md5(CAST(vec_id AS {str_t})), vec_id LIMIT {n}
    )"""


def _dot(dialect: str, a: str, b: str) -> str:
    if dialect == "duck":
        return (
            f"list_sum(list_transform(range(1, len({a}) + 1), "
            f"i -> CAST(({a})[i] AS DOUBLE) * CAST(({b})[i] AS DOUBLE)))"
        )
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), "
        f"(acc, v) -> acc + v)"
    )


def _expl(dialect: str) -> str:
    if dialect == "duck":
        return (
            "SELECT vec_id, label, "
            "unnest(generate_series(1, len(embedding))) AS dim, "
            "unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v "
            "FROM embeddings"
        )
    return (
        "SELECT vec_id, label, pos0 + 1 AS dim, CAST(v AS DOUBLE) AS v "
        "FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos0, v"
    )


# ---------------------------------------------------------------------------
# q521 — isotropy sample


def _iso_sql(dialect: str) -> str:
    dot = _dot(dialect, "a.embedding", "b.embedding")
    norm_a = _dot(dialect, "a.embedding", "a.embedding")
    norm_b = _dot(dialect, "b.embedding", "b.embedding")
    return f"""
    WITH samp AS {_sample(dialect, ISO_SAMPLE)},
    pairs AS (
      SELECT ROUND({dot} / (SQRT({norm_a}) * SQRT({norm_b})), 8) AS cos
      FROM samp a JOIN samp b ON b.vec_id > a.vec_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(SUM(CAST(cos AS DECIMAL(38,8))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_cosine,
           ROUND(SQRT(CAST(SUM(CAST(ROUND(cos * cos, 8) AS DECIMAL(38,8)))
                      AS DOUBLE) / COUNT(*)
                 - (CAST(SUM(CAST(cos AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(CAST(cos AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*))),
                 6) AS std_cosine
    FROM pairs
    """


@query("q521_isotropy_sample", oracle=_iso_sql("duck"))
def q521_isotropy_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotropy check: mean and std of pairwise cosine over a 64-
    vector md5-ordered sample (TakeOrdered — no global rank window;
    2,016 pairs at ANY corpus size). Mean cosine near 0 = isotropic;
    the common anisotropy pathology (a dominant direction all
    vectors share) shows up as mean >> std. Cosines round at 8 dp
    into DECIMAL moment sums."""
    _views(spark, sf_dir)
    return spark.sql(_iso_sql("spark"))


# ---------------------------------------------------------------------------
# q522 — Fisher separability


def _fisher_sql(dialect: str) -> str:
    return f"""
    WITH vals AS ({_expl(dialect)}),
    cls AS (
      SELECT label, dim,
             CAST(SUM(CAST(ROUND(v, 8) AS DECIMAL(38,8))) AS DOUBLE)
               / COUNT(*) AS mu,
             CAST(SUM(CAST(ROUND(v * v, 8) AS DECIMAL(38,8))) AS DOUBLE)
               / COUNT(*) AS m2,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM vals GROUP BY label, dim
    ),
    overall AS (
      SELECT dim,
             CAST(SUM(CAST(ROUND(v, 8) AS DECIMAL(38,8))) AS DOUBLE)
               / COUNT(*) AS gmu
      FROM vals GROUP BY dim
    ),
    within AS (
      SELECT SUM(CAST(ROUND((c.m2 - c.mu * c.mu) * c.n, 6)
                 AS DECIMAL(38,6))) AS sw,
             SUM(CAST(c.n AS DECIMAL(38,0))) AS ntot
      FROM cls c
    ),
    between_ AS (
      SELECT SUM(CAST(ROUND((c.mu - o.gmu) * (c.mu - o.gmu) * c.n, 6)
                 AS DECIMAL(38,6))) AS sb
      FROM cls c JOIN overall o ON o.dim = c.dim
    ),
    labels AS (SELECT CAST(COUNT(DISTINCT label) AS BIGINT) AS k FROM vals)
    SELECT l.k AS n_labels,
           ROUND(CAST(b.sb AS DOUBLE) / CAST(w.ntot AS DOUBLE), 6)
             AS between_scatter,
           ROUND(CAST(w.sw AS DOUBLE) / CAST(w.ntot AS DOUBLE), 6)
             AS within_scatter,
           ROUND(CAST(b.sb AS DOUBLE) / CAST(w.sw AS DOUBLE), 6)
             AS fisher_ratio
    FROM between_ b CROSS JOIN within w CROSS JOIN labels l
    """


@query("q522_fisher_separability", oracle=_fisher_sql("duck"))
def q522_fisher_separability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher separability (trace form): between-class scatter over
    within-class scatter of the labeled embeddings, summed across
    dimensions — the one-number answer to "does the label structure
    live in this space". All moments are per-(label, dim) aggregates
    with 8-dp DECIMAL accumulation; the scatter sums are (labels x
    dims)-bounded."""
    _views(spark, sf_dir)
    return spark.sql(_fisher_sql("spark"))


# ---------------------------------------------------------------------------
# q523 — dead dimensions


def _dead_sql(dialect: str) -> str:
    return f"""
    WITH vals AS ({_expl(dialect)}),
    dimvar AS (
      SELECT dim,
             CAST(SUM(CAST(ROUND(v * v, 8) AS DECIMAL(38,8))) AS DOUBLE)
               / COUNT(*)
             - (CAST(SUM(CAST(ROUND(v, 8) AS DECIMAL(38,8))) AS DOUBLE)
                / COUNT(*))
               * (CAST(SUM(CAST(ROUND(v, 8) AS DECIMAL(38,8))) AS DOUBLE)
                  / COUNT(*)) AS var
      FROM vals GROUP BY dim
    ),
    mx AS (SELECT MAX(var) AS vmax FROM dimvar),
    topshare AS (
      SELECT SUM(CAST(ROUND(var, 8) AS DECIMAL(38,8))) AS top8
      FROM (SELECT var FROM dimvar ORDER BY var DESC, dim LIMIT 8) t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
           CAST(SUM(CASE WHEN d.var < {DEAD_SHARE!r} * m.vmax
                    THEN 1 ELSE 0 END) AS BIGINT) AS dead_dims,
           ROUND(m.vmax, 6) AS max_variance,
           ROUND(MIN(d.var), 8) AS min_variance,
           ROUND(CAST(t.top8 AS DOUBLE)
                 / CAST(SUM(CAST(ROUND(d.var, 8) AS DECIMAL(38,8)))
                   AS DOUBLE), 6) AS top8_variance_share
    FROM dimvar d CROSS JOIN mx m CROSS JOIN topshare t
    GROUP BY m.vmax, t.top8
    """


@query("q523_dead_dimensions", oracle=_dead_sql("duck"))
def q523_dead_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-dimension census: per-dim variances (one explode + 64-row
    aggregate), dims under 1% of the max variance, and the top-8
    variance share — collapsed training shows up as a few dims
    carrying everything. Variance via exact DECIMAL moments; the
    top-8 pick is TakeOrdered over the 64-row dim table."""
    _views(spark, sf_dir)
    return spark.sql(_dead_sql("spark"))


# ---------------------------------------------------------------------------
# q524 — two-NN intrinsic dimension


def _id2nn_sql(dialect: str) -> str:
    dot_ab = _dot(dialect, "a.embedding", "b.embedding")
    dot_aa = _dot(dialect, "a.embedding", "a.embedding")
    dot_bb = _dot(dialect, "b.embedding", "b.embedding")
    return f"""
    WITH samp AS {_sample(dialect, ID_SAMPLE)},
    dists AS (
      SELECT a.vec_id AS anchor, b.vec_id AS other,
             ROUND(SQRT({dot_aa} - 2 * ({dot_ab}) + {dot_bb}), 8) AS d
      FROM samp a JOIN samp b ON b.vec_id <> a.vec_id
    ),
    ranked AS (
      SELECT anchor, d,
             ROW_NUMBER() OVER (PARTITION BY anchor
                                ORDER BY d, other) AS rn
      FROM dists
    ),
    mu AS (
      SELECT r2.anchor,
             ROUND(LN(r2.d / r1.d), 9) AS lnmu
      FROM (SELECT anchor, d FROM ranked WHERE rn = 1) r1
      JOIN (SELECT anchor, d FROM ranked WHERE rn = 2) r2
        ON r2.anchor = r1.anchor
      WHERE r1.d > CAST(0.0 AS DOUBLE)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_anchors,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / CAST(SUM(CAST(lnmu AS DECIMAL(38,9))) AS DOUBLE), 4)
             AS intrinsic_dimension
    FROM mu
    """


@query("q524_intrinsic_dimension", oracle=_id2nn_sql("duck"))
def q524_intrinsic_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-NN intrinsic dimension (Facco et al. 2017): on a 100-vector
    sample, each anchor's first/second neighbor distance ratio
    mu = r2/r1 gives the MLE ID = n / sum ln(mu) — how many degrees
    of freedom the data ACTUALLY uses, vs the 64 ambient dims.
    Sampling precedes the pair join (9,900 pairs at any corpus
    size); neighbor picks rank on 8-dp-rounded distances with vec_id
    tie-break; ln terms at 9 dp into a DECIMAL sum."""
    _views(spark, sf_dir)
    return spark.sql(_id2nn_sql("spark"))


# ---------------------------------------------------------------------------
# q525 — participation ratio


def _pr_sql(dialect: str) -> str:
    return f"""
    WITH vals AS ({_expl(dialect)}),
    dimvar AS (
      SELECT dim,
             CAST(SUM(CAST(ROUND(v * v, 8) AS DECIMAL(38,8))) AS DOUBLE)
               / COUNT(*)
             - (CAST(SUM(CAST(ROUND(v, 8) AS DECIMAL(38,8))) AS DOUBLE)
                / COUNT(*))
               * (CAST(SUM(CAST(ROUND(v, 8) AS DECIMAL(38,8))) AS DOUBLE)
                  / COUNT(*)) AS var
      FROM vals GROUP BY dim
    ),
    sums AS (
      SELECT CAST(SUM(CAST(ROUND(var, 8) AS DECIMAL(38,8))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(var * var, 10) AS DECIMAL(38,10)))
                  AS DOUBLE) AS s2,
             CAST(COUNT(*) AS BIGINT) AS d
      FROM dimvar
    )
    SELECT d AS ambient_dims,
           ROUND(s1 * s1 / s2, 4) AS participation_ratio,
           ROUND(s1 * s1 / s2 / d, 6) AS pr_share
    FROM sums
    """


@query("q525_participation_ratio", oracle=_pr_sql("duck"))
def q525_participation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation ratio (sum var)^2 / sum var^2 over the per-dim
    variance spectrum — the effective number of active dimensions
    (equals d for a flat spectrum, 1 for total collapse). This is
    the diagonal approximation of the eigen-spectrum PR; q191's
    power iteration provides the exact top eigenvector when the
    off-diagonal structure matters. One explode + 64-row aggregate +
    a 1-row closed form."""
    _views(spark, sf_dir)
    return spark.sql(_pr_sql("spark"))
