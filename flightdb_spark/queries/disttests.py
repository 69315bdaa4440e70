"""Distribution-distance batch 73 (q432-q436) — the two-sample
machinery a drift monitor or generative-model eval runs beyond the
classical tests already shipped (q128 PSI, q129 chi-square, q131/q193
KS, q192 Mann-Whitney):

- q432 MMD^2 drift (Gretton et al. 2012): the RBF-kernel maximum mean
  discrepancy between two embedding samples — THE embedding-
  distribution drift statistic (PSI/KS only see one scalar at a time;
  MMD sees the joint);
- q433 energy distance (Székely & Rizzo): 2 E|a-b| - E|a-a'| - E|b-b'|
  on the same pair blocks — the kernel-free companion with the same
  pair plan;
- q434 binned 1D Wasserstein: earth-mover distance between two event-
  value distributions on a bounded integer grid — |CDF_A - CDF_B|
  summed across bins times bin width (exact on the binned measure);
- q435 Sinkhorn transport plan: entropic OT between the corpus's
  language distribution and a uniform target on a 5x5 literal cost
  grid, 5 unrolled scaling iterations — the coupling that prices a
  rebalancing plan, not just its distance;
- q436 two-sample Cramér-von Mises: the integrated squared ECDF gap
  on the q131 bins — quadratic-sensitivity companion to KS's sup.

Determinism: kernel/distance values round to 9 dp per pair and
accumulate in DECIMAL; Wasserstein/CvM run on exact integer bin
counts; Sinkhorn iterates round to 12 dp per scaling step over the
bounded 25-cell table.

100 TB shapes: q432/q433's all-pairs blocks are the oracle-scale
anchors (documented: sample or use random Fourier features at fleet
scale); q434/q436 aggregate to <= 1001 bins before any ordered scan;
q435 never touches more than 25 cells after one 5-key aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

RBF_GAMMA = 0.015625  # 1/64 = 1/dim, exact in binary
W1_BINS = 100
SINKHORN_ITERS = 5
SINKHORN_EPS_COST = 0.5  # exp(-cost/eps) kernel with |i-j| cost
LANGS = ("de", "en", "es", "fr", "zh")


def _emb_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "embeddings")
    ).createOrReplaceTempView("embeddings")


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _docs_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    ).createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# q432 / q433 — MMD^2 and energy distance on shared pair blocks


def _pair_blocks_sql(dialect: str) -> str:
    """Pair blocks between the two parity samples, with squared
    euclidean distance per pair. Shared by MMD (kernel) and energy
    (sqrt) — each statistic only changes the per-pair transform."""
    if dialect == "spark":
        dot = (
            "aggregate(zip_with({x}, {y}, (p, q) -> p * q), 0D, "
            "(acc, z) -> acc + z)"
        )
        vec = "CAST(embedding AS ARRAY<DOUBLE>)"
    else:
        dot = "list_inner_product({x}, {y})"
        vec = "embedding::DOUBLE[]"
    # ||a-b||^2 = <a,a> + <b,b> - 2<a,b>, each dot the same
    # left-to-right fold on both engines (the q40/q197 idiom)
    d2 = (
        f"({dot.format(x='a.v', y='a.v')} + {dot.format(x='b.v', y='b.v')}"
        f" - 2 * {dot.format(x='a.v', y='b.v')})"
    )
    return f"""
    e AS (
      SELECT vec_id, {vec} AS v, vec_id % 2 AS grp FROM embeddings
    ),
    blocks AS (
      SELECT a.grp AS ga, b.grp AS gb, {d2} AS d2
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )"""


def _mmd_sql(dialect: str) -> str:
    return f"""
    WITH {_pair_blocks_sql(dialect)},
    kernels AS (
      SELECT ga, gb,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(ROUND(EXP(-{RBF_GAMMA} * d2), 9)
                           AS DECIMAL(38,9))) AS DOUBLE) AS ksum
      FROM blocks GROUP BY ga, gb
    ),
    terms AS (
      SELECT
        MAX(CASE WHEN ga = 0 AND gb = 0 THEN ksum / n_pairs END) AS kaa,
        MAX(CASE WHEN ga = 1 AND gb = 1 THEN ksum / n_pairs END) AS kbb,
        MAX(CASE WHEN ga <> gb THEN ksum / n_pairs END) AS kab
      FROM kernels
    )
    SELECT ROUND(kaa, 6) AS mean_k_aa,
           ROUND(kbb, 6) AS mean_k_bb,
           ROUND(kab, 6) AS mean_k_ab,
           ROUND(kaa + kbb - 2 * kab, 6) AS mmd2
    FROM terms
    """


@query("q432_mmd_drift", oracle=_mmd_sql("duck"))
def q432_mmd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RBF-kernel MMD^2 between the two parity halves of the embedding
    corpus (Gretton 2012): mean within-A + mean within-B - 2 mean
    cross kernel, gamma = 1/dim (exact binary literal). Near zero here
    — the halves are exchangeable — which IS the null calibration a
    drift monitor needs before trusting alarms. Kernel values round to
    9 dp into DECIMAL so the three block means are order-free. The
    all-pairs block pass is the oracle anchor; at fleet scale the same
    statistic runs on a hash sample or random Fourier features
    (documented)."""
    _emb_view(spark, sf_dir)
    return spark.sql(_mmd_sql("spark"))


def _energy_sql(dialect: str) -> str:
    return f"""
    WITH {_pair_blocks_sql(dialect)},
    dists AS (
      SELECT ga, gb,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CAST(ROUND(SQRT(d2), 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS dsum
      FROM blocks GROUP BY ga, gb
    ),
    terms AS (
      SELECT
        MAX(CASE WHEN ga = 0 AND gb = 0 THEN dsum / n_pairs END) AS daa,
        MAX(CASE WHEN ga = 1 AND gb = 1 THEN dsum / n_pairs END) AS dbb,
        MAX(CASE WHEN ga <> gb THEN dsum / n_pairs END) AS dab
      FROM dists
    )
    SELECT ROUND(daa, 6) AS mean_d_aa,
           ROUND(dbb, 6) AS mean_d_bb,
           ROUND(dab, 6) AS mean_d_ab,
           ROUND(2 * dab - daa - dbb, 6) AS energy_distance
    FROM terms
    """


@query("q433_energy_distance", oracle=_energy_sql("duck"))
def q433_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy distance (Székely-Rizzo) between the same two embedding
    halves: 2 E|a-b| - E|a-a'| - E|b-b'| — zero iff the distributions
    match, no kernel bandwidth to tune (the robustness companion run
    beside q432: two statistics agreeing on 'no drift' beats one).
    Identical pair-block plan; only the per-pair transform (sqrt vs
    RBF) differs. Same 9-dp DECIMAL discipline and the same sampling
    scale path."""
    _emb_view(spark, sf_dir)
    return spark.sql(_energy_sql("spark"))


# ---------------------------------------------------------------------------
# q434 — binned 1D Wasserstein


def _w1_sql(dialect: str) -> str:
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH binned AS (
      SELECT CAST(LEAST(CAST(FLOOR(value) AS BIGINT) {idiv} 10, {W1_BINS}) AS INT)
               AS bin,
             CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS grp
      FROM events WHERE event_type IN ('click', 'view')
    ),
    cells AS (
      SELECT bin,
             CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM binned GROUP BY bin
    ),
    tots AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM cells
    ),
    scan AS (
      SELECT bin,
             SUM(ca) OVER (ORDER BY bin) AS cum_a,
             SUM(cb) OVER (ORDER BY bin) AS cum_b
      FROM cells
    )
    SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
           ROUND(CAST(SUM(CAST(ROUND(
             ABS(CAST(s.cum_a AS DOUBLE) / t.na
                 - CAST(s.cum_b AS DOUBLE) / t.nb) * 10, 9)
             AS DECIMAL(38,9))) AS DOUBLE), 6) AS wasserstein_1
    FROM scan s CROSS JOIN tots t
    GROUP BY t.na, t.nb
    """


@query("q434_wasserstein_1d", oracle=_w1_sql("duck"))
def q434_wasserstein_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned 1D Wasserstein (earth-mover) distance between click and
    view value distributions: sum over the bounded 10-unit bins of
    |CDF_a - CDF_b| x bin width — exact on the binned measure (the
    metric a monitor actually alarms on; PSI saturates on shifted
    mass, W1 prices it linearly). The cumulative scan runs over the
    <= {W1_BINS}+1 bin table only (q131's bounded-window class).
    Integer bin counts; per-bin terms round 9 dp into DECIMAL."""
    _events_view(spark, sf_dir)
    return spark.sql(_w1_sql("spark"))


# ---------------------------------------------------------------------------
# q435 — Sinkhorn transport plan


_SINKHORN_LANGS_VIEW = "disttests_langs_mv"


def _sinkhorn_langs_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE corpus aggregate -> checkpointed 5-row (lang idx, count).

    The unrolled Sinkhorn chain references kern (= source_ x target,
    both from `langs`) twice per iteration and the final plan twice
    more, so Catalyst inlining re-ran the documents aggregate ~30x
    (646 Exchanges in the before plan). With the 5-row aggregate
    checkpointed, every re-expansion is arithmetic over the bounded
    view — zero corpus impact at any scale (P3 pattern, guide §2.4)."""
    lang_idx = " ".join(f"WHEN '{l}' THEN {i}" for i, l in enumerate(LANGS))
    _docs_view(spark, sf_dir)
    df = spark.sql(
        f"""
    SELECT CASE lang {lang_idx} END AS i,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM documents GROUP BY lang
    """
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_SINKHORN_LANGS_VIEW)


def _sinkhorn_sql(dialect: str, staged: bool = False) -> str:
    lang_idx = " ".join(
        f"WHEN '{l}' THEN {i}" for i, l in enumerate(LANGS)
    )
    iters = []
    for it in range(1, SINKHORN_ITERS + 1):
        prev_u = f"u{it - 1}"
        iters.append(
            f"""v{it} AS (
      SELECT k.j, ROUND(t.tgt / CAST(SUM(CAST(ROUND(u.su * k.kv, 12)
                                    AS DECIMAL(38,12))) AS DOUBLE), 12) AS sv
      FROM kern k
      JOIN {prev_u} u ON u.i = k.i
      JOIN target t ON t.j = k.j
      GROUP BY k.j, t.tgt
    ),
    u{it} AS (
      SELECT k.i, ROUND(s.src / CAST(SUM(CAST(ROUND(v.sv * k.kv, 12)
                                    AS DECIMAL(38,12))) AS DOUBLE), 12) AS su
      FROM kern k
      JOIN v{it} v ON v.j = k.j
      JOIN source_ s ON s.i = k.i
      GROUP BY k.i, s.src
    )"""
        )
    if staged:
        langs_cte = f"""langs AS (
      SELECT i, cnt FROM {_SINKHORN_LANGS_VIEW}
    )"""
    else:
        langs_cte = f"""langs AS (
      SELECT CASE lang {lang_idx} END AS i,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY lang
    )"""
    return f"""
    WITH {langs_cte},
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM langs),
    source_ AS (
      SELECT i, ROUND(CAST(cnt AS DOUBLE) / t.n, 12) AS src
      FROM langs CROSS JOIN tot t
    ),
    target AS (SELECT i AS j, CAST(0.2 AS DOUBLE) AS tgt FROM langs),
    kern AS (
      SELECT a.i, b.j,
             ROUND(EXP(-ABS(a.i - b.j) / {SINKHORN_EPS_COST}), 12) AS kv
      FROM source_ a CROSS JOIN target b
    ),
    u0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS su FROM source_),
    {', '.join(iters)},
    plan_ AS (
      SELECT k.i, k.j,
             ROUND(u.su * k.kv * v.sv, 8) AS mass
      FROM kern k
      JOIN u{SINKHORN_ITERS} u ON u.i = k.i
      JOIN v{SINKHORN_ITERS} v ON v.j = k.j
    )
    SELECT i AS from_lang_idx, j AS to_lang_idx, mass,
           ROUND(mass * ABS(i - j), 8) AS cost_contribution
    FROM plan_ WHERE mass >= 0.000005
    ORDER BY i, j
    """


@query("q435_sinkhorn_plan", oracle=_sinkhorn_sql("duck"))
def q435_sinkhorn_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropic optimal transport (Sinkhorn-Knopp, {SINKHORN_ITERS}
    unrolled scaling iterations): the coupling that moves the corpus's
    language distribution to uniform over a |i-j| cost grid — the plan
    (which language's mass goes where, at what cost) behind a corpus
    rebalancing decision, where q434 only prices the total. Everything
    after the one 5-key language aggregate runs on a 25-cell kernel
    table; every scaling step rounds to 12 dp and accumulates DECIMAL,
    so the iteration is engine-stable. Row-mass threshold trims
    numerically-zero cells."""
    _sinkhorn_langs_view(spark, sf_dir)
    return spark.sql(_sinkhorn_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q436 — two-sample Cramér-von Mises


def _cvm_sql(dialect: str) -> str:
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH binned AS (
      SELECT CAST(LEAST(CAST(FLOOR(value) AS BIGINT) {idiv} 10, {W1_BINS}) AS INT)
               AS bin,
             CASE WHEN event_type = 'click' THEN 'a' ELSE 'b' END AS grp
      FROM events WHERE event_type IN ('click', 'view')
    ),
    cells AS (
      SELECT bin,
             CAST(SUM(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM binned GROUP BY bin
    ),
    tots AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM cells
    ),
    scan AS (
      SELECT bin, ca, cb,
             SUM(ca) OVER (ORDER BY bin) AS cum_a,
             SUM(cb) OVER (ORDER BY bin) AS cum_b
      FROM cells
    )
    -- T = nm/(n+m)^2 * sum over pooled observations of (F_a - F_b)^2,
    -- binned: each bin contributes (ca+cb) pooled observations at its
    -- right-edge ECDF values
    SELECT t.na AS n_a, t.nb AS n_b,
           ROUND(CAST(t.na AS DOUBLE) * t.nb
                 / ((t.na + t.nb) * CAST(t.na + t.nb AS DOUBLE))
                 * CAST(SUM(CAST(ROUND(
                     (s.ca + s.cb)
                     * POWER(CAST(s.cum_a AS DOUBLE) / t.na
                             - CAST(s.cum_b AS DOUBLE) / t.nb, 2), 9)
                   AS DECIMAL(38,9))) AS DOUBLE), 6) AS cvm_statistic
    FROM scan s CROSS JOIN tots t
    GROUP BY t.na, t.nb
    """


@query("q436_cvm_test", oracle=_cvm_sql("duck"))
def q436_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises statistic on the same bounded bins
    as q434: nm/(n+m)^2 times the pooled-observation-weighted sum of
    squared ECDF gaps — the integrated-square companion to KS's sup
    (q131/q193): KS sees the single worst gap, CvM accumulates every
    gap, so slow uniform drift alarms here first. Bounded bin scan;
    exact integer counts; 9-dp DECIMAL terms."""
    _events_view(spark, sf_dir)
    return spark.sql(_cvm_sql("spark"))
