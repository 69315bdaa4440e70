"""Training-mix & feature-engineering batch 70 (q417-q421) — the ops
between curation (dedup/quality) and the training loop:

- q417 temperature mixing: per-source token masses -> alpha-temperature
  sampling weights (w_i ~ mass_i^alpha, the multilingual/multi-source
  sampling exponent of GPT-3 / XLM-R) with implied upsampling factors
  and effective epochs per source;
- q418 deterministic epoch shuffle: per-epoch md5 order keys — the
  reproducible dataloader shuffle (same seed -> same order; different
  epoch -> different order, both asserted), shown as each epoch's
  opening window;
- q419 out-of-fold target encoding: leakage-free categorical encoding
  (each row's category mean computed EXCLUDING its own fold) vs the
  naive in-fold encoding, with the leakage gap measured — the feature-
  engineering staple that silently overfits when done wrong;
- q420 hashing-trick audit: vocabulary terms hashed into 2^12 feature
  buckets — collision rate, occupancy, max bucket vs the birthday-
  bound expectation (the capacity check before committing to hashed
  features);
- q421 recommendation popularity bias: exposure distribution of the
  q267 item-kNN top-k lists — catalog coverage and the share of
  exposure captured by the most-recommended decile (the feedback-loop
  audit every recsys launch review reads).

Determinism: weights/upsampling use POWER on integer masses rounded at
9 dp before DECIMAL accumulation; shuffle keys are md5 hex (string
order identical across engines); encodings are exact integer fold
moments; hashing and exposure are pure integer counting.

100 TB shapes: everything aggregates to bounded tables (sources,
folds x categories, 4096 buckets, items) in one corpus pass; the
epoch-shuffle output is a TakeOrdered per epoch, never a global sort
of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MIX_ALPHA = 0.7
N_EPOCHS = 3
SHUFFLE_TOPK = 5
N_FOLDS = 4
HASH_BUCKETS = 4096
REC_K = 5


def _docs_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    ).createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# q417 — temperature mixing


def _mix_sql(dialect: str) -> str:
    arr = "len(string_split(text, ' '))" if dialect == "duck" else "size(split(text, ' '))"
    return f"""
    WITH masses AS (
      SELECT source, CAST(SUM({arr}) AS BIGINT) AS tokens
      FROM documents GROUP BY source
    ),
    weighted AS (
      SELECT source, tokens,
             ROUND(POWER(CAST(tokens AS DOUBLE), {MIX_ALPHA}), 9) AS w
      FROM masses
    ),
    tot AS (
      SELECT CAST(SUM(CAST(w AS DECIMAL(38,9))) AS DOUBLE) AS wsum,
             CAST(SUM(tokens) AS BIGINT) AS tok_total
      FROM weighted
    )
    SELECT w.source, w.tokens,
           ROUND(w.w / t.wsum, 6) AS sample_prob,
           -- tokens drawn from this source in one epoch of tok_total
           -- draws, over the source's own mass = its effective epochs
           ROUND(w.w / t.wsum * t.tok_total / w.tokens, 6)
             AS upsampling_factor
    FROM weighted w CROSS JOIN tot t
    ORDER BY w.source
    """


@query("q417_temperature_mixing", oracle=_mix_sql("duck"))
def q417_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha-temperature source mixing (alpha={MIX_ALPHA}, the
    GPT-3/XLM-R sampling exponent): per-source token masses, the
    normalized sampling probabilities w_i ~ mass^alpha, and the implied
    upsampling factor (effective epochs of that source per global
    epoch) — the table that DEFINES a training mix; alpha < 1 flattens
    the head and upsamples the tail (asserted: small sources get
    factors > 1). POWER outputs round to 9 dp before the DECIMAL
    normalizer sum. One 20-key aggregate."""
    _docs_view(spark, sf_dir)
    return spark.sql(_mix_sql("spark"))


# ---------------------------------------------------------------------------
# q418 — deterministic epoch shuffle


def _shuffle_sql(dialect: str) -> str:
    if dialect == "spark":
        epochs = "(SELECT explode(sequence(1, 3)) AS epoch)"
        key = (
            "md5(CAST(doc_id AS STRING) || '_e' || CAST(epoch AS STRING))"
        )
    else:
        epochs = "(SELECT unnest(range(1, 4)) AS epoch)"
        key = (
            "md5(CAST(doc_id AS VARCHAR) || '_e' || CAST(epoch AS VARCHAR))"
        )
    return f"""
    WITH keyed AS (
      SELECT e.epoch, d.doc_id, {key} AS k
      FROM documents d CROSS JOIN {epochs} e
    ),
    ranked AS (
      SELECT epoch, doc_id, k,
             ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY k, doc_id)
               AS position
      FROM keyed
    )
    SELECT epoch, position, doc_id
    FROM ranked WHERE position <= {SHUFFLE_TOPK}
    ORDER BY epoch, position
    """


@query("q418_epoch_shuffle", oracle=_shuffle_sql("duck"))
def q418_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dataloader shuffle: each epoch orders the corpus
    by md5(doc_id, epoch) — reproducible on any engine and any
    partitioning (the property that makes a training run resumable and
    auditable), different across epochs (asserted: the three opening
    windows differ). Output: each epoch's first {SHUFFLE_TOPK}
    positions. The rank is a WindowGroupLimit (per-partition partial
    top-k before one shuffle on epoch) — never a global corpus sort."""
    _docs_view(spark, sf_dir)
    return spark.sql(_shuffle_sql("spark"))


# ---------------------------------------------------------------------------
# q419 — out-of-fold target encoding


def _tenc_sql(dialect: str) -> str:
    h = (
        "CAST(conv(substring(md5(CAST(doc_id AS STRING) || '_f'), 1, 4), 16, 10) AS BIGINT)"
        if dialect == "spark"
        else "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_f'), 1, 4))::BIGINT)"
    )
    y = (
        "CASE WHEN n_chars % 2 = 0 THEN 1 ELSE 0 END"
    )
    return f"""
    WITH rows_ AS (
      SELECT doc_id, lang AS cat, ({h}) % {N_FOLDS} AS fold, {y} AS y
      FROM documents
    ),
    fold_sums AS (
      SELECT cat, fold,
             CAST(COUNT(*) AS BIGINT) AS n_cf,
             CAST(SUM(y) AS BIGINT) AS y_cf
      FROM rows_ GROUP BY cat, fold
    ),
    cat_sums AS (
      SELECT cat, CAST(SUM(n_cf) AS BIGINT) AS n_c,
             CAST(SUM(y_cf) AS BIGINT) AS y_c
      FROM fold_sums GROUP BY cat
    ),
    -- out-of-fold encoding for (cat, fold) = mean over the OTHER folds
    enc AS (
      SELECT f.cat, f.fold, f.n_cf,
             ROUND(CAST(c.y_c - f.y_cf AS DOUBLE)
                   / NULLIF(c.n_c - f.n_cf, 0), 6) AS oof_encoding,
             ROUND(CAST(c.y_c AS DOUBLE) / c.n_c, 6) AS naive_encoding
      FROM fold_sums f JOIN cat_sums c ON c.cat = f.cat
    )
    SELECT cat, fold, n_cf, oof_encoding, naive_encoding,
           ROUND(ABS(oof_encoding - naive_encoding), 6) AS leakage_gap
    FROM enc ORDER BY cat, fold
    """


@query("q419_target_encoding", oracle=_tenc_sql("duck"))
def q419_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding: each (category, fold) cell's
    encoding is the target mean over the OTHER folds
    (computed by complement subtraction from exact fold sums — one
    aggregate, no per-fold re-scan), beside the naive full-data
    encoding and their gap — the leakage a naive encoder injects into
    every row's own feature. Integer fold moments; terminal
    divisions. The whole encoder is a (|cats| x {N_FOLDS})-row
    broadcast back onto the corpus in production."""
    _docs_view(spark, sf_dir)
    return spark.sql(_tenc_sql("spark"))


# ---------------------------------------------------------------------------
# q420 — hashing-trick audit


KEEP_BASE = 1.0 - 1.0 / HASH_BUCKETS  # exact binary double, inlined


def _hashing_sql(dialect: str) -> str:
    if dialect == "spark":
        words = "SELECT explode(split(text, ' ')) AS w FROM documents"
        h = "CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)"
    else:
        words = "SELECT unnest(string_split(text, ' ')) AS w FROM documents"
        h = "(('0x' || substr(md5(w), 1, 8))::BIGINT)"
    return f"""
    WITH vocab AS (
      SELECT DISTINCT w FROM ({words}) t WHERE w <> ''
    ),
    hashed AS (
      SELECT w, ({h}) % {HASH_BUCKETS} AS bucket FROM vocab
    ),
    buckets AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM hashed GROUP BY bucket
    ),
    stats AS (
      SELECT CAST((SELECT COUNT(*) FROM vocab) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS occupied,
             CAST(MAX(n_terms) AS BIGINT) AS max_bucket,
             CAST(SUM(CASE WHEN n_terms > 1 THEN n_terms ELSE 0 END)
               AS BIGINT) AS colliding_terms
      FROM buckets
    )
    SELECT v AS vocab_size, occupied AS occupied_buckets,
           max_bucket, colliding_terms,
           ROUND(CAST(colliding_terms AS DOUBLE) / v, 6) AS collision_rate,
           -- expected occupancy under uniform hashing:
           -- B * (1 - (1 - 1/B)^V); the base is Python-inlined as an
           -- exact double repr (DuckDB evaluates 1.0 - 1.0/B in
           -- truncated DECIMAL, which shifts the large power)
           ROUND({HASH_BUCKETS} * (1.0 - POWER({KEEP_BASE!r},
                                               CAST(v AS DOUBLE))), 6)
             AS expected_occupied
    FROM stats
    """


@query("q420_hashing_trick", oracle=_hashing_sql("duck"))
def q420_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing capacity audit: the distinct vocabulary hashed
    into {HASH_BUCKETS} buckets — collision rate (terms sharing a
    bucket), max bucket load, and occupancy vs the uniform-hashing
    expectation B(1-(1-1/B)^V) — the check that says whether hashed
    features are safe at this vocabulary size or the dimension needs
    doubling. One distinct-vocab aggregate + one bucket aggregate."""
    _docs_view(spark, sf_dir)
    return spark.sql(_hashing_sql("spark"))


# ---------------------------------------------------------------------------
# q421 — recommendation popularity bias


def _popbias_sql(dialect: str) -> str:
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH pairs AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS w
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY u, v
    ),
    recs AS (
      SELECT u, v,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY w DESC, v) AS rk
      FROM pairs
    ),
    exposure AS (
      SELECT v AS item, CAST(COUNT(*) AS BIGINT) AS n_exposures
      FROM recs WHERE rk <= {REC_K} GROUP BY v
    ),
    catalog AS (
      SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_items
      FROM lineitem
    ),
    ranked AS (
      SELECT item, n_exposures,
             ROW_NUMBER() OVER (ORDER BY n_exposures DESC, item) AS rnk,
             CAST(SUM(n_exposures) OVER () AS BIGINT) AS total,
             CAST(COUNT(*) OVER () AS BIGINT) AS n_rec_items
      FROM exposure
    )
    SELECT c.n_items AS catalog_size,
           MAX(r.n_rec_items) AS recommended_items,
           ROUND(CAST(MAX(r.n_rec_items) AS DOUBLE) / c.n_items, 6)
             AS catalog_coverage,
           ROUND(CAST(SUM(CASE WHEN r.rnk <= (r.n_rec_items + 9) {idiv} 10
                               THEN r.n_exposures ELSE 0 END) AS DOUBLE)
                 / MAX(r.total), 6) AS top_decile_exposure_share
    FROM ranked r CROSS JOIN catalog c
    GROUP BY c.n_items
    """


@query("q421_rec_popularity_bias", oracle=_popbias_sql("duck"))
def q421_rec_popularity_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Popularity bias of the co-purchase top-{REC_K} recommender:
    catalog coverage (how much of the catalog ever gets recommended)
    and the exposure share captured by the most-recommended decile —
    the feedback-loop audit that predicts rich-get-richer drift before
    a recsys launch. The per-item rank is a WindowGroupLimit; the
    exposure ranking runs over the AGGREGATED item-exposure table
    (bounded by catalog size — the q76 vocab-rank class). Integer
    exposures; two terminal divisions."""
    from flightdb_spark.tables import load_table as _lt

    ensure_parallelism(_lt(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(_popbias_sql("spark"))
