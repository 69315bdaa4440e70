"""Distributed-systems batch 111 (q621-q625) — the partitioning and
replication primitives an engine operator reasons about, each as an
exact-integer query (hashes are the md5-derived k in [0, 2^20), the
established planted-rational idiom):

- q621 consistent-hash ring: 16 vnodes per node on a 2^20 ring, key
  placement = next vnode clockwise (argmin of ring distance, packed
  as dist*8+node so the argmin is ONE integer MIN); node census
  before/after adding a 6th node, and the moved-key count vs the
  1/(n+1) theory;
- q622 rendezvous (HRW) hashing: placement = argmax h(node, key)
  (packed MAX), same before/after census — HRW's guarantee that
  ONLY keys gained by the new node move, verified as an output
  column;
- q623 Merkle-tree reconciliation: two replicas of orders (replica B
  carries a deterministic 3-per-mille corruption), bucket hashes =
  order-insensitive BIGINT sums of row hashes at 64/16/4-bucket
  levels — the per-level differing-bucket counts show the log-time
  localization;
- q624 G-counter staleness: 3 replicas each observing a hash-chosen
  ~70% of increments; merged per-slot MAX vs the true counts — the
  convergence shortfall of partial delivery;
- q625 quorum reads: per-key replica versions with deterministic
  lags; how often a 2-of-3 quorum read still misses the latest
  version, vs single-replica reads.

100 TB shape: every placement decision is a map-side expression over
a broadcast vnode/replica table (the IVF broadcast-argmin shape);
Merkle levels are three bounded aggregates; nothing shuffles more
than once per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

DENOM = 1 << 20
N_NODES = 5
N_VNODES = 16


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("events", "orders", "lineitem"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _h20(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 5), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, 5))::BIGINT)"


def _idiv(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def _vnode_values(dialect: str, n_nodes: int) -> str:
    rows = ", ".join(
        f"({nid}, {v})" for nid in range(n_nodes) for v in range(N_VNODES)
    )
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""vspec(node_id, vn) AS (VALUES {rows}),
    vnodes AS (
      SELECT node_id, vn,
             {_h20(dialect, f"concat('vn:', CAST(node_id AS {s}), ':', CAST(vn AS {s}))")}
               AS vpos
      FROM vspec
    )"""


# ---------------------------------------------------------------------------
# q621 — consistent-hash ring


def _ring_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    kpos = _h20(dialect, f"concat('k:', CAST(event_id AS {s}))")
    return f"""
    WITH keys AS (SELECT event_id, {kpos} AS kpos FROM events),
    {_vnode_values(dialect, N_NODES + 1)},
    placed AS (
      SELECT /*+ BROADCAST(v) */ k.event_id,
             MIN(CASE WHEN v.node_id < {N_NODES}
                 THEN ((v.vpos - k.kpos + {DENOM}) % {DENOM}) * 8 + v.node_id
                 END) % 8 AS node_a,
             MIN(((v.vpos - k.kpos + {DENOM}) % {DENOM}) * 8 + v.node_id) % 8
               AS node_b
      FROM keys k CROSS JOIN vnodes v
      GROUP BY k.event_id, k.kpos
    )
    SELECT node_b AS node,
           CAST(SUM(CASE WHEN node_a = node_b THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_keys,
           CAST(SUM(CASE WHEN node_a <> node_b THEN 1 ELSE 0 END) AS BIGINT)
             AS gained_keys,
           CAST(COUNT(*) AS BIGINT) AS keys_after,
           ROUND(CAST(SUM(CASE WHEN node_a <> node_b THEN 1 ELSE 0 END)
                      AS DOUBLE)
                 / (SELECT COUNT(*) FROM keys), 6) AS moved_share_of_total
    FROM placed
    GROUP BY node_b
    ORDER BY node
    """


@query("q621_consistent_hash_ring", oracle=_ring_sql("duck"))
def q621_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent hashing with 16 vnodes/node on a 2^20 ring: key ->
    next vnode clockwise, the argmin packed as ring_distance*8+node
    so placement is ONE integer MIN over the broadcast vnode table
    (96 rows). Census after adding node 5: keys gained per node and
    the moved share (theory: ~1/6, all gained by the new node). The
    per-node share window runs over the 6-row aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_ring_sql("spark"))


# ---------------------------------------------------------------------------
# q622 — rendezvous hashing


def _hrw_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    hw = _h20(
        dialect,
        f"concat('w:', CAST(n.node_id AS {s}), ':', CAST(k.event_id AS {s}))",
    )
    nodes_b = ", ".join(f"({i})" for i in range(N_NODES + 1))
    return f"""
    WITH keys AS (SELECT event_id FROM events),
    nodes(node_id) AS (VALUES {nodes_b}),
    placed AS (
      SELECT /*+ BROADCAST(n) */ k.event_id,
             MAX(CASE WHEN n.node_id < {N_NODES}
                      THEN {hw} * 8 + n.node_id END) % 8 AS node_a,
             MAX({hw} * 8 + n.node_id) % 8 AS node_b
      FROM keys k CROSS JOIN nodes n
      GROUP BY k.event_id
    )
    SELECT node_b AS node,
           CAST(COUNT(*) AS BIGINT) AS keys_after,
           CAST(SUM(CASE WHEN node_a <> node_b THEN 1 ELSE 0 END) AS BIGINT)
             AS gained_keys,
           CAST(SUM(CASE WHEN node_a <> node_b AND node_b <> {N_NODES}
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS illegally_moved
    FROM placed
    GROUP BY node_b
    ORDER BY node
    """


@query("q622_rendezvous_hashing", oracle=_hrw_sql("duck"))
def q622_rendezvous_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) hashing: placement = argmax
    of h(node, key), packed as weight*8+node for a one-MIN... one-MAX
    integer argmax. Adding a 6th node: `illegally_moved` MUST be 0
    (HRW's minimal-disruption guarantee, emitted as a checkable
    column), and only the new node gains keys."""
    _views(spark, sf_dir)
    return spark.sql(_hrw_sql("spark"))


# ---------------------------------------------------------------------------
# q623 — Merkle reconciliation


def _merkle_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    hk = _h20(dialect, f"concat('mk:', CAST(o_orderkey AS {s}))")
    cents = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
    corrupt = f"CASE WHEN {hk} % 1000 < 3 THEN 1 ELSE 0 END"
    rowh = lambda price: _h20(
        dialect, f"concat(CAST(o_orderkey AS {s}), ':', CAST({price} AS {s}))"
    )
    lvls = ", ".join(f"({lv}, {64 >> (2 * lv)})" for lv in range(3))  # 64,16,4
    return f"""
    WITH rows_ab AS (
      SELECT o_orderkey,
             {hk} % 64 AS leaf,
             {rowh(cents)} AS ha,
             {rowh(f'{cents} + ({corrupt})')} AS hb
      FROM orders
    ),
    lvls(lv, nb) AS (VALUES {lvls}),
    buckets AS (
      SELECT /*+ BROADCAST(l) */ l.lv,
             {_idiv(dialect, 'r.leaf', _idiv(dialect, '64', 'l.nb'))} AS bucket,
             CAST(SUM(r.ha) AS BIGINT) AS sum_a,
             CAST(SUM(r.hb) AS BIGINT) AS sum_b
      FROM rows_ab r CROSS JOIN lvls l
      GROUP BY l.lv, {_idiv(dialect, 'r.leaf', _idiv(dialect, '64', 'l.nb'))}
    )
    SELECT lv AS level,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN sum_a <> sum_b THEN 1 ELSE 0 END) AS BIGINT)
             AS differing_buckets,
           ROUND(CAST(SUM(CASE WHEN sum_a <> sum_b THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS differing_share
    FROM buckets
    GROUP BY lv
    ORDER BY level
    """


@query("q623_merkle_reconciliation", oracle=_merkle_sql("duck"))
def q623_merkle_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle-style replica reconciliation: replica B carries a
    deterministic ~3-per-mille corruption (+1 cent); bucket digests
    are order-insensitive BIGINT sums of row hashes at the 64/16/4-
    bucket levels. The per-level differing-bucket counts show how a
    tree sync localizes damage with log work — and the sum digest
    means each level is ONE aggregate over the same scan."""
    _views(spark, sf_dir)
    return spark.sql(_merkle_sql("spark"))


# ---------------------------------------------------------------------------
# q624 — G-counter staleness

N_REPLICAS = 3
N_SLOTS = 8
DELIVER_PCT = 7  # replica sees an increment iff h % 10 < 7


def _gcounter_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    reps = ", ".join(f"({r})" for r in range(N_REPLICAS))
    hd = _h20(
        dialect,
        f"concat('d:', CAST(r.rep AS {s}), ':', CAST(e.event_id AS {s}))",
    )
    return f"""
    WITH reps(rep) AS (VALUES {reps}),
    delivered AS (
      SELECT /*+ BROADCAST(r) */ r.rep,
             e.user_id % {N_SLOTS} AS slot,
             CAST(COUNT(*) AS BIGINT) AS observed
      FROM events e CROSS JOIN reps r
      WHERE {hd} % 10 < {DELIVER_PCT}
      GROUP BY r.rep, e.user_id % {N_SLOTS}
    ),
    truth AS (
      SELECT user_id % {N_SLOTS} AS slot, CAST(COUNT(*) AS BIGINT) AS true_n
      FROM events GROUP BY user_id % {N_SLOTS}
    ),
    merged AS (
      SELECT slot, CAST(MAX(observed) AS BIGINT) AS merged_n
      FROM delivered GROUP BY slot
    )
    SELECT t.slot,
           t.true_n,
           m.merged_n,
           CAST(t.true_n - m.merged_n AS BIGINT) AS shortfall,
           ROUND(CAST(m.merged_n AS DOUBLE) / t.true_n, 6) AS coverage
    FROM truth t JOIN merged m ON m.slot = t.slot
    ORDER BY t.slot
    """


@query("q624_gcounter_staleness", oracle=_gcounter_sql("duck"))
def q624_gcounter_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-counter convergence under partial delivery: three replicas
    each observe a hash-chosen ~70% of increments; the CRDT merge
    (per-slot MAX over replicas) is compared to the true per-slot
    counts. Shortfall quantifies what anti-entropy still owes. One
    corpus scan fanned 3x map-side, two bounded aggregates."""
    _views(spark, sf_dir)
    return spark.sql(_gcounter_sql("spark"))


# ---------------------------------------------------------------------------
# q625 — quorum reads


def _quorum_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    lag = lambda r: (
        _h20(dialect, f"concat('lag{r}:', CAST(v.l_orderkey AS {s}))") + " % 3"
    )
    return f"""
    WITH versions AS (
      SELECT l_orderkey, CAST(MAX(l_linenumber) AS BIGINT) AS v
      FROM lineitem GROUP BY l_orderkey
    ),
    replicas AS (
      SELECT v.l_orderkey, v.v,
             GREATEST(v.v - ({lag(0)}), 0) AS v0,
             GREATEST(v.v - ({lag(1)}), 0) AS v1,
             GREATEST(v.v - ({lag(2)}), 0) AS v2
      FROM versions v
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN v0 < v THEN 1 ELSE 0 END) AS BIGINT) AS stale_r0,
           CAST(SUM(CASE WHEN v1 < v THEN 1 ELSE 0 END) AS BIGINT) AS stale_r1,
           CAST(SUM(CASE WHEN v2 < v THEN 1 ELSE 0 END) AS BIGINT) AS stale_r2,
           CAST(SUM(CASE WHEN GREATEST(v0, v1) < v THEN 1 ELSE 0 END)
                AS BIGINT) AS quorum01_miss,
           CAST(SUM(CASE WHEN GREATEST(v0, v1) < v AND GREATEST(v0, v2) < v
                          AND GREATEST(v1, v2) < v THEN 1 ELSE 0 END)
                AS BIGINT) AS all_quorums_miss,
           ROUND(CAST(SUM(CASE WHEN GREATEST(v0, v1) < v THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS quorum_miss_rate
    FROM replicas
    """


@query("q625_quorum_reads", oracle=_quorum_sql("duck"))
def q625_quorum_reads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quorum-read staleness: per-key versions (max linenumber) with
    deterministic per-replica lags in {0,1,2}; single-replica
    staleness vs a 2-of-3 quorum read (max of two replicas) vs the
    worst case where EVERY quorum misses the latest. All integer
    compares in one aggregate — the R+W>N intuition, quantified."""
    _views(spark, sf_dir)
    return spark.sql(_quorum_sql("spark"))
