"""Property test: edge-contraction connected components
(operators/textdedup.connected_components) equals BFS ground truth on
random graphs — including self-loops (singleton components) and
duplicate/reversed edges."""

from collections import defaultdict, deque

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flightdb_spark.operators.textdedup import connected_components

_edges = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=60,
)


def _truth(pairs):
    adj = defaultdict(set)
    nodes = set()
    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    labels = {}
    seen = set()
    for n in sorted(nodes):
        if n in seen:
            continue
        q = deque([n])
        comp = [n]
        seen.add(n)
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in seen:
                    seen.add(v)
                    comp.append(v)
                    q.append(v)
        m = min(comp)
        for c in comp:
            labels[c] = m
    return labels


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(_edges)
def test_contraction_cc_matches_bfs(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.cluster_id for r in connected_components(df).collect()
    }
    assert got == _truth(pairs)
