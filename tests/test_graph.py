"""PageRank: numpy power-iteration ground truth, dangling mass, weights,
and the sum-to-one invariant on random graphs."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from datafusion_python_spark.operators.graph import pagerank, transition_edges


def _np_pagerank(edges, n_nodes, iters, d=0.85, weights=None):
    """Dense reference implementation of the identical update."""
    P = np.zeros((n_nodes, n_nodes))
    w = weights or [1.0] * len(edges)
    for (s, t), wt in zip(edges, w):
        P[s, t] += wt
    out = P.sum(axis=1)
    r = np.full(n_nodes, 1.0 / n_nodes)
    for _ in range(iters):
        contrib = np.zeros(n_nodes)
        dangling = 0.0
        for s in range(n_nodes):
            if out[s] == 0:
                dangling += r[s]
            else:
                contrib += r[s] * P[s] / out[s]
        r = (1 - d) / n_nodes + d * (contrib + dangling / n_nodes)
    return r


def _edges_df(spark, edges, weights=None):
    if weights is None:
        rows = [(s, t, 1.0) for s, t in edges]
    else:
        rows = [(s, t, float(w)) for (s, t), w in zip(edges, weights)]
    return spark.createDataFrame(rows, "src: long, dst: long, weight: double")


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def test_simple_cycle_uniform(spark):
    # a 3-cycle: symmetric, so ranks must be exactly uniform
    got = _ranks(pagerank(_edges_df(spark, [(0, 1), (1, 2), (2, 0)]), num_iters=5))
    for v in got.values():
        assert v == pytest.approx(1 / 3, abs=1e-12)


def test_matches_numpy_with_dangling(spark):
    # node 3 is dangling (no out-edges) — mass must redistribute
    edges = [(0, 1), (0, 2), (1, 2), (2, 3)]
    got = _ranks(pagerank(_edges_df(spark, edges), num_iters=7))
    want = _np_pagerank(edges, 4, 7)
    for i in range(4):
        assert got[i] == pytest.approx(want[i], abs=1e-9)


def test_weighted_split(spark):
    # 0 links to 1 (w=3) and 2 (w=1): contribution splits 75/25
    edges = [(0, 1), (0, 2), (1, 0), (2, 0)]
    got = _ranks(
        pagerank(_edges_df(spark, edges, [3, 1, 1, 1]), num_iters=6, weight="weight")
    )
    want = _np_pagerank(edges, 3, 6, weights=[3, 1, 1, 1])
    for i in range(3):
        assert got[i] == pytest.approx(want[i], abs=1e-9)
    assert got[1] > got[2]


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=1, max_size=12
    ),
    iters=st.integers(1, 4),
)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_random_graphs_match_numpy_and_sum_to_one(spark, edges, iters):
    nodes = sorted({x for e in edges for x in e})
    relabel = {v: i for i, v in enumerate(nodes)}
    edges = [(relabel[s], relabel[t]) for s, t in edges]
    got = _ranks(pagerank(_edges_df(spark, edges), num_iters=iters))
    want = _np_pagerank(edges, len(nodes), iters)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for i in range(len(nodes)):
        assert got[i] == pytest.approx(want[i], abs=1e-9)


def test_iteration_body_is_lazy(spark):
    """The per-iteration loop must be one lazy composition: no driver
    action (.first/.collect/.count/.take) inside the body — the dangling
    mass folds in as a broadcast 1-row crossJoin (round-2 verdict #4).
    localCheckpoint (lineage truncation) is the sanctioned exception."""
    import inspect

    src = inspect.getsource(pagerank)
    body = src.split("for i in range(num_iters):", 1)[1]
    for action in (".first(", ".collect(", ".take(", ".count(", ".toPandas("):
        assert action not in body, f"driver action {action} in iteration body"

    # behavioral check: composing more iterations must not launch more
    # jobs (the setup node-count runs either way — AQE may split it into
    # several jobs — but a lazy body adds zero per extra iteration)
    tracker = spark.sparkContext.statusTracker()

    def jobs_for(iters):
        before = set(tracker.getJobIdsForGroup(None) or [])
        df = pagerank(
            _edges_df(spark, [(0, 1), (1, 2), (2, 0), (2, 1)]), num_iters=iters
        )
        after = set(tracker.getJobIdsForGroup(None) or [])
        return df, len(after - before)

    _, jobs1 = jobs_for(1)
    df3, jobs3 = jobs_for(3)
    assert jobs3 == jobs1, f"composing 2 extra iterations launched {jobs3 - jobs1} jobs"
    assert df3.count() == 3


def test_transition_edges(spark):
    rows = [
        (1, 100, "a", 1),
        (1, 101, "b", 2),
        (1, 102, "a", 3),
        (2, 103, "a", 4),
        (2, 104, "b", 5),
    ]
    ev = spark.createDataFrame(
        [(u, e, t, __import__("datetime").datetime(2024, 1, 1, 0, m)) for u, e, t, m in rows],
        "user_id: long, event_id: long, event_type: string, ts: timestamp",
    )
    got = {
        (r.src, r.dst): r.weight
        for r in transition_edges(ev).collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 1}
