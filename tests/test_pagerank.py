"""Distributed PageRank (stages/graph.py): agreement with the scalar
reference, partition-count independence, and edge-case handling."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _edges_ds(edges, blocks=5):
    import ray.data as rd

    t = pa.table({"src": pa.array(edges[:, 0], pa.int64()),
                  "dst": pa.array(edges[:, 1], pa.int64())})
    step = max(1, -(-t.num_rows // blocks))
    return rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])


def _random_graph(n=200, m=1200, seed=9):
    rng = np.random.default_rng(seed)
    e = rng.integers(0, n, size=(m, 2))
    return e  # multi-edges, self-loops and dangling nodes all occur


def test_matches_scalar_reference_and_partition_independence():
    from siteone_crawler_ray.stages.graph import pagerank, pagerank_reference

    n, edges = 200, _random_graph()
    want = pagerank_reference(edges, n)
    for P in (3, 8):
        t = pagerank(_edges_ds(edges), n, num_partitions=P)
        assert t["node"].to_pylist() == list(range(n))
        got = np.asarray(t["rank"].to_pylist())
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    # mass check: with danglers total <= 1, every rank >= (1-d)/N
    assert (1 - 0.85) / n - 1e-15 <= got.min() and got.sum() <= 1 + 1e-9


def test_star_graph_closed_form():
    """K leaves all pointing at a hub, hub dangling: after any number of
    iterations hub = (1-d)/N + d*K*leaf, leaf = (1-d)/N."""
    from siteone_crawler_ray.stages.graph import pagerank

    K = 7
    n = K + 1
    edges = np.array([[i, K] for i in range(K)])
    t = pagerank(_edges_ds(edges, blocks=2), n, iters=10)
    r = np.asarray(t["rank"].to_pylist())
    leaf = 0.15 / n
    np.testing.assert_allclose(r[:K], leaf, atol=1e-15)
    np.testing.assert_allclose(r[K], leaf + 0.85 * K * leaf, atol=1e-15)


def test_personalized_teleport_matches_reference_and_biases_seeds():
    from siteone_crawler_ray.stages.graph import pagerank, pagerank_reference

    n, edges = 200, _random_graph()
    t = np.zeros(n)
    t[:4] = 1.0  # all teleport mass on the four "seed" nodes
    want = pagerank_reference(edges, n, personalization=t)
    got = np.asarray(
        pagerank(_edges_ds(edges), n, personalization=t,
                 num_partitions=5)["rank"].to_pylist())
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
    # seeds dominate the uniform variant's seed ranks
    uniform = pagerank_reference(edges, n)
    assert got[:4].min() > uniform[:4].max()
    # unnormalized input is normalized internally
    got2 = np.asarray(
        pagerank(_edges_ds(edges), n, personalization=t * 7,
                 num_partitions=5)["rank"].to_pylist())
    np.testing.assert_allclose(got2, got, atol=1e-15)
    with pytest.raises(ValueError, match="length"):
        pagerank(_edges_ds(edges), n, personalization=np.ones(3))


def test_refs_output_reconstructs_table():
    """materialize=False keeps ranks as per-partition object refs (the
    10^10-node route); reassembling them equals the materialized path."""
    import ray

    from siteone_crawler_ray.stages.graph import (
        pagerank,
        pagerank_partition_nodes,
    )

    n, edges = 200, _random_graph()
    want = pagerank(_edges_ds(edges), n, num_partitions=4)
    out = pagerank(_edges_ds(edges), n, num_partitions=4, materialize=False)
    assert out["num_partitions"] == 4 and len(out["rank_refs"]) == 4
    got = np.empty(n)
    for q, ref in enumerate(out["rank_refs"]):
        got[pagerank_partition_nodes(q, n, 4)] = ray.get(ref)
    np.testing.assert_array_equal(got, np.asarray(want["rank"].to_pylist()))


def test_more_partitions_than_nodes_and_bad_edges():
    from siteone_crawler_ray.stages.graph import pagerank

    t = pagerank(_edges_ds(np.array([[0, 1], [1, 0]]), blocks=1), 2,
                 num_partitions=8)
    assert len(t) == 2
    with pytest.raises(Exception, match="outside"):
        pagerank(_edges_ds(np.array([[0, 5]]), blocks=1), 2, num_partitions=2)
