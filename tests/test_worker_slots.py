"""Per-node worker-pool sizing (stages/worker.py::_worker_slots).

The clamp must reason node-by-node: integer 1-CPU workers pack into
each node's residual after its SPREAD shard share.  A cluster-total
count over-provisions multi-node clusters (29 asked, 28 schedulable →
warm-up ray.get pends forever — reproduced on the simulated 4-node
cluster before this existed)."""

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _fake_nodes(monkeypatch, cpus_per_node):
    import ray

    monkeypatch.setattr(
        ray, "nodes",
        lambda: [{"Alive": True, "Resources": {"CPU": float(c)}}
                 for c in cpus_per_node])


def test_single_node_matches_historical_formula(monkeypatch):
    from siteone_crawler_ray.stages.worker import _worker_slots

    _fake_nodes(monkeypatch, [32])
    # floor(32 - 8*0.25) - 1 = 29: the recorded 32-CPU pool size
    assert _worker_slots(8) == 29
    _fake_nodes(monkeypatch, [4])
    assert _worker_slots(4) == 2
    assert _worker_slots(8) == 1


def test_four_by_eight_cluster_packs_per_node(monkeypatch):
    from siteone_crawler_ray.stages.worker import (
        _worker_slots,
        adaptive_worker_count,
        clamp_worker_count,
    )

    _fake_nodes(monkeypatch, [8, 8, 8, 8])
    # 2 shards/node -> floor(8 - 0.5) = 7 workers/node, 28 total, -1 driver
    assert _worker_slots(8) == 27
    assert clamp_worker_count(64, 8) == 27
    assert adaptive_worker_count(8) == 27
    # the old cluster-total formula said 32 - 2 - 1 = 29 > 28 schedulable
    assert _worker_slots(8) < 29


def test_more_nodes_than_shards_and_dead_nodes(monkeypatch):
    import ray

    from siteone_crawler_ray.stages.worker import _worker_slots

    monkeypatch.setattr(
        ray, "nodes",
        lambda: [{"Alive": True, "Resources": {"CPU": 8.0}},
                 {"Alive": False, "Resources": {"CPU": 8.0}},
                 {"Alive": True, "Resources": {}}])
    # one live CPU-bearing node: ceil(8/1)=8 shards there
    assert _worker_slots(8) == 5  # floor(8 - 2) - 1


def test_tiny_cluster_never_returns_zero(monkeypatch):
    from siteone_crawler_ray.stages.worker import _worker_slots

    _fake_nodes(monkeypatch, [1])
    assert _worker_slots(8) == 1
