"""Fast multi-node smoke: a 2-node simulated cluster (subprocess —
the session fixture owns this process's Ray) must reproduce the
in-process single-node crawl exactly, with actors on both nodes.

The full 4-node drill (scale crawl, exchange hashes, node-loss
checkpoint resume) lives in scripts/multinode_sim.py; this guards the
two defects it caught — per-node worker-slot packing and deferred-
manifest state aliasing — at pytest cost."""

import json
import os
import subprocess
import sys

import pytest

from siteone_crawler_ray.pipelines.crawl import CrawlConfig, EpochCrawler
from siteone_crawler_ray.sources.corpus import make_graph_corpus, write_corpus

CHILD = r"""
import json, sys, ray
from ray.cluster_utils import Cluster
cluster = Cluster(initialize_head=True,
                  head_node_args=dict(num_cpus=2, object_store_memory=400_000_000,
                                      include_dashboard=False))
cluster.add_node(num_cpus=2, object_store_memory=400_000_000)
ray.init(address=cluster.address, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from siteone_crawler_ray.pipelines.crawl import CrawlConfig, EpochCrawler
cp, workdir, seeds_json, robots_json = sys.argv[1:5]
cfg = CrawlConfig(use_ray=True, num_shards=4, ray_wave_threshold=1)
c = EpochCrawler(cp, json.loads(seeds_json), json.loads(robots_json), workdir, cfg)
c.seed(); c.warmup()
nodes = set(ray.get([w.node_id.remote() for w in c._workers])) | \
        set(ray.get([s.node_id.remote() for s in c._shards]))
res = c.run()
t = res.visited_table(columns=["url", "depth", "status_code"])
rows = sorted(zip(t["url"].to_pylist(), t["depth"].to_pylist(),
                  t["status_code"].to_pylist()))
print("SMOKE_JSON " + json.dumps({"nodes": len(nodes),
                                  "visited": res.metrics["visited"],
                                  "rows_tail": rows[-5:], "n": len(rows)}))
ray.shutdown(); cluster.shutdown()
"""


@pytest.mark.usefixtures("ray_session")
def test_two_node_cluster_matches_single_process(tmp_workdir):
    tabs = make_graph_corpus(seed=42, hosts=4, total_pages=200, out_degree=5)
    cp = os.path.join(tmp_workdir, "corpus")
    write_corpus(tabs["documents"], cp, num_buckets=4)
    seeds = tabs["seeds"]["url"].to_pylist()
    robots = dict(zip(tabs["robots"]["host"].to_pylist(),
                      tabs["robots"]["body"].to_pylist()))

    ref = EpochCrawler(cp, seeds, robots, os.path.join(tmp_workdir, "ref"),
                       CrawlConfig(use_ray=False, num_shards=4)).run()
    rt = ref.visited_table(columns=["url", "depth", "status_code"])
    ref_rows = sorted(zip(rt["url"].to_pylist(), rt["depth"].to_pylist(),
                          rt["status_code"].to_pylist()))

    env = dict(os.environ, PYTHONPATH="/root/repo", RAY_ADDRESS="")
    p = subprocess.run(
        [sys.executable, "-c", CHILD, cp, os.path.join(tmp_workdir, "mn"),
         json.dumps(seeds), json.dumps(robots)],
        capture_output=True, text=True, timeout=420, env=env, cwd="/root/repo")
    lines = [ln for ln in p.stdout.splitlines() if ln.startswith("SMOKE_JSON ")]
    assert lines, f"child failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    got = json.loads(lines[-1][len("SMOKE_JSON "):])
    assert got["nodes"] == 2, f"actors did not spread: {got['nodes']} node(s)"
    assert got["visited"] == ref.metrics["visited"]
    assert got["n"] == len(ref_rows)
    assert [tuple(r) for r in got["rows_tail"]] == ref_rows[-5:]
