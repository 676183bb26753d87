"""continuous_ingest — the crawl→delta→normalize→dedup-gate→shard
composition, end-to-end over two real EpochCrawler runs."""

import os

import pyarrow as pa
import pyarrow.parquet as pq


def _crawl(tmp_path, tag, mutate=None):
    import ray.data as rd

    from siteone_crawler_ray.pipelines.crawl import CrawlConfig, EpochCrawler
    from siteone_crawler_ray.sources.corpus import make_graph_corpus, write_corpus

    tabs = make_graph_corpus(seed=41, hosts=2, total_pages=100)
    if mutate is not None:
        tabs["documents"] = mutate(tabs["documents"])
    cp = str(tmp_path / f"corpus-{tag}")
    write_corpus(tabs["documents"], cp, num_buckets=2)
    wd = str(tmp_path / f"work-{tag}")
    EpochCrawler(cp, tabs["seeds"]["url"].to_pylist(),
                 dict(zip(tabs["robots"]["host"].to_pylist(),
                          tabs["robots"]["body"].to_pylist())),
                 wd, CrawlConfig(num_shards=2, fetch_concurrency=2)).run()
    return lambda: rd.read_parquet(os.path.join(wd, "visited"), partitioning=None)


def _grow_spans(docs, text="tail token"):
    # NB: an identical appended span would be collapsed by the per-page
    # span dedup — growing twice needs two distinct texts
    spans = docs["spans"].to_pylist()
    proto = dict(spans[0][0]) if spans and spans[0] else {}
    extra = {k: None for k in proto}
    extra.update({"kind": "text", "text": text})
    grown = [s + [dict(extra)] for s in spans]
    idx = docs.column_names.index("spans")
    return docs.set_column(idx, "spans", pa.array(grown, docs.schema[idx].type))


def test_continuous_ingest_two_cycles(ray_session, tmp_path):
    from siteone_crawler_ray.pipelines.continuous import continuous_ingest

    a = _crawl(tmp_path, "a")
    b = _crawl(tmp_path, "b", mutate=_grow_spans)
    ixd = str(tmp_path / "index")
    out = str(tmp_path / "out")

    # cycle 0: the synthetic corpus contains templated pages, so the
    # INTRA-increment gate already drops some same-cycle near-dups;
    # what remains is ingested
    m0 = continuous_ingest(a(), ixd, os.path.join(out, "e0"), epoch=0,
                           num_shards=4)
    assert m0["ingested"] > 0
    intra0 = m0["near_dups_dropped"]
    n0 = m0["ingested"]

    # cycle 1: every page's text grew by two tokens — the delta marks
    # them changed, but the near-dup gate recognizes them as ~the same
    # document and drops most of them
    m1 = continuous_ingest(b(), ixd, os.path.join(out, "e1"), epoch=1,
                           prev_visited_ds=a(), num_shards=4)
    assert m1["delta"]["changed"] > 0 and m1["delta"]["new"] == 0
    assert m1["near_dups_dropped"] > 0
    # the gate did real work: far fewer docs ingested than changed
    assert m1["ingested"] < m1["delta"]["changed"]
    _ = intra0

    # the landed shards are readable and row-count-consistent
    total = 0
    for row in m0["shards"]:
        t = pq.read_table(row["path"])
        assert t.column_names == ["url_key", "url", "text"]
        total += t.num_rows
    assert total == n0

    # cycle-1 rerun resumes: index epoch files and shards are skipped
    m1b = continuous_ingest(b(), ixd, os.path.join(out, "e1"), epoch=1,
                            prev_visited_ds=a(), num_shards=4)
    assert m1b["index"]["skipped"]
    assert all(r["skipped"] for r in m1b["shards"])


def test_ingest_feeds_recrawl_schedule(ray_session, tmp_path):
    """continuous_ingest(recrawl_obs_dir=...) accumulates observations
    cycle over cycle; recrawl_priority over the tree ranks the grown
    pages (changed every cycle) above the stable majority."""
    import ray.data as rd

    from siteone_crawler_ray.pipelines.continuous import continuous_ingest
    from siteone_crawler_ray.pipelines.freshness import (
        read_observations,
        recrawl_priority,
    )

    a = _crawl(tmp_path, "fa")
    b = _crawl(tmp_path, "fb", mutate=_grow_spans)
    c = _crawl(tmp_path, "fc",
               mutate=lambda d: _grow_spans(_grow_spans(d), "second tail"))
    ixd = str(tmp_path / "index-f")
    out = str(tmp_path / "out-f")
    obs_dir = str(tmp_path / "obs-f")

    continuous_ingest(a(), ixd, os.path.join(out, "e0"), epoch=0,
                      num_shards=2, recrawl_obs_dir=obs_dir)
    assert not os.path.exists(obs_dir)  # no previous snapshot: no obs
    continuous_ingest(b(), ixd, os.path.join(out, "e1"), epoch=1,
                      prev_visited_ds=a(), num_shards=2,
                      recrawl_obs_dir=obs_dir)
    continuous_ingest(c(), ixd, os.path.join(out, "e2"), epoch=2,
                      prev_visited_ds=b(), num_shards=2,
                      recrawl_obs_dir=obs_dir)

    obs = read_observations(obs_dir)
    top = recrawl_priority(obs, interval_sec=86400.0,
                           horizon_sec=7 * 86400.0, top_b=10)
    assert top.num_rows == 10
    # every page's spans grew both cycles → pages observed twice with
    # x == n dominate the schedule
    assert top["x"].to_pylist()[0] == top["n"].to_pylist()[0]
    assert top["staleness"].to_pylist()[0] > 0.5
