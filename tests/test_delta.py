"""crawl_delta — change detection between two visited snapshots,
oracled against DuckDB's native FULL OUTER JOIN, plus an end-to-end
run over two real EpochCrawler outputs."""

import duckdb
import numpy as np
import pyarrow as pa


def _snap(urls, status, size, title):
    from siteone_crawler_ray.functions.hashing import xxh64_strings

    return pa.table({
        "url_key": pa.array(xxh64_strings(urls), pa.uint64()),
        "url": pa.array(urls, pa.string()),
        "status_code": pa.array(status, pa.int32()),
        "size": pa.array(size, pa.int64()),
        "title": pa.array(title, pa.string()),
    })


def test_crawl_delta_matches_duckdb_full_outer(ray_session):
    import ray.data as rd

    from siteone_crawler_ray.pipelines.delta import crawl_delta, delta_counts

    rng = np.random.default_rng(5)
    n = 400
    urls = [f"https://h{i % 7}.test/p{i}" for i in range(n)]
    old = _snap(urls[: n - 60],                       # last 60 are new
                [200] * (n - 60),
                list(rng.integers(100, 5000, n - 60)),
                [f"t{i}" for i in range(n - 60)])
    # new snapshot: drop the first 40 (gone), mutate size on every 3rd
    keep = urls[40:]
    sizes = old["size"].to_pylist()[40:] + list(rng.integers(100, 5000, 60))
    titles = [f"t{i}" for i in range(40, n - 60)] + [f"t{i}" for i in range(n - 60, n)]
    sizes = [s + 1 if i % 3 == 0 else s for i, s in enumerate(sizes)]
    new = _snap(keep, [200] * len(keep), sizes, titles)

    got = crawl_delta(
        rd.from_arrow([old.slice(0, 170), old.slice(170)]),
        rd.from_arrow([new.slice(0, 200), new.slice(200)]),
        num_partitions=4,
    ).select(["url", "change"]).sort_by("url")

    con = duckdb.connect()
    con.register("o", old)
    con.register("n", new)
    want = con.sql("""
        SELECT coalesce(o.url, n.url) AS url,
               CASE WHEN o.url IS NULL THEN 'new'
                    WHEN n.url IS NULL THEN 'gone'
                    WHEN o.status_code = n.status_code AND o.size = n.size
                         AND o.title = n.title THEN 'unchanged'
                    ELSE 'changed' END AS change
        FROM o FULL OUTER JOIN n USING (url_key)
        ORDER BY url""").arrow()
    assert got.equals(want.cast(got.schema))

    c = delta_counts(got)
    assert c["gone"] == 40 and c["new"] == 60
    assert c["changed"] > 0 and c["unchanged"] > 0
    assert sum(c.values()) == got.num_rows


def test_crawl_delta_over_real_crawls(ray_session, tmp_path):
    """Two real crawls over corpora that differ by a page's content
    size produce the expected per-URL classes."""
    import os

    import ray.data as rd

    from siteone_crawler_ray.pipelines.crawl import CrawlConfig, EpochCrawler
    from siteone_crawler_ray.pipelines.delta import crawl_delta, delta_counts
    from siteone_crawler_ray.sources.corpus import make_graph_corpus, write_corpus

    def run(tag, docs):
        tabs = make_graph_corpus(seed=31, hosts=2, total_pages=120)
        if docs is not None:
            tabs["documents"] = docs(tabs["documents"])
        cp = str(tmp_path / f"corpus-{tag}")
        write_corpus(tabs["documents"], cp, num_buckets=2)
        wd = str(tmp_path / f"work-{tag}")
        EpochCrawler(cp, tabs["seeds"]["url"].to_pylist(),
                     dict(zip(tabs["robots"]["host"].to_pylist(),
                              tabs["robots"]["body"].to_pylist())),
                     wd, CrawlConfig(num_shards=2, fetch_concurrency=2)).run()
        return rd.read_parquet(os.path.join(wd, "visited"), partitioning=None)

    def grow_one(docs):
        # append one text span to every page so each body grows
        spans = docs["spans"].to_pylist()
        proto = dict(spans[0][0]) if spans and spans[0] else {}
        extra = {k: None for k in proto}
        extra.update({"kind": "text", "text": "<p>extra content</p>"})
        grown = [s + [dict(extra)] for s in spans]
        idx = docs.column_names.index("spans")
        return docs.set_column(
            idx, "spans", pa.array(grown, docs.schema[idx].type))

    a = run("a", None)
    b = run("b", grow_one)
    d = crawl_delta(a, b, compare_cols=("status_code", "size"))
    c = delta_counts(d)
    assert c["new"] == 0 and c["gone"] == 0
    assert c["changed"] > 0           # every page body grew
    assert c["changed"] + c["unchanged"] == d.num_rows


def test_crawl_delta_disjoint_snapshots(ray_session):
    """Force the right-only / left-only partition pass-throughs: the
    two snapshots share no URL at all (and P=1 puts them in ONE
    partition each way)."""
    import ray.data as rd

    from siteone_crawler_ray.pipelines.delta import crawl_delta, delta_counts

    old = _snap(["https://a.test/1", "https://a.test/2"], [200, 200],
                [10, 20], ["x", "y"])
    new = _snap(["https://b.test/9"], [200], [30], ["z"])
    for p in (1, 5):
        d = crawl_delta(rd.from_arrow(old), rd.from_arrow(new),
                        num_partitions=p)
        c = delta_counts(d)
        assert c == {"new": 1, "gone": 2, "changed": 0, "unchanged": 0}, p
    # empty old: everything is new
    empty = old.slice(0, 0)
    d = crawl_delta(rd.from_arrow(empty), rd.from_arrow(new), num_partitions=3)
    assert delta_counts(d)["new"] == 1


def test_crawl_delta_changes_only(ray_session):
    """changes_only returns exactly the non-unchanged subset."""
    import ray.data as rd

    from siteone_crawler_ray.pipelines.delta import crawl_delta

    old = _snap(["https://a.test/1", "https://a.test/2"], [200, 200],
                [10, 20], ["x", "y"])
    new = _snap(["https://a.test/1", "https://a.test/3"], [200, 200],
                [99, 30], ["x", "z"])
    full = crawl_delta(rd.from_arrow(old), rd.from_arrow(new),
                       num_partitions=3).sort_by("url")
    churn = crawl_delta(rd.from_arrow(old), rd.from_arrow(new),
                        num_partitions=3, changes_only=True).sort_by("url")
    import pyarrow.compute as pc

    want = full.filter(pc.not_equal(full["change"], "unchanged"))
    assert churn.equals(want)
    assert set(churn["change"].to_pylist()) == {"changed", "gone", "new"}


def test_crawl_delta_null_compare_columns(ray_session):
    """A compare column null in BOTH snapshots counts as equal — the
    row must not read 'changed' forever."""
    import ray.data as rd

    from siteone_crawler_ray.pipelines.delta import crawl_delta

    def snap():
        return pa.table({
            "url_key": pa.array([1, 2], pa.uint64()),
            "url": pa.array(["https://a/1", "https://a/2"]),
            "status_code": pa.array([200, 200], pa.int32()),
            "size": pa.array([10, 20], pa.int64()),
            "title": pa.array([None, "t"], pa.string()),
        })

    d = crawl_delta(rd.from_arrow(snap()), rd.from_arrow(snap()),
                    num_partitions=2)
    assert d["change"].to_pylist() == ["unchanged", "unchanged"]
