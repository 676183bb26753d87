"""curation_run — the filter → exact-dedup → near-dedup →
decontaminate → shard composition, end to end over the testdata
documents table with injected duplicates."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def _docs_with_injections():
    """200 base docs + 20 exact copies + 20 near copies, fresh ids."""
    base = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "text"]).slice(0, 200)
    ids = base["doc_id"].to_numpy(zero_copy_only=False)
    texts = base["text"].to_pylist()
    srcs = base["source"].to_pylist()
    exact = pa.table({
        "doc_id": pa.array(ids[:20] + 100_000),
        "source": pa.array(srcs[:20]),
        "text": pa.array(texts[:20]),
    })
    near = pa.table({
        "doc_id": pa.array(ids[20:40] + 200_000),
        "source": pa.array(srcs[20:40]),
        "text": pa.array([t + " tail" for t in texts[20:40]]),
    })
    return pa.concat_tables([base, exact, near])


def test_curation_run_end_to_end(tmp_path):
    import ray.data as rd

    from siteone_crawler_ray.pipelines.curation_run import curation_run

    docs = _docs_with_injections()
    bench = pq.read_table(f"{SF}/documents.parquet",
                          columns=["doc_id", "text"])
    bids = bench["doc_id"].to_numpy(zero_copy_only=False)
    bench = bench.filter(pa.array(bids % 97 == 3))
    out = str(tmp_path / "shards")

    m = curation_run(rd.from_arrow(docs), rd.from_arrow(bench), out,
                     id_col="doc_id", group_col="source",
                     num_shards=4, seed=7)
    assert m["input"] == 240
    # the synthetic docs all pass the quality gate
    assert m["after_quality_filter"] == 240
    # every injected exact copy collapses to its min-id original
    assert m["after_exact_dedup"] == 220
    # the " tail" near-copies are >= 0.8 Jaccard to their originals
    assert m["near_dups_dropped"] >= 15
    assert m["contaminated_dropped"] >= 1
    assert m["final"] == (m["after_exact_dedup"] - m["near_dups_dropped"]
                          - m["contaminated_dropped"])

    # shards are readable, disjoint, and sum to the final count
    rows = 0
    seen = set()
    for row in m["shards"]:
        t = pq.read_table(row["path"])
        rows += t.num_rows
        ids = t["doc_id"].to_pylist()
        assert not (set(ids) & seen)
        seen.update(ids)
    assert rows == m["final"]
    # survivors keep the ORIGINAL ids: no injected exact-copy id lands
    assert not any(i >= 100_000 and i < 200_000 for i in seen)

    # resume: a second run over the same input skips every shard
    m2 = curation_run(rd.from_arrow(docs), rd.from_arrow(bench), out,
                      id_col="doc_id", group_col="source",
                      num_shards=4, seed=7)
    assert all(r["skipped"] for r in m2["shards"])
    assert m2["final"] == m["final"]


def test_curation_run_empty_after_gate(tmp_path):
    import ray.data as rd

    from siteone_crawler_ray.pipelines.curation_run import curation_run

    docs = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                     "source": pa.array(["a", "a"]),
                     "text": pa.array(["x", "y z"])})  # all below min_tokens
    bench = pa.table({"doc_id": pa.array([9], pa.int64()),
                      "text": pa.array(["q w e r t y u i o p"])})
    m = curation_run(rd.from_arrow(docs), rd.from_arrow(bench),
                     str(tmp_path / "s"), num_shards=2)
    assert m["after_quality_filter"] == 0 and m["final"] == 0 and m["shards"] == []
