"""Distributed quality-classifier training: the Ray data-parallel GD
must compute the SAME model as the single-process twin, learn a
recoverable rule, and score streaming batches consistently."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
DIM = 1 << 14
ITERS = 40


def _labeled_tables(nblocks: int = 5):
    """documents.parquet with a deterministic quality rule: docs whose
    text contains more 'the'-like stopwords than average are 'good'."""
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = t["text"].to_pylist()
    stop = np.array([s.split(" ").count("the") + s.split(" ").count("and")
                     for s in texts], dtype=np.float64)
    y = (stop > np.median(stop)).astype(np.int64)
    t = t.append_column("label", pa.array(y))
    step = -(-t.num_rows // nblocks)
    return [t.slice(i * step, step) for i in range(nblocks)], t


def test_distributed_training_matches_local_twin(ray_session):
    import ray.data as rd

    from siteone_crawler_ray.stages.classifier import (
        train_logreg, train_logreg_local)

    blocks, _ = _labeled_tables()
    ds = rd.from_arrow(blocks)
    w_dist, hist_dist = train_logreg(ds, dim=DIM, iters=ITERS)
    w_loc, hist_loc = train_logreg_local(blocks, dim=DIM, iters=ITERS)
    # identical block partials + ordered merges -> near-bit-equal model
    np.testing.assert_allclose(w_dist, w_loc, rtol=0, atol=1e-9)
    np.testing.assert_allclose(hist_dist, hist_loc, rtol=0, atol=1e-9)
    # training actually converged
    assert hist_dist[-1] < hist_dist[0] * 0.9


def test_classifier_learns_and_scores_streaming(ray_session):
    import ray.data as rd

    from siteone_crawler_ray.stages.classifier import classify, train_logreg

    blocks, full = _labeled_tables()
    ds = rd.from_arrow(blocks)
    w, _ = train_logreg(ds, dim=DIM, iters=150, lr=1.0)

    scored = classify(rd.from_arrow(blocks), w, dim=DIM)
    out = pa.concat_tables(
        [b for b in (ray_get_blocks(scored)) if b.num_rows]
    ).sort_by("doc_id")
    want = full.sort_by("doc_id")
    y = want["label"].to_numpy(zero_copy_only=False)
    p = out["quality_score"].to_numpy(zero_copy_only=False)
    acc = ((p > 0.5).astype(np.int64) == y).mean()
    assert acc > 0.85, acc  # the rule is hashed-BoW-learnable
    # schema passthrough: original columns survive the scoring stage
    assert set(("doc_id", "text", "label", "quality_score")) <= set(out.column_names)


def ray_get_blocks(ds):
    import ray

    return ray.get(ds.to_arrow_refs())


def test_hashed_features_are_layout_invariant():
    """Same doc -> same features regardless of batch composition (the
    cross-batch stability the dictionary trick must not break)."""
    from siteone_crawler_ray.stages.classifier import hashed_features

    a = pa.table({"text": pa.array(["the quick brown fox", "lazy dog"])})
    b = pa.table({"text": pa.array(["lazy dog", "unrelated words entirely"])})
    pa_, fa, _ = hashed_features(a, dim=DIM)
    pb_, fb, _ = hashed_features(b, dim=DIM)
    assert sorted(fa[pa_ == 1].tolist()) == sorted(fb[pb_ == 0].tolist())
