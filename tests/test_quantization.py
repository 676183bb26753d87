"""Int8 embedding quantization (stages/similarity.py::quantize_embeddings):
exact code arithmetic, 4x memory cut, bounded reconstruction error, and
quantized-cosine top-k agreement with the float path."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _vec_ds(mat):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.array(list(mat.astype(np.float64)),
                              pa.list_(pa.float64())),
    }))


def _clustered(n=200, dim=32, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(8, dim))
    return centers[rng.integers(0, 8, n)] + 0.05 * rng.normal(size=(n, dim))


def _quantized_table(mat):
    from siteone_crawler_ray.functions.agg import collect_blocks
    from siteone_crawler_ray.stages.similarity import quantize_embeddings

    t = pa.concat_tables(collect_blocks(quantize_embeddings(_vec_ds(mat))))
    return t.take(pa.compute.sort_indices(t, [("vec_id", "ascending")]))


def test_codes_match_scalar_rule_dtype_and_error_bound():
    mat = _clustered()
    t = _quantized_table(mat)
    assert t.schema.field("q").type == pa.list_(pa.int8())  # the 4x cut
    scales = t["scale"].to_numpy(zero_copy_only=False)
    codes = np.vstack(t["q"].to_numpy(zero_copy_only=False))
    for i in (0, 7, 199):  # scalar spot-check of the exact rule
        s = np.abs(mat[i]).max() / 127.0
        assert scales[i] == pytest.approx(s, rel=0, abs=0)
        np.testing.assert_array_equal(
            codes[i], np.clip(np.round(mat[i] / s), -127, 127).astype(np.int8))
    # per-element reconstruction error <= scale/2 (round-to-nearest)
    recon = codes.astype(np.float64) * scales[:, None]
    assert (np.abs(recon - mat) <= scales[:, None] / 2 + 1e-12).all()
    # zero vector: scale falls back to 1.0, all-zero codes
    tz = _quantized_table(np.zeros((3, 8)))
    assert tz["scale"].to_pylist() == [1.0] * 3
    assert all(v == [0] * 8 for v in tz["q"].to_pylist())


def test_quantized_cosine_preserves_topk():
    from siteone_crawler_ray.stages.similarity import (
        dequantize_matrix,
        quantized_cosine,
    )

    mat = _clustered(n=300)
    t = _quantized_table(mat)
    scales = t["scale"].to_numpy(zero_copy_only=False)
    codes = np.vstack(t["q"].to_numpy(zero_copy_only=False))

    def cos(m):
        n = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return n @ n.T

    exact, approx = cos(mat), cos(dequantize_matrix(t))
    # int8 scalar quantization at ~2.4 decimal digits: top-10 recall
    # >= 0.9 averaged over queries on clustered data
    recalls = []
    for qi in range(0, 300, 17):
        te = set(np.argsort(-exact[qi])[1:11])
        ta = set(np.argsort(-approx[qi])[1:11])
        recalls.append(len(te & ta) / 10)
    assert np.mean(recalls) >= 0.9, f"mean top-10 recall {np.mean(recalls)}"
    # the integer-arithmetic serving kernel equals the dequantized float
    # cosine (same numbers, computed the int8 way)
    q = quantized_cosine(codes[0], scales[0], codes[1], scales[1])
    assert q == pytest.approx(approx[0, 1], abs=1e-9)
