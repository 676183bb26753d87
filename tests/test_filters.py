"""Cuckoo / bloom / exact-set membership behavior."""

import numpy as np

from siteone_crawler_ray.state.filters import BloomFilter, CuckooFilter, ExactSeenSet


def _keys(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(1, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_cuckoo_no_false_negatives():
    cf = CuckooFilter(capacity=5000)
    ks = _keys(5000)
    cf.add_batch(ks)
    assert cf.contains_batch(ks).all()


def test_cuckoo_low_false_positive_rate():
    cf = CuckooFilter(capacity=5000)
    cf.add_batch(_keys(5000, seed=1))
    other = _keys(20000, seed=2)
    fpr = cf.contains_batch(other).mean()
    assert fpr < 0.01, fpr


def test_cuckoo_overflow_spills_not_drops():
    cf = CuckooFilter(capacity=64)
    ks = _keys(600, seed=3)  # way past capacity → forces eviction failures
    cf.add_batch(ks)
    assert cf.contains_batch(ks).all()  # still no false negatives


def test_bloom_membership():
    bf = BloomFilter(capacity=10000)
    ks = _keys(10000, seed=4)
    bf.add_batch(ks)
    assert bf.contains_batch(ks).all()
    fpr = bf.contains_batch(_keys(20000, seed=5)).mean()
    assert fpr < 0.01, fpr


def test_exact_seen_set():
    s = ExactSeenSet()
    a, b = _keys(1000, seed=6), _keys(1000, seed=7)
    s.add_batch(a)
    assert s.contains_batch(a).all()
    assert not s.contains_batch(b).any()
    s.compact()
    s.add_batch(b[:10])
    got = s.contains_batch(b)
    assert got[:10].all() and not got[10:].any()
    assert len(s) == 1010
    snap = s.snapshot()
    s2 = ExactSeenSet(snap)
    assert s2.contains_batch(a).all() and len(s2) == len(s)
