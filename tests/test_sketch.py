"""HyperLogLog sketch (stages/sketch.py): exact register arithmetic vs
a scalar reference, merge algebra, estimate accuracy, and the
distributed path's partition independence."""

import numpy as np
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _scalar_splitmix64(x):
    M = (1 << 64) - 1
    z = (x + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)


def _scalar_registers(keys, p=12):
    nbits = 32 - p
    reg = [0] * (1 << p)
    for k in keys:
        h32 = _scalar_splitmix64(int(k)) >> 32
        b, rem = h32 >> nbits, h32 & ((1 << nbits) - 1)
        rank = nbits + 1 if rem == 0 else nbits - rem.bit_length() + 1
        reg[b] = max(reg[b], rank)
    return np.array(reg, dtype=np.uint8)


def test_registers_match_scalar_reference():
    from siteone_crawler_ray.stages.sketch import hll_registers

    keys = np.arange(0, 50_000, 7, dtype=np.int64)
    np.testing.assert_array_equal(hll_registers(keys), _scalar_registers(keys))


def test_merge_algebra_and_partition_independence():
    from siteone_crawler_ray.stages.sketch import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    keys = np.arange(10_000, dtype=np.int64) * 13
    whole = hll_registers(keys)
    parts = [hll_registers(c) for c in np.array_split(keys, 7)]
    np.testing.assert_array_equal(hll_merge(*parts), whole)
    # idempotent + commutative
    np.testing.assert_array_equal(hll_merge(whole, whole), whole)
    np.testing.assert_array_equal(hll_merge(parts[2], parts[0]),
                                  hll_merge(parts[0], parts[2]))
    assert hll_estimate(hll_merge(*parts)) == hll_estimate(whole)


def test_estimate_accuracy_and_small_range():
    from siteone_crawler_ray.stages.sketch import hll_estimate, hll_registers

    # p=8 -> sigma ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma.  Sequential
    # keys are the adversarial case that killed the lattice-structured
    # multiplicative hash (10x off) — splitmix64 must hold there too.
    for n in (1_000, 20_000):
        for keys in (np.arange(n, dtype=np.int64),
                     np.arange(n, dtype=np.int64) * 1_000_003 + 17):
            est = hll_estimate(hll_registers(keys))
            assert abs(est - n) / n < 0.20, (n, est)
    # linear-counting branch: tiny cardinalities stay near-exact
    est = hll_estimate(hll_registers(np.arange(30, dtype=np.int64)))
    assert abs(est - 30) < 5


def test_distributed_matches_local():
    import ray.data as rd

    from siteone_crawler_ray.stages.sketch import (
        approx_distinct,
        hll_estimate,
        hll_registers,
    )

    keys = np.arange(5_000, dtype=np.int64) * 31
    t = pa.table({"k": pa.array(np.repeat(keys, 3))})  # dups change nothing
    step = 1_111
    ds = rd.from_arrow([t.slice(i, step) for i in range(0, t.num_rows, step)])
    assert approx_distinct(ds, "k") == hll_estimate(hll_registers(keys))
