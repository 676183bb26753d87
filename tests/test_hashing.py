"""xxhash64 correctness: known vectors + scalar/vectorized bit-equality."""

import random
import string

import numpy as np
import pyarrow as pa

from siteone_crawler_ray.functions.hashing import uq_id, xxh64, xxh64_strings

# Published XXH64 test vectors (xxHash spec / widely mirrored).
KNOWN = [
    (b"", 0, 0xEF46DB3751D8E999),
    (b"a", 0, 0xD24EC4F1A98C6E5B),
    (b"abc", 0, 0x44BC2CF5AD770999),
]


def test_known_vectors_scalar():
    for data, seed, want in KNOWN:
        assert xxh64(data, seed) == want


def test_known_vectors_vectorized():
    datas = [d for d, _, _ in KNOWN]
    got = xxh64_strings(pa.array([d.decode() for d in datas]))
    for (_, _, want), g in zip(KNOWN, got):
        assert int(g) == want


def test_scalar_vs_vectorized_random():
    rng = random.Random(1234)
    alphabet = string.printable
    samples = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 200))) for _ in range(500)]
    # exercise every length class around the 32-byte stripe and 8/4/1 tails
    samples += ["x" * k for k in range(0, 70)]
    got = xxh64_strings(pa.array(samples))
    for s, g in zip(samples, got):
        assert int(g) == xxh64(s), repr(s)


def test_vectorized_inputs_kinds():
    urls = ["https://example.com/a?b=1", "https://example.com/a?b=1", "http://x.test/"]
    a = xxh64_strings(pa.array(urls))
    b = xxh64_strings(urls)
    c = xxh64_strings(pa.chunked_array([pa.array(urls[:1]), pa.array(urls[1:])]))
    assert np.array_equal(a, b) and np.array_equal(a, c)
    assert a[0] == a[1] != a[2]
    # sliced arrays honor offsets
    sl = pa.array(["pad", *urls]).slice(1)
    assert np.array_equal(xxh64_strings(sl), a)


def test_seeded():
    s = ["hello world" * 5]
    assert int(xxh64_strings(pa.array(s), seed=42)[0]) == xxh64(s[0], seed=42)


def test_uq_id_matches_md5_prefix():
    # reference: first 8 hex chars of MD5(full_url) — crawler.rs:1642-1649
    import hashlib

    u = "https://example.com/path?q=1"
    assert uq_id(u) == hashlib.md5(u.encode()).hexdigest()[:8]
    assert len(uq_id(u)) == 8
