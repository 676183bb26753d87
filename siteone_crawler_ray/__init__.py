"""siteone_crawler_ray — a Ray-Data-native crawl / data-processing engine.

Brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference janreges/siteone-crawler (Rust, at
/root/reference).  Architecture is Ray-Data-first:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy
  Arrow batches for every per-record transform,
- actor pools for stateful stages (fetch with per-host politeness
  token buckets, frontier shards with cuckoo-filter URL-seen sets),
- ``groupby`` / ``aggregate`` / ``sort`` shuffles for the wide steps
  (dedup, report tables, sitemap ordering).

Layout:

- ``functions/``  pure vectorized kernels (hashing, URL canonicalization,
                  robots.txt, text metrics)
- ``state/``      membership filters (cuckoo/bloom) and checkpoint manifests
- ``sources/``    corpus generation + keyed columnar lookup (Lance-style;
                  parquet used as the columnar store since ``lance`` is not
                  available in this environment)
- ``stages/``     map_batches stage bodies (span extraction, fetch actors,
                  frontier shards, analyzers, dedup, similarity, multimodal)
- ``pipelines/``  the epoch crawl driver, report aggregations, exporters,
                  and the single-threaded reference-semantics oracle
"""

__version__ = "0.1.0"
