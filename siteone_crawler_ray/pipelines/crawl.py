"""The epoch (BFS-wave) crawl driver — SURVEY.md §4.3.

The reference's continuous work-queue loop (/root/reference/src/engine/
crawler.rs:222-369) becomes a bulk-synchronous wave loop with identical
output under the canonical (workers=1-equivalent) ordering contract of
SURVEY.md §3.2:

    wave e = drain(shards) sorted by priority
    fetch  = Ray Data: from_arrow(wave) → map_batches(FetchStage actors)
             → write_parquet(ckpt/visited/epoch=e)      # checkpoint IS lineage
    extract= read_parquet(spans columns) → explode_spans
             → map_batches(CandidateGauntlet actors)    # canonicalize+filters
    admit  = dedup first-wins by priority → shard contains → caps → offer

Priority packs (source wave position, span extraction index); visited
``seq`` is the wave-sorted global rank — equal to the reference's FIFO
pop order for workers=1 with deterministic intra-page link order.

Limit parity (crawler.rs:1219-1306): the reference checks
``queue+visited >= max_visited`` and ``queue >= max_queue_length`` at
enqueue.  In wave order those conditions reduce to closed forms
(derivation in select_accepted's docstring); when a cap can bind we run
an exact sequential simulation over the epoch's candidates, otherwise a
vectorized fast path.  The non-200 basename guard is epoch-consistent:
counts aggregated per wave, blocklist broadcast to the next wave's
gauntlet (deterministic refinement of the reference's racy counter —
SURVEY.md §7.5).

Checkpoint/resume: per-epoch manifests with per-shard seen snapshots,
pending queues, visited/skipped parquet and metric lineage; resume
restores the latest complete epoch and reproduces the uninterrupted
run byte-for-byte (tested).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field, asdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..functions import urls as U
from ..functions.hashing import uq_ids, xxh64_strings
from ..functions.robots import RobotsIndex
from ..stages.extract import PRIO_SHIFT, CandidateGauntlet, explode_spans
from ..stages.fetch import FetchStage
from ..stages.frontier import FrontierShardState, shard_of
from ..types import UrlSource


@dataclass
class CrawlConfig:
    # reference defaults: README.md:546-573, crawler.rs:1219-1306
    max_visited_urls: int = 10000
    max_queue_length: int = 9000
    max_url_length: int = 2083
    max_non200_per_basename: int = 5
    max_depth: int | None = None
    remove_query_params: bool = False
    keep_query_params: tuple = ()
    allowed_domains_crawl: tuple = ()
    allowed_domains_static: tuple = ()
    include_regex: tuple = ()
    ignore_regex: tuple = ()
    ignore_robots_txt: bool = False
    max_reqs_per_sec: float | None = None  # None → politeness off (corpus mode)
    # physical execution
    num_shards: int = 8
    fetch_concurrency: int = 4
    fetch_batch_size: int = 2048
    gauntlet_concurrency: int = 4
    filter_capacity: int = 1 << 20
    use_ray: bool = True  # False → in-process loop (unit tests / oracle-speed runs)
    # waves smaller than this run in-process (identical code path/output):
    # Ray Data execution has ~1s fixed cost per Dataset run, which dominates
    # BFS tail epochs with a handful of URLs.  At 100 TB waves are millions
    # of rows and always take the Ray path.
    ray_wave_threshold: int = 512

    def fingerprint(self) -> str:
        from ..functions.hashing import xxh64

        return f"{xxh64(json.dumps(asdict(self), sort_keys=True, default=str)):016x}"


@dataclass
class CrawlResult:
    workdir: str
    visited_dir: str
    skipped: pa.Table
    seen_keys: np.ndarray
    metrics: dict = field(default_factory=dict)

    def visited_table(self, columns: list[str] | None = None) -> pa.Table:
        t = pq.read_table(self.visited_dir, columns=columns, partitioning=None)
        return t.take(pc.sort_indices(t, sort_keys=[("seq", "ascending")]))


_DISPATCH_FIELDS = [
    ("url", pa.string()),
    ("url_key", pa.uint64()),
    ("host", pa.string()),
    ("depth", pa.int32()),
    ("priority", pa.int64()),
    ("source_uq_id", pa.string()),
    ("source_attr", pa.int8()),
]


class EpochCrawler:
    """Driver object holding shard handles + loop state."""

    def __init__(
        self,
        corpus_path: str,
        seeds: list[str],
        robots_bodies: dict[str, str],
        workdir: str,
        config: CrawlConfig | None = None,
    ):
        self.corpus_path = corpus_path
        self.cfg = config or CrawlConfig()
        self.workdir = workdir
        os.makedirs(workdir, exist_ok=True)
        self.robots = RobotsIndex.from_bodies(robots_bodies)
        self.seed_urls = seeds
        self.seed_host = U.host_of(seeds[0]) if seeds else ""
        self.epoch = 0
        self.visited_count = 0
        self.basename_counts: dict[str, int] = {}
        self.skipped_keys: set[int] = set()
        self.skipped_parts: list[pa.Table] = []
        self.metrics: dict = {"epochs": []}
        self._shards: list = []
        self._use_ray = self.cfg.use_ray

    # -- shard plumbing (works with or without Ray) -------------------------
    def _make_shards(self):
        if self._use_ray:
            from ..stages.frontier import make_shard_actors

            self._shards = make_shard_actors(self.cfg.num_shards, self.cfg.filter_capacity)
        else:
            self._shards = [
                FrontierShardState(i, self.cfg.filter_capacity) for i in range(self.cfg.num_shards)
            ]

    def _shard_call(self, method: str, per_shard_args: list[tuple] | None = None) -> list:
        if self._use_ray:
            import ray

            if per_shard_args is None:
                return ray.get([getattr(s, method).remote() for s in self._shards])
            return ray.get(
                [getattr(s, method).remote(*a) for s, a in zip(self._shards, per_shard_args)]
            )
        if per_shard_args is None:
            return [getattr(s, method)() for s in self._shards]
        return [getattr(s, method)(*a) for s, a in zip(self._shards, per_shard_args)]

    def _contains(self, keys: np.ndarray) -> np.ndarray:
        """Batched membership across shards (one call per shard)."""
        sh = shard_of(keys, self.cfg.num_shards)
        out = np.zeros(len(keys), dtype=bool)
        idxs = [np.nonzero(sh == i)[0] for i in range(self.cfg.num_shards)]
        res = self._shard_call("contains", [(keys[ix],) for ix in idxs])
        for ix, r in zip(idxs, res):
            out[ix] = r
        return out

    def _offer(self, entries: pa.Table) -> None:
        keys = entries["url_key"].to_numpy(zero_copy_only=False)
        sh = shard_of(keys, self.cfg.num_shards)
        args = []
        for i in range(self.cfg.num_shards):
            mask = sh == i
            args.append((entries.filter(pa.array(mask)),))
        self._shard_call("offer", args)

    # -- seeding ------------------------------------------------------------
    def seed(self) -> None:
        self._make_shards()
        canon = []
        for u in self.seed_urls:
            c = U.canonicalize(u, u, remove_query_params=self.cfg.remove_query_params,
                               keep_query_params=self.cfg.keep_query_params)
            if c is not None and len(c) <= self.cfg.max_url_length:
                canon.append(c)
        keys = xxh64_strings(canon) if canon else np.empty(0, np.uint64)
        # dedup in order; enqueue caps apply to seeds too (add_url_to_queue)
        seen: set[int] = set()
        rows = []
        for order, (u, k) in enumerate(zip(canon, keys)):
            if int(k) in seen:
                continue
            if len(rows) >= self.cfg.max_visited_urls or len(rows) >= self.cfg.max_queue_length:
                break
            seen.add(int(k))
            rows.append((u, int(k), U.host_of(u), 0, order, "", UrlSource.INIT_URL))
        entries = _dispatch_table(rows)
        self._offer(entries)

    # -- one epoch ----------------------------------------------------------
    def run_epoch(self) -> int:
        """Process one wave; returns number of pages visited (0 → done)."""
        t0 = time.perf_counter()
        parts = [p for p in self._shard_call("drain") if p is not None and p.num_rows]
        if not parts:
            return 0
        wave = pa.concat_tables(parts)
        wave = wave.take(pc.sort_indices(wave, sort_keys=[("priority", "ascending")]))
        W = wave.num_rows
        wave = wave.append_column("seq", pa.array(self.visited_count + np.arange(W), type=pa.int64()))
        wave = wave.append_column("wavepos", pa.array(np.arange(W), type=pa.int64()))
        wave = wave.append_column("epoch", pa.array(np.full(W, self.epoch), type=pa.int32()))

        vdir = os.path.join(self.workdir, "visited", f"epoch={self.epoch}")
        ray_epoch = self._use_ray and W >= self.cfg.ray_wave_threshold
        t_fetch = time.perf_counter()
        self._run_fetch(wave, vdir, ray_epoch)
        t_fetch = time.perf_counter() - t_fetch

        t_cand = time.perf_counter()
        cands = self._run_extract(vdir, ray_epoch)
        n_cands = cands.num_rows
        self._record_skips(cands)
        self._admit(cands, W)
        t_cand = time.perf_counter() - t_cand

        self._update_basename_guard(vdir)
        self.visited_count += W
        self.epoch += 1
        self.metrics["epochs"].append(
            {
                "epoch": self.epoch - 1,
                "wave": W,
                "candidates": int(n_cands),
                "fetch_sec": round(t_fetch, 4),
                "frontier_sec": round(t_cand, 4),
                "total_sec": round(time.perf_counter() - t0, 4),
            }
        )
        self._checkpoint()
        return W

    def _run_fetch(self, wave: pa.Table, vdir: str, ray_epoch: bool) -> None:
        fetch_kwargs = dict(
            corpus_path=self.corpus_path,
            max_reqs_per_sec=self.cfg.max_reqs_per_sec,
            budget_split=self.cfg.fetch_concurrency,
        )
        if ray_epoch:
            import ray.data as rd

            nblocks = max(1, min(self.cfg.fetch_concurrency * 2, -(-wave.num_rows // self.cfg.fetch_batch_size)))
            # driver-side slicing (zero-copy) instead of a repartition shuffle
            step = -(-wave.num_rows // nblocks)
            ds = rd.from_arrow([wave.slice(i, step) for i in range(0, wave.num_rows, step)])
            ds = ds.map_batches(
                FetchStage,
                fn_constructor_kwargs=fetch_kwargs,
                batch_format="pyarrow",
                batch_size=self.cfg.fetch_batch_size,
                concurrency=min(self.cfg.fetch_concurrency, nblocks),
            )
            ds.write_parquet(vdir)
        else:
            os.makedirs(vdir, exist_ok=True)
            out = FetchStage(**fetch_kwargs)(wave)
            pq.write_table(out, os.path.join(vdir, "part-0.parquet"))

    def _gauntlet_kwargs(self) -> dict:
        return dict(
            robots=self.robots,
            seed_host=self.seed_host,
            remove_query_params=self.cfg.remove_query_params,
            keep_query_params=self.cfg.keep_query_params,
            allowed_domains_crawl=self.cfg.allowed_domains_crawl,
            allowed_domains_static=self.cfg.allowed_domains_static,
            include_regex=self.cfg.include_regex,
            ignore_regex=self.cfg.ignore_regex,
            max_url_length=self.cfg.max_url_length,
            max_depth=self.cfg.max_depth,
            ignore_robots_txt=self.cfg.ignore_robots_txt,
            basename_blocklist=frozenset(
                b for b, c in self.basename_counts.items() if c >= self.cfg.max_non200_per_basename
            ),
        )

    EXTRACT_COLUMNS = ["doc_id", "spans", "seq", "wavepos", "depth", "uq_id"]

    def _run_extract(self, vdir: str, ray_epoch: bool) -> pa.Table:
        if ray_epoch:
            import ray
            import ray.data as rd

            ds = rd.read_parquet(vdir, columns=self.EXTRACT_COLUMNS)
            ds = ds.map_batches(_parsed_pages_only, batch_format="pyarrow")
            ds = ds.map_batches(explode_spans, batch_format="pyarrow")
            ds = ds.map_batches(
                CandidateGauntlet,
                fn_constructor_kwargs=self._gauntlet_kwargs(),
                batch_format="pyarrow",
                batch_size=8192,
                concurrency=self.cfg.gauntlet_concurrency,
            )
            blocks = [ray.get(ref) for ref in ds.to_arrow_refs()]
            blocks = [b for b in blocks if b.num_rows]
            return pa.concat_tables(blocks) if blocks else _empty_cand_table()
        t = pq.read_table(vdir, columns=self.EXTRACT_COLUMNS)
        t = _parsed_pages_only(t)
        if not t.num_rows:
            return _empty_cand_table()
        found = explode_spans(t)
        return CandidateGauntlet(**self._gauntlet_kwargs())(found)

    def _record_skips(self, cands: pa.Table) -> None:
        """First-wins (priority order) dedup of skip records — the
        reference's skipped.contains_key insert (crawler.rs:1093-1124)."""
        sk = cands.filter(pc.equal(cands["tag"], "skip"))
        if not sk.num_rows:
            return
        sk = sk.take(pc.sort_indices(sk, sort_keys=[("priority", "ascending")]))
        keys = sk["url_key"].to_numpy(zero_copy_only=False)
        keep = []
        for i, k in enumerate(keys):
            ik = int(k)
            if ik not in self.skipped_keys:
                self.skipped_keys.add(ik)
                keep.append(i)
        if keep:
            self.skipped_parts.append(
                sk.take(pa.array(keep)).select(
                    ["url", "url_key", "reason", "source_uq_id", "source_attr"]
                )
            )

    def _admit(self, cands: pa.Table, wave_size: int) -> None:
        ok = cands.filter(pc.equal(cands["tag"], "ok"))
        if not ok.num_rows:
            return
        ok = ok.take(pc.sort_indices(ok, sort_keys=[("priority", "ascending")]))
        keys = ok["url_key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        prios = ok["priority"].to_numpy(zero_copy_only=False)
        # first occurrence per key in priority order
        _, first_idx = np.unique(keys, return_index=True)
        first_idx.sort()
        seen = np.ones(ok.num_rows, dtype=bool)
        seen_winners = self._contains(keys[first_idx])
        seen[first_idx] = seen_winners
        unseen_idx = first_idx[~seen_winners]

        V, W, cfg = self.visited_count, wave_size, self.cfg
        fast_ok = (
            V + W + len(unseen_idx) <= cfg.max_visited_urls
            and (W - 1) + len(unseen_idx) <= cfg.max_queue_length
        )
        if fast_ok:
            accepted_idx = unseen_idx
        else:
            # exact sequential enqueue simulation (caps bind) — see module
            # docstring; iterates ALL candidates in priority order because a
            # dropped first occurrence lets a later duplicate win
            wavepos = (prios // PRIO_SHIFT).astype(np.int64)
            seen_any = self._contains(keys)
            accepted: dict[int, int] = {}
            A = 0
            for i in range(ok.num_rows):
                k = int(keys[i])
                if seen_any[i] or k in accepted:
                    continue
                if V + W + A >= cfg.max_visited_urls:
                    continue
                if (W - 1 - int(wavepos[i])) + A >= cfg.max_queue_length:
                    continue
                accepted[k] = i
                A += 1
            accepted_idx = np.array(sorted(accepted.values()), dtype=np.int64)
        if len(accepted_idx) == 0:
            return
        win = ok.take(pa.array(accepted_idx))
        entries = pa.table(
            {
                "url": win["url"],
                "url_key": win["url_key"],
                "host": win["host"],
                "depth": win["depth"],
                "priority": win["priority"],
                "source_uq_id": win["source_uq_id"],
                "source_attr": win["source_attr"],
            }
        )
        self._offer(entries)

    def _update_basename_guard(self, vdir: str) -> None:
        t = pq.read_table(vdir, columns=["url", "status_code"])
        bad = t.filter(pc.not_equal(t["status_code"], 200))
        for u in bad["url"].to_pylist():
            b = U.basename_of(u)
            if b is not None:
                self.basename_counts[b] = self.basename_counts.get(b, 0) + 1

    # -- checkpoint / resume -------------------------------------------------
    def _checkpoint(self) -> None:
        e = self.epoch - 1
        sdir = os.path.join(self.workdir, "shards", f"epoch={e}")
        shard_meta = self._shard_call("checkpoint", [(sdir,) for _ in self._shards])
        if self.skipped_parts:
            pq.write_table(
                pa.concat_tables(self.skipped_parts),
                os.path.join(self.workdir, f"skipped-epoch{e}.parquet"),
            )
        manifest = {
            "epoch": e,
            "visited_count": self.visited_count,
            "basename_counts": self.basename_counts,
            "config": self.cfg.fingerprint(),
            "shards": shard_meta,
            "metrics": self.metrics["epochs"][-1],
        }
        tmp = os.path.join(self.workdir, "manifest.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.workdir, f"manifest-epoch{e}.json"))

    def resume(self) -> bool:
        """Restore the latest complete epoch; True if a checkpoint existed."""
        epochs = sorted(
            int(f.split("epoch")[1].split(".")[0])
            for f in os.listdir(self.workdir)
            if f.startswith("manifest-epoch")
        )
        if not epochs:
            return False
        e = epochs[-1]
        with open(os.path.join(self.workdir, f"manifest-epoch{e}.json")) as f:
            manifest = json.load(f)
        if manifest["config"] != self.cfg.fingerprint():
            raise ValueError("checkpoint config fingerprint mismatch")
        self._make_shards()
        sdir = os.path.join(self.workdir, "shards", f"epoch={e}")
        self._shard_call("restore", [(sdir,) for _ in self._shards])
        self.epoch = e + 1
        self.visited_count = manifest["visited_count"]
        self.basename_counts = dict(manifest["basename_counts"])
        skp = os.path.join(self.workdir, f"skipped-epoch{e}.parquet")
        if os.path.exists(skp):
            t = pq.read_table(skp)
            self.skipped_parts = [t]
            self.skipped_keys = set(int(k) for k in t["url_key"].to_numpy())
        # drop visited dirs from epochs after the checkpoint (partial work)
        vroot = os.path.join(self.workdir, "visited")
        if os.path.isdir(vroot):
            import shutil

            for d in os.listdir(vroot):
                if int(d.split("=")[1]) > e:
                    shutil.rmtree(os.path.join(vroot, d))
        return True

    # -- full run ------------------------------------------------------------
    def run(self, max_epochs: int = 10_000) -> CrawlResult:
        if not self._shards:
            self.seed()
        t0 = time.perf_counter()
        while self.epoch < max_epochs:
            if self.run_epoch() == 0:
                break
        total = time.perf_counter() - t0
        skipped = (
            pa.concat_tables(self.skipped_parts) if self.skipped_parts else _empty_skip_table()
        )
        seen = np.sort(np.concatenate(self._shard_call("snapshot_seen")))
        self.metrics["total_sec"] = round(total, 4)
        self.metrics["visited"] = self.visited_count
        self.metrics["candidates"] = int(sum(m["candidates"] for m in self.metrics["epochs"]))
        self.metrics["pages_per_sec"] = round(self.visited_count / max(total, 1e-9), 2)
        self.metrics["frontier_ops_per_sec"] = round(
            self.metrics["candidates"] / max(total, 1e-9), 2
        )
        return CrawlResult(
            workdir=self.workdir,
            visited_dir=os.path.join(self.workdir, "visited"),
            skipped=skipped,
            seen_keys=seen,
            metrics=self.metrics,
        )


def _parsed_pages_only(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.is_valid(batch["spans"]))


def _dispatch_table(rows: list[tuple]) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in _DISPATCH_FIELDS]
    return pa.table(
        {name: pa.array(list(vals), type=typ) for (name, typ), vals in zip(_DISPATCH_FIELDS, cols)}
    )


def _empty_cand_table() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "url_key": pa.array([], pa.uint64()),
            "host": pa.array([], pa.string()),
            "tag": pa.array([], pa.string()),
            "reason": pa.array([], pa.int8()),
            "source_uq_id": pa.array([], pa.string()),
            "source_attr": pa.array([], pa.int8()),
            "source_seq": pa.array([], pa.int64()),
            "priority": pa.array([], pa.int64()),
            "depth": pa.array([], pa.int32()),
        }
    )


def _empty_skip_table() -> pa.Table:
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "url_key": pa.array([], pa.uint64()),
            "reason": pa.array([], pa.int8()),
            "source_uq_id": pa.array([], pa.string()),
            "source_attr": pa.array([], pa.int8()),
        }
    )
