"""Interleaved text+image training-sample assembly (MMC4 / OBELICS shape).

Public recipe references: Zhu et al. 2023 (Multimodal C4 — images
interleaved into text at their in-document positions) and Laurençon et
al. 2023 (OBELICS).  Given the engine's interleaved-document corpus
(``doc_id``, ``spans`` — the north rule's input shape) and a
media-dimensions lookup resolved from REAL pure-Python decodes
(``stages/multimodal.decode_image``), emit one row per retained
segment, training-sample-ready:

  (doc_id, seg_idx, sample_idx, kind, token_count, media_ref,
   width, height)

Semantics
---------
- ``title``/``text`` spans become text segments; ``token_count`` is the
  engine's SQL-matchable whitespace rule ``count(' ')+1``
  (``stages/textstats.token_counts``).
- ``img`` spans become image segments when their ``media_ref`` resolves
  in the dims lookup — MMC4 drops images it cannot fetch/decode — at a
  fixed ``img_tokens`` budget cost (the vision-encoder patch count).
- Span ORDER is preserved (the north-rule per-row invariant: kind /
  text / media_ref / order equality), and
  ``sample_idx = floor(tokens_before_segment / budget)`` — a stateless
  cut rule equal to a SQL window sum, so the whole assembly has a
  DuckDB oracle (``tests/test_interleave.py``).

Scale shape
-----------
The dims lookup is the SMALL side (one row per distinct asset):
``ray.put`` once, read zero-copy from the local object store inside
every task — never re-shipped per batch.  The explode is the zero-copy
Arrow ``list_flatten`` / ``list_parent_indices`` kernel (the
``stages/extract.explode_spans`` idiom); per-document math is
batch-local because one input row is one whole document, so the
operator is shuffle-free end to end.  At 100 TB with an asset table too
big to broadcast, resolve dims with ``stages/join.hash_join`` on
``media_ref`` first (the runtime bloom filter prunes unreferenced
assets before the exchange) and feed the joined rows here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TEXT_KINDS = ("title", "text")


def decode_dims(assets: pa.Table, ref_col: str = "media_ref",
                payload_col: str = "payload") -> dict[str, tuple[int, int]]:
    """media assets → {media_ref: (width, height)} via the REAL codecs.
    Assets that no codec can decode are omitted (MMC4 image-drop)."""
    from .multimodal import decode_image

    out: dict[str, tuple[int, int]] = {}
    refs = assets[ref_col].to_pylist()
    payloads = assets[payload_col].to_pylist()
    for ref, payload in zip(refs, payloads):
        try:
            px = decode_image(payload)
        except NotImplementedError:
            continue
        out[ref] = (int(px.shape[1]), int(px.shape[0]))
    return out


def assemble_batch(batch: pa.Table, dims: dict[str, tuple[int, int]],
                   budget: int, img_tokens: int) -> pa.Table:
    """Vectorized per-batch assembly kernel (documents → segments)."""
    spans = batch["spans"]
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kind = flat.field("kind").to_numpy(zero_copy_only=False)
    ref = flat.field("media_ref").to_numpy(zero_copy_only=False)

    is_text = np.isin(kind, _TEXT_KINDS)
    is_img = kind == "img"
    width = np.zeros(len(kind), dtype=np.int64)
    height = np.zeros(len(kind), dtype=np.int64)
    if is_img.any():
        img_pos = np.nonzero(is_img)[0]
        for i in img_pos:  # few img spans per doc; dict probe is the op
            wh = dims.get(ref[i])
            if wh is None:
                is_img[i] = False
            else:
                width[i], height[i] = wh
    keep = is_text | is_img
    if not keep.any():
        return pa.table({
            "doc_id": pa.array([], pa.string()),
            "seg_idx": pa.array([], pa.int64()),
            "sample_idx": pa.array([], pa.int64()),
            "kind": pa.array([], pa.string()),
            "token_count": pa.array([], pa.int64()),
            "media_ref": pa.array([], pa.string()),
            "width": pa.array([], pa.int64()),
            "height": pa.array([], pa.int64()),
        })

    # whitespace token count over ALL spans (vectorized), used where text
    n_tok = pc.add(pc.count_substring(flat.field("text"), " "), 1) \
        .cast(pa.int64()).to_numpy(zero_copy_only=False).copy()
    n_tok[is_img] = img_tokens

    kidx = np.nonzero(keep)[0]
    kparent = parent[kidx]
    ktok = n_tok[kidx]

    # per-doc segment index + tokens-before (grouped cumsum, no loop)
    n = len(kidx)
    first = np.ones(n, dtype=bool)
    first[1:] = kparent[1:] != kparent[:-1]
    starts = np.nonzero(first)[0]
    counts = np.diff(np.append(starts, n))
    seg_idx = np.arange(n, dtype=np.int64) - np.repeat(starts, counts)
    c = np.cumsum(ktok)
    group_base = np.repeat(c[starts] - ktok[starts], counts)
    before = c - ktok - group_base
    sample_idx = before // budget

    doc_ids = batch["doc_id"].take(pa.array(kparent, pa.int64()))
    out_ref = ref[kidx].copy()
    out_ref[~is_img[kidx]] = ""
    return pa.table({
        "doc_id": doc_ids.combine_chunks() if isinstance(doc_ids, pa.ChunkedArray) else doc_ids,
        "seg_idx": pa.array(seg_idx),
        "sample_idx": pa.array(sample_idx),
        "kind": pa.array(kind[kidx]),
        "token_count": pa.array(ktok),
        "media_ref": pa.array(out_ref),
        "width": pa.array(width[kidx]),
        "height": pa.array(height[kidx]),
    })


def assemble_interleaved(docs_ds, dims, budget: int = 256,
                         img_tokens: int = 64):
    """documents Dataset → interleaved-segment Dataset (streaming,
    shuffle-free).  ``dims`` is a {media_ref: (w, h)} dict or an
    ObjectRef of one (broadcast once with ``ray.put``)."""
    import ray

    dims_ref = dims if isinstance(dims, ray.ObjectRef) else ray.put(dims)

    def fn(batch: pa.Table) -> pa.Table:
        return assemble_batch(batch, ray.get(dims_ref), budget, img_tokens)

    return docs_ds.map_batches(fn, batch_format="pyarrow")
