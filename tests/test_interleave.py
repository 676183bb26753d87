"""Interleaved text+image sample assembly vs a DuckDB window-SQL oracle.

The Ray path decodes REAL PNG bytes for the dims lookup; the oracle
gets analytically-built dims — so one test cross-checks the decode AND
the assembly math (segment order, whitespace tokens, image drop,
budget-cut sample indices)."""

import duckdb
import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"
BUDGET = 96
IMG_TOKENS = 64


def _analytic_dims(idx: int) -> tuple[int, int]:
    return 8 + idx % 16, 8 + (idx * 7) % 13


def _assets() -> tuple[pa.Table, dict]:
    """64 /static/img/{i}.png assets: real PNG payloads with analytic
    dims, except idx%10==3 which are undecodable junk (MMC4 drop)."""
    from siteone_crawler_ray.stages.multimodal import encode_png

    refs, payloads, dims = [], [], {}
    for idx in range(64):
        ref = f"/static/img/{idx}.png"
        refs.append(ref)
        if idx % 10 == 3:
            payloads.append(b"\x00not-an-image")
        else:
            w, h = _analytic_dims(idx)
            payloads.append(encode_png(np.full((h, w), idx, dtype=np.uint8)))
            dims[ref] = (w, h)
    return pa.table({"media_ref": pa.array(refs),
                     "payload": pa.array(payloads, pa.binary())}), dims


def test_decode_dims_matches_analytic():
    from siteone_crawler_ray.stages.interleave import decode_dims

    assets, want = _assets()
    assert decode_dims(assets) == want  # junk refs omitted, dims exact


def test_assemble_interleaved_matches_duckdb_oracle(ray_session):
    import ray.data as rd

    from siteone_crawler_ray.sources.corpus import interleaved_from_testdata
    from siteone_crawler_ray.stages.interleave import (
        assemble_interleaved, decode_dims)

    docs = interleaved_from_testdata(SF)["documents"]
    assets, analytic = _assets()
    dims = decode_dims(assets)

    nb = 7
    step = -(-docs.num_rows // nb)
    ds = rd.from_arrow([docs.slice(i * step, step) for i in range(nb)])
    got = assemble_interleaved(ds, dims, budget=BUDGET,
                               img_tokens=IMG_TOKENS).to_arrow_refs()
    import ray
    got = pa.concat_tables([t for t in ray.get(got) if t.num_rows])

    con = duckdb.connect()
    con.register("docs", docs)
    con.register("dims", pa.table({
        "media_ref": pa.array(list(analytic)),
        "w": pa.array([v[0] for v in analytic.values()], pa.int64()),
        "h": pa.array([v[1] for v in analytic.values()], pa.int64()),
    }))
    oracle = con.sql(f"""
        WITH seg AS (
          SELECT doc_id, u.kind AS kind, u.text AS text,
                 u.media_ref AS media_ref, pos
          FROM (SELECT doc_id, unnest(spans) AS u,
                       generate_subscripts(spans, 1) AS pos FROM docs)
        ), kept AS (
          SELECT s.doc_id, s.pos, s.kind,
                 CASE WHEN s.kind IN ('title','text')
                      THEN len(string_split(s.text, ' '))
                      ELSE {IMG_TOKENS} END::BIGINT AS token_count,
                 CASE WHEN s.kind = 'img' THEN s.media_ref ELSE '' END AS media_ref,
                 COALESCE(m.w, 0) AS width, COALESCE(m.h, 0) AS height
          FROM seg s LEFT JOIN dims m ON s.media_ref = m.media_ref
          WHERE s.kind IN ('title','text')
             OR (s.kind = 'img' AND m.media_ref IS NOT NULL)
        )
        SELECT doc_id,
               ROW_NUMBER() OVER w - 1 AS seg_idx,
               (SUM(token_count) OVER w - token_count) // {BUDGET} AS sample_idx,
               kind, token_count, media_ref, width, height
        FROM kept
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
        ORDER BY doc_id, seg_idx
    """).arrow()

    mine = got.sort_by([("doc_id", "ascending"), ("seg_idx", "ascending")])
    oracle = oracle.select(mine.column_names).cast(mine.schema)
    assert mine.equals(oracle)

    # image-drop really happened: junk refs appear in docs but never in
    # the output; resolvable ones do appear
    out_refs = set(r for r in mine["media_ref"].to_pylist() if r)
    assert out_refs and all(r in analytic for r in out_refs)
    dropped = {f"/static/img/{i}.png" for i in range(64) if i % 10 == 3}
    import pyarrow.compute as pc
    flat = docs["spans"].combine_chunks()
    all_doc_refs = set(pc.list_flatten(flat).field("media_ref").to_pylist())
    assert dropped & all_doc_refs  # the corpus does reference junk imgs
    assert not (dropped & out_refs)

    # budget cut really multi-samples long docs
    assert mine["sample_idx"].to_numpy(zero_copy_only=False).max() >= 1
