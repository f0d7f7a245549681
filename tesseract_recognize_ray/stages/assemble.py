"""Span explode + per-document reassembly (reference G3/G4, J1; SURVEY.md §2.5-2.7).

``explode_*`` are vectorized pyarrow ``map_batches`` bodies that turn the
interleaved docs table (doc_id, spans:list<struct>) into flat span rows —
the Arrow equivalent of the reference's NamedImage worklist construction
(`/root/reference/tesseract-recognize.cc:383-532`).

``assemble_group`` is the engine's one required shuffle: a
``groupby(doc_id).map_groups`` that sorts each document's rows by the fully
data-carried order key (order=span offset, then page, block, para, line —
reference reading order O1, `:630-789`), assigns the dense output ``seq``,
and builds the reference's byte-exact element ids (M10, `:657-674,724-727`).

``fill_sentinel_words`` is G4: the reference's second global pass that
interpolates coords for Words carrying the sentinel "0,0 0,0" polygon
(`:816-858`) — three cases: both-neighbors interpolation, single-neighbor
1px extrapolation, parent-line copy; filled words are tagged like the
reference's ``coords-unk-filler`` Property.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# schema shared by exploded text spans and joined recognized spans, so the
# two streams union cleanly before the groupby shuffle. `kind` is 'text' for
# every normal span and 'error' for quarantined media rows — quarantined
# media must stay observable in the output, never silently vanish
UNION_COLS = ["doc_id", "order", "media_ref", "page", "n_pages", "block", "para", "line", "text", "conf", "kind"]

SPANS_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("seq", pa.int32()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("order", pa.int32()),
        ("region_id", pa.string()),
        ("line_id", pa.string()),
        ("conf", pa.float64()),
    ]
)


def _exploded(batch: pa.Table) -> tuple[pa.Array, pa.StructArray]:
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    return doc_ids, flat


def explode_text_spans(batch: pa.Table) -> pa.Table:
    """docs rows -> pass-through text span rows in UNION_COLS layout.

    Text spans flow through *untouched* (north_star): no trim, no recode."""
    doc_ids, flat = _exploded(batch)
    kind = flat.field("kind")
    mask = pc.equal(kind, "text")
    idx = pc.indices_nonzero(mask)
    n = len(idx)
    doc_ids = pc.take(doc_ids, idx)
    text = pc.take(flat.field("text"), idx)
    offset = pc.take(flat.field("offset"), idx)
    neg1 = pa.array(np.full(n, -1, dtype=np.int32))
    return pa.Table.from_arrays(
        [
            doc_ids,
            offset.cast(pa.int32()),
            pa.array([None] * n, pa.string()),
            neg1,
            pa.array(np.zeros(n, dtype=np.int32)),
            neg1,
            neg1,
            neg1,
            text,
            pa.array([None] * n, pa.float64()),
            pa.array(np.full(n, "text", dtype=object), pa.string()),
        ],
        names=UNION_COLS,
    )


def explode_media_map(batch: pa.Table) -> pa.Table:
    """docs rows -> (media_ref, doc_id, order) join side for recognized lines
    (J1; key media_ref is unique per span by corpus construction)."""
    doc_ids, flat = _exploded(batch)
    mask = pc.equal(flat.field("kind"), "media")
    idx = pc.indices_nonzero(mask)
    return pa.Table.from_arrays(
        [
            pc.take(flat.field("media_ref"), idx),
            pc.take(doc_ids, idx),
            pc.take(flat.field("offset"), idx).cast(pa.int32()),
        ],
        names=["media_ref", "doc_id", "order"],
    )


def recognized_to_union(batch: pa.Table) -> pa.Table:
    """Joined recognized rows -> UNION_COLS layout: line rows plus any
    level='error' quarantine rows (quarantined media flow through to the
    span output as kind='error' — observable, never silently dropped)."""
    if "level" in batch.schema.names:
        batch = batch.filter(pc.is_in(batch["level"], value_set=pa.array(["line", "error"])))
        kind = pc.if_else(pc.equal(batch["level"], "error"), "error", "text")
    else:
        kind = pa.array(np.full(batch.num_rows, "text", dtype=object), pa.string())
    arrays = [
        batch["doc_id"],
        batch["order"].cast(pa.int32()),
        batch["media_ref"],
        batch["page"].cast(pa.int32()),
        batch["n_pages"].cast(pa.int32()),
        batch["block"].cast(pa.int32()),
        batch["para"].cast(pa.int32()),
        batch["line"].cast(pa.int32()),
        batch["text"],
        batch["conf"].cast(pa.float64()),
        kind,
    ]
    return pa.Table.from_arrays(arrays, names=UNION_COLS)


def _assemble_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized G3 core over a frame holding ANY number of whole documents
    (every row of a doc must be present — guaranteed by the bucket/doc_id
    shuffle). Sort key carries the whole reading order in data (O1); ids
    follow the reference scheme byte-for-byte (M10): region 'b{block+1}' with
    'pg{page+1}_' prefix iff the media has multiple pages
    (tesseract-recognize.cc:660,669-670), line '{rid}_p{para+1}_l{line+1}'
    (:726); seq is the dense per-doc output index."""
    df = df.sort_values(["doc_id", "order", "page", "block", "para", "line"], kind="mergesort")
    n = len(df)
    seq = df.groupby("doc_id", sort=False).cumcount().to_numpy().astype(np.int32)
    is_media = df["media_ref"].notna().to_numpy()
    rid = np.full(n, None, dtype=object)
    lid = np.full(n, None, dtype=object)
    if is_media.any():
        page = df["page"].to_numpy()[is_media]
        n_pages = df["n_pages"].to_numpy()[is_media]
        block = df["block"].to_numpy()[is_media]
        para = df["para"].to_numpy()[is_media]
        line = df["line"].to_numpy()[is_media]
        prefix = np.where(
            n_pages > 1, np.char.add(np.char.add("pg", (page + 1).astype(str)), "_"), ""
        )
        r = np.char.add(np.char.add(prefix, "b"), (block + 1).astype(str))
        rid[is_media] = r.astype(object)
        lid[is_media] = np.char.add(
            np.char.add(np.char.add(np.char.add(r, "_p"), (para + 1).astype(str)), "_l"),
            (line + 1).astype(str),
        ).astype(object)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "seq": seq,
            "kind": (
                df["kind"].to_numpy()
                if "kind" in df.columns
                else np.full(n, "text", dtype=object)
            ),
            "text": df["text"].to_numpy(),
            "media_ref": df["media_ref"].to_numpy(),
            "order": df["order"].to_numpy().astype(np.int32),
            "region_id": rid,
            "line_id": lid,
            "conf": df["conf"].to_numpy(),
        }
    )


def assemble_group(df: pd.DataFrame) -> pd.DataFrame:
    """G3 for a single document group (kept for the per-doc groupby path and
    unit tests; the pipeline uses the bucketed variant below)."""
    return _assemble_frame(df)


def assemble_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """G3 for one hash bucket of documents: the per-group python overhead of
    groupby(doc_id).map_groups is amortized over thousands of docs by
    grouping on bucket = crc32(doc_id) % P instead — same co-location
    guarantee (all rows of a doc share a bucket), two orders of magnitude
    fewer group calls (SURVEY.md §4 skew/shuffle note)."""
    return _assemble_frame(df.drop(columns="__bucket"))


def add_doc_bucket(num_buckets: int):
    """UNION_COLS batch -> same + __bucket = stable_hash(doc_id) % num_buckets
    (vectorized fixed-key hash — process-stable, no per-row Python loop on
    the pipeline's hottest shuffle input)."""
    from ..hashing import stable_bucket

    def fn(batch: pa.Table) -> pa.Table:
        b = stable_bucket(batch.column("doc_id"), num_buckets)
        return batch.append_column("__bucket", pa.array(b))

    return fn


def fill_sentinel_words(words: pd.DataFrame, line_bbox: tuple[int, int, int, int]) -> pd.DataFrame:
    """G4 sentinel-coords filler for the words of ONE line, in word order
    (reference global pass 2, tesseract-recognize.cc:816-858).

    A word is sentinel when x0==y0==x1==y1==0 (the '0,0 0,0' quad, :160-161).
    Cases, per the reference:
      * prev and next real  -> span the gap: x from prev.x1 to next.x0
      * single neighbor     -> 1px extrapolation along the edge direction
      * no real neighbor    -> copy the parent line's bbox
    Adds a bool 'coords_filled' column (the 'coords-unk-filler' Property)."""
    w = words.copy().reset_index(drop=True)
    sent = (w["x0"] == 0) & (w["y0"] == 0) & (w["x1"] == 0) & (w["y1"] == 0)
    w["coords_filled"] = sent.to_numpy()
    real_idx = np.flatnonzero(~sent.to_numpy())
    for i in np.flatnonzero(sent.to_numpy()):
        prev_c = real_idx[real_idx < i]
        next_c = real_idx[real_idx > i]
        prev = w.iloc[prev_c[-1]] if prev_c.size else None
        nxt = w.iloc[next_c[0]] if next_c.size else None
        if prev is not None and nxt is not None:
            w.loc[i, ["x0", "y0", "x1", "y1"]] = [
                prev["x1"],
                min(prev["y0"], nxt["y0"]),
                nxt["x0"],
                max(prev["y1"], nxt["y1"]),
            ]
        elif prev is not None:
            w.loc[i, ["x0", "y0", "x1", "y1"]] = [prev["x1"], prev["y0"], prev["x1"] + 1, prev["y1"]]
        elif nxt is not None:
            w.loc[i, ["x0", "y0", "x1", "y1"]] = [nxt["x0"] - 1, nxt["y0"], nxt["x0"], nxt["y1"]]
        else:
            x0, y0, x1, y1 = line_bbox
            w.loc[i, ["x0", "y0", "x1", "y1"]] = [x0, y0, x1, y1]
    return w
