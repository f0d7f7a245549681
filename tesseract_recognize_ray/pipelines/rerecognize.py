"""Page-XML-input re-recognition — the reference's second entry point
(§3.2, `/root/reference/tesseract-recognize.cc:402-452,557-589`): load a
PAGE XML, select elements (the reference's default XPath is
`//_:TextRegion`, `:32,43`; TextLine/Word selection with node-level PSM
rules, `:560-588`), crop each selected element's bbox out of the page
raster (S5 `page.crop`, `:438-441`), re-run segmentation+recognition on
the crops, and attach results AT/BELOW the selected node (H2, `:663-666,
720-755`) — ``rerecognize_inplace`` writes the updated XML document back
(the reference's ``--inplace``, `:865`).

Ray-native shape, built for the 100 TB case:

  * the XML column parses in a vectorized ``map_batches`` (S4); element
    rows carry (media_ref, page, bbox) — crop REQUESTS are tiny;
  * the media table is never materialized on the driver and pixels never
    cross an operator boundary: a location index (media_ref -> parquet
    file + row group) is built by reading ONLY the media_ref column, crop
    requests are attached to their location (broadcast map or hash join —
    strings only either way), and a ``groupby(location)`` routes every
    request for a row group to ONE task, which reads that row group
    single-threaded, decodes each referenced page ONCE, and serves all its
    crops in place (same lifecycle as the reference's one-raster-at-a-time
    loop, `:540-548,790`);
  * crops are numpy views translated back to page coordinates via the
    (x, y) offsets the reference carries on NamedImage (`:445-448,677`).
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd
from ray.data import Dataset

from .. import ocr_core as oc
from ..config import PipelineConfig
from ..pagexml import parse_pagexml

RESULT_COLS = [
    "doc_id", "crop_id", "region_id", "line_id", "media_ref", "page",
    "x0", "y0", "x1", "y1", "text", "conf",
]


def _xml_to_crop_requests(level: str = "region", image_override: str | None = None):
    """(doc_id, xml) rows -> one request row per selected element with its
    page reference and bbox (the reference's crop worklist, `:438-441`).

    level='region' selects TextRegions (bbox = union of the region's line
    quads — lines re-emerge from the crop's own segmentation, exactly the
    reference re-segmenting inside the crop); 'line'/'word' select the
    individual elements with their own coords. ``image_override`` replaces
    the XML's imageFilename as the raster source (reference --image,
    `:414-420`)."""

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for row in batch.itertuples():
            els = parse_pagexml(row.xml)
            if len(els) == 0:
                continue

            def emit(fname, crop_id, odeg, coords, doc_id=row.doc_id):
                media_ref = fname.split("[")[0]
                page = int(fname.split("[")[1].rstrip("]")) if "[" in fname else 0
                xs = [p[0] for p in coords]
                ys = [p[1] for p in coords]
                out.append(
                    {
                        "doc_id": doc_id,
                        "crop_id": crop_id,
                        # media_ref stays the XML's identity (imageFilename)
                        # so write-back can find the node; src_ref is the
                        # raster actually read (--image swaps only the
                        # source, reference :414-420)
                        "media_ref": media_ref,
                        "src_ref": image_override if image_override is not None else media_ref,
                        "page": page,
                        # XML coords live in upright space; the Property
                        # records how the stored raster must rotate first
                        # (reference applies it to the image, :793-799)
                        "orientation_deg": int(odeg),
                        "x0": min(xs),
                        "y0": min(ys),
                        "x1": max(xs),
                        "y1": max(ys),
                    }
                )

            if level == "region":
                # key on (imageFilename, region_id): region ids restart at
                # b1 on every page image; only the pair is unique in a doc
                for (fname, rid), grp in els[els["level"] == "line"].groupby(
                    ["image_filename", "region_id"], sort=False
                ):
                    coords = [p for c in grp["coords"] for p in c]
                    emit(fname, rid, grp["orientation_deg"].iloc[0], coords)
            else:
                sel = els[(els["level"] == level) & els["coords"].notna()]
                for r in sel.itertuples():
                    emit(r.image_filename, r.line_id, r.orientation_deg, r.coords)
        return pd.DataFrame(
            out,
            columns=["doc_id", "crop_id", "media_ref", "src_ref", "page", "orientation_deg", "x0", "y0", "x1", "y1"],
        )

    return fn


# ----------------------------------------------------- media location index
def media_locations(files: list[str]) -> Dataset:
    """(media_ref, __path, __rg, __row_start, __row_count) — which parquet
    row group holds each media row, plus the group's row range (so callers
    like the partitioned runner can build read splits WITHOUT re-reading any
    footer). Built distributed, reading ONLY the media_ref column (strings;
    the pixel column never loads)."""
    splits = []
    for f in sorted(files):
        md = pq.read_metadata(f)
        start = 0
        for i in range(md.num_row_groups):
            n = md.row_group(i).num_rows
            splits.append({"path": f, "rg": i, "row_start": start, "row_count": n})
            start += n

    def read_refs(batch: pa.Table) -> pa.Table:
        refs, paths, rgs, starts, counts = [], [], [], [], []
        for path, rg, rs, rc in zip(
            batch.column("path").to_pylist(),
            batch.column("rg").to_pylist(),
            batch.column("row_start").to_pylist(),
            batch.column("row_count").to_pylist(),
        ):
            t = pq.ParquetFile(path).read_row_group(rg, columns=["media_ref"], use_threads=False)
            col = t.column("media_ref").to_pylist()
            refs.extend(col)
            paths.extend([path] * len(col))
            rgs.extend([rg] * len(col))
            starts.extend([rs] * len(col))
            counts.extend([rc] * len(col))
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "__path": pa.array(paths, pa.string()),
                "__rg": pa.array(rgs, pa.int32()),
                "__row_start": pa.array(starts, pa.int64()),
                "__row_count": pa.array(counts, pa.int64()),
            }
        )

    return rd.from_items(splits).map_batches(read_refs, batch_format="pyarrow")


def _attach_locations(reqs: Dataset, locs: Dataset, strategy: str, num_partitions: int) -> Dataset:
    """Give each crop request its (__path, __rg). 'broadcast' ships the
    string-only location map once via ray.put (bounded per shard — the J1
    assumption); 'hash' is the unbounded-corpus path (Dataset.join moves
    only request rows + location strings, never pixels)."""
    if strategy == "hash":
        return reqs.join(
            locs, join_type="inner", num_partitions=num_partitions, on=("src_ref",), right_on=("media_ref",)
        )
    mapping: dict[str, tuple[str, int]] = {}
    for b in locs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        mapping.update(
            zip(
                b.column("media_ref").to_pylist(),
                zip(b.column("__path").to_pylist(), b.column("__rg").to_pylist()),
            )
        )
    ref = ray.put(mapping)

    def lookup(batch: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        loc = [m.get(r) for r in batch["src_ref"]]
        keep = [i for i, v in enumerate(loc) if v is not None]
        batch = batch.iloc[keep].copy()
        batch["__path"] = [loc[i][0] for i in keep]
        batch["__rg"] = np.array([loc[i][1] for i in keep], dtype=np.int32)
        return batch

    return reqs.map_batches(lookup, batch_format="pandas")


def _make_loc_recognizer(only_layout: bool):
    """One task per (file, row group): read it single-threaded, decode each
    referenced page once, serve every crop request against it. Pixels live
    and die inside the task."""
    from ..fixtures import decode_raster, split_pages

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        path, rg = g["__path"].iloc[0], int(g["__rg"].iloc[0])
        tbl = pq.ParquetFile(path).read_row_group(rg, columns=["media_ref", "bytes"], use_threads=False)
        need = pa.array(list(set(g["src_ref"])), pa.string())
        tbl = tbl.filter(pc.is_in(tbl.column("media_ref"), value_set=need))
        blobs = {
            tbl.column("media_ref")[i].as_py(): tbl.column("bytes")[i].as_buffer()
            for i in range(tbl.num_rows)
        }
        rows = []
        for src_ref, sub in g.groupby("src_ref", sort=False):
            pages = split_pages(memoryview(blobs[src_ref]))
            for (page, odeg), sub2 in sub.groupby(["page", "orientation_deg"], sort=False):
                img = decode_raster(pages[int(page)])
                if odeg:
                    img = np.ascontiguousarray(np.rot90(img, {-90: 1, 180: 2, 90: 3}[int(odeg)]))
                for r in sub2.itertuples():
                    crop = img[int(r.y0) : int(r.y1), int(r.x0) : int(r.x1)]
                    k_up, s, bands = oc.analyse_orientation_u8(np.ascontiguousarray(crop))
                    up = np.rot90(crop, k_up) if k_up else crop
                    for b in bands:
                        ink = up[b.y0 : b.y1, b.x0 : b.x1] < oc.BIN_THRESHOLD
                        text, conf = (None, None) if only_layout else oc.recognize_line(ink, s)
                        rows.append(
                            {
                                "doc_id": r.doc_id,
                                "crop_id": r.crop_id,
                                # crop-prefixed id scheme for region-input
                                # recognition (M10, reference :663-666)
                                "region_id": f"{r.crop_id}_b{b.block + 1}",
                                "line_id": f"{r.crop_id}_b{b.block + 1}_p1_l{b.line + 1}",
                                "media_ref": r.media_ref,
                                "page": int(r.page),
                                # coords translated back to page space
                                # (NamedImage offsets, reference :445-448,677)
                                "x0": int(b.x0 + r.x0),
                                "y0": int(b.y0 + r.y0),
                                "x1": int(b.x1 + r.x0),
                                "y1": int(b.y1 + r.y0),
                                "text": text,
                                "conf": conf,
                            }
                        )
        return pd.DataFrame(rows, columns=RESULT_COLS)

    return fn


def rerecognize_pagexml(
    xml_ds: Dataset,
    media_path: str,
    cfg: PipelineConfig | None = None,
    level: str = "region",
    image_override: str | None = None,
    location_strategy: str = "broadcast",
) -> Dataset:
    """(doc_id, xml) dataset + media table -> re-recognized line rows for
    every selected element in the XMLs (crop-prefixed ids, page-space
    coords). Enforces the reference's node-level constraints before any Ray
    work: selection deeper than the layout level is an error (`:585-588`)
    and line/word/glyph selection restricts the legal PSM (`:560-584`)."""
    from .extract import _parquet_files

    cfg = cfg or PipelineConfig()
    cfg.check_selection_level(level)
    PipelineConfig.check_node_psm(level, cfg.psm)

    files = _parquet_files(media_path)
    reqs = xml_ds.map_batches(_xml_to_crop_requests(level, image_override), batch_format="pandas")
    reqs = _attach_locations(reqs, media_locations(files), location_strategy, cfg.join_partitions)
    return reqs.groupby(["__path", "__rg"]).map_groups(
        _make_loc_recognizer(cfg.only_layout), batch_format="pandas"
    )


# ------------------------------------------------------- H2 XML write-back
def _patch_xml(level: str):
    """Attach packed re-recognition results into the parsed input document
    at/below each selected node, preserving every untouched element — the
    reference's update-the-input-DOM contract (`:557-589,720-755,865`)."""
    import xml.etree.ElementTree as ET

    from ..pagexml import PAGE_NS

    q = lambda tag: f"{{{PAGE_NS}}}{tag}"  # noqa: E731

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ET.register_namespace("", PAGE_NS)  # inside the worker, not the driver
        out = []
        for row in batch.itertuples():
            payload = row.results_json
            if payload is None or (isinstance(payload, float) and pd.isna(payload)):
                out.append({"doc_id": row.doc_id, "xml": row.xml})
                continue
            results = json.loads(payload)
            root = ET.fromstring(row.xml)
            # selected elements indexed by id, with their parent page's
            # imageFilename so duplicate region ids across pages resolve
            tag = {"region": "TextRegion", "line": "TextLine", "word": "Word", "glyph": "Glyph"}[level]
            index: dict[tuple[str, str], ET.Element] = {}
            for page_el in root.iter(q("Page")):
                fname = page_el.get("imageFilename") or ""
                mref = fname.split("[")[0]
                pageno = int(fname.split("[")[1].rstrip("]")) if "[" in fname else 0
                for el in page_el.iter(q(tag)):
                    index[(mref, str(pageno), el.get("id"))] = el
            for key, items in results.items():
                mref, pageno, crop_id = key.split("\x1f")
                el = index.get((mref, pageno, crop_id))
                if el is None:
                    continue
                if level == "region":
                    # results REPLACE the region's line children (`:720-727`)
                    for old in el.findall(q("TextLine")):
                        el.remove(old)
                    for it in items:
                        ln = ET.SubElement(el, q("TextLine"), {"id": it["line_id"]})
                        pts = f'{it["x0"]},{it["y0"]} {it["x1"]},{it["y0"]} {it["x1"]},{it["y1"]} {it["x0"]},{it["y1"]}'
                        ET.SubElement(ln, q("Coords"), {"points": pts})
                        ET.SubElement(ln, q("Baseline"), {"points": f'{it["x0"]},{it["y1"]} {it["x1"]},{it["y1"]}'})
                        if it["text"] is not None:
                            te = ET.SubElement(ln, q("TextEquiv"), {"conf": f"{it['conf']:g}"})
                            ET.SubElement(te, q("Unicode")).text = it["text"]
                else:
                    # line/word selection: recognized text replaces the
                    # node's own TextEquiv (`:730-735,749-755`)
                    texts = [it["text"] for it in items if it["text"] is not None]
                    confs = [it["conf"] for it in items if it["conf"] is not None]
                    for old in el.findall(q("TextEquiv")):
                        el.remove(old)
                    if texts:
                        attrs = {"conf": f"{min(confs):g}"} if confs else {}
                        te = ET.SubElement(el, q("TextEquiv"), attrs)
                        ET.SubElement(te, q("Unicode")).text = "\n".join(texts)
            xml = '<?xml version="1.0" encoding="utf-8"?>\n' + ET.tostring(root, encoding="unicode")
            out.append({"doc_id": row.doc_id, "xml": xml})
        return pd.DataFrame(out, columns=["doc_id", "xml"])

    return fn


def rerecognize_inplace(
    xml_ds: Dataset,
    media_path: str,
    cfg: PipelineConfig | None = None,
    level: str = "region",
    image_override: str | None = None,
    location_strategy: str = "broadcast",
) -> Dataset:
    """Full H2 round trip: (doc_id, xml) in -> (doc_id, updated xml) out.
    Untouched elements are preserved; selected nodes carry the re-recognition
    results (reference ``--inplace``, `:371-374,865`).

    Shape: ONE bucketed co-shuffle — the XML rows and the flat result rows
    are null-padded onto a shared Arrow schema, union'd, hashed on doc_id
    into a bucket, and each bucket group packs its results, left-attaches
    them to the XML rows and patches the DOMs in a single map_groups. The
    previous shape (pack groupby, THEN a bucketed 1:1 join) paid two
    all-to-all exchanges where one suffices; at the contract's 102-doc
    scale the removed exchange was ~2-4s of pure fixed latency (breakdown
    in BASELINE.md round-4 profile), and at 100 TB the fused exchange
    ships each result row exactly once either way."""
    import numpy as np

    from ..hashing import stable_bucket

    cfg = cfg or PipelineConfig()
    res = rerecognize_pagexml(xml_ds, media_path, cfg, level, image_override, location_strategy)

    union_schema = pa.schema(
        [
            ("doc_id", pa.string()),
            ("xml", pa.string()),
            ("media_ref", pa.string()),
            ("page", pa.int64()),
            ("crop_id", pa.string()),
            ("line_id", pa.string()),
            ("x0", pa.int64()),
            ("y0", pa.int64()),
            ("x1", pa.int64()),
            ("y1", pa.int64()),
            ("text", pa.string()),
            ("conf", pa.float64()),
            ("__side", pa.int8()),
            ("__bucket", pa.int32()),
        ]
    )

    def pad(side: int):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = []
            for f in union_schema:
                if f.name == "__side":
                    cols.append(pa.array(np.full(n, side, dtype=np.int8)))
                elif f.name == "__bucket":
                    cols.append(pa.array(stable_bucket(t.column("doc_id"), cfg.assemble_buckets)))
                elif f.name in t.column_names:
                    cols.append(t.column(f.name).cast(f.type))
                else:
                    cols.append(pa.nulls(n, f.type))
            return pa.Table.from_arrays(cols, schema=union_schema)

        return fn

    unioned = xml_ds.map_batches(pad(0), batch_format="pyarrow").union(
        res.map_batches(pad(1), batch_format="pyarrow")
    )
    patch = _patch_xml(level)

    def fuse(g: pd.DataFrame) -> pd.DataFrame:
        xml_rows = g.loc[g["__side"] == 0, ["doc_id", "xml"]]
        sub = g[g["__side"] == 1]
        if len(sub):
            sub = sub.sort_values(["crop_id", "y0", "x0"], kind="mergesort")
            out = []
            for doc_id, s in sub.groupby("doc_id", sort=True):
                groups: dict[str, list[dict]] = {}
                for r in s.itertuples():
                    key = f"{r.media_ref}\x1f{int(r.page)}\x1f{r.crop_id}"
                    groups.setdefault(key, []).append(
                        {
                            "line_id": r.line_id,
                            "x0": int(r.x0), "y0": int(r.y0), "x1": int(r.x1), "y1": int(r.y1),
                            "text": r.text,
                            "conf": None if r.conf is None or pd.isna(r.conf) else float(r.conf),
                        }
                    )
                out.append({"doc_id": doc_id, "results_json": json.dumps(groups)})
            packed = pd.DataFrame(out, columns=["doc_id", "results_json"])
            df = xml_rows.merge(packed, on="doc_id", how="left")
        else:
            df = xml_rows.assign(results_json=None)
        return patch(df)

    return unioned.groupby("__bucket").map_groups(fuse, batch_format="pandas")
