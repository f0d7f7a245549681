"""PAGE XML (PRImA 2013-07-15) emission and parsing — the reference's native
output format (K1 writer `tesseract-recognize.cc:861-877`, S4 reader
`:402-452`), rebuilt on the flat element table.

Structure mirrors the reference's DOM exactly (SURVEY.md §1.1):

    <PcGts xmlns=PAGE-2013-07-15>
      <Metadata><Creator/><Created/><LastChange/></Metadata>
      <Page imageFilename=.. imageWidth=.. imageHeight=..>
        [<Property key="deskewAngle"|"apply-image-orientation"|... value=../>]
        <TextRegion id="b1" readingDirection="left-to-right">
          <Coords points="x,y x,y x,y x,y"/>
          <TextLine id="b1_p1_l1">
            <Coords points=../>
            <Baseline points="x,y x,y"/>     (M8-clipped, 2 points)
            [<Word id=..><Coords/><TextEquiv>..</TextEquiv></Word>]
            <TextEquiv conf="0.99"><Unicode>TEXT</Unicode></TextEquiv>
          </TextLine>
          [<TextEquiv>..region text..</TextEquiv>]
        </TextRegion>
      </Page>  (one per media page — reference addPage `:481,507,527`)
    </PcGts>

ids follow the reference scheme byte-for-byte (M10 `:660-670,726`):
region "b{block+1}" prefixed "pg{page+1}_" for multi-page media; line
"{rid}_p{para+1}_l{line+1}". One XML document per doc_id (the reference's
one-run-one-XML contract, `:404-406,479`). Coords vertex order follows the
detected orientation (M7 `:163-172`); baselines are clipped to the line quad
(M8 `:177-194`).

Emission is a per-doc-bucket ``map_groups`` over the recognized element
table; parsing is a vectorized ``map_batches`` over an xml string column
(stdlib ElementTree — used by golden-comparison tooling, not the hot path).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import pandas as pd

from .geometry import (
    ORIENT_FROM_K,
    UP,
    clip_baseline,
    invert_rot90_bbox,
    invert_rot90_point,
    polystripe_coords,
    quad_from_bbox,
)
from .idscheme import line_id as make_line_id
from .idscheme import region_id as make_region_id

PAGE_NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15"
CREATOR = "tesseract-recognize-ray"


def _pts(points) -> str:
    return " ".join(f"{int(round(x))},{int(round(y))}" for x, y in points)


def elements_to_pagexml(
    doc_id: str,
    elements: pd.DataFrame,
    page_dims: dict[tuple[str, int], tuple[int, int]] | None = None,
    created: str = "1970-01-01T00:00:00",
    text_levels: tuple[str, ...] = (),
    page_set: set[int] | None = None,
    psm: int = 3,
    coords_space: str = "upright",
) -> str:
    """One document's recognized line/word rows (REC_SCHEMA + doc columns)
    -> one PAGE XML string. Page dims come from the rows' page_w/page_h
    columns when carried (upright raster dims), else from the ``page_dims``
    map ((media_ref, page) -> (w, h); 0,0 when unknown).

    Fidelity semantics mirrored from the reference:
      * TextLine Coords are the POLYSTRIPE polygon around the clipped
        baseline (setLineCoords -> setPolystripe, tesseract-recognize.cc:
        177-202, M8) — identical to the bbox quad for axis-aligned lines;
      * a bbox covering the whole page collapses to the "0,0 0,0" sentinel
        (`:158-161`), and sentinel-coordinate Words are filled from their
        neighbors with a coords-unk-filler Property (G4, `:816-858`);
      * ``psm=1`` (PSM_AUTO_OSD) adds the page-level readingDirection /
        textLineOrder Properties (`:618-627`; this engine's detector is
        LTR / top-to-bottom by construction — closed horizontal alphabet);
      * a nonzero per-page ``deskew_angle`` column value emits the
        deskewAngle Property (`:610-612,686-687`; this engine's projection
        segmenter fully deskews by rot90, so the residual is 0.0 on its own
        output and the Property is correctly absent);
      * ``coords_space="original"`` emits the reference's PRE-orientation-
        pass DOM: coords mapped back into the stored raster's space with
        vertex order carrying the detected orientation (M7, `:163-172`);
        the default "upright" space equals the reference AFTER its global
        rotate pass (`:793-799`), with the apply-image-orientation Property
        retained for raster provenance (xml_orientation_pass drops it).

    Pages are enumerated from the doc's media inventory (media_ref x
    n_pages), NOT from non-empty line groups: a page with no detected lines
    still gets its (empty) <Page> element and advances the global page
    counter — the reference's pageno counts addPage calls regardless of
    content (tesseract-recognize.cc:481,507,527,660). ``page_set`` mirrors
    the S2 page selection: only selected pages are enumerated (unselected
    pages are never added by the reference either). A media whose rows were
    entirely filtered out upstream is not recoverable here (the inventory
    derives from the rows)."""
    df = elements[elements["level"].isin(["line", "word", "glyph"])].copy()
    df = df.sort_values(["order", "page", "block", "para", "line", "word"], kind="mergesort")
    out = [
        '<?xml version="1.0" encoding="utf-8"?>\n'
        f'<PcGts xmlns="{PAGE_NS}">\n'
        f"  <Metadata><Creator>{CREATOR}</Creator><Created>{created}</Created>"
        f"<LastChange>{created}</LastChange></Metadata>\n"
    ]
    media_inv = df[["media_ref", "n_pages", "order"]].drop_duplicates("media_ref")
    media_inv = media_inv.sort_values("order", kind="mergesort")
    page_rows = {key: g for key, g in df.groupby(["media_ref", "page"], sort=False)}

    def pages_of(n: int) -> list[int]:
        return [p for p in range(n) if page_set is None or p in page_set]

    total_pages = int(sum(len(pages_of(int(n))) for n in media_inv["n_pages"]))
    gpage = -1
    for media_ref, n_pages in zip(media_inv["media_ref"], media_inv["n_pages"]):
        n_pages = int(n_pages)
        for page in pages_of(n_pages):
            gpage += 1
            pg = page_rows.get((media_ref, page))
            uw, uh = (page_dims or {}).get((media_ref, int(page)), (0, 0))
            k = int(pg["orientation_k"].iloc[0]) if pg is not None else 0
            if pg is not None and "page_w" in pg.columns and int(pg["page_w"].iloc[0]) > 0:
                uw, uh = int(pg["page_w"].iloc[0]), int(pg["page_h"].iloc[0])
            original = coords_space == "original" and k != 0
            w, h = (uh, uw) if (original and k % 2) else (uw, uh)
            orient = ORIENT_FROM_K[k] if original else UP

            def tx_bbox(x0, y0, x1, y1, _o=original, _k=k, _uw=uw, _uh=uh):
                if _o:
                    return invert_rot90_bbox(x0, y0, x1, y1, _k, _uw, _uh)
                return (x0, y0, x1, y1)

            fname = media_ref if n_pages == 1 else f"{media_ref}[{int(page)}]"
            out.append(
                f"  <Page imageFilename={quoteattr(str(fname))} "
                f'imageWidth="{w}" imageHeight="{h}">\n'
            )
            if pg is None:  # blank page: empty element, counter still advanced
                out.append("  </Page>\n")
                continue
            if k:
                # reference writes apply-image-orientation in {-90, 90, 180}
                # (tesseract-recognize.cc:614-617): RIGHT->-90 (one CCW
                # rot90 fixes it, k=1), LEFT->90 (k=3), DOWN->180 (k=2)
                deg = {1: -90, 2: 180, 3: 90}[k]
                out.append(
                    f'    <Property key="apply-image-orientation" value="{deg}"/>\n'
                )
            deskew = (
                float(pg["deskew_angle"].iloc[0]) if "deskew_angle" in pg.columns else 0.0
            )
            if deskew != 0.0:  # emitted only when nonzero (reference :610-612)
                out.append(f'    <Property key="deskewAngle" value="{deskew:g}"/>\n')
            if psm == 1:
                # PSM_AUTO_OSD branch (reference :618-627): page-level OSD
                # properties; this engine's detector is LTR / top-to-bottom
                out.append('    <Property key="readingDirection" value="left-to-right"/>\n')
                out.append('    <Property key="textLineOrder" value="top-to-bottom"/>\n')
            for block, reg in pg.groupby("block", sort=False):
                # id scheme M10 with the reference's GLOBAL page counter: one
                # XML document spans all of the doc's media pages, and
                # "pg{1+pageno}_" prefixes apply when the document has more
                # than one page overall (tesseract-recognize.cc:660,669-670 —
                # pageno counts addPage calls across ALL input images, not
                # pages within one file)
                rid = make_region_id(int(block), page=gpage, n_pages=total_pages)
                lines = reg[reg["level"] == "line"]
                rx0, ry0 = int(lines["x0"].min()), int(lines["y0"].min())
                rx1, ry1 = int(lines["x1"].max()), int(lines["y1"].max())
                rquad = quad_from_bbox(
                    *tx_bbox(rx0, ry0, rx1, ry1), orient, page_w=w or None, page_h=h or None
                )
                out.append(
                    f"    <TextRegion id={quoteattr(rid)} "
                    'readingDirection="left-to-right">\n'
                    f'      <Coords points="{_pts(rquad)}"/>\n'
                )
                for ln in lines.itertuples():
                    lid = make_line_id(rid, para=int(ln.para), line=int(ln.line))
                    quad = quad_from_bbox(
                        *tx_bbox(ln.x0, ln.y0, ln.x1, ln.y1), orient, page_w=w or None, page_h=h or None
                    )
                    if original:
                        b_raw = (
                            invert_rot90_point(float(ln.x0), float(ln.baseline_y), k, uw, uh),
                            invert_rot90_point(float(ln.x1), float(ln.baseline_y), k, uw, uh),
                        )
                    else:
                        b_raw = (
                            (float(ln.x0), float(ln.baseline_y)),
                            (float(ln.x1), float(ln.baseline_y)),
                        )
                    base = clip_baseline(b_raw, quad)
                    # M8: the TextLine's Coords are the polystripe around the
                    # clipped baseline (== bbox quad for axis-aligned lines)
                    lquad = polystripe_coords(base, quad) if len(quad) >= 4 else quad
                    out.append(
                        f"      <TextLine id={quoteattr(lid)}>\n"
                        f'        <Coords points="{_pts(lquad)}"/>\n'
                        f'        <Baseline points="{_pts(base)}"/>\n'
                    )
                    words = reg[(reg["level"] == "word") & (reg["line"] == ln.line)]
                    if len(words) and (
                        (words[["x0", "y0", "x1", "y1"]] == 0).all(axis=1)
                    ).any():
                        # G4 sentinel filler (reference global pass 2,
                        # :816-858): interpolate from neighbors / copy the
                        # parent line bbox, tagging coords-unk-filler
                        from .stages.assemble import fill_sentinel_words

                        words = fill_sentinel_words(
                            words.reset_index(drop=True),
                            (int(ln.x0), int(ln.y0), int(ln.x1), int(ln.y1)),
                        )
                    else:
                        words = words.assign(coords_filled=False)
                    for w_i, wd in enumerate(words.itertuples()):
                        wid = f"{lid}_w{w_i + 1}"
                        wquad = quad_from_bbox(
                            *tx_bbox(wd.x0, wd.y0, wd.x1, wd.y1), orient, page_w=w or None, page_h=h or None
                        )
                        conf = "" if pd.isna(wd.conf) else f' conf="{wd.conf:g}"'
                        filler = (
                            '<Property key="coords-unk-filler"/>' if wd.coords_filled else ""
                        )
                        # RIL_SYMBOL depth (H1, reference :758-766): Glyph
                        # elements nest under their word by x-containment
                        # (word and glyph boxes derive from the same grid)
                        glyphs = reg[
                            (reg["level"] == "glyph")
                            & (reg["line"] == ln.line)
                            & (reg["x0"] >= wd.x0)
                            & (reg["x1"] <= wd.x1)
                        ].sort_values("x0", kind="mergesort")
                        gparts = []
                        for g_i, gl in enumerate(glyphs.itertuples()):
                            gid = f"{wid}_g{g_i + 1}"
                            gquad = quad_from_bbox(
                                *tx_bbox(gl.x0, gl.y0, gl.x1, gl.y1), orient, page_w=w or None, page_h=h or None
                            )
                            gconf = "" if pd.isna(gl.conf) else f' conf="{gl.conf:g}"'
                            gparts.append(
                                f"<Glyph id={quoteattr(gid)}>"
                                f'<Coords points="{_pts(gquad)}"/>'
                                f"<TextEquiv{gconf}><Unicode>{escape(str(gl.text))}</Unicode></TextEquiv>"
                                "</Glyph>"
                            )
                        out.append(
                            f"        <Word id={quoteattr(wid)}>{filler}"
                            f'<Coords points="{_pts(wquad)}"/>'
                            + "".join(gparts)
                            + f"<TextEquiv{conf}><Unicode>{escape(str(wd.text))}</Unicode></TextEquiv>"
                            "</Word>\n"
                        )
                    if ln.text is not None and not (isinstance(ln.text, float) and pd.isna(ln.text)):
                        conf = "" if pd.isna(ln.conf) else f' conf="{ln.conf:g}"'
                        out.append(
                            f"        <TextEquiv{conf}><Unicode>{escape(str(ln.text))}</Unicode></TextEquiv>\n"
                        )
                    out.append("      </TextLine>\n")
                if "region" in text_levels:
                    # M3 --text-levels region: region TextEquiv = newline-
                    # joined line texts (GetUTF8Text block semantics)
                    rtext = "\n".join(str(t) for t in lines["text"] if t is not None)
                    out.append(
                        f"      <TextEquiv><Unicode>{escape(rtext)}</Unicode></TextEquiv>\n"
                    )
                out.append("    </TextRegion>\n")
            out.append("  </Page>\n")
    out.append("</PcGts>\n")
    return "".join(out)


def parse_pagexml(xml_str: str) -> pd.DataFrame:
    """S4: PAGE XML string -> flat element rows (one per TextLine, word rows
    included when present). Columns: image_filename, page_idx, region_id,
    line_id, level, coords (list[(x,y)]), baseline, text, conf."""
    ns = {"p": PAGE_NS}
    root = ET.fromstring(xml_str)
    rows = []

    def pts(el):
        if el is None or not el.get("points"):
            return None
        return [tuple(int(v) for v in p.split(",")) for p in el.get("points").split()]

    for p_idx, page in enumerate(root.findall("p:Page", ns)):
        fname = page.get("imageFilename")
        orientation_deg = 0
        for prop in page.findall("p:Property", ns):
            if prop.get("key") == "apply-image-orientation":
                orientation_deg = int(prop.get("value"))
        for reg in page.findall("p:TextRegion", ns):
            rid = reg.get("id")
            for ln in reg.findall("p:TextLine", ns):
                te = ln.find("p:TextEquiv", ns)
                uni = te.find("p:Unicode", ns) if te is not None else None
                rows.append(
                    {
                        "image_filename": fname,
                        "page_idx": p_idx,
                        "orientation_deg": orientation_deg,
                        "region_id": rid,
                        "line_id": ln.get("id"),
                        "level": "line",
                        "coords": pts(ln.find("p:Coords", ns)),
                        "baseline": pts(ln.find("p:Baseline", ns)),
                        "text": uni.text if uni is not None else None,
                        "conf": float(te.get("conf")) if te is not None and te.get("conf") else None,
                    }
                )
                for wd in ln.findall("p:Word", ns):
                    wte = wd.find("p:TextEquiv", ns)
                    wuni = wte.find("p:Unicode", ns) if wte is not None else None
                    rows.append(
                        {
                            "image_filename": fname,
                            "page_idx": p_idx,
                            "orientation_deg": orientation_deg,
                            "region_id": rid,
                            "line_id": wd.get("id"),
                            "level": "word",
                            "coords": pts(wd.find("p:Coords", ns)),
                            "baseline": None,
                            "text": wuni.text if wuni is not None else None,
                            "conf": float(wte.get("conf")) if wte is not None and wte.get("conf") else None,
                        }
                    )
                    for gl in wd.findall("p:Glyph", ns):
                        gte = gl.find("p:TextEquiv", ns)
                        guni = gte.find("p:Unicode", ns) if gte is not None else None
                        rows.append(
                            {
                                "image_filename": fname,
                                "page_idx": p_idx,
                                "orientation_deg": orientation_deg,
                                "region_id": rid,
                                "line_id": gl.get("id"),
                                "level": "glyph",
                                "coords": pts(gl.find("p:Coords", ns)),
                                "baseline": None,
                                "text": guni.text if guni is not None else None,
                                "conf": float(gte.get("conf")) if gte is not None and gte.get("conf") else None,
                            }
                        )
    return pd.DataFrame(rows)


def _rotate_page_points(points: list[tuple[float, float]], angle: int, w: int, h: int):
    """Rotate page coordinates by angle degrees (the G1 correction buckets
    {-90, 90, 180}): -90 = clockwise page rotation (x,y)->(h-y, x), 90 =
    counter-clockwise (x,y)->(y, w-x), 180 -> (w-x, h-y)."""
    if angle == -90:
        return [(h - y, x) for x, y in points]
    if angle == 90:
        return [(y, w - x) for x, y in points]
    if angle == 180:
        return [(w - x, h - y) for x, y in points]
    return points


def xml_orientation_pass(xml_ds):
    """Reference global pass 1 (G1, tesseract-recognize.cc:793-814) over a
    (doc_id, xml) dataset — vectorized map_batches, no shuffle. Per Page:

      (a) drop the apply-image-orientation Property and, when the coords are
          in the original raster space (coords_space="original" emission),
          rotate them upright by -angle; upright-space coords (the default
          emission) are already rotated, so only the Property is removed —
          either way the output matches the reference post-pass state
          (`:795-799` rotatePage(-angle) + rmElems);
      (b) compute the dominant baseline angle over the page's TextLines
          (length-weighted circular mean, getDominantBaselinesOrientation),
          bucket it to {-90, 90, 180} (`:802-811`) and rotate the page when
          nonzero — catching pages whose LINES skew consistently without
          whole-page rotation (`:812-813`)."""
    import math
    import xml.etree.ElementTree as ET

    from .geometry import bucket_angle, dominant_angle

    q = lambda tag: f"{{{PAGE_NS}}}{tag}"  # noqa: E731

    def parse_pts(s: str):
        return [tuple(float(v) for v in p.split(",")) for p in s.split()]

    def fmt_pts(pts):
        return " ".join(f"{int(round(x))},{int(round(y))}" for x, y in pts)

    def rotate_page(page_el, angle: int, w: int, h: int) -> tuple[int, int]:
        for el in page_el.iter():
            if el.tag in (q("Coords"), q("Baseline")) and el.get("points"):
                el.set("points", fmt_pts(_rotate_page_points(parse_pts(el.get("points")), angle, w, h)))
        if angle in (90, -90):
            w, h = h, w
        page_el.set("imageWidth", str(w))
        page_el.set("imageHeight", str(h))
        return w, h

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        ET.register_namespace("", PAGE_NS)  # inside the worker, not the driver
        out = []
        for row in batch.itertuples():
            root = ET.fromstring(row.xml)
            for page_el in root.iter(q("Page")):
                w = int(page_el.get("imageWidth") or 0)
                h = int(page_el.get("imageHeight") or 0)
                # (a) apply + remove the orientation Property (:795-799)
                for prop in list(page_el.findall(q("Property"))):
                    if prop.get("key") == "apply-image-orientation":
                        angle = int(prop.get("value") or 0)
                        coords = page_el.find(f"{q('TextRegion')}/{q('Coords')}")
                        page_el.remove(prop)
                        # upright-emission coords are already rotated; only
                        # original-space coords (M7 vertex order) need the
                        # -angle rotation. Detect via a vertex-order probe:
                        # upright quads start at the min-x/min-y corner.
                        if coords is not None and w and h:
                            pts = parse_pts(coords.get("points"))
                            if len(pts) >= 4 and pts[0] != (
                                min(p[0] for p in pts),
                                min(p[1] for p in pts),
                            ):
                                # rotatePage(-angle), literally (:797)
                                w, h = rotate_page(page_el, -angle, w, h)
                # (b) dominant baseline re-orientation (:800-813)
                angles, weights = [], []
                for bl in page_el.iter(q("Baseline")):
                    pts = parse_pts(bl.get("points") or "")
                    if len(pts) >= 2:
                        dx, dy = pts[-1][0] - pts[0][0], pts[-1][1] - pts[0][1]
                        # image y grows downward; math angle flips the sign
                        angles.append(math.atan2(-dy, dx))
                        weights.append(math.hypot(dx, dy))
                if angles and w and h:
                    corr = bucket_angle(dominant_angle(angles, weights))
                    if corr:
                        w, h = rotate_page(page_el, corr, w, h)
            out.append(
                {
                    "doc_id": row.doc_id,
                    "xml": '<?xml version="1.0" encoding="utf-8"?>\n'
                    + ET.tostring(root, encoding="unicode"),
                }
            )
        return pd.DataFrame(out, columns=["doc_id", "xml"])

    return xml_ds.map_batches(fn, batch_format="pandas")


def extract_pagexml(docs_path: str, media_path: str, cfg=None):
    """Flagship variant emitting (doc_id, xml) — the K1 fidelity sink: one
    PAGE XML document per doc covering its media pages in reading order.
    Text spans have no raster, hence no XML presence (the reference's XML
    likewise only describes images)."""
    import pyarrow as pa

    from .config import PipelineConfig
    from .pipelines.extract import _parquet_files, attach_doc_order
    from .stages.assemble import add_doc_bucket, explode_media_map
    from .stages.media_source import recognized_lines_from_files
    from .sources.io import read_docs

    cfg = cfg or PipelineConfig()
    files = _parquet_files(media_path)
    rec = recognized_lines_from_files(files, cfg)
    docs = read_docs(docs_path)
    media_map = docs.map_batches(explode_media_map, batch_format="pyarrow")
    rec = attach_doc_order(rec, media_map, cfg, strategy="broadcast")
    bucketed = rec.map_batches(add_doc_bucket(cfg.assemble_buckets), batch_format="pyarrow")

    text_levels = cfg.text_levels
    from .idscheme import parse_pages_set

    pset = parse_pages_set(cfg.page_set) if cfg.page_set else None

    psm = cfg.psm

    def xml_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        out = [
            {
                "doc_id": d,
                "xml": elements_to_pagexml(
                    d, sub, text_levels=text_levels, page_set=pset, psm=psm
                ),
            }
            for d, sub in g.groupby("doc_id", sort=True)
        ]
        return pd.DataFrame(out, columns=["doc_id", "xml"])

    return bucketed.groupby("__bucket").map_groups(xml_bucket, batch_format="pandas")
