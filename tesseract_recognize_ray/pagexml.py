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

from .geometry import UP, clip_baseline, quad_from_bbox
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
) -> str:
    """One document's recognized line/word rows (REC_SCHEMA + doc columns)
    -> one PAGE XML string. ``page_dims`` maps (media_ref, page) -> (w, h)
    for the Page element attributes (0,0 when unknown).

    Pages are enumerated from the doc's media inventory (media_ref x
    n_pages), NOT from non-empty line groups: a page with no detected lines
    still gets its (empty) <Page> element and advances the global page
    counter — the reference's pageno counts addPage calls regardless of
    content (tesseract-recognize.cc:481,507,527,660). ``page_set`` mirrors
    the S2 page selection: only selected pages are enumerated (unselected
    pages are never added by the reference either). A media whose rows were
    entirely filtered out upstream is not recoverable here (the inventory
    derives from the rows)."""
    df = elements[elements["level"].isin(["line", "word"])].copy()
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
            w, h = (page_dims or {}).get((media_ref, int(page)), (0, 0))
            fname = media_ref if n_pages == 1 else f"{media_ref}[{int(page)}]"
            out.append(
                f"  <Page imageFilename={quoteattr(str(fname))} "
                f'imageWidth="{w}" imageHeight="{h}">\n'
            )
            if pg is None:  # blank page: empty element, counter still advanced
                out.append("  </Page>\n")
                continue
            k = int(pg["orientation_k"].iloc[0])
            if k:
                # reference writes apply-image-orientation in {-90, 90, 180}
                # (tesseract-recognize.cc:610-627); rot90 count k -> degrees
                deg = {1: 90, 2: 180, 3: -90}[k]
                out.append(
                    f'    <Property key="apply-image-orientation" value="{deg}"/>\n'
                )
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
                rquad = quad_from_bbox(rx0, ry0, rx1, ry1, UP)
                out.append(
                    f"    <TextRegion id={quoteattr(rid)} "
                    'readingDirection="left-to-right">\n'
                    f'      <Coords points="{_pts(rquad)}"/>\n'
                )
                for ln in lines.itertuples():
                    lid = make_line_id(rid, para=int(ln.para), line=int(ln.line))
                    quad = quad_from_bbox(ln.x0, ln.y0, ln.x1, ln.y1, UP)
                    base = clip_baseline(
                        ((float(ln.x0), float(ln.baseline_y)), (float(ln.x1), float(ln.baseline_y))),
                        quad,
                    )
                    out.append(
                        f"      <TextLine id={quoteattr(lid)}>\n"
                        f'        <Coords points="{_pts(quad)}"/>\n'
                        f'        <Baseline points="{_pts(base)}"/>\n'
                    )
                    words = reg[(reg["level"] == "word") & (reg["line"] == ln.line)]
                    for w_i, wd in enumerate(words.itertuples()):
                        wid = f"{lid}_w{w_i + 1}"
                        wquad = quad_from_bbox(wd.x0, wd.y0, wd.x1, wd.y1, UP)
                        conf = "" if pd.isna(wd.conf) else f' conf="{wd.conf:g}"'
                        out.append(
                            f"        <Word id={quoteattr(wid)}>"
                            f'<Coords points="{_pts(wquad)}"/>'
                            f"<TextEquiv{conf}><Unicode>{escape(str(wd.text))}</Unicode></TextEquiv>"
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
    return pd.DataFrame(rows)


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

    def xml_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__bucket")
        out = [
            {"doc_id": d, "xml": elements_to_pagexml(d, sub, text_levels=text_levels, page_set=pset)}
            for d, sub in g.groupby("doc_id", sort=True)
        ]
        return pd.DataFrame(out, columns=["doc_id", "xml"])

    return bucketed.groupby("__bucket").map_groups(xml_bucket, batch_format="pandas")
