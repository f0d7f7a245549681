"""PAGE XML emission (K1) + parsing (S4): structural validity, id scheme,
golden text round-trip."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from tesseract_recognize_ray.pagexml import PAGE_NS, extract_pagexml, parse_pagexml


def test_pagexml_roundtrip_vs_golden(ray_session, tiny_corpus):
    out = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"]).to_pandas()
    gold = pq.read_table(tiny_corpus["golden_spans"]).to_pandas()
    media_gold = gold[gold["media_ref"].notna()]

    # every doc with media spans gets exactly one XML document
    assert set(out["doc_id"]) == set(media_gold["doc_id"])

    parsed_all = []
    for _, row in out.iterrows():
        df = parse_pagexml(row["xml"])
        assert PAGE_NS in row["xml"]
        df["doc_id"] = row["doc_id"]
        parsed_all.append(df)
    parsed = pd.concat(parsed_all, ignore_index=True)
    lines = parsed[parsed["level"] == "line"]

    # line texts round-trip exactly against the golden layout (ids use the
    # reference's global-page-counter scheme, so compare text multisets)
    got = lines.groupby("doc_id")["text"].apply(sorted).to_dict()
    want = media_gold.groupby("doc_id")["text"].apply(sorted).to_dict()
    assert got == want

    # element ids are unique within each XML document (reference invariant:
    # pg{N}_ prefixes disambiguate across the doc's pages, M10 :660,669-670)
    for doc_id, grp in lines.groupby("doc_id"):
        assert grp["line_id"].is_unique, doc_id
    multi_page_docs = lines.groupby("doc_id")["image_filename"].nunique()
    assert (
        lines[lines["doc_id"].isin(multi_page_docs[multi_page_docs > 1].index)]["region_id"]
        .str.startswith("pg")
        .all()
    )

    # structural invariants: coords are 4-point quads, baselines 2-point,
    # region id is a prefix of its line ids (M10 scheme)
    assert lines["coords"].map(len).eq(4).all()
    assert lines["baseline"].map(len).eq(2).all()
    assert all(
        lid.startswith(rid) for rid, lid in zip(lines["region_id"], lines["line_id"])
    )
    # baseline sits on the quad bottom edge, clipped inside [x0, x1] (M8)
    for _, r in lines.head(50).iterrows():
        (x0, _y0), (x1, _y1), *_ = r["coords"]
        (bx0, by0), (bx1, by1) = r["baseline"]
        assert x0 <= bx0 <= bx1 <= x1
        assert by0 == by1 == r["coords"][2][1]  # bottom edge y


def test_pagexml_multipage_filenames(ray_session, tiny_corpus):
    out = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"]).to_pandas()
    media = pq.read_table(tiny_corpus["media"]).to_pandas()
    multi = set(media[media["n_pages"] > 1]["media_ref"])
    found_multi = False
    for _, row in out.iterrows():
        df = parse_pagexml(row["xml"])
        for fname in df["image_filename"].unique():
            if "[" in fname:
                base = fname.split("[")[0]
                assert base in multi  # page-suffix syntax only for multipage (S2)
                found_multi = True
    assert found_multi  # the 64-doc corpus contains at least one multipage media


def test_region_text_level(ray_session, tiny_corpus):
    """M3 --text-levels region: region TextEquiv = newline-joined line texts."""
    import xml.etree.ElementTree as ET

    from tesseract_recognize_ray.config import PipelineConfig
    from tesseract_recognize_ray.pagexml import PAGE_NS

    cfg = PipelineConfig(text_levels=("region",))
    out = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"], cfg).to_pandas()
    ns = {"p": PAGE_NS}
    checked = 0
    for _, row in out.head(5).iterrows():
        root = ET.fromstring(row["xml"])
        for reg in root.iter(f"{{{PAGE_NS}}}TextRegion"):
            line_texts = [
                ln.find("p:TextEquiv/p:Unicode", ns).text or ""
                for ln in reg.findall("p:TextLine", ns)
            ]
            reg_te = reg.findall("p:TextEquiv", ns)
            assert reg_te, "region TextEquiv missing"
            assert reg_te[-1].find("p:Unicode", ns).text == "\n".join(line_texts)
            checked += 1
    assert checked > 0


def _mk_rows(**over):
    """One-line element-row frame for emitter fidelity tests."""
    base = {
        "media_ref": ["m0"], "page": [0], "n_pages": [1], "order": [0],
        "block": [0], "para": [0], "line": [0], "word": [-1], "level": ["line"],
        "x0": [10], "y0": [20], "x1": [110], "y1": [44], "baseline_y": [44],
        "orientation_k": [0], "page_w": [200], "page_h": [100],
        "text": ["HELLO"], "conf": [1.0],
    }
    base.update(over)
    n = max(len(v) for v in base.values())
    return pd.DataFrame({k: (v * n if len(v) == 1 else v) for k, v in base.items()})


def test_real_page_dims_emitted(ray_session, tiny_corpus):
    """imageWidth/imageHeight carry the real (upright) raster dims now that
    the recognition rows pipe page_w/page_h through."""
    import xml.etree.ElementTree as ET

    out = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"]).to_pandas()
    root = ET.fromstring(out["xml"].iloc[0])
    pg = root.find(f"{{{PAGE_NS}}}Page")
    assert int(pg.get("imageWidth")) > 0 and int(pg.get("imageHeight")) > 0


def test_polystripe_formula():
    """M8: (height, offset) per the reference formula on a skewed line, and
    the polystripe polygon equals the bbox quad for axis-aligned lines."""
    from tesseract_recognize_ray.geometry import polystripe, polystripe_coords

    quad = [(10.0, 20.0), (110.0, 20.0), (110.0, 44.0), (10.0, 44.0)]
    base = ((10.0, 38.0), (110.0, 38.0))
    h, o = polystripe(base, quad)
    assert h == 24.0 and o == 0.25  # 0.5*(18*2+6*2)=24; 0.5*(6+6)/24
    pts = polystripe_coords(base, quad)
    assert [(round(x), round(y)) for x, y in pts] == [(10, 20), (110, 20), (110, 44), (10, 44)]


def test_emitter_osd_and_deskew_properties():
    """psm=1 adds the OSD readingDirection/textLineOrder Properties; a
    nonzero deskew_angle column adds deskewAngle (reference :610-627)."""
    from tesseract_recognize_ray.pagexml import elements_to_pagexml

    xml = elements_to_pagexml("d0", _mk_rows(), psm=1)
    assert '<Property key="readingDirection" value="left-to-right"/>' in xml
    assert '<Property key="textLineOrder" value="top-to-bottom"/>' in xml
    xml2 = elements_to_pagexml("d0", _mk_rows())
    assert "readingDirection" not in xml2.split("TextRegion")[0]  # page-level absent
    xml3 = elements_to_pagexml("d0", _mk_rows(deskew_angle=[0.12]))
    assert '<Property key="deskewAngle" value="0.12"/>' in xml3
    assert "deskewAngle" not in xml2


def test_sentinel_word_filled_with_property():
    """G4 wiring: a sentinel-coords Word is filled from its neighbors and
    tagged coords-unk-filler in the emitted XML (reference :816-858)."""
    import xml.etree.ElementTree as ET

    from tesseract_recognize_ray.pagexml import elements_to_pagexml

    rows = _mk_rows(
        level=["line", "word", "word", "word"],
        word=[-1, 0, 1, 2],
        x0=[10, 10, 0, 80], y0=[20, 20, 0, 20],
        x1=[110, 40, 0, 110], y1=[44, 44, 0, 44],
        text=["AB CD EF", "AB", "CD", "EF"],
    )
    xml = elements_to_pagexml("d0", rows)
    root = ET.fromstring(xml)
    words = list(root.iter(f"{{{PAGE_NS}}}Word"))
    assert len(words) == 3
    filled = words[1]
    assert filled.find(f"{{{PAGE_NS}}}Property").get("key") == "coords-unk-filler"
    # both-neighbor interpolation: x from prev.x1 to next.x0
    assert filled.find(f"{{{PAGE_NS}}}Coords").get("points").startswith("40,20 80,20")
    assert words[0].find(f"{{{PAGE_NS}}}Property") is None


def test_original_space_roundtrip(ray_session):
    """M7 + G1 consistency: 'original' coords_space emits rotated vertex
    order in the stored raster's frame; xml_orientation_pass rotates it
    upright and equals the default upright emission minus the Property."""
    import ray.data as rd

    from tesseract_recognize_ray.pagexml import elements_to_pagexml, xml_orientation_pass

    rows = _mk_rows(orientation_k=[1])
    orig = elements_to_pagexml("d0", rows, coords_space="original")
    upright = elements_to_pagexml("d0", rows)
    # original space: dims swap and the quad's vertex order is rotated
    assert 'imageWidth="100" imageHeight="200"' in orig
    assert 'imageWidth="200" imageHeight="100"' in upright
    assert "apply-image-orientation" in orig and "apply-image-orientation" in upright
    p1 = parse_pagexml(orig)
    lo = p1[p1.level == "line"]["coords"].iloc[0]
    assert lo[0] != (min(p[0] for p in lo), min(p[1] for p in lo))  # rotated order

    passed = (
        xml_orientation_pass(rd.from_pandas(pd.DataFrame([{"doc_id": "d0", "xml": orig}])))
        .to_pandas()["xml"].iloc[0]
    )
    a, b = parse_pagexml(passed), parse_pagexml(upright)
    la, lb = a[a.level == "line"].iloc[0], b[b.level == "line"].iloc[0]
    assert sorted(la["coords"]) == sorted(lb["coords"])
    assert sorted(la["baseline"]) == sorted(lb["baseline"])
    assert "apply-image-orientation" not in passed
    assert 'imageWidth="200" imageHeight="100"' in passed


def test_orientation_pass_dominant_baselines(ray_session):
    """G1: a page whose baselines run vertically (without the whole-page
    orientation Property) is re-rotated by the dominant-baseline bucket."""
    import ray.data as rd

    from tesseract_recognize_ray.pagexml import xml_orientation_pass

    xml = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        f'<PcGts xmlns="{PAGE_NS}">'
        '<Page imageFilename="m0" imageWidth="100" imageHeight="200">'
        '<TextRegion id="b1"><Coords points="60,10 84,10 84,90 60,90"/>'
        '<TextLine id="b1_p1_l1"><Coords points="60,10 84,10 84,90 60,90"/>'
        '<Baseline points="84,10 84,90"/>'
        "<TextEquiv><Unicode>HI</Unicode></TextEquiv></TextLine>"
        "</TextRegion></Page></PcGts>"
    )
    out = (
        xml_orientation_pass(rd.from_pandas(pd.DataFrame([{"doc_id": "d", "xml": xml}])))
        .to_pandas()["xml"].iloc[0]
    )
    p = parse_pagexml(out)
    bl = p[p.level == "line"]["baseline"].iloc[0]
    assert bl[0][1] == bl[1][1]  # baseline is horizontal after the pass
    assert bl[1][0] > bl[0][0]  # and reads left-to-right
    assert 'imageWidth="200" imageHeight="100"' in out


def test_glyph_level_emission_roundtrip(ray_session, tiny_corpus):
    """H1 RIL_SYMBOL depth in the XML: layout_level='glyph' nests Glyph
    elements under their Word (x-containment), glyph texts join back to the
    word text, and parse_pagexml reads them back."""
    from tesseract_recognize_ray.config import PipelineConfig

    cfg = PipelineConfig(layout_level="glyph")
    out = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"], cfg).to_pandas()
    checked = 0
    for _, row in out.head(4).iterrows():
        df = parse_pagexml(row["xml"])
        words = df[df["level"] == "word"]
        glyphs = df[df["level"] == "glyph"]
        assert len(glyphs) > 0
        gl_by_word = {}
        for _, g in glyphs.iterrows():
            wid = g["line_id"].rsplit("_g", 1)[0]
            gl_by_word.setdefault(wid, []).append(g["text"])
        for _, wd in words.iterrows():
            if wd["line_id"] in gl_by_word:
                assert "".join(gl_by_word[wd["line_id"]]) == wd["text"]
                checked += 1
    assert checked > 0
