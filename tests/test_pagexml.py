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
