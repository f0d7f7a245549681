"""§3.2 entry point: PAGE XML input -> region crops -> re-recognition.
Round-trip: extract XML from the corpus, re-recognize every TextRegion from
the XML + media only, and the line texts must match the golden spans."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from tesseract_recognize_ray.pagexml import extract_pagexml
from tesseract_recognize_ray.pipelines.rerecognize import rerecognize_pagexml


def test_rerecognize_matches_golden(ray_session, tiny_corpus):
    xml = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"])
    out = rerecognize_pagexml(rd.from_pandas(xml.to_pandas()), tiny_corpus["media"]).to_pandas()

    gold = pq.read_table(tiny_corpus["golden_spans"]).to_pandas()
    media_gold = gold[gold["media_ref"].notna()]

    # per-doc multiset of recognized line texts matches golden exactly
    got = out.groupby("doc_id")["text"].apply(lambda s: sorted(s)).to_dict()
    want = media_gold.groupby("doc_id")["text"].apply(lambda s: sorted(s)).to_dict()
    assert got == want

    # crop-prefixed id scheme (reference :663-666): region ids start with
    # the originating crop's id, lines nest under them
    assert (out["region_id"] == out["crop_id"] + "_b1").all()
    assert out["line_id"].str.startswith(out["region_id"].iloc[0][:2]).any()
    # coords are translated back to page space: all non-negative, x1>x0
    assert (out["x1"] > out["x0"]).all() and (out["y1"] > out["y0"]).all()
    assert (out["conf"] == 1.0).all()


def test_rerecognize_inplace_roundtrip(ray_session, tiny_corpus):
    """H2 write-back (--inplace): output XML = input document with results
    attached below each selected TextRegion; untouched structure (pages,
    region ids, properties) preserved; docs with nothing selected pass
    through byte-identical (reference :557-589,865)."""
    from tesseract_recognize_ray.pagexml import parse_pagexml
    from tesseract_recognize_ray.pipelines.rerecognize import rerecognize_inplace

    xml = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"]).to_pandas()
    passthrough = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">'
        "<Metadata><Creator>x</Creator></Metadata>"
        '<Page imageFilename="m-none" imageWidth="0" imageHeight="0"/></PcGts>'
    )
    xml = pd.concat(
        [xml, pd.DataFrame([{"doc_id": "doc-empty", "xml": passthrough}])], ignore_index=True
    )
    out = (
        rerecognize_inplace(rd.from_pandas(xml), tiny_corpus["media"])
        .to_pandas()
        .set_index("doc_id")["xml"]
    )
    assert len(out) == len(xml)
    # no-selection doc passes through unchanged
    assert out["doc-empty"] == passthrough

    for _, row in xml[xml["doc_id"] != "doc-empty"].head(8).iterrows():
        orig = parse_pagexml(row["xml"])
        got = parse_pagexml(out[row["doc_id"]])
        o_lines = orig[orig["level"] == "line"]
        g_lines = got[got["level"] == "line"]
        # untouched structure: same pages/filenames and same region ids
        assert sorted(got["image_filename"].unique()) == sorted(orig["image_filename"].unique())
        assert sorted(g_lines["region_id"].unique()) == sorted(o_lines["region_id"].unique())
        # recognized text equals the original (closed-alphabet corpus)
        assert sorted(g_lines["text"]) == sorted(o_lines["text"])
        # new line ids carry the crop prefix (attach-below-node, M10)
        assert g_lines["line_id"].str.contains("_b1_p1_l").all()


def test_rerecognize_line_selection_and_psm(ray_session, tiny_corpus):
    """TextLine selection (node-level PSM rules): psm must be 7/13 for line
    selection (reference :566-569); per-line crops re-recognize to the same
    text."""
    import pytest

    from tesseract_recognize_ray.config import PipelineConfig

    xml = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"]).to_pandas().head(6)
    out = rerecognize_pagexml(
        rd.from_pandas(xml), tiny_corpus["media"], PipelineConfig(psm=7), level="line"
    ).to_pandas()
    gold = pq.read_table(tiny_corpus["golden_spans"]).to_pandas()
    sub = gold[gold["doc_id"].isin(xml["doc_id"]) & gold["media_ref"].notna()]
    got = out.groupby("doc_id")["text"].apply(lambda s: sorted(s)).to_dict()
    want = sub.groupby("doc_id")["text"].apply(lambda s: sorted(s)).to_dict()
    assert got == want
    # crop_id is the selected line's id, not a region id
    assert out["crop_id"].str.contains("_p1_l").all()

    with pytest.raises(ValueError, match="illegal for node level"):
        rerecognize_pagexml(rd.from_pandas(xml), tiny_corpus["media"], PipelineConfig(psm=3), level="line")
    with pytest.raises(ValueError, match="shallower than selection"):
        rerecognize_pagexml(
            rd.from_pandas(xml), tiny_corpus["media"], PipelineConfig(psm=8, layout_level="line"), level="word"
        )


def test_image_override_requests():
    """--image equivalent (reference :414-420): the override replaces the
    XML's imageFilename as the raster source for every crop request."""
    from tesseract_recognize_ray.pipelines.rerecognize import _xml_to_crop_requests

    xml = (
        '<?xml version="1.0" encoding="utf-8"?>\n'
        '<PcGts xmlns="http://schema.primaresearch.org/PAGE/gts/pagecontent/2013-07-15">'
        '<Page imageFilename="m-orig" imageWidth="100" imageHeight="100">'
        '<TextRegion id="b1"><Coords points="0,0 99,0 99,99 0,99"/>'
        '<TextLine id="b1_p1_l1"><Coords points="5,5 90,5 90,20 5,20"/></TextLine>'
        "</TextRegion></Page></PcGts>"
    )
    batch = pd.DataFrame([{"doc_id": "d0", "xml": xml}])
    reqs = _xml_to_crop_requests("region", image_override="m-other")(batch)
    # the override swaps only the raster SOURCE; media_ref keeps the XML's
    # identity so in-place write-back can still find the node
    assert len(reqs) == 1 and (reqs["src_ref"] == "m-other").all()
    assert (reqs["media_ref"] == "m-orig").all()
    reqs2 = _xml_to_crop_requests("region")(batch)
    assert (reqs2["src_ref"] == "m-orig").all() and (reqs2["media_ref"] == "m-orig").all()


def test_rerecognize_glyph_selection(ray_session, tiny_corpus):
    """Glyph selection: PSM must be 10 (reference :578-582); each selected
    Glyph crop re-recognizes to its own character."""
    import pytest

    from tesseract_recognize_ray.config import PipelineConfig

    cfg_x = PipelineConfig(layout_level="glyph")
    xml = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"], cfg_x).to_pandas().head(3)
    cfg = PipelineConfig(psm=10, layout_level="glyph")
    out = rerecognize_pagexml(rd.from_pandas(xml), tiny_corpus["media"], cfg, level="glyph").to_pandas()
    assert len(out) > 0
    assert out["crop_id"].str.contains("_g").all()
    assert (out["text"].str.len() == 1).all()  # one glyph -> one character

    with pytest.raises(ValueError, match="illegal for node level"):
        rerecognize_pagexml(rd.from_pandas(xml), tiny_corpus["media"],
                            PipelineConfig(psm=3, layout_level="glyph"), level="glyph")


def test_inplace_with_image_override_patches(ray_session, tiny_corpus):
    """--image + --inplace: results are keyed by the XML's imageFilename
    (node identity) while the raster comes from the override — the patched
    document must carry the override-derived recognition, not silently pass
    through unpatched."""
    from tesseract_recognize_ray.pagexml import parse_pagexml
    from tesseract_recognize_ray.pipelines.rerecognize import rerecognize_inplace

    xml = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"]).to_pandas()
    # pick a single-page doc and override its raster with ITS OWN media_ref
    # (identity override: output must equal the no-override patch result)
    row = None
    for _, r in xml.iterrows():
        els = parse_pagexml(r["xml"])
        fnames = els["image_filename"].unique()
        if len(fnames) == 1 and "[" not in fnames[0]:
            row = r
            override = fnames[0]
            break
    assert row is not None
    ds = rd.from_pandas(pd.DataFrame([row]))
    plain = rerecognize_inplace(ds, tiny_corpus["media"]).to_pandas()["xml"].iloc[0]
    overridden = rerecognize_inplace(
        rd.from_pandas(pd.DataFrame([row])), tiny_corpus["media"], image_override=override
    ).to_pandas()["xml"].iloc[0]
    assert overridden != row["xml"]  # NOT a silent passthrough
    a, b = parse_pagexml(plain), parse_pagexml(overridden)
    assert sorted(a[a.level == "line"]["text"]) == sorted(b[b.level == "line"]["text"])


def test_cli_stdin_xml(ray_session, tiny_corpus, tmp_path):
    """`--xml -` reads ONE PAGE XML document from stdin (the reference's
    stdin entry point, tesseract-recognize.cc:402-406). Runs the CLI as a
    subprocess because main() owns its own Ray session."""
    import subprocess
    import sys as _sys

    xml = extract_pagexml(tiny_corpus["docs"], tiny_corpus["media"]).to_pandas()
    doc_xml = xml["xml"].iloc[0]
    out_dir = str(tmp_path / "stdin_out")
    proc = subprocess.run(
        [
            _sys.executable,
            "-m",
            "tesseract_recognize_ray",
            "--xml",
            "-",
            "--media",
            tiny_corpus["media"],
            "-o",
            out_dir,
            "--num-cpus",
            "2",
        ],
        input=doc_xml.encode(),
        capture_output=True,
        timeout=300,
        env={**__import__("os").environ, "RAY_ADDRESS": "local"},
    )
    assert proc.returncode == 0, proc.stderr.decode()[-2000:]
    got = pq.read_table(out_dir).to_pandas()
    assert len(got) > 0 and (got["doc_id"] == "stdin").all()
    assert got["text"].notna().all()
