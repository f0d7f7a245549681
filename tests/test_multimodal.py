"""Multimodal operator plumbing: resize/features/frame-sample (real) and the
audio decode stub (schema-real, deterministic fake)."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from tesseract_recognize_ray.fixtures import decode_raster, split_pages
from tesseract_recognize_ray.functions import multimodal as mm
from tesseract_recognize_ray.functions.multimodal import AudioDecode


def _media(tiny_corpus):
    return pq.read_table(tiny_corpus["media"]).to_pandas()


def test_frame_sample_and_resize(ray_session, tiny_corpus):
    media = _media(tiny_corpus)
    ds = rd.from_arrow(pq.read_table(tiny_corpus["media"]))
    frames = mm.frame_sample(ds, stride=2).to_pandas()
    want = sum((r.n_pages + 1) // 2 for r in media.itertuples())
    assert len(frames) == want

    resized = mm.image_resize(
        rd.from_pandas(frames.rename(columns={"frame_bytes": "bytes"})), out_h=32, out_w=48
    ).to_pandas()
    assert (resized["height"] == 32).all() and (resized["width"] == 48).all()
    img = decode_raster(resized["resized"].iloc[0])
    assert img.shape == (32, 48)
    # determinism: same input -> same bytes
    resized2 = mm.image_resize(
        rd.from_pandas(frames.rename(columns={"frame_bytes": "bytes"})), out_h=32, out_w=48
    ).to_pandas()
    a = resized.sort_values(["media_ref", "frame"])["resized"].tolist()
    b = resized2.sort_values(["media_ref", "frame"])["resized"].tolist()
    assert a == b


def test_image_features_shape(ray_session, tiny_corpus):
    media = _media(tiny_corpus)
    single = media[media.n_pages == 1]
    ds = rd.from_pandas(single[["media_ref", "bytes"]])
    out = mm.image_features(ds).to_pandas()
    assert len(out) == len(single)
    f = np.asarray(out["features"].iloc[0])
    assert f.shape == (16 + 1 + 4,)
    assert 0.0 < f[:16].sum() <= 1.0001  # normalized histogram
    # ink fraction of a rendered page is small but nonzero
    assert 0.0 < f[16] < 0.5


def test_audio_stub(ray_session):
    import pandas as pd

    df = pd.DataFrame({"clip_id": [0, 1], "bytes": [b"payload-a", b"payload-b"]})
    out = mm.audio_decode(rd.from_pandas(df), deterministic_fake=True).to_pandas()
    assert list(out.columns) == ["clip_id", "waveform", "sample_rate"]
    assert all(len(w) == 4096 for w in out["waveform"])
    assert (out["sample_rate"] == 16000).all()
    # without the fake and without a codec library, the stub must raise
    dec = AudioDecode(deterministic_fake=False)
    assert dec._codec is None  # environment truly has no codec
    import pyarrow as pa

    with pytest.raises(NotImplementedError, match="soundfile"):
        dec(pa.table({"bytes": pa.array([b"x"], pa.large_binary())}))


def test_phash_dups_planted(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from tesseract_recognize_ray.functions.multimodal import _encode, phash_dups

    rng = np.random.default_rng(7)
    base = (rng.integers(0, 256, size=(40, 64))).astype(np.uint8)
    other = (rng.integers(0, 256, size=(40, 64))).astype(np.uint8)
    rows = pd.DataFrame(
        {
            "media_ref": ["a", "a_copy", "b", "b_scaled", "c"],
            "bytes": [
                _encode(base),
                _encode(base),  # exact duplicate
                _encode(other),
                # same image at 2x resolution (dims divisible by the 8x8 grid,
                # so block boundaries align): block means match -> same hash
                _encode(np.kron(other, np.ones((2, 2), dtype=np.uint8))),
                _encode(rng.integers(0, 256, size=(40, 64)).astype(np.uint8)),
            ],
        }
    )
    out = phash_dups(rd.from_pandas(rows).repartition(3), "media_ref").to_pandas()
    groups = out.groupby("canonical")["media_ref"].apply(set).to_dict()
    assert groups.get("a") == {"a", "a_copy"}
    assert groups.get("b") == {"b", "b_scaled"}
    assert "c" not in set(out["media_ref"])


# ------------------------------------------------------ header-only metadata
def test_sniff_metadata_header_only_every_format():
    """sniff_metadata reports (format, dims, depth, pages) for every codec
    WITHOUT touching pixel data — corrupting the payload (but not the
    header) must not change the result."""
    import numpy as np

    from tesseract_recognize_ray import legacycodecs as lcod
    from tesseract_recognize_ray.imagecodecs import (
        encode_png_gray,
        encode_tiff_gray,
        sniff_metadata,
    )
    from tesseract_recognize_ray.jpegcodec import encode_jpeg_gray
    from tesseract_recognize_ray.pdfcodec import encode_pdf_scanned, encode_pdf_text

    img = (np.add.outer(np.arange(24), np.arange(31)) % 251).astype(np.uint8)
    img2 = img[:16, :20].copy()
    cases = [
        (encode_png_gray(img), ("png", 31, 24, 8, 1)),
        (encode_tiff_gray([img, img2]), ("tiff", 31, 24, 8, 2)),
        (encode_jpeg_gray(img, quality=95, mode="gray"), ("jpeg", 31, 24, 8, 1)),
        (lcod.encode_gif_gray(img), ("gif", 31, 24, 8, 1)),
        (lcod.encode_bmp_gray(img), ("bmp", 31, 24, 8, 1)),
        (lcod.encode_pnm_gray(img), ("pnm", 31, 24, 8, 1)),
        (lcod.encode_pnm_gray(img, bilevel=True), ("pnm", 31, 24, 1, 1)),
        # scanned-PDF MediaBox equals the page pixel dims (encoder contract)
        (encode_pdf_scanned([img, img2]), ("pdf", 31, 24, 8, 2)),
        (encode_pdf_text([["a"], ["b"], ["c"]]), ("pdf", 612, 792, 8, 3)),
    ]
    for blob, want in cases:
        m = sniff_metadata(blob)
        got = (m["format"], m["width"], m["height"], m["bit_depth"], m["n_pages"])
        assert got == want, (got, want)

    # header-only proof: corrupt the PNG pixel stream body (IDAT payload),
    # keep IHDR — metadata identical, while a decode would fail
    png = bytearray(encode_png_gray(img))
    idat = png.find(b"IDAT")
    png[idat + 8 : idat + 24] = b"\x00" * 16
    m = sniff_metadata(bytes(png))
    assert (m["width"], m["height"]) == (31, 24)
    import pytest as _pytest

    from tesseract_recognize_ray.imagecodecs import decode_png

    with _pytest.raises(Exception):
        decode_png(bytes(png))


def test_media_metadata_operator_and_quarantine(ray_session):
    import numpy as np
    import pandas as pd
    import ray

    from tesseract_recognize_ray.functions.multimodal import media_metadata
    from tesseract_recognize_ray.imagecodecs import encode_png_gray

    img = np.zeros((10, 12), np.uint8)
    df = pd.DataFrame(
        {
            "media_ref": ["ok", "bad"],
            "bytes": [encode_png_gray(img), b"\x89PNG\r\n\x1a\n trunc"],
        }
    )
    out = (
        media_metadata(ray.data.from_pandas(df))
        .to_pandas()
        .set_index("media_ref")
    )
    assert out.loc["ok", "format"] == "png"
    assert (out.loc["ok", ["width", "height", "n_pages"]] == [12, 10, 1]).all()
    assert out.loc["bad", "format"] == "error"
    assert out.loc["bad", "n_pages"] == -1
