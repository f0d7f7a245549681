"""functions/html.py — HTML main-content extraction (boilerplate strip)."""

import pandas as pd
import pytest

from tesseract_recognize_ray.functions.html import (
    extract_main,
    wrap_in_boilerplate,
)

MAIN = "the quick brown fox jumps over the lazy dog near the river bank today"


def test_extract_keeps_long_plain_paragraph():
    html = f"<html><body><p>{MAIN}</p></body></html>"
    assert extract_main(html) == MAIN


def test_script_style_and_head_are_invisible():
    html = (
        "<html><head><title>nope</title><style>p{color:red}</style></head>"
        f"<body><script>var x = 'not content at all';</script><p>{MAIN}</p></body></html>"
    )
    assert extract_main(html) == MAIN


def test_link_dense_block_dropped():
    html = (
        f"<body><div><a href='/a'>click here for ten amazing deals right now</a></div>"
        f"<p>{MAIN}</p></body>"
    )
    assert extract_main(html) == MAIN


def test_inline_link_within_long_text_kept():
    # a single short anchor inside a long paragraph must NOT kill the block
    html = f"<body><p>{MAIN} see <a href='/x'>docs</a> for details of everything</p></body>"
    out = extract_main(html)
    assert MAIN in out and "docs" in out


def test_hinted_class_and_structural_tags_dropped():
    html = (
        "<body><nav>long navigation text that is not short at all really</nav>"
        '<div class="sidebar">very long sidebar content that exceeds the minimum chars</div>'
        f"<p>{MAIN}</p>"
        "<footer>a long copyright footer sentence exceeding the length floor</footer></body>"
    )
    assert extract_main(html) == MAIN


def test_short_fragments_dropped():
    html = f"<body><p>ok</p><p>{MAIN}</p><p>bye now</p></body>"
    assert extract_main(html) == MAIN


def test_entities_unescaped():
    html = "<body><p>fish &amp; chips cost twenty &lt;pounds&gt; at the corner shop</p></body>"
    assert extract_main(html) == "fish & chips cost twenty <pounds> at the corner shop"


def test_wrap_roundtrip_all_variants():
    # doc_ids chosen to hit all three template variants
    for did in range(12):
        text = f"paragraph number {did} with enough words to stay over every length floor " * 3
        text = text.strip()
        assert extract_main(wrap_in_boilerplate(did, text)) == text


def test_strip_boilerplate_dataset(ray_session):
    import ray.data as rd

    from tesseract_recognize_ray.functions.html import strip_boilerplate

    docs = pd.DataFrame(
        {
            "doc_id": [f"d{i}" for i in range(8)],
            "text": [
                f"document {i} body text with plenty of words to keep the block alive" for i in range(8)
            ],
        }
    )
    pages = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "html": [wrap_in_boilerplate(d, t) for d, t in zip(docs["doc_id"], docs["text"])],
        }
    )
    out = strip_boilerplate(rd.from_pandas(pages), concurrency=(1, 2)).to_pandas()
    got = dict(zip(out["doc_id"], out["main_text"]))
    assert got == dict(zip(docs["doc_id"], docs["text"]))
    assert "html" not in out.columns
