"""HTML main-content extraction (boilerplate strip) — the north-rule's
"HTML boilerplate strip / DOM heuristics" extraction flavor, from scratch
on the stdlib parser (no external DOM libraries in this sandbox).

The classifier is the boilerpipe/readability block model (Kohlschütter et
al., WSDM 2010, public): parse the document into TEXT BLOCKS at block-level
tag boundaries, score each block with shallow features — link density
(anchor chars / block chars), block length, and ancestor class/id hints
(nav / footer / sidebar / ad / comment ...) — and keep the low-link-density
long blocks. No site templates, no learned weights: the same heuristics run
on any markup.

Scale shape: a stateless per-batch Python parse is unavoidable (HTML is a
string format; there is no Arrow kernel for it), so the stage is hosted on
an actor pool via ``strip_boilerplate`` with the extractor constructed once
per actor (compiled regexes + parser class), and each batch returns only
the extracted text — raw markup never re-enters the object store.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

import pandas as pd
import pyarrow as pa
from ray.data import Dataset

# block-level elements that terminate a text block (HTML5 flow content)
_BLOCK_TAGS = frozenset(
    "p div li ul ol h1 h2 h3 h4 h5 h6 td th tr table section article aside"
    " header footer nav blockquote pre br hr form fieldset".split()
)
# subtrees that never contribute content
_SKIP_TAGS = frozenset("script style noscript svg template head title".split())
# class/id substrings marking boilerplate containers (self or ancestor)
_HINT_RE = re.compile(
    r"nav|footer|header|sidebar|side-bar|menu|banner|advert|\bad\b|ads|"
    r"promo|cookie|comment|share|social|breadcrumb|related|widget",
    re.I,
)
_WS_RE = re.compile(r"\s+")


class _Block:
    __slots__ = ("chars", "link_chars", "hinted", "parts")

    def __init__(self, hinted: bool):
        self.chars = 0
        self.link_chars = 0
        self.hinted = hinted
        self.parts: list[str] = []


class _BlockParser(HTMLParser):
    """One pass over the markup -> list of (text, link_density, hinted)
    blocks in document order."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[_Block] = []
        self._cur: _Block | None = None
        self._skip_depth = 0
        self._anchor_depth = 0
        self._hint_depth = 0
        # structural boilerplate tags also count as hints (a <nav>/<footer>
        # subtree is boilerplate regardless of class names)
        self._hint_tags = frozenset("nav footer header aside form".split())
        self._hint_tag_depth = 0
        self._hinted_tags: list[str] = []

    def _flush(self):
        if self._cur is not None and self._cur.chars:
            self.blocks.append(self._cur)
        self._cur = None

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._anchor_depth += 1
        if tag in self._hint_tags:
            self._hint_tag_depth += 1
        hints = " ".join(v or "" for k, v in attrs if k in ("class", "id"))
        if hints and _HINT_RE.search(hints):
            # approximate scoping: the matching endtag (by name) decrements;
            # wild HTML is unbalanced and a flag stack is the standard
            # tolerance (full tree building would buy little here)
            self._hint_depth += 1
            self._hinted_tags.append(tag)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in self._hint_tags:
            self._hint_tag_depth = max(0, self._hint_tag_depth - 1)
        if self._hinted_tags and self._hinted_tags[-1] == tag:
            self._hinted_tags.pop()
            self._hint_depth = max(0, self._hint_depth - 1)

    def handle_data(self, data):
        if self._skip_depth:
            return
        text = _WS_RE.sub(" ", data)
        if not text.strip():
            return
        if self._cur is None:
            self._cur = _Block(hinted=(self._hint_depth > 0 or self._hint_tag_depth > 0))
        self._cur.parts.append(text)
        n = len(text.strip())
        self._cur.chars += n
        if self._anchor_depth:
            self._cur.link_chars += n

    def close(self):
        super().close()
        self._flush()


def extract_main(html: str, *, max_link_density: float = 0.33, min_chars: int = 25) -> str:
    """Main content of one HTML document: parse into blocks, drop blocks
    that are hinted boilerplate, too short, or link-dense; join survivors
    in document order with single spaces."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    kept: list[str] = []
    for b in p.blocks:
        if b.hinted or b.chars < min_chars:
            continue
        if b.chars and b.link_chars / b.chars > max_link_density:
            continue
        kept.append(_WS_RE.sub(" ", "".join(b.parts)).strip())
    return " ".join(kept)


class BoilerplateStripper:
    """Actor-pool stage: html column in, extracted main text out."""

    def __init__(self, html_col: str = "html", out_col: str = "main_text",
                 max_link_density: float = 0.33, min_chars: int = 25):
        self.html_col = html_col
        self.out_col = out_col
        self.max_link_density = max_link_density
        self.min_chars = min_chars

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch[self.out_col] = [
            extract_main(h, max_link_density=self.max_link_density, min_chars=self.min_chars)
            for h in batch[self.html_col].fillna("")
        ]
        return batch.drop(columns=[self.html_col])


def strip_boilerplate(
    ds: Dataset,
    html_col: str = "html",
    out_col: str = "main_text",
    *,
    concurrency: tuple[int, int] | int = (1, 8),
    batch_size: int = 256,
) -> Dataset:
    """Boilerplate-strip over a Dataset: actor pool (extractor built once
    per actor), small batches (markup payloads are large), markup dropped
    from the output batch."""
    return ds.map_batches(
        BoilerplateStripper,
        fn_constructor_kwargs={"html_col": html_col, "out_col": out_col},
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# --------------------------------------------------- deterministic fixture
def wrap_in_boilerplate(doc_id, text: str) -> str:
    """Deterministic synthetic page around known main content: header/nav
    link farms, ad + related-links insets between paragraphs, a comments
    section and footer — every boilerplate block is link-dense, hinted, or
    short, so a correct extractor returns exactly `text`. Template variant
    keys off doc_id (stable across runs, varied across docs)."""
    words = text.split()
    k = max(1, min(3, len(words) // 8))
    step = (len(words) + k - 1) // k
    paras = [" ".join(words[i : i + step]) for i in range(0, len(words), step)]
    v = int(pd.util.hash_pandas_object(pd.Series([str(doc_id)]), index=False).iloc[0]) % 3
    nav = (
        '<nav class="top-menu"><a href="/">Home</a> <a href="/news">News today</a> '
        '<a href="/sports">Sports desk</a> <a href="/about">About this site</a></nav>'
    )
    ad = '<div class="ad-banner"><a href="/buy">Buy one now great deal best price click here</a></div>'
    related = (
        '<div class="related-links"><ul>'
        '<li><a href="/r1">Ten related stories you must read immediately</a></li>'
        '<li><a href="/r2">Editors picks and trending topics right now</a></li></ul></div>'
    )
    comments = (
        '<div class="comment-section"><p>first!</p><p>nice post</p>'
        '<p><a href="/u/9">reply from a user with a very long signature link</a></p></div>'
    )
    footer = (
        '<footer><p>Copyright 2024 Example Site. All rights reserved. Terms of use '
        'privacy policy cookies settings contact us careers press kit</p></footer>'
    )
    body = [nav if v != 2 else nav + ad]
    for i, para in enumerate(paras):
        body.append(f"<p>{para}</p>")
        if i + 1 < len(paras):
            body.append(ad if (v + i) % 2 == 0 else related)
    body.append(comments if v != 1 else related + comments)
    body.append(footer)
    head = "<head><title>t</title><style>p{color:red}</style><script>var x=1;</script></head>"
    return f"<html>{head}<body>{''.join(body)}</body></html>"
