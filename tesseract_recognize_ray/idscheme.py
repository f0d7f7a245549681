"""Element id scheme + page-range parsing (reference M10 / M2 semantics).

The reference encodes reading order into deterministic element ids:
  region: "b{block}" with a "pg{1+pageno}_" prefix when the run has multiple
          pages (`/root/reference/tesseract-recognize.cc:657-674`);
  line:   "{region_id}_p{para}_l{line}" (`tesseract-recognize.cc:724-727`).
Counters are 1-based (Tesseract iterator counters are incremented before
emission). Span equality is byte-exact on these ids, so this module is the
single source of truth for both the fixture oracle and the pipeline.

Page-range specs ("0,2-4" -> {0,2,3,4}) follow parsePagesSet
(`tesseract-recognize.cc:222-235`): comma-separated ints or lo-hi ranges,
deduped and ascending (std::set iteration order, reference O2).
"""

from __future__ import annotations


def region_id(block0: int, page: int = 0, n_pages: int = 1, crop_prefix: str = "") -> str:
    """block0/page are 0-based; multipage prefix is pg{1+page}_ per reference."""
    prefix = f"pg{page + 1}_" if n_pages > 1 else ""
    if crop_prefix:
        prefix = f"{crop_prefix}_{prefix}"
    return f"{prefix}b{block0 + 1}"


def line_id(rid: str, para: int, line: int) -> str:
    """para/line are 0-based; emitted 1-based per reference line-id scheme."""
    return f"{rid}_p{para + 1}_l{line + 1}"


def parse_pages_set(spec: str) -> list[int]:
    """'0,2-4' -> [0,2,3,4]; sorted, deduped; ValueError on malformed input
    (mirrors parsePagesSet, `/root/reference/tesseract-recognize.cc:222-235`)."""
    pages: set[int] = set()
    for part in spec.split(","):
        part = part.strip()
        if not part:
            raise ValueError(f"empty page spec element in {spec!r}")
        if "-" in part:
            lo_s, hi_s = part.split("-", 1)
            lo, hi = int(lo_s), int(hi_s)
            if hi < lo:
                raise ValueError(f"descending range {part!r}")
            pages.update(range(lo, hi + 1))
        else:
            pages.add(int(part))
    return sorted(pages)
