"""Pipeline configuration — the typed equivalent of the reference CLI surface
(`/root/reference/tesseract-recognize.cc:94-152`) with build-time validation
mirroring M3 (level parsing, `:64-72,272-290`) and M4 (PSM/OEM legality,
`:256-271,560-588`). Fail fast at pipeline construction, before any Ray work
is launched.
"""

from __future__ import annotations

from dataclasses import dataclass, field

LEVELS = ("region", "line", "word", "glyph")  # reference enum LEVEL_* (:50-62)

# PSM legality: CLI accepts {1, 3..12}; rejects 0, 2 and >=COUNT(13)
# (tesseract-recognize.cc:256-262). Node-level PSM constraints (:560-584):
_VALID_PSM = {1} | set(range(3, 13))
_NODE_PSM = {"line": {7, 13}, "word": {8, 9}, "glyph": {10}}


@dataclass
class PipelineConfig:
    """Typed replacement for the reference's global CLI options (§2.12)."""

    lang: str = "eng"
    psm: int = 3
    oem: int = 3
    layout_level: str = "line"  # deepest level materialized in the element table
    text_levels: tuple[str, ...] = ()  # default: text at layout level only (M3)
    only_layout: bool = False  # --only-layout: AnalyseLayout, no recognition (:342,592)
    density: int = 300  # PDF render dpi (--density, :45,108,132)
    save_crops: bool = False  # --save-crops debug sink (K3, :48,551-555)
    crops_dir: str = "/tmp/trr_crops"
    page_set: str | None = None  # "0,2-4" page selection (S2, :222-235)

    # Ray execution knobs (no reference equivalent; SURVEY.md §4)
    recognize_concurrency: tuple[int, int] = (2, 8)  # actor pool (min,max)
    recognize_batch_size: int = 16
    decode_batch_size: int = 32
    segment_batch_size: int = 16
    join_partitions: int = 16
    # skew handling (§4) lives in the fused source's byte-balanced splits
    # (stages/media_source.media_splits_by_cost) — est_cost proxy = bytes
    assemble_buckets: int = 64  # reassembly-shuffle partitions (crc32(doc_id) % P)
    # Pre-shuffle coalesce for the reassembly exchange: sort-exchange cost in
    # Ray 2.49 scales with INPUT BLOCK COUNT, not bytes, and the span stream
    # (text rows, no pixels) is tiny relative to its block count after the
    # union. None = AUTO: derived from the docs-file byte estimate by
    # pipelines.extract.auto_assemble_coalesce (16 blocks for small streams,
    # ~256 MB/block beyond, disabled above 64 GB or when the estimate is
    # unavailable — at 100 TB the span stream is ~corpus-text-sized and must
    # NOT be forced through few blocks, same growth rule as grouped_agg's
    # reduce_blocks). 0 = never coalesce; an int pins the width.
    # Measured same-host A/B (6k docs, 32 CPUs): 16 -> 8.0-9.6s vs off ->
    # 13.8-14.1s wall.
    assemble_coalesce: int | None = None
    quarantine: bool = False  # poison-row quarantine: bad media -> error row
    # (deviation from the reference's abort-on-failure when True, SURVEY.md §4)

    def __post_init__(self) -> None:
        if self.layout_level not in LEVELS:
            raise ValueError(f"layout_level {self.layout_level!r} not in {LEVELS} (M3)")
        for lv in self.text_levels:
            if lv not in LEVELS:
                raise ValueError(f"text_levels entry {lv!r} not in {LEVELS} (M3)")
        if self.psm not in _VALID_PSM and self.psm != 13:
            raise ValueError(
                f"psm {self.psm} invalid: reference accepts 1,3-12 "
                "(tesseract-recognize.cc:256-262)"
            )
        if not (0 <= self.oem <= 3):
            raise ValueError(f"oem {self.oem} outside [0,4) (tesseract-recognize.cc:263-271)")
        if self.density <= 0:
            raise ValueError("density must be positive")

    def effective_text_levels(self) -> tuple[str, ...]:
        """Default: text emitted at the layout level only (M3, :329-331)."""
        return self.text_levels or (self.layout_level,)

    @staticmethod
    def check_node_psm(node_level: str, psm: int) -> None:
        """XML node-level PSM legality: line->{7,13}, word->{8,9}, glyph->{10}
        (reference :560-584); region accepts any valid psm."""
        allowed = _NODE_PSM.get(node_level)
        if allowed is not None and psm not in allowed:
            raise ValueError(
                f"psm {psm} illegal for node level {node_level!r}; allowed {sorted(allowed)} "
                "(tesseract-recognize.cc:560-584)"
            )

    def check_selection_level(self, selection_level: str) -> None:
        """layout_level must be >= (deeper or equal to) the selection level
        (reference :585-588)."""
        if LEVELS.index(self.layout_level) < LEVELS.index(selection_level):
            raise ValueError(
                f"layout_level {self.layout_level!r} shallower than selection "
                f"{selection_level!r} (tesseract-recognize.cc:585-588)"
            )
