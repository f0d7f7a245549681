"""tesseract_recognize_ray — a Ray-Data-native layout-analysis + OCR
extraction engine with the query/data-processing capabilities of
``mauvilsa/tesseract-recognize`` (reference snapshot at /root/reference,
version 2025.03.31).

NOT a port: the reference is a single-process C++ CLI + Flask wrapper
(`tesseract-recognize.cc`, `tesseract_recognize_api.py`); this engine
expresses the same semantics as ``ray.data.Dataset`` pipelines of
``map_batches`` over zero-copy Arrow batches, with actor pools for the
stateful recognition stage and an explicit ``groupby(doc_id)`` shuffle for
per-document span reassembly (SURVEY.md §2/§3).

Layout:
  glyphs      — deterministic 5x7 bitmap font bank (fixture font == recognizer templates)
  fixtures    — seeded synthetic corpus generator (docs/media/golden oracle)
  geometry    — pure coord/baseline/angle functions (reference M7/M8/G1 semantics)
  idscheme    — element id + page-range parsing (reference M10/M2 semantics)
  config      — pipeline configuration + validation (reference M3/M4 semantics)
  sources/    — readers/writers (parquet now; lance import-gated)
  stages/     — decode, segment, recognize, assemble Ray Data stages
  pipelines/  — flagship extraction pipeline composition
  state/      — checkpoint manifest + resume
  functions/  — relational / dedup / similarity / text-analysis operators
"""

# 0.2.0: doc_partition switched crc32 -> fixed-key vectorized hash; the
# version feeds lineage_hash, so manifests written under the old bucket
# assignment fail the resume check and re-run instead of silently mixing
# partition schemes (docs lost/duplicated across old and new buckets).
__version__ = "0.2.0"
