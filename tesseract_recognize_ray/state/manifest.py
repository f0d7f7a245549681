"""Per-partition checkpoint manifest (SURVEY.md §4 'Checkpoint / resume').

The reference has no checkpointing (any failure aborts the run,
`/root/reference/tesseract-recognize.cc:412,461,517,545`; the API tier just
cleans tmpdirs, `tesseract_recognize_api.py:309-312`). The north_rule demands
exact resume, so every partition writes:

    out_dir/part-{i:05d}/*.parquet      (written to a tmp dir, renamed = atomic)
    out_dir/manifest/part-{i:05d}.json  (fingerprint + lineage + metrics)

Lineage is the moral equivalent of the reference's tool_info provenance stamp
(`tesseract-recognize.cc:377-381,534`): engine version + config hash. Resume
= anti-join of the partition list against valid manifest entries; a partition
re-runs iff its manifest is missing OR its input fingerprint / lineage hash
changed. Metrics per partition: docs, rows, seconds, docs/sec (the analog of
the API tier's per-request wall-time log, `tesseract_recognize_api.py:261-266`).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from typing import Any


def _file_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{os.path.abspath(path)}:{st.st_size}:{int(st.st_mtime)}"


def input_fingerprint(paths: list[str]) -> str:
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(_file_fingerprint(p).encode())
    return h.hexdigest()[:16]


def lineage_hash(cfg: Any) -> str:
    """Engine version + full config repr -> stable hash; config changes
    invalidate prior partitions (they were computed under other semantics)."""
    from .. import __version__

    payload = f"{__version__}|{dataclasses.asdict(cfg) if dataclasses.is_dataclass(cfg) else repr(cfg)}"
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def part_name(i: int | str) -> str:
    """Partition dir/entry name: zero-padded for int partitions (doc-hash
    mode), verbatim for string keys (file-aligned shard mode)."""
    return f"part-{i:05d}" if isinstance(i, int) else f"part-{i}"


def manifest_path(out_dir: str, i: int | str) -> str:
    return os.path.join(out_dir, "manifest", part_name(i) + ".json")


def write_entry(
    out_dir: str,
    i: int,
    *,
    fingerprint: str,
    lineage: str,
    n_parts: int,
    docs: int,
    rows: int,
    seconds: float,
    extra: dict | None = None,
) -> dict:
    entry = {
        "part": i,
        "n_parts": n_parts,
        "status": "done",
        "fingerprint": fingerprint,
        "lineage": lineage,
        "docs": docs,
        "rows": rows,
        "seconds": round(seconds, 3),
        "docs_per_sec": round(docs / seconds, 3) if seconds > 0 else None,
        "completed_at": time.time(),
    }
    if extra:
        entry.update(extra)
    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
    tmp = manifest_path(out_dir, i) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, manifest_path(out_dir, i))  # atomic
    return entry


def read_entry(out_dir: str, i: int) -> dict | None:
    p = manifest_path(out_dir, i)
    if not os.path.exists(p):
        return None
    try:
        with open(p) as f:
            return json.load(f)
    except (json.JSONDecodeError, OSError):
        return None  # torn write -> treat as unfinished


def is_done(out_dir: str, i: int, *, fingerprint: str, lineage: str, n_parts: int) -> bool:
    e = read_entry(out_dir, i)
    return bool(
        e
        and e.get("status") == "done"
        and e.get("fingerprint") == fingerprint
        and e.get("lineage") == lineage
        and e.get("n_parts") == n_parts
        and os.path.isdir(os.path.join(out_dir, part_name(i)))
    )


def read_all(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, "manifest")
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            try:
                with open(os.path.join(mdir, name)) as f:
                    out.append(json.load(f))
            except (json.JSONDecodeError, OSError):
                pass
    return out
