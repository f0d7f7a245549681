"""Small-file compaction for persisted parquet state (LSH index appends,
agg-state refreshes, bucketed copartition caches): every incremental write
adds files, and at 100 TB scale a partition directory accumulating
thousands of KB-sized files turns each later read into an open()-bound
scan. The compactor rewrites each leaf directory's small files into
~target-size files, Ray-parallel (one task per bin), WITHOUT changing row
content.

Crash safety is idempotence, not atomicity: a bin's output name is derived
from the SHA-1 of its member file names, and the member list is stamped
into the compact file's parquet key-value metadata, so
  * finishing a bin = write tmp (with member manifest) -> os.replace(final)
    -> delete members;
  * a crash BEFORE the replace leaves members intact (re-run redoes the bin);
  * a crash AFTER the replace but before all deletes is repaired by
    ``plan_compaction`` itself: before forming any new bins it reads the
    manifest of every existing compact-* file and deletes members that
    still exist. Without this sweep, surviving members would be grouped
    into a DIFFERENT bin (different SHA key) on the re-run and their rows
    written twice. With it, rows are never duplicated in the directory's
    final state and a re-run always converges.
Readers racing a compaction see either members or the compacted file plus
not-yet-deleted members — so compact state dirs between jobs, not under a
live reader (the same discipline as agg_state's write-new/swap update)."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq


_MANIFEST_KEY = b"trr.compact.members"


def _finish_pending_deletes(dirpath: str, filenames: list[str]) -> set[str]:
    """Recovery sweep: for every existing compact-* file, read its member
    manifest (parquet footer metadata — no data pages touched) and delete
    members a crashed run left behind. Returns the set of member names
    removed so the caller can exclude them from bin planning even if the
    unlink itself races."""
    swept: set[str] = set()
    for f in filenames:
        if not (f.startswith("compact-") and f.endswith(".parquet")):
            continue
        try:
            meta = pq.read_schema(os.path.join(dirpath, f)).metadata or {}
        except Exception:
            continue  # unreadable compact file: leave it for the operator
        raw = meta.get(_MANIFEST_KEY)
        if not raw:
            continue
        for m in raw.decode().split("\n"):
            fp = os.path.join(dirpath, m)
            if os.path.exists(fp):
                os.remove(fp)
                swept.add(m)
    return swept


def plan_compaction(path: str, target_bytes: int = 64 << 20) -> list[dict]:
    """Walk leaf directories under ``path`` and greedily group their
    parquet files (sorted by name) into bins of up to ``target_bytes``
    total. Bins with a single member are skipped — nothing to gain.
    Before planning, finishes any pending member deletes recorded in
    existing compact-* manifests (see module docstring)."""
    bins: list[dict] = []
    for dirpath, _dirnames, filenames in os.walk(path):
        swept = _finish_pending_deletes(dirpath, filenames)
        files = sorted(
            f
            for f in filenames
            if f.endswith(".parquet") and not f.startswith("compact-") and f not in swept
        )
        # already-compacted files join new members on a later pass only if
        # they are below target (they keep their compact- name but count as
        # members then); first pass: compact the raw small files
        if len(files) < 2:
            continue
        cur: list[str] = []
        cur_bytes = 0
        for f in files:
            fp = os.path.join(dirpath, f)
            sz = os.path.getsize(fp)
            if cur and cur_bytes + sz > target_bytes:
                if len(cur) >= 2:
                    bins.append({"dir": dirpath, "members": list(cur)})
                cur, cur_bytes = [], 0
            cur.append(f)
            cur_bytes += sz
        if len(cur) >= 2:
            bins.append({"dir": dirpath, "members": list(cur)})
    return bins


def compact_bin(dirpath: str, members: list[str]) -> dict:
    """Compact one bin (see module docstring for the idempotence contract).
    Returns {dir, n_members, rows, skipped}."""
    key = hashlib.sha1("\n".join(members).encode()).hexdigest()[:16]
    final = os.path.join(dirpath, f"compact-{key}.parquet")
    rows = 0
    if not os.path.exists(final):
        tables = [pq.read_table(os.path.join(dirpath, m)) for m in members]
        merged = pa.concat_tables(tables, promote_options="default")
        rows = merged.num_rows
        meta = dict(merged.schema.metadata or {})
        meta[_MANIFEST_KEY] = "\n".join(members).encode()
        merged = merged.replace_schema_metadata(meta)
        tmp = final + ".tmp"
        pq.write_table(merged, tmp)
        os.replace(tmp, final)
        skipped = False
    else:  # earlier run crashed mid-delete: finish the deletes only
        skipped = True
    for m in members:
        fp = os.path.join(dirpath, m)
        if os.path.exists(fp):
            os.remove(fp)
    return {"dir": dirpath, "n_members": len(members), "rows": rows, "skipped": skipped}


def compact_parquet_dir(path: str, target_bytes: int = 64 << 20):
    """Compact every leaf directory under ``path``; bins run Ray-parallel
    (one map task per bin — bins are independent by construction). Returns
    a pandas summary (dir, n_members, rows, skipped), empty when there was
    nothing to compact."""
    import pandas as pd
    import ray.data as rd

    bins = plan_compaction(path, target_bytes)
    if not bins:
        return pd.DataFrame({"dir": [], "n_members": [], "rows": [], "skipped": []})

    def run(b: pd.DataFrame) -> pd.DataFrame:
        out = [compact_bin(d, list(m)) for d, m in zip(b["dir"], b["members"])]
        return pd.DataFrame(out)

    return rd.from_items(bins).map_batches(run, batch_format="pandas").to_pandas()
