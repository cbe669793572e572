"""Cached per-partition watermark/lineage view over a CDC job's on-disk
state — the in-memory backend the package docstring promises.

The durable truth stays on storage (`<out>/lineage/part=*/_latest.json`,
written atomically by MergeApply); this store is a mtime-invalidated read
cache over it, for resume planning, monitoring, and merge_mode="actors"
workers that consult watermarks repeatedly without re-reading JSON per
batch.
"""

from __future__ import annotations

import json
import os
import re

_PART_RE = re.compile(r"part=(\d+)$")


class WatermarkStore:
    """Read-cached view of every partition's committed watermark record."""

    def __init__(self, out_dir: str):
        self.lineage_root = os.path.join(out_dir, "lineage")
        self._cache: dict = {}  # part -> (mtime, record)

    def parts(self) -> "list[int]":
        if not os.path.isdir(self.lineage_root):
            return []
        out = []
        for d in os.listdir(self.lineage_root):
            m = _PART_RE.search(d)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def get(self, part: int) -> "dict | None":
        """Latest committed record for a partition (None = never committed).
        Re-reads only when the file's mtime changed."""
        path = os.path.join(self.lineage_root, f"part={part:05d}", "_latest.json")
        try:
            mtime = os.stat(path).st_mtime_ns
        except FileNotFoundError:
            self._cache.pop(part, None)
            return None
        hit = self._cache.get(part)
        if hit and hit[0] == mtime:
            return hit[1]
        with open(path) as f:
            rec = json.load(f)
        self._cache[part] = (mtime, rec)
        return rec

    def watermark(self, part: int) -> int:
        rec = self.get(part)
        return rec.get("watermark", -1) if rec else -1

    def all_watermarks(self) -> "dict[int, int]":
        return {p: self.watermark(p) for p in self.parts()}

    def min_watermark(self) -> int:
        """The job-level safe resume point: every event at or below this
        LSN is committed in EVERY partition."""
        ws = self.all_watermarks()
        return min(ws.values()) if ws else -1

    def max_watermark(self) -> int:
        ws = self.all_watermarks()
        return max(ws.values()) if ws else -1
