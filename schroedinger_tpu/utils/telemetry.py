"""Telemetry and metrics dumps (schro_dump / frame stats analog).

Set SCHRO_TPU_DUMP=1 (or pass a path) to stream per-frame JSONL metrics,
mirroring the reference's SCHRO_DUMP topic files (schrodebug.c:78-96) and
the 21-metric frame-stats API (schroencoder.c:1234-1258).
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional


class FrameStats:
    """Collects per-frame encoder metrics; optionally streams JSONL."""

    def __init__(self, path: Optional[str] = None):
        if path is None and os.environ.get("SCHRO_TPU_DUMP"):
            path = os.environ.get("SCHRO_TPU_DUMP_PATH",
                                  "schro_tpu_stats.jsonl")
        self._path = path
        self._f = open(path, "a") if path else None
        self.frames = []

    def record(self, **fields) -> None:
        fields.setdefault("t", time.time())
        self.frames.append(fields)
        if self._f:
            self._f.write(json.dumps(fields) + "\n")
            self._f.flush()

    def last(self):
        return self.frames[-1] if self.frames else None
