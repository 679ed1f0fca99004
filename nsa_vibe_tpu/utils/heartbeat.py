"""Per-process heartbeat: one JSON line per beat with training vitals.

Reference: scripts/train_showcase.py:167-205 — heartbeat jsonl per rank,
consumed by the out-of-process watchdog (utils/watchdog.py).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


class Heartbeat:
    def __init__(self, path: str, rank: int = 0):
        self.path = path
        self.rank = rank
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def beat(self, step: int, **fields: Any) -> None:
        rec = {"ts": time.time(), "rank": self.rank, "step": step, **fields}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    @staticmethod
    def last_beat(path: str) -> Optional[dict]:
        try:
            with open(path, "rb") as f:
                lines = f.read().splitlines()
            for line in reversed(lines):
                if line.strip():
                    return json.loads(line)
        except (OSError, json.JSONDecodeError):
            return None
        return None
