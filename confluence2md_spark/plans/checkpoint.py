"""K2 — stage-granular checkpoint/resume.

Each completed stage writes its output table plus a manifest row
(stage, path, complete, ts). On restart with the same run_id, completed
stages are read back instead of recomputed — Spark has no cross-job resume,
so this lives at the orchestration layer (SURVEY.md §4.3). Manifests are
written atomically (tmp + rename). On a cluster the warehouse dir is object
storage and the same protocol applies (rename -> conditional put).
"""

from __future__ import annotations

import json
import os
import time


class CheckpointManager:
    def __init__(self, warehouse: str, run_id: str):
        self.warehouse = warehouse
        self.run_id = run_id
        self.dir = os.path.join(warehouse, "_manifests", run_id)
        os.makedirs(self.dir, exist_ok=True)

    def _manifest(self, stage: str) -> str:
        return os.path.join(self.dir, f"{stage}.json")

    def is_complete(self, stage: str) -> bool:
        p = self._manifest(stage)
        if not os.path.exists(p):
            return False
        with open(p) as f:
            return bool(json.load(f).get("complete"))

    def table_path(self, stage: str) -> str:
        with open(self._manifest(stage)) as f:
            return json.load(f)["path"]

    def mark_complete(self, stage: str, path: str) -> None:
        tmp = self._manifest(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {"run_id": self.run_id, "stage": stage, "path": path, "complete": True, "ts": time.time()},
                f,
            )
        os.replace(tmp, self._manifest(stage))
