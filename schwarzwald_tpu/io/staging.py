"""Atomic per-batch staging for file-backed persistence sinks.

Nodes are persisted incrementally INSIDE a batch; the checkpoint
(tiler_state.json) marks batch boundaries. Without staging, a mid-batch
crash leaves some nodes already containing the in-flight batch's points,
and a resume re-tiles that batch, duplicating them. With staging:

  * begin(): node writes go to <work_dir>/.staging/ instead of their
    committed paths;
  * commit(): a manifest (the staged -> committed rename list) is written
    atomically FIRST, then every file is os.replace()d into place, then
    the manifest is removed — the checkpoint is only written after
    commit() returns;
  * recover() (at sink construction): a surviving manifest means a crash
    during commit — replay the renames (os.replace is idempotent here
    because staged sources are only removed by the rename itself); staged
    files without a manifest are an abandoned in-flight batch — discard.

So after any crash, the committed node files correspond exactly to the
batches the checkpoint says were completed.
"""
from __future__ import annotations

import json
import os
import shutil


class FileStaging:
    MANIFEST = "MANIFEST.json"

    def __init__(self, work_dir: str):
        self.dir = os.path.join(work_dir, ".staging")
        self.manifest_path = os.path.join(self.dir, self.MANIFEST)
        self._active: list | None = None
        self._recover()

    def _recover(self) -> None:
        if os.path.exists(self.manifest_path):
            # crash mid-commit: finish the replay
            for staged, target in json.load(open(self.manifest_path)):
                if os.path.exists(staged):
                    os.replace(staged, target)
            os.remove(self.manifest_path)
        if os.path.isdir(self.dir):
            # leftovers without a manifest: abandoned in-flight batch
            shutil.rmtree(self.dir, ignore_errors=True)

    def begin(self) -> None:
        os.makedirs(self.dir, exist_ok=True)
        self._active = []

    @property
    def active(self) -> bool:
        return self._active is not None

    def path_for(self, target_path: str) -> str:
        """The path a node write should go to right now."""
        if self._active is None:
            return target_path
        staged = os.path.join(self.dir, os.path.basename(target_path))
        self._active.append((staged, target_path))
        return staged

    def commit(self) -> None:
        if self._active is None:
            return
        entries, self._active = self._active, None
        if entries:
            tmp = self.manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(entries, f)
            os.replace(tmp, self.manifest_path)
            for staged, target in entries:
                os.replace(staged, target)
            os.remove(self.manifest_path)
        try:
            os.rmdir(self.dir)  # keep the work dir free of empty leftovers
        except OSError:
            pass
