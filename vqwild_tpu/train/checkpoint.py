"""Checkpoint save/restore via Orbax.

The reference saves only ``best.pth.tar`` {epoch, state_dict, score,
optimizer} on validation improvement (main.py:591-604) and reloads it for the
final test pass. We keep that contract (``best``) and additionally write
``last`` each epoch for mid-training resume — a documented improvement over
upstream (which has no resume, SURVEY §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from vqwild_tpu.core.logging import get_logger

log = get_logger("train.checkpoint")


def _to_saveable(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, name: str, payload: Any):
        path = self._path(name)
        self._ckptr.save(path, _to_saveable(payload), force=True)
        self._ckptr.wait_until_finished()
        log.info("saved checkpoint %s", path)

    def restore(self, name: str, template: Optional[Any] = None) -> Any:
        path = self._path(name)
        if template is not None:
            return self._ckptr.restore(path, template)
        return self._ckptr.restore(path)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))
