"""Async sharded checkpointing via Orbax.

Equivalent of the reference's DCP DistributedCheckpointer
(rcm/checkpointers/dcp.py): per-key subdirectories, async background save,
`latest_checkpoint.txt` resume selection (:427-450), EMA->regular remap on
load (:202-241 ModelWrapper load_ema_to_reg).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _manager(ckpt_dir: str, async_save: bool = True):
    import orbax.checkpoint as ocp
    options = ocp.CheckpointManagerOptions(
        max_to_keep=3, enable_async_checkpointing=async_save)
    return ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options)


class Checkpointer:
    """save/load of arbitrary pytree states keyed by iteration."""

    def __init__(self, ckpt_dir: str, async_save: bool = True):
        self.dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.dir, exist_ok=True)
        self.mgr = _manager(ckpt_dir, async_save)

    def save(self, step: int, state: Any):
        import orbax.checkpoint as ocp
        self.mgr.save(step, args=ocp.args.StandardSave(state))
        # latest_checkpoint.txt for parity with the reference layout
        # (dcp.py:16-49)
        with open(os.path.join(self.dir, "latest_checkpoint.txt"), "w") as f:
            f.write(f"iter_{step:09d}")

    def wait(self):
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        import orbax.checkpoint as ocp
        step = self.latest_step() if step is None else step
        if step is None:
            return None, None
        restored = self.mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step


def load_ema_as_params(state) -> Any:
    """EMA->regular weight extraction for inference export
    (scripts/dcp_to_pth.py:36-46 extracts net_ema.* -> net.*)."""
    return state.ema if getattr(state, "ema", None) is not None \
        else state.student
