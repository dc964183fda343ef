"""Checkpoint/resume (parity: the reference's per-iteration .mdl/.raw
writes + --stage resumability, SURVEY.md §5 — here orbax checkpoints of
params/optimizer/step plus a metadata dict for the data-position)."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from kaldi_tpu.base.logging import log


def save_checkpoint(ckpt_dir: str, state: Any, step: int,
                    extra: Optional[Dict] = None) -> str:
    """Save a pytree state (+ JSON sidecar metadata, e.g. the egs
    position); returns the checkpoint path."""
    import json

    import orbax.checkpoint as ocp
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    if extra:
        with open(path + ".meta.json", "w") as f:
            json.dump(extra, f)
    log(f"saved checkpoint {path}")
    return path


def restore_checkpoint(ckpt_dir: str, template: Any,
                       step: Optional[int] = None):
    """Restore the given (or latest) step; template supplies the pytree
    structure. Returns (state, extra, step)."""
    import json

    import orbax.checkpoint as ocp
    base = os.path.abspath(ckpt_dir)
    if step is None:
        steps = [int(d.split("_")[1]) for d in os.listdir(base)
                 if d.startswith("step_") and not d.endswith(".json")]
        if not steps:
            raise FileNotFoundError(f"no checkpoints in {base}")
        step = max(steps)
    path = os.path.join(base, f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(path, template)
    extra = None
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            extra = json.load(f)
    return state, extra, step


class ObjectiveInfo:
    """Running objective logging (nnet-training.h:123
    ObjectiveFunctionInfo): phase reports every N minibatches."""

    def __init__(self, name: str = "output", interval: int = 100):
        self.name = name
        self.interval = interval
        self.phase_objf = 0.0
        self.phase_frames = 0.0
        self.total_objf = 0.0
        self.total_frames = 0.0
        self.minibatches = 0

    def update(self, objf_per_frame: float, num_frames: float) -> None:
        self.phase_objf += objf_per_frame * num_frames
        self.phase_frames += num_frames
        self.total_objf += objf_per_frame * num_frames
        self.total_frames += num_frames
        self.minibatches += 1
        if self.minibatches % self.interval == 0:
            start = self.minibatches - self.interval
            log(f"Average objective function for '{self.name}' for "
                f"minibatches {start}-{self.minibatches - 1} is "
                f"{self.phase_objf / max(self.phase_frames, 1):.4f} over "
                f"{self.phase_frames:.0f} frames.")
            self.phase_objf = self.phase_frames = 0.0

    def print_total(self) -> float:
        avg = self.total_objf / max(self.total_frames, 1)
        log(f"Overall average objective for '{self.name}' is {avg:.4f} "
            f"over {self.total_frames:.0f} frames.")
        return avg
