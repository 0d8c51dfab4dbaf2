"""Orbax checkpointing: best/latest tracking + weight averaging.

TPU-native replacement for the reference's rank-0 torch.save of
best_audio_model / latest `.pth` files each epoch (traintest.py:230-236) and
the checkpoint weight-averaging eval (`validate_wa`, traintest.py:342-370).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except Exception:  # pragma: no cover
    ocp = None


class Checkpointer:
    """Save/restore TrainState with best/latest tracking."""

    def __init__(self, directory: str):
        assert ocp is not None, "orbax-checkpoint is required"
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _save(self, name: str, state) -> None:
        path = os.path.join(self.directory, name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def save_best(self, state, epoch: int, metrics: dict) -> None:
        self._save("best", state)
        self._meta("best", epoch, metrics)

    def save_latest(self, state, epoch: int, metrics: dict) -> None:
        self._save(f"epoch_{epoch}", state)
        self._meta("latest", epoch, metrics)

    def _meta(self, tag: str, epoch: int, metrics: dict) -> None:
        with open(os.path.join(self.directory, f"{tag}.json"), "w") as f:
            json.dump({"epoch": epoch,
                       "metrics": {k: v for k, v in metrics.items()
                                   if isinstance(v, (int, float, str))}},
                      f)

    def restore(self, name: str, example_state):
        path = os.path.join(self.directory, name)
        return self._ckptr.restore(path, example_state)

    def available_epochs(self) -> list[int]:
        out = []
        for d in os.listdir(self.directory):
            if d.startswith("epoch_"):
                try:
                    out.append(int(d.split("_", 1)[1]))
                except ValueError:
                    pass
        return sorted(out)


def average_params(param_trees: list[Any]):
    """Uniform weight averaging over checkpoints (validate_wa,
    traintest.py:342-370: sums state dicts and divides by count)."""
    n = len(param_trees)
    assert n > 0
    return jax.tree.map(
        lambda *xs: np.mean(np.stack([np.asarray(x) for x in xs]), axis=0),
        *param_trees)
