"""Checkpointing: single-file msgpack train-state checkpoints + feeder state.

Mirrors the reference contract (reference utils/checkpoint.py:8-58): files
named ``model.ckpt-<step>`` in the model dir, ``find_ckpt`` picks the max
step, restore cross-checks the stored step.  The payload is a flax-serialized
pytree {params, opt_state, batch_stats, step} instead of a torch pickle;
``load_reference_checkpoint`` (train/converter.py) imports reference torch
checkpoints.

Feeder (data-iterator) state is saved per rank as ``feeder_<rank>.pkl``
(reference saves feeder_<rank>.pth on crash; here it is saved on every
checkpoint, making every checkpoint a consistent resume point — preemption
safety, SURVEY.md section 5)."""

from __future__ import annotations

import glob
import logging
import os
import pickle
from typing import Any, Optional

import flax.serialization


def find_ckpt(base_dir: str) -> Optional[str]:
    """Latest model.ckpt-* path (reference utils/checkpoint.py:8-16)."""
    max_step = 0
    result = None
    for f in glob.iglob(os.path.join(base_dir, "model.ckpt-*")):
        step_s = f.split("-")[-1]
        if not step_s.isdigit():
            continue
        step = int(step_s)
        if step > max_step:
            result = f
            max_step = step
    return result


def save_state(model_dir: str, state, step: int) -> str:
    """Serialize a TrainState pytree to model.ckpt-<step> (atomic rename)."""
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, "model.ckpt-%d" % step)
    data = flax.serialization.to_bytes(state)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_state(path: str, state_template) -> Any:
    """Restore a TrainState from file into the template's structure."""
    with open(path, "rb") as f:
        data = f.read()
    state = flax.serialization.from_bytes(state_template, data)
    step = int(state.step)
    expected = int(path.split("-")[-1]) if path.split("-")[-1].isdigit() else None
    if expected is not None and expected != step:
        logging.warning("Step=%d, while checkpoint name says %d", step, expected)
    return state


def save_feeder_state(logdir: str, rank: int, feeder) -> str:
    path = os.path.join(logdir, "feeder_%d.pkl" % rank)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(feeder.state_dict(), f)
    os.replace(tmp, path)
    return path


def maybe_load_feeder_state(logdir: str, rank: int, feeder) -> bool:
    path = os.path.join(logdir, "feeder_%d.pkl" % rank)
    if os.path.exists(path):
        with open(path, "rb") as f:
            feeder.load_state_dict(pickle.load(f))
        return True
    return False
