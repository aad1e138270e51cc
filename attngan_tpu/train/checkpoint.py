"""Orbax checkpointing of whole train-state pytrees.

Reference: trainers/trainer.py:109-127 — per-module ``torch.save`` pickles
keyed by CLASS NAME, which silently collides for the four Adam optimizers
(all save to saved_weights/Adam.pkl, SURVEY.md §3.2) and never records the
step counter. Here the ENTIRE state (params + every optimizer state + step
+ PRNG key) is one orbax checkpoint, so resume is exact.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp
from flax import serialization


def save_checkpoint(directory: str, state: Any, step: int,
                    config: Any = None, epoch: Optional[int] = None) -> str:
    directory = os.path.abspath(directory)
    path = os.path.join(directory, f"step_{step:08d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)  # overwrite same-step re-runs
    if config is not None:
        # Sidecar with the model-shape config: restoring with mismatched
        # dims otherwise fails deep inside orbax with a raw shape error.
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2)
    if epoch is not None:
        # Epoch sidecar: the state pytree carries the step counter but not
        # the epoch (steps/epoch varies with degenerate-batch skips), and
        # resumed runs must continue epoch numbering, not restart at 1.
        with open(os.path.join(directory, "progress.json"), "w") as f:
            json.dump({"epoch": epoch, "step": step}, f)
    return path


def load_progress_sidecar(directory: str) -> int:
    """Epoch count recorded at the newest save (0 when absent — pre-sidecar
    checkpoints resume with epoch numbering restarted, the old behavior)."""
    path = os.path.join(os.path.abspath(directory), "progress.json")
    if os.path.exists(path):
        with open(path) as f:
            return int(json.load(f).get("epoch", 0))
    return 0


def load_config_sidecar(directory: str) -> Optional[dict]:
    path = os.path.join(os.path.abspath(directory), "config.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return None


def latest_checkpoint(directory: str) -> Optional[str]:
    directory = os.path.abspath(directory)
    if not os.path.isdir(directory):
        return None
    steps = sorted(d for d in os.listdir(directory) if d.startswith("step_"))
    return os.path.join(directory, steps[-1]) if steps else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (an abstract or concrete
    state pytree from the trainer's init)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, target))


def restore_inference_state(path: str, abstract_state: Any):
    """Restore ONLY the sampling subtrees of a GAN checkpoint, to host RAM.

    ``abstract_state``: a (possibly abstract, e.g. jax.eval_shape'd)
    GanState giving shapes/dtypes — no device arrays needed.

    Serving (reference test.py:77-87) touches just rnn_params / gen_params
    / gen_stats; the full training state at reference scale is 1.1 GB on
    disk (4 Adam moment trees + the frozen Inception + discriminators) and
    orbax's default restore places every leaf on the default device one by
    one — minutes through a remote-device tunnel (ROADMAP #8). Restoring
    the ~15% subtree as numpy and letting the caller device_put it once
    turns that into a single bulk transfer. Returns an InferState of
    np.ndarrays.
    """
    import numpy as np

    from attngan_tpu.infer.sampler import InferState

    sub = {"rnn_params": abstract_state.rnn_params,
           "gen_params": abstract_state.gen_params,
           "gen_stats": abstract_state.gen_stats}
    restore_args = jax.tree_util.tree_map(
        lambda a: ocp.type_handlers.RestoreArgs(restore_type=np.ndarray,
                                                dtype=a.dtype), sub)
    with ocp.PyTreeCheckpointer() as ckptr:
        out = ckptr.restore(path, args=ocp.args.PyTreeRestore(
            item=sub, restore_args=restore_args, partial_restore=True))
    return InferState(rnn_params=out["rnn_params"],
                      gen_params=out["gen_params"],
                      gen_stats=out["gen_stats"])


def load_converted(path: str) -> dict:
    """Load a tools/convert_torch_weights.py msgpack variables dict."""
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
