"""Checkpoint / resume for pipeline state pytrees.

The reference persists only outputs (pickle/CSV, reference
LK_Final.py:375-398) and cannot resume a run; here any pipeline state
(PipelineState / TrackerState / VPState — arbitrary NamedTuple pytrees of
arrays) round-trips through a single .npz, so long video jobs can stop and
resume mid-stream.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax


def save_state(state: Any, path: str) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, treedef=str(treedef), n=len(leaves), **arrs)
    return path


def load_state(template: Any, path: str) -> Any:
    """Restore into the structure of ``template`` (shapes must match)."""
    with np.load(path, allow_pickle=False) as z:
        n = int(z["n"])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template {len(t_leaves)}"
        )
    for a, b in zip(t_leaves, leaves):
        if tuple(np.shape(a)) != tuple(b.shape):
            raise ValueError(f"shape mismatch {np.shape(a)} vs {b.shape}")
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(b) for b in leaves]
    )
