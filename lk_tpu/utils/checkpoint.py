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


def save_state(state: Any, path: str, meta: str = "") -> str:
    """Persist a state pytree plus its identity (treedef + optional meta).

    ``meta`` is an arbitrary identity string (e.g. the repr of the pipeline
    config); load_state rejects a checkpoint whose meta differs, so a
    VP_DETECT checkpoint cannot silently resume into a FINAL pipeline even
    when every leaf shape coincides.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(
        path, treedef=str(treedef), n=len(leaves), meta=str(meta), **arrs
    )
    return path


def load_state(template: Any, path: str, meta: str = "") -> Any:
    """Restore into the structure of ``template``.

    Rejects mismatched leaf count, leaf shape, leaf dtype, pytree structure
    (treedef string), and — when both sides provide one — identity ``meta``.
    """
    with np.load(path, allow_pickle=False) as z:
        n = int(z["n"])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        saved_treedef = str(z["treedef"]) if "treedef" in z.files else ""
        saved_meta = str(z["meta"]) if "meta" in z.files else ""
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    if meta and saved_meta and saved_meta != str(meta):
        raise ValueError(
            "checkpoint identity mismatch: saved for "
            f"{saved_meta!r}, loading into {str(meta)!r}"
        )
    if saved_treedef and saved_treedef != str(treedef):
        raise ValueError(
            f"checkpoint structure mismatch:\n  saved:    {saved_treedef}"
            f"\n  template: {treedef}"
        )
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, template {len(t_leaves)}"
        )
    for i, (a, b) in enumerate(zip(t_leaves, leaves)):
        if tuple(np.shape(a)) != tuple(b.shape):
            raise ValueError(
                f"leaf {i}: shape mismatch {np.shape(a)} vs {b.shape}"
            )
        if np.asarray(a).dtype != b.dtype:
            raise ValueError(
                f"leaf {i}: dtype mismatch "
                f"{np.asarray(a).dtype} vs {b.dtype}"
            )
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(b) for b in leaves]
    )
