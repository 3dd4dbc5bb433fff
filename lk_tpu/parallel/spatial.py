"""Spatial (row-sharded) dense LK with halo exchange — the SP/CP analogue.

For frames too large for one chip (or to cut per-frame latency), rows are
sharded over the ``spatial`` mesh axis.  Every stencil op in the dense LK
level needs neighbor rows: Scharr (2), the box window (win_h//2 + 1), and
the vertical warp displacement bound (max_disp).  One halo exchange of
``halo = max_disp + win_h//2 + 4`` rows per iteration round-trip suffices;
halos move over ICI with jax.lax.ppermute inside shard_map (SURVEY.md §2.5,
§5.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from lk_tpu.config import DenseLKConfig, LKConfig
from lk_tpu.flow.dense import dense_lk_level


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad a row-sharded block with `halo` rows from ring neighbors.

    x: (local_h, W).  Returns (local_h + 2*halo, W); at the outer edges the
    halo is edge-padding (replicating the reference's border handling).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_rows = x[:halo]        # my top rows -> neighbor above wants them? no:
    bot_rows = x[-halo:]
    # neighbor above (idx-1) needs my top rows as its bottom halo; I need the
    # bottom rows of idx-1 as my top halo.
    up = [(i, (i - 1) % n) for i in range(n)]     # send to idx-1
    down = [(i, (i + 1) % n) for i in range(n)]   # send to idx+1
    from_below = jax.lax.ppermute(top_rows, axis_name, up)
    from_above = jax.lax.ppermute(bot_rows, axis_name, down)
    # edge shards: replicate own edge rows instead of wrapping around
    edge_top = jnp.repeat(x[:1], halo, axis=0)
    edge_bot = jnp.repeat(x[-1:], halo, axis=0)
    top_halo = jnp.where(idx == 0, edge_top, from_above)
    bot_halo = jnp.where(idx == n - 1, edge_bot, from_below)
    return jnp.concatenate([top_halo, x, bot_halo], axis=0)


def spatial_dense_lk_level(
    mesh: Mesh,
    cfg: LKConfig = LKConfig(),
    dense_cfg: DenseLKConfig = DenseLKConfig(),
    max_disp: int = 8,
    axis_name: str = "spatial",
):
    """Build a row-sharded dense LK level: (H, W) sharded on rows -> flow.

    Returns f(prev, next, flow_init) with all arrays sharded
    P(axis_name, None) on rows; flow_init (H, W, 2) sharded the same.
    """
    win_h = cfg.win_size[1]
    halo = max_disp + win_h // 2 + 4

    def local_fn(prev, nxt, flow):
        prev_h = halo_exchange(prev, halo, axis_name)
        next_h = halo_exchange(nxt, halo, axis_name)
        fx = halo_exchange(flow[..., 0], halo, axis_name)
        fy = halo_exchange(flow[..., 1], halo, axis_name)
        flow_h = jnp.stack([fx, fy], axis=-1)
        res = dense_lk_level(prev_h, next_h, flow_h, cfg, dense_cfg,
                             max_disp=max_disp)
        return res.flow[halo:-halo]

    spec = P(axis_name, None)
    spec3 = P(axis_name, None, None)
    return shard_map(
        local_fn, mesh=mesh,
        in_specs=(spec, spec, spec3),
        out_specs=spec3,
    )
