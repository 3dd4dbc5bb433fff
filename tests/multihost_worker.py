"""Worker process for the 2-process multi-host test (test_multihost.py).

Runs the stream-sharded VP pipeline chunk on a GLOBAL mesh spanning two
OS processes (2 local CPU devices each -> data axis of 4), with each
process feeding only its own stream rows, then checks its local output
shards against a locally-computed single-process baseline.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lk_tpu.config import PipelineConfig
from lk_tpu.parallel.multihost import (
    global_stream_mesh,
    global_to_host_local,
    host_local_to_global,
    init_multihost,
    process_stream_slice,
)
from lk_tpu.parallel.streams import shard_pipeline_step
from lk_tpu.pipeline.runner import make_chunk_runner


def main():
    pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    init_multihost(f"localhost:{port}", num_processes=n, process_id=pid)
    assert jax.process_count() == n
    assert jax.local_device_count() == 2
    mesh = global_stream_mesh()
    assert mesh.shape["data"] == 2 * n, mesh

    cfg = PipelineConfig()
    w, h, b, t = 256, 144, 8, 3
    rng = np.random.default_rng(0)  # same frames derived in every process
    frames = (rng.random((b, t + 1, h, w)) * 255).astype(np.float32)

    # single-process baseline (local devices only, no mesh)
    run_chunk, init_fn, _ = make_chunk_runner(cfg, (w, h))
    states0 = jax.vmap(init_fn)(jnp.asarray(frames[:, 0]))
    _, base = jax.jit(jax.vmap(run_chunk))(states0, jnp.asarray(frames[:, 1:]))
    base = jax.device_get(base)

    # global run: this process feeds only the stream rows it owns
    rows = process_stream_slice(mesh, b)
    run_batch, init_batch, _ = shard_pipeline_step(mesh, cfg, (w, h))
    g_first = host_local_to_global(
        jnp.asarray(frames[rows, 0]), mesh, P("data")
    )
    g_frames = host_local_to_global(
        jnp.asarray(frames[rows, 1:]), mesh, P("data")
    )
    states = init_batch(g_first)
    states, outs = run_batch(states, g_frames)
    local = jax.tree_util.tree_map(
        lambda x: global_to_host_local(x, mesh, P("data")), outs
    )

    for ours, ref in zip(
        jax.tree_util.tree_leaves(local), jax.tree_util.tree_leaves(base)
    ):
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref)[rows], atol=1e-4
        )
    print(f"MULTIHOST_OK {pid} rows={rows.start}:{rows.stop}", flush=True)


if __name__ == "__main__":
    main()
