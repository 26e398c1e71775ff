"""Worker for the simulated multi-host test (see ``test_parallel.py``).

Each process owns 4 virtual CPU devices; ``jax.distributed`` stitches them
into one 8-device global mesh, so the SPMD accumulate step's ``psum`` rides
the cross-process channel exactly as it would ride DCN across real hosts
(reference analogue: independent worker processes whose accumulators are
summed by the parent, ``utils.py:1505-1641``).

Usage: python multihost_worker.py PROCESS_ID NUM_PROCESSES PORT OUT_NPZ
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import numpy as np


def main():
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    port = int(sys.argv[3])
    out_path = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from montreal_forced_aligner_tpu.parallel.data_parallel import (
        make_sharded_accumulate_step,
    )
    from montreal_forced_aligner_tpu.parallel.mesh import get_mesh

    devices = jax.devices()
    assert len(devices) == 4 * num_procs, devices
    mesh = get_mesh(devices)
    B = len(devices) * 2

    # identical global batch on every process (deterministic seed)
    feats, lens, graph, miv, iv, gconst = ge._toy_batch(
        B=B, T=32, S=16, K=4, P=8, G=2, D=13
    )

    def globalize(x, spec):
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    data = PartitionSpec("data")
    rep = PartitionSpec()
    feats = globalize(feats, data)
    lens = globalize(lens, data)
    graph = jax.tree_util.tree_map(lambda x: globalize(x, data), graph)
    miv, iv, gconst = (globalize(x, rep) for x in (miv, iv, gconst))

    step = make_sharded_accumulate_step(mesh, acoustic_scale=0.1)
    state_path, scores, occ, mean_acc, var_acc, ll, frames = step(
        feats, lens, graph, miv, iv, gconst
    )
    jax.block_until_ready((occ, mean_acc, var_acc, ll, frames))
    if proc_id == 0:
        np.savez(
            out_path,
            occ=np.asarray(occ),
            mean_acc=np.asarray(mean_acc),
            var_acc=np.asarray(var_acc),
            ll=np.asarray(ll),
            frames=np.asarray(frames),
        )
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
