"""Scaling-efficiency harness for the data-parallel alignment step.

BASELINE.md's fourth target row asks for a *measured* scaling report:
per-chip throughput at 1 chip, 1 host, and N>=2 hosts, with utterances
data-parallel and statistics psum-reduced. This module is that report's
generator: it times ``make_sharded_accumulate_step`` (the SPMD program
every training/alignment pass runs, ``parallel/data_parallel.py``) over
meshes of increasing device count with a FIXED per-device batch (weak
scaling — the deployment regime: more chips, more utterances in flight)
and emits one JSON-able dict.

Run it on whatever is attached:

    python -m montreal_forced_aligner_tpu.parallel.scaling          # attached devices
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m montreal_forced_aligner_tpu.parallel.scaling      # virtual mesh

On a real pod slice the psum rides ICI and ``weak_efficiency`` is the
number BASELINE.md asks for. On the CPU virtual mesh the N "devices"
share the host's cores, so compute contends and efficiency is a *lower
bound*; the harness still validates that the collective program scales
structurally (stats identical at every N) and measures the dispatch +
collective overhead that would otherwise hide until pod time. The report
carries ``platform``/``shared_core_host`` so a reader can tell which
regime produced it.

Reference counterpart being replaced: per-job worker processes with
parent-process accumulator summation and a final wall-clock log
(``alignment/multiprocessing.py:576-666``, ``utils.py:1505-1641``,
``abc.py:1372``) — scaling there is process-count scaling on one host;
here it is mesh scaling with XLA collectives.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Sequence

import numpy as np

import jax

# the environment's TPU plugin prepends itself to jax_platforms even when
# JAX_PLATFORMS=cpu is exported; honor an explicit cpu request (same
# workaround as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax.sharding import Mesh

from montreal_forced_aligner_tpu.ops.viterbi import NEG_INF, BatchedGraph
from montreal_forced_aligner_tpu.parallel.data_parallel import (
    make_sharded_accumulate_step,
)


def build_workload(
    batch: int,
    num_frames: int = 500,
    num_states: int = 192,
    num_pdfs: int = 512,
    num_gauss: int = 4,
    feat_dim: int = 39,
    seed: int = 0,
):
    """Synthetic (feats, lens, graph, model) alignment workload shaped like
    a real triphone pass: left-to-right graphs with self-loops, a GMM per
    pdf. Deterministic in ``seed`` so every mesh size sees identical math.
    """
    rng = np.random.RandomState(seed)
    # the model comes from its own stream so every mesh size sees the SAME
    # model regardless of batch size (utterance draws don't advance it)
    mrng = np.random.RandomState(seed + 104729)
    B, T, S, P, G, D = batch, num_frames, num_states, num_pdfs, num_gauss, feat_dim
    feats = rng.randn(B, T, D).astype(np.float32)
    lens = np.full(B, T, np.int32)
    lens[1::2] = max(2, (3 * T) // 4)
    in_src = np.zeros((B, S, 2), np.int32)
    in_weight = np.full((B, S, 2), NEG_INF, np.float32)
    for s in range(S):
        in_src[:, s, 0] = s  # self-loop
        in_weight[:, s, 0] = np.log(0.5)
        if s > 0:
            in_src[:, s, 1] = s - 1  # forward arc
            in_weight[:, s, 1] = np.log(0.5)
    start = np.full((B, S), NEG_INF, np.float32)
    start[:, 0] = 0.0
    final = np.full((B, S), NEG_INF, np.float32)
    final[:, S - 1] = 0.0
    graph = BatchedGraph(
        in_src=jnp.asarray(in_src),
        in_weight=jnp.asarray(in_weight),
        in_tid=jnp.zeros((B, S, 2), jnp.int32),
        start=jnp.asarray(start),
        final=jnp.asarray(final),
        final_tid=jnp.zeros((B, S), jnp.int32),
        state_pdf=jnp.asarray(rng.randint(0, P, (B, S)).astype(np.int32)),
        state_phone=jnp.zeros((B, S), jnp.int32),
        state_word=jnp.zeros((B, S), jnp.int32),
        state_hmm_pos=jnp.zeros((B, S), jnp.int32),
        state_tstate=jnp.zeros((B, S), jnp.int32),
        state_instance=jnp.zeros((B, S), jnp.int32),
        num_states=jnp.full(B, S, jnp.int32),
    )
    miv = mrng.randn(P, G, D).astype(np.float32)
    iv = (0.5 + mrng.rand(P, G, D)).astype(np.float32)
    gconst = mrng.randn(P, G).astype(np.float32)
    return (
        jnp.asarray(feats),
        jnp.asarray(lens),
        graph,
        jnp.asarray(miv),
        jnp.asarray(iv),
        jnp.asarray(gconst),
    )


def _block(outs):
    for leaf in jax.tree_util.tree_leaves(outs):
        leaf.block_until_ready()


def measure_scaling(
    device_counts: Optional[Sequence[int]] = None,
    per_device_batch: int = 8,
    num_frames: int = 500,
    repeats: int = 5,
    warmup: int = 2,
    workload_kwargs: Optional[Dict] = None,
) -> Dict:
    """Weak-scaling sweep of the SPMD accumulate step.

    For each N in ``device_counts`` (defaults to powers of two up to the
    attached device count; always swept ascending): mesh over the first N
    devices, global batch N * per_device_batch, min/median step wall time
    over ``repeats`` after ``warmup`` compiled runs. Returns a dict with
    per-N rows and ``weak_efficiency`` = t(smallest measured mesh) /
    t(N); with the default counts the baseline is the 1-device row and
    1.0 = perfect weak scaling.
    """
    devices = jax.devices()
    if device_counts is None:
        device_counts = [
            n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)
        ]
    # ascending so the efficiency baseline is the smallest mesh measured
    # (the 1-device row when present)
    device_counts = sorted(n for n in device_counts if n <= len(devices))
    kw = dict(num_frames=num_frames)
    kw.update(workload_kwargs or {})
    rows = []
    t1 = None
    check = None
    stat_check_ok = True
    for n in device_counts:
        mesh = Mesh(np.array(devices[:n]), ("data",))
        step = make_sharded_accumulate_step(mesh)
        args = build_workload(n * per_device_batch, **kw)
        audio_frames = int(np.asarray(args[1]).sum())
        for _ in range(warmup):
            _block(step(*args))
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            outs = step(*args)
            _block(outs)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        best = float(np.min(times))
        # total occupancy == total masked frames (posteriors normalize;
        # psum counts every shard exactly once — no double-count/drop),
        # so occ/n must equal the per-device frame count at every N
        occ_sum = float(np.asarray(outs[2]).sum())
        if check is None:
            check = occ_sum / n
        elif abs(occ_sum / n - check) > 1e-3 * max(abs(check), 1.0):
            stat_check_ok = False
        if t1 is None:
            t1 = best
        rows.append(
            {
                "devices": n,
                "global_batch": n * per_device_batch,
                "median_step_s": round(med, 5),
                # min is the low-noise estimator for a deterministic step
                # on the axon tunnel, whose per-call latency swings 3-5x
                "min_step_s": round(best, 5),
                "all_times_s": [round(t, 5) for t in times],
                "frames_per_s_per_device": round(audio_frames / best / n, 1),
                "weak_efficiency": round(t1 / best, 4),
                "occ_per_replica": occ_sum / n,
            }
        )
    # 1-chip mesh-machinery overhead: the same compute jitted WITHOUT
    # shard_map/psum vs the 1-device mesh row. On real hardware this is
    # the cost of wrapping the per-pass program in the SPMD machinery
    # (should be ~0: XLA elides single-participant collectives).
    mesh_overhead_pct = None
    if rows and rows[0]["devices"] == 1:
        from functools import partial as _partial

        from montreal_forced_aligner_tpu.parallel.data_parallel import (
            _align_and_accumulate,
        )

        plain = jax.jit(
            _partial(
                _align_and_accumulate, acoustic_scale=0.1, axis_name=None
            )
        )
        args = build_workload(per_device_batch, **kw)
        for _ in range(warmup):
            _block(plain(*args))
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            outs = plain(*args)
            _block(outs)
            times.append(time.perf_counter() - t0)
        t_plain = float(np.min(times))
        mesh_overhead_pct = round(
            100.0 * (rows[0]["min_step_s"] / t_plain - 1.0), 2
        )
    platform = devices[0].platform if devices else "none"
    return {
        "mesh_overhead_1dev_pct": mesh_overhead_pct,
        # False would mean the psum program dropped or double-counted a
        # shard somewhere in the sweep — never publish such a run
        "stat_check_ok": stat_check_ok,
        "metric": "weak_scaling_efficiency",
        "platform": platform,
        "host_cpus": os.cpu_count(),
        "shared_core_host": platform == "cpu",
        "per_device_batch": per_device_batch,
        "num_frames": num_frames,
        "rows": rows,
        "note": (
            "weak_efficiency = t(1 device)/t(N devices) at fixed "
            "per-device batch; on a cpu virtual mesh the devices share "
            "host cores, so this is a lower bound — run on a pod slice "
            "for the ICI number"
        ),
    }


def main():  # pragma: no cover - exercised via CLI
    report = measure_scaling()
    print(json.dumps(report))


if __name__ == "__main__":  # pragma: no cover
    main()
