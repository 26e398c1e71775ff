"""Data-parallel alignment + statistic accumulation over a device mesh.

One step = (features, graphs) sharded over the "data" (utterance) axis →
emission loglikes + dense Viterbi per shard → GMM/transition statistics
reduced across the mesh with ``jax.lax.psum``. This is the TPU-native
replacement for the reference's per-job ``AccStatsFunction`` workers plus
parent-process accumulator summation (``alignment/multiprocessing.py:576-666``,
``utils.py:1505-1641``): the queue/DB control plane becomes a single SPMD
program whose reductions ride ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec

try:  # jax >= 0.6 exposes shard_map at top level (experimental path deprecated)
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

import inspect as _inspect

# the replication-check kwarg was renamed check_rep -> check_vma across jax
# versions; the graph pytree mixes sharded/replicated leaves so it must be off
_NO_REP_CHECK = (
    {"check_vma": False}
    if "check_vma" in _inspect.signature(shard_map).parameters
    else {"check_rep": False}
)

from montreal_forced_aligner_tpu.ops.viterbi import BatchedGraph, NEG_INF


def _align_and_accumulate(
    feats,  # (b, T, D) local shard
    frame_lengths,  # (b,)
    graph: BatchedGraph,  # leading axis = local shard
    miv,  # (P, G, D) replicated
    iv,
    gconst,
    acoustic_scale: float,
    axis_name: str,
):
    from montreal_forced_aligner_tpu.ops.gmm_loglikes import gmm_state_loglikes
    from montreal_forced_aligner_tpu.ops.viterbi import viterbi_align_batch

    num_pdfs = miv.shape[0]
    s_miv, s_iv, s_gc = miv[graph.state_pdf], iv[graph.state_pdf], gconst[graph.state_pdf]
    emit = gmm_state_loglikes(feats, s_miv, s_iv, s_gc)
    state_path, scores = viterbi_align_batch(
        emit, frame_lengths, graph, acoustic_scale=acoustic_scale
    )
    frame_pdf = jnp.take_along_axis(graph.state_pdf, state_path, axis=1)

    # GMM stats (inline: posteriors over the aligned pdf's gaussians)
    B, T, D = feats.shape
    P, G, _ = miv.shape
    mask = (jnp.arange(T)[None, :] < frame_lengths[:, None]).reshape(-1)
    pdf_flat = jnp.where(mask, frame_pdf.reshape(-1), 0)
    x = feats.reshape(-1, D)
    quad = (
        jnp.einsum("ngd,nd->ng", miv[pdf_flat], x, precision=jax.lax.Precision.HIGHEST)
        - 0.5
        * jnp.einsum(
            "ngd,nd->ng", iv[pdf_flat], x * x, precision=jax.lax.Precision.HIGHEST
        )
        + gconst[pdf_flat]
    )
    loglike = jax.scipy.special.logsumexp(quad, axis=-1)
    post = jnp.where(mask[:, None], jnp.exp(quad - loglike[:, None]), 0.0)
    occ = jax.ops.segment_sum(post, pdf_flat, P)
    mean_acc = jax.ops.segment_sum(post[:, :, None] * x[:, None, :], pdf_flat, P)
    var_acc = jax.ops.segment_sum(post[:, :, None] * (x * x)[:, None, :], pdf_flat, P)
    total_ll = jnp.sum(jnp.where(mask, loglike, 0.0))
    total_frames = jnp.sum(frame_lengths).astype(jnp.float32)

    # cross-mesh reduction: the reference's parent-process accumulator sums
    # (axis_name=None runs the same program unsharded, outside any mesh —
    # used by parallel/scaling.py to price the SPMD machinery itself)
    if axis_name is not None:
        occ = jax.lax.psum(occ, axis_name)
        mean_acc = jax.lax.psum(mean_acc, axis_name)
        var_acc = jax.lax.psum(var_acc, axis_name)
        total_ll = jax.lax.psum(total_ll, axis_name)
        total_frames = jax.lax.psum(total_frames, axis_name)
    return state_path, scores, occ, mean_acc, var_acc, total_ll, total_frames


def make_sharded_accumulate_step(
    mesh: Mesh, acoustic_scale: float = 0.1, axis_name: str = "data"
):
    """Build a jitted SPMD step: batch sharded over utterances, model
    replicated, stats psum-reduced (replicated output)."""
    data = PartitionSpec(axis_name)
    rep = PartitionSpec()
    graph_specs = BatchedGraph(
        in_src=data,
        in_weight=data,
        in_tid=data,
        start=data,
        final=data,
        final_tid=data,
        state_pdf=data,
        state_phone=data,
        state_word=data,
        state_hmm_pos=data,
        state_tstate=data,
        state_instance=data,
        num_states=data,
    )
    fn = shard_map(
        partial(_align_and_accumulate, acoustic_scale=acoustic_scale, axis_name=axis_name),
        mesh=mesh,
        in_specs=(data, data, graph_specs, rep, rep, rep),
        out_specs=(data, data, rep, rep, rep, rep, rep),
        **_NO_REP_CHECK,
    )
    return jax.jit(fn)


def make_sharded_fmllr_stats_step(mesh: Mesh, axis_name: str = "data"):
    """SPMD per-speaker fMLLR statistics: batch sharded over utterances,
    model replicated, (K, G, beta) psum-reduced across the mesh so every
    host holds the full per-speaker blocks (the BASELINE north star's
    "per-speaker fMLLR stats exchanged via all-gather"; psum of
    speaker-indexed blocks is the dense equivalent — each shard contributes
    zeros for speakers it does not own). Reference semantics:
    ``kalpy.feat.fmllr.FmllrComputer`` per-speaker accumulation,
    ``corpus/features.py:422-548``."""
    from montreal_forced_aligner_tpu.ops.transforms import (
        accumulate_fmllr_stats,
    )

    data = PartitionSpec(axis_name)
    rep = PartitionSpec()

    def _step(
        feats, frame_lengths, frame_pdf, speaker_idx, frame_weight,
        means, inv_vars, gconsts, miv, num_speakers,
    ):
        K, G, beta = accumulate_fmllr_stats(
            feats, frame_lengths, frame_pdf, speaker_idx, frame_weight,
            means, inv_vars, gconsts, miv, num_speakers,
        )
        K = jax.lax.psum(K, axis_name)
        G = jax.lax.psum(G, axis_name)
        beta = jax.lax.psum(beta, axis_name)
        return K, G, beta

    def build(num_speakers: int):
        fn = shard_map(
            partial(_step, num_speakers=num_speakers),
            mesh=mesh,
            in_specs=(data, data, data, data, data, rep, rep, rep, rep),
            out_specs=(rep, rep, rep),
            **_NO_REP_CHECK,
        )
        return jax.jit(fn)

    return build
