"""Batched dense Viterbi forced alignment.

This is the framework's central kernel, replacing the reference's
single-threaded beam Viterbi in C++ (``gmm-align-compiled``; call sites
``alignment/mixins.py:68-95``, ``alignment/multiprocessing.py:791-853``).
Forced-alignment graphs are small (hundreds of states), so instead of beam
pruning we run an exact dense DP over all graph states for a whole batch of
utterances at once:

    alpha[0, s]  = start[s] + scale * emit[0, s]
    alpha[t, s]  = max_{s'} ( alpha[t-1, s'] + W[s', s] ) + scale * emit[t, s]
    best         = argmax_s alpha[T-1, s] + final[s]

The recursion is a ``lax.scan`` over frames whose step is a *dense max-plus
product* against a per-utterance (S, S) transition matrix. Graphs are sparse
(<= K incoming arcs per state), but on TPU a dense (B, S, S) broadcast-add +
max-reduce on the VPU is ~25x faster than an XLA gather of the sparse arc
lists (gathers do not vectorize on the VPU), and the matrix stays resident in
VMEM across the scan. The sparse incoming-arc lists remain the host-side
interchange format; densification happens once per batch on device.

Exactness means the reference's `beam`/`retry_beam` semantics ("retry with a
wider beam") are subsumed: nothing is ever pruned.

Backpointers are the argmax predecessor state (int32), written per frame;
the state path is reconstructed by a reverse scan on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e30


class BatchedGraph(NamedTuple):
    """Device representation of a batch of alignment graphs (padded).

    All arrays are batched over utterances; S = max states, K = max incoming
    arcs per state (sparse interchange form; densified on device).
    """

    in_src: jnp.ndarray  # (B, S, K) int32: source state of k-th incoming arc
    in_weight: jnp.ndarray  # (B, S, K) float32: arc weight (NEG_INF padding)
    in_tid: jnp.ndarray  # (B, S, K) int32: transition-id per incoming arc
    start: jnp.ndarray  # (B, S) float32: initial scores (NEG_INF if not start)
    final: jnp.ndarray  # (B, S) float32: final weights (NEG_INF if not final)
    final_tid: jnp.ndarray  # (B, S) int32: exit transition-id per final state
    state_pdf: jnp.ndarray  # (B, S) int32: pdf-id emitted by each state
    state_phone: jnp.ndarray  # (B, S) int32: phone id of each state
    state_word: jnp.ndarray  # (B, S) int32: transcript word index (-1 = silence)
    state_hmm_pos: jnp.ndarray  # (B, S) int32: hmm-state index within phone
    state_tstate: jnp.ndarray  # (B, S) int32: transition-state (for stats/ali)
    state_instance: jnp.ndarray  # (B, S) int32: phone-instance index
    num_states: jnp.ndarray  # (B,) int32

    @property
    def batch_size(self):
        return self.in_src.shape[0]


@jax.jit
def densify_transitions(graph: BatchedGraph) -> jnp.ndarray:
    """(B, S, S) max-plus transition matrix W[b, s_prev, s] from the sparse
    incoming-arc lists (parallel arcs collapse to their best weight)."""
    B, S, K = graph.in_src.shape
    W = jnp.full((B, S, S), NEG_INF, dtype=jnp.float32)
    b_idx = jnp.arange(B)[:, None, None]
    dst_idx = jnp.arange(S)[None, :, None]
    W = W.at[
        jnp.broadcast_to(b_idx, (B, S, K)),
        graph.in_src,
        jnp.broadcast_to(dst_idx, (B, S, K)),
    ].max(graph.in_weight)
    return W


@partial(jax.jit, static_argnames=("acoustic_scale",))
def viterbi_align_batch(
    emit: jnp.ndarray,  # (B, T, S) emission log-likelihoods per graph state
    frame_lengths: jnp.ndarray,  # (B,)
    graph: BatchedGraph,
    acoustic_scale: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (state_path (B, T) int32, best_score (B,) float32).

    Padded frames (t >= frame_lengths[b]) hold a frozen copy of the final
    state so scores and paths are exact for each utterance's true length.
    """
    B, T, S = emit.shape
    emit = acoustic_scale * emit
    W = densify_transitions(graph)  # (B, S_prev, S)

    t_iota = jnp.arange(T)

    def step(alpha_prev, inputs):
        emit_t, t = inputs  # (B, S), scalar
        cand = alpha_prev[:, :, None] + W  # (B, S_prev, S)
        bp = jnp.argmax(cand, axis=1)  # (B, S) predecessor state
        alpha_new = jnp.max(cand, axis=1) + emit_t
        # freeze once past the true end of the utterance
        active = (t < frame_lengths)[:, None]
        alpha_out = jnp.where(active, alpha_new, alpha_prev)
        return alpha_out, bp.astype(jnp.int32)

    alpha0 = graph.start + emit[:, 0, :]
    alpha_T, backptrs = jax.lax.scan(
        step,
        alpha0,
        (jnp.moveaxis(emit[:, 1:, :], 1, 0), t_iota[1:]),
    )
    # backptrs: (T-1, B, S) int32 predecessor states

    final_scores = alpha_T + graph.final
    best_state_T = jnp.argmax(final_scores, axis=1).astype(jnp.int32)  # (B,)
    best_score = jnp.take_along_axis(final_scores, best_state_T[:, None], axis=1)[:, 0]

    # reverse scan: state[t-1] = backptr[t, state[t]]
    def back_step(state, inputs):
        bp_t, t = inputs  # (B, S) int32, scalar frame index (1..T-1)
        prev_state = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0]
        # frames at/after the end keep the final state
        active = t < frame_lengths
        prev_out = jnp.where(active, prev_state, state)
        return prev_out, state

    state_0, states_rev = jax.lax.scan(
        back_step,
        best_state_T,
        (backptrs[::-1], t_iota[1:][::-1]),
    )
    # states_rev[i] = state at frame T-1-i; final carry = state at frame 0
    states = jnp.concatenate(
        [state_0[:, None], jnp.moveaxis(states_rev[::-1], 0, 1)], axis=1
    )  # (B, T)
    return states, best_score


def extract_frame_labels_host(graph_arrays: dict, state_path: np.ndarray):
    """Host-side (numpy) mapping of a state path to per-frame labels.

    ``graph_arrays`` is the dict from
    :func:`~montreal_forced_aligner_tpu.graph.compiler.batch_graphs`. Device
    gathers are avoided on purpose (slow on TPU); the path is tiny.
    """
    b = np.arange(state_path.shape[0])[:, None]
    return (
        graph_arrays["state_phone"][b, state_path],
        graph_arrays["state_word"][b, state_path],
        graph_arrays["state_instance"][b, state_path],
        graph_arrays["state_tstate"][b, state_path],
    )


def frame_tids_host(
    graph_arrays: dict, state_path: np.ndarray, frame_lengths: np.ndarray
) -> np.ndarray:
    """Per-frame transition-ids (Kaldi convention: frame t consumes the arc
    leaving state_path[t]) recovered on host from the sparse arc lists."""
    in_src = graph_arrays["in_src"]  # (B, S, K)
    in_tid = graph_arrays["in_tid"]
    final_tid = graph_arrays["final_tid"]
    B, T = state_path.shape
    out = np.zeros((B, T), dtype=np.int32)
    for b in range(B):
        L = int(frame_lengths[b])
        if L <= 0:
            continue
        cur = state_path[b, 1:L]  # states at frames 1..L-1
        prev = state_path[b, : L - 1]
        # find the matching incoming arc for each (prev -> cur) transition
        srcs = in_src[b, cur]  # (L-1, K)
        match = srcs == prev[:, None]
        k = np.argmax(match, axis=1)
        out[b, : L - 1] = in_tid[b, cur, k]
        out[b, L - 1] = final_tid[b, state_path[b, L - 1]]
    return out


# ---------------------------------------------------------------------------
# Band-sparse Viterbi
# ---------------------------------------------------------------------------
# Alignment-graph arcs have small state offsets (self-loops 0, forward 1-3,
# silence skips and pronunciation-variant joins up to a few dozen; measured
# |d| <= 16 on real graphs). Storing transitions as a (B, S, D) band over
# offsets d in [-LB, UB] turns the O(S^2) dense max-plus step into O(S*D) —
# ~20x less VPU work. Graphs whose offsets exceed the band fall back to the
# dense kernel.

# measured on real alignment graphs: offsets concentrate in [-2, 12] (self
# loops + in-phone chains dominate; the tail is silence-branch junctions), so
# the low buckets are fine-grained — D directly scales the per-frame VPU work
BAND_BUCKETS = [
    (1, 4),
    (2, 8),
    (2, 12),
    (4, 16),
    (8, 32),
    (16, 64),
    (16, 128),
]


def band_limits_for(graphs_offsets_min: int, graphs_offsets_max: int):
    """Smallest band bucket covering [min_offset, max_offset], else None."""
    for lb, ub in BAND_BUCKETS:
        if -lb <= graphs_offsets_min and graphs_offsets_max <= ub:
            return lb, ub
    return None


@partial(jax.jit, static_argnames=("acoustic_scale", "lb", "ub", "use_pallas"))
def viterbi_align_batch_band(
    emit: jnp.ndarray,  # (B, T, S)
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (B, S, D) weights; column j = offset j - lb
    start: jnp.ndarray,  # (B, S)
    final: jnp.ndarray,  # (B, S)
    lb: int,
    ub: int,
    acoustic_scale: float = 0.1,
    use_pallas: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Band-sparse exact Viterbi; same semantics as viterbi_align_batch.

    The forward recursion runs as a Pallas kernel on TPU (sequential grid
    over frames, alpha carried in VMEM scratch — see ``ops/pallas_viterbi``)
    and as a ``lax.scan`` whose step is a running maximum over D shifted
    views of alpha elsewhere (identical tie-breaking either way)."""
    B, T, S = emit.shape
    D = lb + ub + 1
    t_iota = jnp.arange(T)

    from montreal_forced_aligner_tpu.ops.pallas_viterbi import (
        band_backtrace_pallas,
        band_forward_pallas,
        band_pallas_eligible,
    )

    if use_pallas and jax.default_backend() == "tpu" and band_pallas_eligible(B, S, D, T):
        # forward and backtrace both run as sequential-grid kernels; the
        # scan backtrace pays ~3 us of dispatch per frame, the kernel ~none
        alpha_T, bp_full = band_forward_pallas(
            emit, frame_lengths, band, start, lb, ub, acoustic_scale,
            full_bp=True,
        )
        final_scores = alpha_T + final
        best_state_T = jnp.argmax(final_scores, axis=1).astype(jnp.int32)
        best_score = jnp.take_along_axis(
            final_scores, best_state_T[:, None], axis=1
        )[:, 0]
        states = band_backtrace_pallas(
            bp_full, frame_lengths, best_state_T, lb, T
        )
        return states, best_score
    else:
        emit = acoustic_scale * emit
        band_cols = [band[:, :, j] for j in range(D)]

        def step(alpha_prev, inputs):
            emit_t, t = inputs
            ap = jnp.pad(
                alpha_prev, ((0, 0), (ub, lb)), constant_values=NEG_INF
            )  # alpha[s - d] = ap[s - d + ub]
            m = jnp.full_like(alpha_prev, NEG_INF)
            bp = jnp.zeros(alpha_prev.shape, jnp.uint8)
            for j in range(D):
                d = j - lb
                c = ap[:, ub - d : ub - d + S] + band_cols[j]
                take = c > m
                m = jnp.where(take, c, m)
                bp = jnp.where(take, jnp.uint8(j), bp)
            alpha_new = m + emit_t
            active = (t < frame_lengths)[:, None]
            alpha_out = jnp.where(active, alpha_new, alpha_prev)
            return alpha_out, bp

        alpha0 = start + emit[:, 0, :]
        alpha_T, backptrs = jax.lax.scan(
            step, alpha0, (jnp.moveaxis(emit[:, 1:, :], 1, 0), t_iota[1:])
        )
    final_scores = alpha_T + final
    best_state_T = jnp.argmax(final_scores, axis=1).astype(jnp.int32)
    best_score = jnp.take_along_axis(final_scores, best_state_T[:, None], axis=1)[:, 0]

    def back_step(state, inputs):
        bp_t, t = inputs
        j = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0].astype(jnp.int32)
        prev_state = state - (j - lb)
        active = t < frame_lengths
        prev_out = jnp.where(active, prev_state, state)
        return prev_out, state

    state_0, states_rev = jax.lax.scan(
        back_step, best_state_T, (backptrs[::-1], t_iota[1:][::-1])
    )
    states = jnp.concatenate(
        [state_0[:, None], jnp.moveaxis(states_rev[::-1], 0, 1)], axis=1
    )
    return states, best_score


def band_limits_from_arcs(garrs: dict):
    """Host-side band-eligibility check: smallest (lb, ub) bucket covering
    every real arc's state offset, or None. Cheap (vectorized min/max) — the
    band itself is densified on device by :func:`densify_band`, so the dense
    (B, S, D) band never crosses the host->device link."""
    in_src = garrs["in_src"]
    in_weight = garrs["in_weight"]
    _B, S, _K = in_src.shape
    d = np.arange(S)[None, :, None] - in_src  # (B, S, K)
    real = in_weight > NEG_INF / 2
    if not real.any():
        return None
    return band_limits_for(int(d[real].min()), int(d[real].max()))


def densify_band(graph: BatchedGraph, lb: int, ub: int) -> jnp.ndarray:
    """(B, S, D) band weights from the sparse incoming-arc lists, on device
    (max over parallel arcs; trace-safe, call inside jit). Callers must have
    validated the bucket with :func:`band_limits_from_arcs`: offsets of real
    arcs are assumed in [-lb, ub]; padding arcs (NEG_INF weight) may fall
    anywhere — their clipped slot is a no-op for the running max."""
    B, S, K = graph.in_src.shape
    D = lb + ub + 1
    d = jnp.arange(S, dtype=jnp.int32)[None, :, None] - graph.in_src
    j = jnp.clip(d + lb, 0, D - 1)
    band = jnp.full((B, S, D), NEG_INF, dtype=jnp.float32)
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, S, K))
    s_idx = jnp.broadcast_to(jnp.arange(S)[None, :, None], (B, S, K))
    return band.at[b_idx, s_idx, j].max(graph.in_weight)


def band_from_arcs(garrs: dict):
    """Host (numpy) band weights, or None if any arc falls outside the
    largest band bucket. Returns (band (B,S,D), lb, ub). Eligibility is
    delegated to :func:`band_limits_from_arcs` (single source of truth with
    the device path)."""
    limits = band_limits_from_arcs(garrs)
    if limits is None:
        return None
    lb, ub = limits
    in_src = garrs["in_src"]
    in_weight = garrs["in_weight"]
    B, S, K = in_src.shape
    d = np.arange(S)[None, :, None] - in_src  # (B, S, K)
    real = in_weight > NEG_INF / 2
    D = lb + ub + 1
    band = np.full((B, S, D), NEG_INF, dtype=np.float32)
    j = np.clip(d + lb, 0, D - 1)
    b_idx, s_idx, _ = np.indices(in_src.shape)
    np.maximum.at(band, (b_idx[real], s_idx[real], j[real]), in_weight[real])
    return band, lb, ub


# ---------------------------------------------------------------------------
# K-best Viterbi (N-best "lattice" decoding)
# ---------------------------------------------------------------------------
# The reference emits word lattices from LatticeFasterDecoder, determinizes
# them over word labels, and rescores with a larger LM
# (``transcription/multiprocessing.py`` LatGen + ``kalpy.lm.rescore``). The
# TPU-native equivalent is the K-best (tropical k-best semiring)
# generalization of the dense max-plus scan: alpha carries the top-K
# partial-path scores per state, each step merges incoming arcs' candidate
# lists with a single top_k, and the host backtrace yields K rank-ordered
# state paths. Passing per-arc word events additionally carries a rolling
# hash of the emitted word sequence per (state, rank) and drops same-hash
# candidates at every merge — the dense analogue of lattice determinization,
# so the K ranks hold K *distinct word sequences* rather than timing
# variants of the best one.

# numpy scalar (not jnp): a module-level jnp constant would initialize the
# XLA backend at import time, breaking jax.distributed.initialize() for
# multi-host launches that import this package first
HASH_MULT = np.uint32(1000003)


def dedup_topk(scores: jnp.ndarray, hashes: jnp.ndarray, K: int):
    """Exact top-K-distinct-hashes along the last axis.

    Groups of K candidates are merged pairwise with a FULL 2K-pool dedup
    per merge, which is exact: the global top-K distinct hashes of a union
    equal the top-K distinct of (top-K distinct of each side) — unlike a
    single truncated top-M pool over all candidates, which can drop a
    distinct sequence hidden behind >M-1 better-scoring duplicates.

    Returns ``(vals, hsel, idx)``; ``idx`` indexes the input last axis.
    Inputs are padded to a multiple of K with NEG_INF/hash-0 entries (pad
    entries can only displace other pads; a real hash-0 candidate always
    outranks them).
    """
    C = scores.shape[-1]
    if C <= K:
        # single group: one dedup pass over the (padded) K candidates
        pad = [(0, 0)] * (scores.ndim - 1) + [(0, 2 * K - C)]
        scores = jnp.pad(scores, pad, constant_values=NEG_INF)
        hashes = jnp.pad(hashes, pad, constant_values=0)
        C = 2 * K
    rem = (-C) % K
    if rem:
        pad = [(0, 0)] * (scores.ndim - 1) + [(0, rem)]
        scores = jnp.pad(scores, pad, constant_values=NEG_INF)
        hashes = jnp.pad(hashes, pad, constant_values=0)
        C += rem
    lead = scores.shape[:-1]
    G = C // K
    vals = scores.reshape(*lead, G, K)
    hs = hashes.reshape(*lead, G, K)
    idx = jnp.broadcast_to(
        jnp.arange(C, dtype=jnp.int32).reshape(G, K), vals.shape
    )
    earlier2 = jnp.tril(jnp.ones((2 * K, 2 * K), bool), k=-1)
    while G > 1:
        H = G // 2
        a_v, b_v = vals[..., :H, :], vals[..., H : 2 * H, :]
        a_h, b_h = hs[..., :H, :], hs[..., H : 2 * H, :]
        a_i, b_i = idx[..., :H, :], idx[..., H : 2 * H, :]
        m_v = jnp.concatenate([a_v, b_v], axis=-1)  # (..., H, 2K)
        m_h = jnp.concatenate([a_h, b_h], axis=-1)
        m_i = jnp.concatenate([a_i, b_i], axis=-1)
        sv, order = jax.lax.top_k(m_v, 2 * K)
        sh = jnp.take_along_axis(m_h, order, axis=-1)
        si = jnp.take_along_axis(m_i, order, axis=-1)
        dup = jnp.any(
            (sh[..., :, None] == sh[..., None, :]) & earlier2, axis=-1
        )
        sv = jnp.where(dup, NEG_INF, sv)
        kv, sel = jax.lax.top_k(sv, K)
        kh = jnp.take_along_axis(sh, sel, axis=-1)
        ki = jnp.take_along_axis(si, sel, axis=-1)
        if G % 2:  # carry the odd group through to the next round
            kv = jnp.concatenate([kv, vals[..., -1:, :]], axis=-2)
            kh = jnp.concatenate([kh, hs[..., -1:, :]], axis=-2)
            ki = jnp.concatenate([ki, idx[..., -1:, :]], axis=-2)
        vals, hs, idx = kv, kh, ki
        G = kv.shape[-2]
    return vals[..., 0, :], hs[..., 0, :], idx[..., 0, :]


@partial(jax.jit, static_argnames=("acoustic_scale", "K"))
def viterbi_nbest_device(
    emit: jnp.ndarray,  # (B, T, S)
    frame_lengths: jnp.ndarray,  # (B,)
    graph: BatchedGraph,
    acoustic_scale: float = 0.1,
    K: int = 8,
    word_event: Optional[jnp.ndarray] = None,  # (B, S, Kin) int32, 0 = none
    state0_hash: Optional[jnp.ndarray] = None,  # (B, S) uint32
):
    """Device half of K-best Viterbi.

    Returns ``(final_scores (B, S, K), backptrs (T-1, B, S, K) int32)``;
    backptr values encode ``arc_slot * K + predecessor_rank`` into the
    incoming-arc list of the destination state. Use
    :func:`nbest_backtrace_host` to materialize paths. With
    ``word_event``/``state0_hash`` (see :func:`nbest_word_events`), ranks are
    deduplicated by word-sequence hash (determinized N-best).
    """
    B, T, S = emit.shape
    Kin = graph.in_src.shape[2]
    emit = acoustic_scale * emit
    t_iota = jnp.arange(T)
    src_flat = graph.in_src.reshape(B, S * Kin)  # (B, S*Kin)
    w = graph.in_weight[:, :, :, None]  # (B, S, Kin, 1)
    dedup = word_event is not None
    C = Kin * K

    def gather_prev(x):
        return jnp.take_along_axis(
            x, src_flat[:, :, None], axis=1
        ).reshape(B, S, Kin, K)

    def step(carry, inputs):
        emit_t, t = inputs  # (B, S), scalar
        alpha_prev, hash_prev = carry
        ap = gather_prev(alpha_prev)
        cand = (ap + w).reshape(B, S, C)
        if not dedup:
            vals, idx = jax.lax.top_k(cand, K)
        else:
            hp = gather_prev(hash_prev)
            ev = word_event[:, :, :, None].astype(jnp.uint32)
            ch = jnp.where(ev > 0, hp * HASH_MULT + ev, hp).reshape(B, S, C)
            vals, hash_new, idx = dedup_topk(cand, ch, K)
        alpha_new = vals + emit_t[:, :, None]
        active = (t < frame_lengths)[:, None, None]
        alpha_out = jnp.where(active, alpha_new, alpha_prev)
        if dedup:
            hash_out = jnp.where(active, hash_new, hash_prev)
        else:
            hash_out = hash_prev
        return (alpha_out, hash_out), idx.astype(jnp.int32)

    alpha0 = jnp.concatenate(
        [
            (graph.start + emit[:, 0, :])[:, :, None],
            jnp.full((B, S, K - 1), NEG_INF, dtype=jnp.float32),
        ],
        axis=2,
    )
    if state0_hash is None:
        hash0 = jnp.zeros((B, S, K), dtype=jnp.uint32)
    else:
        hash0 = jnp.broadcast_to(state0_hash[:, :, None], (B, S, K)).astype(
            jnp.uint32
        )
    (alpha_T, _hash_T), backptrs = jax.lax.scan(
        step,
        (alpha0, hash0),
        (jnp.moveaxis(emit[:, 1:, :], 1, 0), t_iota[1:]),
    )
    return alpha_T + graph.final[:, :, None], backptrs


def nbest_word_events(garrs: dict):
    """Per-arc word-emission events for determinized N-best decoding.

    When the graph carries explicit arc events (``in_event``, set by the
    decoding-graph builder on every word-entry arc) those are authoritative —
    they correctly fire on a consecutive repeat of the same word with no
    intervening silence, which re-enters the *same* instance and is invisible
    to instance-crossing inference. Otherwise an arc emits its destination's
    word when it crosses into a new word instance; silence/epsilon instances
    (word < 0) emit nothing. Returns ``(word_event (B, S, Kin) int32 — word
    index + 1 or 0, state0_hash (B, S) uint32 — hash after the word begun at
    frame 0)``.
    """
    in_src = garrs["in_src"]
    word = garrs["state_word"]
    if "in_event" in garrs:
        event = np.where(
            garrs["in_event"] >= 0, garrs["in_event"] + 1, 0
        ).astype(np.int32)
    else:
        inst = garrs["state_instance"]
        b = np.arange(in_src.shape[0])[:, None, None]
        src_inst = inst[b, in_src]  # (B, S, Kin)
        crosses = src_inst != inst[:, :, None]
        event = np.where(
            crosses & (word[:, :, None] >= 0), word[:, :, None] + 1, 0
        ).astype(np.int32)
    state0_hash = np.where(word >= 0, word + 1, 0).astype(np.uint32)
    return event, state0_hash


def nbest_backtrace_host(
    garrs: dict,
    final_scores: np.ndarray,  # (B, S, K)
    backptrs: np.ndarray,  # (T-1, B, S, K) int32
    frame_lengths: np.ndarray,
    K: int,
):
    """Host backtrace of the K-best scan: (paths (B, K, T) int32,
    scores (B, K), events (B, K, T) int32). Ranks beyond the number of
    finite-score paths carry NEG_INF scores and copies of the best path.
    ``events[t]`` is the word begun by the arc taken into frame t (-1 =
    none), from the graph's arc events when present (else inferred from
    instance crossings by the caller)."""
    in_src = garrs["in_src"]
    in_event = garrs.get("in_event")
    T = backptrs.shape[0] + 1
    B, S, _ = final_scores.shape
    paths = np.zeros((B, K, T), dtype=np.int32)
    scores = np.full((B, K), NEG_INF, dtype=np.float32)
    events = np.full((B, K, T), -1, dtype=np.int32)
    state_word = garrs["state_word"]
    for b in range(B):
        L = int(frame_lengths[b])
        flat = final_scores[b].reshape(-1)  # (S*K,)
        order = np.argsort(-flat)[:K]
        for rank, p in enumerate(order):
            s, r = int(p) // K, int(p) % K
            sc = flat[p]
            if sc <= NEG_INF / 2 and rank > 0:
                paths[b, rank] = paths[b, 0]
                events[b, rank] = events[b, 0]
                continue
            scores[b, rank] = sc
            paths[b, rank, L - 1 :] = s
            for t in range(L - 1, 0, -1):
                idx = int(backptrs[t - 1, b, s, r])
                j, r = idx // K, idx % K
                if in_event is not None:
                    events[b, rank, t] = in_event[b, s, j]
                s = int(in_src[b, s, j])
                paths[b, rank, t - 1] = s
            # the word (if any) begun at frame 0
            w0 = int(state_word[b, paths[b, rank, 0]])
            events[b, rank, 0] = w0
        if L < T:
            paths[b, :, L:] = paths[b, :, L - 1 : L]
    return paths, scores, events
