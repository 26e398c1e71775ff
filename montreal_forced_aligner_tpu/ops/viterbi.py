"""Batched dense Viterbi forced alignment.

This is the framework's central kernel, replacing the reference's
single-threaded beam Viterbi in C++ (``gmm-align-compiled``; call sites
``alignment/mixins.py:68-95``, ``alignment/multiprocessing.py:791-853``).
Forced-alignment graphs are small (a few hundred states), so instead of beam
pruning we run an exact dense DP over all graph states for a whole batch of
utterances at once:

    alpha[0, s]  = start[s] + scale * emit[0, s]
    alpha[t, s]  = max_k ( alpha[t-1, src[s, k]] + w[s, k] ) + scale * emit[t, s]
    best         = argmax_s alpha[T-1, s] + final[s]

where each graph state has at most K incoming arcs (precomputed on the host,
padded with -inf). The recursion is a `lax.scan` over frames; each step is a
(B, S, K) gather + max on the VPU. Exactness means `beam`/`retry_beam`
semantics of the reference ("retry with a wider beam") are subsumed: nothing
is ever pruned.

Backpointers are stored as uint8 arc indices (K <= 255) to minimize HBM
traffic; the state path is reconstructed by a reverse scan on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1.0e30


class BatchedGraph(NamedTuple):
    """Device representation of a batch of alignment graphs (padded).

    All arrays are batched over utterances; S = max states, K = max incoming
    arcs per state.
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
    K = graph.in_src.shape[2]
    emit = acoustic_scale * emit

    t_iota = jnp.arange(T)

    def step(alpha_prev, inputs):
        emit_t, t = inputs  # (B, S), scalar
        # candidate scores from each incoming arc
        prev = jnp.take_along_axis(
            alpha_prev, graph.in_src.reshape(B, S * K), axis=1
        ).reshape(B, S, K)
        cand = prev + graph.in_weight  # (B, S, K)
        best_k = jnp.argmax(cand, axis=2)  # (B, S)
        alpha_new = jnp.take_along_axis(cand, best_k[:, :, None], axis=2)[:, :, 0]
        alpha_new = alpha_new + emit_t
        # freeze once past the true end of the utterance
        active = (t < frame_lengths)[:, None]
        alpha_out = jnp.where(active, alpha_new, alpha_prev)
        return alpha_out, best_k.astype(jnp.uint8)

    alpha0 = graph.start + emit[:, 0, :]
    alpha_T, backptrs = jax.lax.scan(
        step,
        alpha0,
        (jnp.moveaxis(emit[:, 1:, :], 1, 0), t_iota[1:]),
    )
    # backptrs: (T-1, B, S) uint8

    final_scores = alpha_T + graph.final
    best_state_T = jnp.argmax(final_scores, axis=1).astype(jnp.int32)  # (B,)
    best_score = jnp.take_along_axis(final_scores, best_state_T[:, None], axis=1)[:, 0]

    # reverse scan: state[t-1] = in_src[state[t], backptr[t, state[t]]]
    def back_step(state, inputs):
        bp_t, t = inputs  # (B, S) uint8, scalar frame index (1..T-1)
        k = jnp.take_along_axis(bp_t, state[:, None], axis=1)[:, 0].astype(jnp.int32)
        flat = state * K + k
        prev_state = jnp.take_along_axis(
            graph.in_src.reshape(B, S * K), flat[:, None], axis=1
        )[:, 0]
        # frames at/after the end keep the final state
        active = t < frame_lengths
        prev_out = jnp.where(active, prev_state, state)
        k_out = jnp.where(active, k, -1)
        return prev_out, (state, k_out)

    state_0, (states_rev, ks_rev) = jax.lax.scan(
        back_step,
        best_state_T,
        (backptrs[::-1], t_iota[1:][::-1]),
    )
    # states_rev[i] = state at frame T-1-i; final carry = state at frame 0
    states = jnp.concatenate(
        [state_0[:, None], jnp.moveaxis(states_rev[::-1], 0, 1)], axis=1
    )  # (B, T)
    # ks[t] = incoming-arc index used to reach states[t] (t >= 1); -1 padding
    ks = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), jnp.moveaxis(ks_rev[::-1], 0, 1)], axis=1
    )
    return states, best_score, ks


def extract_frame_labels(graph: BatchedGraph, state_path: jnp.ndarray):
    """Map a state path to per-frame (phone, word-index, instance, tstate)."""
    take = lambda arr: jnp.take_along_axis(arr, state_path, axis=1)
    return (
        take(graph.state_phone),
        take(graph.state_word),
        take(graph.state_instance),
        take(graph.state_tstate),
    )
