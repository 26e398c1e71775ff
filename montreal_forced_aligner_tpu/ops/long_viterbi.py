"""Exact Viterbi for very long utterances via checkpointed chunks.

The batched kernels in :mod:`.viterbi` store backpointers for every frame —
O(T*S) memory — and the emission matrix is O(T*S) too; an hour of audio
(360k frames) against a few thousand graph states does not fit HBM. The
reference sidesteps this by segmenting long files before alignment
(``vad/segmenter.py``); this module instead makes single-utterance alignment
*exact* at any length with the classic checkpoint/recompute scheme
(the Viterbi analogue of gradient rematerialization, which is also how a
TPU-native design wants it — `jax.checkpoint` trades FLOPs for HBM):

1. forward sweep over fixed-size chunks keeping ONLY the alpha vector at
   each chunk boundary (C+1 vectors of S floats; no backpointers),
2. backward sweep re-running each chunk from its checkpoint, now storing
   that chunk's backpointers, and backtracing through it.

Compute is exactly 2x the emissions + forward work; memory is O(chunk*S).
Emissions are computed per chunk inside both sweeps, so the full (T, S)
emission matrix never materializes either.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.ops.gmm_loglikes import gmm_loglikes
from montreal_forced_aligner_tpu.ops.viterbi import NEG_INF


@partial(jax.jit, static_argnames=("acoustic_scale",))
def _chunk_emit(feats, state_pdf, W, gconsts, acoustic_scale: float):
    """(T_c, S) scaled emission log-likes for one chunk (B=1 internally)."""
    from montreal_forced_aligner_tpu.ops.gmm_loglikes import (
        select_state_emissions,
    )

    ll = gmm_loglikes(feats[None], W, gconsts)[0]  # (T_c, P)
    return acoustic_scale * select_state_emissions(ll, state_pdf)


@jax.jit
def _chunk_forward(alpha, emit, Wt, mask):
    """Run the max-plus recursion over one chunk; returns final alpha only.

    ``mask`` (T_c,) bool marks real (non-padded) frames; padded frames leave
    alpha untouched so any chunk length works with a fixed chunk size.
    """

    def step(a, inputs):
        e_t, m = inputs
        a_new = jnp.max(a[:, None] + Wt, axis=0) + e_t
        return jnp.where(m, a_new, a), None

    alpha_out, _ = jax.lax.scan(step, alpha, (emit, mask))
    return alpha_out


@jax.jit
def _chunk_forward_bp(alpha, emit, Wt, mask):
    """Same recursion but also records backpointers (T_c, S) int32."""

    def step(a, inputs):
        e_t, m = inputs
        cand = a[:, None] + Wt
        bp = jnp.argmax(cand, axis=0).astype(jnp.int32)
        a_new = jnp.max(cand, axis=0) + e_t
        return jnp.where(m, a_new, a), bp

    alpha_out, bps = jax.lax.scan(step, alpha, (emit, mask))
    return alpha_out, bps


def viterbi_align_long(
    feats: np.ndarray,  # (T, D) final features, host or device
    garrs_single: dict,  # batch_graphs([graph]) arrays (B=1)
    W: jnp.ndarray,
    gconsts: jnp.ndarray,
    acoustic_scale: float = 0.1,
    chunk: int = 4096,
) -> Tuple[np.ndarray, float]:
    """Exact (state_path (T,), score) for one long utterance.

    Matches ``viterbi_align_batch`` output on the same graph (up to float
    associativity in the emission matmuls);
    cite: reference ``gmm-align-compiled`` semantics, long files handled via
    segmentation in ``vad/segmenter.py:575``.
    """
    T = feats.shape[0]
    in_src = garrs_single["in_src"][0]
    in_weight = garrs_single["in_weight"][0]
    S = in_src.shape[0]
    # dense (S_prev, S) max-plus matrix once on host
    Wd = np.full((S, S), NEG_INF, dtype=np.float32)
    dst = np.arange(S)[:, None]
    np.maximum.at(
        Wd, (in_src.reshape(-1), np.broadcast_to(dst, in_src.shape).reshape(-1)),
        in_weight.reshape(-1),
    )
    Wt = jnp.asarray(Wd)
    state_pdf = jnp.asarray(garrs_single["state_pdf"][0])
    start = jnp.asarray(garrs_single["start"][0])
    final = garrs_single["final"][0]

    feats = np.asarray(feats)
    n_chunks = (T + chunk - 1) // chunk

    def chunk_arrays(c):
        lo = c * chunk
        hi = min(T, lo + chunk)
        f = feats[lo:hi]
        pad = chunk - (hi - lo)
        if pad:
            f = np.pad(f, ((0, pad), (0, 0)))
        mask = (np.arange(chunk) < (hi - lo))
        return jnp.asarray(f), jnp.asarray(mask), lo, hi

    # forward sweep: keep only boundary alphas. Frame 0 is folded into the
    # chunk-0 checkpoint (alpha0 = start + emit[0]) and masked out of the
    # scan, so the recursion applies no transition into frame 0.
    checkpoints = []
    alpha = None
    for c in range(n_chunks):
        f, mask, lo, hi = chunk_arrays(c)
        emit = _chunk_emit(f, state_pdf, W, gconsts, acoustic_scale)
        if c == 0:
            alpha = start + emit[0]
            mask = mask.at[0].set(False)
        checkpoints.append(alpha)
        alpha = _chunk_forward(alpha, emit, Wt, mask)
    final_scores = np.asarray(alpha) + final
    end_state = int(np.argmax(final_scores))
    score = float(final_scores[end_state])

    # backward sweep: recompute each chunk with backpointers and backtrace.
    # bps[j] is the argmax predecessor for the transition frame lo+j-1 ->
    # lo+j; the j=0 row carries the cross-chunk transition.
    path = np.zeros(T, dtype=np.int32)
    s = end_state
    for c in range(n_chunks - 1, -1, -1):
        f, mask, lo, hi = chunk_arrays(c)
        emit = _chunk_emit(f, state_pdf, W, gconsts, acoustic_scale)
        if c == 0:
            mask = mask.at[0].set(False)
        _a, bps = _chunk_forward_bp(checkpoints[c], emit, Wt, mask)
        bps = np.asarray(bps)
        path[hi - 1] = s
        for t in range(hi - 1, lo, -1):
            s = int(bps[t - lo, s])
            path[t - 1] = s
        if c > 0:
            s = int(bps[0, s])  # transition (lo-1) -> lo
    return path, score
