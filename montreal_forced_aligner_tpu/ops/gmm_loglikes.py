"""Batched diagonal-GMM log-likelihood evaluation.

Replaces the reference's per-frame C++ likelihood loop inside
``gmm-align-compiled`` (call site ``alignment/multiprocessing.py:791-853``)
with one MXU matmul per batch:

    ll[pdf, g](x) = gconst[pdf, g] + m_iv[pdf, g] . x - 0.5 * iv[pdf, g] . x^2
                  = gconst + [x ; x^2] . W[:, pdf, g]

Two entry points:

* :func:`gmm_loglikes` — likelihoods for *all* pdfs (training stats, phone
  confidence): output (B, T, P).
* :func:`gmm_state_loglikes` — likelihoods only for each utterance's graph
  states (forced alignment): params are gathered per graph state so the
  matmul is (T, 2D) x (2D, S*G), much smaller than all-pdf evaluation when
  the model has thousands of pdfs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1.0e30


@jax.jit
def gmm_loglikes(
    feats: jnp.ndarray,  # (B, T, D)
    W: jnp.ndarray,  # (2D, P*G) from DiagGmmSet.flatten_for_device
    gconsts: jnp.ndarray,  # (P, G) with -inf padding
) -> jnp.ndarray:
    """Log-likelihood of every pdf for every frame: (B, T, P)."""
    P, G = gconsts.shape
    xx = jnp.concatenate([feats, feats * feats], axis=-1)  # (B, T, 2D)
    quad = jnp.einsum(
        "btd,dk->btk",
        xx,
        W,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    quad = quad.reshape(*quad.shape[:-1], P, G) + gconsts
    return jax.scipy.special.logsumexp(quad, axis=-1)


@jax.jit
def gmm_state_loglikes(
    feats: jnp.ndarray,  # (B, T, D)
    state_miv: jnp.ndarray,  # (B, S, G, D) means*invvars gathered per graph state
    state_iv: jnp.ndarray,  # (B, S, G, D) invvars
    state_gconst: jnp.ndarray,  # (B, S, G) with -inf padding
) -> jnp.ndarray:
    """Per-graph-state emission log-likelihoods: (B, T, S)."""
    xx = jnp.concatenate([feats, feats * feats], axis=-1)  # (B, T, 2D)
    Wg = jnp.concatenate([state_miv, -0.5 * state_iv], axis=-1)  # (B, S, G, 2D)
    B, S, G, D2 = Wg.shape
    quad = jnp.einsum(
        "btd,bkd->btk",
        xx,
        Wg.reshape(B, S * G, D2),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(B, -1, S, G)
    quad = quad + state_gconst[:, None, :, :]
    return jax.scipy.special.logsumexp(quad, axis=-1)


def gather_state_params(gmm_weights_arrays, state_pdf: jnp.ndarray):
    """Gather per-state GMM parameters for :func:`gmm_state_loglikes`.

    gmm_weights_arrays: (means_invvars (P,G,D), inv_vars (P,G,D), gconsts (P,G))
    state_pdf: (B, S) int32 pdf-id per graph state (padding states may use 0).
    """
    miv, iv, gconst = gmm_weights_arrays
    return miv[state_pdf], iv[state_pdf], gconst[state_pdf]


def select_state_emissions(ll, state_pdf):
    """Exact graph-state emission selection
    ``emit[..., t, s] = ll[..., t, state_pdf[..., s]]``.

    On TPU this is expressed as a one-hot matmul — XLA:TPU
    strength-reduces it to a gather and it measures slightly faster than
    ``jnp.take`` on the MXU (bit-exact: each row sums ``1.0*x`` with
    zeros). On other backends the one-hot is actually multiplied —
    O(B·T·S·P) flops, minutes at decode-graph sizes — so an explicit
    gather is used instead.

    ``ll``: (..., T, P); ``state_pdf``: (S,) shared or (B, S) per row.
    Returns (..., T, S).
    """
    import jax

    P = ll.shape[-1]
    if jax.default_backend() == "tpu":
        onehot = jax.nn.one_hot(state_pdf, P, dtype=ll.dtype)
        eq = "btp,bsp->bts" if state_pdf.ndim == 2 else (
            "btp,sp->bts" if ll.ndim == 3 else "tp,sp->ts"
        )
        return jnp.einsum(
            eq, ll, onehot,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if state_pdf.ndim == 2:  # (B, S) per-row graphs
        B, T, _ = ll.shape
        S = state_pdf.shape[1]
        return jnp.take_along_axis(
            ll, jnp.broadcast_to(state_pdf[:, None, :], (B, T, S)), axis=2
        )
    return jnp.take(ll, state_pdf, axis=-1)
