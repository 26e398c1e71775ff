"""Pallas TPU kernel: graph-state GMM emission log-likelihoods.

For large models the XLA paths don't scale: a one-hot selection matmul costs
T*P*S MACs (P = #pdfs can be thousands) and XLA gathers of per-state GMM
parameters don't vectorize on TPU. This kernel implements "likelihood on
demand" the TPU-native way (reference counterpart: the per-frame likelihood
evaluation inside ``gmm-align-compiled``):

* grid over (batch, state-tiles of 128); per-state pdf ids arrive via scalar
  prefetch (``PrefetchScalarGridSpec``),
* each tile DMAs exactly the needed per-pdf parameter blocks from HBM into
  VMEM scratch (async copies, overlapped),
* gconsts are folded into an augmented quadratic-feature matmul
  (``[x; x^2; 1; 0] @ [miv; -0.5 iv; gconst; 0]^T``) so each Gaussian is one
  aligned (T, 128) MXU tile, and
* a streaming logsumexp over Gaussians produces ``emit[t, s]``.

HBM traffic is B*S*G*(2D+2) parameter bytes per batch (DMA bandwidth)
instead of T*P*S matmul work.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _emission_kernel(
    pdf_ref,  # scalar prefetch: (B * S_padded,) int32 pdf per state
    xx_ref,  # (1, T_TILE, D2p) VMEM: this frame tile's [x; x^2; 1; 0]
    W_hbm,  # (P, G, D2p) HBM: per-pdf params (gconst folded in)
    out_ref,  # (1, T_TILE, S_TILE) VMEM
    params_vmem,  # scratch (S_TILE, G, D2p)
    sem,  # DMA semaphores (S_TILE,)
    *,
    S_TILE: int,
    G: int,
    S_padded: int,
):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    base = b * S_padded + tile * S_TILE

    # frame tiles iterate fastest (innermost grid dim): the per-state GMM
    # parameters are DMA'd once per (batch, state-tile) and reused for
    # every frame tile, keeping both VMEM blocks and HBM traffic bounded
    # for long utterances (T in the thousands)
    @pl.when(pl.program_id(2) == 0)
    def _fetch():
        def issue(i, _):
            pltpu.make_async_copy(
                W_hbm.at[pdf_ref[base + i]], params_vmem.at[i], sem.at[i]
            ).start()
            return 0

        jax.lax.fori_loop(0, S_TILE, issue, 0)

        def drain(i, _):
            pltpu.make_async_copy(
                W_hbm.at[pdf_ref[base + i]], params_vmem.at[i], sem.at[i]
            ).wait()
            return 0

        jax.lax.fori_loop(0, S_TILE, drain, 0)

    xx = xx_ref[0]  # (T_TILE, D2p)
    T = xx.shape[0]
    m = jnp.full((T, S_TILE), NEG_INF, dtype=jnp.float32)
    ssum = jnp.zeros((T, S_TILE), dtype=jnp.float32)
    for g in range(G):
        w_g = params_vmem[:, g, :]  # (S_TILE, D2p)
        q = jax.lax.dot_general(
            xx,
            w_g,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (T_TILE, S_TILE); includes the gconst term
        m_new = jnp.maximum(m, q)
        ssum = ssum * jnp.exp(m - m_new) + jnp.exp(q - m_new)
        m = m_new
    out_ref[0] = m + jnp.log(ssum)


MAX_T_TILE = 512  # frames per VMEM block (bounds blocks for long audio)


@functools.partial(jax.jit, static_argnames=("S_TILE",))
def pallas_state_loglikes(
    feats: jnp.ndarray,  # (B, T, D)
    state_pdf: jnp.ndarray,  # (B, S) int32 (padding states may be 0)
    W_rows: jnp.ndarray,  # (P, G, D2p) float32 from pack_gmm_for_pallas
    S_TILE: int = 128,
) -> jnp.ndarray:
    """emit (B, T, S): per-graph-state emission log-likelihoods."""
    B, T, D = feats.shape
    S = state_pdf.shape[1]
    P, G, D2p = W_rows.shape
    S_padded = ((S + S_TILE - 1) // S_TILE) * S_TILE
    if S_padded != S:
        state_pdf = jnp.pad(state_pdf, ((0, 0), (0, S_padded - S)))
    # balanced frame tiles: ceil-divide T into the fewest MAX_T_TILE-bound
    # tiles, then round the tile to 8. A fixed min(512, T) tile pads T=600
    # to 1024 (41% wasted matmul work); balancing pads it to 608.
    n_tiles = -(-T // MAX_T_TILE)
    T_TILE = ((-(-T // n_tiles) + 7) // 8) * 8
    T_pad = (-T) % T_TILE
    if T_pad:
        feats = jnp.pad(feats, ((0, 0), (0, T_pad), (0, 0)))
    Tp = T + T_pad
    ones = jnp.ones((B, Tp, 1), feats.dtype)
    zeros = jnp.zeros((B, Tp, D2p - 2 * D - 1), feats.dtype)
    xx = jnp.concatenate([feats, feats * feats, ones, zeros], axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, S_padded // S_TILE, Tp // T_TILE),
        in_specs=[
            pl.BlockSpec(
                (1, T_TILE, D2p),
                lambda b, s, t, pdf: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.HBM),  # W stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, T_TILE, S_TILE),
            lambda b, s, t, pdf: (b, t, s),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((S_TILE, G, D2p), jnp.float32),
            pltpu.SemaphoreType.DMA((S_TILE,)),
        ],
    )
    kernel = functools.partial(
        _emission_kernel, S_TILE=S_TILE, G=G, S_padded=S_padded
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Tp, S_padded), jnp.float32),
        grid_spec=grid_spec,
    )(state_pdf.reshape(-1), xx, W_rows)
    return out[:, :T, :S]


def pack_rows(means_invvars, inv_vars, gconsts) -> np.ndarray:
    """(P, G, D2p) parameter rows: [miv, -0.5*iv, gconst, 0...] per Gaussian,
    padded to the TPU lane tiling (128) so per-pdf HBM slices are aligned;
    padded Gaussians carry gconst = NEG_INF so they vanish in logsumexp."""
    P, G, D = means_invvars.shape
    d2 = 2 * D + 2
    d2p = ((d2 + 127) // 128) * 128
    out = np.zeros((P, G, d2p), dtype=np.float32)
    out[:, :, :D] = means_invvars
    out[:, :, D : 2 * D] = -0.5 * inv_vars
    out[:, :, 2 * D] = np.maximum(gconsts, NEG_INF)
    return out


def pack_gmm_for_pallas(gmm) -> np.ndarray:
    return pack_rows(gmm.means_invvars, gmm.inv_vars, gmm.gconsts)
