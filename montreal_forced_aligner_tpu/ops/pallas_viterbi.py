"""Pallas TPU kernel: band-sparse Viterbi forward scan.

The band-sparse max-plus recursion (``ops/viterbi.py:viterbi_align_batch_band``)
is the framework's hottest sequential program: T steps, each a running max
over D shifted views of alpha. This kernel runs the recursion with a
sequential grid over chunks of ``TC`` frames and ``alpha`` carried in VMEM
scratch: per-chunk DMA (emissions in, backpointers out) is pipelined by
Pallas, the D shifted adds read the scratch at static offsets (alpha lives
pre-padded, so no per-step pad copy), and grid/dispatch overhead is
amortized TC-fold (reference counterpart: the Viterbi loop inside
``gmm-align-compiled``, ``alignment/multiprocessing.py:791-853``).

Measured on the bench workload (B=32, S=704, D=21, T=1500, v5e): 1.1-1.2x
over the ``lax.scan`` lowering. The formulation is VPU-issue-bound — each
frame needs D shifted (B, S) add/max/select passes, ~2-6 k VPU instructions
at 8x128 elements each, so ~5-6 us/frame IS the speed of light for a dense
band; both lowerings sit near it, and further gains must come from shrinking
the work (smaller D buckets, packed states), not from scheduling.

Semantics are bit-identical to the XLA scan: same ascending-offset
tie-breaking (strictly-greater replacement), same per-utterance freezing
past ``frame_lengths``. The band arrives transposed as (D, B, S) so each
offset's weights are one properly lane-tiled (B, S) block (a (B, S, D)
layout would waste 6x VMEM padding D=21 lanes to 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30

# VMEM budget: band (D,B,S) + 2x double-buffered (TC,B,S) emit/bp blocks +
# alpha scratch; v5e has ~16 MB
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024
_TC = 8  # frames per grid step


def band_pallas_eligible(B: int, S: int, D: int, T: int) -> bool:
    resident = (D + 1) * B * S * 4 + 4 * _TC * B * S * (4 + 1)
    return T >= 2 and resident <= _VMEM_BUDGET_BYTES


def _band_forward_kernel(
    emit_ref,  # (TC, B, S) VMEM: this chunk's emissions
    band_ref,  # (D, B, S) VMEM: band weights, column j = offset j - lb
    start_ref,  # (B, S) VMEM
    flens_ref,  # (B, 1) int32 VMEM
    alpha_out_ref,  # out (B, S) VMEM: alpha at the final frame
    bp_ref,  # out (TC, B, S) uint8: backpointers per frame in chunk
    #         (offset-slot indices < D <= 145, so uint8 always fits and
    #          quarters the kernel's HBM store + backtrace read traffic)
    alpha_pad,  # scratch (B, ub + S + lb) float32, persists across steps
    *,
    lb: int,
    ub: int,
    S: int,
    TC: int,
    acoustic_scale: float,
):
    c = pl.program_id(0)
    num_chunks = pl.num_programs(0)
    D = lb + ub + 1
    B = start_ref.shape[0]
    flens = flens_ref[:]  # (B, 1)

    @pl.when(c == 0)
    def _():
        alpha_pad[:, :ub] = jnp.full((B, ub), NEG_INF, jnp.float32)
        alpha_pad[:, ub + S :] = jnp.full((B, lb), NEG_INF, jnp.float32)
        alpha_pad[:, ub : ub + S] = (
            start_ref[:] + acoustic_scale * emit_ref[0]
        )

    first = jnp.where(c == 0, 1, 0)

    def body(i, _):
        t = c * TC + i  # global frame index
        a = alpha_pad[:, ub : ub + S]
        m = jnp.full((B, S), NEG_INF, jnp.float32)
        bp = jnp.zeros((B, S), jnp.int32)
        for j in range(D):
            d = j - lb
            # alpha[s - d] = alpha_pad[:, s - d + ub]
            cnd = alpha_pad[:, ub - d : ub - d + S] + band_ref[j]
            take = cnd > m
            m = jnp.where(take, cnd, m)
            bp = jnp.where(take, j, bp)
        emit_t = emit_ref[pl.ds(i, 1)][0]
        alpha_new = m + acoustic_scale * emit_t
        out = jnp.where(flens > t, alpha_new, a)
        alpha_pad[:, ub : ub + S] = out
        bp_ref[pl.ds(i, 1)] = bp.astype(jnp.uint8)[None]
        return 0

    jax.lax.fori_loop(first, TC, body, 0)

    @pl.when(c == num_chunks - 1)
    def _():
        alpha_out_ref[:] = alpha_pad[:, ub : ub + S]


@functools.partial(
    jax.jit, static_argnames=("lb", "ub", "acoustic_scale", "full_bp")
)
def band_forward_pallas(
    emit: jnp.ndarray,  # (B, T, S) float32
    frame_lengths: jnp.ndarray,  # (B,) int32
    band: jnp.ndarray,  # (B, S, D) float32
    start: jnp.ndarray,  # (B, S) float32
    lb: int,
    ub: int,
    acoustic_scale: float = 0.1,
    full_bp: bool = False,
):
    """Forward pass only: returns (alpha_T (B, S), backptrs (T-1, B, S) int32
    where backptrs[t-1] holds the offset-slot argmax taken into frame t).
    The caller runs the (cheap) backward scan.

    With ``full_bp=True`` the backpointers come back unsliced as
    (Tp, B, S) with bp[t] = argmax into frame t (bp[0] and chunk padding
    uninitialized) — the layout :func:`band_backtrace_pallas` consumes.

    Frames past each row's length are frozen in-kernel; chunk padding past T
    is safe because every row satisfies frame_lengths <= T.
    """
    B, T, S = emit.shape
    TC = _TC
    band_dbs = jnp.moveaxis(band, 2, 0)  # (D, B, S)
    # (T, B, S): the per-frame block (TC, B, S) satisfies the (8, 128)-or-full
    # tiling rule on its last two dims; one HBM transpose pass up front
    emit_tbs = jnp.moveaxis(emit, 1, 0)
    Tp = ((T + TC - 1) // TC) * TC
    if Tp != T:
        emit_tbs = jnp.pad(emit_tbs, ((0, Tp - T), (0, 0), (0, 0)))

    kernel = functools.partial(
        _band_forward_kernel,
        lb=lb,
        ub=ub,
        S=S,
        TC=TC,
        acoustic_scale=acoustic_scale,
    )
    flens_col = frame_lengths.astype(jnp.int32)[:, None]  # (B, 1)
    alpha_T, bp = pl.pallas_call(
        kernel,
        grid=(Tp // TC,),
        in_specs=[
            pl.BlockSpec(
                (TC, B, S), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # band, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # start, resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # flens, resident
        ],
        out_specs=[
            pl.BlockSpec((B, S), lambda c: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (TC, B, S), lambda c: (c, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, S), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, S), jnp.uint8),
        ],
        scratch_shapes=[pltpu.VMEM((B, ub + S + lb), jnp.float32)],
    )(emit_tbs, band_dbs, start, flens_col)
    if full_bp:
        return alpha_T, bp
    return alpha_T, bp[1:T]


def _band_backtrace_kernel(
    bp_ref,  # (TC, B, S) uint8 VMEM: this chunk's backpointers (reversed map)
    flens_ref,  # (B, 1) int32 VMEM
    best_ref,  # (B, 1) int32 VMEM: argmax state at the last frame
    st_ref,  # out (TC, B) int32: state at each frame in the chunk
    cur,  # scratch (B, 1) int32, persists across grid steps
    *,
    lb: int,
    S: int,
    TC: int,
    T: int,
):
    c = pl.program_id(0)
    num_chunks = pl.num_programs(0)
    chunk = num_chunks - 1 - c  # chunks are visited last-to-first
    B = best_ref.shape[0]
    flens = flens_ref[:]  # (B, 1)

    @pl.when(c == 0)
    def _():
        cur[:] = best_ref[:]

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (B, S), 1)

    def body(k, _):
        i = TC - 1 - k  # frames within the chunk, last to first
        t = chunk * TC + i
        state = cur[:]  # (B, 1)
        # frames past T-1 exist only as chunk padding; don't record or step
        @pl.when(t <= T - 1)
        def _():
            st_ref[pl.ds(i, 1)] = state.reshape(1, B)
            bp_t = bp_ref[pl.ds(i, 1)][0].astype(jnp.int32)  # (B, S)
            j = jnp.sum(
                jnp.where(iota_s == state, bp_t, 0), axis=1, keepdims=True
            )
            prev = state - (j - lb)
            active = jnp.logical_and(t >= 1, t < flens)
            cur[:] = jnp.where(active, prev, state)

        return 0

    jax.lax.fori_loop(0, TC, body, 0)


@functools.partial(jax.jit, static_argnames=("lb", "T"))
def band_backtrace_pallas(
    bp_full: jnp.ndarray,  # (Tp, B, S) uint8: bp_full[t] = argmax into frame t
    frame_lengths: jnp.ndarray,  # (B,) int32
    best_state_T: jnp.ndarray,  # (B,) int32
    lb: int,
    T: int,
):
    """Backward path recovery in one sequential-grid kernel: the XLA
    ``lax.scan`` backtrace costs ~3 us of dispatch per frame; here the whole
    loop runs in-kernel with the current state vector carried in VMEM
    scratch and per-chunk backpointer blocks DMA-pipelined in reverse.
    Returns states (B, T), bit-identical to the scan backtrace."""
    Tp, B, S = bp_full.shape
    TC = _TC
    assert Tp % TC == 0
    NC = Tp // TC
    kernel = functools.partial(
        _band_backtrace_kernel, lb=lb, S=S, TC=TC, T=T
    )
    st = pl.pallas_call(
        kernel,
        grid=(NC,),
        in_specs=[
            pl.BlockSpec(
                (TC, B, S),
                lambda c, NC=NC: (NC - 1 - c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TC, B), lambda c, NC=NC: (NC - 1 - c, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Tp, B), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.int32)],
    )(bp_full, frame_lengths.astype(jnp.int32)[:, None],
      best_state_T.astype(jnp.int32)[:, None])
    return jnp.moveaxis(st[:T], 0, 1)  # (B, T)
