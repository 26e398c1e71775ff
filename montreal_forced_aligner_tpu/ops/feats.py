"""Feature post-processing: CMVN, deltas, splicing, linear transforms.

Replaces the reference's lazy C++ feature composition (``FeatureArchive``
composing raw MFCC + CMVN + deltas-or-splice+LDA + fMLLR,
``db_polars.py:2917-2962``) with masked batched tensor ops. All functions take
(B, T, D) arrays plus (B,) frame counts and are safe on padded frames.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def delta_window_scales(order: int = 2, window: int = 2) -> np.ndarray:
    """Kaldi delta coefficients: per order, the previous order's scales
    convolved with [-w..w]/sum(j^2). Returns (order+1, max_len) ragged list
    flattened to a list of 1-D float arrays.
    """
    scales = [np.array([1.0])]
    norm = sum(j * j for j in range(-window, window + 1))
    kernel = np.arange(-window, window + 1, dtype=np.float64) / norm
    for _ in range(order):
        scales.append(np.convolve(scales[-1], kernel))
    return [s.astype(np.float32) for s in scales]


@jax.jit
def edge_fill(feats: jnp.ndarray, frame_lengths: jnp.ndarray) -> jnp.ndarray:
    """Replace frames past each utterance's true length with its last valid
    frame, so subsequent *static* shifted views implement Kaldi's
    clamp-to-[0, T_true-1] edge handling without per-utterance gathers."""
    B, T, D = feats.shape
    last = jnp.take_along_axis(
        feats, jnp.maximum(frame_lengths - 1, 0)[:, None, None], axis=1
    )  # (B, 1, D)
    mask = (jnp.arange(T)[None, :] < frame_lengths[:, None])[..., None]
    return jnp.where(mask, feats, last)


def _shift_edge(x: jnp.ndarray, j: int) -> jnp.ndarray:
    """Static shift along axis 1 with edge replication."""
    if j == 0:
        return x
    if j > 0:
        tail = jnp.repeat(x[:, -1:], j, axis=1)
        return jnp.concatenate([x[:, j:], tail], axis=1)
    head = jnp.repeat(x[:, :1], -j, axis=1)
    return jnp.concatenate([head, x[:, :j]], axis=1)


@partial(jax.jit, static_argnames=("order", "window"))
def compute_deltas(
    feats: jnp.ndarray,  # (B, T, D)
    frame_lengths: jnp.ndarray,  # (B,)
    order: int = 2,
    window: int = 2,
) -> jnp.ndarray:
    """Append delta features (Kaldi ``add-deltas`` semantics: precomputed
    convolution kernels applied with frame-index clamping to [0, T_true-1]).
    Output (B, T, D*(order+1)).
    """
    scales = delta_window_scales(order, window)
    filled = edge_fill(feats, frame_lengths)
    outs = [feats]
    for o in range(1, order + 1):
        s = scales[o]
        half = (len(s) - 1) // 2
        acc = jnp.zeros_like(feats)
        for j in range(-half, half + 1):
            w = float(s[j + half])
            if w == 0.0:
                continue
            acc = acc + w * _shift_edge(filled, j)
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


@partial(jax.jit, static_argnames=("left", "right"))
def splice_frames(
    feats: jnp.ndarray,
    frame_lengths: jnp.ndarray,
    left: int = 3,
    right: int = 3,
) -> jnp.ndarray:
    """Splice +-context frames (Kaldi ``splice-feats``: clamped at edges).
    Output (B, T, D*(left+1+right))."""
    filled = edge_fill(feats, frame_lengths)
    pieces = [_shift_edge(filled, j) for j in range(-left, right + 1)]
    return jnp.concatenate(pieces, axis=-1)


def frame_mask(frame_lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    return jnp.arange(T)[None, :] < frame_lengths[:, None]


@jax.jit
def accumulate_cmvn_stats(
    feats: jnp.ndarray,  # (B, T, D)
    frame_lengths: jnp.ndarray,  # (B,)
    speaker_ids: jnp.ndarray,  # (B,) dense speaker index
    num_speakers: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-speaker (sum, sumsq, count) over valid frames — the segment-reduce
    equivalent of the reference's per-speaker ``CmvnComputer``
    (``acoustic_corpus.py:1315``)."""
    mask = frame_mask(frame_lengths, feats.shape[1])[..., None]
    masked = jnp.where(mask, feats, 0.0)
    per_utt_sum = masked.sum(axis=1)  # (B, D)
    per_utt_sumsq = (masked * masked).sum(axis=1)
    counts = frame_lengths.astype(jnp.float32)
    spk_sum = jax.ops.segment_sum(per_utt_sum, speaker_ids, num_speakers)
    spk_sumsq = jax.ops.segment_sum(per_utt_sumsq, speaker_ids, num_speakers)
    spk_count = jax.ops.segment_sum(counts, speaker_ids, num_speakers)
    return spk_sum, spk_sumsq, spk_count


@partial(jax.jit, static_argnames=("norm_vars",))
def apply_cmvn(
    feats: jnp.ndarray,  # (B, T, D)
    speaker_ids: jnp.ndarray,  # (B,)
    spk_sum: jnp.ndarray,  # (S, D)
    spk_sumsq: jnp.ndarray,  # (S, D)
    spk_count: jnp.ndarray,  # (S,)
    norm_vars: bool = False,
) -> jnp.ndarray:
    """Apply per-speaker cepstral mean (and optionally variance) normalization
    (Kaldi ``apply-cmvn`` defaults: mean only)."""
    count = jnp.maximum(spk_count, 1.0)[:, None]
    mean = spk_sum / count  # (S, D)
    out = feats - mean[speaker_ids][:, None, :]
    if norm_vars:
        var = jnp.maximum(spk_sumsq / count - mean**2, 1e-10)
        out = out * jax.lax.rsqrt(var)[speaker_ids][:, None, :]
    return out


@partial(
    jax.jit,
    static_argnames=("cmn_window", "min_window", "center", "normalize_variance"),
)
def sliding_cmn(
    feats: jnp.ndarray,  # (B, T, D)
    frame_lengths: jnp.ndarray,  # (B,)
    cmn_window: int = 300,
    min_window: int = 100,
    center: bool = True,
    normalize_variance: bool = False,
) -> jnp.ndarray:
    """Kaldi ``apply-cmvn-sliding`` (``SlidingWindowCmnInternal``,
    feat/feature-functions.cc): per-frame mean over a ``cmn_window``-frame
    window, centered when ``center`` (the i-vector recipe setting; reference
    feature composition ``corpus/features.py:321-337``, ivector workers
    ``ivector/multiprocessing.py:108``).

    Window arithmetic follows Kaldi exactly: the window is shifted (not
    shrunk) at utterance edges, so it only shrinks below ``cmn_window``
    when the utterance itself is shorter; with ``center=False`` the leading
    frames use at least ``min_window`` frames of context. Vectorized over
    (B, T) via prefix sums; padded frames pass through untouched.
    """
    B, T, D = feats.shape
    n = frame_lengths[:, None].astype(jnp.int32)  # (B, 1)
    t = jnp.arange(T, dtype=jnp.int32)[None, :]  # (1, T)
    if center:
        start = t - cmn_window // 2
        end = start + cmn_window
    else:
        start = t - cmn_window
        end = t + 1
    # shift right if the window starts before the utterance
    shift = jnp.maximum(-start, 0)
    start = start + shift
    end = end + shift
    if not center:
        end = jnp.maximum(t + 1, min_window)
    # shift left if the window ends past the utterance
    over = jnp.maximum(end - n, 0)
    start = jnp.maximum(start - over, 0)
    end = jnp.minimum(end, n)
    mask = frame_mask(frame_lengths, T)[..., None]
    masked = jnp.where(mask, feats, 0.0)
    csum = jnp.cumsum(masked, axis=1)
    csum = jnp.concatenate([jnp.zeros((B, 1, D), csum.dtype), csum], axis=1)
    bidx = jnp.arange(B)[:, None]
    wsum = csum[bidx, end] - csum[bidx, start]  # (B, T, D)
    wn = jnp.maximum((end - start).astype(feats.dtype), 1.0)[..., None]
    mean = wsum / wn
    out = feats - mean
    if normalize_variance:
        csq = jnp.cumsum(masked * masked, axis=1)
        csq = jnp.concatenate([jnp.zeros((B, 1, D), csq.dtype), csq], axis=1)
        wsq = csq[bidx, end] - csq[bidx, start]
        var = jnp.maximum(wsq / wn - mean * mean, 1e-10)
        out = out * jax.lax.rsqrt(var)
    return jnp.where(mask, out, feats)


@jax.jit
def apply_transform(feats: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply an affine/linear transform (LDA, fMLLR): rows of ``transform``
    are output dims; if it has D+1 columns the last is an offset (Kaldi
    ``transform-feats`` semantics)."""
    D = feats.shape[-1]
    out_dim, in_dim = transform.shape
    linear = transform[:, :D]
    out = jnp.einsum(
        "btd,ed->bte",
        feats,
        linear,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if in_dim == D + 1:
        out = out + transform[:, D]
    return out


@jax.jit
def apply_per_speaker_transform(
    feats: jnp.ndarray,  # (B, T, D)
    speaker_ids: jnp.ndarray,  # (B,)
    transforms: jnp.ndarray,  # (S, E, D+1) per-speaker fMLLR transforms
) -> jnp.ndarray:
    trans = transforms[speaker_ids]  # (B, E, D+1)
    D = feats.shape[-1]
    out = jnp.einsum(
        "btd,bed->bte",
        feats,
        trans[:, :, :D],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out + trans[:, None, :, D]


def silence_pdf_mask(sil_pdfs, num_pdfs: int):
    """(P,) float32 mask: 1.0 at silence pdfs (for :func:`nonsilence_weight`)."""
    import numpy as _np

    mask = _np.zeros(num_pdfs, _np.float32)
    mask[_np.asarray(sil_pdfs, _np.int64)] = 1.0
    return mask


@jax.jit
def nonsilence_weight(frame_pdf, sil_mask):
    """1.0 on non-silence frames, 0.0 on silence (fMLLR silence_weight=0,
    reference ``corpus/features.py:608``); a device gather over a (P,)
    silence-pdf mask so per-frame pdfs never round-trip to the host."""
    return 1.0 - jnp.take(sil_mask, frame_pdf, axis=0)
