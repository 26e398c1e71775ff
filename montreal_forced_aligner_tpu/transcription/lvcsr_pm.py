"""Position-major LVCSR layout: the flat decoder's production geometry.

The chain-major layout (``lvcsr.LvcsrGraph``) numbers each word block's
states consecutively, which makes intra-word arcs a narrow band but leaves
the LM junction's *entry* states scattered across the state space — the
per-frame ``alpha.at[:, entry_idx].max(...)`` scatter measured ~50% of the
whole step at V=20k (0.93 ms/frame at B=16; a dense slice-max of the same
values runs 16x faster), and the word-exit gather another ~0.4 ms.

This module renumbers the same graph **position-major**: every
(word, pronunciation) becomes one *chain* c — its phone HMM states followed
by the trailing optional-silence states — and state (p, c) lives at flat
index ``p * C + c``. Consequences:

- **entry states are the contiguous row p=0**: the junction entry becomes a
  dense ``maximum`` on ``alpha[:, 0, :]`` — no scatter;
- **intra-chain arcs are pure position shifts** (src and dst share c), so
  the band becomes a handful of (Pmax, C)-shaped shifted adds along the
  position axis — same op shape as before, over the (slightly padded) grid;
- **word exits become a dense masked reduction**: ``max_p(alpha + exit_w)``
  over the position axis replaces the (B, U*E) gather;
- the only gather left in the junction is the seen-bigram lookup
  ``(B, C*Kb)`` from the (B, C) per-chain exit scores.

Grid cells past a chain's length are *dead*: NEG_INF start, NEG_INF
incoming band weights, NEG_INF exit weights — they can never win a max and
never appear on a traced path. The DP over live cells computes exactly the
same max-plus recursion as the chain-major kernels (same candidate sets,
same adds; max is exact under reordering), so scores are bit-identical and
paths agree wherever the optimum is unique (pinned by
``tests/test_lvcsr_pm.py``).

Decode is **checkpointed only** (the production scheme of
``lvcsr.lvcsr_decode_ckpt_device``, taken one step further): the decode
stores ONLY the alpha checkpoint per emission chunk — no per-frame records
at all — and the backtrace re-runs each chunk's forward to regenerate every
backpointer and junction decision chunk-locally.

Reference hot loop being replaced: beam lattice decoding over HCLG
(``transcription/multiprocessing.py:513-580``); this DP is exact (no beam).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.graph.compiler import _safe_log
from montreal_forced_aligner_tpu.ops.viterbi import NEG_INF
from montreal_forced_aligner_tpu.transcription.lvcsr import (
    _chunk_pdf_frames,
    _emit_chunker,
    _lm_rows,
    LN10,
)

# Frames per emission chunk AND checkpoint spacing for the position-major
# pair. Longer than the chain-major kernels' 32: the decode stores one f32
# (B, Pmax, C) alpha checkpoint per chunk, so doubling the chunk halves
# checkpoint HBM (the dominant per-row term — it is what admits B=32 at
# 30 s utterances under the 4 GB budget) while amortizing the emission
# selection table further; the backtrace's transient per-chunk records
# grow correspondingly but stay T-independent.
_PM_TC = 64

# cap on the position-band width (backpointers are u8 offset indices; real
# topologies — 3-state Bakis chains + the 5-state ergodic-ish silence —
# need Dp <= ~8, so a wider band signals a pathological topology)
_MAX_DP = 32


@dataclass
class LvcsrPmGraph:
    """Host arrays for the position-major flat (word-internal) decoder.

    Geometry: C chains (one per (word, pronunciation) + one initial-silence
    chain, padded to a lane multiple), Pmax positions (padded); flat state
    id = p * C + c.
    """

    words: List[str]
    Pmax: int
    C: int  # padded chain count (lane multiple); chains >= n_chains are dead
    n_chains: int
    n_real_states: int  # live (non-dead) cells, for logging/diagnostics
    lbp: int  # position-band limits: offsets d in [-lbp, ubp]
    ubp: int
    state_pdf: np.ndarray  # (S'=Pmax*C,) flat, row-major over (p, c); dead=0
    state_word: np.ndarray  # (S',) word idx; -1 silence/dead
    state_phone: np.ndarray  # (S',) phone id; -1 dead
    band: np.ndarray  # (Dp, Pmax, C) arc weight into (p, c) from (p-d, c)
    start: np.ndarray  # (Pmax, C)
    exit_w_grid: np.ndarray  # (Pmax, C) word-exit weight (NEG_INF non-exit)
    chain_word: np.ndarray  # (C,) word of chain; -1 for init-silence/dead
    bo_c: np.ndarray  # (C,) scaled backoff weight of the chain's history
    p1_c: np.ndarray  # (C,) scaled unigram of the chain's word
    entry_w_c: np.ndarray  # (C,) pron log-prob - insertion penalty (NEG_INF
    #                           for the init-silence chain and dead chains)
    eos_c: np.ndarray  # (C,) scaled </s> weight of the chain's history
    pred_c: np.ndarray  # (C, Kb) seen-bigram predecessor CHAIN ids
    pred_w: np.ndarray  # (C, Kb) scaled bigram log-prob (NEG_INF pad)
    cross_word_fallback: bool = False

    @property
    def num_states(self) -> int:
        return self.n_real_states


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


class _ChainBuilder:
    """One position-major chain: states appended in position order."""

    def __init__(self):
        self.pdf: List[int] = []
        self.phone: List[int] = []
        self.word: List[int] = []
        self.arcs: List[Tuple[int, int, float]] = []  # (src_pos, dst_pos, w)
        self.exits: List[Tuple[int, float]] = []  # (pos, word-exit weight)

    def add_plan(self, plan: dict, phone: int, word: int,
                 prev_exits: List[Tuple[int, float]], link_w: float = 0.0):
        """Append one phone plan; wire ``prev_exits`` into its entry with
        ``link_w`` added. Returns this plan's exits as (pos, w)."""
        off = len(self.pdf)
        n = plan["n_emit"]
        self.pdf.extend(plan["pdfs"])
        self.phone.extend([phone] * n)
        self.word.extend([word] * n)
        for src, dst, w, _tid in plan["internal"]:
            self.arcs.append((off + src, off + dst, w))
        for pos, w in prev_exits:
            self.arcs.append((pos, off, w + link_w))
        return [(off + src, w) for src, w, _tid in plan["exits"]]


def build_word_internal_pm(compiler) -> LvcsrPmGraph:
    """Position-major build of the word-internal LVCSR graph. Semantically
    identical to ``LvcsrGraphCompiler.build_word_internal`` (same phone
    plans, same optional-silence absorption, same LM rows); only the state
    numbering and junction factorization differ. ``compiler`` is the
    :class:`~.lvcsr.LvcsrGraphCompiler` instance (bound there as
    ``build_word_internal``)."""
    lex = compiler.lexicon
    lm = compiler.lm
    comp = compiler.comp
    sil = lex.phone_id(lex.silence_phone, None)
    sil_plan = comp._phone_plan(comp._window(0, sil, 0))
    vocab = [w for w in lm.vocab if w in lex.words]
    if not vocab:
        raise ValueError("no LM words found in the lexicon")
    V = len(vocab)
    scale = compiler.lm_scale * LN10

    chains: List[_ChainBuilder] = []
    chain_word_l: List[int] = []
    chain_row_l: List[int] = []  # LM-history row: word idx, or V for <s>
    entry_w_l: List[float] = []
    start_l: List[float] = []  # start score at position 0 (NEG_INF = none)
    start_lp = _safe_log(1.0 - lex.initial_silence_probability)

    for w_idx, word in enumerate(vocab):
        for pron in lex.words[word]:
            if lex.position_dependent:
                pids = lex.pronunciation_phone_ids(pron.phones)
            else:
                pids = [lex.phone_id(p, None) for p in pron.phones]
            prob = pron.probability if pron.probability is not None else 1.0
            pron_lp = (
                math.log(max(min(prob, 1.0), 1e-5))
                - compiler.word_insertion_penalty
            )
            p_sil = (
                pron.silence_after_probability
                if pron.silence_after_probability is not None
                else lex.silence_probability
            )
            cb = _ChainBuilder()
            prev_exits: List[Tuple[int, float]] = []
            n = len(pids)
            for k, phone in enumerate(pids):
                l = pids[k - 1] if k > 0 else sil
                r = pids[k + 1] if k < n - 1 else sil
                plan = comp._phone_plan(comp._window(l, phone, r))
                prev_exits = cb.add_plan(plan, phone, w_idx, prev_exits)
            skip_lp = _safe_log(max(1.0 - p_sil, 1e-5))
            sil_lp = _safe_log(max(p_sil, 1e-5))
            # chain exits skip the optional silence; the silence block is
            # appended to the chain (word -1 = silence convention) and its
            # exits are word exits too
            cb.exits.extend((pos, w + skip_lp) for pos, w in prev_exits)
            s_exits = cb.add_plan(sil_plan, sil, -1, prev_exits, sil_lp)
            cb.exits.extend(s_exits)
            chains.append(cb)
            chain_word_l.append(w_idx)
            chain_row_l.append(w_idx)
            entry_w_l.append(pron_lp)
            start_l.append(
                start_lp + scale * lm.log_prob(word, ("<s>",)) + pron_lp
            )

    # initial silence = its own chain with the <s> history row; junction
    # cannot enter it (entry weight NEG_INF), only the start vector can
    cb = _ChainBuilder()
    cb.exits.extend(cb.add_plan(sil_plan, sil, -1, []))
    chains.append(cb)
    chain_word_l.append(-1)
    chain_row_l.append(V)
    entry_w_l.append(NEG_INF)
    start_l.append(_safe_log(lex.initial_silence_probability))

    n_chains = len(chains)
    C = _round_up(n_chains, 128)
    Pmax = _round_up(max(len(c.pdf) for c in chains), 8)

    # position-band limits from the actual arc offsets
    dmin = min((dst - src for c in chains for src, dst, _w in c.arcs),
               default=0)
    dmax = max((dst - src for c in chains for src, dst, _w in c.arcs),
               default=0)
    lbp, ubp = max(0, -dmin), max(0, dmax)
    Dp = lbp + ubp + 1
    if Dp > _MAX_DP:
        raise ValueError(
            f"position band too wide ({Dp} offsets; topology arcs span "
            f"[{dmin}, {dmax}])"
        )

    state_pdf = np.zeros((Pmax, C), np.int32)
    state_word = np.full((Pmax, C), -1, np.int32)
    state_phone = np.full((Pmax, C), -1, np.int32)
    band = np.full((Dp, Pmax, C), NEG_INF, np.float32)
    start = np.full((Pmax, C), NEG_INF, np.float32)
    exit_w_grid = np.full((Pmax, C), NEG_INF, np.float32)
    for c, cb in enumerate(chains):
        L = len(cb.pdf)
        state_pdf[:L, c] = cb.pdf
        state_word[:L, c] = cb.word
        state_phone[:L, c] = cb.phone
        for src, dst, w in cb.arcs:
            j = dst - src + lbp
            band[j, dst, c] = max(band[j, dst, c], w)
        for pos, w in cb.exits:
            exit_w_grid[pos, c] = max(exit_w_grid[pos, c], w)
        start[0, c] = start_l[c]

    # per-chain LM rows (shared _lm_rows helper: row V = <s> history)
    p1, bo_row, eos_row, preds = _lm_rows(lm, vocab, scale)
    chain_word = np.full(C, -1, np.int32)
    chain_word[:n_chains] = chain_word_l
    bo_c = np.zeros(C, np.float32)
    eos_c = np.full(C, NEG_INF, np.float32)
    p1_c = np.zeros(C, np.float32)
    entry_w_c = np.full(C, NEG_INF, np.float32)
    for c in range(n_chains):
        row = chain_row_l[c]
        bo_c[c] = bo_row[row]
        eos_c[c] = eos_row[row]
        entry_w_c[c] = entry_w_l[c]
        if chain_word_l[c] >= 0:
            p1_c[c] = p1[chain_word_l[c]]

    chains_of_row: Dict[int, List[int]] = {}
    for c in range(n_chains):
        chains_of_row.setdefault(chain_row_l[c], []).append(c)
    pred_lists: List[List[Tuple[int, float]]] = []
    for c in range(n_chains):
        w_idx = chain_word_l[c]
        cand: List[Tuple[int, float]] = []
        if w_idx >= 0:
            for u, wgt in preds[w_idx]:
                for cu in chains_of_row.get(u, []):
                    cand.append((cu, wgt))
        pred_lists.append(cand)
    Kb = max(1, max((len(p) for p in pred_lists), default=1))
    pred_c = np.zeros((C, Kb), np.int32)
    pred_w = np.full((C, Kb), NEG_INF, np.float32)
    for c, cand in enumerate(pred_lists):
        for k, (cu, wgt) in enumerate(cand):
            pred_c[c, k] = cu
            pred_w[c, k] = wgt

    n_real = int(sum(len(c.pdf) for c in chains))
    return LvcsrPmGraph(
        words=vocab,
        Pmax=Pmax,
        C=C,
        n_chains=n_chains,
        n_real_states=n_real,
        lbp=lbp,
        ubp=ubp,
        state_pdf=state_pdf.reshape(-1),
        state_word=state_word.reshape(-1),
        state_phone=state_phone.reshape(-1),
        band=band,
        start=start,
        exit_w_grid=exit_w_grid,
        chain_word=chain_word,
        bo_c=bo_c,
        p1_c=p1_c,
        entry_w_c=entry_w_c,
        eos_c=eos_c,
        pred_c=pred_c,
        pred_w=pred_w,
    )


# ---------------------------------------------------------------------------
# Device DP (checkpointed pair)
# ---------------------------------------------------------------------------
# Layout rules learned on hardware (v5e, V=20k, B=16):
# - NO concatenates along the position (sublane) axis inside the scan step:
#   merging the junction-updated p=0 row into the (B, Pmax, C) grid via
#   concatenate forced a byte-granular relayout that cost ~10 ms/frame for
#   the u8 backpointers (the entire decode is ~0.6 ms/frame). Row-0 updates
#   are expressed as a broadcasted `where(p == 0, ...)` that XLA fuses into
#   the surrounding elementwise ops; the junction-won flag travels as its
#   own (B, C) bitmap instead of bit 7 of the backpointer byte.
# - The decode stores ONLY the per-chunk alpha checkpoints; all per-frame
#   records (band backpointers, junction argmaxes) are regenerated
#   chunk-locally by the backtrace — deterministic ops on identical inputs
#   reproduce every decision bit-exactly, and the argmax work is then paid
#   once (in the backtrace) instead of twice.
# - Winner indices use the max + `where(== max, iota, big)` + min formula
#   rather than jnp.argmax: first-max semantics are identical (ties pick
#   the lowest index, matching the chain-major kernels' argmax), and the
#   reductions fuse with the max pass.


def _first_max_idx(vals, m, axis, limit):
    """Index of the first occurrence of the max along ``axis`` (identical
    tie-breaking to jnp.argmax), via a fusable where+min reduction."""
    shape = [1] * vals.ndim
    shape[axis] = vals.shape[axis]
    iota = jnp.arange(vals.shape[axis], dtype=jnp.int32).reshape(shape)
    return jnp.min(
        jnp.where(vals == jnp.expand_dims(m, axis), iota, limit), axis=axis
    )


def _pm_junction(alpha_prev, exit_w_grid, bo_c, pred_c, pred_w, p1_c,
                 entry_w_c, with_args: bool):
    """Per-chain backoff-LM junction (alpha_prev: (B, Pmax, C)).

    Exit pooling is a dense masked max over the position axis (no gather);
    the per-word exit max of the chain-major junction is recovered because
    a max over a word's chains of (per-chain maxes) equals the max over all
    its exit states — values are bit-identical to ``lvcsr._flat_junction``.
    """
    B, Pmax, C = alpha_prev.shape
    Kb = pred_c.shape[1]
    exv = alpha_prev + exit_w_grid[None]
    exit_c = jnp.max(exv, axis=1)  # (B, C)
    bo_sc = exit_c + bo_c
    BO = jnp.max(bo_sc, axis=1)  # (B,)
    big = jnp.take(exit_c, pred_c.reshape(-1), axis=1).reshape(
        B, C, Kb
    ) + pred_w
    big_best = jnp.max(big, axis=2)
    bo_path = BO[:, None] + p1_c
    ent = jnp.maximum(bo_path, big_best) + entry_w_c  # (B, C)
    if not with_args:
        return ent, None, None, None
    exit_arg = _first_max_idx(exv, exit_c, 1, Pmax).astype(jnp.uint8)
    bo_arg = _first_max_idx(bo_sc, BO, 1, C)  # (B,) i32
    big_arg = _first_max_idx(big, big_best, 2, Kb)
    ent_src = jnp.where(bo_path >= big_best, -1, big_arg)  # (B, C) i32
    return ent, ent_src.astype(jnp.int8), exit_arg, bo_arg


def _make_pm_fstep(band_cols, exit_w_grid, bo_c, pred_c, pred_w, p1_c,
                   entry_w_c, frame_lengths, lbp, ubp, Pmax, C, mode: str):
    """One position-major forward step; single implementation for
    ``mode="ckpt"`` (no per-frame outputs — the decode) and ``"records"``
    (band backpointers + junction-won bitmap + junction argmax records —
    the backtrace's chunk recompute). The bit-exactness contract between
    the pair rests on this being the only copy of the recursion."""
    Dp = lbp + ubp + 1
    p_iota = jnp.arange(Pmax, dtype=jnp.int32)[None, :, None]

    def step(alpha_prev, inputs):
        emit_t, t = inputs  # emit_t: (B, Pmax*C) pre-expanded per chunk
        B = alpha_prev.shape[0]
        ap = jnp.pad(
            alpha_prev, ((0, 0), (ubp, lbp), (0, 0)),
            constant_values=NEG_INF,
        )
        m = jnp.full_like(alpha_prev, NEG_INF)
        bp = jnp.zeros(alpha_prev.shape, jnp.uint8)
        for j in range(Dp):
            d = j - lbp
            c = ap[:, ubp - d : ubp - d + Pmax] + band_cols[j]
            take = c > m
            m = jnp.where(take, c, m)
            bp = jnp.where(take, jnp.uint8(j), bp)
        ent, ent_src, exit_arg, bo_arg = _pm_junction(
            alpha_prev, exit_w_grid, bo_c, pred_c, pred_w, p1_c, entry_w_c,
            mode == "records",
        )
        # row-0 junction merge as a fused broadcast (NOT a concatenate —
        # sublane-axis concats relayout the whole grid per frame)
        m2 = jnp.where(p_iota == 0, jnp.maximum(m, ent[:, None, :]), m)
        alpha_new = m2 + emit_t.reshape(B, Pmax, C)
        active = (t < frame_lengths)[:, None, None]
        alpha_out = jnp.where(active, alpha_new, alpha_prev)
        if mode == "ckpt":
            return alpha_out, None
        jwin = ent > m[:, 0, :]  # (B, C) junction won the p=0 cell
        return alpha_out, (bp, jwin, ent_src, exit_arg, bo_arg)

    return step


@partial(jax.jit, static_argnames=("lbp", "ubp"))
def lvcsr_pm_decode_ckpt_device(
    e0: jnp.ndarray,  # (B, P) frame-0 pdf emissions (split_emissions)
    ep: jnp.ndarray,  # (NC, TC, B, P) chunked frames 1..T-1
    state_pdf: jnp.ndarray,  # (S'=Pmax*C,)
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (Dp, Pmax, C)
    start: jnp.ndarray,  # (Pmax, C)
    exit_w_grid: jnp.ndarray,  # (Pmax, C)
    bo_c: jnp.ndarray,  # (C,)
    pred_c: jnp.ndarray,  # (C, Kb)
    pred_w: jnp.ndarray,
    p1_c: jnp.ndarray,
    entry_w_c: jnp.ndarray,
    lbp: int,
    ubp: int,
):
    """Checkpointed position-major forward pass (production flat path).

    Stores ONLY the alpha checkpoint entering each _PM_TC-frame chunk —
    no per-frame records at all; :func:`lvcsr_pm_backtrace_ckpt_device`
    regenerates every decision chunk-locally. Returns
    ``(alpha_T (B,Pmax,C), ckpts (NC,B,Pmax,C))``.
    """
    Dp, Pmax, C = band.shape
    band_cols = [band[j] for j in range(Dp)]
    NC = ep.shape[0]
    mat = _emit_chunker(state_pdf, ep.shape[3], Pmax * C)
    t0s = 1 + jnp.arange(NC) * _PM_TC
    step = _make_pm_fstep(
        band_cols, exit_w_grid, bo_c, pred_c, pred_w, p1_c, entry_w_c,
        frame_lengths, lbp, ubp, Pmax, C, "ckpt",
    )

    def chunk_step(alpha, inputs):
        echunk, t0 = inputs
        alpha_new, _ = jax.lax.scan(
            step, alpha, (mat(echunk), t0 + jnp.arange(_PM_TC))
        )
        return alpha_new, alpha  # checkpoint = alpha ENTERING chunk

    B = e0.shape[0]
    e0s = mat(e0[None])[0]
    alpha0 = start[None] + e0s.reshape(B, Pmax, C)
    alpha_T, ckpts = jax.lax.scan(chunk_step, alpha0, (ep, t0s))
    return alpha_T, ckpts


def _pm_bt_init(alpha_T, exit_w_grid, eos_c):
    """Final state + score: best word exit + </s> LM weight over the dense
    exit grid. Value-identical to the chain-major ``_flat_bt_init``."""
    B, Pmax, C = alpha_T.shape
    fin = alpha_T + exit_w_grid[None] + eos_c[None, None, :]
    flat = fin.reshape(B, Pmax * C)
    score = jnp.max(flat, axis=1)
    s_final = _first_max_idx(flat, score, 1, Pmax * C)
    return s_final, score


def _make_pm_bstep(frame_lengths, chain_word, pred_c, lbp, C, B):
    """One reverse-scan backtrace step: carry = current flat state (B,),
    inputs = (bp_r (B,Pmax,C) u8, jwin_r (B,C) bool, ent_r (B,C) i8,
    exarg_r (B,C) u8, boarg_r (B,) i32, r)."""
    rows = jnp.arange(B)

    def bstep(s, inputs):
        bp_r, jwin_r, ent_r, exarg_r, boarg_r, r = inputs
        t = r + 1
        pos = s // C
        chain = s % C
        bpv = bp_r[rows, pos, chain].astype(jnp.int32)
        is_junc = jwin_r[rows, chain] & (pos == 0)
        k = ent_r[rows, chain].astype(jnp.int32)
        src_chain = jnp.where(
            k < 0, boarg_r, pred_c[chain, jnp.clip(k, 0)]
        )
        src_pos = exarg_r[rows, src_chain].astype(jnp.int32)
        s_j = src_pos * C + src_chain
        s_band = s - (bpv - lbp) * C
        s_new = jnp.where(is_junc, s_j, s_band)
        active = t < frame_lengths
        s_out = jnp.where(active, s_new, s)
        word_at_t = jnp.where(
            active & is_junc, chain_word[chain], -1
        ).astype(jnp.int32)
        return s_out, (s_out, word_at_t)

    return bstep


@partial(jax.jit, static_argnames=("lbp", "ubp", "T"))
def lvcsr_pm_backtrace_ckpt_device(
    alpha_T: jnp.ndarray,  # (B, Pmax, C)
    ckpts: jnp.ndarray,  # (NC, B, Pmax, C)
    ep: jnp.ndarray,  # (NC, TC, B, P) chunked emissions (split_emissions)
    state_pdf: jnp.ndarray,  # (S',)
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (Dp, Pmax, C)
    exit_w_grid: jnp.ndarray,  # (Pmax, C)
    eos_c: jnp.ndarray,  # (C,)
    bo_c: jnp.ndarray,
    pred_c: jnp.ndarray,
    pred_w: jnp.ndarray,
    p1_c: jnp.ndarray,
    entry_w_c: jnp.ndarray,
    chain_word: jnp.ndarray,  # (C,)
    state_word: jnp.ndarray,  # (S',)
    lbp: int,
    ubp: int,
    T: int,
):
    """Checkpointed position-major backtrace: chunks visited last-to-first,
    each re-running its forward from the stored checkpoint in ``records``
    mode (regenerating band backpointers, the junction-won bitmap, and the
    junction winner indices for its TC frames only — transient, never
    stored across T), then reverse-scanning them. Outputs: state path
    (B, T) i32 (flat p*C+c ids), per-frame entered word (B, T) i32
    (-1 = none), final score (B,)."""
    B, Pmax, C = alpha_T.shape
    Dp = lbp + ubp + 1
    band_cols = [band[j] for j in range(Dp)]
    NC = ep.shape[0]
    mat = _emit_chunker(state_pdf, ep.shape[3], Pmax * C)
    t0s = 1 + jnp.arange(NC) * _PM_TC

    s_final, score = _pm_bt_init(alpha_T, exit_w_grid, eos_c)
    bstep = _make_pm_bstep(frame_lengths, chain_word, pred_c, lbp, C, B)
    fstep = _make_pm_fstep(
        band_cols, exit_w_grid, bo_c, pred_c, pred_w, p1_c, entry_w_c,
        frame_lengths, lbp, ubp, Pmax, C, "records",
    )

    def chunk_bt(s, inputs):
        ck, echunk, t0 = inputs
        _a, (bp, jwin, entr, exar, boar) = jax.lax.scan(
            fstep, ck, (mat(echunk), t0 + jnp.arange(_PM_TC))
        )
        return jax.lax.scan(
            bstep,
            s,
            (bp, jwin, entr, exar, boar, t0 - 1 + jnp.arange(_PM_TC)),
            reverse=True,
        )

    _s0, (path_prev, word_at) = jax.lax.scan(
        chunk_bt, s_final, (ckpts, ep, t0s), reverse=True
    )
    path_prev = path_prev.reshape(NC * _PM_TC, B)
    word_at = word_at.reshape(NC * _PM_TC, B)
    path = jnp.concatenate(
        [jnp.moveaxis(path_prev, 0, 1), s_final[:, None]], axis=1
    )  # (B, Tp)
    w0 = state_word[path[:, 0]].astype(jnp.int32)
    word0 = jnp.where(w0 >= 0, w0, -1)
    word_at_full = jnp.concatenate(
        [word0[:, None], jnp.moveaxis(word_at, 0, 1)], axis=1
    )
    return path[:, :T], word_at_full[:, :T], score
