"""Large-vocabulary decoding: two-level time-synchronous DP.

The exact dense decoder (``transcriber.DecodingGraphCompiler``) materializes
every LM transition as a graph arc — O(V^2) arcs — which caps it at a few
hundred words. The reference scales past this with HCLG beam search
(``LatticeFasterDecoder``; graph build ``transcription/multiprocessing.py:451``),
whose graph stays small because the LM keeps its *backoff structure*. This
module is the TPU-native counterpart: instead of beam-pruned token passing
over a composed FST, each frame runs

1. a band-sparse max-plus step over all word-HMM blocks at once (word
   interiors are contiguous state ranges, so intra-word arcs live in a
   narrow band — the same kernel shape as forced alignment), and
2. a *backoff LM junction* in closed form: per-word exit scores via a
   padded gather + max, one global backoff maximum, seen-bigram updates via
   a (V, Kb) gather, and word entry via a per-entry-state gather —
   O(S + V*Kb) work per frame instead of O(V^2).

Optional inter-word silence is absorbed into each word block (exit ->
silence -> exit'), which preserves the LM word history with no extra
machinery. The DP is exact over this graph — no beam, nothing pruned.

Context dependency: exact cross-word triphone context is implemented by
:class:`LvcsrXwGraph` in this module — the junction is factored through
context classes (exit cells per (word, presented phone, right group),
entry slots per (word, left group), backoff via a per-segment max), and
matches the exact dense decoder on triphone models rank for rank
(``tests/test_triphone.py``). The word-internal build (silence assumed as
cross-word context) remains only as the fallback when the cross-word
expansion exceeds the band buckets.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.graph.compiler import _GraphBuilder, _safe_log
from montreal_forced_aligner_tpu.language_modeling.ngram import ArpaModel
from montreal_forced_aligner_tpu.ops.viterbi import NEG_INF

LN10 = math.log(10.0)


@dataclass
class LvcsrGraph:
    """Host arrays for the two-level decoder (single shared graph)."""

    words: List[str]
    # HMM substrate
    state_pdf: np.ndarray  # (S,)
    state_word: np.ndarray  # (S,) word index (-1 for inter/initial silence)
    state_phone: np.ndarray  # (S,)
    band: np.ndarray  # (S, D) intra-word arcs
    lb: int = 0
    ub: int = 0
    # True when this word-internal graph was built as a FALLBACK from a
    # requested cross-word-context expansion that exceeded the budget —
    # decode accuracy is degraded vs exact cross-word context, and callers
    # (transcriber results, bench JSON) surface this machine-visibly
    cross_word_fallback: bool = False
    band_bp_offsets: Optional[np.ndarray] = None
    start: Optional[np.ndarray] = None  # (S,)
    # junction arrays; U = V + 1 sources (words + initial-silence row V)
    exit_idx: Optional[np.ndarray] = None  # (U, E)
    exit_w: Optional[np.ndarray] = None  # (U, E)
    entry_idx: Optional[np.ndarray] = None  # (Ne,) entry state per slot
    entry_word: Optional[np.ndarray] = None  # (Ne,)
    entry_w: Optional[np.ndarray] = None  # (Ne,)
    # LM (all scaled: lm_scale * log10 * LN10)
    p1: Optional[np.ndarray] = None  # (V,) unigram
    bo: Optional[np.ndarray] = None  # (U,) backoff weight of each history
    big_pred: Optional[np.ndarray] = None  # (V, Kb) predecessor source index
    big_w: Optional[np.ndarray] = None  # (V, Kb) seen-bigram log-prob
    eos: Optional[np.ndarray] = None  # (U,) end-of-sentence LM weight

    @property
    def num_states(self) -> int:
        return len(self.state_pdf)

    @property
    def state0_hash(self) -> np.ndarray:
        """Word-sequence hash per start state (word entries hash their word;
        silence starts hash 0). Only states with finite start scores matter."""
        return np.where(self.state_word >= 0, self.state_word + 1, 0).astype(
            np.uint32
        )

    @property
    def entry_slot_of_state(self) -> np.ndarray:
        """(S,) dense inverse of ``entry_idx``: the entry-slot index of each
        state, -1 for non-entry states (the device backtrace's replacement
        for the host's ``{state: slot}`` dict)."""
        arr = np.full(self.num_states, -1, np.int32)
        arr[np.asarray(self.entry_idx, np.int64)] = np.arange(
            len(self.entry_idx), dtype=np.int32
        )
        return arr



def _lm_rows(lm: ArpaModel, vocab, scale: float):
    """Scaled LM arrays shared by both junction builders: unigram row,
    per-history backoff and end-of-sentence rows (row V = the <s>
    history), and seen-bigram predecessor lists per word."""
    V = len(vocab)
    word_index = {w: i for i, w in enumerate(vocab)}
    p1 = np.asarray([scale * lm.log_prob(v, ()) for v in vocab], np.float32)
    bo = np.zeros(V + 1, np.float32)
    eos = np.zeros(V + 1, np.float32)
    for u, w in enumerate(list(vocab) + ["<s>"]):
        bo[u] = scale * lm.ngrams[1].get((w,), (0.0, 0.0))[1]
        eos[u] = scale * lm.log_prob("</s>", (w,))
    preds: Dict[int, List[Tuple[int, float]]] = {v: [] for v in range(V)}
    if lm.order >= 2:
        for key, (lp, _b) in lm.ngrams[2].items():
            hist, w = key[0], key[1]
            if w not in word_index:
                continue
            u = word_index.get(hist, V if hist == "<s>" else None)
            if u is None:
                continue
            preds[word_index[w]].append((u, scale * lp))
    return p1, bo, eos, preds


class LvcsrGraphCompiler:
    """Builds an :class:`LvcsrGraph` from lexicon + backoff bigram LM."""

    def __init__(self, align_compiler, lexicon, lm: ArpaModel,
                 lm_scale: float = 1.0, word_insertion_penalty: float = 0.0,
                 cross_word: Optional[bool] = None,
                 nominal_frames: Optional[int] = None):
        self.comp = align_compiler
        self.lexicon = lexicon
        self.lm = lm
        self.lm_scale = lm_scale
        self.word_insertion_penalty = word_insertion_penalty
        # exact cross-word context matters only for context-dependent trees
        self.cross_word = (
            align_compiler.tree.N == 3 if cross_word is None else cross_word
        )
        # the corpus's real max utterance length, when the caller knows it
        # (Transcriber passes it); the record-budget gates otherwise assume
        # a nominal 30 s utterance
        self.nominal_frames = nominal_frames

    def _word_block(self, g: _GraphBuilder, pids, w_idx, p_sil, sil):
        """One pronunciation chain + optional trailing silence; returns
        (entry_state, [(exit_state, weight, tid), ...])."""
        comp = self.comp
        entry, chain_exits = comp._expand_pronunciation(
            g, pids, w_idx, boundary_ctx=sil
        )
        exits = [
            (s, w + _safe_log(max(1.0 - p_sil, 1e-5)), tid)
            for s, w, tid in chain_exits
        ]
        # trailing optional silence (word index kept = silence convention -1)
        splan_entry, sexits = comp._expand_phone_standalone(g, sil, -1)
        for s, w, tid in chain_exits:
            g.add_arc(s, splan_entry, w + _safe_log(max(p_sil, 1e-5)), tid)
        exits.extend(sexits)
        return entry, exits

    def build(self):
        """Returns an :class:`LvcsrXwGraph` (cross-word-exact) for triphone
        trees, else a position-major :class:`~.lvcsr_pm.LvcsrPmGraph`
        (word-internal context). Falls back to word-internal if the
        cross-word expansion exceeds the band buckets or record budget."""
        if self.cross_word:
            try:
                return self._build_cross_word()
            except ValueError as e:
                import logging

                logging.getLogger("mfa_tpu").warning(
                    "cross-word LVCSR build fell back to word-internal "
                    "context: %s", e,
                )
                g = self.build_word_internal()
                g.cross_word_fallback = True
                return g
        return self.build_word_internal()

    def build_word_internal(self):
        """Position-major word-internal graph — the production flat layout
        (:mod:`~.lvcsr_pm`; entry states contiguous, exits a dense masked
        reduction, no junction scatter)."""
        from montreal_forced_aligner_tpu.transcription.lvcsr_pm import (
            build_word_internal_pm,
        )

        return build_word_internal_pm(self)

    def build_word_internal_legacy(self) -> LvcsrGraph:
        """Chain-major word-internal graph (the pre-position-major layout).
        Retained as the reference for the pm equivalence pins and as the
        substrate of the K-best junction kernels until those move to the
        position-major layout."""
        from montreal_forced_aligner_tpu.graph.compiler import batch_graphs
        from montreal_forced_aligner_tpu.ops.viterbi import band_from_arcs

        lex = self.lexicon
        lm = self.lm
        comp = self.comp
        g = _GraphBuilder()
        sil = lex.phone_id(lex.silence_phone, None)
        vocab = [w for w in lm.vocab if w in lex.words]
        if not vocab:
            raise ValueError("no LM words found in the lexicon")
        V = len(vocab)

        entries: List[Tuple[int, int, float]] = []  # (state, word, weight)
        exits: List[List[Tuple[int, float, int]]] = []
        for w_idx, word in enumerate(vocab):
            wexits: List[Tuple[int, float, int]] = []
            for pron in lex.words[word]:
                if lex.position_dependent:
                    pids = lex.pronunciation_phone_ids(pron.phones)
                else:
                    pids = [lex.phone_id(p, None) for p in pron.phones]
                prob = pron.probability if pron.probability is not None else 1.0
                pron_lp = (
                    math.log(max(min(prob, 1.0), 1e-5))
                    - self.word_insertion_penalty
                )
                p_sil = (
                    pron.silence_after_probability
                    if pron.silence_after_probability is not None
                    else lex.silence_probability
                )
                entry, p_exits = self._word_block(g, pids, w_idx, p_sil, sil)
                entries.append((entry, w_idx, pron_lp))
                wexits.extend(p_exits)
            exits.append(wexits)
        # initial silence = source row V with <s> LM state
        init_entry, init_exits = comp._expand_phone_standalone(g, sil, -1)
        exits.append(init_exits)

        graph = g.finish(vocab)
        garrs = batch_graphs([graph], state_multiple=1)
        band_out = band_from_arcs(garrs)
        if band_out is None:
            raise ValueError("word-internal arcs exceed band buckets")
        band_np, lb, ub = band_out
        S = graph.num_states

        # start vector: initial silence, or straight into a first word
        start = np.full(S, NEG_INF, np.float32)
        start[init_entry] = _safe_log(lex.initial_silence_probability)
        scale = self.lm_scale * LN10
        start_lp = _safe_log(1.0 - lex.initial_silence_probability)
        for st, w_idx, pron_lp in entries:
            lm_lp = scale * lm.log_prob(vocab[w_idx], ("<s>",))
            start[st] = max(start[st], start_lp + lm_lp + pron_lp)

        U = V + 1
        E = max(len(e) for e in exits)
        exit_idx = np.zeros((U, E), np.int32)
        exit_w = np.full((U, E), NEG_INF, np.float32)
        for u, ex in enumerate(exits):
            for j, (s, w, _tid) in enumerate(ex):
                exit_idx[u, j] = s
                exit_w[u, j] = w

        entry_idx = np.asarray([e[0] for e in entries], np.int32)
        entry_word = np.asarray([e[1] for e in entries], np.int32)
        entry_w = np.asarray([e[2] for e in entries], np.float32)

        # LM arrays. log_prob is log10; junction uses natural log, pre-scaled
        p1, bo, eos, preds = _lm_rows(lm, vocab, scale)
        Kb = max(1, max(len(p) for p in preds.values()))
        big_pred = np.zeros((V, Kb), np.int32)
        big_w = np.full((V, Kb), NEG_INF, np.float32)
        for v, plist in preds.items():
            for k, (u, wgt) in enumerate(plist):
                big_pred[v, k] = u
                big_w[v, k] = wgt

        return LvcsrGraph(
            words=vocab,
            state_pdf=garrs["state_pdf"][0],
            state_word=garrs["state_word"][0],
            state_phone=garrs["state_phone"][0],
            band=band_np[0],
            lb=lb,
            ub=ub,
            start=start,
            exit_idx=exit_idx,
            exit_w=exit_w,
            entry_idx=entry_idx,
            entry_word=entry_word,
            entry_w=entry_w,
            p1=p1,
            bo=bo,
            big_pred=big_pred,
            big_w=big_w,
            eos=eos,
        )


# ---------------------------------------------------------------------------
# Device DP
# ---------------------------------------------------------------------------

# Frames per emission chunk: the pdf->state expansion materializes one
# (TC, B, S) block at a time, so the (S, P) selection table (or the gather's
# per-row overhead) is amortized TC-fold instead of paid per frame. A
# per-frame (B, P)->(B, S) gather measures ~1.4 G elem/s on v5e — 100x
# below HBM bandwidth — and dominated the whole decode at S=489k.
_EMIT_TC = 32
# one-hot selection table budget: above this the chunker falls back to the
# wide-row gather (exact either way; the matmul needs the (S, P) f32 table
# resident in HBM)
_OH_TABLE_MAX = float(os.environ.get("MFA_TPU_LVCSR_OH_BYTES", 2e9))
# device-resident record budget (read through Transcriber._rec_budget():
# batches split to fit it, and a cross-word expansion that cannot fit even
# one row falls back to the word-internal graph at build time)
_REC_BUDGET = float(os.environ.get("MFA_TPU_LVCSR_REC_BYTES", 4e9))
# checkpoint spacing of the checkpointed cross-word pair (longer than the
# record-based kernels' emission chunk: halves checkpoint HBM, which is
# what admits B=32 at 30 s utterances under the budget)
_XW_TC = 64


def xw_rec_bytes_per_frame_row(
    S: int, Ne: int, Nc: int, P: int, F: int, RG: int
) -> int:
    """Per-(frame, batch-row) bytes of the RECORD-BASED cross-word decode
    (bp u8 (S) + jwin bool/ent_src i32/ent_l u8 (Ne) + cell_arg u8 (Nc) +
    BOFarg i16 (P*F) + BO2arg i32 (P*RG)). The production path is
    checkpointed (see :func:`xw_ckpt_bytes_per_row`); this sizes the
    reference pair and one chunk's transient records."""
    return S + Ne * 6 + Nc + P * F * 2 + P * RG * 4


def xw_ckpt_bytes_per_row(
    S: int, Ne: int, Nc: int, P_pdf: int, P: int, F: int, RG: int, T: int
) -> int:
    """Device bytes per batch row of the CHECKPOINTED cross-word decode at
    utterance length T: f32 alpha checkpoints + the single pre-chunked f32
    pdf-emission copy (both T-scaled; ``split_emissions`` drops the
    original) plus ONE chunk's transient records (T-independent — the
    backtrace regenerates them chunk-locally). The single source for the
    build-time fallback gate and the transcriber's batch split."""
    return (
        (4 * S * T) // _XW_TC
        + 4 * P_pdf * T
        + _XW_TC * xw_rec_bytes_per_frame_row(S, Ne, Nc, P, F, RG)
    )


def _emit_chunker(state_pdf: jnp.ndarray, P: int, S: int):
    """Build the per-chunk pdf->state emission expander
    ``(TC, B, P) -> (TC, B, S)``.

    Two exact strategies: a one-hot f32 matmul (XLA/MXU moves the
    selection at table-read bandwidth; HIGHEST precision keeps e*1+0 sums
    bit-exact) when the (S, P) table fits the budget, else a wide-row
    gather from (P, TC*B) — gathering TC*B-wide rows amortizes the
    per-row gather overhead that makes the naive per-frame form slow."""
    if S * P * 4 <= _OH_TABLE_MAX:
        oh = jax.nn.one_hot(state_pdf, P, dtype=jnp.float32)  # (S, P)

        def mat(echunk):
            TC, B, _ = echunk.shape
            # clamp to a finite floor: a -inf/NaN per-PDF value (e.g. f32
            # underflow inside gmm_loglikes' logsumexp) would turn the
            # selection's 0*(-inf) products into NaN and poison every
            # state of the frame; the gather fallback needs no clamp
            echunk = jnp.maximum(jnp.nan_to_num(echunk, nan=NEG_INF), NEG_INF)
            e = jax.lax.dot_general(
                echunk.reshape(TC * B, P),
                oh,
                (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            return e.reshape(TC, B, S)

    else:

        def mat(echunk):
            TC, B, _ = echunk.shape
            wide = jnp.take(
                echunk.reshape(TC * B, P).T, state_pdf, axis=0
            )  # (S, TC*B)
            return wide.T.reshape(TC, B, S)

    return mat


def _chunk_pdf_frames(emit_pdf: jnp.ndarray, TC: int):
    """Reshape frames 1..T-1 of (B, T, P) into (NC, TC, B, P) chunks plus
    their global start frames; padded tail frames are inert (every kernel
    freezes past ``frame_lengths``)."""
    B, T, P = emit_pdf.shape
    n_scan = T - 1
    NC = (n_scan + TC - 1) // TC
    pad = NC * TC - n_scan
    ep = jnp.pad(emit_pdf[:, 1:], ((0, 0), (0, pad), (0, 0)))
    ep = jnp.moveaxis(ep.reshape(B, NC, TC, P), 0, 2)  # (NC, TC, B, P)
    t0s = 1 + jnp.arange(NC) * TC
    return ep, t0s, NC


@partial(jax.jit, static_argnames=("TC",))
def split_emissions(emit_pdf: jnp.ndarray, TC: int):
    """Pre-chunk (B, T, P) pdf emissions for the checkpointed kernels:
    returns ``(e0 (B, P) — frame 0, ep (NC, TC, B, P) — frames 1..T-1)``.
    Chunking ONCE in the caller (which then drops emit_pdf) halves
    emission HBM residency vs chunking inside both the decode and the
    backtrace — at 5k pdfs, T=3000, B=32 that second copy alone was
    ~1.9 GB."""
    e0 = emit_pdf[:, 0]
    ep, _t0s, _NC = _chunk_pdf_frames(emit_pdf, TC)
    return e0, ep


def _scan_chunked(step, init_carry, emit_pdf: jnp.ndarray,
                  state_pdf: jnp.ndarray):
    """Shared chunked-emission driver for every decode kernel.

    Runs ``step(carry, (emit_t (B,S), t))`` over frames 1..T-1, expanding
    pdf emissions to state emissions one _EMIT_TC-frame chunk at a time
    (see :func:`_emit_chunker`). ``init_carry`` maps the frame-0 state
    emissions (B, S) to the scan's initial carry. Returns (final carry,
    records reshaped to a flat >= T-1 frame axis; the tail chunk padding
    is inert)."""
    S = state_pdf.shape[0]
    mat = _emit_chunker(state_pdf, emit_pdf.shape[2], S)
    ep, t0s, NC = _chunk_pdf_frames(emit_pdf, _EMIT_TC)

    def chunk_step(carry, inputs):
        echunk, t0 = inputs
        return jax.lax.scan(
            step, carry, (mat(echunk), t0 + jnp.arange(_EMIT_TC))
        )

    carry0 = init_carry(mat(jnp.moveaxis(emit_pdf[:, :1], 0, 1))[0])
    carry_T, recs = jax.lax.scan(chunk_step, carry0, (ep, t0s))
    recs = jax.tree_util.tree_map(
        lambda x: x.reshape((NC * _EMIT_TC,) + x.shape[2:]), recs
    )
    return carry_T, recs


def _flat_band_max(alpha_prev, band_cols, lb, ub):
    """Intra-word band max-plus pass: (m (B,S), bp (B,S) uint8)."""
    S = alpha_prev.shape[1]
    ap = jnp.pad(alpha_prev, ((0, 0), (ub, lb)), constant_values=NEG_INF)
    m = jnp.full_like(alpha_prev, NEG_INF)
    bp = jnp.zeros(alpha_prev.shape, jnp.uint8)
    for j in range(len(band_cols)):
        d = j - lb
        c = ap[:, ub - d : ub - d + S] + band_cols[j]
        take = c > m
        m = jnp.where(take, c, m)
        bp = jnp.where(take, jnp.uint8(j), bp)
    return m, bp


def _make_flat_fstep(
    band_cols, exit_flat, exit_w, bo, big_pred, big_w, p1, entry_word,
    entry_w, entry_idx, frame_lengths, lb, ub, mode: str,
):
    """One flat forward step, single implementation for all three uses:
    ``mode="records"`` emits the full per-frame records (record-based
    decode), ``"ckpt"`` the junction records only (checkpointed decode),
    ``"bp_only"`` the packed band backpointers only (the checkpointed
    backtrace's chunk recompute). The bit-exactness contract between the
    pairs rests on this being the only copy of the recursion."""

    def step(alpha_prev, inputs):
        emit_t, t = inputs  # emit_t: (B, S), pre-expanded per chunk
        m, bp = _flat_band_max(alpha_prev, band_cols, lb, ub)
        ent_v, ent_src, exit_arg, bo_arg = _flat_junction(
            alpha_prev, exit_flat, exit_w, bo, big_pred, big_w, p1,
            mode != "bp_only",
        )
        entry_cand = jnp.take(ent_v, entry_word, axis=1) + entry_w
        m2 = m.at[:, entry_idx].max(entry_cand)
        alpha_new = m2 + emit_t
        active = (t < frame_lengths)[:, None]
        alpha_out = jnp.where(active, alpha_new, alpha_prev)
        if mode == "ckpt":
            return alpha_out, (ent_src, exit_arg, bo_arg)
        bp_packed = jnp.where(m2 > m, bp | jnp.uint8(0x80), bp)
        if mode == "bp_only":
            return alpha_out, bp_packed
        return alpha_out, (bp_packed, ent_src, exit_arg, bo_arg)

    return step


def _flat_junction(
    alpha_prev, exit_flat, exit_w, bo, big_pred, big_w, p1, with_args: bool
):
    """Backoff-LM junction. ``with_args=False`` (the checkpoint-backtrace
    recompute) skips the argmax records — the values alone reproduce the
    alpha recursion exactly."""
    B = alpha_prev.shape[0]
    U, E = exit_w.shape
    V, Kb = big_pred.shape
    ex = jnp.take(alpha_prev, exit_flat, axis=1).reshape(B, U, E) + exit_w
    exit_u = jnp.max(ex, axis=2)  # (B, U)
    bo_sc = exit_u + bo
    BO = jnp.max(bo_sc, axis=1)
    big = jnp.take(exit_u, big_pred.reshape(-1), axis=1).reshape(
        B, V, Kb
    ) + big_w
    big_best = jnp.max(big, axis=2)
    bo_path = BO[:, None] + p1
    ent_v = jnp.maximum(bo_path, big_best)  # (B, V)
    if not with_args:
        return ent_v, None, None, None
    exit_arg = jnp.argmax(ex, axis=2).astype(jnp.uint8)
    bo_arg = jnp.argmax(bo_sc, axis=1).astype(jnp.int32)
    big_arg = jnp.argmax(big, axis=2).astype(jnp.int8)
    ent_src = jnp.where(bo_path >= big_best, jnp.int8(-1), big_arg)
    return ent_v, ent_src, exit_arg, bo_arg


@partial(jax.jit, static_argnames=("lb", "ub"))
def lvcsr_decode_device(
    emit_pdf: jnp.ndarray,  # (B, T, P) pre-scaled per-PDF log-likes
    state_pdf: jnp.ndarray,  # (S,) pdf index per HMM state
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (S, D)
    start: jnp.ndarray,  # (S,)
    exit_idx: jnp.ndarray,  # (U, E)
    exit_w: jnp.ndarray,
    entry_idx: jnp.ndarray,  # (Ne,)
    entry_word: jnp.ndarray,
    entry_w: jnp.ndarray,
    p1: jnp.ndarray,
    bo: jnp.ndarray,
    big_pred: jnp.ndarray,  # (V, Kb)
    big_w: jnp.ndarray,
    lb: int,
    ub: int,
):
    """Forward pass; returns per-frame junction/band records for backtrace.

    Emissions arrive indexed by PDF, not by state: at real LVCSR scale the
    state substrate runs to hundreds of thousands of states over a few
    thousand pdfs, so materializing (B, T, S) emissions is ~100x more HBM
    than the information content (and OOMs a real chip at V=20k, T=1500).
    Each scan step gathers its (B, S) frame from (B, P) instead.

    Outputs (stacked over T-1): bp_packed (B,S) uint8 — low 7 bits the
    band backpointer, bit 7 set where the LM junction won the state —
    ent_src (B,V) int8 (-1 = backoff), exit_arg (B,U) uint8, bo_arg (B,)
    i32, plus final alpha (B,S). Records are sized for DEVICE residence:
    consume them with :func:`lvcsr_backtrace_device` (fetching them to the
    host is O(T*S) bytes over the slow link). For large batches prefer
    the checkpointed pair :func:`lvcsr_decode_ckpt_device` /
    :func:`lvcsr_backtrace_ckpt_device`, whose memory does not carry the
    O(T*S) term.
    """
    D = lb + ub + 1
    assert D <= 127, "band width must fit 7 bits of the packed backpointer"
    band_cols = [band[:, j] for j in range(D)]
    step = _make_flat_fstep(
        band_cols, exit_idx.reshape(-1), exit_w, bo, big_pred, big_w, p1,
        entry_word, entry_w, entry_idx, frame_lengths, lb, ub, "records",
    )
    return _scan_chunked(step, lambda e0: start[None] + e0, emit_pdf,
                         state_pdf)


@partial(jax.jit, static_argnames=("lb", "T"))
def lvcsr_backtrace_device(
    alpha_T: jnp.ndarray,  # (B, S)
    recs,  # packed records from lvcsr_decode_device
    frame_lengths: jnp.ndarray,  # (B,)
    exit_idx: jnp.ndarray,  # (U, E)
    exit_w: jnp.ndarray,
    eos: jnp.ndarray,  # (U,)
    entry_word: jnp.ndarray,  # (Ne,)
    entry_slot_of_state: jnp.ndarray,  # (S,) slot index or -1
    big_pred: jnp.ndarray,  # (V, Kb)
    state_word: jnp.ndarray,  # (S,)
    lb: int,
    T: int = 0,  # true frame count; records may carry inert chunk padding
):
    """Backtrace as a reverse scan over the device-resident records.

    The O(T*S) per-frame records never leave the device: the traced path
    only ever *gathers* one state's record per frame, so the whole
    backtrace is a (B,)-carried reverse scan whose outputs — state path
    (B, T) i32, per-frame entered word (B, T) i32 (-1 = none), final score
    (B,) — are the only device->host traffic. Mirrors
    :func:`lvcsr_backtrace_host` decision for decision.
    """
    bp_packed, ent_src, exit_arg, bo_arg = recs
    B, S = alpha_T.shape
    Tp = bp_packed.shape[0] + 1
    T = T or Tp

    s_final, score = _flat_bt_init(alpha_T, exit_idx, exit_w, eos)
    bstep = _make_flat_bstep(
        frame_lengths, entry_slot_of_state, entry_word, big_pred, exit_idx,
        lb, B,
    )
    r_iota = jnp.arange(Tp - 1)
    _s0, (path_prev, word_at) = jax.lax.scan(
        bstep,
        s_final,
        (bp_packed, ent_src, exit_arg, bo_arg, r_iota),
        reverse=True,
    )
    # path_prev[r] = path[r] for r in [0, Tp-2]; append the final state
    path, word_at_full = _flat_bt_outputs(
        path_prev, word_at, s_final, state_word, T
    )
    return path, word_at_full, score


def _flat_bt_init(alpha_T, exit_idx, exit_w, eos):
    """Final state + score: best word exit + end-of-sentence LM weight.
    Shared by the record-based and checkpointed backtraces (their
    bit-exactness contract depends on a single implementation)."""
    B = alpha_T.shape[0]
    ex = jnp.take(alpha_T, exit_idx.reshape(-1), axis=1).reshape(
        B, *exit_idx.shape
    ) + exit_w  # (B, U, E)
    ex_best = jnp.max(ex, axis=2) + eos  # (B, U)
    u0 = jnp.argmax(ex_best, axis=1)  # (B,)
    score = jnp.take_along_axis(ex_best, u0[:, None], axis=1)[:, 0]
    e0 = jnp.argmax(
        jnp.take_along_axis(ex, u0[:, None, None], axis=1)[:, 0], axis=1
    )
    return exit_idx[u0, e0].astype(jnp.int32), score


def _make_flat_bstep(
    frame_lengths, entry_slot_of_state, entry_word, big_pred, exit_idx,
    lb, B,
):
    """One reverse-scan backtrace step over per-frame records (shared by
    both flat backtraces): carry = current state (B,), inputs =
    (bp_r, ent_r, exarg_r, boarg_r, r)."""
    rows = jnp.arange(B)

    def bstep(s, inputs):
        (bp_r, ent_r, exarg_r, boarg_r, r) = inputs
        t = r + 1
        packed = bp_r[rows, s]  # (B,) uint8
        slot = entry_slot_of_state[s]  # (B,)
        is_junc = ((packed & jnp.uint8(0x80)) != 0) & (slot >= 0)
        v = entry_word[jnp.clip(slot, 0)]  # (B,)
        k = ent_r[rows, v].astype(jnp.int32)  # (B,)
        src_u = jnp.where(k < 0, boarg_r, big_pred[v, jnp.clip(k, 0)])
        s_j = exit_idx[src_u, exarg_r[rows, src_u].astype(jnp.int32)]
        s_band = s - ((packed & jnp.uint8(0x7F)).astype(jnp.int32) - lb)
        s_new = jnp.where(is_junc, s_j.astype(jnp.int32), s_band)
        active = t < frame_lengths  # transition (t-1)->t inside utterance
        s_out = jnp.where(active, s_new, s)
        word_at_t = jnp.where(active & is_junc, v.astype(jnp.int32), -1)
        return s_out, (s_out, word_at_t)

    return bstep


def _flat_bt_outputs(path_prev, word_at, s_final, state_word, T):
    """Assemble (path, word_at, ) outputs from the reverse scan's stacked
    ys; slices off any inert chunk padding past ``T``."""
    path = jnp.concatenate(
        [jnp.moveaxis(path_prev, 0, 1), s_final[:, None]], axis=1
    )  # (B, Tp)
    # word entered at frame 0 is the start state's word (if any)
    w0 = state_word[path[:, 0]].astype(jnp.int32)
    word0 = jnp.where(w0 >= 0, w0, -1)
    word_at_full = jnp.concatenate(
        [word0[:, None], jnp.moveaxis(word_at, 0, 1)], axis=1
    )  # (B, Tp): word entered AT each frame (-1 = none)
    return path[:, :T], word_at_full[:, :T]


@partial(jax.jit, static_argnames=("lb", "ub"))
def lvcsr_decode_ckpt_device(
    emit_pdf: jnp.ndarray,  # (B, T, P) pre-scaled per-PDF log-likes
    state_pdf: jnp.ndarray,  # (S,)
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (S, D)
    start: jnp.ndarray,  # (S,)
    exit_idx: jnp.ndarray,  # (U, E)
    exit_w: jnp.ndarray,
    entry_idx: jnp.ndarray,  # (Ne,)
    entry_word: jnp.ndarray,
    entry_w: jnp.ndarray,
    p1: jnp.ndarray,
    bo: jnp.ndarray,
    big_pred: jnp.ndarray,  # (V, Kb)
    big_w: jnp.ndarray,
    lb: int,
    ub: int,
):
    """Checkpointed forward pass (the at-scale production path).

    Stores alpha once per _EMIT_TC-frame chunk plus the small per-frame
    junction records — NOT the (B, S) band backpointers — so per-row
    device memory drops from O(T*S) to O(T*S/TC + T*(V+U)). That ~TC-fold
    cut is what lets the batch dimension grow enough to amortize the
    per-frame junction, whose gathers are batch-size-independent (they
    run once per scan step, shared by every row).
    :func:`lvcsr_backtrace_ckpt_device` re-runs each chunk's forward from
    its checkpoint to regenerate the backpointers chunk-locally —
    deterministic ops on identical inputs reproduce every decision
    bit-exactly.

    Returns ``(alpha_T (B,S), ckpts (NC,B,S) — alpha entering each chunk,
    recs)`` with recs leaves shaped (NC, TC, B, ...) for the chunked
    backtrace.
    """
    D = lb + ub + 1
    assert D <= 127, "band width must fit 7 bits of the packed backpointer"
    band_cols = [band[:, j] for j in range(D)]
    S = state_pdf.shape[0]
    mat = _emit_chunker(state_pdf, emit_pdf.shape[2], S)
    ep, t0s, NC = _chunk_pdf_frames(emit_pdf, _EMIT_TC)
    step = _make_flat_fstep(
        band_cols, exit_idx.reshape(-1), exit_w, bo, big_pred, big_w, p1,
        entry_word, entry_w, entry_idx, frame_lengths, lb, ub, "ckpt",
    )

    def chunk_step(alpha, inputs):
        echunk, t0 = inputs
        alpha_new, recs = jax.lax.scan(
            step, alpha, (mat(echunk), t0 + jnp.arange(_EMIT_TC))
        )
        return alpha_new, (alpha, recs)  # checkpoint = alpha ENTERING chunk

    alpha0 = start[None] + mat(jnp.moveaxis(emit_pdf[:, :1], 0, 1))[0]
    alpha_T, (ckpts, recs) = jax.lax.scan(chunk_step, alpha0, (ep, t0s))
    return alpha_T, ckpts, recs


@partial(jax.jit, static_argnames=("lb", "ub", "T"))
def lvcsr_backtrace_ckpt_device(
    alpha_T: jnp.ndarray,  # (B, S)
    ckpts: jnp.ndarray,  # (NC, B, S)
    recs,  # junction records, leaves (NC, TC, B, ...)
    emit_pdf: jnp.ndarray,  # (B, T, P) — re-expanded per chunk
    state_pdf: jnp.ndarray,  # (S,)
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (S, D)
    exit_idx: jnp.ndarray,  # (U, E)
    exit_w: jnp.ndarray,
    eos: jnp.ndarray,  # (U,)
    entry_idx: jnp.ndarray,  # (Ne,)
    entry_word: jnp.ndarray,  # (Ne,)
    entry_w: jnp.ndarray,
    p1: jnp.ndarray,
    bo: jnp.ndarray,
    big_pred: jnp.ndarray,  # (V, Kb)
    big_w: jnp.ndarray,
    entry_slot_of_state: jnp.ndarray,  # (S,)
    state_word: jnp.ndarray,  # (S,)
    lb: int,
    ub: int,
    T: int,
):
    """Backtrace for :func:`lvcsr_decode_ckpt_device`: chunks are visited
    last-to-first; each re-runs its forward from the stored checkpoint
    (regenerating the packed band backpointers for its TC frames only —
    O(TC*B*S) transient), then reverse-scans them exactly like
    :func:`lvcsr_backtrace_device`. Outputs are identical to the
    record-based pair (pinned by tests)."""
    B, S = alpha_T.shape
    D = lb + ub + 1
    assert D <= 127, "band width must fit 7 bits of the packed backpointer"
    band_cols = [band[:, j] for j in range(D)]
    exit_flat = exit_idx.reshape(-1)
    mat = _emit_chunker(state_pdf, emit_pdf.shape[2], S)
    ep, t0s, NC = _chunk_pdf_frames(emit_pdf, _EMIT_TC)

    s_final, score = _flat_bt_init(alpha_T, exit_idx, exit_w, eos)
    bstep = _make_flat_bstep(
        frame_lengths, entry_slot_of_state, entry_word, big_pred, exit_idx,
        lb, B,
    )
    fstep = _make_flat_fstep(
        band_cols, exit_flat, exit_w, bo, big_pred, big_w, p1,
        entry_word, entry_w, entry_idx, frame_lengths, lb, ub, "bp_only",
    )

    def chunk_bt(s, inputs):
        ck, echunk, (entr, exar, boar), t0 = inputs
        _a, bp_chunk = jax.lax.scan(
            fstep, ck, (mat(echunk), t0 + jnp.arange(_EMIT_TC))
        )
        return jax.lax.scan(
            bstep,
            s,
            (bp_chunk, entr, exar, boar, t0 - 1 + jnp.arange(_EMIT_TC)),
            reverse=True,
        )

    _s0, (path_prev, word_at) = jax.lax.scan(
        chunk_bt, s_final, (ckpts, ep, recs, t0s), reverse=True
    )
    path_prev = path_prev.reshape(NC * _EMIT_TC, B)
    word_at = word_at.reshape(NC * _EMIT_TC, B)
    path, word_at_full = _flat_bt_outputs(
        path_prev, word_at, s_final, state_word, T
    )
    return path, word_at_full, score


# ---------------------------------------------------------------------------
# Cross-word triphone context (context-classed junction)
# ---------------------------------------------------------------------------
# With a triphone tree, the pdfs of a word's first/last phone depend on the
# neighboring word. The word-internal LvcsrGraph assumes silence at word
# boundaries; this variant is exact: word HMMs are expanded per cross-word
# context group (the C transducer, same machinery as the dense decoder's
# ``_expand_variant``), and the junction is factored through context classes:
#
#   exit side   "cells" (word u, presented phone p, right-group rg): the best
#               score over u's exit states that assume a next-first-phone in
#               rg and present p (= u's last phone, or silence after the
#               absorbed trailing-silence block) to the next word,
#   entry side  slots (word v, left-group lset, first phone f): entered from
#               any cell with p in lset and f in rg.
#
# Per frame: cell pooling O(cells * exits), one backoff segment-max over
# (P x RG), a masked (P x RG x F) reduction, and per-slot gathers over seen
# bigrams — O(cells + slots * preds), never O(V^2).


@dataclass
class LvcsrXwGraph:
    """Host arrays for the cross-word (context-exact) junction decoder."""

    words: List[str]
    state_pdf: np.ndarray  # (S,)
    state_word: np.ndarray  # (S,)
    state_phone: np.ndarray  # (S,)
    band: np.ndarray  # (S, D)
    lb: int
    ub: int
    start: np.ndarray  # (S,)
    # cells
    cell_exit_idx: np.ndarray  # (Nc, Em)
    cell_exit_w: np.ndarray  # (Nc, Em)
    bo_cell: np.ndarray  # (Nc,) backoff weight of each cell's history
    cell_seg: np.ndarray  # (Nc,) = p * RG + rg
    rg_mask: np.ndarray  # (RG, F) bool: right-group contains first-phone f
    num_p: int  # P presented-phone classes
    # entry slots
    entry_state: np.ndarray  # (Ne,)
    entry_word: np.ndarray  # (Ne,)
    entry_w: np.ndarray  # (Ne,) pronunciation log-prob - insertion penalty
    ebo_idx: np.ndarray  # (Ne, Lm) flat p*F + f backoff sources
    ebo_pad: np.ndarray  # (Ne, Lm) 0 / NEG_INF padding
    p1e: np.ndarray  # (Ne,) scaled unigram of the slot's word
    se_cell: np.ndarray  # (Ne, Q) seen-bigram source cell per candidate
    se_w: np.ndarray  # (Ne, Q) scaled bigram log-prob (NEG_INF pad)
    # finals
    fin_state: np.ndarray  # (Nf,)
    fin_w: np.ndarray  # (Nf,) exit weight + scaled eos

    @property
    def num_states(self) -> int:
        return len(self.state_pdf)

    @property
    def state0_hash(self) -> np.ndarray:
        return np.where(self.state_word >= 0, self.state_word + 1, 0).astype(
            np.uint32
        )

    @property
    def entry_slot_of_state(self) -> np.ndarray:
        """(S,) dense inverse of ``entry_state`` (see
        :meth:`LvcsrGraph.entry_slot_of_state`)."""
        arr = np.full(self.num_states, -1, np.int32)
        arr[np.asarray(self.entry_state, np.int64)] = np.arange(
            len(self.entry_state), dtype=np.int32
        )
        return arr

    def kbest_arrays(self) -> dict:
        """Static index tables for the K-best junction (computed once):
        ``seg_cells (Nseg, Cs)`` + ``seg_pad`` — the cells of each
        (presented-phone, right-group) backoff segment; ``ebo_seg (Ne, Lsg)``
        + ``ebo_seg_pad`` — each entry slot's compatible backoff segments
        (p in the slot's left classes, right-group containing its first
        phone)."""
        if getattr(self, "_kbest", None) is not None:
            return self._kbest
        RG, F = self.rg_mask.shape
        Nseg = self.num_p * RG
        by_seg: Dict[int, List[int]] = {}
        for c, seg in enumerate(self.cell_seg):
            by_seg.setdefault(int(seg), []).append(c)
        Cs = max(1, max((len(v) for v in by_seg.values()), default=1))
        seg_cells = np.zeros((Nseg, Cs), np.int32)
        seg_pad = np.full((Nseg, Cs), NEG_INF, np.float32)
        for seg, cells in by_seg.items():
            for j, c in enumerate(cells):
                seg_cells[seg, j] = c
                seg_pad[seg, j] = 0.0
        ebo_seg_lists: List[List[int]] = []
        for e in range(len(self.entry_state)):
            segs: List[int] = []
            for l in range(self.ebo_idx.shape[1]):
                if self.ebo_pad[e, l] <= NEG_INF / 2:
                    continue
                pf = int(self.ebo_idx[e, l])
                p, f = pf // F, pf % F
                for rg in range(RG):
                    if self.rg_mask[rg, f] and (p * RG + rg) in by_seg:
                        segs.append(p * RG + rg)
            ebo_seg_lists.append(segs)
        Lsg = max(1, max(len(s) for s in ebo_seg_lists))
        ebo_seg = np.zeros((len(ebo_seg_lists), Lsg), np.int32)
        ebo_seg_pad = np.full((len(ebo_seg_lists), Lsg), NEG_INF, np.float32)
        for e, segs in enumerate(ebo_seg_lists):
            for j, sgi in enumerate(segs):
                ebo_seg[e, j] = sgi
                ebo_seg_pad[e, j] = 0.0
        object.__setattr__(
            self,
            "_kbest",
            dict(
                seg_cells=seg_cells,
                seg_pad=seg_pad,
                ebo_seg=ebo_seg,
                ebo_seg_pad=ebo_seg_pad,
            ),
        )
        return self._kbest


def _build_cross_word(self) -> LvcsrXwGraph:
    """Cross-word-context LVCSR graph (see module notes above). Bound as
    ``LvcsrGraphCompiler._build_cross_word``."""
    from montreal_forced_aligner_tpu.graph.compiler import batch_graphs
    from montreal_forced_aligner_tpu.ops.viterbi import band_from_arcs

    lex, lm, comp = self.lexicon, self.lm, self.comp
    g = _GraphBuilder()
    sil = lex.phone_id(lex.silence_phone, None)
    EPS = 0
    scale = self.lm_scale * LN10
    vocab = [w for w in lm.vocab if w in lex.words]
    if not vocab:
        raise ValueError("no LM words found in the lexicon")
    V = len(vocab)

    prons: List[List[Tuple[List[int], float, float]]] = []
    first_phones, last_phones = set(), set()
    for word in vocab:
        rows = []
        for pron in lex.words[word]:
            if lex.position_dependent:
                pids = lex.pronunciation_phone_ids(pron.phones)
            else:
                pids = [lex.phone_id(p, None) for p in pron.phones]
            prob = pron.probability if pron.probability is not None else 1.0
            pron_lp = (
                math.log(max(min(prob, 1.0), 1e-5))
                - self.word_insertion_penalty
            )
            p_sil = (
                pron.silence_after_probability
                if pron.silence_after_probability is not None
                else lex.silence_probability
            )
            rows.append((pids, pron_lp, p_sil))
            first_phones.add(pids[0])
            last_phones.add(pids[-1])
        prons.append(rows)
    fclasses = sorted(first_phones)
    F = len(fclasses)
    f_index = {p: i for i, p in enumerate(fclasses)}
    pclasses = sorted(last_phones | {sil})
    P = len(pclasses)
    p_index = {p: i for i, p in enumerate(pclasses)}

    # EARLY budget gate, before the expensive context expansion: cheap
    # lower bounds on the decode-record sizes (S >= the word-internal
    # state count — every variant keeps at least one copy of each phone —
    # Ne >= one entry slot per pronunciation, Nc >= V cells, RG >= 1).
    # These can only under-estimate, so a refusal here is always correct;
    # the exact gate after expansion still runs for graphs that pass.
    nominal_T = self.nominal_frames or 3000  # default: 30 s at 10 ms shift
    S_lb, NP = 0, 0
    for rows in prons:
        for pids, _lp, _ps in rows:
            NP += 1
            n = len(pids)
            for k, ph in enumerate(pids):
                l = pids[k - 1] if k > 0 else sil
                r = pids[k + 1] if k < n - 1 else sil
                S_lb += comp._phone_plan(comp._window(l, ph, r))["n_emit"]
    per_row_lb = xw_ckpt_bytes_per_row(S_lb, NP, V, 0, P, F, 1, nominal_T)
    if per_row_lb > _REC_BUDGET:
        raise ValueError(
            f"cross-word expansion too large to decode (pre-expansion "
            f"bound): >= {per_row_lb / 1e9:.1f} GB of checkpoints+records "
            f"per {nominal_T / 100:.0f} s utterance (S >= {S_lb}, entry "
            f"slots >= {NP}) exceeds the {_REC_BUDGET / 1e9:.1f} GB "
            f"budget (MFA_TPU_LVCSR_REC_BYTES)"
        )
    lefts_all = sorted({EPS, sil} | last_phones)
    rights_all = sorted({EPS, sil} | first_phones)
    sil_rights = sorted({EPS} | first_phones)

    rg_sets: Dict[frozenset, int] = {}

    def rg_of(rset) -> int:
        key = frozenset(rset) & first_phones
        if not key:
            return -1
        return rg_sets.setdefault(key, len(rg_sets))

    # (u_row, p_idx, rg) -> [(state, weight)]; u_row V = initial silence <s>
    cell_map: Dict[Tuple[int, int, int], List[Tuple[int, float]]] = {}

    def add_exits(u_row, p_phone, rset, exits, extra_w=0.0):
        rg = rg_of(rset)
        if rg < 0:
            return
        lst = cell_map.setdefault((u_row, p_index[p_phone], rg), [])
        for s, w, _tid in exits:
            lst.append((s, w + extra_w))

    finals: List[Tuple[int, float, int]] = []  # (state, weight, u_row)
    # entry slots: (state, word, f_idx, entry_w, lset)
    entries: List[Tuple[int, int, int, float, frozenset]] = []
    for w_idx in range(V):
        for pids, pron_lp, p_sil in prons[w_idx]:
            skip_lp = _safe_log(max(1.0 - p_sil, 1e-5))
            sil_lp = _safe_log(max(p_sil, 1e-5))
            branches = comp._expand_variant(
                g, pids, w_idx, lefts_all, rights_all, group_lefts=True
            )
            seen_entry = set()
            for br in branches:
                if br["entry"] not in seen_entry:
                    seen_entry.add(br["entry"])
                    entries.append(
                        (br["entry"], w_idx, f_index[pids[0]], pron_lp,
                         br["lset"])
                    )
            sil_groups = comp._expand_single(g, sil, -1, pids[-1], sil_rights)
            # distinct exit groups (n>=2 branches share their exits object)
            exit_groups = {
                id(br["exits"]): (br["rset"], br["exits"]) for br in branches
            }
            for rset, exits in exit_groups.values():
                add_exits(w_idx, pids[-1], rset, exits, extra_w=skip_lp)
                if EPS in rset:
                    finals.extend((s, w + skip_lp, w_idx) for s, w, _t in exits)
                if sil in rset:
                    for _srs, sentry, _sx in sil_groups:
                        for s, w, tid in exits:
                            g.add_arc(s, sentry, w + sil_lp, tid)
            for srs, _sentry, sexits in sil_groups:
                add_exits(w_idx, sil, srs, sexits)
                if EPS in srs:
                    finals.extend((s, w, w_idx) for s, w, _t in sexits)

    # initial silence (history <s> = row V)
    init_groups = comp._expand_single(g, sil, -1, EPS, sil_rights)
    p_init = lex.initial_silence_probability
    for srs, sentry, sexits in init_groups:
        g.add_start(sentry, _safe_log(p_init))
        add_exits(V, sil, srs, sexits)
        if EPS in srs:
            finals.extend((s, w, V) for s, w, _t in sexits)

    graph = g.finish(vocab)
    garrs = batch_graphs([graph], state_multiple=1)
    band_out = band_from_arcs(garrs)
    if band_out is None:
        raise ValueError("cross-word arcs exceed band buckets")
    band_np, lb, ub = band_out
    S = graph.num_states

    start = np.full(S, NEG_INF, np.float32)
    start[:] = graph.start
    start_lp = _safe_log(1.0 - p_init)
    for st, w_idx, _f, pron_lp, lset in entries:
        if EPS in lset:
            lm_lp = scale * lm.log_prob(vocab[w_idx], ("<s>",))
            start[st] = max(start[st], start_lp + lm_lp + pron_lp)

    # LM rows (shared helper with the word-internal builder)
    p1, bo_row, eos_row, preds = _lm_rows(lm, vocab, scale)

    # cells
    RG = max(1, len(rg_sets))
    cell_keys = sorted(cell_map)
    Nc = len(cell_keys)
    Em = max(len(v) for v in cell_map.values())
    cell_exit_idx = np.zeros((Nc, Em), np.int32)
    cell_exit_w = np.full((Nc, Em), NEG_INF, np.float32)
    bo_cell = np.zeros(Nc, np.float32)
    cell_seg = np.zeros(Nc, np.int32)
    cell_lookup: Dict[Tuple[int, int, int], int] = {}
    for c, key in enumerate(cell_keys):
        u_row, p_idx, rg = key
        cell_lookup[key] = c
        for j, (s, w) in enumerate(cell_map[key]):
            cell_exit_idx[c, j] = s
            cell_exit_w[c, j] = w
        bo_cell[c] = bo_row[u_row]
        cell_seg[c] = p_idx * RG + rg
    rg_mask = np.zeros((RG, F), bool)
    for key, rg in rg_sets.items():
        for ph in key:
            rg_mask[rg, f_index[ph]] = True

    # per-word cell index (u_row -> cells) for seen-bigram candidates
    cells_of: Dict[int, List[int]] = {}
    for key, c in cell_lookup.items():
        cells_of.setdefault(key[0], []).append(c)

    Ne = len(entries)
    entry_state = np.asarray([e[0] for e in entries], np.int32)
    if len(np.unique(entry_state)) != Ne:
        raise ValueError("entry states are not unique")
    entry_word = np.asarray([e[1] for e in entries], np.int32)
    entry_w = np.asarray([e[3] for e in entries], np.float32)
    p1e = p1[entry_word]
    # backoff source classes per slot
    ebo_lists = []
    se_lists: List[List[Tuple[int, float]]] = []
    for st, w_idx, f_idx, _plp, lset in entries:
        # slots whose left group has no junction-presentable class (e.g. an
        # EPS-only group) are start-only: no backoff sources, no seen-bigram
        # candidates — entering them mid-utterance would apply
        # utterance-initial context pdfs to an interior word
        pcl = sorted(p_index[p] for p in lset if p in p_index)
        ebo_lists.append((pcl, f_idx))
        cand: List[Tuple[int, float]] = []
        pset = set(pcl)
        for u, lp in preds[w_idx]:
            for c in cells_of.get(u, []):
                _u, p_idx2, rg = cell_keys[c]
                if p_idx2 in pset and rg_mask[rg, f_idx]:
                    cand.append((c, lp))
        se_lists.append(cand)
    Lm = max(1, max(len(p) for p, _f in ebo_lists))
    ebo_idx = np.zeros((Ne, Lm), np.int32)
    ebo_pad = np.full((Ne, Lm), NEG_INF, np.float32)
    for e, (pcl, f_idx) in enumerate(ebo_lists):
        for j, p_idx2 in enumerate(pcl):
            ebo_idx[e, j] = p_idx2 * F + f_idx
            ebo_pad[e, j] = 0.0
    Q = max(1, max(len(c) for c in se_lists))
    se_cell = np.zeros((Ne, Q), np.int32)
    se_w = np.full((Ne, Q), NEG_INF, np.float32)
    for e, cand in enumerate(se_lists):
        for j, (c, lp) in enumerate(cand):
            se_cell[e, j] = c
            se_w[e, j] = lp

    fin_state = np.asarray([f[0] for f in finals], np.int32)
    fin_w = np.asarray(
        [w + eos_row[u] for _s, w, u in finals], np.float32
    )

    # the checkpointed decoder's per-row memory (alpha checkpoints +
    # emissions + one chunk's transient records) must fit the HBM budget
    # at B=1 for a realistic utterance; a context expansion past that
    # point cannot decode at all, so fall back (via build()'s ValueError
    # handler) to the word-internal graph rather than OOM at decode time.
    # Uses the corpus's real max utterance length when the caller provided
    # it (Transcriber does), else the nominal 30 s; the transcriber's
    # split additionally warns when an actual batch exceeds the budget
    # even at one row.
    S_xw = len(garrs["state_pdf"][0])
    P_pdf = int(garrs["state_pdf"][0].max()) + 1
    per_row = xw_ckpt_bytes_per_row(S_xw, Ne, Nc, P_pdf, P, F, RG, nominal_T)
    if per_row > _REC_BUDGET:
        raise ValueError(
            f"cross-word expansion too large to decode: "
            f"{per_row / 1e9:.1f} GB of checkpoints+records per "
            f"{nominal_T / 100:.0f} s utterance (S={S_xw}, entry "
            f"slots={Ne}) exceeds the "
            f"{_REC_BUDGET / 1e9:.1f} GB budget (MFA_TPU_LVCSR_REC_BYTES)"
        )

    return LvcsrXwGraph(
        words=vocab,
        state_pdf=garrs["state_pdf"][0],
        state_word=garrs["state_word"][0],
        state_phone=garrs["state_phone"][0],
        band=band_np[0],
        lb=lb,
        ub=ub,
        start=start,
        cell_exit_idx=cell_exit_idx,
        cell_exit_w=cell_exit_w,
        bo_cell=bo_cell,
        cell_seg=cell_seg,
        rg_mask=rg_mask,
        num_p=P,
        entry_state=entry_state,
        entry_word=entry_word,
        entry_w=entry_w,
        ebo_idx=ebo_idx,
        ebo_pad=ebo_pad,
        p1e=p1e,
        se_cell=se_cell,
        se_w=se_w,
        fin_state=fin_state,
        fin_w=fin_w,
    )


LvcsrGraphCompiler._build_cross_word = _build_cross_word


def _make_xw_fstep(
    band_cols, exit_flat, cell_exit_w, bo_cell, cell_seg, rg_mask,
    entry_state, entry_w, ebo_idx, ebo_pad, p1e, se_cell, se_w,
    frame_lengths, lb, ub, P, mode: str,
):
    """One cross-word forward step; single implementation for
    ``mode="records"`` (full per-frame records — the record-based decode
    AND the checkpointed backtrace's chunk recompute) and ``"ckpt"`` (no
    per-frame outputs — the checkpointed decode). The bit-exactness
    contract between the pairs rests on this being the only copy of the
    recursion."""
    D = lb + ub + 1
    Em = cell_exit_w.shape[1]
    Nc = cell_exit_w.shape[0]
    RG, F = rg_mask.shape
    Ne = entry_state.shape[0]
    iota_c = jnp.arange(Nc, dtype=jnp.int32)
    with_args = mode == "records"

    def junction(alpha_prev):
        B = alpha_prev.shape[0]
        exv = jnp.take(alpha_prev, exit_flat, axis=1).reshape(B, Nc, Em)
        exv = exv + cell_exit_w
        EX = jnp.max(exv, axis=2)  # (B, Nc)
        # backoff: segment max over (p, rg) cells, then mask-reduce to (P,F)
        BOc = EX + bo_cell
        BO2 = jnp.full((B, P * RG), NEG_INF).at[:, cell_seg].max(BOc)
        BO2r = BO2.reshape(B, P, RG)
        brf = jnp.where(
            rg_mask[None, None], BO2r[:, :, :, None], NEG_INF
        )  # (B, P, RG, F)
        BOF = jnp.max(brf, axis=2)  # (B, P, F)
        ent_bo_c = BOF.reshape(B, P * F)[:, ebo_idx.reshape(-1)].reshape(
            B, Ne, -1
        ) + ebo_pad
        ent_bo = jnp.max(ent_bo_c, axis=2) + p1e
        se = EX[:, se_cell.reshape(-1)].reshape(B, Ne, -1) + se_w
        ent_seen = jnp.max(se, axis=2)
        ent = jnp.maximum(ent_seen, ent_bo) + entry_w
        if not with_args:
            return ent, None, None, None, None, None
        cell_arg = jnp.argmax(exv, axis=2).astype(jnp.uint8)
        winner = jnp.where(BOc >= BO2[:, cell_seg], iota_c, -1)
        BO2arg = (
            jnp.full((B, P * RG), -1, jnp.int32).at[:, cell_seg].max(winner)
        )
        BOFarg = jnp.argmax(brf, axis=2).astype(jnp.int16)
        ent_l = jnp.argmax(ent_bo_c, axis=2).astype(jnp.uint8)
        ent_q = jnp.argmax(se, axis=2).astype(jnp.int32)
        ent_src = jnp.where(ent_seen >= ent_bo, ent_q, -1)
        return ent, ent_src, ent_l, cell_arg, BOFarg, BO2arg

    def step(alpha_prev, inputs):
        emit_t, t = inputs  # emit_t: (B, S), pre-expanded per chunk
        S = alpha_prev.shape[1]
        ap = jnp.pad(alpha_prev, ((0, 0), (ub, lb)), constant_values=NEG_INF)
        m = jnp.full_like(alpha_prev, NEG_INF)
        bp = jnp.zeros(alpha_prev.shape, jnp.uint8)
        for j in range(D):
            d = j - lb
            c = ap[:, ub - d : ub - d + S] + band_cols[j]
            take = c > m
            m = jnp.where(take, c, m)
            bp = jnp.where(take, jnp.uint8(j), bp)
        ent, ent_src, ent_l, cell_arg, BOFarg, BO2arg = junction(alpha_prev)
        m2 = m.at[:, entry_state].max(ent)
        alpha_new = m2 + emit_t
        active = (t < frame_lengths)[:, None]
        alpha_out = jnp.where(active, alpha_new, alpha_prev)
        if not with_args:
            return alpha_out, None
        # junction-won flag per ENTRY SLOT (B, Ne) — not packed into bit 7
        # of the backpointer byte: wide cross-word bands (bucket (16,128),
        # D=145) need the full u8 range, and the flag-bit scheme capped
        # decodable graphs at D<=127
        jwin = ent > jnp.take(m, entry_state, axis=1)
        return alpha_out, (bp, jwin, ent_src, ent_l, cell_arg, BOFarg,
                           BO2arg)

    return step


@partial(jax.jit, static_argnames=("lb", "ub", "P"))
def lvcsr_xw_decode_device(
    emit_pdf: jnp.ndarray,  # (B, T, Np) pre-scaled per-PDF log-likes
    state_pdf: jnp.ndarray,  # (S,) pdf index per HMM state
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (S, D)
    start: jnp.ndarray,  # (S,)
    cell_exit_idx: jnp.ndarray,  # (Nc, Em)
    cell_exit_w: jnp.ndarray,
    bo_cell: jnp.ndarray,  # (Nc,)
    cell_seg: jnp.ndarray,  # (Nc,)
    rg_mask: jnp.ndarray,  # (RG, F) bool
    entry_state: jnp.ndarray,  # (Ne,)
    entry_w: jnp.ndarray,
    ebo_idx: jnp.ndarray,  # (Ne, Lm)
    ebo_pad: jnp.ndarray,
    p1e: jnp.ndarray,  # (Ne,)
    se_cell: jnp.ndarray,  # (Ne, Q)
    se_w: jnp.ndarray,
    lb: int,
    ub: int,
    P: int,
):
    """Record-based forward pass of the cross-word junction decoder.
    Returns final alpha plus per-frame records (raw u8 band backpointers,
    a (B, Ne) junction-won bitmap, and the junction argmaxes) for
    :func:`lvcsr_xw_backtrace_device` / :func:`lvcsr_xw_backtrace_host`
    (reference pair). Production at scale is the checkpointed pair
    :func:`lvcsr_xw_decode_ckpt_device` /
    :func:`lvcsr_xw_backtrace_ckpt_device`, whose memory carries no O(T*S)
    term. Emissions arrive per-PDF and are gathered to states per frame
    (see :func:`lvcsr_decode_device`)."""
    D = lb + ub + 1
    assert D <= 255, "band width must fit the u8 backpointer"
    band_cols = [band[:, j] for j in range(D)]
    step = _make_xw_fstep(
        band_cols, cell_exit_idx.reshape(-1), cell_exit_w, bo_cell,
        cell_seg, rg_mask, entry_state, entry_w, ebo_idx, ebo_pad, p1e,
        se_cell, se_w, frame_lengths, lb, ub, P, "records",
    )
    return _scan_chunked(step, lambda e0: start[None] + e0, emit_pdf,
                         state_pdf)


@partial(jax.jit, static_argnames=("lb", "ub", "P"))
def lvcsr_xw_decode_ckpt_device(
    e0: jnp.ndarray,  # (B, Np) frame-0 pdf emissions (split_emissions)
    ep: jnp.ndarray,  # (NC, TC, B, Np) chunked frames 1..T-1
    state_pdf: jnp.ndarray,  # (S,)
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (S, D)
    start: jnp.ndarray,  # (S,)
    cell_exit_idx: jnp.ndarray,  # (Nc, Em)
    cell_exit_w: jnp.ndarray,
    bo_cell: jnp.ndarray,
    cell_seg: jnp.ndarray,
    rg_mask: jnp.ndarray,
    entry_state: jnp.ndarray,
    entry_w: jnp.ndarray,
    ebo_idx: jnp.ndarray,
    ebo_pad: jnp.ndarray,
    p1e: jnp.ndarray,
    se_cell: jnp.ndarray,
    se_w: jnp.ndarray,
    lb: int,
    ub: int,
    P: int,
):
    """Checkpointed cross-word forward pass (the at-scale production path,
    same scheme as the position-major flat decode): stores ONLY the alpha
    checkpoint entering each _XW_TC-frame chunk — no per-frame records —
    so per-row device memory drops from O(T*(S + Ne + Nc + P*(F+RG))) to
    O(T*S/TC). :func:`lvcsr_xw_backtrace_ckpt_device` regenerates every
    record chunk-locally. Returns ``(alpha_T (B,S), ckpts (NC,B,S))``."""
    D = lb + ub + 1
    assert D <= 255, "band width must fit the u8 backpointer"
    S = state_pdf.shape[0]
    band_cols = [band[:, j] for j in range(D)]
    NC = ep.shape[0]
    mat = _emit_chunker(state_pdf, ep.shape[3], S)
    t0s = 1 + jnp.arange(NC) * _XW_TC
    step = _make_xw_fstep(
        band_cols, cell_exit_idx.reshape(-1), cell_exit_w, bo_cell,
        cell_seg, rg_mask, entry_state, entry_w, ebo_idx, ebo_pad, p1e,
        se_cell, se_w, frame_lengths, lb, ub, P, "ckpt",
    )

    def chunk_step(alpha, inputs):
        echunk, t0 = inputs
        alpha_new, _ = jax.lax.scan(
            step, alpha, (mat(echunk), t0 + jnp.arange(_XW_TC))
        )
        return alpha_new, alpha  # checkpoint = alpha ENTERING chunk

    alpha0 = start[None] + mat(e0[None])[0]
    alpha_T, ckpts = jax.lax.scan(chunk_step, alpha0, (ep, t0s))
    return alpha_T, ckpts


@partial(jax.jit, static_argnames=("lb", "F", "RG", "T"))
def lvcsr_xw_backtrace_device(
    alpha_T: jnp.ndarray,  # (B, S)
    recs,  # packed records from lvcsr_xw_decode_device
    frame_lengths: jnp.ndarray,  # (B,)
    fin_state: jnp.ndarray,  # (Kf,)
    fin_w: jnp.ndarray,  # (Kf,)
    entry_word_arr: jnp.ndarray,  # (Ne,)
    entry_slot_of_state: jnp.ndarray,  # (S,) slot index or -1
    se_cell: jnp.ndarray,  # (Ne, Q)
    ebo_idx: jnp.ndarray,  # (Ne, Lm)
    cell_exit_idx: jnp.ndarray,  # (Nc, Em)
    state_word: jnp.ndarray,  # (S,)
    lb: int,
    F: int,
    RG: int,
    T: int = 0,  # true frame count; records may carry inert chunk padding
):
    """Cross-word backtrace as a device reverse scan (see
    :func:`lvcsr_backtrace_device` — same scheme: the O(T * S/Nc/Ne)
    records stay on device; only (path, entered-word, score) transfer).
    Mirrors :func:`lvcsr_xw_backtrace_host` decision for decision."""
    bp_raw = recs[0]
    B, S = alpha_T.shape
    Tp = bp_raw.shape[0] + 1
    T = T or Tp
    s_final, score = _xw_bt_init(alpha_T, fin_state, fin_w)
    bstep = _make_xw_bstep(
        frame_lengths, entry_word_arr, entry_slot_of_state, se_cell,
        ebo_idx, cell_exit_idx, lb, F, RG, B,
    )
    r_iota = jnp.arange(Tp - 1)
    _s0, (path_prev, word_at) = jax.lax.scan(
        bstep, s_final, recs + (r_iota,), reverse=True
    )
    path, word_at_full = _xw_bt_outputs(
        path_prev, word_at, s_final, state_word, T
    )
    return path, word_at_full, score


def _xw_bt_init(alpha_T, fin_state, fin_w):
    """Final state + score (best final exit + </s> weight); shared by the
    record-based and checkpointed cross-word backtraces."""
    B = alpha_T.shape[0]
    fin = jnp.take(alpha_T, fin_state, axis=1) + fin_w  # (B, Kf)
    k0 = jnp.argmax(fin, axis=1)
    score = jnp.take_along_axis(fin, k0[:, None], axis=1)[:, 0]
    return fin_state[k0].astype(jnp.int32), score


def _make_xw_bstep(
    frame_lengths, entry_word_arr, entry_slot_of_state, se_cell, ebo_idx,
    cell_exit_idx, lb, F, RG, B,
):
    """One reverse-scan cross-word backtrace step (shared by the
    record-based and checkpointed backtraces): carry = current state (B,),
    inputs = (bp_r, jwin_r, entsrc_r, entl_r, cellarg_r, bofarg_r,
    bo2arg_r, r)."""
    rows = jnp.arange(B)

    def bstep(s, inputs):
        (bp_r, jwin_r, entsrc_r, entl_r, cellarg_r, bofarg_r, bo2arg_r,
         r) = inputs
        t = r + 1
        bpv = bp_r[rows, s]
        slot = entry_slot_of_state[s]
        e = jnp.clip(slot, 0)
        is_junc = (slot >= 0) & jwin_r[rows, e]
        q = entsrc_r[rows, e].astype(jnp.int32)
        cell_seen = se_cell[e, jnp.clip(q, 0)]
        pf = ebo_idx[e, entl_r[rows, e].astype(jnp.int32)]
        p, f = pf // F, pf % F
        rg = bofarg_r[rows, p, f].astype(jnp.int32)
        cell_bo = bo2arg_r[rows, p * RG + rg]
        cell = jnp.where(q >= 0, cell_seen, cell_bo).astype(jnp.int32)
        s_j = cell_exit_idx[cell, cellarg_r[rows, cell].astype(jnp.int32)]
        s_band = s - (bpv.astype(jnp.int32) - lb)
        s_new = jnp.where(is_junc, s_j.astype(jnp.int32), s_band)
        active = t < frame_lengths
        s_out = jnp.where(active, s_new, s)
        word_at_t = jnp.where(
            active & is_junc, entry_word_arr[e].astype(jnp.int32), -1
        )
        return s_out, (s_out, word_at_t)

    return bstep


def _xw_bt_outputs(path_prev, word_at, s_final, state_word, T):
    """Assemble (path, word_at) from the reverse scan's stacked ys; shared
    by the record-based and checkpointed cross-word backtraces."""
    path = jnp.concatenate(
        [jnp.moveaxis(path_prev, 0, 1), s_final[:, None]], axis=1
    )
    w0 = state_word[path[:, 0]].astype(jnp.int32)
    word0 = jnp.where(w0 >= 0, w0, -1)
    word_at_full = jnp.concatenate(
        [word0[:, None], jnp.moveaxis(word_at, 0, 1)], axis=1
    )
    return path[:, :T], word_at_full[:, :T]


@partial(jax.jit, static_argnames=("lb", "ub", "P", "F", "RG", "T"))
def lvcsr_xw_backtrace_ckpt_device(
    alpha_T: jnp.ndarray,  # (B, S)
    ckpts: jnp.ndarray,  # (NC, B, S)
    ep: jnp.ndarray,  # (NC, TC, B, Np) chunked emissions (split_emissions)
    state_pdf: jnp.ndarray,  # (S,)
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (S, D)
    cell_exit_idx: jnp.ndarray,  # (Nc, Em)
    cell_exit_w: jnp.ndarray,
    bo_cell: jnp.ndarray,
    cell_seg: jnp.ndarray,
    rg_mask: jnp.ndarray,
    entry_state: jnp.ndarray,
    entry_w: jnp.ndarray,
    ebo_idx: jnp.ndarray,
    ebo_pad: jnp.ndarray,
    p1e: jnp.ndarray,
    se_cell: jnp.ndarray,
    se_w: jnp.ndarray,
    fin_state: jnp.ndarray,
    fin_w: jnp.ndarray,
    entry_word_arr: jnp.ndarray,
    entry_slot_of_state: jnp.ndarray,
    state_word: jnp.ndarray,
    lb: int,
    ub: int,
    P: int,
    F: int,
    RG: int,
    T: int,
):
    """Checkpointed cross-word backtrace: chunks visited last-to-first,
    each re-running its forward from the stored checkpoint in ``records``
    mode (regenerating the packed backpointers and junction argmax records
    for its TC frames only — transient, never stored across T), then
    reverse-scanning with the shared bstep. Outputs identical to
    :func:`lvcsr_xw_backtrace_device` (pinned by tests)."""
    B, S = alpha_T.shape
    D = lb + ub + 1
    band_cols = [band[:, j] for j in range(D)]
    NC = ep.shape[0]
    mat = _emit_chunker(state_pdf, ep.shape[3], S)
    t0s = 1 + jnp.arange(NC) * _XW_TC

    s_final, score = _xw_bt_init(alpha_T, fin_state, fin_w)
    bstep = _make_xw_bstep(
        frame_lengths, entry_word_arr, entry_slot_of_state, se_cell,
        ebo_idx, cell_exit_idx, lb, F, RG, B,
    )
    fstep = _make_xw_fstep(
        band_cols, cell_exit_idx.reshape(-1), cell_exit_w, bo_cell,
        cell_seg, rg_mask, entry_state, entry_w, ebo_idx, ebo_pad, p1e,
        se_cell, se_w, frame_lengths, lb, ub, P, "records",
    )

    def chunk_bt(s, inputs):
        ck, echunk, t0 = inputs
        _a, recs = jax.lax.scan(
            fstep, ck, (mat(echunk), t0 + jnp.arange(_XW_TC))
        )
        return jax.lax.scan(
            bstep, s, recs + (t0 - 1 + jnp.arange(_XW_TC),), reverse=True
        )

    _s0, (path_prev, word_at) = jax.lax.scan(
        chunk_bt, s_final, (ckpts, ep, t0s), reverse=True
    )
    path_prev = path_prev.reshape(NC * _XW_TC, B)
    word_at = word_at.reshape(NC * _XW_TC, B)
    path, word_at_full = _xw_bt_outputs(
        path_prev, word_at, s_final, state_word, T
    )
    return path, word_at_full, score


def lvcsr_xw_backtrace_host(
    graph: LvcsrXwGraph,
    alpha_T: np.ndarray,  # (B, S)
    recs,
    frame_lengths: np.ndarray,
    T: int = 0,  # true frame count (records may carry chunk padding)
) -> List[Tuple[np.ndarray, float, List[Tuple[int, int]]]]:
    """Per-utterance (state_path (T,), score, word events) — cross-word
    analogue of :func:`lvcsr_backtrace_host`; reference implementation of
    :func:`lvcsr_xw_backtrace_device` (record format: raw u8 band
    backpointers + (B, Ne) junction-won bitmap + junction argmaxes)."""
    bp_raw, jwin, ent_src, ent_l, cell_arg, BOFarg, BO2arg = [
        np.asarray(r) for r in recs
    ]
    B, S = alpha_T.shape
    T = T or bp_raw.shape[0] + 1
    RG, F = graph.rg_mask.shape
    entry_slot = {int(s): i for i, s in enumerate(graph.entry_state)}
    out = []
    for b in range(B):
        L = int(frame_lengths[b])
        fin = alpha_T[b][graph.fin_state] + graph.fin_w
        k = int(np.argmax(fin))
        score = float(fin[k])
        s = int(graph.fin_state[k])
        path = np.zeros(T, np.int32)
        path[L - 1 :] = s
        events: List[Tuple[int, int]] = []
        for t in range(L - 1, 0, -1):
            r = t - 1
            e = entry_slot.get(s)
            if e is not None and jwin[r, b, e]:
                events.append((t, int(graph.entry_word[e])))
                q = int(ent_src[r, b, e])
                if q >= 0:
                    cell = int(graph.se_cell[e, q])
                else:
                    pf = int(graph.ebo_idx[e, int(ent_l[r, b, e])])
                    p, f = pf // F, pf % F
                    rg = int(BOFarg[r, b, p, f])
                    cell = int(BO2arg[r, b, p * RG + rg])
                s = int(
                    graph.cell_exit_idx[cell, int(cell_arg[r, b, cell])]
                )
            else:
                s = s - (int(bp_raw[r, b, s]) - graph.lb)
            path[t - 1] = s
        w0 = int(graph.state_word[path[0]])
        if w0 >= 0:
            events.append((0, w0))
        events.reverse()
        out.append((path, score, events))
    return out


# ---------------------------------------------------------------------------
# K-best for the cross-word junction
# ---------------------------------------------------------------------------
# Same K-best-semiring + word-hash determinization as the word-internal
# variant below, with the junction factored through context cells. The
# backoff pooling becomes a per-(presented-phone, right-group) segment
# K-best over static cell lists, and each entry slot merges its seen-bigram
# candidates with its compatible backoff segments in one exact dedup.


@partial(jax.jit, static_argnames=("lb", "ub", "K"))
def lvcsr_xw_nbest_device(
    emit_pdf: jnp.ndarray,  # (B, T, Np) pre-scaled per-PDF log-likes
    state_pdf: jnp.ndarray,  # (S,) pdf index per HMM state
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (S, D)
    start: jnp.ndarray,  # (S,)
    state0_hash: jnp.ndarray,  # (S,) uint32
    cell_exit_idx: jnp.ndarray,  # (Nc, Em)
    cell_exit_w: jnp.ndarray,
    bo_cell: jnp.ndarray,  # (Nc,)
    seg_cells: jnp.ndarray,  # (Nseg, Cs)
    seg_pad: jnp.ndarray,  # (Nseg, Cs) 0 / NEG_INF
    entry_state: jnp.ndarray,  # (Ne,)
    entry_word: jnp.ndarray,  # (Ne,)
    entry_w: jnp.ndarray,  # (Ne,)
    p1e: jnp.ndarray,  # (Ne,)
    se_cell: jnp.ndarray,  # (Ne, Q)
    se_w: jnp.ndarray,  # (Ne, Q)
    ebo_seg: jnp.ndarray,  # (Ne, Lsg)
    ebo_seg_pad: jnp.ndarray,  # (Ne, Lsg)
    lb: int,
    ub: int,
    K: int,
):
    """K-best forward pass of the cross-word junction decoder. Returns
    ``(alpha_T (B,S,K), hist_T (B,S,K) uint32, recs)`` with per-frame
    records ``(cand_sel i16, ent_sel i32, bo2_sel i32, exit_sel i32)``.
    Emissions arrive per-PDF and are gathered to states per frame (see
    :func:`lvcsr_decode_device`)."""
    B, T, _Np = emit_pdf.shape
    S = state_pdf.shape[0]
    D = lb + ub + 1
    Nc, Em = cell_exit_idx.shape
    Nseg, Cs = seg_cells.shape
    Ne, Q = se_cell.shape
    Lsg = ebo_seg.shape[1]
    band_cols = [band[:, j] for j in range(D)]
    exit_flat = cell_exit_idx.reshape(-1)
    v_hash = (entry_word.astype(jnp.uint32) + 1)[None, :, None]

    def junction(alpha_prev, hist_prev):
        exv = (
            jnp.take(alpha_prev, exit_flat, axis=1).reshape(B, Nc, Em, K)
            + cell_exit_w[None, :, :, None]
        ).reshape(B, Nc, Em * K)
        exh = jnp.take(hist_prev, exit_flat, axis=1).reshape(B, Nc, Em * K)
        EXc, EXh, exit_sel = _dedup_topk(exv, exh, K)  # (B, Nc, K)

        BOc = EXc + bo_cell[None, :, None]
        sg = (
            jnp.take(BOc, seg_cells.reshape(-1), axis=1).reshape(
                B, Nseg, Cs, K
            )
            + seg_pad[None, :, :, None]
        ).reshape(B, Nseg, Cs * K)
        sgh = jnp.take(EXh, seg_cells.reshape(-1), axis=1).reshape(
            B, Nseg, Cs * K
        )
        BO2v, BO2h, bo2_sel = _dedup_topk(sg, sgh, K)  # (B, Nseg, K)

        seen = (
            jnp.take(EXc, se_cell.reshape(-1), axis=1).reshape(B, Ne, Q, K)
            + se_w[None, :, :, None]
        ).reshape(B, Ne, Q * K)
        seen_h = jnp.take(EXh, se_cell.reshape(-1), axis=1).reshape(
            B, Ne, Q * K
        )
        bo_c = (
            jnp.take(BO2v, ebo_seg.reshape(-1), axis=1).reshape(
                B, Ne, Lsg, K
            )
            + ebo_seg_pad[None, :, :, None]
            + p1e[None, :, None, None]
        ).reshape(B, Ne, Lsg * K)
        bo_h = jnp.take(BO2h, ebo_seg.reshape(-1), axis=1).reshape(
            B, Ne, Lsg * K
        )
        cand = jnp.concatenate([seen, bo_c], axis=-1)
        ch = jnp.concatenate([seen_h, bo_h], axis=-1)
        entv, enth_src, ent_sel = _dedup_topk(cand, ch, K)  # (B, Ne, K)
        entv = entv + entry_w[None, :, None]
        enth = enth_src * HASH_MULT + v_hash
        return entv, enth, ent_sel, bo2_sel, exit_sel

    def step(carry, inputs):
        alpha_prev, hist_prev = carry
        emit_t, t = inputs  # (B, S), pre-expanded per chunk
        ap = jnp.pad(
            alpha_prev, ((0, 0), (ub, lb), (0, 0)), constant_values=NEG_INF
        )
        hp = jnp.pad(hist_prev, ((0, 0), (ub, lb), (0, 0)))
        bvals, bhash = [], []
        for j in range(D):
            d = j - lb
            bvals.append(
                ap[:, ub - d : ub - d + S] + band_cols[j][None, :, None]
            )
            bhash.append(hp[:, ub - d : ub - d + S])
        entv, enth, ent_sel, bo2_sel, exit_sel = junction(
            alpha_prev, hist_prev
        )
        ent_buf = jnp.full((B, S, K), NEG_INF).at[:, entry_state].set(entv)
        enth_buf = (
            jnp.zeros((B, S, K), jnp.uint32).at[:, entry_state].set(enth)
        )
        cand = jnp.concatenate(bvals + [ent_buf], axis=-1)
        chash = jnp.concatenate(bhash + [enth_buf], axis=-1)
        m, hsel, cand_sel = _dedup_topk(cand, chash, K)
        alpha_new = m + emit_t[:, :, None]
        active = (t < frame_lengths)[:, None, None]
        alpha_out = jnp.where(active, alpha_new, alpha_prev)
        hist_out = jnp.where(active, hsel, hist_prev)
        recs = (
            cand_sel.astype(jnp.int16),
            ent_sel.astype(jnp.int32),
            bo2_sel.astype(jnp.int32),
            exit_sel.astype(jnp.int32),
        )
        return (alpha_out, hist_out), recs

    def init_carry(e0):
        alpha0 = jnp.concatenate(
            [
                (start[None] + e0)[:, :, None],
                jnp.full((B, S, K - 1), NEG_INF),
            ],
            axis=2,
        )
        hash0 = jnp.concatenate(
            [
                jnp.broadcast_to(state0_hash[None, :, None], (B, S, 1)),
                jnp.zeros((B, S, K - 1), jnp.uint32),
            ],
            axis=2,
        )
        return alpha0, hash0

    (alpha_T, hist_T), recs = _scan_chunked(
        step, init_carry, emit_pdf, state_pdf
    )
    return alpha_T, hist_T, recs


def lvcsr_xw_nbest_backtrace_host(
    graph: LvcsrXwGraph,
    alpha_T: np.ndarray,  # (B, S, K)
    hist_T: np.ndarray,
    recs,
    frame_lengths: np.ndarray,
    nbest: int,
    T: int = 0,  # true frame count (records may carry chunk padding)
) -> List[List[Tuple[np.ndarray, float, List[Tuple[int, int]]]]]:
    """Per-utterance hypotheses [(state_path, score, word events)], best
    first — K-best cross-word analogue of :func:`lvcsr_nbest_backtrace_host`."""
    cand_sel, ent_sel, bo2_sel, exit_sel = [np.asarray(r) for r in recs]
    B, S, K = alpha_T.shape
    T = T or cand_sel.shape[0] + 1
    D = graph.lb + graph.ub + 1
    ka = graph.kbest_arrays()
    seg_cells, ebo_seg = ka["seg_cells"], ka["ebo_seg"]
    Q = graph.se_cell.shape[1]
    entry_slot = {int(s): i for i, s in enumerate(graph.entry_state)}
    out: List[List[Tuple[np.ndarray, float, List[Tuple[int, int]]]]] = []
    for b in range(B):
        L = int(frame_lengths[b])
        fin = alpha_T[b][graph.fin_state] + graph.fin_w[:, None]  # (Nf, K)
        finh = hist_T[b][graph.fin_state]
        flat = fin.reshape(-1)
        order = np.argsort(-flat)
        hyps = []
        seen_h = set()
        for p in order:
            if len(hyps) >= nbest or flat[p] <= NEG_INF / 2:
                break
            h = int(finh.reshape(-1)[p])
            if h in seen_h:
                continue
            seen_h.add(h)
            f_idx, r = int(p) // K, int(p) % K
            hyps.append((float(flat[p]), int(graph.fin_state[f_idx]), r))
        traces = []
        for score, s, r in hyps:
            path = np.zeros(T, np.int32)
            path[L - 1 :] = s
            events: List[Tuple[int, int]] = []
            for t in range(L - 1, 0, -1):
                rr = t - 1
                val = int(cand_sel[rr, b, s, r])
                if val < D * K:
                    j, r = val // K, val % K
                    s = s - (j - graph.lb)
                else:
                    er = val - D * K
                    e = entry_slot[s]
                    events.append((t, int(graph.entry_word[e])))
                    v2 = int(ent_sel[rr, b, e, er])
                    if v2 < Q * K:
                        cell = int(graph.se_cell[e, v2 // K])
                        r2 = v2 % K
                    else:
                        l, r2 = (v2 - Q * K) // K, (v2 - Q * K) % K
                        seg = int(ebo_seg[e, l])
                        v4 = int(bo2_sel[rr, b, seg, r2])
                        cell = int(seg_cells[seg, v4 // K])
                        r2 = v4 % K
                    v3 = int(exit_sel[rr, b, cell, r2])
                    s = int(graph.cell_exit_idx[cell, v3 // K])
                    r = v3 % K
                path[t - 1] = s
            w0 = int(graph.state_word[path[0]])
            if w0 >= 0:
                events.append((0, w0))
            events.reverse()
            traces.append((path, score, events))
        out.append(traces)
    return out


# ---------------------------------------------------------------------------
# K-best (determinized N-best) variant
# ---------------------------------------------------------------------------
# The K-best-semiring generalization of the junction decoder: alpha carries
# the top-K partial-path scores per state, each paired with a rolling hash of
# the word sequence emitted so far; every merge (band step, word-exit pool,
# backoff pool, LM-junction entry) deduplicates same-hash candidates, so the
# K ranks hold K *distinct word sequences* — the LVCSR analogue of the dense
# path's ``viterbi_nbest_device`` (determinized lattice N-best). Combined
# with host-side rescoring this is how longer LM context (trigram+) enters:
# the junction stays bigram-exact, N-best hypotheses are re-ranked under the
# full LM (reference: lattice determinization + ``lattice-lmrescore``,
# ``transcription/multiprocessing.py:1002-1117``).
#
# Record memory is O(T * B * (S + V) * K) small ints; for very large
# vocabularies decode in smaller batches.

HASH_MULT = jnp.uint32(1000003)


from montreal_forced_aligner_tpu.ops.viterbi import (  # noqa: E402
    dedup_topk as _dedup_topk,
)


@partial(jax.jit, static_argnames=("lb", "ub", "K"))
def lvcsr_nbest_device(
    emit_pdf: jnp.ndarray,  # (B, T, P) pre-scaled per-PDF log-likes
    state_pdf: jnp.ndarray,  # (S,) pdf index per HMM state
    frame_lengths: jnp.ndarray,  # (B,)
    band: jnp.ndarray,  # (S, D)
    start: jnp.ndarray,  # (S,)
    state0_hash: jnp.ndarray,  # (S,) uint32
    exit_idx: jnp.ndarray,  # (U, E)
    exit_w: jnp.ndarray,
    entry_idx: jnp.ndarray,  # (Ne,)
    entry_word: jnp.ndarray,
    entry_w: jnp.ndarray,
    p1: jnp.ndarray,
    bo: jnp.ndarray,
    big_pred: jnp.ndarray,  # (V, Kb)
    big_w: jnp.ndarray,
    lb: int,
    ub: int,
    K: int,
):
    """K-best forward pass. Returns ``(alpha_T (B,S,K), hist_T (B,S,K)
    uint32, recs)`` where recs stacks per-frame selection records
    ``(cand_sel (B,S,K) i16, ent_sel (B,V,K) i32, bo_sel (B,K) i32,
    exit_sel (B,U,K) i16)`` for :func:`lvcsr_nbest_backtrace_host`.
    Emissions arrive per-PDF and are gathered to states per frame (see
    :func:`lvcsr_decode_device`)."""
    B, T, _P = emit_pdf.shape
    S = state_pdf.shape[0]
    D = lb + ub + 1
    U, E = exit_idx.shape
    V, Kb = big_pred.shape
    band_cols = [band[:, j] for j in range(D)]
    exit_flat = exit_idx.reshape(-1)  # (U*E,)
    exit_w_flat = exit_w.reshape(-1)[None, :, None]  # (1, U*E, 1)
    v_hash = (jnp.arange(V, dtype=jnp.uint32) + 1)[None, :, None]

    def junction(alpha_prev, hist_prev):
        exv = (
            jnp.take(alpha_prev, exit_flat, axis=1) + exit_w_flat
        ).reshape(B, U, E * K)
        exh = jnp.take(hist_prev, exit_flat, axis=1).reshape(B, U, E * K)
        exit_u, exit_h, exit_sel = _dedup_topk(exv, exh, K)  # (B, U, K)

        bo_sc = (exit_u + bo[None, :, None]).reshape(B, U * K)
        BO, BO_h, bo_sel = _dedup_topk(bo_sc, exit_h.reshape(B, U * K), K)

        seen_v = jnp.take(exit_u, big_pred.reshape(-1), axis=1).reshape(
            B, V, Kb, K
        ) + big_w[None, :, :, None]
        seen_h = jnp.take(exit_h, big_pred.reshape(-1), axis=1).reshape(
            B, V, Kb, K
        )
        bo_v = BO[:, None, :] + p1[None, :, None]  # (B, V, K)
        bo_vh = jnp.broadcast_to(BO_h[:, None, :], (B, V, K))
        cand = jnp.concatenate([seen_v.reshape(B, V, Kb * K), bo_v], axis=-1)
        ch = jnp.concatenate([seen_h.reshape(B, V, Kb * K), bo_vh], axis=-1)
        ent_v, ent_hsrc, ent_sel = _dedup_topk(cand, ch, K)  # (B, V, K)
        ent_h = ent_hsrc * HASH_MULT + v_hash

        entry_cand = (
            jnp.take(ent_v, entry_word, axis=1) + entry_w[None, :, None]
        )  # (B, Ne, K)
        entry_h = jnp.take(ent_h, entry_word, axis=1)
        return entry_cand, entry_h, ent_sel, bo_sel, exit_sel

    def step(carry, inputs):
        alpha_prev, hist_prev = carry
        emit_t, t = inputs  # (B, S), pre-expanded per chunk
        # band candidates: (B, S, D*K)
        ap = jnp.pad(
            alpha_prev, ((0, 0), (ub, lb), (0, 0)), constant_values=NEG_INF
        )
        hp = jnp.pad(hist_prev, ((0, 0), (ub, lb), (0, 0)))
        bvals, bhash = [], []
        for j in range(D):
            d = j - lb
            bvals.append(ap[:, ub - d : ub - d + S] + band_cols[j][None, :, None])
            bhash.append(hp[:, ub - d : ub - d + S])
        cand = jnp.concatenate(bvals, axis=-1)  # (B, S, D*K)
        chash = jnp.concatenate(bhash, axis=-1)
        # junction entries scattered onto their (unique) entry states
        entry_cand, entry_h, ent_sel, bo_sel, exit_sel = junction(
            alpha_prev, hist_prev
        )
        ent_buf = jnp.full((B, S, K), NEG_INF).at[:, entry_idx].set(entry_cand)
        enth_buf = (
            jnp.zeros((B, S, K), jnp.uint32).at[:, entry_idx].set(entry_h)
        )
        cand = jnp.concatenate([cand, ent_buf], axis=-1)  # (B, S, (D+1)*K)
        chash = jnp.concatenate([chash, enth_buf], axis=-1)
        m, hsel, cand_sel = _dedup_topk(cand, chash, K)
        alpha_new = m + emit_t[:, :, None]
        active = (t < frame_lengths)[:, None, None]
        alpha_out = jnp.where(active, alpha_new, alpha_prev)
        hist_out = jnp.where(active, hsel, hist_prev)
        # cand_sel spans (D+1)*K <= ~2.5k and exit_sel E*K (few dozen) —
        # int16 is safe; ent_sel spans (Kb+1)*K which can exceed 32767 for
        # high-fanout LM words, so it stays int32
        recs = (
            cand_sel.astype(jnp.int16),
            ent_sel.astype(jnp.int32),
            bo_sel.astype(jnp.int32),
            exit_sel.astype(jnp.int16),
        )
        return (alpha_out, hist_out), recs

    def init_carry(e0):
        alpha0 = jnp.concatenate(
            [
                (start[None] + e0)[:, :, None],
                jnp.full((B, S, K - 1), NEG_INF),
            ],
            axis=2,
        )
        hash0 = jnp.concatenate(
            [
                jnp.broadcast_to(state0_hash[None, :, None], (B, S, 1)),
                jnp.zeros((B, S, K - 1), jnp.uint32),
            ],
            axis=2,
        )
        return alpha0, hash0

    (alpha_T, hist_T), recs = _scan_chunked(
        step, init_carry, emit_pdf, state_pdf
    )
    return alpha_T, hist_T, recs


def lvcsr_nbest_backtrace_host(
    graph: LvcsrGraph,
    alpha_T: np.ndarray,  # (B, S, K)
    hist_T: np.ndarray,  # (B, S, K)
    recs,  # stacked step records
    frame_lengths: np.ndarray,
    nbest: int,
    T: int = 0,  # true frame count (records may carry chunk padding)
) -> List[List[Tuple[np.ndarray, float, List[Tuple[int, int]]]]]:
    """Per-utterance list of up to ``nbest`` distinct-word-sequence
    hypotheses, best first: [(state_path (T,), score, word events)]."""
    cand_sel, ent_sel, bo_sel, exit_sel = [np.asarray(r) for r in recs]
    B, S, K = alpha_T.shape
    T = T or cand_sel.shape[0] + 1
    D = graph.lb + graph.ub + 1
    Kb = graph.big_pred.shape[1]
    entry_slot = {int(s): i for i, s in enumerate(graph.entry_idx)}
    out: List[List[Tuple[np.ndarray, float, List[Tuple[int, int]]]]] = []
    for b in range(B):
        L = int(frame_lengths[b])
        # final candidates: every (word exit, rank) + eos, deduped by hash
        ex = (
            alpha_T[b][graph.exit_idx]  # (U, E, K)
            + graph.exit_w[:, :, None]
            + graph.eos[:, None, None]
        )
        exh = hist_T[b][graph.exit_idx]  # (U, E, K)
        flat = ex.reshape(-1)
        order = np.argsort(-flat)
        hyps = []
        seen_h = set()
        for p in order:
            if len(hyps) >= nbest or flat[p] <= NEG_INF / 2:
                break
            h = int(exh.reshape(-1)[p])
            if h in seen_h:
                continue
            seen_h.add(h)
            u, e, r = np.unravel_index(int(p), ex.shape)
            hyps.append((float(flat[p]), int(graph.exit_idx[u, e]), int(r)))
        traces = []
        for score, s, r in hyps:
            path = np.zeros(T, np.int32)
            path[L - 1 :] = s
            events: List[Tuple[int, int]] = []
            for t in range(L - 1, 0, -1):
                val = int(cand_sel[t - 1, b, s, r])
                if val < D * K:
                    j, r = val // K, val % K
                    s = s - (j - graph.lb)
                else:
                    er = val - D * K  # rank within the entry list
                    v = int(graph.entry_word[entry_slot[s]])
                    events.append((t, v))
                    val2 = int(ent_sel[t - 1, b, v, er])
                    if val2 < Kb * K:
                        u, r2 = int(graph.big_pred[v, val2 // K]), val2 % K
                    else:
                        flat_bo = int(bo_sel[t - 1, b, val2 - Kb * K])
                        u, r2 = flat_bo // K, flat_bo % K
                    val3 = int(exit_sel[t - 1, b, u, r2])
                    s, r = int(graph.exit_idx[u, val3 // K]), val3 % K
                path[t - 1] = s
            w0 = int(graph.state_word[path[0]])
            if w0 >= 0:
                events.append((0, w0))
            events.reverse()
            traces.append((path, score, events))
        out.append(traces)
    return out


def lvcsr_backtrace_host(
    graph: LvcsrGraph,
    alpha_T: np.ndarray,  # (B, S)
    recs,  # stacked step records
    frame_lengths: np.ndarray,
    T: int = 0,  # true frame count (records may carry chunk padding)
) -> List[Tuple[np.ndarray, float, List[Tuple[int, int]]]]:
    """Per-utterance (state_path (T,), score, word events).

    Word events are (frame, word) pairs marking each LM-junction crossing —
    the decoder's equivalent of lattice word output arcs, which makes
    consecutive repeats of the same word unambiguous.

    Reference implementation of :func:`lvcsr_backtrace_device` (which is
    the production path: it keeps the O(T*S) records on device). Records
    use the packed format: bit 7 of the uint8 backpointer = junction won.
    """
    bp_packed, ent_src, exit_arg, bo_arg = [np.asarray(r) for r in recs]
    B, S = alpha_T.shape
    T = T or bp_packed.shape[0] + 1
    entry_slot = {int(s): i for i, s in enumerate(graph.entry_idx)}
    out = []
    for b in range(B):
        L = int(frame_lengths[b])
        # final: best word exit + eos
        ex = alpha_T[b][graph.exit_idx] + graph.exit_w  # (U, E)
        ex_best = ex.max(axis=1) + graph.eos
        u = int(np.argmax(ex_best))
        score = float(ex_best[u])
        s = int(graph.exit_idx[u, int(np.argmax(ex[u]))])
        path = np.zeros(T, np.int32)
        path[L - 1 :] = s
        events: List[Tuple[int, int]] = []
        for t in range(L - 1, 0, -1):
            r = t - 1  # records index for transition (t-1) -> t
            packed = int(bp_packed[r, b, s])
            if (packed & 0x80) and s in entry_slot:
                slot = entry_slot[s]
                v = int(graph.entry_word[slot])
                events.append((t, v))
                k = int(ent_src[r, b, v])
                src_u = int(bo_arg[r, b]) if k < 0 else int(graph.big_pred[v, k])
                s = int(graph.exit_idx[src_u, int(exit_arg[r, b, src_u])])
            else:
                s = s - ((packed & 0x7F) - graph.lb)
            path[t - 1] = s
        w0 = int(graph.state_word[path[0]])
        if w0 >= 0:
            events.append((0, w0))
        events.reverse()
        out.append((path, score, events))
    return out


# ---------------------------------------------------------------------------
# Device K-best backtrace (flat junction)
# ---------------------------------------------------------------------------
# The host backtrace above fetches the full per-frame selection records to
# numpy — at V=20k that is (T, B, S, K) int16 cand_sel alone, ~3 GB per
# 9 s row, minutes over a remote link's d2h. This pair keeps the records
# ON DEVICE: final hypotheses are selected with the exact device
# dedup_topk (same top-H-distinct-hashes semantics as the host's
# argsort + set walk), and the backtrace runs as a reverse scan carrying
# (state, rank) per hypothesis — only (B, H) starts and (B, H, T) paths
# cross the link. Mirrors lvcsr_nbest_backtrace_host decision for
# decision (pinned rank-exact by tests).


@partial(jax.jit, static_argnames=("H",))
def lvcsr_nbest_final_select_device(
    alpha_T: jnp.ndarray,  # (B, S, K)
    hist_T: jnp.ndarray,  # (B, S, K) uint32
    exit_idx: jnp.ndarray,  # (U, E)
    exit_w: jnp.ndarray,
    eos: jnp.ndarray,  # (U,)
    H: int,
):
    """Top-H distinct-word-sequence final hypotheses on device.

    Returns (scores (B, H) — NEG_INF pads rank short rows —, s0 (B, H)
    final state, rk0 (B, H) rank within that state's K list)."""
    B = alpha_T.shape[0]
    K = alpha_T.shape[2]
    U, E = exit_idx.shape
    ex = jnp.take(alpha_T, exit_idx.reshape(-1), axis=1).reshape(
        B, U, E, K
    ) + exit_w[None, :, :, None] + eos[None, :, None, None]
    exh = jnp.take(hist_T, exit_idx.reshape(-1), axis=1).reshape(B, U, E, K)
    flat = ex.reshape(B, U * E * K)
    flath = exh.reshape(B, U * E * K)
    vals, _hsel, idx = _dedup_topk(flat, flath, H)  # exact top-H distinct
    u = idx // (E * K)
    e = (idx // K) % E
    rk0 = idx % K
    s0 = exit_idx[u, e].astype(jnp.int32)
    return vals, s0, rk0


@partial(jax.jit, static_argnames=("lb", "ub", "K", "T"))
def lvcsr_nbest_backtrace_device(
    s0: jnp.ndarray,  # (B, H) start states (from final selection)
    rk0: jnp.ndarray,  # (B, H) start ranks
    recs,  # stacked step records from lvcsr_nbest_device (device-resident)
    frame_lengths: jnp.ndarray,  # (B,)
    entry_word: jnp.ndarray,  # (Ne,) word of each entry slot
    entry_slot_of_state: jnp.ndarray,  # (S,) slot index or -1
    big_pred: jnp.ndarray,  # (V, Kb)
    exit_idx: jnp.ndarray,  # (U, E)
    state_word: jnp.ndarray,  # (S,)
    lb: int,
    ub: int,
    K: int,
    T: int = 0,
):
    """K-best backtrace as a device reverse scan over (B, H) hypothesis
    carries; outputs (paths (B, H, T) i32, word_at (B, H, T) i32 — word
    entered at each frame, -1 none). Per-frame decisions mirror
    ``lvcsr_nbest_backtrace_host``: cand_sel < D*K is a band move, else a
    junction crossing resolved through ent_sel (seen bigram vs backoff)
    and exit_sel."""
    cand_sel, ent_sel, bo_sel, exit_sel = recs
    B, H = s0.shape
    Tp = cand_sel.shape[0] + 1
    T = T or Tp
    D = lb + ub + 1
    Kb = big_pred.shape[1]
    rows = jnp.arange(B)[:, None]  # (B, 1) -> broadcasts over H

    def bstep(carry, inputs):
        s, rk = carry
        cand_r, ent_r, bo_r, exit_r, r = inputs
        t = r + 1
        val = cand_r[rows, s, rk].astype(jnp.int32)  # (B, H)
        is_band = val < D * K
        # band move
        j = jnp.clip(val, 0) // K
        s_band = s - (j - lb)
        rk_band = jnp.clip(val, 0) % K
        # junction crossing
        er = jnp.clip(val - D * K, 0)
        slot = entry_slot_of_state[s]  # (B, H)
        v = entry_word[jnp.clip(slot, 0)]
        val2 = ent_r[rows, v, er].astype(jnp.int32)
        seen = val2 < Kb * K
        u_seen = big_pred[v, jnp.clip(val2, 0) // K]
        r2_seen = jnp.clip(val2, 0) % K
        flat_bo = bo_r[rows, jnp.clip(val2 - Kb * K, 0, K - 1)].astype(
            jnp.int32
        )
        u_bo = flat_bo // K
        r2_bo = flat_bo % K
        u = jnp.where(seen, u_seen, u_bo)
        r2 = jnp.where(seen, r2_seen, r2_bo)
        val3 = exit_r[rows, u, r2].astype(jnp.int32)
        s_j = exit_idx[u, jnp.clip(val3, 0) // K].astype(jnp.int32)
        rk_j = jnp.clip(val3, 0) % K
        s_new = jnp.where(is_band, s_band, s_j)
        rk_new = jnp.where(is_band, rk_band, rk_j)
        active = (t < frame_lengths[:, None])
        s_out = jnp.where(active, s_new, s)
        rk_out = jnp.where(active, rk_new, rk)
        word_at_t = jnp.where(
            active & ~is_band, v.astype(jnp.int32), -1
        )
        return (s_out, rk_out), (s_out, word_at_t)

    r_iota = jnp.arange(Tp - 1)
    (_s, _rk), (path_prev, word_at) = jax.lax.scan(
        bstep, (s0, rk0), recs + (r_iota,), reverse=True
    )
    # (Tp-1, B, H) -> (B, H, Tp)
    path = jnp.concatenate(
        [jnp.moveaxis(path_prev, 0, 2), s0[:, :, None]], axis=2
    )
    w0 = state_word[path[:, :, 0]].astype(jnp.int32)
    word0 = jnp.where(w0 >= 0, w0, -1)
    word_at_full = jnp.concatenate(
        [word0[:, :, None], jnp.moveaxis(word_at, 0, 2)], axis=2
    )
    return path[:, :, :T], word_at_full[:, :, :T]
