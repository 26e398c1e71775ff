"""Speech transcription (decoding against a language model).

Behavioral spec: reference ``transcription/transcriber.py`` (``Transcriber``:
HCLG decoding graph built from lexicon + ARPA LM ``:1425-1571``; decode
``:1085``; WER/CER evaluation ``:127-512``; phone LM training ``:737-760``
and phone transcription ``DecodePhoneFunction``).

TPU-native design: instead of beam search over a composed HCLG, the decoding
graph (LM states x word HMM chains with optional silence) is built dense on
the host and decoded with the same exact batched dense-Viterbi kernel used
for alignment — the graph is shared across all utterances in a batch. This
is exact (no pruning) and fast for small/medium vocabularies (phone
transcription, per-speaker LMs, command-and-control); large-vocabulary beam
decoding is a planned extension on the same kernel with band pruning.
"""

from __future__ import annotations

import logging
import math
import os
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.data import CtmInterval
from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon
from montreal_forced_aligner_tpu.graph.compiler import (
    AlignmentGraphCompiler,
    _GraphBuilder,
    batch_graphs,
    ship_graph_to_device,
)
from montreal_forced_aligner_tpu.language_modeling.ngram import (
    ArpaModel,
    train_lm_from_texts,
)
from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel
from montreal_forced_aligner_tpu.ops.viterbi import NEG_INF

logger = logging.getLogger("mfa_tpu")

LN10 = math.log(10.0)


@partial(jax.jit, static_argnames=("acoustic_scale",))
def _lvcsr_emissions(ff, W, gconsts, acoustic_scale):
    """(B, T, P) pre-scaled per-PDF emissions for the LVCSR decoders.

    Deliberately NOT expanded to the (B, T, S) state substrate: at LVCSR
    scale S runs to hundreds of thousands of states over a few thousand
    pdfs, so the expansion is ~100x the information content and OOMs a
    real chip at V=20k (23 GB at B=8, T=1500, S=490k). The decode kernels
    gather their (B, S) frame from (B, P) inside the scan instead."""
    from montreal_forced_aligner_tpu.ops.gmm_loglikes import gmm_loglikes

    return acoustic_scale * gmm_loglikes(ff, W, gconsts)


@partial(jax.jit, static_argnames=("acoustic_scale", "K"))
def _emit_and_nbest(
    ff, frame_lengths, graph, W, gconsts, acoustic_scale, K,
    word_event, state0_hash,
):
    """Emission selection + determinized K-best Viterbi in one device
    program (the N-best analogue of ``align.aligner._emit_and_align``)."""
    from montreal_forced_aligner_tpu.ops.gmm_loglikes import gmm_loglikes
    from montreal_forced_aligner_tpu.ops.viterbi import viterbi_nbest_device

    from montreal_forced_aligner_tpu.ops.gmm_loglikes import (
        select_state_emissions,
    )

    ll = gmm_loglikes(ff, W, gconsts)
    emit = select_state_emissions(ll, graph.state_pdf)
    return viterbi_nbest_device(
        emit, frame_lengths, graph, acoustic_scale=acoustic_scale, K=K,
        word_event=word_event, state0_hash=state0_hash,
    )


@dataclass
class TranscriptionResult:
    utterance_id: int
    text: str
    words: List[CtmInterval]
    log_likelihood: float
    # N-best alternatives (text, total path score), best first; populated
    # when decoding with nbest > 1 (the lattice/rescoring path)
    alternatives: Optional[List[Tuple[str, float]]] = None
    # True when the LVCSR graph silently degraded from exact cross-word
    # triphone context to word-internal context at build time (records
    # exceeded the HBM budget); None on non-LVCSR decodes
    cross_word_fallback: Optional[bool] = None


class DecodingGraphCompiler:
    """Builds a shared dense decoding graph: bigram LM over the vocabulary
    with per-word HMM chains and optional silence at word boundaries
    (the reference's HCLG composition, ``transcription/multiprocessing.py:451``,
    realized as a dense state lattice).

    Context-dependent (triphone) models are handled exactly: word HMMs are
    expanded per distinct cross-word left/right context via the alignment
    compiler's pdf-tuple-merged branches (the C transducer of HCLG), and
    word-to-word arcs only connect context-consistent branch pairs. Optional
    inter-word silence gets one contexted copy per (source word, final
    phone)."""

    EPS = 0

    def __init__(
        self,
        align_compiler: AlignmentGraphCompiler,
        lexicon: Lexicon,
        lm: ArpaModel,
        lm_scale: float = 1.0,
        max_states: int = 12000,
        word_insertion_penalty: float = 0.0,
    ):
        self.compiler = align_compiler
        self.lexicon = lexicon
        self.lm = lm
        self.lm_scale = lm_scale
        self.max_states = max_states
        self.word_insertion_penalty = word_insertion_penalty

    def build(self):
        lex = self.lexicon
        lm = self.lm
        g = _GraphBuilder()
        comp = self.compiler
        EPS = self.EPS
        sil = lex.phone_id(lex.silence_phone, None)
        vocab = [w for w in lm.vocab if w in lex.words]
        if not vocab:
            raise ValueError("no LM words found in the lexicon")

        # pronunciations + cross-word context inventories
        prons: Dict[int, List[Tuple[List[int], float, float]]] = {}
        first_phones, last_phones = set(), set()
        for w_idx, word in enumerate(vocab):
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
            prons[w_idx] = rows
        left_all = sorted({EPS, sil} | last_phones)
        right_all = sorted({EPS, sil} | first_phones)

        # word branches: (branch, pron_lp, p_sil, first, last) per context pair
        word_branches: Dict[int, List[Tuple[dict, float, float, int, int]]] = {}
        for w_idx in range(len(vocab)):
            rows = []
            for pids, pron_lp, p_sil in prons[w_idx]:
                for br in comp._expand_variant(
                    g, pids, w_idx, left_all, right_all
                ):
                    rows.append((br, pron_lp, p_sil, pids[0], pids[-1]))
            word_branches[w_idx] = rows
            if len(g.state_pdf) > self.max_states:
                raise ValueError(
                    f"decoding graph exceeds {self.max_states} states; "
                    "vocabulary too large for dense decode"
                )

        # optional-silence copies per (source word, final phone): keeps the
        # LM word history through silence and the silence phone's context
        sil_rights = sorted({EPS} | first_phones)
        sil_copies: Dict[Tuple[int, int], list] = {}
        for u_idx in range(len(vocab)):
            for last in {r[4] for r in word_branches[u_idx]}:
                sil_copies[(u_idx, last)] = comp._expand_single(
                    g, sil, -1, last, sil_rights
                )
        init_sil = comp._expand_single(g, sil, -1, EPS, sorted(first_phones))

        def entries_for(v_idx: int, left_ctx: int, first_allowed):
            """Branch entries of word v compatible with the given left
            context and (optionally) a right-set constraint on first phone."""
            for br, pron_lp, _ps, first, _last in word_branches[v_idx]:
                if left_ctx not in br["lset"]:
                    continue
                if first_allowed is not None and first not in first_allowed:
                    continue
                yield br["entry"], pron_lp

        # start wiring
        start_lp = math.log(1.0 - lex.initial_silence_probability)
        for rs, sentry, _sexits in init_sil:
            g.add_start(sentry, math.log(lex.initial_silence_probability))
        for v_idx, v in enumerate(vocab):
            lm_lp = self.lm_scale * lm.log_prob(v, ("<s>",)) * LN10
            for entry, pron_lp in entries_for(v_idx, EPS, None):
                g.add_start(entry, start_lp + lm_lp + pron_lp)
            for rs, _sentry, sexits in init_sil:
                for entry, pron_lp in entries_for(v_idx, sil, rs):
                    for s, wgt, tid in sexits:
                        g.add_arc(
                            s, entry, wgt + lm_lp + pron_lp, tid, event=v_idx
                        )

        # word-to-word / word-to-silence / finals
        for u_idx, u in enumerate(vocab):
            eos_lp = self.lm_scale * lm.log_prob("</s>", (u,)) * LN10
            lm_cache = {
                v_idx: self.lm_scale * lm.log_prob(v, (u,)) * LN10
                for v_idx, v in enumerate(vocab)
            }
            for br, _plp, p_sil, _first, last in word_branches[u_idx]:
                rset = br["rset"]
                skip_lp = math.log(max(1.0 - p_sil, 1e-5))
                sil_lp = math.log(max(p_sil, 1e-5))
                for s, wgt, tid in br["exits"]:
                    if EPS in rset:
                        g.add_final(s, wgt + skip_lp + eos_lp, tid)
                    if sil in rset:
                        for _rs, sentry, _se in sil_copies[(u_idx, last)]:
                            g.add_arc(s, sentry, wgt + sil_lp, tid)
                    for v_idx in range(len(vocab)):
                        for entry, pron_lp in entries_for(v_idx, last, rset):
                            g.add_arc(
                                s,
                                entry,
                                wgt + skip_lp + lm_cache[v_idx] + pron_lp,
                                tid,
                                event=v_idx,
                            )
            # out of this word's silence copies
            for (su_idx, last), groups in sil_copies.items():
                if su_idx != u_idx:
                    continue
                for rs, _sentry, sexits in groups:
                    for s, wgt, tid in sexits:
                        if EPS in rs:
                            g.add_final(s, wgt + eos_lp, tid)
                        for v_idx in range(len(vocab)):
                            for entry, pron_lp in entries_for(v_idx, sil, rs):
                                g.add_arc(
                                    s,
                                    entry,
                                    wgt + lm_cache[v_idx] + pron_lp,
                                    tid,
                                    event=v_idx,
                                )

        graph = g.finish(vocab)
        return graph, vocab


class Transcriber:
    """Transcribe a corpus with an acoustic model + LM (reference entry
    point: ``mfa transcribe``)."""

    def __init__(
        self,
        acoustic_model_path,
        dictionary_path,
        lm: Optional[ArpaModel] = None,
        lm_order: int = 3,
        acoustic_scale: float = 1.0 / 12,
        batch_size: int = 16,
        lm_scale: float = 1.0,
        word_insertion_penalty: float = 0.0,
    ):
        """``lm_scale`` and ``word_insertion_penalty`` mirror the reference's
        ``--language_model_weight`` / ``--word_insertion_penalties``
        (``transcription/transcriber.py:1021``); the penalty is charged per
        word entry in natural-log space."""
        from montreal_forced_aligner_tpu.align.aligner import (
            AlignerConfig,
            PretrainedAligner,
        )

        self.aligner = PretrainedAligner(
            acoustic_model_path,
            dictionary_path,
            AlignerConfig(batch_size=batch_size, acoustic_scale=acoustic_scale),
        )
        self.lm = lm
        self.lm_order = lm_order
        self.acoustic_scale = acoustic_scale
        self.lm_scale = lm_scale
        self.word_insertion_penalty = word_insertion_penalty
        self._graph = None
        self._vocab = None
        self._lvcsr = None

    def train_lm_from_corpus(self, corpus: Corpus) -> ArpaModel:
        texts = []
        for utt in corpus.utterances:
            tokens = self.aligner.tokenizer.tokenize(utt.text)
            texts.append(" ".join(tokens))
        if not any(texts):
            from montreal_forced_aligner_tpu.exceptions import (
                LanguageModelError,
            )

            raise LanguageModelError(
                "The corpus carries no transcripts to train a decoding "
                "language model from (untranscribed corpora load with "
                "empty-text utterances for transcription workflows). "
                "Pass --language_model_path with a trained LM (ARPA or "
                "MFA LanguageModel zip), or transcribe with "
                "transcribe_whisper/transcribe_speechbrain which need no "
                "LM."
            )
        self.lm, _counter = train_lm_from_texts(texts, order=self.lm_order)
        return self.lm

    # above this vocabulary size the dense graph's O(V^2) LM wiring loses to
    # the backoff-junction decoder (which also gives up exact cross-word
    # context); below it, exact dense wins
    LVCSR_WORD_THRESHOLD = 150

    def _ensure_graph(self, nominal_frames: Optional[int] = None):
        if self._graph is None and self._lvcsr is None:
            vocab_size = sum(
                1 for w in self.lm.vocab if w in self.aligner.lexicon.words
            )
            try:
                if vocab_size > self.LVCSR_WORD_THRESHOLD:
                    raise ValueError("vocabulary too large for dense decode")
                builder = DecodingGraphCompiler(
                    self.aligner.compiler, self.aligner.lexicon, self.lm,
                    lm_scale=self.lm_scale,
                    word_insertion_penalty=self.word_insertion_penalty,
                )
                self._graph, self._vocab = builder.build()
                logger.info(
                    "decoding graph: %d states over %d words (exact dense)",
                    self._graph.num_states,
                    len(self._vocab),
                )
            except ValueError:
                # vocabulary too large for the dense graph: switch to the
                # two-level backoff-junction decoder (transcription/lvcsr.py)
                from montreal_forced_aligner_tpu.transcription.lvcsr import (
                    LvcsrGraphCompiler,
                )

                self._lvcsr = LvcsrGraphCompiler(
                    self.aligner.compiler, self.aligner.lexicon, self.lm,
                    lm_scale=self.lm_scale,
                    word_insertion_penalty=self.word_insertion_penalty,
                    nominal_frames=nominal_frames,
                ).build()
                self._vocab = self._lvcsr.words
                logger.info(
                    "LVCSR decoding graph: %d states over %d words",
                    self._lvcsr.num_states,
                    len(self._vocab),
                )
        return self._graph

    @property
    def cross_word_fallback(self) -> bool:
        """True when a requested cross-word-context LVCSR build fell back
        to word-internal context (decode accuracy silently degraded
        otherwise — surfaced here, on each result, and in the bench
        JSON)."""
        return bool(getattr(self._lvcsr, "cross_word_fallback", False))

    def _shared_graph_on_device(self, graph, B: int):
        """The decode graph is one shared FST for every utterance; batch
        and ship it ONCE per row count and reuse across batches and calls
        (re-shipping B identical replicas per batch was the transcribe
        path's dominant host->device transfer)."""
        if graph is None:
            return None, None  # LVCSR mode
        cache = getattr(self, "_graph_device_cache", None)
        if cache is None:
            cache = self._graph_device_cache = {}
        # the cache entry holds the graph object itself and is validated
        # by identity: a rebuilt graph can neither hit a stale entry nor
        # have its id() recycled while the entry lives
        hit = cache.get(B)
        if hit is None or hit[0] is not graph:
            garrs = batch_graphs([graph] * B)
            cache[B] = (graph, garrs, ship_graph_to_device(garrs))
            hit = cache[B]
        return hit[1], hit[2]

    def transcribe_corpus(
        self,
        corpus: Corpus,
        nbest: int = 1,
        rescore_lm: Optional[ArpaModel] = None,
        rescore_weight: float = 1.0,
    ) -> Dict[int, TranscriptionResult]:
        """Decode every utterance against the shared graph.

        With ``nbest > 1`` the K-best Viterbi kernel produces rank-ordered
        hypotheses (the reference's lattice, ``--lattice_beam``); passing
        ``rescore_lm`` replaces the decoding LM's contribution with the
        bigger model's on each hypothesis and re-ranks (the reference's
        ``kalpy.lm.rescore`` / ConstArpaLm lattice rescoring,
        ``transcription/multiprocessing.py`` CarpaLmRescore)."""
        from montreal_forced_aligner_tpu.align.aligner import (
            _final_feats,
            _emit_and_align,
            _mfcc_and_sums,
            _round_up,
        )
        from montreal_forced_aligner_tpu.ops.mfcc import pad_waves_for_mfcc
        from montreal_forced_aligner_tpu.ops.viterbi import (
            extract_frame_labels_host,
        )

        if not corpus.utterances:
            return {}
        if self.lm is None:
            self.train_lm_from_corpus(corpus)
        # thread the corpus's real max utterance length into the LVCSR
        # record-budget gates (they otherwise assume a nominal 30 s)
        ns = [u.num_samples for u in corpus.utterances if u.num_samples]
        max_frames = (
            self.aligner.mfcc_config.num_frames(max(ns)) if ns else None
        )
        graph = self._ensure_graph(nominal_frames=max_frames)
        al = self.aligner
        speaker_index = corpus.speaker_index
        num_speakers = len(corpus.speakers)

        import time as _time

        _t0 = _time.time()
        waves = corpus.load_audio_parallel(
            al.mfcc_config.sample_rate,
            num_workers=al.config.num_loader_threads,
        )
        order = np.argsort([len(w) for w in waves], kind="stable")
        batches = [
            list(order[i : i + al.config.batch_size])
            for i in range(0, len(order), al.config.batch_size)
        ]

        # phase A (same structure as align_corpus): ONE MFCC pass computes
        # features AND per-speaker CMVN sums on device — the previous
        # _speaker_means pre-pass ran the whole MFCC pipeline a second
        # time; all batches are dispatched before any result is fetched
        from montreal_forced_aligner_tpu.align.aligner import (
            _feats_and_spk_stats,
            _mfcc_and_spk_stats,
            resolve_transfer_mode,
        )
        from montreal_forced_aligner_tpu.ops.mfcc import mfcc_host_batch

        transfer_mode = resolve_transfer_mode(
            getattr(al.config, "transfer_mode", "auto")
        )
        self.last_transfer_mode = transfer_mode
        D = al.mfcc_config.num_coefficients
        stashes = []
        spk_sum_dev = None
        spk_count = np.zeros(num_speakers, dtype=np.float64)
        for batch in batches:
            wave_list = [waves[i] for i in batch]
            L = _round_up(max(len(w) for w in wave_list), 16000)
            padded, lens = pad_waves_for_mfcc(wave_list, al.mfcc_config, L)
            flens = np.array(
                [al.mfcc_config.num_frames(int(n)) for n in lens], np.int32
            )
            spk_idx = np.array(
                [speaker_index[corpus.utterances[i].speaker] for i in batch],
                np.int32,
            )
            if transfer_mode == "features":
                feats16 = mfcc_host_batch(
                    padded, al.mfcc_config, al.mfcc_config.num_frames(L)
                ).astype(np.float16)
                feats, bsum = _feats_and_spk_stats(
                    jnp.asarray(feats16),
                    self._flens_dev(flens),
                    jnp.asarray(spk_idx),
                    num_speakers,
                )
            else:
                feats, bsum = _mfcc_and_spk_stats(
                    jnp.asarray(padded),
                    self._flens_dev(flens),
                    jnp.asarray(spk_idx),
                    al.mfcc_config,
                    al.mfcc_config.num_frames(L),
                    num_speakers,
                )
            spk_sum_dev = bsum if spk_sum_dev is None else spk_sum_dev + bsum
            np.add.at(spk_count, spk_idx, flens.astype(np.float64))
            stashes.append((batch, flens, feats, spk_idx))
        # speaker means stay ON DEVICE (sum / count, then a device gather
        # per batch): fetching the (S, D) sums to the host costs a full
        # device->host round trip — the tunnel's slow direction — and
        # serializes phase A against phase B for no reason
        spk_mean_dev = spk_sum_dev / jnp.maximum(
            jnp.asarray(spk_count.astype(np.float32)), 1.0
        )[:, None]
        logger.debug(
            "transcribe phase A (audio+MFCC+CMVN) took %.3fs",
            _time.time() - _t0,
        )
        _t0 = _time.time()

        lda = (
            jnp.asarray(al.model.lda_mat)
            if (al.model.uses_lda and al.model.lda_mat is not None)
            else None
        )
        results: Dict[int, TranscriptionResult] = {}
        fs = al.frame_shift
        prepared = []
        for batch, flens, feats, spk_idx in stashes:
            mean_rows = spk_mean_dev[jnp.asarray(spk_idx)]
            ff = _final_feats(
                feats, self._flens_dev(flens), mean_rows, lda
            )
            B = len(batch)
            garrs, bgraph = self._shared_graph_on_device(graph, B)
            prepared.append((batch, flens, garrs, bgraph, ff))
        logger.debug(
            "transcribe phase B prep (graph+final feats) took %.3fs",
            _time.time() - _t0,
        )

        if self._lvcsr is not None:
            # split BEFORE the fMLLR first pass too: its LVCSR decode
            # materializes the same O(T*S) records as the final decode
            prepared = self._lvcsr_split_rows(prepared, nbest)

        if al.model.uses_fmllr and al.model.alignment_model is not None:
            prepared = self._fmllr_decode_feats(
                prepared, corpus, speaker_index
            )

        if self._lvcsr is not None:
            return self._transcribe_prepared_lvcsr(
                prepared, corpus, fs, nbest, rescore_lm, rescore_weight
            )

        # dispatch every batch's decode before fetching any result so
        # device compute and the (slow) device->host link overlap across
        # batches (same scheme as align_corpus)
        _t0 = _time.time()
        pending = []
        all_sp_h = all_scores_h = None
        row_of = []
        if nbest <= 1:
            for batch, flens, garrs, bgraph, ff in prepared:
                state_path, scores = _emit_and_align(
                    ff,
                    self._flens_dev(flens),
                    bgraph,
                    al._device_gmm[0],
                    al._device_gmm[1],
                    self.acoustic_scale,
                    w_rows=al._device_gmm[2],
                )
                if bgraph.state_pdf.shape[1] <= 32767:
                    state_path = state_path.astype(jnp.int16)
                pending.append((state_path, scores))
            # ONE device->host round trip for the whole corpus: pad every
            # batch's paths to a common T and concatenate ON DEVICE — the
            # tunnel's d2h latency (tens to hundreds of ms per fetch in
            # bad weather) makes per-batch fetches the dominant cost of
            # the entire decode
            Tmax = max(sp.shape[1] for sp, _s in pending)
            all_sp = jnp.concatenate(
                [
                    jnp.pad(sp, ((0, 0), (0, Tmax - sp.shape[1])))
                    for sp, _s in pending
                ],
                axis=0,
            )
            all_scores = jnp.concatenate([s for _sp, s in pending])
            from montreal_forced_aligner_tpu.training.base import (
                start_host_copies,
            )

            start_host_copies((all_sp, all_scores))
            all_sp_h = np.asarray(all_sp)
            all_scores_h = np.asarray(all_scores)
            r0 = 0
            for sp, _s in pending:
                row_of.append(r0)
                r0 += sp.shape[0]
        logger.debug(
            "transcribe decode dispatch+fetch took %.3fs", _time.time() - _t0
        )

        for bi, (batch, flens, garrs, bgraph, ff) in enumerate(prepared):
            if nbest <= 1:
                B_rows = pending[bi][0].shape[0]
                r0 = row_of[bi]
                sp = all_sp_h[r0 : r0 + B_rows][:, None]  # (B, 1, T)
                scores_h = all_scores_h[r0 : r0 + B_rows][:, None]
                _ph1, wf1, if1, _ts1 = extract_frame_labels_host(
                    garrs, sp[:, 0]
                )
                rank_labels = [(wf1, if1)]
                events_h = self._path_events_1best(garrs, sp[:, 0], wf1, if1)[
                    :, None
                ]
            else:
                from montreal_forced_aligner_tpu.ops.viterbi import (
                    nbest_backtrace_host,
                    nbest_word_events,
                )

                word_event, state0_hash = nbest_word_events(garrs)
                fscores, bps = _emit_and_nbest(
                    ff,
                    self._flens_dev(flens),
                    bgraph,
                    al._device_gmm[0],
                    al._device_gmm[1],
                    self.acoustic_scale,
                    nbest,
                    jnp.asarray(word_event),
                    jnp.asarray(state0_hash),
                )
                # backptr values encode arc_slot * K + rank; cast to int16
                # on device when they fit — bps is (T-1, B, S, K), by far
                # the largest fetch of the nbest path, and d2h is the
                # tunnel's slow direction
                Kin = garrs["in_src"].shape[2]
                if Kin * nbest <= 32767:
                    bps = bps.astype(jnp.int16)
                sp, scores_h, events_h = nbest_backtrace_host(
                    garrs, np.asarray(fscores), np.asarray(bps), flens, nbest
                )
                rank_labels = [
                    extract_frame_labels_host(garrs, sp[:, r])[1:3]
                    for r in range(sp.shape[1])
                ]
            for row, i in enumerate(batch):
                utt = corpus.utterances[i]
                Lf = int(flens[row])
                # hypotheses per rank, deduped by word sequence
                hyps: List[Tuple[str, float, List[CtmInterval]]] = []
                seen = set()
                for r in range(sp.shape[1]):
                    if scores_h[row, r] <= -1e29:
                        continue
                    word_f, inst_f = rank_labels[r]
                    ev_row = events_h[row, r, :Lf]
                    if nbest > 1 and "in_event" not in garrs:
                        ev_row = self._events_from_instances(
                            word_f[row, :Lf], inst_f[row, :Lf]
                        )
                    words = self._decode_words(
                        word_f[row, :Lf], ev_row, utt.begin, fs
                    )
                    text = " ".join(w.label for w in words)
                    if text in seen:
                        continue
                    seen.add(text)
                    hyps.append((text, float(scores_h[row, r]), words))
                if rescore_lm is not None and len(hyps) > 1:
                    hyps = self._rescore_hypotheses(
                        hyps, rescore_lm, rescore_weight
                    )
                if not hyps:
                    hyps = [("", float(scores_h[row, 0]), [])]
                best_text, best_score, best_words = hyps[0]
                results[i] = TranscriptionResult(
                    utterance_id=i,
                    text=best_text,
                    words=best_words,
                    log_likelihood=best_score,
                    alternatives=[(t, s) for t, s, _w in hyps]
                    if sp.shape[1] > 1
                    else None,
                )
        return results

    # -- LVCSR path ----------------------------------------------------------

    # device-resident record budget for one LVCSR decode dispatch; rows
    # beyond it split into sub-batches. Peak HBM runs ~2.5x this figure
    # (the backtrace's lax.scan stages a copy of its record xs), so the
    # default keeps peak near 10 GB of the ~16 GB a v5e chip has.
    # None = follow lvcsr._REC_BUDGET (env MFA_TPU_LVCSR_REC_BYTES),
    # which also gates the cross-word build fallback; set a number here
    # (or on an instance) to override just the batch split.
    LVCSR_REC_BYTES: Optional[float] = None

    def _rec_budget(self) -> float:
        if self.LVCSR_REC_BYTES is not None:
            return float(self.LVCSR_REC_BYTES)
        from montreal_forced_aligner_tpu.transcription import lvcsr as _lv

        return float(_lv._REC_BUDGET)

    # record dtype itemsizes, matching the kernels' .astype casts (single
    # source for the split estimates; see the docstrings of
    # lvcsr_nbest_device / lvcsr_xw_nbest_device / lvcsr_xw_decode_device)
    _I8, _I16, _I32, _F32 = 1, 2, 4, 4

    def _lvcsr_rec_bytes_per_frame_row(self, nbest: int = 1) -> int:
        """Per-(frame, batch-row) bytes of the decode records + scan-staged
        pdf emissions (used to cap rows per dispatch so the device-resident
        arrays fit HBM). Derived from the concrete record dtypes of each
        kernel rather than hand-kept constants."""
        from montreal_forced_aligner_tpu.transcription.lvcsr import (
            LvcsrXwGraph,
        )

        g = self._lvcsr_graph_for(nbest)
        K = max(1, nbest)
        # the checkpointed production paths pre-chunk emissions once
        # (split_emissions) and drop the original, so ONE f32 copy is
        # resident; the K-best paths still chunk inside the kernel while
        # the original stays live (2x)
        P_pdf = int(np.max(np.asarray(g.state_pdf))) + 1
        emit = self._F32 * P_pdf
        emit2 = 2 * self._F32 * P_pdf
        from montreal_forced_aligner_tpu.transcription.lvcsr_pm import (
            LvcsrPmGraph,
        )

        if isinstance(g, LvcsrPmGraph):
            # position-major checkpointed decode: one f32 alpha checkpoint
            # per _PM_TC frames over the (Pmax, C) grid; NO per-frame
            # records (the backtrace regenerates them chunk-locally — the
            # transient chunk records are T-independent and covered by the
            # budget's peak-HBM headroom factor)
            from montreal_forced_aligner_tpu.transcription.lvcsr_pm import (
                _PM_TC,
            )

            Sg = g.Pmax * g.C
            return (self._F32 * Sg) // _PM_TC + emit
        S = int(g.num_states)
        if isinstance(g, LvcsrXwGraph):
            Ne = len(g.entry_state)
            Nc = g.cell_exit_idx.shape[0]
            RG, F = g.rg_mask.shape
            P = g.num_p
            if K > 1:
                # lvcsr_xw_nbest_device recs: cand_sel i16 (S,K), ent_sel
                # i32 (Ne,K), bo2_sel i32 (Nseg=P*RG,K), exit_sel i32 (Nc,K)
                per = K * (
                    self._I16 * S
                    + self._I32 * Ne
                    + self._I32 * P * RG
                    + self._I32 * Nc
                ) + emit2
            else:
                # checkpointed cross-word decode: one f32 alpha checkpoint
                # per _EMIT_TC frames, no per-frame records (regenerated
                # chunk-locally by the backtrace; the build-time fallback
                # gate still uses the record-based xw_rec_bytes_per_frame_row
                # as a conservative bound)
                from montreal_forced_aligner_tpu.transcription.lvcsr import (
                    _XW_TC,
                )

                per = (self._F32 * S) // _XW_TC + emit
        else:
            U = g.exit_idx.shape[0]
            V = g.p1.shape[0]
            if K > 1:
                # lvcsr_nbest_device recs: cand_sel i16 (S,K), ent_sel i32
                # (V,K), bo_sel i32 (K,), exit_sel i16 (U,K)
                per = K * (
                    self._I16 * S
                    + self._I32 * V
                    + self._I32
                    + self._I16 * U
                ) + emit2
            else:
                # checkpointed decode: one f32 alpha checkpoint per
                # _EMIT_TC frames + the small per-frame junction records
                # (ent_src i8 (V), exit_arg u8 (U), bo_arg i32) + the
                # retained+staged f32 pdf emissions the backtrace
                # recompute consumes
                from montreal_forced_aligner_tpu.transcription.lvcsr import (
                    _EMIT_TC,
                )

                per = (
                    (self._F32 * S) // _EMIT_TC
                    + self._I8 * V
                    + self._I8 * U
                    + self._I32
                    + emit
                )
        return per

    def _lvcsr_split_rows(self, prepared, nbest: int = 1):
        """Split prepared batches into row chunks whose device-resident
        decode records fit :attr:`LVCSR_REC_BYTES`."""
        out = []
        budget = self._rec_budget()
        for batch, flens, garrs, bgraph, ff in prepared:
            T = int(ff.shape[1])
            per_row = T * self._lvcsr_rec_bytes_per_frame_row(nbest)
            max_rows = max(1, int(budget // max(per_row, 1)))
            if max_rows == 1 and per_row > budget:
                logger.warning(
                    "one LVCSR decode row needs %.1f GB of records "
                    "(T=%d) — over the %.1f GB budget even unsplit; "
                    "expect device OOM. Segment long audio first "
                    "(create_segments) or raise MFA_TPU_LVCSR_REC_BYTES.",
                    per_row / 1e9, T, budget / 1e9,
                )
            if len(batch) <= max_rows:
                out.append((batch, flens, garrs, bgraph, ff))
                continue
            logger.info(
                "LVCSR records would need %.1f GB at B=%d; splitting into "
                "chunks of %d rows",
                per_row * len(batch) / 1e9, len(batch), max_rows,
            )
            for i in range(0, len(batch), max_rows):
                out.append(
                    (
                        batch[i : i + max_rows],
                        flens[i : i + max_rows],
                        garrs,
                        bgraph,
                        ff[i : i + max_rows],
                    )
                )
        return out

    def _flens_dev(self, flens):
        """Device handle for a batch's frame-length array, shipped ONCE per
        array object (each extra device_put is a full round trip under
        tunnel congestion; flens was previously re-shipped 2-4x per batch
        across the decode phases)."""
        cache = getattr(self, "_flens_cache", None)
        if cache is None:
            cache = self._flens_cache = {}
        hit = cache.get(id(flens))
        if hit is not None and hit[0] is flens:
            return hit[1]
        if len(cache) > 512:
            cache.clear()
        dev = jnp.asarray(flens)
        cache[id(flens)] = (flens, dev)
        return dev

    def _lvcsr_graph_for(self, nbest: int = 1):
        """The graph object a decode with this ``nbest`` will actually run
        on: the position-major graph for 1-best; for K-best the junction
        kernels still use the chain-major layout, built lazily."""
        from montreal_forced_aligner_tpu.transcription.lvcsr_pm import (
            LvcsrPmGraph,
        )

        g = self._lvcsr
        if nbest > 1 and isinstance(g, LvcsrPmGraph):
            return self._legacy_flat_graph()
        return g

    def _legacy_flat_graph(self):
        """Chain-major word-internal graph for the K-best junction kernels
        (the 1-best production path is position-major; K-best has not moved
        yet). Built once and cached."""
        cached = getattr(self, "_lvcsr_legacy", None)
        if cached is None:
            from montreal_forced_aligner_tpu.transcription.lvcsr import (
                LvcsrGraphCompiler,
            )

            cached = self._lvcsr_legacy = LvcsrGraphCompiler(
                self.aligner.compiler, self.aligner.lexicon, self.lm,
                lm_scale=self.lm_scale,
                word_insertion_penalty=self.word_insertion_penalty,
                cross_word=False,
            ).build_word_internal_legacy()
        return cached

    def _lvcsr_dev(self, g=None):
        """Device-resident LVCSR graph tensors, shipped ONCE per graph.

        Re-shipping the junction tables per batch (the old
        ``jnp.asarray(g.band)``-per-call pattern) cost tens of MB of h2d
        transfer per batch at V=20k — the same class of bug the dense
        path's :meth:`_shared_graph_on_device` fixed."""
        from montreal_forced_aligner_tpu.transcription.lvcsr import (
            LvcsrXwGraph,
        )
        from montreal_forced_aligner_tpu.transcription.lvcsr_pm import (
            LvcsrPmGraph,
        )

        if g is None:
            g = self._lvcsr
        cache = getattr(self, "_lvcsr_dev_cache", None)
        if cache is None:
            cache = self._lvcsr_dev_cache = {}
        # entries hold the graph object itself, validated by identity (an
        # id() cannot be recycled while its entry lives)
        hit = cache.get(id(g))
        if hit is not None and hit[0] is g:
            return hit[1]
        if isinstance(g, LvcsrPmGraph):
            names = (
                "state_pdf", "band", "start", "exit_w_grid", "bo_c",
                "pred_c", "pred_w", "p1_c", "entry_w_c", "eos_c",
                "chain_word", "state_word",
            )
        elif isinstance(g, LvcsrXwGraph):
            names = (
                "state_pdf", "band", "start", "cell_exit_idx", "cell_exit_w",
                "bo_cell", "cell_seg", "rg_mask", "entry_state", "entry_word",
                "entry_w", "ebo_idx", "ebo_pad", "p1e", "se_cell", "se_w",
                "fin_state", "fin_w", "entry_slot_of_state", "state_word",
                "state0_hash",
            )
        else:
            names = (
                "state_pdf", "band", "start", "exit_idx", "exit_w",
                "entry_idx", "entry_word", "entry_w", "p1", "bo", "big_pred",
                "big_w", "eos", "entry_slot_of_state", "state_word",
                "state0_hash",
            )
        dev = {n: jnp.asarray(getattr(g, n)) for n in names}
        cache[id(g)] = (g, dev)
        return dev

    def _lvcsr_decode(self, ff, flens, W, gconsts):
        """Run the two-level decoder on one feature batch; returns the
        backtraces [(path, score, events)] per row."""
        handle = self._lvcsr_decode_device(ff, flens, W, gconsts)
        return self._lvcsr_rows(
            self._lvcsr_backtrace_device_dispatch(
                handle, flens, T=int(ff.shape[1])
            ),
            flens,
        )

    def _lvcsr_backtrace_device_dispatch(self, handle, flens, T: int = 0):
        """Dispatch the device reverse-scan backtrace; returns device
        (path (B,T), word_at (B,T), score (B,)) arrays (async). ``T``
        slices off the decode's inert emission-chunk padding."""
        from montreal_forced_aligner_tpu.transcription.lvcsr import (
            lvcsr_backtrace_device,
            lvcsr_xw_backtrace_device,
        )

        kind, payload = handle
        g = self._lvcsr
        d = self._lvcsr_dev()
        if kind == "pm_ckpt":
            from montreal_forced_aligner_tpu.transcription.lvcsr_pm import (
                lvcsr_pm_backtrace_ckpt_device,
            )

            alpha_T, ckpts, ep = payload
            return lvcsr_pm_backtrace_ckpt_device(
                alpha_T, ckpts, ep,
                d["state_pdf"], self._flens_dev(flens), d["band"],
                d["exit_w_grid"], d["eos_c"], d["bo_c"], d["pred_c"],
                d["pred_w"], d["p1_c"], d["entry_w_c"], d["chain_word"],
                d["state_word"], g.lbp, g.ubp,
                T or int(ep.shape[0] * ep.shape[1] + 1),
            )
        if kind == "xw_ckpt":
            from montreal_forced_aligner_tpu.transcription.lvcsr import (
                lvcsr_xw_backtrace_ckpt_device,
            )

            alpha_T, ckpts, ep = payload
            RG, F = g.rg_mask.shape
            return lvcsr_xw_backtrace_ckpt_device(
                alpha_T, ckpts, ep,
                d["state_pdf"], self._flens_dev(flens), d["band"],
                d["cell_exit_idx"], d["cell_exit_w"], d["bo_cell"],
                d["cell_seg"], d["rg_mask"], d["entry_state"],
                d["entry_w"], d["ebo_idx"], d["ebo_pad"], d["p1e"],
                d["se_cell"], d["se_w"], d["fin_state"], d["fin_w"],
                d["entry_word"], d["entry_slot_of_state"], d["state_word"],
                g.lb, g.ub, g.num_p, F, RG,
                T or int(ep.shape[0] * ep.shape[1] + 1),
            )
        if kind == "xw":
            alpha_T, recs = payload
            RG, F = g.rg_mask.shape
            return lvcsr_xw_backtrace_device(
                alpha_T, recs, self._flens_dev(flens),
                d["fin_state"], d["fin_w"], d["entry_word"],
                d["entry_slot_of_state"], d["se_cell"], d["ebo_idx"],
                d["cell_exit_idx"], d["state_word"],
                g.lb, F, RG, T,
            )
        if kind == "flat_ckpt":
            from montreal_forced_aligner_tpu.transcription.lvcsr import (
                lvcsr_backtrace_ckpt_device,
            )

            alpha_T, ckpts, recs, emit_pdf = payload
            return lvcsr_backtrace_ckpt_device(
                alpha_T, ckpts, recs, emit_pdf,
                d["state_pdf"], self._flens_dev(flens), d["band"],
                d["exit_idx"], d["exit_w"], d["eos"], d["entry_idx"],
                d["entry_word"], d["entry_w"], d["p1"], d["bo"],
                d["big_pred"], d["big_w"], d["entry_slot_of_state"],
                d["state_word"], g.lb, g.ub, T or int(emit_pdf.shape[1]),
            )
        alpha_T, recs = payload
        return lvcsr_backtrace_device(
            alpha_T, recs, self._flens_dev(flens),
            d["exit_idx"], d["exit_w"], d["eos"], d["entry_word"],
            d["entry_slot_of_state"], d["big_pred"], d["state_word"],
            g.lb, T,
        )

    @staticmethod
    def _lvcsr_rows(bt, flens):
        """Assemble host rows [(path (T,), score, events)] from the device
        backtrace outputs (events = ascending (frame, word) junction
        crossings, same contract as ``lvcsr_backtrace_host``)."""
        path_d, word_d, score_d = bt
        path_h = np.asarray(path_d)
        word_h = np.asarray(word_d)
        score_h = np.asarray(score_d)
        rows = []
        for b in range(path_h.shape[0]):
            L = int(flens[b])
            wrow = word_h[b, :L]
            events = [(int(t), int(w)) for t, w in enumerate(wrow) if w >= 0]
            rows.append((path_h[b], float(score_h[b]), events))
        return rows

    def _lvcsr_decode_device(self, ff, flens, W, gconsts):
        """Device half: dispatch the junction DP; returns an async handle
        for :meth:`_lvcsr_backtrace`."""
        from montreal_forced_aligner_tpu.transcription.lvcsr import (
            LvcsrXwGraph,
            lvcsr_decode_ckpt_device,
        )
        from montreal_forced_aligner_tpu.transcription.lvcsr_pm import (
            LvcsrPmGraph,
            lvcsr_pm_decode_ckpt_device,
        )

        g = self._lvcsr
        d = self._lvcsr_dev()
        emit_pdf = _lvcsr_emissions(ff, W, gconsts, self.acoustic_scale)
        if isinstance(g, LvcsrPmGraph):
            from montreal_forced_aligner_tpu.transcription.lvcsr import (
                split_emissions,
            )
            from montreal_forced_aligner_tpu.transcription.lvcsr_pm import (
                _PM_TC,
            )

            # chunk once and drop emit_pdf: halves emission HBM residency
            e0, ep = split_emissions(emit_pdf, _PM_TC)
            del emit_pdf
            alpha_T, ckpts = lvcsr_pm_decode_ckpt_device(
                e0,
                ep,
                d["state_pdf"],
                self._flens_dev(flens),
                d["band"],
                d["start"],
                d["exit_w_grid"],
                d["bo_c"],
                d["pred_c"],
                d["pred_w"],
                d["p1_c"],
                d["entry_w_c"],
                g.lbp,
                g.ubp,
            )
            return ("pm_ckpt", (alpha_T, ckpts, ep))
        if isinstance(g, LvcsrXwGraph):
            from montreal_forced_aligner_tpu.transcription.lvcsr import (
                _XW_TC,
                lvcsr_xw_decode_ckpt_device,
                split_emissions,
            )

            e0, ep = split_emissions(emit_pdf, _XW_TC)
            del emit_pdf
            alpha_T, ckpts = lvcsr_xw_decode_ckpt_device(
                e0,
                ep,
                d["state_pdf"],
                self._flens_dev(flens),
                d["band"],
                d["start"],
                d["cell_exit_idx"],
                d["cell_exit_w"],
                d["bo_cell"],
                d["cell_seg"],
                d["rg_mask"],
                d["entry_state"],
                d["entry_w"],
                d["ebo_idx"],
                d["ebo_pad"],
                d["p1e"],
                d["se_cell"],
                d["se_w"],
                g.lb,
                g.ub,
                g.num_p,
            )
            return ("xw_ckpt", (alpha_T, ckpts, ep))
        alpha_T, ckpts, recs = lvcsr_decode_ckpt_device(
            emit_pdf,
            d["state_pdf"],
            self._flens_dev(flens),
            d["band"],
            d["start"],
            d["exit_idx"],
            d["exit_w"],
            d["entry_idx"],
            d["entry_word"],
            d["entry_w"],
            d["p1"],
            d["bo"],
            d["big_pred"],
            d["big_w"],
            g.lb,
            g.ub,
        )
        return ("flat_ckpt", (alpha_T, ckpts, recs, emit_pdf))

    def _lvcsr_nbest_decode(self, ff, flens, W, gconsts, nbest):
        """K-best junction decode on one feature batch; returns per-row
        hypothesis lists [(path, score, events)], best first. Both junction
        variants (word-internal and cross-word-context) run the K-best
        semiring with word-sequence-hash determinization."""
        from montreal_forced_aligner_tpu.transcription.lvcsr import (
            LvcsrXwGraph,
            lvcsr_nbest_device,
            lvcsr_xw_nbest_backtrace_host,
            lvcsr_xw_nbest_device,
        )

        # K-best kernels run the chain-major layout; a position-major
        # production graph routes through the lazily built legacy graph
        g = self._lvcsr_graph_for(nbest)
        d = self._lvcsr_dev(g)
        emit_pdf = _lvcsr_emissions(ff, W, gconsts, self.acoustic_scale)
        if isinstance(g, LvcsrXwGraph):
            ka = g.kbest_arrays()
            alpha_T, hist_T, recs = lvcsr_xw_nbest_device(
                emit_pdf,
                d["state_pdf"],
                self._flens_dev(flens),
                d["band"],
                d["start"],
                d["state0_hash"],
                d["cell_exit_idx"],
                d["cell_exit_w"],
                d["bo_cell"],
                jnp.asarray(ka["seg_cells"]),
                jnp.asarray(ka["seg_pad"]),
                d["entry_state"],
                d["entry_word"],
                d["entry_w"],
                d["p1e"],
                d["se_cell"],
                d["se_w"],
                jnp.asarray(ka["ebo_seg"]),
                jnp.asarray(ka["ebo_seg_pad"]),
                g.lb,
                g.ub,
                nbest,
            )
            rows = lvcsr_xw_nbest_backtrace_host(
                g, np.asarray(alpha_T), np.asarray(hist_T), recs, flens,
                nbest, T=int(ff.shape[1]),
            )
            return rows, g
        alpha_T, hist_T, recs = lvcsr_nbest_device(
            emit_pdf,
            d["state_pdf"],
            self._flens_dev(flens),
            d["band"],
            d["start"],
            d["state0_hash"],
            d["exit_idx"],
            d["exit_w"],
            d["entry_idx"],
            d["entry_word"],
            d["entry_w"],
            d["p1"],
            d["bo"],
            d["big_pred"],
            d["big_w"],
            g.lb,
            g.ub,
            nbest,
        )
        # DEVICE backtrace: the per-frame selection records — (T, B, S, K)
        # int16 cand_sel alone is ~3 GB per 9 s row at V=20k — never cross
        # the link; only the (B, H) final selections and (B, H, T) paths do
        # (the host backtrace remains as the pinned reference)
        from montreal_forced_aligner_tpu.transcription.lvcsr import (
            lvcsr_nbest_backtrace_device,
            lvcsr_nbest_final_select_device,
        )

        scores_d, s0_d, rk0_d = lvcsr_nbest_final_select_device(
            alpha_T, hist_T, d["exit_idx"], d["exit_w"], d["eos"], nbest
        )
        path_d, word_d = lvcsr_nbest_backtrace_device(
            s0_d, rk0_d, recs, self._flens_dev(flens),
            d["entry_word"], d["entry_slot_of_state"], d["big_pred"],
            d["exit_idx"], d["state_word"], g.lb, g.ub, nbest,
            T=int(ff.shape[1]),
        )
        from montreal_forced_aligner_tpu.training.base import (
            start_host_copies,
        )

        start_host_copies((scores_d, path_d, word_d))
        scores = np.asarray(scores_d)
        paths = np.asarray(path_d)
        words = np.asarray(word_d)
        rows = []
        for b in range(paths.shape[0]):
            L = int(flens[b])
            hyps = []
            for h in range(paths.shape[1]):
                sc = float(scores[b, h])
                if sc <= NEG_INF / 2:
                    continue
                wrow = words[b, h, :L]
                events = [
                    (int(t), int(w)) for t, w in enumerate(wrow) if w >= 0
                ]
                hyps.append((paths[b, h], sc, events))
            rows.append(hyps)
        return rows, g

    def _lvcsr_words(
        self, g, path, events, L: int, begin: float, fs
    ) -> List[CtmInterval]:
        words: List[CtmInterval] = []
        wf = g.state_word[path[:L]]
        for e_idx, (t0, v) in enumerate(events):
            t1 = events[e_idx + 1][0] if e_idx + 1 < len(events) else L
            span = np.nonzero(wf[t0:t1] == v)[0]
            end = t0 + (int(span[-1]) + 1 if len(span) else t1 - t0)
            words.append(
                CtmInterval(begin + t0 * fs, begin + end * fs, g.words[v])
            )
        return words

    def _transcribe_prepared_lvcsr(
        self,
        prepared,
        corpus: Corpus,
        fs,
        nbest: int = 1,
        rescore_lm: Optional[ArpaModel] = None,
        rescore_weight: float = 1.0,
    ):
        al = self.aligner
        results: Dict[int, TranscriptionResult] = {}
        # prepared arrives already split by transcribe_corpus (splitting
        # again here is idempotent but double-logs the OOM warnings)
        bts = None
        if nbest <= 1:
            # dispatch every batch's junction DP, then every batch's
            # DEVICE backtrace (the O(T*S) records never cross the link;
            # only the (B, T) paths do), before blocking on any fetch
            from montreal_forced_aligner_tpu.training.base import (
                start_host_copies,
            )

            # interleave decode/backtrace dispatch per batch: execution
            # follows dispatch order, so batch i's records are freed by
            # its backtrace before batch i+1's decode materializes them —
            # peak HBM stays ~one LVCSR_REC_BYTES chunk
            bts = []
            for _batch, flens, _garrs, _bg, ff in prepared:
                handle = self._lvcsr_decode_device(
                    ff, flens, al._device_gmm[0], al._device_gmm[1]
                )
                bts.append(
                    self._lvcsr_backtrace_device_dispatch(
                        handle, flens, T=int(ff.shape[1])
                    )
                )
                del handle
            start_host_copies(bts)
        for bi, (batch, flens, _garrs, _bg, ff) in enumerate(prepared):
            if nbest <= 1:
                g_used = self._lvcsr
                rows = [
                    [trace]
                    for trace in self._lvcsr_rows(bts[bi], flens)
                ]
            else:
                rows, g_used = self._lvcsr_nbest_decode(
                    ff, flens, al._device_gmm[0], al._device_gmm[1], nbest
                )
            for row, i in enumerate(batch):
                utt = corpus.utterances[i]
                L = int(flens[row])
                hyps: List[Tuple[str, float, List[CtmInterval]]] = []
                for path, score, events in rows[row]:
                    words = self._lvcsr_words(
                        g_used, path, events, L, utt.begin, fs
                    )
                    hyps.append(
                        (" ".join(w.label for w in words), score, words)
                    )
                if rescore_lm is not None and len(hyps) > 1:
                    hyps = self._rescore_hypotheses(
                        hyps, rescore_lm, rescore_weight
                    )
                if not hyps:  # no finite complete path (utterance too short)
                    hyps = [("", float(NEG_INF), [])]
                best_text, best_score, best_words = hyps[0]
                results[i] = TranscriptionResult(
                    utterance_id=i,
                    text=best_text,
                    words=best_words,
                    log_likelihood=best_score,
                    alternatives=[(t, s) for t, s, _w in hyps]
                    if len(hyps) > 1
                    else None,
                    cross_word_fallback=self.cross_word_fallback,
                )
        return results

    def _fmllr_decode_feats(self, prepared, corpus: Corpus, speaker_index):
        """Two-pass SAT decoding: first-pass decode with the
        speaker-independent alignment model, per-speaker fMLLR from the
        first-pass labels (silence-weighted), then adapted features for the
        final decode (reference ``transcription/transcriber.py:1120-1198``
        InitialFmllr/FinalFmllr decode functions)."""
        from montreal_forced_aligner_tpu.align.aligner import _emit_and_align
        from montreal_forced_aligner_tpu.ops.feats import (
            apply_per_speaker_transform,
        )
        from montreal_forced_aligner_tpu.ops.transforms import (
            accumulate_fmllr_stats,
            estimate_speaker_fmllr,
        )

        al = self.aligner
        num_speakers = len(corpus.speakers)
        gmm = al.model.gmm
        # device-resident two-pass constants, cached on the aligner across
        # calls (re-shipping them is seconds at SAT scale on remote TPUs)
        W1, gc1, _w_rows1, means, iv, gc, miv = al._fmllr_params_on()
        sil_pdfs = al._silence_pdfs()

        D = gmm.dim
        K = np.zeros((num_speakers, D, D + 1))
        G = np.zeros((num_speakers, D, D + 1, D + 1))
        beta = np.zeros(num_speakers)
        firstpass = []
        for batch, flens, garrs, bgraph, ff in prepared:
            if self._lvcsr is not None:
                traces = self._lvcsr_decode(ff, flens, W1, gc1)
                sp = np.stack([t[0] for t in traces])
                frame_pdf = self._lvcsr.state_pdf[sp]
            else:
                state_path, _sc = _emit_and_align(
                    ff, self._flens_dev(flens), bgraph, W1, gc1, self.acoustic_scale
                )
                sp = np.asarray(state_path)
                b = np.arange(sp.shape[0])[:, None]
                frame_pdf = garrs["state_pdf"][b, sp]
            weight = (~np.isin(frame_pdf, sil_pdfs)).astype(np.float32)
            spk_idx = np.array(
                [speaker_index[corpus.utterances[i].speaker] for i in batch],
                np.int32,
            )
            out = accumulate_fmllr_stats(
                ff,
                self._flens_dev(flens),
                jnp.asarray(frame_pdf),
                jnp.asarray(spk_idx),
                jnp.asarray(weight),
                means,
                iv,
                gc,
                miv,
                num_speakers,
            )
            firstpass.append((spk_idx, out))
        for _spk, (k, g, bta) in firstpass:
            K += np.asarray(k)
            G += np.asarray(g)
            beta += np.asarray(bta)
        transforms = estimate_speaker_fmllr(
            K, G, beta, min_count=al.config.fmllr_min_count
        )
        trans_j = jnp.asarray(transforms)
        out_prepared = []
        for (batch, flens, garrs, bgraph, ff), (spk_idx, _o) in zip(
            prepared, firstpass
        ):
            adapted = apply_per_speaker_transform(
                ff, jnp.asarray(spk_idx), trans_j
            )
            out_prepared.append((batch, flens, garrs, bgraph, adapted))
        return out_prepared

    def transcribe_corpus_per_speaker(
        self, corpus: Corpus, lm_order: int = 3, **kwargs
    ) -> Dict[int, TranscriptionResult]:
        """Decode each speaker's utterances against an LM trained on that
        speaker's own transcripts (the reference's per-speaker-LM
        transcription check, ``PerSpeakerDecodeFunction``,
        ``transcription/multiprocessing.py:1454``; used by
        ``mfa validate --test_transcriptions``)."""
        results: Dict[int, TranscriptionResult] = {}
        by_speaker: Dict[str, List[int]] = {}
        for utt in corpus.utterances:
            by_speaker.setdefault(utt.speaker, []).append(utt.id)
        for speaker, utt_ids in by_speaker.items():
            texts = [
                " ".join(
                    self.aligner.tokenizer.tokenize(corpus.utterances[i].text)
                )
                for i in utt_ids
            ]
            self.lm, _ = train_lm_from_texts(texts, order=lm_order)
            self._graph = None  # rebuild for this speaker's LM
            self._lvcsr = None
            self._lvcsr_legacy = None
            self._lvcsr_dev_cache = {}
            sub = corpus.subset(utt_ids)
            sub_results = self.transcribe_corpus(sub, **kwargs)
            for local_id, res in sub_results.items():
                orig = utt_ids[local_id]
                res.utterance_id = orig
                results[orig] = res
        return results

    def _rescore_hypotheses(
        self,
        hyps: List[Tuple[str, float, List[CtmInterval]]],
        rescore_lm: ArpaModel,
        rescore_weight: float,
    ) -> List[Tuple[str, float, List[CtmInterval]]]:
        """Swap the decoding LM's score for the rescoring LM's on each
        hypothesis and re-rank (exact N-best equivalent of lattice LM
        rescoring: subtract G_small, add G_big)."""
        builder_scale = self.lm_scale
        rescored = []
        for text, score, words in hyps:
            seq = text.split()
            old_lm = builder_scale * self.lm.sentence_log_prob(seq) * LN10
            new_lm = rescore_weight * rescore_lm.sentence_log_prob(seq) * LN10
            rescored.append((text, score - old_lm + new_lm, words))
        rescored.sort(key=lambda h: -h[1])
        return rescored

    def _path_events_1best(self, garrs, sp, word_f, inst_f) -> np.ndarray:
        """(B, T) word-entry events for densified 1-best paths. The densified
        kernel loses arc identity, so events are inferred from the states:
        word-entry states have only word-entry arcs plus their self-loop
        (left-to-right HMMs have no internal back arcs), so any move into one
        begins a word. A one-state word's immediate no-silence repeat is
        indistinguishable from its self-loop here and stays merged (the
        ``nbest > 1`` path resolves it exactly via per-arc events)."""
        B, T = sp.shape
        if "in_event" in garrs:
            is_entry = (garrs["in_event"] >= 0).any(axis=2)  # (B, S)
            b = np.arange(B)[:, None]
            entry_f = is_entry[b, sp]
            moved = np.ones((B, T), bool)
            moved[:, 1:] = sp[:, 1:] != sp[:, :-1]
            fire = entry_f & moved
        else:
            fire = np.zeros((B, T), bool)
            fire[:, 1:] = inst_f[:, 1:] != inst_f[:, :-1]
            fire[:, 0] = True
        fire[:, 0] = True
        return np.where(fire & (word_f >= 0), word_f, -1).astype(np.int32)

    def _events_from_instances(self, word_f, inst_f) -> np.ndarray:
        """Instance-crossing word events for graphs without arc events."""
        fire = np.empty(len(word_f), bool)
        fire[0] = True
        fire[1:] = inst_f[1:] != inst_f[:-1]
        return np.where(fire & (word_f >= 0), word_f, -1).astype(np.int32)

    def _decode_words(self, word_f, events, offset, fs) -> List[CtmInterval]:
        """Per-frame word labels + word-entry events → word CTM intervals.
        A new interval starts at every event; frames continuing the same
        word with no event extend the current interval (a word's interior
        instance crossings fire no event)."""
        words: List[CtmInterval] = []
        cur: Optional[CtmInterval] = None
        cur_w = -1
        for t in range(len(word_f)):
            w = int(word_f[t])
            if w < 0:
                cur = None
                continue
            if cur is not None and cur_w == w and events[t] < 0:
                cur.end = offset + (t + 1) * fs
            else:
                cur = CtmInterval(
                    offset + t * fs, offset + (t + 1) * fs, self._vocab[w]
                )
                words.append(cur)
                cur_w = w
        return words

    def evaluate(
        self, corpus: Corpus, results: Dict[int, TranscriptionResult]
    ) -> dict:
        """WER/CER against the corpus transcripts (reference
        ``transcriber.py:127-512``)."""
        from montreal_forced_aligner_tpu.evaluation import score_cer, score_wer

        wers, cers = [], []
        for utt in corpus.utterances:
            if utt.id not in results:
                continue
            ref = self.aligner.tokenizer.tokenize(utt.text)
            hyp = results[utt.id].text.split()
            wers.append(score_wer(ref, hyp))
            cers.append(score_cer(" ".join(ref), " ".join(hyp)))
        return {
            "wer": float(np.mean(wers)) if wers else 1.0,
            "cer": float(np.mean(cers)) if cers else 1.0,
            "num_utterances": len(wers),
        }


def train_phone_lm(
    results: Dict[int, "UtteranceAlignment"], order: int = 4
) -> ArpaModel:
    """Train a phone LM from aligned phone sequences (reference
    ``train_phone_lm``, ``transcription/transcriber.py:737-760``)."""
    texts = []
    for aln in results.values():
        phones = [p.label for p in aln.phones]
        texts.append(" ".join(phones))
    model, _counter = train_lm_from_texts(texts, order=order)
    return model
