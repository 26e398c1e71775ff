"""Corpus-level Kaldi-parity harness.

Runs the production alignment path and the independent reference decoder
(:mod:`reference_decoder`) on the same corpus/model/dictionary and reports
frame- and boundary-level agreement. This is the in-repo stand-in for the
BASELINE.md target ("≥98 % phone-boundary agreement @ ±10 ms vs MFA
``english_us_arpa`` on LibriSpeech dev-clean", metric per reference
``helper.py:671``): point it at any corpus + MFA model the moment network /
hardware allow — e.g.

    python -m montreal_forced_aligner_tpu.parity.harness \
        CORPUS_DIR DICT MODEL_ZIP

Both paths share audio, features and the GMM (features are validated
against an independent DSP reference in ``tests/test_mfcc.py``); the graph
expansion and Viterbi DP are fully independent, so any drift in graph
weights, topology handling, optional-silence semantics, scales, or DP
tie-handling shows up as disagreement here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np


@dataclass
class UtteranceParity:
    utterance_id: int
    num_frames: int
    frame_mismatches: int  # frames whose phone differs
    boundary_total: int
    boundary_exact: int  # boundaries agreeing to the frame
    boundary_within_1: int  # boundaries within ±1 frame (±10 ms)
    score_production: float
    score_reference: float

    @property
    def frame_agreement(self) -> float:
        return 1.0 - self.frame_mismatches / max(self.num_frames, 1)


def production_frame_phones(aln, num_frames: int, frame_shift: float, begin: float):
    """Reconstruct per-frame phone labels from production CTM intervals."""
    labels = [None] * num_frames
    for p in aln.phones:
        f0 = int(round((p.begin - begin) / frame_shift))
        f1 = int(round((p.end - begin) / frame_shift))
        for f in range(f0, min(f1, num_frames)):
            labels[f] = p.label
    return labels


def _strip_pos(name: str) -> str:
    for pos in ("_B", "_E", "_I", "_S"):
        if name.endswith(pos):
            return name[: -len(pos)]
    return name


def compare_corpus(
    aligner,
    corpus,
    beam: float = float("inf"),
    max_utterances: Optional[int] = None,
) -> List[UtteranceParity]:
    """Aligns ``corpus`` with the production ``PretrainedAligner`` and with
    the independent reference decoder, returning per-utterance parity."""
    import jax.numpy as jnp

    from montreal_forced_aligner_tpu.align.aligner import (
        _final_feats,
        _mfcc_and_sums,
    )
    from montreal_forced_aligner_tpu.ops.mfcc import pad_waves_for_mfcc
    from montreal_forced_aligner_tpu.parity.reference_decoder import (
        ReferenceAligner,
    )

    results = aligner.align_corpus(corpus)
    ref = ReferenceAligner(
        aligner.model.transition_model,
        aligner.model.tree,
        aligner.lexicon,
        transition_scale=aligner.config.transition_scale,
        self_loop_scale=aligner.config.self_loop_scale,
        acoustic_scale=aligner.config.acoustic_scale,
    )
    phone_names = aligner.model.phone_names

    # recompute the production features per utterance (identical code path
    # to the aligner: MFCC -> per-speaker CMVN -> deltas/LDA)
    speaker_index = corpus.speaker_index
    cfg = aligner.mfcc_config
    waves = corpus.load_audio_parallel(cfg.sample_rate)
    spk_sum: Dict[int, np.ndarray] = {}
    spk_n: Dict[int, float] = {}
    feats_per_utt = []
    for utt, w in zip(corpus.utterances, waves):
        L = ((len(w) + 15999) // 16000) * 16000
        padded, lens = pad_waves_for_mfcc([w], cfg, L)
        flens = np.array([cfg.num_frames(int(lens[0]))], np.int32)
        feats, sums = _mfcc_and_sums(
            jnp.asarray(padded), jnp.asarray(flens), cfg, cfg.num_frames(L)
        )
        feats = np.asarray(feats)[0, : flens[0]]
        s = speaker_index[utt.speaker]
        spk_sum[s] = spk_sum.get(s, 0) + np.asarray(sums)[0]
        spk_n[s] = spk_n.get(s, 0.0) + float(flens[0])
        feats_per_utt.append(feats)

    lda = (
        jnp.asarray(aligner.model.lda_mat)
        if aligner.model.uses_lda and aligner.model.lda_mat is not None
        else None
    )
    out = []
    utts = corpus.utterances[:max_utterances] if max_utterances else corpus.utterances
    for utt, feats in zip(utts, feats_per_utt):
        s = speaker_index[utt.speaker]
        mean = (spk_sum[s] / max(spk_n[s], 1.0)).astype(np.float32)
        T = feats.shape[0]
        ff = _final_feats(
            jnp.asarray(feats[None]),
            jnp.asarray(np.array([T], np.int32)),
            jnp.asarray(mean[None]),
            lda,
            None,
        )
        ff = np.asarray(ff)[0, :T]
        tokens = utt.normalized_tokens or aligner.tokenizer.tokenize(utt.text)
        gmm = aligner.model.gmm
        if aligner.config.boost_silence != 1.0:
            import copy as _copy
            import math as _math

            gmm = _copy.deepcopy(gmm)
            gmm.gconsts = gmm.gconsts.copy()
            gmm.gconsts[aligner._silence_pdfs()] += _math.log(
                aligner.config.boost_silence
            )
        ll = ref.loglikes_for(ff, gmm)
        tids, phones, score = ref.align(ll, tokens, beam=beam)
        aln = results[utt.id]
        prod_labels = production_frame_phones(
            aln, T, aligner.frame_shift, utt.begin
        )
        ref_labels = [
            _strip_pos(phone_names.get(int(p), str(p))) for p in phones
        ]
        mismatches = sum(
            1 for a, b in zip(prod_labels, ref_labels) if a != b
        )

        def boundaries(labels):
            return {
                f
                for f in range(1, len(labels))
                if labels[f] != labels[f - 1]
            }

        b_prod = boundaries(prod_labels)
        b_ref = boundaries(ref_labels)
        exact = len(b_prod & b_ref)
        within1 = sum(
            1
            for b in b_ref
            if b in b_prod or (b - 1) in b_prod or (b + 1) in b_prod
        )
        out.append(
            UtteranceParity(
                utterance_id=utt.id,
                num_frames=T,
                frame_mismatches=mismatches,
                boundary_total=len(b_ref),
                boundary_exact=exact,
                boundary_within_1=within1,
                score_production=aln.log_likelihood,
                score_reference=score,
            )
        )
    return out


def main(argv=None):
    import argparse

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("corpus_directory")
    ap.add_argument("dictionary_path")
    ap.add_argument("acoustic_model_path")
    ap.add_argument("--beam", type=float, default=float("inf"))
    ap.add_argument("--max_utterances", type=int, default=None)
    args = ap.parse_args(argv)
    aligner = PretrainedAligner(
        args.acoustic_model_path, args.dictionary_path, AlignerConfig()
    )
    corpus = Corpus.load(args.corpus_directory)
    report = compare_corpus(
        aligner, corpus, beam=args.beam, max_utterances=args.max_utterances
    )
    frames = sum(r.num_frames for r in report)
    mism = sum(r.frame_mismatches for r in report)
    b_tot = sum(r.boundary_total for r in report)
    b_exact = sum(r.boundary_exact for r in report)
    b_w1 = sum(r.boundary_within_1 for r in report)
    print(
        f"utterances={len(report)} frames={frames} "
        f"frame_agreement={1 - mism / max(frames,1):.4%} "
        f"boundary_exact={b_exact}/{b_tot} "
        f"boundary_within_10ms={b_w1 / max(b_tot,1):.4%}"
    )
    for r in report:
        print(
            f"  utt {r.utterance_id}: frames={r.num_frames} "
            f"mismatch={r.frame_mismatches} "
            f"score prod={r.score_production:.2f} ref={r.score_reference:.2f}"
        )


if __name__ == "__main__":
    main()
