"""Single-utterance ("online") alignment API.

Behavioral spec: reference ``online/alignment.py:29-123``
(``align_utterance_online``: tokenize → graph compile → MFCC + utterance
CMVN → align → CTM), the path behind ``mfa align_one`` and the fork's
``wrapper.MFA`` batch API. Unlike the corpus pipeline, CMVN is estimated
from the single utterance itself.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.corpus.corpus import Utterance
from montreal_forced_aligner_tpu.data import UtteranceAlignment
from montreal_forced_aligner_tpu.graph.compiler import batch_graphs, ship_graph_to_device
from montreal_forced_aligner_tpu.ops.mfcc import pad_waves_for_mfcc
from montreal_forced_aligner_tpu.ops.viterbi import (
    band_limits_from_arcs,
    extract_frame_labels_host,
)

# frames above which align_utterance_online switches to the checkpointed
# chunked Viterbi (10 ms frames: 60000 ~= 10 minutes)
LONG_UTTERANCE_FRAMES = 60000


def align_utterance_online(
    aligner,
    samples: np.ndarray,
    text: str,
    utterance_id: int = 0,
) -> UtteranceAlignment:
    """Align one waveform (int16-scaled float samples at the model's sample
    rate) against its transcript with a loaded
    :class:`~montreal_forced_aligner_tpu.align.aligner.PretrainedAligner`."""
    from montreal_forced_aligner_tpu.align.aligner import (
        _emit_and_align,
        _final_feats,
        _mfcc_and_sums,
        _round_up,
        frames_to_alignment,
    )

    tokens = aligner.tokenizer.tokenize(text)
    if aligner.g2p is not None:
        aligner._add_g2p_pronunciations(tokens)
    graph = aligner.compiler.compile(tokens)

    L = _round_up(len(samples), 16000)
    padded, lens = pad_waves_for_mfcc([samples], aligner.mfcc_config, L)
    flens = np.array(
        [aligner.mfcc_config.num_frames(int(n)) for n in lens], np.int32
    )
    feats, sums = _mfcc_and_sums(
        jnp.asarray(padded),
        jnp.asarray(flens),
        aligner.mfcc_config,
        aligner.mfcc_config.num_frames(L),
    )
    # single-utterance CMVN (reference ``online/alignment.py:86-88``)
    mean = np.asarray(sums)[0] / max(int(flens[0]), 1)
    lda = (
        jnp.asarray(aligner.model.lda_mat)
        if (aligner.model.uses_lda and aligner.model.lda_mat is not None)
        else None
    )
    ff = _final_feats(
        feats, jnp.asarray(flens), jnp.asarray(mean[None].astype(np.float32)), lda
    )
    garrs = batch_graphs([graph])
    Lf0 = int(flens[0])
    model = aligner.model
    is_long = Lf0 > LONG_UTTERANCE_FRAMES
    bgraph = None if is_long else ship_graph_to_device(garrs)
    band_limits = None if is_long else band_limits_from_arcs(garrs)

    def decode(ff_in, W_d, gc_d, w_rows_d):
        """One decode pass on either kernel (chunked beyond ~10 min:
        O(T*S) backpointers + emissions stop fitting HBM)."""
        if is_long:
            from montreal_forced_aligner_tpu.ops.long_viterbi import (
                viterbi_align_long,
            )

            path, score = viterbi_align_long(
                np.asarray(ff_in[0, :Lf0]),
                garrs,
                W_d,
                gc_d,
                acoustic_scale=aligner.config.acoustic_scale,
            )
            return path[None], np.array([score], np.float32)
        state_path, sc = _emit_and_align(
            ff_in,
            jnp.asarray(flens),
            bgraph,
            W_d,
            gc_d,
            aligner.config.acoustic_scale,
            band_limits=band_limits,
            w_rows=w_rows_d,
        )
        return np.asarray(state_path), sc

    # SAT models run the reference's two-pass online semantics
    # (online/alignment.py:29-123: SI first pass -> single-utterance
    # fMLLR -> adapted second pass); --single_speaker SI mode aligns with
    # final.alimdl only, matching the corpus path
    two_pass = (
        model.uses_fmllr
        and model.alignment_model is not None
        and aligner.config.uses_speaker_adaptation
    )
    si_mode = (
        not aligner.config.uses_speaker_adaptation
        and model.uses_fmllr
        and model.alignment_model is not None
    )
    if two_pass:
        from montreal_forced_aligner_tpu.ops.feats import (
            apply_per_speaker_transform,
            silence_pdf_mask,
        )
        from montreal_forced_aligner_tpu.ops.transforms import (
            accumulate_fmllr_stats,
            estimate_speaker_fmllr,
        )

        W1, gc1, w_rows1, means, iv, gc, miv = aligner._fmllr_params_on()
        sp1, _sc1 = decode(ff, W1, gc1, w_rows1)
        frame_pdf = np.asarray(garrs["state_pdf"])[0][
            np.asarray(sp1[0], np.int64)
        ][None, :]
        sil = silence_pdf_mask(
            aligner._silence_pdfs(), model.gmm.num_pdfs
        )
        weight = (1.0 - np.asarray(sil)[frame_pdf]).astype(np.float32)
        K, G, beta = accumulate_fmllr_stats(
            jnp.asarray(np.asarray(ff[:, : frame_pdf.shape[1]])),
            jnp.asarray(np.array([Lf0], np.int32)),
            jnp.asarray(frame_pdf),
            jnp.asarray(np.zeros(1, np.int32)),
            jnp.asarray(weight),
            means,
            iv,
            gc,
            miv,
            1,
        )
        transforms = estimate_speaker_fmllr(
            np.asarray(K, np.float64),
            np.asarray(G, np.float64),
            np.asarray(beta, np.float64),
            min_count=aligner.config.fmllr_min_count,
        )
        ff = apply_per_speaker_transform(
            jnp.asarray(np.asarray(ff)),
            jnp.asarray(np.zeros(ff.shape[0], np.int32)),
            jnp.asarray(transforms),
        )

    if si_mode:
        W_d, gc_d, w_rows_d = aligner._ali_params_on()
    else:
        W_d, gc_d, w_rows_d = aligner._device_gmm

    sp, scores = decode(ff, W_d, gc_d, w_rows_d)
    phone_f, word_f, inst_f, _ts = extract_frame_labels_host(garrs, sp)
    utt = Utterance(
        id=utterance_id,
        speaker="speaker",
        file_path=None,
        file_name="utterance",
        begin=0.0,
        end=len(samples) / aligner.mfcc_config.sample_rate,
        channel=0,
        text=text,
        normalized_tokens=tokens,
    )
    Lf = int(flens[0])
    return frames_to_alignment(
        utt,
        graph.words,
        phone_f[0, :Lf],
        word_f[0, :Lf],
        inst_f[0, :Lf],
        float(np.asarray(scores)[0]),
        aligner.model.phone_names,
        aligner.frame_shift,
    )
