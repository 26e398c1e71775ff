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
    # beyond ~10 min a single utterance's O(T*S) backpointers + emissions
    # stop fitting HBM: switch to the exact checkpointed chunked kernel
    if Lf0 > LONG_UTTERANCE_FRAMES:
        from montreal_forced_aligner_tpu.ops.long_viterbi import (
            viterbi_align_long,
        )

        path, score = viterbi_align_long(
            np.asarray(ff[0, :Lf0]),
            garrs,
            aligner._device_gmm[0],
            aligner._device_gmm[1],
            acoustic_scale=aligner.config.acoustic_scale,
        )
        sp = path[None]
        scores = np.array([score], np.float32)
    else:
        bgraph = ship_graph_to_device(garrs)
        state_path, scores = _emit_and_align(
            ff,
            jnp.asarray(flens),
            bgraph,
            aligner._device_gmm[0],
            aligner._device_gmm[1],
            aligner.config.acoustic_scale,
            band_limits=band_limits_from_arcs(garrs),
        )
        sp = np.asarray(state_path)
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
