"""Corpus -> i-vector feature batches (MFCC + sliding-window CMN + deltas).

Behavioral spec: reference ``corpus/ivector_corpus.py`` +
``IvectorConfigMixin`` (``corpus/features.py:896``): i-vector features are
MFCCs with sliding-window CMVN (Kaldi ``apply-cmvn-sliding``; see
:func:`~montreal_forced_aligner_tpu.ops.feats.sliding_cmn`) and frame
subsampling handled downstream; speaker-level CMVN is *not* used (speakers
may be unknown, e.g. diarization).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.ops.feats import compute_deltas, sliding_cmn
from montreal_forced_aligner_tpu.ops.mfcc import MfccConfig, compute_mfcc_batch


def corpus_feature_batches(
    corpus: Corpus,
    batch_size: int = 16,
    cfg: Optional[MfccConfig] = None,
    use_deltas: bool = True,
):
    """Returns (batches [(feats, lens)], utterance order list)."""
    cfg = cfg or MfccConfig()
    waves = []
    for utt in corpus.utterances:
        wav = corpus.load_audio(utt)
        waves.append(wav.samples)
    order = list(np.argsort([len(w) for w in waves], kind="stable"))
    batches = []
    for lo in range(0, len(order), batch_size):
        idx = order[lo : lo + batch_size]
        feats, flens = compute_mfcc_batch([waves[i] for i in idx], cfg=cfg)
        batches.append((feats, flens))
    # Kaldi apply-cmvn-sliding semantics (center=true, 300-frame window,
    # mean only), the reference's i-vector feature normalization
    # (``ivector/multiprocessing.py:108``); short utterances degrade to
    # full-utterance CMN naturally (window shrinks to the utterance)
    batches = [
        (sliding_cmn(f, jnp.asarray(l)), l) for f, l in batches
    ]
    if use_deltas:
        batches = [
            (compute_deltas(f, jnp.asarray(l)), l) for f, l in batches
        ]
    return batches, order
