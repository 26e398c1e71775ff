"""Kaldi-parity harness.

An independent, slow, pure-numpy implementation of Kaldi's
``compile-train-graphs`` + ``gmm-align-compiled`` semantics
(:mod:`reference_decoder`) used to cross-check the production host graph
compiler and TPU Viterbi DP frame-exactly, plus a corpus-level harness
(:mod:`harness`) that reports boundary agreement between the two paths —
ready to run against MFA ``english_us_arpa`` on LibriSpeech when network
and hardware allow (BASELINE.md ≥98 % @ ±10 ms target, reference metric
``helper.py:671``).
"""

from montreal_forced_aligner_tpu.parity.reference_decoder import (
    ReferenceAligner,
)

__all__ = ["ReferenceAligner"]
