"""TPU-native forced alignment framework.

A from-scratch reimplementation of the capability surface of the Montreal
Forced Aligner (reference: Cathoven-AI/Montreal-Forced-Aligner) designed for
TPU hardware: features, GMM likelihoods, Viterbi alignment and statistic
accumulation run as batched JAX/XLA/Pallas tensor programs; text, lexicon and
graph building run as lightweight host code.

Import alias: ``import mfa_tpu`` (see ``mfa_tpu/__init__.py``).
"""

__version__ = "0.1.0"
