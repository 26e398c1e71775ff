"""Adaptive host->device transfer mode: shipping f16 host-computed MFCC
features (the degraded-tunnel path) must produce alignments equivalent to
wave shipping, and the mode plumbing must behave (env/config forcing, CPU
default)."""

import numpy as np

from helpers import build_synthetic_corpus, build_synthetic_model

from montreal_forced_aligner_tpu.align.aligner import (
    AlignerConfig,
    PretrainedAligner,
    resolve_transfer_mode,
)
from montreal_forced_aligner_tpu.corpus.corpus import Corpus


def test_resolve_transfer_mode_forcing(monkeypatch):
    # env wins
    monkeypatch.setenv("MFA_TPU_TRANSFER_MODE", "features")
    assert resolve_transfer_mode("auto") == "features"
    monkeypatch.setenv("MFA_TPU_TRANSFER_MODE", "waves")
    assert resolve_transfer_mode("features") == "waves"
    monkeypatch.delenv("MFA_TPU_TRANSFER_MODE")
    # explicit request wins over auto
    assert resolve_transfer_mode("features") == "features"
    # auto on the CPU backend: no link to degrade
    import jax

    if jax.default_backend() == "cpu":
        assert resolve_transfer_mode("auto") == "waves"


def test_feature_shipping_matches_wave_alignments(tmp_path, monkeypatch):
    """f16 feature shipping quantizes (~1e-3 relative), so boundaries may
    move at exact ties — but on a real corpus the alignments must agree to
    within one frame everywhere and exactly almost everywhere."""
    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)

    monkeypatch.setenv("MFA_TPU_TRANSFER_MODE", "waves")
    al_w = PretrainedAligner(
        model_path, dict_path, AlignerConfig(batch_size=4)
    )
    corpus = Corpus.load(corpus_dir)
    r_w = al_w.align_corpus(corpus)
    assert al_w.last_transfer_mode == "waves"

    monkeypatch.setenv("MFA_TPU_TRANSFER_MODE", "features")
    al_f = PretrainedAligner(
        model_path, dict_path, AlignerConfig(batch_size=4)
    )
    corpus2 = Corpus.load(corpus_dir)
    r_f = al_f.align_corpus(corpus2)
    assert al_f.last_transfer_mode == "features"

    assert set(r_w) == set(r_f)
    for i in r_w:
        pw, pf = r_w[i].phones, r_f[i].phones
        assert [p.label for p in pw] == [p.label for p in pf]
        for a, b in zip(pw, pf):
            assert abs(a.begin - b.begin) <= 0.011  # within one frame
            assert abs(a.end - b.end) <= 0.011
        exact = sum(
            1 for a, b in zip(pw, pf)
            if a.begin == b.begin and a.end == b.end
        )
        assert exact >= int(0.9 * len(pw)), (exact, len(pw))
