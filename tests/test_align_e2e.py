"""End-to-end alignment tests.

Fast path: a synthetic tone corpus + synthetic single-gaussian model with
known ground-truth boundaries (mirrors the reference's integration-test
style, ``tests/test_commandline_align.py``, without model downloads).

Slow path (MFA_TPU_SLOW_TESTS=1): align the reference's real mini corpus with
its checked-in Kaldi mono model.
"""

import os

import numpy as np
import pytest

from montreal_forced_aligner_tpu.align.aligner import AlignerConfig, PretrainedAligner
from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.io.textgrid import TextGrid

from helpers import SEGMENTS, build_synthetic_corpus, build_synthetic_model


@pytest.fixture(scope="module")
def synthetic_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("synth")
    corpus_dir, wave = build_synthetic_corpus(tmp)
    model_path, dict_path = build_synthetic_model(tmp, wave=wave)
    return tmp, corpus_dir, model_path, dict_path


def test_synthetic_alignment_boundaries(synthetic_setup):
    tmp, corpus_dir, model_path, dict_path = synthetic_setup
    config = AlignerConfig(frame_bucket_multiple=32, batch_size=4)
    aligner = PretrainedAligner(model_path, dict_path, config)
    corpus = Corpus.load(corpus_dir)
    assert corpus.num_utterances == 1
    results = aligner.align_corpus(corpus)
    aln = results[0]
    words = {(w.label, round(w.begin, 2), round(w.end, 2)) for w in aln.words}
    # ground truth from SEGMENTS: sil .40 | aa .50 | bb .45 | aa .35 | sil .40
    labels = [w.label for w in sorted(aln.words, key=lambda w: w.begin)]
    assert labels == ["ab", "a"]
    w_ab, w_a = sorted(aln.words, key=lambda w: w.begin)
    tol = 0.03  # 3 frames
    assert abs(w_ab.begin - 0.40) < tol
    assert abs(w_ab.end - 1.35) < tol
    assert abs(w_a.begin - 1.35) < tol
    assert abs(w_a.end - 1.70) < tol
    # phone-level boundaries
    ph = [p for p in aln.phones if p.label != "sil"]
    assert [p.label for p in ph] == ["aa", "bb", "aa"]
    assert abs(ph[0].end - 0.90) < tol
    assert abs(ph[1].end - 1.35) < tol
    # log likelihood must be finite and sane
    assert np.isfinite(aln.log_likelihood)

    # textgrid export
    outs = aligner.export_textgrids(corpus, results, tmp / "out")
    assert len(outs) == 1
    tg = TextGrid.read(outs[0])
    assert "words" in tg.tiers and "phones" in tg.tiers
    exported_words = [iv for iv in tg.tiers["words"] if iv.label]
    assert [iv.label for iv in exported_words] == ["ab", "a"]


def test_oov_alignment(tmp_path):
    from helpers import build_synthetic_corpus as _build

    corpus_dir, wave = _build(tmp_path, text="ab zzz")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    aligner = PretrainedAligner(
        model_path, dict_path, AlignerConfig(frame_bucket_multiple=32)
    )
    corpus = Corpus.load(corpus_dir)
    results = aligner.align_corpus(corpus)
    labels = [w.label for w in sorted(results[0].words, key=lambda w: w.begin)]
    assert labels == ["ab", "<unk>"]


@pytest.mark.skipif(
    not os.environ.get("MFA_TPU_SLOW_TESTS"),
    reason="slow real-model e2e (set MFA_TPU_SLOW_TESTS=1)",
)
def test_real_mono_model_alignment(mono_model_path, reference_data_dir, tmp_path):
    import shutil

    corp = tmp_path / "corpus" / "speaker1"
    corp.mkdir(parents=True)
    shutil.copy(reference_data_dir / "wav" / "acoustic_corpus.wav", corp / "a.wav")
    shutil.copy(reference_data_dir / "lab" / "acoustic_corpus.lab", corp / "a.lab")
    aligner = PretrainedAligner(
        mono_model_path, reference_data_dir / "dictionaries" / "test_basic.txt"
    )
    corpus = Corpus.load(tmp_path / "corpus")
    results = aligner.align_corpus(corpus)
    aln = results[0]
    assert aln.per_frame_log_likelihood > -12.0
    words = sorted(aln.words, key=lambda w: w.begin)
    assert words[0].label == "this"
    # known-good boundaries from the first aligned run (self-golden)
    assert abs(words[0].begin - 0.04) < 0.05
    outs = aligner.export_textgrids(corpus, results, tmp_path / "out")
    assert outs[0].exists()


def test_multi_device_alignment_matches_single(tmp_path):
    """Round-robin device placement over the 8-device CPU mesh must produce
    identical alignments to single-device execution."""
    import jax

    from helpers import build_synthetic_corpus, build_synthetic_model

    corpus_dir, wave = build_synthetic_corpus(tmp_path)
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    devs = jax.devices()
    assert len(devs) >= 2, "conftest should provide 8 virtual CPU devices"
    single = PretrainedAligner(
        model_path,
        dict_path,
        AlignerConfig(frame_bucket_multiple=32, batch_size=1, devices=(devs[0],)),
    )
    multi = PretrainedAligner(
        model_path,
        dict_path,
        AlignerConfig(frame_bucket_multiple=32, batch_size=1, devices=tuple(devs)),
    )
    corpus = Corpus.load(corpus_dir)
    r1 = single.align_corpus(corpus)
    corpus2 = Corpus.load(corpus_dir)
    r2 = multi.align_corpus(corpus2)
    for uid in r1:
        p1 = [(p.label, round(p.begin, 3), round(p.end, 3)) for p in r1[uid].phones]
        p2 = [(p.label, round(p.begin, 3), round(p.end, 3)) for p in r2[uid].phones]
        assert p1 == p2


def test_multispeaker_dictionaries(tmp_path):
    """A yaml mapping speakers to dictionaries compiles per-speaker graphs
    (reference MultispeakerDictionaryMixin)."""
    import yaml

    from helpers import build_synthetic_corpus, build_synthetic_model

    corpus_dir, wave = build_synthetic_corpus(tmp_path)
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    # speaker-specific dictionary: same words, reversed pron for "ab"
    alt_dict = tmp_path / "alt.dict"
    alt_dict.write_text("ab\taa bb\na\taa\nb\tbb\nba\tbb aa\n")
    mapping = tmp_path / "dicts.yaml"
    mapping.write_text(
        yaml.safe_dump({"default": str(dict_path), "spk1": str(alt_dict)})
    )
    aligner = PretrainedAligner(
        model_path, mapping, AlignerConfig(frame_bucket_multiple=32, batch_size=4)
    )
    assert len(aligner.lexicons) == 2
    assert aligner.speaker_dictionary_map["spk1"].endswith("alt.dict")
    corpus = Corpus.load(corpus_dir)
    results = aligner.align_corpus(corpus)
    labels = [w.label for w in sorted(results[0].words, key=lambda w: w.begin)]
    assert labels == ["ab", "a"]


def test_pallas_emission_backend_parity(synthetic_setup, monkeypatch):
    """The Pallas likelihood-on-demand emission backend must reproduce the
    default all-pdf one-hot path exactly (run in interpreter mode on CPU;
    TPU hosts compile the real Mosaic kernel)."""
    from jax.experimental import pallas as pl

    import montreal_forced_aligner_tpu.align.aligner as AL
    import montreal_forced_aligner_tpu.ops.pallas_emission as PE

    tmp, corpus_dir, model_path, dict_path = synthetic_setup
    config = AlignerConfig(frame_bucket_multiple=32, batch_size=4)
    corpus = Corpus.load(corpus_dir)
    baseline = PretrainedAligner(model_path, dict_path, config).align_corpus(
        corpus
    )

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(PE.pl, "pallas_call", interp_call)
    monkeypatch.setattr(AL, "_pallas_emission_eligible", lambda P, G: True)
    # the kernel entry is jitted with a compile cache keyed on the module
    # function; clear it so the interpret-mode trace is fresh
    PE.pallas_state_loglikes.clear_cache()
    try:
        aligner = PretrainedAligner(model_path, dict_path, config)
        assert aligner._device_gmm[2] is not None
        results = aligner.align_corpus(corpus)
    finally:
        PE.pallas_state_loglikes.clear_cache()

    for key, aln in baseline.items():
        got = results[key]
        assert [
            (p.label, round(p.begin, 3), round(p.end, 3)) for p in aln.phones
        ] == [(p.label, round(p.begin, 3), round(p.end, 3)) for p in got.phones]


def test_parallel_graph_compilation_matches_serial(tmp_path):
    """num_graph_workers fans host graph compilation over a spawn pool;
    graphs and resulting alignments are identical to in-process compilation."""
    import sys
    from pathlib import Path

    import numpy as np

    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import build_synthetic_model, synth_wave

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.io.wav import write_wave

    wave = synth_wave()
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    corp = tmp_path / "corpus"
    texts = ["ab a", "a ab", "ab ab", "a a ab", "ab", "a", "ab a ab", "a ab a"]
    for spk in range(2):
        d = corp / f"spk{spk}"
        d.mkdir(parents=True)
        for u in range(4):
            write_wave(d / f"utt{u}.wav", wave, 16000)
            (d / f"utt{u}.lab").write_text(texts[spk * 4 + u])
    corpus = Corpus.load(corp)

    serial = PretrainedAligner(
        model_path, dict_path, AlignerConfig(batch_size=4)
    ).align_corpus(corpus)
    par_aligner = PretrainedAligner(
        model_path,
        dict_path,
        AlignerConfig(batch_size=4, num_graph_workers=2),
    )
    assert par_aligner._graph_pool(len(corpus.utterances)) is not None
    parallel = par_aligner.align_corpus(corpus)

    assert serial.keys() == parallel.keys()
    for i in serial:
        a, b = serial[i], parallel[i]
        assert abs(a.log_likelihood - b.log_likelihood) < 1e-3
        assert [(p.label, p.begin, p.end) for p in a.phones] == [
            (p.label, p.begin, p.end) for p in b.phones
        ]
