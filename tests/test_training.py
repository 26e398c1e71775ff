"""Monophone training end-to-end: flat start -> Viterbi EM on a synthetic
tone corpus, then alignment accuracy with the trained model."""

import numpy as np
import pytest

from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon
from montreal_forced_aligner_tpu.io.wav import write_wave
from montreal_forced_aligner_tpu.training.base import TrainerConfig, TrainingPipeline
from montreal_forced_aligner_tpu.training.monophone import MonophoneTrainer

SR = 16000
TONES = {"aa": 330.0, "bb": 1800.0}
WORD_PHONES = {"ab": ["aa", "bb"], "ba": ["bb", "aa"], "a": ["aa"], "b": ["bb"]}


def make_training_corpus(tmp_path, n_utts=6, seed=3):
    rng = np.random.RandomState(seed)
    corpus_dir = tmp_path / "train_corpus"
    truths = {}
    for u in range(n_utts):
        spk = f"spk{u % 2}"
        d = corpus_dir / spk
        d.mkdir(parents=True, exist_ok=True)
        words = [
            ["ab", "ba", "a", "b"][rng.randint(4)] for _ in range(rng.randint(2, 4))
        ]
        pieces = []
        segs = []
        t = 0.0

        def add(phone, dur):
            nonlocal t
            n = int(dur * SR)
            tt = np.arange(n) / SR
            if phone == "sil":
                x = rng.randn(n) * 10.0
            else:
                x = 6000 * np.sin(2 * np.pi * TONES[phone] * tt) + rng.randn(n) * 10.0
            pieces.append(x.astype(np.float32))
            segs.append((phone, t, t + dur))
            t += dur

        add("sil", 0.3 + 0.2 * rng.rand())
        for w in words:
            for ph in WORD_PHONES[w]:
                add(ph, 0.25 + 0.3 * rng.rand())
        add("sil", 0.3 + 0.2 * rng.rand())
        wave = np.concatenate(pieces)
        write_wave(d / f"utt{u}.wav", wave, SR)
        (d / f"utt{u}.lab").write_text(" ".join(words))
        truths[f"utt{u}"] = segs
    return corpus_dir, truths


@pytest.fixture(scope="module")
def trained_model(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mono_train")
    corpus_dir, truths = make_training_corpus(tmp)
    dict_path = tmp / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    lexicon = Lexicon.load(dict_path, position_dependent=False)
    corpus = Corpus.load(corpus_dir)
    pipeline = TrainingPipeline(corpus, lexicon, batch_size=4)
    pipeline.prepare_features()
    # classic chain topology: on these constant-duration synthetic tones the
    # acoustics alone underdetermine boundaries (all of a phone's pdfs see
    # the same stationary tone), so the chains' stronger duration priors
    # regularize them. The faithful variable-length default
    # (changelog_2.0_pre_release.rst:77) has its own structural test.
    trainer = MonophoneTrainer(
        lexicon,
        TrainerConfig(num_iterations=10, max_gaussians=74, boost_silence=1.0),
        variable_length_topology=False,
    )
    model = trainer.train(pipeline)
    return tmp, corpus_dir, dict_path, model, trainer, truths


def test_training_improves_loglike(trained_model):
    _tmp, _corpus_dir, _dict_path, model, trainer, _truths = trained_model
    lls = [e["loglike_per_frame"] for e in trainer.iteration_log]
    assert len(lls) == 10
    assert all(np.isfinite(ll) for ll in lls)
    # training log-likelihood must improve substantially over EM
    assert lls[-1] > lls[0] + 1.0
    # gaussians mixed up toward the target
    assert trainer.iteration_log[-1]["num_gaussians"] > trainer.iteration_log[0][
        "num_gaussians"
    ]


def test_trained_model_aligns_accurately(trained_model, tmp_path):
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )

    tmp, corpus_dir, dict_path, model, _trainer, truths = trained_model
    model_path = tmp / "trained_mono.zip"
    model.save(model_path)

    aligner = PretrainedAligner(
        model_path, dict_path, AlignerConfig(frame_bucket_multiple=32, batch_size=4)
    )
    corpus = Corpus.load(corpus_dir)
    results = aligner.align_corpus(corpus)
    assert len(results) == corpus.num_utterances

    errors = []
    for utt in corpus.utterances:
        truth = [
            (ph, b, e) for ph, b, e in truths[utt.file_name] if ph != "sil"
        ]
        got = [p for p in results[utt.id].phones if p.label not in ("sil", "spn")]
        assert [p.label for p in got] == [ph for ph, _b, _e in truth], utt.file_name
        full = truths[utt.file_name]
        nonsil_idx = [i for i, (ph, _b, _e) in enumerate(full) if ph != "sil"]
        for j, ((ph, b, e), p) in enumerate(zip(truth, got)):
            i = nonsil_idx[j]
            # boundaries between identical adjacent tones are acoustically
            # undetermined; exclude them from the accuracy metric
            if i == 0 or full[i - 1][0] != ph:
                errors.append(abs(p.begin - b))
            if i == len(full) - 1 or full[i + 1][0] != ph:
                errors.append(abs(p.end - e))
    # boundaries from a model trained from scratch should be within ~30 ms
    assert np.median(errors) < 0.03
    assert np.mean(errors) < 0.05


def test_model_roundtrip_kaldi_format(trained_model, tmp_path):
    from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel

    tmp, _corpus_dir, _dict_path, model, _trainer, _truths = trained_model
    p = tmp_path / "rt.zip"
    model.save(p)
    m2 = AcousticModel.load(p)
    assert m2.gmm.num_pdfs == model.gmm.num_pdfs
    assert m2.transition_model.num_transition_ids == model.transition_model.num_transition_ids
    np.testing.assert_allclose(
        m2.transition_model.log_probs, model.transition_model.log_probs, atol=1e-6
    )


def test_training_with_pitch(tmp_path):
    """Pitch-augmented training + alignment end to end (use_pitch path)."""
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )

    corpus_dir, truths = make_training_corpus(tmp_path, n_utts=4)
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    lexicon = Lexicon.load(dict_path, position_dependent=False)
    corpus = Corpus.load(corpus_dir)
    pipeline = TrainingPipeline(corpus, lexicon, batch_size=4, use_pitch=True)
    pipeline.prepare_features()
    assert pipeline.feature_dim == (13 + 3) * 3
    trainer = MonophoneTrainer(
        lexicon, TrainerConfig(num_iterations=5, max_gaussians=30, boost_silence=1.0)
    )
    model = trainer.train(pipeline)
    assert model.meta["features"]["pitch"] is True
    assert model.gmm.dim == 48
    model_path = tmp_path / "pitch_model.zip"
    model.save(model_path)
    aligner = PretrainedAligner(
        model_path, dict_path, AlignerConfig(frame_bucket_multiple=32, batch_size=4)
    )
    assert aligner.use_pitch
    results = aligner.align_corpus(corpus)
    assert len(results) == corpus.num_utterances
    labels = [p.label for p in results[0].phones if p.label not in ("sil", "spn")]
    assert len(labels) >= 2


def test_features_on_host_matches_device(tmp_path):
    """Host-resident feature batches (big-corpus mode) must reproduce the
    device-resident training trajectory."""
    corpus_dir, _truths = make_training_corpus(tmp_path, n_utts=4)
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    lexicon = Lexicon.load(dict_path, position_dependent=False)
    logs = []
    for on_host in (False, True):
        corpus = Corpus.load(corpus_dir)
        pipeline = TrainingPipeline(
            corpus, lexicon, batch_size=4, features_on_host=on_host
        )
        pipeline.prepare_features()
        if on_host:
            assert all(isinstance(fb.feats, np.ndarray) for fb in pipeline.batches)
            assert all(isinstance(fb.raw, np.ndarray) for fb in pipeline.batches)
        trainer = MonophoneTrainer(
            lexicon,
            TrainerConfig(num_iterations=3, max_gaussians=20, boost_silence=1.0),
        )
        trainer.train(pipeline)
        logs.append([e["loglike_per_frame"] for e in trainer.iteration_log])
    np.testing.assert_allclose(logs[0], logs[1], rtol=1e-5)


def test_training_filters_unusable_utterances(tmp_path):
    """OOV-only/empty transcripts are excluded (filter_training_utterances)
    and training proceeds on the rest."""
    from montreal_forced_aligner_tpu.io.wav import write_wave
    from montreal_forced_aligner_tpu.training.trainer import (
        StageConfig,
        TrainableAligner,
    )

    corpus_dir, _truths = make_training_corpus(tmp_path, n_utts=4)
    bad_dir = corpus_dir / "spk0"
    rng = np.random.RandomState(0)
    write_wave(bad_dir / "oovutt.wav", rng.randn(SR).astype(np.float32) * 100, SR)
    (bad_dir / "oovutt.lab").write_text("zzzunknown qqq")
    write_wave(bad_dir / "emptyutt.wav", rng.randn(SR).astype(np.float32) * 100, SR)
    (bad_dir / "emptyutt.lab").write_text("")
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    ta = TrainableAligner(
        corpus_dir,
        dict_path,
        recipe=[StageConfig("monophone", "mono", 3, 20)],
        base_config=TrainerConfig(boost_silence=1.0),
        batch_size=4,
        position_dependent_phones=False,
    )
    model = ta.train()
    # the empty transcript is dropped at corpus load; the OOV-only one is
    # excluded by filter_training_utterances
    assert ta.corpus.num_utterances == 5
    assert len(ta._excluded) == 1
    assert model.gmm.num_pdfs > 0
    lls = [e["loglike_per_frame"] for e in ta.trainers["monophone"].iteration_log]
    assert all(np.isfinite(v) for v in lls)


def test_train_cli_output_directory_and_options(tmp_path):
    """mfa train --output_directory/--output_format/--phone_set/-s/-a and
    the --language gate (reference command_line/train_acoustic_model.py)."""
    import json

    from click.testing import CliRunner

    from helpers import build_synthetic_corpus, build_synthetic_model
    from montreal_forced_aligner_tpu.cli import cli

    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    _model, dict_path = build_synthetic_model(tmp_path, wave=wave)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "training:\n  - monophone:\n      num_iterations: 4\n"
        "      max_gaussians: 150\n"
    )
    out_model = tmp_path / "out.zip"
    out_dir = tmp_path / "tg"
    runner = CliRunner()
    r = runner.invoke(
        cli,
        ["train", str(corpus_dir), str(dict_path), str(out_model),
         "--config_path", str(cfg), "--batch_size", "4",
         "--output_directory", str(out_dir), "--output_format", "json",
         "--phone_set", "UNKNOWN", "--language", "thai"],
        catch_exceptions=False,
    )
    assert r.exit_code == 0, r.output
    assert out_model.exists()
    exported = list(out_dir.glob("*.json"))
    assert len(exported) == 1
    data = json.loads(exported[0].read_text())
    assert data["tiers"]


def test_pronunciation_counter_merge_roundtrip():
    """Cross-host counter reduction: to_plain/from_plain round-trips and
    merge() equals counting everything in one counter."""
    from montreal_forced_aligner_tpu.data import (
        CtmInterval,
        UtteranceAlignment,
        WordCtmInterval,
    )
    from montreal_forced_aligner_tpu.training.pronunciation import (
        PronunciationCounter,
        compute_pronunciation_probabilities,
    )

    def make_alignment(words_with_sil):
        t = 0.0
        phones, words = [], []
        for label, pron, sil_after in words_with_sil:
            wp = []
            for ph in pron.split():
                phones.append(CtmInterval(t, t + 0.1, ph))
                wp.append(phones[-1])
                t += 0.1
            words.append(WordCtmInterval(wp[0].begin, wp[-1].end, label, wp))
            if sil_after:
                phones.append(CtmInterval(t, t + 0.2, "sil"))
                t += 0.2
        return UtteranceAlignment(
            utterance_id=0, words=words, phones=phones,
            log_likelihood=0.0, per_frame_log_likelihood=0.0,
        )

    utts = [
        make_alignment([("ab", "a b", True), ("a", "a", False)]),
        make_alignment([("ab", "a b", False), ("ba", "b a", True)]),
        make_alignment([("a", "a", True)]),
    ]
    whole = PronunciationCounter()
    for u in utts:
        whole.add_utterance(u)
    h0, h1 = PronunciationCounter(), PronunciationCounter()
    h0.add_utterance(utts[0])
    for u in utts[1:]:
        h1.add_utterance(u)
    merged = PronunciationCounter.from_plain(h0.to_plain())
    merged.merge(PronunciationCounter.from_plain(h1.to_plain()))
    r_whole = compute_pronunciation_probabilities(whole)
    r_merged = compute_pronunciation_probabilities(merged)
    assert r_whole.pronunciations == r_merged.pronunciations
    assert r_whole.silence_probability == r_merged.silence_probability
    assert (
        r_whole.initial_silence_probability
        == r_merged.initial_silence_probability
    )
    assert r_whole.final_silence_correction == r_merged.final_silence_correction


def test_train_g2p_lexicon_stage(tmp_path):
    """pron_prob with train_g2p=True (reference train_g2p_lexicon,
    pronunciation_probabilities.py:160,420): a G2P model trains on the
    aligned pronunciations mid-recipe, the lexicon is regenerated from
    it, and the following stage trains against the G2P lexicon."""
    from montreal_forced_aligner_tpu.training.base import TrainerConfig
    from montreal_forced_aligner_tpu.training.trainer import (
        StageConfig,
        TrainableAligner,
    )

    corpus_dir, _ = make_training_corpus(tmp_path, n_utts=8)
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    ta = TrainableAligner(
        corpus_dir, dict_path,
        recipe=[
            StageConfig("monophone", "mono", 4, 40),
            StageConfig("pron_prob", "pron_prob", 0, 0, train_g2p=True),
            StageConfig("triphone", "tri", 2, 64, num_leaves=32),
        ],
        base_config=TrainerConfig(boost_silence=1.0),
        batch_size=4, variable_length_topology=False, distributed=False,
    )
    final = ta.train()
    assert final is not None
    # the G2P model was trained and kept
    assert getattr(ta, "g2p_models", None), "no G2P model trained"
    g2p = next(iter(ta.g2p_models.values()))
    # it pronounces the corpus words the way the alignments did
    from montreal_forced_aligner_tpu.g2p.generator import G2PGenerator

    gen = G2PGenerator(g2p)
    (phones, _score), = gen.generate("ab", 1)
    assert list(phones) == WORD_PHONES["ab"]
    # the lexicon entries were regenerated with G2P probabilities
    for word, want in WORD_PHONES.items():
        prons = ta.lexicon.words[word]
        assert prons[0].probability is not None
        assert list(prons[0].phones) == want
    # and the final model still aligns the corpus end-to-end
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus

    model_path = tmp_path / "g2p_trained.zip"
    final.save(model_path)
    al = PretrainedAligner(model_path, dict_path, AlignerConfig(batch_size=4))
    results = al.align_corpus(Corpus.load(corpus_dir))
    assert len(results) == 8
