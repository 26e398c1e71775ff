"""Full staged training recipe (mono -> tri -> LDA+MLLT -> SAT) on the
synthetic tone corpus, then alignment with the final SAT model."""

import numpy as np
import pytest

from montreal_forced_aligner_tpu.training.base import TrainerConfig
from montreal_forced_aligner_tpu.training.trainer import StageConfig, TrainableAligner

from test_training import WORD_PHONES, make_training_corpus

TINY_RECIPE = [
    StageConfig("monophone", "mono", 6, 40),
    StageConfig("triphone", "tri", 4, 64, num_leaves=48),
    StageConfig("lda", "lda", 5, 64, num_leaves=48),
    StageConfig("pron_prob", "pron_prob", 0, 0),
    StageConfig("sat", "sat", 5, 64, num_leaves=48),
]


@pytest.fixture(scope="module")
def full_train(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("full_train")
    corpus_dir, truths = make_training_corpus(tmp, n_utts=14)
    dict_path = tmp / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    # chain topology for the synthetic tones (see test_training.py)
    ta = TrainableAligner(
        corpus_dir,
        dict_path,
        recipe=TINY_RECIPE,
        base_config=TrainerConfig(boost_silence=1.0),
        batch_size=4,
        variable_length_topology=False,
    )
    final = ta.train()
    return tmp, corpus_dir, dict_path, ta, final, truths


def test_all_stages_ran(full_train):
    _tmp, _cd, _dp, ta, final, _truths = full_train
    assert set(ta.models) == {"monophone", "triphone", "lda", "sat"}
    # pron_prob stage estimated probabilities into the shared lexicon
    probs = [
        p.probability
        for prons in ta.lexicon.words.values()
        for p in prons
    ]
    assert any(p is not None for p in probs)
    assert all(p is None or 0 < p <= 1 for p in probs)
    # final model carries LDA + fMLLR + alignment model
    assert final.meta["features"]["lda"] is True
    assert final.meta["features"]["fmllr"] is True
    assert final.lda_mat is not None and final.lda_mat.shape[0] == 40
    assert final.alignment_model is not None
    sat_trainer = ta.trainers["sat"]
    assert sat_trainer.speaker_transforms is not None
    # transforms differ from identity for speakers with enough data
    ident = np.hstack([np.eye(40), np.zeros((40, 1))])
    deviations = [
        np.abs(t - ident).max() for t in sat_trainer.speaker_transforms
    ]
    assert max(deviations) > 1e-3


def test_stage_loglikes_reasonable(full_train):
    _tmp, _cd, _dp, ta, _final, _truths = full_train
    for name, tr in ta.trainers.items():
        lls = [e["loglike_per_frame"] for e in tr.iteration_log]
        assert all(np.isfinite(v) for v in lls), name


def test_final_model_aligns(full_train, tmp_path):
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus

    tmp, corpus_dir, dict_path, _ta, final, truths = full_train
    model_path = tmp / "sat.zip"
    final.save(model_path)
    aligner = PretrainedAligner(
        model_path, dict_path, AlignerConfig(frame_bucket_multiple=32, batch_size=4)
    )
    corpus = Corpus.load(corpus_dir)
    results = aligner.align_corpus(corpus)
    errors = []
    for utt in corpus.utterances:
        full = truths[utt.file_name]
        truth = [(ph, b, e) for ph, b, e in full if ph != "sil"]
        got = [p for p in results[utt.id].phones if p.label not in ("sil", "spn")]
        assert [p.label for p in got] == [ph for ph, _b, _e in truth]
        nonsil_idx = [i for i, (ph, _b, _e) in enumerate(full) if ph != "sil"]
        for j, ((ph, b, e), p) in enumerate(zip(truth, got)):
            i = nonsil_idx[j]
            if i == 0 or full[i - 1][0] != ph:
                errors.append(abs(p.begin - b))
            if i == len(full) - 1 or full[i + 1][0] != ph:
                errors.append(abs(p.end - e))
    assert np.median(errors) < 0.03


def test_checkpoint_resume(tmp_path):
    """Stage checkpoints are written and resumed (filesystem-is-the-
    checkpoint, reference acoustic_modeling/base.py:820-826)."""
    corpus_dir, _truths = make_training_corpus(tmp_path, n_utts=4)
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    recipe = [
        StageConfig("monophone", "mono", 3, 30),
        StageConfig("triphone", "tri", 2, 40, num_leaves=32),
    ]
    wd = tmp_path / "work"
    ta1 = TrainableAligner(
        corpus_dir, dict_path, recipe=recipe,
        base_config=TrainerConfig(boost_silence=1.0),
        batch_size=4, working_directory=wd,
    )
    m1 = ta1.train()
    assert (wd / "monophone" / "model.zip").exists()
    assert (wd / "triphone" / "model.zip").exists()
    # second run resumes both stages without retraining
    ta2 = TrainableAligner(
        corpus_dir, dict_path, recipe=recipe,
        base_config=TrainerConfig(boost_silence=1.0),
        batch_size=4, working_directory=wd,
    )
    m2 = ta2.train()
    assert m2.gmm.num_pdfs == m1.gmm.num_pdfs
    import numpy as np

    np.testing.assert_allclose(
        m2.transition_model.log_probs, m1.transition_model.log_probs, atol=1e-6
    )
    tri_trainer = ta2.trainers["triphone"]
    assert tri_trainer.iteration_log == []  # no EM iterations ran on resume


def test_sat_two_pass_transcription(full_train):
    """fMLLR two-pass decoding with the SAT model + per-speaker-LM check."""
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber

    tmp, corpus_dir, dict_path, _ta, final, _truths = full_train
    model_path = tmp / "sat_decode.zip"
    final.save(model_path)
    assert final.uses_fmllr and final.alignment_model is not None
    tr = Transcriber(model_path, dict_path, batch_size=4)
    corpus = Corpus.load(corpus_dir)
    results = tr.transcribe_corpus(corpus)  # exercises _fmllr_decode_feats
    metrics = tr.evaluate(corpus, results)
    assert metrics["wer"] <= 0.2, metrics

    per_spk = tr.transcribe_corpus_per_speaker(corpus)
    assert set(per_spk) == {u.id for u in corpus.utterances}
    m2 = Transcriber(model_path, dict_path, batch_size=4).evaluate(
        corpus, per_spk
    )
    assert m2["wer"] <= 0.2, m2


def test_lvcsr_cross_word_position_dependent(full_train, monkeypatch):
    """Cross-word LVCSR decoding with a position-dependent SAT model (the
    real MFA model configuration: _B/_E/_I/_S phones + fMLLR two-pass) must
    match the exact dense decoder."""
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.transcription.lvcsr import LvcsrXwGraph
    from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber

    tmp, corpus_dir, dict_path, _ta, final, _truths = full_train
    model_path = tmp / "sat_lvcsr.zip"
    final.save(model_path)
    corpus = Corpus.load(corpus_dir)

    dense_tr = Transcriber(model_path, dict_path, batch_size=4)
    dense = dense_tr.transcribe_corpus(corpus)
    assert dense_tr._lvcsr is None

    tr = Transcriber(model_path, dict_path, lm=dense_tr.lm, batch_size=4)
    monkeypatch.setattr(Transcriber, "LVCSR_WORD_THRESHOLD", 0)
    results = tr.transcribe_corpus(corpus)
    assert isinstance(tr._lvcsr, LvcsrXwGraph)
    assert tr.aligner.lexicon.position_dependent
    for i in dense:
        assert results[i].text == dense[i].text
        assert abs(results[i].log_likelihood - dense[i].log_likelihood) < 0.1


def test_sat_two_pass_frame_parity(full_train, tmp_path):
    """The production SAT two-pass alignment (SI pass 1 -> device fMLLR ->
    adapted pass 2) matches an independent numpy two-pass built on the
    reference token-passing decoder (float64 stats, scalar row-sweep
    solve) frame-exactly."""
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.parity.harness import compare_corpus_sat

    tmp, corpus_dir, dict_path, _ta, final, _truths = full_train
    model_path = tmp / "sat_parity.zip"
    final.save(model_path)
    aligner = PretrainedAligner(
        model_path, dict_path,
        AlignerConfig(frame_bucket_multiple=32, batch_size=4),
    )
    corpus = Corpus.load(corpus_dir)
    report = compare_corpus_sat(aligner, corpus, max_utterances=6)
    assert report
    total = sum(r.num_frames for r in report)
    mismatches = sum(r.frame_mismatches for r in report)
    # the two fMLLR estimations run in different precisions (device
    # float32 sums vs numpy float64), so allow a whisker of drift at
    # phone boundaries but demand essentially frame-exact agreement
    assert mismatches <= max(1, total // 200), (
        f"{mismatches}/{total} frame mismatches"
    )
    b_tot = sum(r.boundary_total for r in report)
    b_w1 = sum(r.boundary_within_1 for r in report)
    assert b_tot > 0 and b_w1 / b_tot >= 0.98
