"""Device-resident EM: equivalence with the legacy host-side update path,
bundle completeness of trained archives (phone_pdf.counts + phone_lm.arpa),
and the SAT two-pass MAP adaptation flow."""

import zipfile

import numpy as np
import pytest

from test_training import WORD_PHONES, make_training_corpus

from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon
from montreal_forced_aligner_tpu.training.base import TrainerConfig, TrainingPipeline
from montreal_forced_aligner_tpu.training.monophone import MonophoneTrainer


def _train(tmp_path, device_resident, n_iters=6, max_gauss=60):
    corpus_dir = tmp_path / "train_corpus"
    if not corpus_dir.exists():
        make_training_corpus(tmp_path)
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    lexicon = Lexicon.load(dict_path, position_dependent=False)
    corpus = Corpus.load(corpus_dir)
    pipeline = TrainingPipeline(corpus, lexicon, batch_size=4)
    pipeline.prepare_features()
    trainer = MonophoneTrainer(
        lexicon,
        TrainerConfig(
            num_iterations=n_iters,
            max_gaussians=max_gauss,
            boost_silence=1.25,
            device_resident=device_resident,
        ),
        variable_length_topology=False,
    )
    model = trainer.train(pipeline)
    return model, trainer


def test_device_resident_matches_host_path(tmp_path):
    """The device-resident update (device MLE + host-scheduled mixing-up)
    reproduces the legacy host float64 path within float32 tolerance —
    including the Gaussian split schedule (same counts, same components)."""
    m_dev, t_dev = _train(tmp_path, device_resident=True)
    m_host, t_host = _train(tmp_path, device_resident=False)
    assert m_dev.gmm.num_pdfs == m_host.gmm.num_pdfs
    np.testing.assert_array_equal(m_dev.gmm.num_gauss, m_host.gmm.num_gauss)
    np.testing.assert_allclose(
        m_dev.transition_model.log_probs,
        m_host.transition_model.log_probs,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        m_dev.gmm.weights, m_host.gmm.weights, atol=2e-4
    )
    # means can drift slightly through f32 accumulation; compare through
    # the per-iteration loglikes (EM trajectory equivalence)
    ll_dev = [e["loglike_per_frame"] for e in t_dev.iteration_log]
    ll_host = [e["loglike_per_frame"] for e in t_host.iteration_log]
    np.testing.assert_allclose(ll_dev, ll_host, rtol=2e-3)
    d = np.abs(m_dev.gmm.get_means() - m_host.gmm.get_means())
    scale = np.abs(m_host.gmm.get_means()).mean() + 1.0
    assert float(d.mean()) / scale < 5e-3


def test_trained_archive_bundle_complete(tmp_path):
    """A repo-trained archive carries the reference bundle members
    (reference ``models.py:367-379``): final.mdl, tree, phones.txt,
    meta.json, phone_pdf.counts and a phone LM."""
    from montreal_forced_aligner_tpu.training.trainer import (
        StageConfig,
        TrainableAligner,
    )

    corpus_dir, _ = make_training_corpus(tmp_path, n_utts=4)
    dict_path = tmp_path / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    ta = TrainableAligner(
        corpus_dir, dict_path,
        recipe=[StageConfig("monophone", "mono", 3, 30)],
        base_config=TrainerConfig(boost_silence=1.0),
        batch_size=4, variable_length_topology=False, distributed=False,
    )
    model = ta.train()
    assert model.phone_pdf_counts, "phone_pdf.counts not computed at finalize"
    assert model.phone_lm is not None, "phone LM not trained at finalize"
    out = tmp_path / "m.zip"
    ta.export_model(out)
    with zipfile.ZipFile(out) as zf:
        names = set(zf.namelist())
    for member in ("final.mdl", "tree", "phones.txt", "meta.json",
                   "phone_pdf.counts", "phone_lm.arpa"):
        assert member in names, f"archive missing {member}: {names}"

    # round-trip: counts keyed by phone name -> {pdf: count}; every pdf
    # referenced is a real pdf of the model
    from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel

    loaded = AcousticModel.load(out)
    assert loaded.phone_pdf_counts
    for phone, pdfs in loaded.phone_pdf_counts.items():
        assert phone in loaded.phone_table
        for pdf, count in pdfs.items():
            assert 0 <= pdf < loaded.gmm.num_pdfs
            assert count > 0
    assert loaded.phone_lm is not None
    # the bundled LM scores a plausible phone sequence
    assert np.isfinite(loaded.phone_lm.sentence_log_prob(["aa", "bb"]))


@pytest.fixture(scope="module")
def sat_model_zip(tmp_path_factory):
    """A small trained SAT model archive (mono -> tri -> SAT)."""
    from montreal_forced_aligner_tpu.training.trainer import (
        StageConfig,
        TrainableAligner,
    )

    tmp = tmp_path_factory.mktemp("sat_adapt")
    corpus_dir, _ = make_training_corpus(tmp, n_utts=6)
    dict_path = tmp / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    ta = TrainableAligner(
        corpus_dir, dict_path,
        recipe=[
            StageConfig("monophone", "mono", 4, 30),
            StageConfig("triphone", "tri", 3, 48, num_leaves=32),
            StageConfig("sat", "sat", 5, 64, num_leaves=32),
        ],
        base_config=TrainerConfig(boost_silence=1.0),
        batch_size=4, variable_length_topology=False, distributed=False,
    )
    model = ta.train()
    out = tmp / "sat_model.zip"
    ta.export_model(out)
    return tmp, corpus_dir, dict_path, out


def test_adapt_sat_runs_two_pass(sat_model_zip, tmp_path, monkeypatch):
    """MAP adaptation of a SAT model runs the reference's full two-pass
    flow (SI align -> fMLLR -> adapted-features align; reference
    ``alignment/adapting.py:86-135,200-260``) and the two-pass adapted
    model out-scores SI-only adaptation on the adaptation corpus."""
    from montreal_forced_aligner_tpu.align.aligner import AlignerConfig
    from montreal_forced_aligner_tpu.training import adapt as adapt_mod

    tmp, corpus_dir, dict_path, model_zip = sat_model_zip

    calls = []
    orig = adapt_mod.MapAdapter._estimate_fmllr

    def spy(self, pipeline, gmm):
        out = orig(self, pipeline, gmm)
        calls.append(out)
        return out

    monkeypatch.setattr(adapt_mod.MapAdapter, "_estimate_fmllr", spy)
    adapter = adapt_mod.MapAdapter(
        model_zip, dict_path, config=AlignerConfig(batch_size=4)
    )
    assert adapter.aligner.model.uses_fmllr
    assert adapter.aligner.model.alignment_model is not None
    adapted = adapter.adapt(corpus_dir)
    # the two-pass flow estimated per-speaker transforms
    assert len(calls) == 1
    transforms = calls[0]
    assert transforms.ndim == 3 and transforms.shape[1] == transforms.shape[2] - 1
    # the adapted model differs from the original (means moved)
    orig_model = adapter.aligner.model
    assert not np.allclose(
        adapted.gmm.get_means(), orig_model.gmm.get_means()
    )
    # variances untouched (means-only MAP update)
    np.testing.assert_allclose(
        adapted.gmm.inv_vars, orig_model.gmm.inv_vars, rtol=1e-6
    )
    # the adapted alignment model also moved
    assert adapted.alignment_model is not None
    _, ali = adapted.alignment_model
    _, ali0 = orig_model.alignment_model
    assert not np.allclose(ali.get_means(), ali0.get_means())

    # adapted model's two-pass alignment loglik on the adaptation corpus
    # beats the unadapted model's (that's what adaptation is for)
    from montreal_forced_aligner_tpu.align.aligner import PretrainedAligner

    adapted_zip = tmp_path / "adapted.zip"
    adapted.save(adapted_zip)
    corpus = Corpus.load(corpus_dir)
    a_new = PretrainedAligner(
        adapted_zip, dict_path, AlignerConfig(batch_size=4)
    )
    res_new = a_new.align_corpus(corpus)
    a_old = PretrainedAligner(
        model_zip, dict_path, AlignerConfig(batch_size=4)
    )
    res_old = a_old.align_corpus(corpus)
    ll_new = np.mean([r.per_frame_log_likelihood for r in res_new.values()])
    ll_old = np.mean([r.per_frame_log_likelihood for r in res_old.values()])
    assert ll_new >= ll_old - 1e-6


def test_accuracy_runner_self_agreement(tmp_path):
    """parity.accuracy scores a corpus against reference TextGrids: scoring
    an alignment against its own export gives perfect agreement (the runner
    for BASELINE.md's >=98% @ +-10ms bar; see AGREEMENT.md)."""
    import sys

    sys.path.insert(0, str(tmp_path.parent))
    from helpers import build_synthetic_corpus, build_synthetic_model

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.parity.accuracy import (
        evaluate_corpus_against_textgrids,
    )

    corpus_dir, wave = build_synthetic_corpus(tmp_path)
    model, dict_path = build_synthetic_model(tmp_path, wave=wave)
    al = PretrainedAligner(model, dict_path, AlignerConfig(batch_size=4))
    corpus = Corpus.load(corpus_dir)
    res = al.align_corpus(corpus)
    out = tmp_path / "tg"
    al.export_textgrids(corpus, res, out, include_silence=True)
    metrics = evaluate_corpus_against_textgrids(al, corpus, out)
    assert metrics["boundary_agreement_10ms"] == 1.0
    assert metrics["phone_error_rate"] == 0.0
    assert metrics["files"] == 1


def test_single_speaker_mode_skips_adaptation(sat_model_zip, tmp_path):
    """--single_speaker disables speaker adaptation: a SAT model aligns
    single-pass with the speaker-independent final.alimdl (reference
    --single_speaker ~ uses_speaker_adaptation false,
    command_line/utils.py:127)."""
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )

    _tmp, corpus_dir, dict_path, model_zip = sat_model_zip
    corpus = Corpus.load(corpus_dir)
    al = PretrainedAligner(
        model_zip, dict_path,
        AlignerConfig(batch_size=4, uses_speaker_adaptation=False),
    )
    called = []
    orig = al._fmllr_second_pass_feats
    al._fmllr_second_pass_feats = lambda *a, **k: called.append(1) or orig(*a, **k)
    res = al.align_corpus(corpus)
    assert not called, "fMLLR two-pass ran despite --single_speaker"
    assert len(res) == corpus.num_utterances
    for aln in res.values():
        assert aln.phones
        assert np.isfinite(aln.log_likelihood)
    # still produces the same phone label sequences as the adapted
    # two-pass on this clean synthetic corpus (timing may differ slightly)
    al2 = PretrainedAligner(model_zip, dict_path, AlignerConfig(batch_size=4))
    res2 = al2.align_corpus(corpus)
    for uid in res:
        seq_si = [p.label for p in res[uid].phones if p.label != "sil"]
        seq_sat = [p.label for p in res2[uid].phones if p.label != "sil"]
        assert seq_si == seq_sat
