"""Triphone training on the synthetic tone corpus: tree building, alignment
conversion, EM, and alignment accuracy with the trained triphone model."""

import numpy as np
import pytest

from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon
from montreal_forced_aligner_tpu.training.base import TrainerConfig, TrainingPipeline
from montreal_forced_aligner_tpu.training.monophone import MonophoneTrainer
from montreal_forced_aligner_tpu.training.triphone import TriphoneTrainer

from test_training import WORD_PHONES, make_training_corpus


@pytest.fixture(scope="module")
def tri_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tri_train")
    corpus_dir, truths = make_training_corpus(tmp, n_utts=6)
    dict_path = tmp / "train.dict"
    dict_path.write_text(
        "".join(f"{w}\t{' '.join(p)}\n" for w, p in WORD_PHONES.items())
    )
    lexicon = Lexicon.load(dict_path, position_dependent=False)
    corpus = Corpus.load(corpus_dir)
    pipeline = TrainingPipeline(corpus, lexicon, batch_size=4)
    pipeline.prepare_features()
    # chain topology for the synthetic tones (see test_training.py)
    mono = MonophoneTrainer(
        lexicon,
        TrainerConfig(num_iterations=8, max_gaussians=40, boost_silence=1.0),
        variable_length_topology=False,
    )
    mono_model = mono.train(pipeline)
    tri = TriphoneTrainer(
        lexicon,
        mono.tm.topo,
        TrainerConfig(num_iterations=6, max_gaussians=64, boost_silence=1.0),
        num_leaves=48,
    )
    tri_model = tri.train(pipeline)
    return tmp, corpus_dir, dict_path, tri_model, tri, truths


def test_tree_is_context_dependent(tri_setup):
    _tmp, _cd, _dp, model, tri, _truths = tri_setup
    assert model.tree.N == 3 and model.tree.P == 1
    # more leaves than the monophone inventory (real splitting happened)
    assert model.tree.num_pdfs > 10
    assert model.gmm.num_pdfs == model.tree.num_pdfs
    # transition model consistent with tree
    tm = model.transition_model
    assert tm.num_pdfs >= model.tree.num_pdfs


def test_triphone_loglike_improves(tri_setup):
    _tmp, _cd, _dp, _model, tri, _truths = tri_setup
    lls = [e["loglike_per_frame"] for e in tri.iteration_log]
    assert all(np.isfinite(v) for v in lls)
    assert lls[-1] >= lls[0] - 0.1  # no divergence


def test_triphone_model_aligns(tri_setup, tmp_path):
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )

    tmp, corpus_dir, dict_path, model, _tri, truths = tri_setup
    model_path = tmp / "tri.zip"
    model.save(model_path)
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


def test_triphone_transcription(tri_setup):
    """Context-dependent decode graph: transcribing with the triphone model
    must recover the transcripts (exercises cross-word context branches in
    DecodingGraphCompiler)."""
    from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber

    tmp, corpus_dir, dict_path, model, _tri, _truths = tri_setup
    model_path = tmp / "tri_decode.zip"
    model.save(model_path)
    tr = Transcriber(model_path, dict_path, batch_size=4)
    corpus = Corpus.load(corpus_dir)
    results = tr.transcribe_corpus(corpus)
    metrics = tr.evaluate(corpus, results)
    assert metrics["wer"] <= 0.15, metrics
    # N-best with the triphone graph stays consistent at rank 0
    nb = tr.transcribe_corpus(corpus, nbest=4)
    for i in results:
        assert nb[i].alternatives[0][0] == nb[i].text


def test_triphone_lvcsr_decoding(tri_setup, monkeypatch):
    """LVCSR decoding with a triphone model: the context-classed cross-word
    junction must reproduce the exact dense decoder's transcripts; the
    word-internal fallback stays available and close."""
    from montreal_forced_aligner_tpu.transcription.lvcsr import (
        LvcsrGraphCompiler,
        LvcsrXwGraph,
    )
    from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber

    tmp, corpus_dir, dict_path, model, _tri, _truths = tri_setup
    model_path = tmp / "tri_lvcsr.zip"
    model.save(model_path)
    corpus = Corpus.load(corpus_dir)

    dense_tr = Transcriber(model_path, dict_path, batch_size=4)
    dense = dense_tr.transcribe_corpus(corpus)
    assert dense_tr._lvcsr is None  # small vocab used the dense graph

    tr = Transcriber(model_path, dict_path, lm=dense_tr.lm, batch_size=4)
    monkeypatch.setattr(Transcriber, "LVCSR_WORD_THRESHOLD", 0)
    results = tr.transcribe_corpus(corpus)
    assert isinstance(tr._lvcsr, LvcsrXwGraph)
    for i in dense:
        assert results[i].text == dense[i].text
        assert abs(results[i].log_likelihood - dense[i].log_likelihood) < 0.1
        for a, b in zip(results[i].words, dense[i].words):
            assert a.label == b.label
            assert abs(a.begin - b.begin) < 0.011

    # determinized N-best on the cross-word junction matches the (exact)
    # dense K-best hypotheses rank for rank
    dense_nb = dense_tr.transcribe_corpus(corpus, nbest=4)
    xw_nb = tr.transcribe_corpus(corpus, nbest=4)
    for i in dense_nb:
        d_alts = dense_nb[i].alternatives or [
            (dense_nb[i].text, dense_nb[i].log_likelihood)
        ]
        x_alts = xw_nb[i].alternatives or [
            (xw_nb[i].text, xw_nb[i].log_likelihood)
        ]
        for (dt, ds), (xt, xs) in zip(d_alts, x_alts):
            assert dt == xt
            assert abs(ds - xs) < 0.1

    # word-internal fallback (silence assumed at word boundaries) still
    # decodes this adversarial 2-tone corpus reasonably
    tr._lvcsr = LvcsrGraphCompiler(
        tr.aligner.compiler, tr.aligner.lexicon, tr.lm
    ).build_word_internal()
    wi_results = tr.transcribe_corpus(corpus)
    metrics = tr.evaluate(corpus, wi_results)
    assert metrics["wer"] <= 0.3, metrics


def test_phone_set_type_groups_and_questions(tmp_path):
    """ARPA phone-set: stress variants share a tree root; phonological
    classes become extra questions (reference ``data.py:611,1364``)."""
    from montreal_forced_aligner_tpu.data import PhoneSetType
    from montreal_forced_aligner_tpu.models.transition_model import HmmTopology

    dict_path = tmp_path / "arpa.dict"
    dict_path.write_text(
        "cat\tK AE1 T\ncats\tK AE1 T S\nabout\tAH0 B AW1 T\n"
        "the\tDH AH0\nsee\tS IY1\nup\tAH1 P\n"
    )
    lex = Lexicon.load(dict_path, position_dependent=True)
    pids = sorted(p for p in lex.phone_table.values() if p > 0)
    topo = HmmTopology.standard(pids)

    tri = TriphoneTrainer(
        lex, topo, TrainerConfig(), phone_set_type="ARPA"
    )
    groups = tri.phone_groups()
    name_by_id = {v: k for k, v in lex.phone_table.items()}
    # AH0's positional variants must share a group with any other AH stress
    ah_groups = [
        g for g in groups
        if any(name_by_id[p].startswith("AH") for p in g)
    ]
    assert len(ah_groups) == 1
    extra = tri.extra_question_sets()
    assert extra, "ARPA must contribute phonological questions"
    # one of the questions must contain both K and T (stops)
    stops_q = [
        q for q in extra
        if {name_by_id[p].split("_")[0].rstrip("012") for p in q} >= {"K", "T"}
    ]
    assert stops_q

    # AUTO detection resolves to ARPA for this dictionary
    tri_auto = TriphoneTrainer(
        lex, topo, TrainerConfig(), phone_set_type="AUTO"
    )
    assert tri_auto._resolved_phone_set() is PhoneSetType.ARPA
    # UNKNOWN keeps stress variants apart
    tri_unk = TriphoneTrainer(lex, topo, TrainerConfig())
    unk_groups = tri_unk.phone_groups()
    assert len(unk_groups) > len(groups)


def test_triphone_training_with_ipa_questions(tri_setup):
    """Tree building must accept extra phonological questions end-to-end
    (aa/bb are plain latin so force IPA set; the classes won't match and
    UNKNOWN-equivalent behavior must still train)."""
    tmp, corpus_dir, dict_path, _model, _tri, _truths = tri_setup
    lexicon = Lexicon.load(dict_path, position_dependent=False)
    corpus = Corpus.load(corpus_dir)
    pipeline = TrainingPipeline(corpus, lexicon, batch_size=4)
    pipeline.prepare_features()
    mono = MonophoneTrainer(
        lexicon,
        TrainerConfig(num_iterations=4, max_gaussians=24, boost_silence=1.0),
        variable_length_topology=False,
    )
    mono.train(pipeline)
    tri = TriphoneTrainer(
        lexicon,
        mono.tm.topo,
        TrainerConfig(num_iterations=2, max_gaussians=32, boost_silence=1.0),
        num_leaves=24,
        phone_set_type="IPA",
    )
    model = tri.train(pipeline)
    assert model.gmm.num_pdfs > 0


def test_default_topology_is_variable_length():
    """The default non-silence topology matches the reference writer
    (``dictionary/mixins.py:699-790``; changelog_2.0_pre_release.rst:77):
    initial state fans out to states 1..3 (phones as short as one frame,
    no initial self-loop), interior states self-loop 0.5/forward 0.5, last
    emitting state exits with probability 1. Per-phone (min, max) overrides
    and the legacy chain variant produce their documented structures."""
    from montreal_forced_aligner_tpu.models.transition_model import (
        KNOPDF,
        HmmTopology,
    )

    topo = HmmTopology.standard([1, 2, 3], silence_phones=[1])
    ns = topo.entry_for_phone(2)
    assert len(ns) == 4  # 3 emitting + final
    assert ns[0].transitions == [(1, 1 / 3), (2, 1 / 3), (3, 1 / 3)]
    assert ns[1].transitions == [(1, 0.5), (2, 0.5)]
    assert ns[2].transitions == [(3, 1.0)]
    assert ns[3].forward_pdf_class == KNOPDF

    # per-phone override: strict 2-state chain for phone 3 only
    topo2 = HmmTopology.standard(
        [1, 2, 3], silence_phones=[1], phone_topologies={3: (2, 2)}
    )
    ov = topo2.entry_for_phone(3)
    assert len(ov) == 3
    assert ov[0].transitions == [(0, 0.5), (1, 0.5)]
    assert ov[1].transitions == [(2, 1.0)]
    # phone 2 keeps the default
    assert topo2.entry_for_phone(2)[0].transitions[0] == (1, 1 / 3)

    # legacy chains: every state self-loops
    topo3 = HmmTopology.standard(
        [1, 2, 3], silence_phones=[1], variable_length=False
    )
    ch = topo3.entry_for_phone(2)
    assert [s.transitions for s in ch[:3]] == [
        [(0, 0.5), (1, 0.5)],
        [(1, 0.5), (2, 0.5)],
        [(2, 0.5), (3, 0.5)],
    ]


def test_custom_phone_groups(tmp_path):
    """--phone_groups_path: explicit groups pool into one tree root,
    unlisted phones keep their own roots; grouped phones must share a
    topology (reference dictionary/multispeaker.py:206-240)."""
    import pytest

    from montreal_forced_aligner_tpu.models.transition_model import HmmTopology
    from montreal_forced_aligner_tpu.training.trainer import TrainableAligner

    dict_path = tmp_path / "d.dict"
    dict_path.write_text(
        "cat\tK AE1 T\nthe\tDH AH0\nsee\tS IY1\nup\tAH1 P\n"
    )
    lex = Lexicon.load(dict_path, position_dependent=True)
    pids = sorted(p for p in lex.phone_table.values() if p > 0)
    topo = HmmTopology.standard(pids)
    name_by_id = {v: k for k, v in lex.phone_table.items()}

    tri = TriphoneTrainer(
        lex, topo, TrainerConfig(),
        custom_phone_groups=[["AH0", "AH1", "IY1"]],
    )
    groups = tri.phone_groups()
    pooled = [
        g for g in groups
        if any(name_by_id[p].startswith("AH") for p in g)
    ]
    assert len(pooled) == 1
    assert any(name_by_id[p].startswith("IY1") for p in pooled[0])
    # unlisted phones keep per-base roots
    k_groups = [
        g for g in groups
        if any(name_by_id[p].startswith("K") for p in g)
    ]
    assert len(k_groups) == 1 and all(
        name_by_id[p].split("_")[0] == "K" for p in k_groups[0]
    )

    # yaml loading via TrainableAligner, + topology mismatch detection
    corpus_dir = tmp_path / "corpus" / "s"
    corpus_dir.mkdir(parents=True)
    import numpy as np

    from montreal_forced_aligner_tpu.io.wav import write_wave

    write_wave(corpus_dir / "u.wav", np.zeros(16000, np.float32), 16000)
    (corpus_dir / "u.lab").write_text("cat")
    groups_yaml = tmp_path / "groups.yaml"
    groups_yaml.write_text("vowels:\n  - AH0\n  - AH1\n  - IY1\n")
    ta = TrainableAligner(
        tmp_path / "corpus", dict_path, phone_groups_path=groups_yaml
    )
    assert ta.phone_groups == [["AH0", "AH1", "IY1"]]

    topo_yaml = tmp_path / "topo.yaml"
    topo_yaml.write_text("AH0:\n  min_states: 1\n  max_states: 1\n")
    with pytest.raises(ValueError, match="topology"):
        TrainableAligner(
            tmp_path / "corpus", dict_path,
            phone_groups_path=groups_yaml, topology_path=topo_yaml,
        )


def test_xw_device_backtrace_matches_host(tri_setup, monkeypatch):
    """Cross-word junction: the device reverse-scan backtrace must match
    the host reference backtrace (paths, scores, word events) on a real
    triphone LVCSR decode."""
    from montreal_forced_aligner_tpu.transcription import (
        transcriber as tmod,
    )
    from montreal_forced_aligner_tpu.transcription.lvcsr import (
        LvcsrXwGraph,
        lvcsr_xw_backtrace_host,
    )

    tmp, corpus_dir, dict_path, model, _tri, _truths = tri_setup
    model_path = tmp / "tri_btdev.zip"
    model.save(model_path)
    corpus = Corpus.load(corpus_dir)
    tr = tmod.Transcriber(model_path, dict_path, batch_size=4)
    monkeypatch.setattr(tmod.Transcriber, "LVCSR_WORD_THRESHOLD", 0)
    captured = []
    orig = tmod.Transcriber._lvcsr_decode_device

    def spy(self, ff, flens, W, gconsts):
        handle = orig(self, ff, flens, W, gconsts)
        captured.append((handle, np.array(flens), ff, W, gconsts))
        return handle

    monkeypatch.setattr(tmod.Transcriber, "_lvcsr_decode_device", spy)
    tr.transcribe_corpus(corpus)
    assert isinstance(tr._lvcsr, LvcsrXwGraph) and captured
    import jax.numpy as jnp

    from montreal_forced_aligner_tpu.transcription.lvcsr import (
        lvcsr_xw_decode_device,
    )
    from montreal_forced_aligner_tpu.transcription.transcriber import (
        _lvcsr_emissions,
    )

    g = tr._lvcsr
    d = tr._lvcsr_dev()
    for handle, flens, ff, W, gconsts in captured:
        kind, payload = handle
        # production path is the checkpointed pair
        assert kind == "xw_ckpt"
        T = int(ff.shape[1])
        ckpt_rows = tr._lvcsr_rows(
            tr._lvcsr_backtrace_device_dispatch(handle, flens, T=T), flens
        )
        # reference: the record-based pair on the same emissions
        emit_pdf = _lvcsr_emissions(ff, W, gconsts, tr.acoustic_scale)
        alpha_T, recs = lvcsr_xw_decode_device(
            emit_pdf, d["state_pdf"], jnp.asarray(flens), d["band"],
            d["start"], d["cell_exit_idx"], d["cell_exit_w"], d["bo_cell"],
            d["cell_seg"], d["rg_mask"], d["entry_state"], d["entry_w"],
            d["ebo_idx"], d["ebo_pad"], d["p1e"], d["se_cell"], d["se_w"],
            g.lb, g.ub, g.num_p,
        )
        host_rows = lvcsr_xw_backtrace_host(
            g, np.asarray(alpha_T), recs, flens, T=T
        )
        dev_rows = tr._lvcsr_rows(
            tr._lvcsr_backtrace_device_dispatch(
                ("xw", (alpha_T, recs)), flens, T=T
            ),
            flens,
        )
        for (hp, hs, he), (dp, ds, de), (cp, cs, ce) in zip(
            host_rows, dev_rows, ckpt_rows
        ):
            np.testing.assert_array_equal(np.asarray(dp), np.asarray(hp))
            np.testing.assert_array_equal(np.asarray(cp), np.asarray(hp))
            assert abs(ds - hs) < 1e-4 and abs(cs - hs) < 1e-4
            assert de == he and ce == he


def test_xw_build_falls_back_when_records_exceed_budget(tri_setup, monkeypatch):
    """A cross-word expansion whose decode records cannot fit the HBM
    budget even at one batch row must fall back to the word-internal
    graph at build time instead of OOMing at decode time."""
    from montreal_forced_aligner_tpu.transcription import lvcsr as lv
    from montreal_forced_aligner_tpu.transcription.transcriber import (
        Transcriber,
    )

    tmp, corpus_dir, dict_path, model, _tri, _truths = tri_setup
    model_path = tmp / "tri_fallback.zip"
    model.save(model_path)
    corpus = Corpus.load(corpus_dir)
    base = Transcriber(model_path, dict_path, batch_size=4)
    base.transcribe_corpus(corpus)  # trains the LM

    monkeypatch.setattr(lv, "_REC_BUDGET", 1.0)
    tr = Transcriber(model_path, dict_path, lm=base.lm, batch_size=4)
    monkeypatch.setattr(Transcriber, "LVCSR_WORD_THRESHOLD", 0)
    tr._ensure_graph()
    assert tr._lvcsr is not None
    assert not isinstance(tr._lvcsr, lv.LvcsrXwGraph), (
        "expected word-internal fallback under a 1-byte record budget"
    )
