"""Position-major flat LVCSR (lvcsr_pm): the production layout must be
value-equivalent to the chain-major reference layout — same max-plus
recursion over the same candidate sets, so scores are bit-identical and
decoded words/labels agree wherever the optimum is unique."""

import numpy as np

from helpers import build_synthetic_corpus, build_synthetic_model

from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.language_modeling.ngram import (
    train_lm_from_texts,
)
from montreal_forced_aligner_tpu.transcription.lvcsr import (
    LvcsrGraphCompiler,
)
from montreal_forced_aligner_tpu.transcription.lvcsr_pm import LvcsrPmGraph
from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber


def _grow_dictionary(dict_path, num_words, seed=7, min_len=4, max_len=10):
    rng = np.random.RandomState(seed)
    words = []
    with open(dict_path, "a") as f:
        for j in range(num_words):
            w = f"junk{j}"
            pron = " ".join(
                rng.choice(["aa", "bb"], rng.randint(min_len, max_len))
            )
            f.write(f"{w}\t{pron}\n")
            words.append(w)
    return words


def _setup(tmp_path, num_words=300):
    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    extra = _grow_dictionary(dict_path, num_words)
    texts = ["ab a"] * 20 + [
        " ".join(extra[i : i + 5]) for i in range(0, num_words, 5)
    ]
    lm, _ = train_lm_from_texts(texts, order=2)
    return corpus_dir, model_path, dict_path, lm


def test_pm_routing_and_geometry(tmp_path):
    """The flat LVCSR path routes to the position-major graph; entry
    states are the contiguous p=0 row and traced paths never touch dead
    grid cells."""
    corpus_dir, model_path, dict_path, lm = _setup(tmp_path)
    tr = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    corpus = Corpus.load(corpus_dir)
    results = tr.transcribe_corpus(corpus)
    g = tr._lvcsr
    assert isinstance(g, LvcsrPmGraph)
    assert g.C % 128 == 0 and g.Pmax % 8 == 0
    assert g.n_real_states <= g.Pmax * g.C
    assert results[0].text == "ab a"
    # geometry invariants: live cells are a prefix of each chain column
    phone_grid = g.state_phone.reshape(g.Pmax, g.C)
    live = phone_grid >= 0
    assert (live[1:] <= live[:-1]).all(), "live cells must be a prefix"
    # every chain (incl. init silence) has a live entry cell
    assert live[0, : g.n_chains].all()


def test_pm_matches_legacy_layout(tmp_path):
    """Position-major vs chain-major on the same corpus: identical
    transcripts, word intervals, and (bit-identical recursion) scores."""
    corpus_dir, model_path, dict_path, lm = _setup(tmp_path)
    corpus = Corpus.load(corpus_dir)

    tr_pm = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    r_pm = tr_pm.transcribe_corpus(corpus)
    assert isinstance(tr_pm._lvcsr, LvcsrPmGraph)

    tr_lg = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    tr_lg._lvcsr = LvcsrGraphCompiler(
        tr_lg.aligner.compiler, tr_lg.aligner.lexicon, lm, cross_word=False
    ).build_word_internal_legacy()
    tr_lg._vocab = tr_lg._lvcsr.words
    r_lg = tr_lg.transcribe_corpus(corpus)

    assert set(r_pm) == set(r_lg)
    for i in r_pm:
        assert r_pm[i].text == r_lg[i].text
        assert abs(r_pm[i].log_likelihood - r_lg[i].log_likelihood) < 1e-4
        assert len(r_pm[i].words) == len(r_lg[i].words)
        for a, b in zip(r_pm[i].words, r_lg[i].words):
            assert a.label == b.label
            assert abs(a.begin - b.begin) < 1e-9
            assert abs(a.end - b.end) < 1e-9


def test_pm_path_stays_on_live_cells(tmp_path):
    """The traced state path visits only live grid cells (dead padding can
    never win a max)."""
    from montreal_forced_aligner_tpu.transcription import (
        transcriber as tmod,
    )

    corpus_dir, model_path, dict_path, lm = _setup(tmp_path)
    corpus = Corpus.load(corpus_dir)
    tr = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    captured = []
    orig = tmod.Transcriber._lvcsr_decode_device

    def spy(self, ff, flens, W, gconsts):
        handle = orig(self, ff, flens, W, gconsts)
        captured.append((handle, np.array(flens), int(ff.shape[1])))
        return handle

    import pytest

    mp = pytest.MonkeyPatch()
    mp.setattr(tmod.Transcriber, "_lvcsr_decode_device", spy)
    try:
        tr.transcribe_corpus(corpus)
    finally:
        mp.undo()
    g = tr._lvcsr
    assert captured
    for handle, flens, T in captured:
        assert handle[0] == "pm_ckpt"
        path, word_at, score = tr._lvcsr_backtrace_device_dispatch(
            handle, flens, T=T
        )
        path = np.asarray(path)
        for b in range(path.shape[0]):
            L = int(flens[b])
            assert (g.state_phone[path[b, :L]] >= 0).all()


def test_pm_nbest_routes_to_legacy(tmp_path):
    """K-best decoding on a position-major production graph runs the
    chain-major K-best kernels via the lazily built legacy graph, and its
    1-best hypothesis matches the production 1-best decode."""
    corpus_dir, model_path, dict_path, lm = _setup(tmp_path)
    corpus = Corpus.load(corpus_dir)
    tr = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    r1 = tr.transcribe_corpus(corpus)
    rn = tr.transcribe_corpus(corpus, nbest=4)
    assert getattr(tr, "_lvcsr_legacy", None) is not None
    for i in r1:
        assert rn[i].text == r1[i].text
        assert abs(rn[i].log_likelihood - r1[i].log_likelihood) < 1e-4
        if rn[i].alternatives:
            scores = [s for _t, s in rn[i].alternatives]
            assert scores == sorted(scores, reverse=True)


def test_nbest_device_backtrace_matches_host(tmp_path):
    """The device K-best backtrace (records never leave the device) must
    reproduce the host reference backtrace rank for rank: same texts,
    same scores, same word events."""
    import jax.numpy as jnp

    from montreal_forced_aligner_tpu.transcription.lvcsr import (
        lvcsr_nbest_backtrace_device,
        lvcsr_nbest_backtrace_host,
        lvcsr_nbest_device,
        lvcsr_nbest_final_select_device,
    )
    from montreal_forced_aligner_tpu.transcription.transcriber import (
        _lvcsr_emissions,
    )

    corpus_dir, model_path, dict_path, lm = _setup(tmp_path)
    corpus = Corpus.load(corpus_dir)
    tr = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    r1 = tr.transcribe_corpus(corpus)  # builds graphs, trains nothing new
    lg = tr._legacy_flat_graph()
    d = tr._lvcsr_dev(lg)
    al = tr.aligner

    waves = corpus.load_audio_parallel(al.mfcc_config.sample_rate)
    # build one feature batch through the production path pieces
    from montreal_forced_aligner_tpu.align.aligner import (
        _final_feats,
        _mfcc_and_sums,
        _round_up,
    )
    from montreal_forced_aligner_tpu.ops.mfcc import pad_waves_for_mfcc

    L = _round_up(max(len(w) for w in waves), 16000)
    padded, lens = pad_waves_for_mfcc(waves, al.mfcc_config, L)
    flens = np.array(
        [al.mfcc_config.num_frames(int(n)) for n in lens], np.int32
    )
    feats, sums = _mfcc_and_sums(
        jnp.asarray(padded), jnp.asarray(flens), al.mfcc_config,
        al.mfcc_config.num_frames(L),
    )
    mean = jnp.asarray(sums) / jnp.maximum(
        jnp.asarray(flens.astype(np.float32)), 1.0
    )[:, None]
    ff = _final_feats(feats, jnp.asarray(flens), mean, None)
    emit_pdf = _lvcsr_emissions(
        ff, al._device_gmm[0], al._device_gmm[1], tr.acoustic_scale
    )
    K = 4
    alpha_T, hist_T, recs = lvcsr_nbest_device(
        emit_pdf, d["state_pdf"], jnp.asarray(flens), d["band"], d["start"],
        d["state0_hash"], d["exit_idx"], d["exit_w"], d["entry_idx"],
        d["entry_word"], d["entry_w"], d["p1"], d["bo"], d["big_pred"],
        d["big_w"], lg.lb, lg.ub, K,
    )
    T = int(ff.shape[1])
    host_rows = lvcsr_nbest_backtrace_host(
        lg, np.asarray(alpha_T), np.asarray(hist_T), recs, flens, K, T=T
    )
    scores_d, s0_d, rk0_d = lvcsr_nbest_final_select_device(
        alpha_T, hist_T, d["exit_idx"], d["exit_w"], d["eos"], K
    )
    path_d, word_d = lvcsr_nbest_backtrace_device(
        s0_d, rk0_d, recs, jnp.asarray(flens), d["entry_word"],
        d["entry_slot_of_state"], d["big_pred"], d["exit_idx"],
        d["state_word"], lg.lb, lg.ub, K, T=T,
    )
    scores = np.asarray(scores_d)
    paths = np.asarray(path_d)
    words = np.asarray(word_d)
    from montreal_forced_aligner_tpu.ops.viterbi import NEG_INF

    for b, hyps in enumerate(host_rows):
        L_b = int(flens[b])
        dev_hyps = [
            h for h in range(paths.shape[1]) if scores[b, h] > NEG_INF / 2
        ]
        assert len(dev_hyps) == len(hyps)
        # rank order can differ between EXACTLY tied scores (host argsort
        # vs device dedup tournament) — compare as score-ordered multisets
        # of (score, word events), and require identical state paths
        # wherever the (score, events) pair is unique
        host_set = sorted(
            (round(hs, 4), tuple(he)) for _hp, hs, he in hyps
        )
        dev_items = []
        for h in dev_hyps:
            ev = tuple(
                (int(t), int(w))
                for t, w in enumerate(words[b, h, :L_b])
                if w >= 0
            )
            dev_items.append((round(float(scores[b, h]), 4), ev, h))
        assert sorted((sc, ev) for sc, ev, _h in dev_items) == host_set
        host_by_key = {}
        for hp, hs, he in hyps:
            host_by_key.setdefault((round(hs, 4), tuple(he)), []).append(hp)
        for sc, ev, h in dev_items:
            cands = host_by_key[(sc, ev)]
            if len(cands) == 1:
                np.testing.assert_array_equal(
                    paths[b, h, :L_b], cands[0][:L_b]
                )
