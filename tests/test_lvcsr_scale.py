"""LVCSR at scale (VERDICT r1 next-round #9): a 20k-word synthetic lexicon
through the backoff-junction decoder, band-bucket fallback behavior, and
dense/LVCSR router equivalence at the threshold boundary."""

import logging
import time

import numpy as np
import pytest

from helpers import build_synthetic_corpus, build_synthetic_model

from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.language_modeling.ngram import (
    train_lm_from_texts,
)
from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber


def _grow_dictionary(dict_path, num_words, seed=7, min_len=4, max_len=10):
    rng = np.random.RandomState(seed)
    words = []
    with open(dict_path, "a") as f:
        for j in range(num_words):
            w = f"junk{j}"
            pron = " ".join(rng.choice(["aa", "bb"], rng.randint(min_len, max_len)))
            f.write(f"{w}\t{pron}\n")
            words.append(w)
    return words


def test_lvcsr_20k_vocabulary(tmp_path):
    """20 000-word vocabulary: the word-internal graph still fits a band
    bucket, decodes exactly, and recovers the transcript. Reports measured
    states and states/frame (the quantities the ROADMAP promised)."""
    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    extra = _grow_dictionary(dict_path, 20_000)
    texts = ["ab a"] * 50 + [
        " ".join(extra[i : i + 6]) for i in range(0, 20_000, 6)
    ]
    lm, _ = train_lm_from_texts(texts, order=2)
    t0 = time.time()
    tr = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    corpus = Corpus.load(corpus_dir)
    results = tr.transcribe_corpus(corpus)
    wall = time.time() - t0
    assert tr._lvcsr is not None, "expected LVCSR routing at V=20k"
    V = len(tr._vocab)
    assert V > 19_000
    S = int(tr._lvcsr.num_states)
    T = corpus.utterances[0].num_frames or 210
    print(
        f"\nLVCSR V={V}: {S} states, {S / max(T,1):.0f} states/frame·utt, "
        f"decoded {corpus.utterances[0].duration:.1f}s audio in {wall:.1f}s "
        f"(incl. graph build)"
    )
    assert results[0].text == "ab a"
    assert [w.label for w in results[0].words] == ["ab", "a"]
    assert abs(results[0].words[0].begin - 0.40) < 0.05
    # machine-visible accuracy flag: no silent context downgrade happened,
    # and the result records that fact (VERDICT r4 #6)
    assert tr.cross_word_fallback is False
    assert results[0].cross_word_fallback is False


def test_band_fallback_rate_zero_at_20k(tmp_path):
    """The 20k-word word-internal build must NOT trip the band-bucket
    fallback (fallback rate 0 for phone inventories at this scale)."""
    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    extra = _grow_dictionary(dict_path, 20_000)
    texts = ["ab a"] * 10 + [" ".join(extra[i : i + 6]) for i in range(0, 20_000, 60)]
    lm, _ = train_lm_from_texts(texts, order=2)
    tr = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    corpus = Corpus.load(corpus_dir)
    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    logging.getLogger("mfa_tpu").addHandler(handler)
    try:
        tr.transcribe_corpus(corpus)
    finally:
        logging.getLogger("mfa_tpu").removeHandler(handler)
    assert tr._lvcsr is not None
    assert not any("fell back" in m for m in records), records


def test_cross_word_no_fallback_on_triphone_lexicon(tmp_path):
    """Cross-word LVCSR over a 200-word triphone lexicon (SAT-scale
    synthetic tree with real left-context dependence) builds without the
    band fallback and its graph carries context-classed junctions."""
    from helpers import build_sat_scale_model

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.transcription.lvcsr import (
        LvcsrGraphCompiler,
        LvcsrXwGraph,
    )

    model_path, dict_path = build_sat_scale_model(tmp_path, gauss_per_pdf=2)
    al = PretrainedAligner(model_path, dict_path, AlignerConfig(batch_size=2))
    words = sorted(al.lexicon.words)[:200]
    texts = [" ".join(words[i : i + 5]) for i in range(0, 200, 5)]
    lm, _ = train_lm_from_texts(texts, order=2)
    builder = LvcsrGraphCompiler(al.compiler, al.lexicon, lm, lm_scale=1.0)
    graph = builder.build()
    assert isinstance(graph, LvcsrXwGraph), type(graph)


def test_forced_band_fallback_still_decodes(tmp_path, monkeypatch):
    """When the cross-word expansion genuinely exceeds the band buckets the
    builder warns and the word-internal fallback still decodes."""
    import montreal_forced_aligner_tpu.ops.viterbi as V
    from helpers import build_sat_scale_model

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.transcription.lvcsr import (
        LvcsrGraphCompiler,
    )
    from montreal_forced_aligner_tpu.transcription.lvcsr_pm import (
        LvcsrPmGraph,
    )

    model_path, dict_path = build_sat_scale_model(tmp_path, gauss_per_pdf=2)
    al = PretrainedAligner(model_path, dict_path, AlignerConfig(batch_size=2))
    words = sorted(al.lexicon.words)[:50]
    lm, _ = train_lm_from_texts(
        [" ".join(words[i : i + 5]) for i in range(0, 50, 5)], order=2
    )
    builder = LvcsrGraphCompiler(al.compiler, al.lexicon, lm, lm_scale=1.0)
    xw = builder.build()
    # shrink the bucket table so the SAME expansion no longer fits
    monkeypatch.setattr(V, "BAND_BUCKETS", [(2, 8)])
    records = []
    handler = logging.Handler()
    handler.emit = lambda rec: records.append(rec.getMessage())
    logging.getLogger("mfa_tpu").addHandler(handler)
    try:
        fb = builder.build()
    finally:
        logging.getLogger("mfa_tpu").removeHandler(handler)
    # either the cross-word build fell back (warning logged) or even the
    # word-internal build cannot fit (2,8) — both must be surfaced, not
    # silent
    assert records or isinstance(fb, LvcsrPmGraph)
    # the downgrade is machine-visible on the graph, not just in logs
    if isinstance(fb, LvcsrPmGraph):
        assert fb.cross_word_fallback is True


def test_router_threshold_boundary_equivalence(tmp_path, monkeypatch):
    """Just under the 150-word router threshold, the exact dense decoder
    and the forced LVCSR path produce identical transcripts — the router
    choice is a performance decision, not a correctness one."""
    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    extra = _grow_dictionary(dict_path, 140, min_len=3, max_len=6)
    texts = ["ab a"] * 20 + [" ".join(extra[i : i + 5]) for i in range(0, 140, 5)]
    lm, _ = train_lm_from_texts(texts, order=2)
    corpus = Corpus.load(corpus_dir)

    dense = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    r_dense = dense.transcribe_corpus(corpus)
    assert dense._lvcsr is None, "V=142 should use the dense decoder"

    lv = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    monkeypatch.setattr(Transcriber, "LVCSR_WORD_THRESHOLD", 0)
    corpus2 = Corpus.load(corpus_dir)
    r_lv = lv.transcribe_corpus(corpus2)
    assert lv._lvcsr is not None
    for i in r_dense:
        assert r_dense[i].text == r_lv[i].text
        assert [w.label for w in r_dense[i].words] == [
            w.label for w in r_lv[i].words
        ]


def test_ckpt_batch_ceiling_admits_32_rows(tmp_path):
    """The checkpointed decodes (position-major flat AND cross-word) carry
    no O(T*S) per-frame records, so a 32-row batch of 30 s utterances fits
    the default HBM budget without splitting — the record-based batch
    ceiling (~6 rows at V=20k) is gone (VERDICT r4 #1)."""
    from montreal_forced_aligner_tpu.transcription import lvcsr as lv

    # flat position-major at V=20k
    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    extra = _grow_dictionary(dict_path, 20_000)
    texts = [" ".join(extra[i : i + 6]) for i in range(0, 20_000, 6)]
    lm, _ = train_lm_from_texts(texts, order=2)
    tr = Transcriber(model_path, dict_path, lm=lm, batch_size=32)
    tr.lm = lm
    tr._ensure_graph(nominal_frames=3000)
    assert tr._lvcsr is not None
    T = 3000  # 30 s utterances
    per_row = T * tr._lvcsr_rec_bytes_per_frame_row(1)
    budget = tr._rec_budget()
    assert 32 * per_row <= budget, (
        f"flat ckpt: 32 rows need {32 * per_row / 1e9:.1f} GB "
        f"> {budget / 1e9:.1f} GB budget"
    )

    # cross-word (triphone) graph via the SAT-scale model
    from helpers import build_sat_scale_model

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.transcription.lvcsr import (
        LvcsrGraphCompiler,
        LvcsrXwGraph,
    )

    xw_model, xw_dict = build_sat_scale_model(tmp_path, gauss_per_pdf=2)
    al = PretrainedAligner(xw_model, xw_dict, AlignerConfig(batch_size=2))
    words = sorted(al.lexicon.words)[:200]
    lm2, _ = train_lm_from_texts(
        [" ".join(words[i : i + 5]) for i in range(0, 200, 5)], order=2
    )
    xw = LvcsrGraphCompiler(al.compiler, al.lexicon, lm2).build()
    assert isinstance(xw, LvcsrXwGraph)
    tr2 = Transcriber(xw_model, xw_dict, lm=lm2, batch_size=32)
    tr2._lvcsr = xw
    per_row_xw = T * tr2._lvcsr_rec_bytes_per_frame_row(1)
    assert 32 * per_row_xw <= tr2._rec_budget(), (
        f"xw ckpt: 32 rows need {32 * per_row_xw / 1e9:.1f} GB"
    )


def test_lvcsr_record_budget_splitting(tmp_path, monkeypatch):
    """When the device-resident decode records exceed the HBM budget, the
    batch splits into row chunks and the results are unchanged (the 20k
    substrate at real utterance lengths needs this on a 16 GB chip)."""
    from montreal_forced_aligner_tpu.transcription.transcriber import (
        Transcriber,
    )

    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    # 3 more utterances so a batch has rows to split
    import shutil

    spk = corpus_dir / "spk1"
    for j in range(3):
        shutil.copy(spk / "utt1.wav", spk / f"cp{j}.wav")
        (spk / f"cp{j}.lab").write_text("ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    extra = _grow_dictionary(dict_path, 300)
    texts = ["ab a"] * 20 + [" ".join(extra[i : i + 5]) for i in range(0, 300, 5)]
    lm, _ = train_lm_from_texts(texts, order=2)

    tr = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    corpus = Corpus.load(corpus_dir)
    baseline = tr.transcribe_corpus(corpus)
    assert tr._lvcsr is not None

    tr2 = Transcriber(model_path, dict_path, lm=lm, batch_size=4)
    monkeypatch.setattr(Transcriber, "LVCSR_REC_BYTES", 1.0)  # force 1-row chunks
    split = tr2.transcribe_corpus(corpus)
    assert len(split) == len(baseline)
    for i in baseline:
        assert split[i].text == baseline[i].text
        assert abs(split[i].log_likelihood - baseline[i].log_likelihood) < 1e-4
