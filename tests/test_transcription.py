"""Language model training and transcription (decoding) tests."""

import numpy as np
import pytest

from montreal_forced_aligner_tpu.language_modeling.ngram import (
    ArpaModel,
    train_lm_from_texts,
)


def test_lm_normalization_and_ppl(tmp_path):
    texts = ["the cat sat", "the dog sat", "the cat ran", "a dog ran"] * 3
    model, counter = train_lm_from_texts(texts, order=3)
    # conditional distributions sum to one under backoff
    for hist in [(), ("the",), ("the", "cat"), ("dog", "ran")]:
        tot = sum(10 ** model.log_prob(w, hist) for w in model.vocab if w != "<s>")
        assert tot == pytest.approx(1.0, abs=1e-3), hist
    assert model.perplexity([t.split() for t in texts]) < 4.0
    assert model.perplexity([["ran", "a", "the"]]) > 5.0
    # ARPA roundtrip
    p = tmp_path / "lm.arpa"
    model.write(p)
    m2 = ArpaModel.read(p)
    assert m2.order == 3
    for w, h in [("cat", ("the",)), ("sat", ("the", "cat")), ("zzz", ())]:
        assert m2.log_prob(w, h) == pytest.approx(model.log_prob(w, h), abs=1e-5)


@pytest.fixture(scope="module")
def transcriber_setup(tmp_path_factory):
    from helpers import build_synthetic_corpus, build_synthetic_model
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber

    tmp = tmp_path_factory.mktemp("transcribe")
    corpus_dir, wave = build_synthetic_corpus(tmp, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp, wave=wave)
    tr = Transcriber(model_path, dict_path, batch_size=4)
    corpus = Corpus.load(corpus_dir)
    return tr, corpus


def test_transcribe_corpus(transcriber_setup):
    tr, corpus = transcriber_setup
    results = tr.transcribe_corpus(corpus)
    assert results[0].text == "ab a"
    words = results[0].words
    assert [w.label for w in words] == ["ab", "a"]
    assert abs(words[0].begin - 0.40) < 0.05
    metrics = tr.evaluate(corpus, results)
    assert metrics["wer"] == 0.0
    assert metrics["cer"] == 0.0


def test_phone_lm_training(tmp_path):
    from montreal_forced_aligner_tpu.data import CtmInterval, UtteranceAlignment
    from montreal_forced_aligner_tpu.transcription.transcriber import train_phone_lm

    results = {}
    for i in range(4):
        phones = [
            CtmInterval(j * 0.1, (j + 1) * 0.1, p)
            for j, p in enumerate(["sil", "aa", "bb", "aa", "sil"])
        ]
        results[i] = UtteranceAlignment(i, [], phones, -10.0, -1.0)
    lm = train_phone_lm(results, order=3)
    # the seen phone sequence must be much more probable than a shuffled one
    seen = lm.sentence_log_prob(["sil", "aa", "bb", "aa", "sil"])
    shuffled = lm.sentence_log_prob(["bb", "sil", "sil", "aa", "bb"])
    assert seen > shuffled


def test_nbest_and_lm_rescoring(transcriber_setup):
    tr, corpus = transcriber_setup
    results = tr.transcribe_corpus(corpus, nbest=8)
    alts = results[0].alternatives
    assert alts is not None and len(alts) >= 2
    # rank 0 is the 1-best and scores are descending
    assert alts[0][0] == results[0].text == "ab a"
    scores = [s for _t, s in alts]
    assert scores == sorted(scores, reverse=True)
    assert len({t for t, _s in alts}) == len(alts)

    # rescoring with an LM that strongly prefers a competitor must re-rank
    competitor = alts[1][0]
    rescore_lm, _ = train_lm_from_texts([competitor] * 20, order=3)
    rescored = tr.transcribe_corpus(
        corpus, nbest=8, rescore_lm=rescore_lm, rescore_weight=200.0
    )
    assert rescored[0].text == competitor
    # with negligible weight on the new LM, acoustics keep the original best
    kept = tr.transcribe_corpus(
        corpus, nbest=8, rescore_lm=rescore_lm, rescore_weight=1e-6
    )
    assert kept[0].text == "ab a"
