"""G2P training and inference tests."""

import random

import pytest

from montreal_forced_aligner_tpu.g2p.generator import G2PGenerator, evaluate_g2p
from montreal_forced_aligner_tpu.g2p.trainer import G2PModel, G2PTrainer

MAPPING = {
    "b": "b", "d": "d", "k": "k", "m": "m", "n": "n", "t": "t", "s": "s",
    "a": "aa", "e": "eh", "i": "iy", "o": "ow", "u": "uw",
}


def make_pairs(n=300, seed=0):
    rng = random.Random(seed)
    cons = ["b", "d", "k", "m", "n", "t", "s"]
    vows = ["a", "e", "i", "o", "u"]
    words = set()
    while len(words) < n:
        syls = rng.randint(1, 3)
        words.add("".join(rng.choice(cons) + rng.choice(vows) for _ in range(syls)))
    words = sorted(words)
    return [(w, [MAPPING[c] for c in w]) for w in words]


@pytest.fixture(scope="module")
def g2p_model():
    pairs = make_pairs()
    train, test = pairs[:-40], pairs[-40:]
    trainer = G2PTrainer(order=4, num_alignment_iterations=5)
    model = trainer.train_from_pairs(train)
    return model, test


def test_g2p_generalizes_to_unseen_words(g2p_model):
    model, test = g2p_model
    gen = G2PGenerator(model)
    metrics = evaluate_g2p(gen, test)
    # regular orthography must be learned near-perfectly
    assert metrics["word_accuracy"] >= 0.95
    assert metrics["phone_error_rate"] <= 0.02


def test_g2p_top_k(g2p_model):
    model, test = g2p_model
    gen = G2PGenerator(model)
    prons = gen.generate(test[0][0], num_pronunciations=3)
    assert 1 <= len(prons) <= 3
    # best hypothesis first
    scores = [s for _p, s in prons]
    assert scores == sorted(scores, reverse=True)


def test_g2p_model_roundtrip(g2p_model, tmp_path):
    model, test = g2p_model
    p = tmp_path / "g2p.zip"
    model.save(p)
    m2 = G2PModel.load(p)
    gen1 = G2PGenerator(model)
    gen2 = G2PGenerator(m2)
    w = test[0][0]
    (p1, s1), = gen1.generate(w)
    (p2, s2), = gen2.generate(w)
    assert p1 == p2
    assert s1 == pytest.approx(s2, abs=1e-4)  # ARPA text rounding


def test_g2p_on_reference_dictionary(reference_data_dir):
    from montreal_forced_aligner_tpu.dictionary.lexicon import parse_dictionary_file

    pairs = [
        (w, p.phones)
        for w, p in parse_dictionary_file(
            reference_data_dir / "dictionaries" / "test_basic.txt"
        )
        if w.isalpha()
    ]
    trainer = G2PTrainer(order=6, num_alignment_iterations=6)
    model = trainer.train_from_pairs(pairs)
    gen = G2PGenerator(model)
    metrics = evaluate_g2p(gen, pairs[:40], num_pronunciations=2)
    # memorization of training entries through the graphone LM
    assert metrics["word_accuracy"] >= 0.9
