"""Subset-selection fidelity (reference ``create_subset``,
``corpus/base.py:2526-2680``; VERDICT r1 Weak #8): word-count filter,
cutoff exclusion, 30/15/5 shorter-than-average speaker preference, the
10x candidate pool, and thin-speaker removal."""

from pathlib import Path

from montreal_forced_aligner_tpu.corpus.corpus import Corpus, Utterance
from montreal_forced_aligner_tpu.training.base import select_training_subset


def make_corpus(spec):
    """spec: list of (speaker, num_frames, text) tuples."""
    corpus = Corpus()
    for i, (spk, frames, text) in enumerate(spec):
        u = Utterance(
            id=i, speaker=spk, file_path=Path("x.wav"), file_name=f"f{i}",
            begin=0.0, end=None, channel=0, text=text,
        )
        u.num_frames = frames
        corpus.utterances.append(u)
    corpus.speakers = sorted({s for s, _f, _t in spec})
    return corpus


LONG = "one two three four five"
SHORT = "one two"


def test_word_count_filter():
    corpus = make_corpus(
        [("a", 100, LONG)] * 5 + [("a", 100, SHORT)] * 5
    )
    # re-number ids
    for i, u in enumerate(corpus.utterances):
        u.id = i
    chosen = select_training_subset(corpus, 8)
    # only the 5 multiword utterances are eligible
    assert chosen == {0, 1, 2, 3, 4}


def test_cutoff_exclusion_small_subsets():
    spec = [("a", 100, LONG)] * 6 + [("a", 100, LONG + " <cutoff>")] * 4
    corpus = make_corpus(spec)
    chosen = select_training_subset(corpus, 8)
    assert chosen == {0, 1, 2, 3, 4, 5}
    # large subsets keep cutoff utterances (threshold 25k)
    chosen_big = select_training_subset(corpus, 25001)
    assert chosen_big == set(range(10))


def test_speaker_preference_thresholds():
    """A speaker with >=30 shorter-than-average utterances covers the
    subset alone; sparse speakers are skipped at that threshold."""
    spec = []
    # 'rich' speaker: 40 short utterances
    spec += [("rich", 50, LONG)] * 40
    # 'sparse' speakers: 4 long utterances each
    for k in range(5):
        spec += [(f"sparse{k}", 500, LONG)] * 4
    corpus = make_corpus(spec)
    chosen = select_training_subset(corpus, 30)
    assert len(chosen) == 30
    speakers = {corpus.utterances[i].speaker for i in chosen}
    assert speakers == {"rich"}


def test_speaker_preference_falls_back_when_no_speaker_qualifies():
    """With no speaker at >=30, the 15-threshold (then 5) applies."""
    spec = []
    for k in range(4):
        spec += [(f"s{k}", 50, LONG)] * 16  # 16 short each: passes 15
    spec += [("thin", 500, LONG)] * 3
    corpus = make_corpus(spec)
    chosen = select_training_subset(corpus, 40)
    speakers = {corpus.utterances[i].speaker for i in chosen}
    assert "thin" not in speakers
    assert len(chosen) == 40


def test_ten_x_candidate_pool_prefers_short():
    """When eligible >> subset, candidates come from the 10x shortest."""
    spec = []
    # 300 short utterances for speaker a, 300 long for speaker b
    spec += [("a", 10, LONG)] * 300
    spec += [("b", 10_000, LONG)] * 300
    corpus = make_corpus(spec)
    chosen = select_training_subset(corpus, 20)
    assert len(chosen) == 20
    # 10x pool = 200 shortest, all from speaker a
    assert all(corpus.utterances[i].speaker == "a" for i in chosen)


def test_thin_speaker_removal_in_large_pool():
    """Speakers that land <5 utterances in a 10x-pool subset are dropped
    (reference removes them so per-speaker stats stay estimable)."""
    spec = []
    spec += [("a", 10, LONG)] * 500
    spec += [("b", 11, LONG)] * 3  # eligible but can land at most 3
    corpus = make_corpus(spec)
    chosen = select_training_subset(corpus, 40)
    speakers = {corpus.utterances[i].speaker for i in chosen}
    assert "b" not in speakers


def test_deterministic():
    spec = [(f"s{k % 6}", 50 + k, LONG) for k in range(400)]
    corpus = make_corpus(spec)
    a = select_training_subset(corpus, 30)
    b = select_training_subset(corpus, 30)
    assert a == b


def test_small_corpus_returns_all_eligible():
    corpus = make_corpus([("a", 100, LONG)] * 5)
    assert select_training_subset(corpus, 100) == set(range(5))
