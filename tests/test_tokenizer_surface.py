"""Language-tokenizer engine seam: the consumed API surface is pinned in
``tokenization_surface`` (the speechbrain treatment applied to
sudachipy / spacy-pkuseg / mecab-ko / pythainlp / spacy), the gated engine
code paths execute in CI against interface mocks, and the real packages
are held to the same contract whenever installed."""

import importlib
import sys

import pytest

from mock_tokenizer_engines import all_mocks

from montreal_forced_aligner_tpu.tokenization_surface import (
    TOKENIZATION_SURFACE,
    check_surface,
)


@pytest.fixture
def engine_mocks(monkeypatch):
    mods = all_mocks()
    for name, mod in mods.items():
        monkeypatch.setitem(sys.modules, name, mod)
    return mods


def test_mocks_satisfy_contract(engine_mocks):
    missing = check_surface(lambda p: engine_mocks[p])
    assert missing == [], missing


def test_real_packages_satisfy_contract_when_installed():
    """Hold each REAL engine package to the contract if it is importable
    (none are in-image; this arms automatically on a user install)."""
    checked = 0
    for mod_path in TOKENIZATION_SURFACE:
        try:
            importlib.import_module(mod_path)
        except Exception:
            continue
        missing = [
            m for m in check_surface(importlib.import_module)
            if m[0] == mod_path
        ]
        assert missing == [], missing
        checked += 1
    if checked == 0:
        pytest.skip("no real tokenizer engine packages installed")


def _fresh_tokenizer(lang, word_set=None):
    """Construct the gated tokenizer AFTER mock injection (the gate
    resolves its engine at construction time)."""
    from montreal_forced_aligner_tpu.tokenization.languages import (
        get_language_tokenizer,
    )

    return get_language_tokenizer(lang, word_set=word_set)


def test_japanese_engine_path_executes(engine_mocks):
    tok = _fresh_tokenizer("japanese", {"何"})
    assert tok._impl is not None, "engine path must activate under the mock"
    # mock sudachi: per-character morphemes, POS-filtered punctuation —
    # distinguishable from the max-match fallback (which would keep 何)
    assert tok.pre_tokenize("何です。") == "何 で す"


def test_chinese_engine_path_executes(engine_mocks):
    tok = _fresh_tokenizer("chinese", {"我们"})
    assert tok._impl is not None
    assert tok.pre_tokenize("我们今天去") == "我们 今天 去"


def test_korean_engine_path_executes(engine_mocks):
    tok = _fresh_tokenizer("korean", {"안녕"})
    assert tok._impl is not None
    assert tok.pre_tokenize("안녕 하세요") == "안 녕 하 세 요"


def test_thai_engine_path_executes(engine_mocks):
    tok = _fresh_tokenizer("thai", {"อากาศ"})
    assert tok._impl is not None
    assert tok.pre_tokenize("อากาศดี") == "อาก าศด ี"


def test_engine_failure_falls_back_not_crash(monkeypatch):
    """A present-but-broken engine (import ok, constructor raises) must
    fall back to max-match, not crash aligner construction."""
    import types

    bad = types.ModuleType("sudachipy")

    class Dictionary:
        def __init__(self, dict=None):
            raise RuntimeError("dictionary data missing")

    bad.Dictionary = Dictionary
    bad.SplitMode = types.SimpleNamespace(A="A", B="B", C="C")
    monkeypatch.setitem(sys.modules, "sudachipy", bad)
    tok = _fresh_tokenizer("japanese", {"何", "です"})
    assert tok._impl is None
    assert tok.pre_tokenize("何です") == "何 です"  # max-match fallback


def test_aligner_composes_engine_tokenizer(engine_mocks, tmp_path):
    """End-to-end seam: an aligner constructed with --language japanese
    routes its tokenizer through the (mocked) engine."""
    from helpers import build_synthetic_corpus, build_synthetic_model

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )

    corpus_dir, wave = build_synthetic_corpus(tmp_path, text="ab a")
    model_path, dict_path = build_synthetic_model(tmp_path, wave=wave)
    al = PretrainedAligner(
        model_path, dict_path,
        AlignerConfig(batch_size=2, language="japanese"),
    )
    # the composed tokenizer pre-tokenizes through the mock engine (every
    # char a morpheme), then the simple tokenizer maps OOVs
    toks = al.tokenizer.tokenize("ab」。")
    assert toks  # executed through the engine without error
