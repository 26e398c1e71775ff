"""Interface mocks for the language-tokenizer engines, implementing
exactly ``tokenization_surface.TOKENIZATION_SURFACE`` with simple
deterministic behavior so the gated engine code paths execute in CI.

Each ``make_*`` returns module objects to inject into ``sys.modules``;
behaviors are intentionally distinguishable from the dictionary
max-match fallback so tests can prove the ENGINE path ran.
"""

from __future__ import annotations

import re
import types

_PUNCT = set("、。！？「」『』,.!?")


def make_sudachipy():
    """Mock sudachipy: every character is a morpheme; punctuation gets the
    reference's filtered POS (補助記号)."""
    mod = types.ModuleType("sudachipy")

    class Morpheme:
        def __init__(self, s):
            self._s = s

        def surface(self):
            return self._s

        def part_of_speech(self):
            return ("補助記号" if self._s in _PUNCT else "名詞",)

    class _Tokenizer:
        def tokenize(self, text):
            return [Morpheme(ch) for ch in text if not ch.isspace()]

    class Dictionary:
        def __init__(self, dict=None):
            self.dict = dict

        def create(self, mode=None):
            assert mode is mod.SplitMode.B  # the shell passes SplitMode.B
            return _Tokenizer()

    class SplitMode:
        A, B, C = "A", "B", "C"

    mod.Morpheme = Morpheme
    mod.Dictionary = Dictionary
    mod.SplitMode = SplitMode
    return {"sudachipy": mod}


def make_spacy_pkuseg():
    """Mock spacy_pkuseg: cut() splits runs of CJK into 2-char chunks."""
    mod = types.ModuleType("spacy_pkuseg")

    class pkuseg:
        def __init__(self, *a, **k):
            pass

        def cut(self, text):
            out = []
            for chunk in text.split():
                out.extend(
                    chunk[i : i + 2] for i in range(0, len(chunk), 2)
                )
            return out

    mod.pkuseg = pkuseg
    return {"spacy_pkuseg": mod}


def make_mecab():
    """Mock python-mecab-ko: morphs() splits each eojeol into syllables."""
    mod = types.ModuleType("mecab")

    class MeCab:
        def __init__(self, *a, **k):
            pass

        def morphs(self, text):
            return [ch for ch in text if not ch.isspace()]

    mod.MeCab = MeCab
    return {"mecab": mod}


def make_pythainlp():
    """Mock pythainlp.tokenize: word_tokenize() splits into 3-char chunks."""
    pkg = types.ModuleType("pythainlp")
    tok = types.ModuleType("pythainlp.tokenize")

    def word_tokenize(text, keep_whitespace=True):
        out = []
        for chunk in text.split():
            out.extend(chunk[i : i + 3] for i in range(0, len(chunk), 3))
        if keep_whitespace:
            out.append(" ")
        return out

    tok.word_tokenize = word_tokenize
    pkg.tokenize = tok
    return {"pythainlp": pkg, "pythainlp.tokenize": tok}


def make_spacy():
    """Mock spacy with a trivial loadable English pipeline."""
    mod = types.ModuleType("spacy")

    class _Doc(list):
        pass

    def load(name):
        class _Nlp:
            def __call__(self, text):
                return _Doc(text.split())

        return _Nlp()

    mod.load = load
    return {"spacy": mod}


def all_mocks():
    mods = {}
    for maker in (
        make_sudachipy,
        make_spacy_pkuseg,
        make_mecab,
        make_pythainlp,
        make_spacy,
    ):
        mods.update(maker())
    return mods
