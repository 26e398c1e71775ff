from montreal_forced_aligner_tpu.dictionary.lexicon import (
    Lexicon,
    Pronunciation,
    parse_dictionary_file,
)
from montreal_forced_aligner_tpu.dictionary.tokenizer import SimpleTokenizer

__all__ = ["Lexicon", "Pronunciation", "parse_dictionary_file", "SimpleTokenizer"]
