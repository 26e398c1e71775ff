from montreal_forced_aligner_tpu.dictionary.tokenizer import SimpleTokenizer
from montreal_forced_aligner_tpu.tokenization.trainer import (
    TokenizerModel,
    TokenizerTrainer,
    TrainedTokenizer,
)

__all__ = [
    "SimpleTokenizer",
    "TokenizerModel",
    "TokenizerTrainer",
    "TrainedTokenizer",
]
