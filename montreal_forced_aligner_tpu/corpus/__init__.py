from montreal_forced_aligner_tpu.corpus.corpus import Corpus, Utterance

__all__ = ["Corpus", "Utterance"]
