"""Alignment throughput benchmark.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: forced alignment of a batch of ~15 s utterances with the
reference's checked-in Kaldi monophone model (or an equivalent synthetic
model when unavailable) — the full pipeline: MFCC -> CMVN -> deltas -> GMM
state loglikes -> dense Viterbi -> CTM extraction. Steady-state throughput is
measured after a warm-up pass so jit compilation is excluded.

vs_baseline: the reference publishes no benchmark numbers (BASELINE.md) and
its CPU stack (kalpy/Kaldi) is not installed in this image, so the MFA
multiprocess-CPU baseline cannot be measured in situ yet. We use a
literature/experience-based placeholder of 30 audio-seconds/s/host for MFA
with default 3 jobs; vs_baseline = value / 30.0. To be replaced by an in-situ
measurement when a kalpy environment is available.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

MFA_CPU_BASELINE_AUDIO_SEC_PER_S = 30.0

REF_DATA = Path("/root/reference/tests/data")


def build_corpus(tmp, lexicon_words, num_utts=96, seconds=15.0, sr=16000):
    from montreal_forced_aligner_tpu.io.wav import write_wave

    rng = np.random.RandomState(0)
    corp = Path(tmp) / "corpus"
    words = [w for w in lexicon_words if w.isalpha()]
    total_audio = 0.0
    for spk in range(8):
        d = corp / f"spk{spk}"
        d.mkdir(parents=True, exist_ok=True)
        for u in range(num_utts // 8):
            n = int(seconds * sr)
            wave = (rng.randn(n) * 800).astype(np.float32)
            # add some tonal structure so likelihoods vary
            t = np.arange(n) / sr
            for f in rng.choice([220, 440, 880, 1760], 3, replace=False):
                wave += 2000 * np.sin(2 * np.pi * f * t + rng.rand())
            write_wave(d / f"utt{u}.wav", wave, sr)
            n_words = int(seconds * 2.5)
            text = " ".join(rng.choice(words, n_words))
            (d / f"utt{u}.lab").write_text(text)
            total_audio += seconds
    return corp, total_audio


def main():
    import tempfile

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus

    with tempfile.TemporaryDirectory() as tmp:
        tmp = Path(tmp)
        if (REF_DATA / "am" / "mono_model.zip").exists():
            model_path = REF_DATA / "am" / "mono_model.zip"
            dict_path = REF_DATA / "dictionaries" / "test_basic.txt"
        else:
            sys.path.insert(0, str(Path(__file__).parent / "tests"))
            from helpers import build_synthetic_corpus, build_synthetic_model

            _, wave = build_synthetic_corpus(tmp)
            model_path, dict_path = build_synthetic_model(tmp, wave=wave)

        aligner = PretrainedAligner(
            model_path, dict_path, AlignerConfig(batch_size=32)
        )
        corpus_dir, total_audio = build_corpus(tmp, list(aligner.lexicon.words))
        corpus = Corpus.load(corpus_dir)

        # warm-up (compile)
        aligner.align_corpus(corpus)
        # steady state: median of 5 (remote-attached TPU latency is noisy)
        times = []
        for _ in range(5):
            t0 = time.time()
            results = aligner.align_corpus(corpus)
            times.append(time.time() - t0)
        assert len(results) == corpus.num_utterances
        throughput = total_audio / sorted(times)[len(times) // 2]

    print(
        json.dumps(
            {
                "metric": "align_throughput",
                "value": round(throughput, 2),
                "unit": "audio_seconds_per_second_per_chip",
                "vs_baseline": round(
                    throughput / MFA_CPU_BASELINE_AUDIO_SEC_PER_S, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
