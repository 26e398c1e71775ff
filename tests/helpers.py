"""Shared test helpers: synthetic corpus + acoustic model construction.

Builds a tiny single-gaussian monophone model whose GMM means are estimated
from tone-segment MFCCs, so forced alignment of the synthetic audio has a
known ground truth (tone-change boundaries).
"""

from pathlib import Path

import numpy as np

from montreal_forced_aligner_tpu.io.wav import write_wave
from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel
from montreal_forced_aligner_tpu.models.gmm import DiagGmmSet
from montreal_forced_aligner_tpu.models.transition_model import (
    HmmTopology,
    TransitionModel,
)
from montreal_forced_aligner_tpu.models.tree import ContextDependency

SR = 16000
# segment plan: (phone, seconds, tone frequency or None for silence)
SEGMENTS = [
    ("sil", 0.40, None),
    ("aa", 0.50, 330.0),
    ("bb", 0.45, 1800.0),
    ("aa", 0.35, 330.0),
    ("sil", 0.40, None),
]

PHONE_TABLE = {"<eps>": 0, "sil": 1, "spn": 2, "aa": 3, "bb": 4}


def synth_wave(segments=SEGMENTS, seed=0):
    rng = np.random.RandomState(seed)
    pieces = []
    for _phone, dur, freq in segments:
        n = int(dur * SR)
        t = np.arange(n) / SR
        if freq is None:
            x = rng.randn(n) * 10.0
        else:
            x = 6000.0 * np.sin(2 * np.pi * freq * t) + rng.randn(n) * 10.0
        pieces.append(x.astype(np.float32))
    return np.concatenate(pieces)


def frame_labels(segments=SEGMENTS, frame_shift=0.01):
    """Ground-truth phone per 10ms frame."""
    labels = []
    for phone, dur, _ in segments:
        labels.extend([phone] * int(round(dur / frame_shift)))
    return labels


def build_synthetic_model(tmp_path: Path, wave=None):
    """Create a model archive + dictionary aligned to the synthetic audio."""
    from montreal_forced_aligner_tpu.ops.feats import compute_deltas
    from montreal_forced_aligner_tpu.ops.mfcc import MfccConfig, compute_mfcc_batch
    import jax.numpy as jnp

    if wave is None:
        wave = synth_wave()
    cfg = MfccConfig()
    feats, flens = compute_mfcc_batch([wave], cfg=cfg)
    T = int(flens[0])
    full = np.asarray(
        compute_deltas(feats, jnp.asarray(flens))
    )[0, :T]
    labels = frame_labels()[:T]
    labels = labels + ["sil"] * (T - len(labels))

    phones = [1, 2, 3, 4]
    topo = HmmTopology.standard(phones, silence_phones=[1, 2])
    tree = ContextDependency.monophone(phones, topo)
    tm = TransitionModel.from_topology_and_tree(topo, tree)

    num_pdfs = tree.num_pdfs
    dim = full.shape[1]
    means = np.zeros((num_pdfs, dim), dtype=np.float64)
    variances = np.ones((num_pdfs, dim), dtype=np.float64)
    name_by_id = {v: k for k, v in PHONE_TABLE.items()}
    for phone in phones:
        name = name_by_id[phone]
        sel = np.array([lab == name for lab in labels])
        if name == "spn":
            sel = np.array([lab == "sil" for lab in labels])
        seg = full[sel] if sel.any() else full
        m = seg.mean(axis=0)
        v = np.maximum(seg.var(axis=0), 1e-2)
        for cls in range(topo.num_pdf_classes(phone)):
            pdf = tree.compute_pdf([phone], cls)
            means[pdf] = m
            variances[pdf] = v
    inv_vars = 1.0 / variances
    gmm = DiagGmmSet.from_lists(
        weights_list=[np.ones(1, dtype=np.float32) for _ in range(num_pdfs)],
        miv_list=[(means[i] * inv_vars[i])[None, :].astype(np.float32) for i in range(num_pdfs)],
        iv_list=[inv_vars[i][None, :].astype(np.float32) for i in range(num_pdfs)],
    )
    model = AcousticModel(
        transition_model=tm,
        gmm=gmm,
        tree=tree,
        meta={
            "version": "0.1.0",
            "architecture": "gmm-hmm",
            "phones": ["aa", "bb"],
            "features": {"type": "mfcc", "deltas": True, "frame_shift": 10},
        },
        phone_table=PHONE_TABLE,
    )
    model_path = tmp_path / "synthetic_model.zip"
    model.save(model_path)

    dict_path = tmp_path / "synthetic.dict"
    with open(dict_path, "w") as f:
        f.write("ab\taa bb\n")
        f.write("ba\tbb aa\n")
        f.write("a\taa\n")
        f.write("b\tbb\n")
    return model_path, dict_path


def build_synthetic_corpus(tmp_path: Path, text="ab a"):
    corpus_dir = tmp_path / "corpus" / "spk1"
    corpus_dir.mkdir(parents=True, exist_ok=True)
    wave = synth_wave()
    write_wave(corpus_dir / "utt1.wav", wave, SR)
    with open(corpus_dir / "utt1.lab", "w") as f:
        f.write(text)
    return tmp_path / "corpus", wave
