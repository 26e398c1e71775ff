"""Command-line interface.

Mirrors the reference's ``mfa`` click group (``command_line/mfa.py:123-204``);
subcommands land as their subsystems do. Currently: ``align``, ``align_one``,
``model inspect``, ``version``.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import click


@click.group(name="mfa-tpu")
def cli():
    """TPU-native forced alignment toolkit (MFA-compatible capability
    surface)."""


@cli.command("align")
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("acoustic_model_path", type=click.Path(exists=True))
@click.argument("output_directory", type=click.Path())
@click.option("--beam", default=10, show_default=True, help="kept for MFA CLI parity; the dense DP is exact")
@click.option("--retry_beam", default=40, show_default=True)
@click.option("--boost_silence", default=1.0, show_default=True)
@click.option("--batch_size", default=16, show_default=True)
@click.option("--include_silence/--no_include_silence", default=False)
def align_cli(
    corpus_directory,
    dictionary_path,
    acoustic_model_path,
    output_directory,
    beam,
    retry_beam,
    boost_silence,
    batch_size,
    include_silence,
):
    """Align a corpus to word/phone TextGrids (reference:
    ``command_line/align.py:164``)."""
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus

    t0 = time.time()
    config = AlignerConfig(
        beam=beam,
        retry_beam=retry_beam,
        boost_silence=boost_silence,
        batch_size=batch_size,
    )
    aligner = PretrainedAligner(acoustic_model_path, dictionary_path, config)
    corpus = Corpus.load(corpus_directory)
    click.echo(
        f"Loaded corpus: {corpus.num_utterances} utterances, "
        f"{len(corpus.speakers)} speakers"
    )
    results = aligner.align_corpus(corpus)
    scores = [r.per_frame_log_likelihood for r in results.values()]
    click.echo(
        f"Aligned {len(results)} utterances "
        f"(mean log-like/frame {sum(scores)/max(len(scores),1):.3f})"
    )
    outs = aligner.export_textgrids(
        corpus, results, output_directory, include_silence=include_silence
    )
    click.echo(f"Exported {len(outs)} TextGrids to {output_directory}")
    click.echo(f"Done! Everything took {time.time() - t0:.1f} seconds")


@cli.command("align_one")
@click.argument("sound_file", type=click.Path(exists=True))
@click.argument("text_file", type=click.Path(exists=True))
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("acoustic_model_path", type=click.Path(exists=True))
@click.argument("output_path", type=click.Path())
def align_one_cli(sound_file, text_file, dictionary_path, acoustic_model_path, output_path):
    """Align a single utterance (reference: ``command_line/align_one.py:85``,
    ``online/alignment.py:29``)."""
    import tempfile
    import shutil

    from montreal_forced_aligner_tpu.align.aligner import PretrainedAligner
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus

    aligner = PretrainedAligner(acoustic_model_path, dictionary_path)
    with tempfile.TemporaryDirectory() as tmp:
        d = Path(tmp) / "corpus"
        d.mkdir()
        shutil.copy(sound_file, d / ("utt" + Path(sound_file).suffix))
        shutil.copy(text_file, d / "utt.lab")
        corpus = Corpus.load(d)
        results = aligner.align_corpus(corpus)
        out = Path(output_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        paths = aligner.export_textgrids(corpus, results, out.parent)
        if paths and paths[0] != out:
            paths[0].rename(out)
    click.echo(f"Wrote {output_path}")


@cli.group("model")
def model_cli():
    """Model utilities (reference: ``command_line/model.py``)."""


@model_cli.command("inspect")
@click.argument("model_path", type=click.Path(exists=True))
def model_inspect_cli(model_path):
    from montreal_forced_aligner_tpu.models.acoustic_model import AcousticModel

    am = AcousticModel.load(model_path)
    tm = am.transition_model
    info = {
        "meta": am.meta,
        "num_phones": int(len(tm.topo.phones)),
        "num_pdfs": am.gmm.num_pdfs,
        "num_gaussians": am.gmm.total_gauss,
        "feature_dim": am.gmm.dim,
        "num_transition_states": tm.num_transition_states,
        "num_transition_ids": tm.num_transition_ids,
        "tree_context_width": am.tree.N,
        "lda": am.lda_mat is not None,
        "has_alignment_model": am.alignment_model is not None,
    }
    click.echo(json.dumps(info, indent=2, default=str))


@cli.command("version")
def version_cli():
    from montreal_forced_aligner_tpu import __version__

    click.echo(__version__)


if __name__ == "__main__":
    cli()
