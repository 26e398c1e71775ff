"""Command-line interface.

Mirrors the reference's ``mfa`` click group (``command_line/mfa.py:123-204``):
24 subcommands covering alignment, training, adaptation, validation,
transcription (GMM + neural), segmentation, diarization, i-vectors, G2P,
LMs, tokenizers, dictionaries, evaluation, the model registry, configure
and history. ``mfa server``/``mfa anchor`` have no equivalent (no database
server or GUI in this architecture).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import click


def _honor_jax_platforms_env() -> None:
    """Apply an explicit JAX_PLATFORMS env var through jax.config.

    Pre-installed TPU plugins can register themselves ahead of the env var,
    so ``JAX_PLATFORMS=cpu mfa-tpu align ...`` would silently run on the
    accelerator; forcing the config makes the documented env var
    authoritative. Must run before the first backend initialization."""
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plats)
    except Exception:
        pass


def _enable_compilation_cache() -> None:
    """Persistent XLA executable cache (remote-attached TPUs pay 20-75 s per
    compile; the cache makes repeat CLI invocations warm-start). Disable
    with MFA_TPU_NO_COMPILE_CACHE=1."""
    if os.environ.get("MFA_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_mfa"
            ),
        )
        # cache even sub-second compiles: a cold process otherwise re-pays
        # a few dozen 1-5 s compiles (~40 s on the training path) that the
        # default threshold silently refuses to persist
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


class _MfaGroup(click.Group):
    """Click group that turns the framework's typed errors (phone-set
    mismatch, unreadable corpus, dictionary parse failure, ...) into a
    one-paragraph diagnosis + non-zero exit instead of a traceback
    (reference error surface, ``exceptions.py:72-961``)."""

    def invoke(self, ctx):
        from montreal_forced_aligner_tpu.exceptions import MFAError

        try:
            return super().invoke(ctx)
        except MFAError as e:
            raise click.ClickException(str(e)) from e


@click.group(name="mfa-tpu", cls=_MfaGroup)
@click.option("-v", "--verbose", is_flag=True, default=False,
              help="INFO-level progress logs (reference -v/--verbose)")
@click.option("-q", "--quiet", is_flag=True, default=False,
              help="Errors only (reference -q/--quiet)")
@click.option("--debug", is_flag=True, default=False,
              help="DEBUG-level logs incl. per-phase timings "
                   "(reference --debug)")
def cli(verbose, quiet, debug):
    """TPU-native forced alignment toolkit (MFA-compatible capability
    surface)."""
    # deterministic str hashing before any jit program is built: hash
    # randomization leaks set/dict iteration order into traced-program
    # constants, giving every CLI invocation different XLA cache keys and
    # re-paying ~35 s of compiles a warm disk cache should absorb.
    # Re-exec only when running as the real CLI entrypoint (never from
    # in-process callers like CliRunner tests or bench.py).
    import sys as _sys
    from pathlib import Path as _P

    if os.environ.get("PYTHONHASHSEED") is None and _sys.argv:
        entry = _P(_sys.argv[0]).name
        if entry in ("mfa-tpu", "mfa_tpu"):
            os.environ["PYTHONHASHSEED"] = "0"
            os.execv(_sys.executable, [_sys.executable] + _sys.argv)
        elif entry == "cli.py":  # python -m montreal_forced_aligner_tpu.cli
            os.environ["PYTHONHASHSEED"] = "0"
            os.execv(
                _sys.executable,
                [_sys.executable, "-m", "montreal_forced_aligner_tpu.cli"]
                + _sys.argv[1:],
            )
    import logging as _logging

    # configure the package logger to the console (reference
    # configure_logger, helper.py:179); flags override the profile default
    level = _logging.WARNING
    try:
        from montreal_forced_aligner_tpu.config import get_config

        prof = get_config().current_profile
        if getattr(prof, "debug", False):
            level = _logging.DEBUG
        elif getattr(prof, "verbose", False):
            level = _logging.INFO
    except Exception:
        pass
    if debug:
        level = _logging.DEBUG
    elif verbose:
        level = _logging.INFO
    elif quiet:
        level = _logging.ERROR
    pkg_logger = _logging.getLogger("mfa_tpu")
    pkg_logger.setLevel(level)
    if not pkg_logger.handlers:
        h = _logging.StreamHandler()
        h.setFormatter(
            _logging.Formatter("%(asctime)s %(levelname)s %(message)s")
        )
        pkg_logger.addHandler(h)
    _honor_jax_platforms_env()
    _enable_compilation_cache()
    # multi-host pod runs: stitch the processes into one global device set
    # before any backend use (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID, or the TPU runtime's automatic discovery)
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        from montreal_forced_aligner_tpu.parallel.multihost import (
            initialize_multihost,
        )

        initialize_multihost()
    try:
        from montreal_forced_aligner_tpu.config import record_history

        record_history(sys.argv[1:])
    except Exception:
        pass



def _load_command_config(config_path):
    """Per-command yaml parameter file (reference ``--config_path``,
    ``TopLevelMfaWorker.parse_parameters`` ``abc.py:1344``)."""
    import yaml

    with open(config_path, encoding="utf8") as f:
        return yaml.safe_load(f) or {}


def _config_overrides(ctx, data, keys):
    """Config-file values for flags the user did not set explicitly
    (precedence: command defaults < config file < command line, matching
    the reference)."""
    from click.core import ParameterSource

    out = {}
    for k in keys:
        if k in data and ctx.get_parameter_source(k) in (
            ParameterSource.DEFAULT,
            ParameterSource.DEFAULT_MAP,
        ):
            out[k] = data[k]
    return out


_TRAIN_STAGE_KINDS = {
    "monophone": "mono",
    "triphone": "tri",
    "lda": "lda",
    "sat": "sat",
    "pronunciation_probabilities": "pron_prob",
}
_STAGE_DEFAULT_ITERS = {"mono": 40, "tri": 35, "lda": 35, "sat": 35, "pron_prob": 0}


def _recipe_from_config(data):
    """Reference training-recipe yaml (``training:`` list of
    ``{stage_type: params}`` blocks, e.g. ``tests/data/configs/
    basic_train_config.yaml``) -> list of StageConfig. Unknown per-stage
    keys are reported and skipped (beam/retry_beam have no effect on the
    exact DP)."""
    from montreal_forced_aligner_tpu.training.trainer import StageConfig

    known = {
        "num_iterations", "max_gaussians", "num_leaves", "subset", "quick",
        "train_g2p",
        # accepted for reference-config compatibility; not tunable here
        "cluster_threshold", "power", "boost_silence", "silence_weight",
        "fmllr_update_type", "features", "optional",
    }
    stages = []
    counts = {}
    for item in data.get("training", []):
        ((name, params),) = item.items()
        params = params or {}
        if name not in _TRAIN_STAGE_KINDS:
            raise click.UsageError(f"unknown training stage type: {name}")
        unknown = set(params) - known
        if unknown:
            click.echo(
                f"config: ignoring unknown keys for stage {name}: "
                f"{sorted(unknown)}"
            )
        kind = _TRAIN_STAGE_KINDS[name]
        counts[name] = counts.get(name, 0) + 1
        stage_name = name if counts[name] == 1 else f"{name}_{counts[name]}"
        stages.append(
            StageConfig(
                stage_name,
                kind,
                num_iterations=int(
                    params.get("num_iterations", _STAGE_DEFAULT_ITERS[kind])
                ),
                max_gaussians=int(params.get("max_gaussians", 1000)),
                num_leaves=int(params.get("num_leaves", 0)),
                subset=int(params.get("subset", 0)),
                quick=bool(params.get("quick", params.get("optional", False))),
                train_g2p=bool(params.get("train_g2p", False)),
            )
        )
    return stages


def _num_jobs_option(f):
    """Reference-script compatibility: MFA's most common flag. Parallelism
    here is batch/device-driven (one SPMD program over the mesh), so the
    value only logs a hint instead of spawning worker processes."""
    import functools

    f = click.option(
        "--num_jobs", "-j", "num_jobs", default=None, type=int,
        help="Accepted for reference-CLI compatibility; parallelism is "
             "batch/device-driven here (see --batch_size/--distributed)",
    )(f)

    @functools.wraps(f)
    def wrapper(*args, **kwargs):
        nj = kwargs.pop("num_jobs", None)
        if nj is not None:
            import logging as _logging

            _logging.getLogger("mfa_tpu").info(
                "--num_jobs %s accepted for compatibility; this framework "
                "parallelizes via device batches (--batch_size) and the "
                "device mesh (--distributed), not worker processes", nj,
            )
        return f(*args, **kwargs)

    return wrapper


@cli.command("align")
@_num_jobs_option
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("acoustic_model_path", type=click.Path(exists=True))
@click.argument("output_directory", type=click.Path())
@click.option("--beam", default=10, show_default=True, help="kept for MFA CLI parity; the dense DP is exact")
@click.option("--retry_beam", default=40, show_default=True)
@click.option("--boost_silence", default=1.0, show_default=True)
@click.option("--batch_size", default=16, show_default=True)
@click.option("--graph_workers", default=0, show_default=True,
              help="Processes for host graph compilation (0 = in-process)")
@click.option("--distributed/--no_distributed", default=None,
              help="Shard batches over ALL devices (one SPMD program over a "
                   "jax.sharding.Mesh; auto-on for multi-host runs). Default "
                   "round-robins batches over local devices.")
@click.option("--include_silence/--no_include_silence", default=False)
@click.option("--textgrid_cleanup/--no_textgrid_cleanup", default=None,
              help="Reference-spelling alias: cleanup strips silence "
                   "intervals from exports (equivalent to "
                   "--no_include_silence; reference config.py:178)")
@click.option("--use_phone_model/--no_use_phone_model", default=False,
              help="After alignment, decode a free phone transcription with "
                   "a phone LM trained from the alignments and evaluate it "
                   "against the forced alignment (reference "
                   "--use_phone_model)")
@click.option("--fine_tune/--no_fine_tune", default=False,
              help="Refine boundaries at 1 ms resolution")
@click.option("--transfer_mode", default="auto", show_default=True,
              type=click.Choice(["auto", "waves", "features"]),
              help="Host->device payload for feature extraction: int16 "
                   "waves (device MFCC), f16 host-computed MFCC features "
                   "(12x fewer bytes over a degraded link), or auto "
                   "(probe; threshold MFA_TPU_TRANSFER_THRESHOLD_MBPS)")
@click.option("--single_speaker", is_flag=True, default=False,
              help="Disable speaker adaptation (SAT models align "
                   "single-pass with the speaker-independent model; "
                   "reference --single_speaker)")
@click.option("--g2p_model_path", type=click.Path(exists=True), default=None,
              help="G2P model for OOV pronunciations")
@click.option("--rules_path", type=click.Path(exists=True), default=None,
              help="Phonological rules yaml for pronunciation variants")
@click.option("--profile_dir", type=click.Path(), default=None,
              help="Write a JAX profiler trace here")
@click.option("--config_path", type=click.Path(exists=True), default=None,
              help="Yaml parameter file (reference --config_path semantics)")
@click.option("--output_format", default="long_textgrid", show_default=True,
              type=click.Choice(
                  ["long_textgrid", "short_textgrid", "json", "csv"]),
              help="Export format (reference textgrid.py:463)")
@click.option("--include_original_text", is_flag=True, default=False,
              help="Add an original-utterance tier to the output")
@click.option("--speaker_characters", "-s", default="0", show_default=True,
              help="Speaker from the first N filename characters (or "
                   "'prosodylab'); default uses directory names")
@click.option("--audio_directory", "-a", type=click.Path(exists=True),
              default=None,
              help="Additional root searched for sound files")
@click.option("--reference_directory", type=click.Path(exists=True),
              default=None,
              help="Gold-standard alignments to evaluate against")
@click.option("--custom_mapping_path", type=click.Path(exists=True),
              default=None,
              help="Yaml mapping phones across phone sets for evaluation")
@click.option("--language", default=None,
              help="Language-specific tokenizer (english is rule-based; "
                   "japanese/chinese/korean/thai gate on their segmentation "
                   "packages and fall back with a warning)")
@click.pass_context
def align_cli(
    ctx,
    corpus_directory,
    dictionary_path,
    acoustic_model_path,
    output_directory,
    beam,
    retry_beam,
    boost_silence,
    batch_size,
    graph_workers,
    distributed,
    include_silence,
    textgrid_cleanup,
    use_phone_model,
    fine_tune,
    transfer_mode,
    single_speaker,
    g2p_model_path,
    rules_path,
    profile_dir,
    config_path,
    output_format,
    include_original_text,
    speaker_characters,
    audio_directory,
    reference_directory,
    custom_mapping_path,
    language,
):
    """Align a corpus to word/phone TextGrids (reference:
    ``command_line/align.py:164``)."""
    if config_path:
        data = _load_command_config(config_path)
        ov = _config_overrides(
            ctx, data,
            ["beam", "retry_beam", "boost_silence", "batch_size",
             "graph_workers", "include_silence", "fine_tune",
             "use_phone_model", "output_format"],
        )
        output_format = ov.get("output_format", output_format)
        valid_formats = ("long_textgrid", "short_textgrid", "json", "csv")
        if output_format not in valid_formats:
            raise click.UsageError(
                f"config output_format must be one of {valid_formats}, "
                f"got {output_format!r}"
            )
        beam = ov.get("beam", beam)
        retry_beam = ov.get("retry_beam", retry_beam)
        boost_silence = ov.get("boost_silence", boost_silence)
        batch_size = ov.get("batch_size", batch_size)
        graph_workers = ov.get("graph_workers", graph_workers)
        include_silence = ov.get("include_silence", include_silence)
        fine_tune = ov.get("fine_tune", fine_tune)
        use_phone_model = ov.get("use_phone_model", use_phone_model)
    # applied after config handling so an explicit flag always wins over a
    # config-file include_silence (command line beats config file)
    if textgrid_cleanup is not None:
        include_silence = not textgrid_cleanup
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
        num_graph_workers=graph_workers,
        distributed=distributed,
        language=language,
        uses_speaker_adaptation=not single_speaker,
        transfer_mode=transfer_mode,
    )
    aligner = PretrainedAligner(
        acoustic_model_path,
        dictionary_path,
        config,
        g2p_model_path=g2p_model_path,
        rules_path=rules_path,
    )
    corpus = Corpus.load(
        corpus_directory,
        speaker_characters=speaker_characters,
        audio_directory=audio_directory,
    )
    import jax as _jax

    if _jax.process_count() > 1:
        # multi-host: each process aligns its own speakers on its local
        # devices and exports its own files (reference analogue: speaker-
        # sharded jobs, corpus/base.py:922; alignment needs no cross-host
        # reduction, so hosts run independently after the shard split)
        from montreal_forced_aligner_tpu.parallel.multihost import (
            shard_corpus_for_host,
        )

        corpus = corpus.subset(
            shard_corpus_for_host(
                corpus, _jax.process_index(), _jax.process_count()
            )
        )
        click.echo(
            f"host {_jax.process_index()}/{_jax.process_count()}: "
            f"aligning {corpus.num_utterances} utterances"
        )
    click.echo(
        f"Loaded corpus: {corpus.num_utterances} utterances, "
        f"{len(corpus.speakers)} speakers"
    )
    results = aligner.align_corpus(corpus, profile_dir=profile_dir)
    phone_transcripts = None
    if use_phone_model:
        # reference alignment/base.py:543: phone transcription replaces
        # fine-tuning when both are requested
        from montreal_forced_aligner_tpu.transcription.phone_transcriber import (
            transcribe_phones,
        )

        if fine_tune:
            click.echo(
                "--use_phone_model supersedes --fine_tune (reference "
                "behavior); skipping fine-tuning"
            )
            fine_tune = False
        phone_transcripts = transcribe_phones(
            acoustic_model_path, corpus, results, batch_size=batch_size,
            phone_lm=aligner.model.phone_lm,
        )
        click.echo(
            f"Phone-transcribed {len(phone_transcripts)} utterances"
        )
    if fine_tune:
        from montreal_forced_aligner_tpu.align.fine_tune import (
            fine_tune_alignments,
        )

        results = fine_tune_alignments(aligner, corpus, results)
        click.echo("Fine-tuned boundaries at 1 ms resolution")
    scores = [r.per_frame_log_likelihood for r in results.values()]
    click.echo(
        f"Aligned {len(results)} utterances "
        f"(mean log-like/frame {sum(scores)/max(len(scores),1):.3f})"
    )
    outs = aligner.export_textgrids(
        corpus, results, output_directory, include_silence=include_silence,
        output_format=output_format,
        include_original_text=include_original_text,
    )
    click.echo(f"Exported {len(outs)} TextGrids to {output_directory}")
    # alignment quality analysis (the reference always runs
    # analyze_alignments after align, command_line/align.py:124)
    from montreal_forced_aligner_tpu.align.analysis import (
        analyze_alignments as _analyze,
        csv_report,
    )

    analyses, flagged = _analyze(results)
    csv_report(
        analyses, corpus, Path(output_directory) / "alignment_analysis.csv"
    )
    if flagged:
        click.echo(
            f"Flagged {len(flagged)} utterances with anomalous phone "
            "durations (see alignment_analysis.csv)"
        )
    if phone_transcripts is not None:
        from montreal_forced_aligner_tpu.transcription.phone_transcriber import (
            evaluate_against_alignments,
        )

        overlap, per = evaluate_against_alignments(
            results,
            phone_transcripts,
            corpus,
            output_path=Path(output_directory)
            / "phone_transcript_evaluation.csv",
            silence_phone=aligner.lexicon.silence_phone,
        )
        click.echo(
            "Phone-transcript evaluation: overlap error "
            f"{'n/a' if overlap is None else f'{overlap:.4f}'}, "
            f"PER {per:.4f} (phone_transcript_evaluation.csv)"
        )
    if reference_directory:
        eval_dir = output_directory
        if output_format in ("json", "csv"):
            # the evaluator reads TextGrids; export a temporary copy
            import tempfile

            eval_dir = tempfile.mkdtemp(prefix="mfa_tpu_eval_")
            aligner.export_textgrids(
                corpus, results, eval_dir, include_silence=include_silence
            )
        _evaluate_alignment_dirs(
            reference_directory,
            eval_dir,
            "sil",
            custom_mapping=_load_custom_mapping(custom_mapping_path),
        )
    click.echo(f"Done! Everything took {time.time() - t0:.1f} seconds")


@cli.command("align_one")
@_num_jobs_option
@click.argument("sound_file", type=click.Path(exists=True))
@click.argument("text_file", type=click.Path(exists=True))
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("acoustic_model_path", type=click.Path(exists=True))
@click.argument("output_path", type=click.Path())
@click.option("--output_format", default="long_textgrid", show_default=True,
              type=click.Choice(
                  ["long_textgrid", "short_textgrid", "json", "csv"],
                  case_sensitive=False))
def align_one_cli(sound_file, text_file, dictionary_path, acoustic_model_path,
                  output_path, output_format):
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
        paths = aligner.export_textgrids(
            corpus, results, out.parent, output_format=output_format
        )
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


@model_cli.command("add")
@click.argument("model_type")
@click.argument("path", type=click.Path(exists=True))
@click.option("--name", default=None)
def model_add_cli(model_type, path, name):
    """Register a local model archive (reference: ``mfa model add``)."""
    from montreal_forced_aligner_tpu.model_manager import ModelManager

    dst = ModelManager().add(model_type, path, name)
    click.echo(f"Registered {dst}")


@model_cli.command("save")
@click.argument("model_type")
@click.argument("path", type=click.Path(exists=True))
@click.option("--name", default=None,
              help="Name to use as reference (defaults to the file stem)")
@click.option("--overwrite/--no_overwrite", default=False)
def model_save_cli(model_type, path, name, overwrite):
    """Save a model into the pretrained registry for later use by name
    (reference: ``mfa model save``, ``command_line/model.py:196``)."""
    from montreal_forced_aligner_tpu.model_manager import ModelManager

    mm = ModelManager()
    resolved = name or Path(path).stem
    try:
        existing = mm.resolve(model_type, resolved)
    except Exception:
        existing = None
    if existing is not None and not overwrite:
        raise click.ClickException(
            f"{model_type} model {resolved!r} already saved at {existing}; "
            "pass --overwrite to replace it"
        )
    dst = mm.add(model_type, path, resolved)
    click.echo(f"Saved {dst}")


@model_cli.command("add_words")
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("new_pronunciations_path", type=click.Path(exists=True))
def model_add_words_cli(dictionary_path, new_pronunciations_path):
    """Merge pronunciations from one dictionary into another, so long as
    the new entries introduce no new phones (reference:
    ``mfa model add_words``, ``command_line/model.py:156-193``)."""
    from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon

    base = Lexicon.load(dictionary_path)
    new = Lexicon.load(new_pronunciations_path)

    def phone_set(lex):
        return {
            p
            for prons in lex.words.values()
            for pron in prons
            for p in pron.phones
        }

    new_phones = phone_set(new) - phone_set(base)
    if new_phones:
        raise click.ClickException(
            "new pronunciations contain phones missing from the base "
            f"dictionary: {sorted(new_phones)}"
        )
    added = 0
    for word, prons in new.words.items():
        for pron in prons:
            before = len(base.words.get(word, ()))
            base.add_pronunciation(word, pron)
            added += len(base.words[word]) > before
    base.write(dictionary_path)
    click.echo(
        f"Added {added} pronunciations from {new_pronunciations_path} "
        f"to {dictionary_path}"
    )


@model_cli.command("list")
@click.argument("model_type", required=False)
def model_list_cli(model_type):
    """List registered models (reference: ``mfa model list``)."""
    from montreal_forced_aligner_tpu.model_manager import ModelManager

    for mt, names in ModelManager().list_models(model_type).items():
        click.echo(f"{mt}:")
        for n in names:
            click.echo(f"  {n}")


@model_cli.command("download")
@click.argument("model_type")
@click.argument("name")
def model_download_cli(model_type, name):
    """Fetch a model from a configured local mirror (no network egress in
    this environment; reference: ``mfa model download``)."""
    from montreal_forced_aligner_tpu.model_manager import ModelManager

    try:
        dst = ModelManager().download(model_type, name)
        click.echo(f"Downloaded to {dst}")
    except RuntimeError as e:
        raise click.ClickException(str(e))


@cli.command("version")
def version_cli():
    from montreal_forced_aligner_tpu import __version__

    click.echo(__version__)


@cli.command("train")
@_num_jobs_option
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("output_model_path", type=click.Path())
@click.option("--output_directory", type=click.Path(), default=None,
              help="Optional directory for final-model TextGrid export")
@click.option("--batch_size", default=16, show_default=True)
@click.option("--graph_workers", default=0, show_default=True,
              help="Processes for host graph compilation (0 = in-process)")
@click.option("--num_iterations_scale", default=1.0, show_default=True,
              help="Scale factor on per-stage iteration counts (quick runs)")
@click.option("--working_directory", type=click.Path(), default=None,
              help="Stage checkpoints for resume")
@click.option("--seed", default=0, show_default=True,
              help="RNG seed for Gaussian split perturbations and subset "
                   "sampling (reference GLOBAL_CONFIG.seed)")
@click.option("--checkpoint_interval", default=60.0, show_default=True,
              help="Minimum seconds between per-iteration resume "
                   "checkpoints (0 = every iteration; each save round-trips "
                   "the model over the device link)")
@click.option("--clean/--no_clean", default=False, show_default=True,
              help="Wipe existing checkpoints in --working_directory and "
                   "start fresh (reference --clean semantics)")
@click.option("--position_dependent_phones/--no_position_dependent_phones",
              default=True, show_default=True,
              help="Word-position phone variants (_B/_E/_I/_S), MFA default")
@click.option("--features_on_host/--features_on_device", default=False,
              show_default=True,
              help="Keep feature batches in host RAM (large corpora)")
@click.option("--phone_set_type", "--phone_set", default="UNKNOWN",
              show_default=True,
              type=click.Choice(["UNKNOWN", "AUTO", "ARPA", "IPA", "PINYIN"],
                                case_sensitive=False),
              help="Phone-set family for tree roots + phonological questions "
                   "(reference --phone_set)")
@click.option("--speaker_characters", "-s", default="0", show_default=True,
              help="Speaker id from file-name characters (int or "
                   "'prosodylab'); default uses directory names")
@click.option("--audio_directory", "-a", type=click.Path(exists=True),
              default=None,
              help="Additional root searched for sound files")
@click.option("--output_format", default="long_textgrid", show_default=True,
              type=click.Choice(
                  ["long_textgrid", "short_textgrid", "json", "csv"],
                  case_sensitive=False),
              help="Format for --output_directory exports")
@click.option("--include_original_text", is_flag=True, default=False,
              help="Carry the original transcript into exported TextGrids")
@click.option("--language", default=None,
              help="Language hint for tokenization (reference --language; "
                   "language-specific tokenizer packages are not bundled — "
                   "unsupported values warn and fall back to the simple "
                   "tokenizer)")
@click.option("--config_path", type=click.Path(exists=True), default=None,
              help="Yaml training recipe + parameters (reference schema, "
                   "e.g. the reference's basic_train_config.yaml)")
@click.option("--rules_path", type=click.Path(exists=True), default=None,
              help="Phonological rules yaml applied to the dictionary")
@click.option("--topology_path", type=click.Path(exists=True), default=None,
              help="Yaml of per-phone {min_states, max_states} HMM-topology "
                   "overrides (reference --topology_path)")
@click.option("--phone_groups_path", type=click.Path(exists=True),
              default=None,
              help="Yaml of phone groups sharing a tree root (reference "
                   "--phone_groups_path)")
@click.option("--variable_length_topology/--chain_topology", default=True,
              show_default=True,
              help="Variable-length phone topology (MFA 2.0+ default, min "
                   "1 frame) vs classic Bakis chains (stronger duration "
                   "priors)")
@click.option("--distributed/--no_distributed", default=None,
              help="Run training as one SPMD program over all devices "
                   "(jax.sharding.Mesh; auto-on for multi-chip TPU hosts and "
                   "multi-process pod runs)")
@click.option("--profile_dir", type=click.Path(), default=None,
              help="Write a JAX profiler trace of the training run here")
@click.option("--train_g2p", is_flag=True, default=False,
              help="Pronunciation-probability stages train a G2P model on "
                   "the aligned pronunciations and regenerate the lexicon "
                   "from it (reference train_g2p variant, "
                   "pronunciation_probabilities.py:160)")
@click.pass_context
def train_cli(ctx, corpus_directory, dictionary_path, output_model_path,
              output_directory, batch_size, graph_workers,
              num_iterations_scale, working_directory, seed,
              checkpoint_interval, clean,
              position_dependent_phones, features_on_host, phone_set_type,
              speaker_characters, audio_directory, output_format,
              include_original_text, language,
              config_path, rules_path, topology_path, phone_groups_path,
              variable_length_topology, distributed, profile_dir, train_g2p):
    """Train an acoustic model mono->tri->LDA->SAT (reference:
    ``mfa train``, ``command_line/train_acoustic_model.py``)."""
    import time

    if clean and working_directory is not None:
        import shutil as _shutil
        from pathlib import Path as _Path

        import jax as _jax

        wd = _Path(working_directory)
        # pod runs share --working_directory: only process 0 wipes, with a
        # cross-host barrier so no host starts writing checkpoints another
        # host is about to delete (advisor r2 finding)
        if _jax.process_count() > 1:
            if _jax.process_index() == 0 and wd.exists():
                _shutil.rmtree(wd)
                click.echo(f"Cleaned working directory {wd}")
            from montreal_forced_aligner_tpu.parallel.multihost import (
                host_barrier,
            )

            host_barrier("train_clean")
        elif wd.exists():
            # reference --clean: wipe prior run state so nothing resumes
            _shutil.rmtree(wd)
            click.echo(f"Cleaned working directory {wd}")

    from montreal_forced_aligner_tpu.training.trainer import (
        DEFAULT_RECIPE,
        TrainableAligner,
    )
    from dataclasses import replace as _replace

    t0 = time.time()
    use_pitch = False
    mfcc_config = None
    recipe = DEFAULT_RECIPE
    if config_path:
        data = _load_command_config(config_path)
        ov = _config_overrides(
            ctx, data,
            ["batch_size", "graph_workers", "position_dependent_phones",
             "phone_set_type"],
        )
        batch_size = ov.get("batch_size", batch_size)
        graph_workers = ov.get("graph_workers", graph_workers)
        position_dependent_phones = ov.get(
            "position_dependent_phones", position_dependent_phones
        )
        phone_set_type = ov.get("phone_set_type", phone_set_type)
        feats = data.get("features") or {}
        use_pitch = bool(feats.get("use_pitch", False))
        if "frame_shift" in feats or "use_energy" in feats:
            from montreal_forced_aligner_tpu.ops.mfcc import MfccConfig

            mfcc_config = MfccConfig(
                frame_shift_ms=float(feats.get("frame_shift", 10)),
                use_energy=bool(feats.get("use_energy", False)),
            )
        if data.get("training"):
            recipe = _recipe_from_config(data)
    recipe = [
        _replace(
            st,
            num_iterations=max(2, int(st.num_iterations * num_iterations_scale))
            if st.num_iterations
            else 0,
            train_g2p=st.train_g2p or (train_g2p and st.kind == "pron_prob"),
        )
        for st in recipe
    ]
    from montreal_forced_aligner_tpu.training.base import (
        TrainerConfig as _TrainerConfig,
    )

    ta = TrainableAligner(
        corpus_directory, dictionary_path, recipe=recipe,
        base_config=_TrainerConfig(
            checkpoint_interval_s=float(checkpoint_interval),
            seed=int(seed),
        ),
        batch_size=batch_size, working_directory=working_directory,
        speaker_characters=speaker_characters,
        audio_directory=audio_directory,
        position_dependent_phones=position_dependent_phones,
        features_on_host=features_on_host,
        phone_set_type=phone_set_type,
        num_graph_workers=graph_workers,
        use_pitch=use_pitch,
        mfcc_config=mfcc_config,
        rules_path=rules_path,
        topology_path=topology_path,
        phone_groups_path=phone_groups_path,
        variable_length_topology=variable_length_topology,
        distributed=distributed,
        language=language,
    )
    import contextlib

    if profile_dir:
        import jax as _jax

        trace_cm = _jax.profiler.trace(str(profile_dir))
    else:
        trace_cm = contextlib.nullcontext()
    with trace_cm:
        final = ta.train()
    ta.export_model(output_model_path)
    click.echo(f"Saved model to {output_model_path}")
    if output_directory is not None:
        # final-model alignment export (reference mfa train
        # --output_directory, command_line/train_acoustic_model.py)
        from montreal_forced_aligner_tpu.align.aligner import (
            AlignerConfig,
            PretrainedAligner,
        )
        from montreal_forced_aligner_tpu.corpus.corpus import Corpus

        aligner = PretrainedAligner(
            output_model_path, dictionary_path,
            AlignerConfig(batch_size=batch_size),
        )
        corpus = Corpus.load(
            corpus_directory,
            speaker_characters=speaker_characters,
            audio_directory=audio_directory,
        )
        results = aligner.align_corpus(corpus)
        outs = aligner.export_textgrids(
            corpus, results, output_directory,
            output_format=output_format,
            include_original_text=include_original_text,
        )
        click.echo(f"Exported {len(outs)} TextGrids to {output_directory}")
    click.echo(f"Done! Everything took {time.time() - t0:.1f} seconds")


@cli.command("adapt")
@_num_jobs_option
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("acoustic_model_path", type=click.Path(exists=True))
@click.argument("output_model_path", type=click.Path())
@click.option("--mapping_tau", default=20.0, show_default=True)
@click.option("--output_directory", type=click.Path(), default=None,
              help="Also align the corpus with the adapted model and export "
                   "TextGrids here (reference adapt --output_directory)")
@click.option("--output_format", default="long_textgrid", show_default=True,
              type=click.Choice(
                  ["long_textgrid", "short_textgrid", "json", "csv"],
                  case_sensitive=False))
@click.option("--include_original_text", is_flag=True, default=False)
@click.option("--speaker_characters", "-s", default="0", show_default=True)
@click.option("--audio_directory", "-a", type=click.Path(exists=True),
              default=None)
def adapt_cli(corpus_directory, dictionary_path, acoustic_model_path,
              output_model_path, mapping_tau, output_directory, output_format,
              include_original_text, speaker_characters, audio_directory):
    """MAP-adapt an acoustic model to a corpus (reference: ``mfa adapt``,
    ``alignment/adapting.py``)."""
    from montreal_forced_aligner_tpu.training.adapt import MapAdapter

    adapter = MapAdapter(acoustic_model_path, dictionary_path, mapping_tau)
    adapted = adapter.adapt(
        corpus_directory,
        speaker_characters=speaker_characters,
        audio_directory=audio_directory,
    )
    adapted.save(output_model_path)
    click.echo(f"Saved adapted model to {output_model_path}")
    if output_directory is not None:
        from montreal_forced_aligner_tpu.align.aligner import (
            AlignerConfig,
            PretrainedAligner,
        )
        from montreal_forced_aligner_tpu.corpus.corpus import Corpus

        aligner = PretrainedAligner(
            output_model_path, dictionary_path, AlignerConfig()
        )
        corpus = Corpus.load(
            corpus_directory,
            speaker_characters=speaker_characters,
            audio_directory=audio_directory,
        )
        results = aligner.align_corpus(corpus)
        outs = aligner.export_textgrids(
            corpus, results, output_directory,
            output_format=output_format,
            include_original_text=include_original_text,
        )
        click.echo(f"Exported {len(outs)} TextGrids to {output_directory}")


@cli.command("validate")
@_num_jobs_option
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.option("--acoustic_model_path", type=click.Path(exists=True), default=None)
@click.option("--test_transcriptions/--no_test_transcriptions", default=False,
              help="Decode utterances against a corpus LM and report WER "
                   "(flags likely transcript errors)")
@click.option("--ignore_acoustics/--no_ignore_acoustics",
              "--skip_acoustics/--no_skip_acoustics", default=False,
              help="Skip audio decoding checks (reference --ignore_acoustics)")
@click.option("--speaker_characters", "-s", default="0", show_default=True,
              help="Speaker id from file-name characters (int or "
                   "'prosodylab'); default uses directory names")
@click.option("--audio_directory", "-a", type=click.Path(exists=True),
              default=None,
              help="Additional root searched for sound files")
@click.option("--output_directory", "--output_path", type=click.Path(),
              default=None,
              help="Write oovs_found.txt / utterance_oovs.txt here "
                   "(reference analyze_oovs, corpus_validator.py:130)")
@click.option("--rules_path", type=click.Path(exists=True), default=None,
              help="Phonological rules yaml applied to the dictionary "
                   "before validation (reference --rules_path)")
@click.option("--config_path", type=click.Path(exists=True), default=None,
              help="Yaml parameter file (reference --config_path semantics)")
@click.pass_context
def validate_cli(ctx, corpus_directory, dictionary_path, acoustic_model_path,
                 test_transcriptions, ignore_acoustics, speaker_characters,
                 audio_directory, output_directory, rules_path, config_path):
    """Validate a corpus + dictionary (reference: ``mfa validate``,
    ``validation/corpus_validator.py:77``): counts, OOVs, audio issues."""
    from collections import Counter, defaultdict

    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon
    from montreal_forced_aligner_tpu.dictionary.tokenizer import SimpleTokenizer

    if config_path:
        data = _load_command_config(config_path)
        ov = _config_overrides(
            ctx, data,
            ["test_transcriptions", "ignore_acoustics", "speaker_characters"],
        )
        test_transcriptions = ov.get("test_transcriptions", test_transcriptions)
        ignore_acoustics = ov.get("ignore_acoustics", ignore_acoustics)
        speaker_characters = ov.get("speaker_characters", speaker_characters)
    lex = Lexicon.load(dictionary_path)
    if rules_path is not None:
        from montreal_forced_aligner_tpu.dictionary.rules import (
            PhonologicalRule,
            apply_rules_to_lexicon,
        )

        apply_rules_to_lexicon(lex, PhonologicalRule.load_rules(rules_path))
    corpus = Corpus.load(
        corpus_directory,
        speaker_characters=speaker_characters,
        audio_directory=audio_directory,
    )
    tokenizer = SimpleTokenizer(word_set=set(lex.words))
    oovs = Counter()
    utterance_oovs = defaultdict(list)
    total_words = 0
    bad_audio = []
    total_duration = 0.0
    for utt in corpus.utterances:
        _norm, utt_oovs = tokenizer(utt.text)
        oovs.update(utt_oovs)
        if utt_oovs:
            utterance_oovs[f"{utt.file_name}-{utt.speaker}"].extend(utt_oovs)
        total_words += len(utt.normalized_tokens or _norm.split())
        if ignore_acoustics:
            continue
        try:
            wav = corpus.load_audio(utt)
            total_duration += len(wav.samples) / wav.sample_rate
        except Exception as e:
            bad_audio.append((utt.file_name, str(e)))
    click.echo(f"Speakers: {len(corpus.speakers)}")
    click.echo(f"Utterances: {corpus.num_utterances}")
    click.echo(f"Total duration: {total_duration:.1f}s")
    click.echo(f"Total words: {total_words}")
    click.echo(f"OOV types: {len(oovs)}  tokens: {sum(oovs.values())}")
    for w, c in oovs.most_common(20):
        click.echo(f"  {w}\t{c}")
    if bad_audio:
        click.echo(f"Sound file errors: {len(bad_audio)}")
        for f, e in bad_audio[:10]:
            click.echo(f"  {f}: {e}")
    # container-level triage: truncated/unreadable files, per-speaker
    # sample-rate mixtures, segments past end-of-file (reference
    # analyze_setup wav issues, validation/corpus_validator.py:77)
    file_issues = corpus.audit_files()
    if file_issues:
        click.echo(f"Sound file issues: {len(file_issues)}")
        for issue in file_issues[:20]:
            click.echo(
                f"  [{issue['issue']}] {issue['file']}: {issue['detail']}"
            )
    if output_directory is not None:
        out = Path(output_directory)
        out.mkdir(parents=True, exist_ok=True)
        with open(out / "oovs_found.txt", "w", encoding="utf-8") as f:
            for w, c in oovs.most_common():
                f.write(f"{w}\t{c}\n")
        with open(out / "utterance_oovs.txt", "w", encoding="utf-8") as f:
            for key, words in sorted(utterance_oovs.items()):
                f.write(f"{key}\t{', '.join(words)}\n")
        if file_issues:
            with open(out / "sound_file_issues.txt", "w", encoding="utf-8") as f:
                for issue in file_issues:
                    f.write(
                        f"{issue['issue']}\t{issue['file']}\t"
                        f"{issue['detail']}\n"
                    )
        click.echo(f"Wrote OOV reports to {out}")
    if test_transcriptions:
        if acoustic_model_path is None:
            raise click.ClickException(
                "--test_transcriptions requires --acoustic_model_path"
            )
        from montreal_forced_aligner_tpu.transcription.transcriber import (
            Transcriber,
        )

        tr = Transcriber(acoustic_model_path, dictionary_path)
        import jax as _jax

        if _jax.process_count() > 1:
            # multi-host: per-speaker LM decode is speaker-independent —
            # each host trains LMs for and decodes its own speakers, the
            # direct analogue of the reference's speaker-sharded
            # TrainSpeakerLmFunction + PerSpeakerDecodeFunction jobs
            # (language_modeling/multiprocessing.py:247,
            # transcription/multiprocessing.py:1454)
            from montreal_forced_aligner_tpu.parallel.multihost import (
                shard_corpus_for_host,
            )

            corpus = corpus.subset(
                shard_corpus_for_host(
                    corpus, _jax.process_index(), _jax.process_count()
                )
            )
            click.echo(
                f"host {_jax.process_index()}/{_jax.process_count()}: "
                f"decoding {corpus.num_utterances} utterances with "
                f"per-speaker LMs"
            )
        # per-speaker LMs, matching the reference's validation decode
        # (PerSpeakerDecodeFunction, transcription/multiprocessing.py:1454)
        results = tr.transcribe_corpus_per_speaker(corpus)
        metrics = tr.evaluate(corpus, results)
        click.echo(
            f"Transcription check: WER {metrics['wer']:.4f} over "
            f"{metrics['num_utterances']} utterances"
        )
        if _jax.process_count() > 1:
            # corpus-wide number matching a single-process run (reference:
            # parent-process aggregation of per-job results): reduce the
            # utterance-weighted WER/CER sums across hosts
            import numpy as _np

            from montreal_forced_aligner_tpu.parallel.multihost import (
                host_allgather,
            )

            n_local = metrics["num_utterances"]
            sums = host_allgather(
                _np.array(
                    [
                        metrics["wer"] * n_local,
                        metrics["cer"] * n_local,
                        n_local,
                    ]
                )
            )
            tot = _np.sum(sums, axis=0)
            if tot[2] > 0:
                click.echo(
                    f"Transcription check (all hosts): WER "
                    f"{tot[0] / tot[2]:.4f}, CER {tot[1] / tot[2]:.4f} over "
                    f"{int(tot[2])} utterances"
                )
        from montreal_forced_aligner_tpu.evaluation import score_wer

        flagged = []
        for utt in corpus.utterances:
            if utt.id not in results:
                continue
            ref = tr.aligner.tokenizer.tokenize(utt.text)
            wer = score_wer(ref, results[utt.id].text.split())
            if wer > 0.45:
                flagged.append((utt.file_name, wer))
        if flagged:
            click.echo(f"Utterances with suspicious transcripts: {len(flagged)}")
            for f, w in flagged[:20]:
                click.echo(f"  {f}: WER {w:.2f}")
    click.echo("Validation complete")


@cli.command("create_segments_vad")
@_num_jobs_option
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("output_directory", type=click.Path())
@click.option("--max_segment_length", default=30.0, show_default=True)
@click.option("--min_segment_length", default=0.333, show_default=True)
@click.option("--min_pause_duration", default=0.333, show_default=True)
@click.option("--energy_threshold", default=5.5, show_default=True)
@click.option("--speechbrain_model_path", type=click.Path(exists=True),
              default=None,
              help="Local SpeechBrain VAD checkpoint: neural VAD instead of "
                   "energy VAD (reference SpeechbrainVadSegmenter)")
@click.option("--output_format", default="long_textgrid", show_default=True,
              type=click.Choice(
                  ["long_textgrid", "short_textgrid", "json", "csv"],
                  case_sensitive=False))
def create_segments_vad_cli(corpus_directory, output_directory,
                            max_segment_length, min_segment_length,
                            min_pause_duration, energy_threshold,
                            speechbrain_model_path, output_format):
    """Segment audio files by energy VAD (reference:
    ``mfa create_segments_vad``, ``vad/segmenter.py:56``)."""
    from montreal_forced_aligner_tpu.vad.segmenter import (
        SegmenterConfig,
        SpeechbrainVadSegmenter,
        VadSegmenter,
    )

    cfg = SegmenterConfig(
        max_segment_length=max_segment_length,
        min_segment_length=min_segment_length,
        min_pause_duration=min_pause_duration,
        energy_threshold=energy_threshold,
    )
    if speechbrain_model_path:
        seg = SpeechbrainVadSegmenter(speechbrain_model_path, cfg)
    else:
        seg = VadSegmenter(cfg)
    outs = seg.segment_corpus(
        corpus_directory, output_directory, output_format=output_format
    )
    click.echo(f"Wrote {len(outs)} segment files to {output_directory}")


@cli.command("create_segments")
@_num_jobs_option
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("acoustic_model_path", type=click.Path(exists=True))
@click.argument("output_directory", type=click.Path())
@click.option("--max_segment_length", default=30.0, show_default=True)
@click.option("--min_pause_duration", default=0.15, show_default=True,
              help="Aligned silence gap that splits segments")
def create_segments_cli(corpus_directory, dictionary_path,
                        acoustic_model_path, output_directory,
                        max_segment_length, min_pause_duration):
    """Segment long transcribed files by aligning the transcript and cutting
    at silences (reference: ``mfa segment`` / ``TranscriptionSegmenter``,
    ``vad/segmenter.py:575``, ``SegmentTranscriptFunction``
    ``vad/multiprocessing.py:409``). Writes one TextGrid per file whose
    ``segments`` tier carries each segment's transcript."""
    from pathlib import Path as _P

    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.io.textgrid import Interval, TextGrid
    from montreal_forced_aligner_tpu.vad.transcript_segmenter import (
        segment_transcribed_file,
    )

    aligner = PretrainedAligner(
        acoustic_model_path, dictionary_path, AlignerConfig()
    )
    corpus = Corpus.load(corpus_directory)
    out = _P(output_directory)
    out.mkdir(parents=True, exist_ok=True)
    n_segments = 0
    for utt in corpus.utterances:
        wav = corpus.load_audio(utt)
        segs = segment_transcribed_file(
            aligner,
            wav.samples,
            utt.text,
            min_pause=min_pause_duration,
            max_segment_length=max_segment_length,
        )
        tg = TextGrid()
        tg.xmax = wav.duration
        tg.tiers["segments"] = [
            Interval(s.begin, s.end, s.text) for s in segs
        ]
        tg.write(out / f"{utt.file_name}.TextGrid")
        n_segments += len(segs)
    click.echo(
        f"Segmented {corpus.num_utterances} files into {n_segments} "
        f"utterances -> {output_directory}"
    )


def _load_custom_mapping(custom_mapping_path):
    """Phone-mapping yaml for cross-phone-set evaluation (reference
    ``--custom_mapping_path``; many-to-one entries allowed)."""
    if not custom_mapping_path:
        return None
    import yaml

    with open(custom_mapping_path, encoding="utf8") as f:
        raw = yaml.safe_load(f) or {}
    mapping = {}
    for k, v in raw.items():
        if isinstance(v, list):
            # many-to-one entries stay lists (compare_labels membership test)
            mapping[str(k)] = [str(item) for item in v]
        else:
            mapping[str(k)] = str(v)
    return mapping


def _evaluate_alignment_dirs(
    reference_directory, test_directory, silence_phone, custom_mapping=None
):
    """Compare two directories of TextGrids (reference
    ``alignment/base.py:2536``); prints overlap error, phone error rate and
    +-10 ms boundary agreement."""
    from pathlib import Path

    import numpy as np

    from montreal_forced_aligner_tpu.data import CtmInterval
    from montreal_forced_aligner_tpu.evaluation import (
        align_phones,
        boundary_agreement,
    )
    from montreal_forced_aligner_tpu.io.textgrid import TextGrid

    def phones_of(path):
        tg = TextGrid.read(path)
        out = []
        for name, ivs in tg.tiers.items():
            if "phone" in name.lower():
                out.extend(
                    CtmInterval(iv.begin, iv.end, iv.label.strip())
                    for iv in ivs
                    if iv.label.strip()
                )
        return out

    scores, pers, agrees, totals = [], [], [], []
    for ref_tg in sorted(Path(reference_directory).rglob("*.TextGrid")):
        test_tg = Path(test_directory) / ref_tg.name
        if not test_tg.exists():
            continue
        ref = phones_of(ref_tg)
        test = phones_of(test_tg)
        if not ref or not test:
            continue
        sc, per, _err = align_phones(
            ref, test, silence_phone, custom_mapping=custom_mapping
        )
        ag, nb = boundary_agreement(ref, test, silence_phone)
        if sc is not None:
            scores.append(sc)
        pers.append(per)
        agrees.append(ag * nb)
        totals.append(nb)
    if not totals:
        click.echo("No overlapping TextGrids found")
        return
    click.echo(f"Files evaluated: {len(pers)}")
    click.echo(f"Mean overlap error: {np.mean(scores):.4f}s")
    click.echo(f"Mean phone error rate: {np.mean(pers):.4f}")
    click.echo(
        f"Boundary agreement (+-10ms): {sum(agrees) / max(sum(totals), 1):.4f}"
    )


@cli.command("evaluate_alignments")
@click.argument("reference_directory", type=click.Path(exists=True))
@click.argument("test_directory", type=click.Path(exists=True))
@click.option("--silence_phone", default="sil", show_default=True)
@click.option("--custom_mapping_path", type=click.Path(exists=True),
              default=None,
              help="Yaml mapping phones across phone sets for evaluation")
def evaluate_alignments_cli(
    reference_directory, test_directory, silence_phone, custom_mapping_path
):
    """Compare two directories of TextGrids (reference:
    ``alignment/base.py:2536`` evaluate_alignments): overlap error, phone
    error rate, boundary agreement (+-10 ms)."""
    _evaluate_alignment_dirs(
        reference_directory,
        test_directory,
        silence_phone,
        custom_mapping=_load_custom_mapping(custom_mapping_path),
    )


@cli.command("train_lm")
@_num_jobs_option
@click.argument("source_path", type=click.Path(exists=True))
@click.argument("output_model_path", type=click.Path())
@click.option("--order", default=3, show_default=True)
@click.option("--dictionary_path", type=click.Path(exists=True), default=None,
              help="Restrict the LM vocabulary to this dictionary's words; "
                   "other tokens become <unk> (reference --dictionary_path)")
@click.option("--prune_thresh_small", default=0.0000003, show_default=True,
              help="Relative-entropy pruning threshold for the small LM "
                   "variant (zip output only; reference MfaLmArpaTrainer)")
@click.option("--prune_thresh_medium", default=0.0000001, show_default=True,
              help="Relative-entropy pruning threshold for the medium LM "
                   "variant (zip output only)")
def train_lm_cli(source_path, output_model_path, order, dictionary_path,
                 prune_thresh_small, prune_thresh_medium):
    """Train an n-gram LM from a text file (one sentence per line) or a
    corpus directory (reference: ``mfa train_lm``,
    ``language_modeling/trainer.py``). A ``.zip`` output writes the
    reference's archive (large + entropy-pruned medium/small); other
    extensions write a single ARPA file."""
    from pathlib import Path as _P

    from montreal_forced_aligner_tpu.language_modeling.ngram import (
        train_lm_from_texts,
    )

    src = _P(source_path)
    if src.is_dir():
        texts = []
        for lab in sorted(src.rglob("*.lab")) + sorted(src.rglob("*.txt")):
            t = lab.read_text(encoding="utf-8").strip().lower()
            if t:
                texts.append(t)
    else:
        texts = [
            ln.strip().lower()
            for ln in src.read_text(encoding="utf-8").splitlines()
            if ln.strip()
        ]
    if dictionary_path is not None:
        from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon

        vocab = set(Lexicon.load(dictionary_path).words)
        texts = [
            " ".join(t if t in vocab else "<unk>" for t in s.split())
            for s in texts
        ]
    if str(output_model_path).lower().endswith(".zip"):
        # the reference's archive layout: large + entropy-pruned medium and
        # small variants (MfaLmArpaTrainer, language_modeling/trainer.py:122)
        from montreal_forced_aligner_tpu.language_modeling.archive import (
            LanguageModelArchive,
        )

        archive = LanguageModelArchive.train(
            texts, order=order,
            prune_thresh_small=prune_thresh_small,
            prune_thresh_medium=prune_thresh_medium,
        )
        archive.save(output_model_path)
        sizes = {
            k: sum(len(m.ngrams[n]) for n in range(1, m.order + 1))
            for k, m in (
                ("large", archive.large),
                ("medium", archive.medium),
                ("small", archive.small),
            )
        }
        click.echo(
            f"Trained order-{order} LM archive on {len(texts)} sentences "
            f"(ngrams: large {sizes['large']}, medium {sizes['medium']}, "
            f"small {sizes['small']}) -> {output_model_path}"
        )
    else:
        model, _counter = train_lm_from_texts(texts, order=order)
        model.write(output_model_path)
        click.echo(
            f"Trained order-{order} LM on {len(texts)} sentences "
            f"({len(model.ngrams[1])} unigrams) -> {output_model_path}"
        )


@cli.command("transcribe")
@_num_jobs_option
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("acoustic_model_path", type=click.Path(exists=True))
@click.argument("output_directory", type=click.Path())
@click.option("--language_model_path", type=click.Path(exists=True), default=None,
              help="ARPA LM; trained from the corpus transcripts if omitted")
@click.option("--evaluate/--no_evaluate", default=False)
@click.option("--batch_size", default=16, show_default=True)
@click.option("--nbest", default=1, show_default=True,
              help="decode N-best hypotheses (determinized K-best Viterbi)")
@click.option("--rescore_lm_path", type=click.Path(exists=True), default=None,
              help="larger ARPA LM for N-best rescoring (needs --nbest > 1)")
@click.option("--rescore_weight", default=None, type=float,
              help="LM weight during N-best rescoring  [default: "
                   "--language_model_weight]")
@click.option("--language_model_weight", default=1.0, show_default=True,
              help="LM scale during decoding (reference semantics)")
@click.option("--word_insertion_penalty", default=0.0, show_default=True,
              help="Per-word entry cost (reference semantics)")
@click.option("--config_path", type=click.Path(exists=True), default=None,
              help="Yaml parameter file (reference --config_path semantics)")
@click.option("--profile_dir", type=click.Path(), default=None,
              help="Write a JAX profiler trace of the decode here "
                   "(view with TensorBoard; parity with align/train)")
@click.option("--output_type", default="transcription", show_default=True,
              type=click.Choice(["transcription", "alignment"]),
              help="transcription: utterance-text tiers; alignment: "
                   "word/phone tiers of the decoded best path "
                   "(reference --output_type)")
@click.option("--output_format", default="long_textgrid", show_default=True,
              type=click.Choice(
                  ["long_textgrid", "short_textgrid", "json", "csv"],
                  case_sensitive=False))
@click.option("--include_original_text", is_flag=True, default=False)
@click.option("--speaker_characters", "-s", default="0", show_default=True)
@click.option("--audio_directory", "-a", type=click.Path(exists=True),
              default=None)
@click.pass_context
def transcribe_cli(ctx, corpus_directory, dictionary_path, acoustic_model_path,
                   output_directory, language_model_path, evaluate, batch_size,
                   nbest, rescore_lm_path, rescore_weight,
                   language_model_weight, word_insertion_penalty, config_path,
                   profile_dir, output_type, output_format,
                   include_original_text, speaker_characters, audio_directory):
    """Transcribe a corpus (reference: ``mfa transcribe``,
    ``transcription/transcriber.py:959``). Writes one .lab per utterance."""
    import contextlib

    if profile_dir:
        import jax as _jax_prof

        trace_cm = _jax_prof.profiler.trace(str(profile_dir))
    else:
        trace_cm = contextlib.nullcontext()
    with trace_cm:
        return _transcribe_impl(
            ctx, corpus_directory, dictionary_path, acoustic_model_path,
            output_directory, language_model_path, evaluate, batch_size,
            nbest, rescore_lm_path, rescore_weight, language_model_weight,
            word_insertion_penalty, config_path, output_type, output_format,
            include_original_text, speaker_characters, audio_directory,
        )


def _transcribe_impl(ctx, corpus_directory, dictionary_path,
                     acoustic_model_path, output_directory,
                     language_model_path, evaluate, batch_size, nbest,
                     rescore_lm_path, rescore_weight, language_model_weight,
                     word_insertion_penalty, config_path, output_type,
                     output_format, include_original_text,
                     speaker_characters, audio_directory):
    if config_path:
        data = _load_command_config(config_path)
        ov = _config_overrides(
            ctx, data,
            ["batch_size", "nbest", "rescore_weight", "evaluate",
             "language_model_weight", "word_insertion_penalty"],
        )
        batch_size = ov.get("batch_size", batch_size)
        nbest = ov.get("nbest", nbest)
        rescore_weight = ov.get("rescore_weight", rescore_weight)
        evaluate = ov.get("evaluate", evaluate)
        language_model_weight = ov.get(
            "language_model_weight", language_model_weight
        )
        word_insertion_penalty = ov.get(
            "word_insertion_penalty", word_insertion_penalty
        )
    from pathlib import Path as _P

    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.language_modeling.ngram import ArpaModel
    from montreal_forced_aligner_tpu.transcription.transcriber import Transcriber

    lm = None
    archive_rescore = None
    if language_model_path:
        if str(language_model_path).lower().endswith(".zip"):
            # LanguageModel archive: decode against the smallest variant,
            # rescore N-best against the largest (reference decode_arpa_path
            # / carpa_path + lattice rescoring, transcriber.py:701-760)
            from montreal_forced_aligner_tpu.language_modeling.archive import (
                LanguageModelArchive,
            )

            la = LanguageModelArchive.load(language_model_path)
            lm = la.decode_model
            if la.rescore_model is not la.decode_model:
                archive_rescore = la.rescore_model
        else:
            lm = ArpaModel.read(language_model_path)
    tr = Transcriber(
        acoustic_model_path, dictionary_path, lm=lm, batch_size=batch_size,
        lm_scale=language_model_weight,
        word_insertion_penalty=word_insertion_penalty,
    )
    corpus = Corpus.load(
        corpus_directory,
        speaker_characters=speaker_characters,
        audio_directory=audio_directory,
        require_transcripts=False,
    )
    import jax as _jax

    if _jax.process_count() > 1:
        # multi-host: decode is per-utterance independent — each host takes
        # its speakers and exports its own transcripts (same scheme as
        # align; reference analogue: speaker-sharded jobs)
        from montreal_forced_aligner_tpu.parallel.multihost import (
            shard_corpus_for_host,
        )

        corpus = corpus.subset(
            shard_corpus_for_host(
                corpus, _jax.process_index(), _jax.process_count()
            )
        )
        click.echo(
            f"host {_jax.process_index()}/{_jax.process_count()}: "
            f"transcribing {corpus.num_utterances} utterances"
        )
    rescore_lm = ArpaModel.read(rescore_lm_path) if rescore_lm_path else None
    if rescore_lm is None and archive_rescore is not None:
        # the reference always rescores against the archive's largest LM
        # (lattice rescoring, transcriber.py:701-760); the exact N-best
        # equivalent needs alternatives to re-rank, so decode N-best even
        # when the user asked for 1-best
        rescore_lm = archive_rescore
        if nbest <= 1:
            nbest = 10
        click.echo("Rescoring N-best with the archive's large LM")
    if rescore_weight is None:
        rescore_weight = language_model_weight
    results = tr.transcribe_corpus(
        corpus, nbest=nbest, rescore_lm=rescore_lm,
        rescore_weight=rescore_weight,
    )
    _export_transcripts(
        corpus, {i: r.text for i, r in results.items()}, output_directory
    )
    if output_type == "alignment":
        # word/phone tiers of the decoded best path (reference
        # --output_type alignment): force-align the hypotheses
        decoded = Corpus.load(
            corpus_directory,
            speaker_characters=speaker_characters,
            audio_directory=audio_directory,
            require_transcripts=False,
        )
        for utt in decoded.utterances:
            if utt.id in results:
                utt.text = results[utt.id].text
        aligned = tr.aligner.align_corpus(decoded)
        tr.aligner.export_textgrids(
            decoded, aligned, output_directory,
            output_format=output_format,
            include_original_text=include_original_text,
        )
    else:
        _export_transcription_textgrids(
            corpus, results, output_directory, output_format,
            include_original_text=include_original_text,
        )
    click.echo(f"Transcribed {len(results)} utterances to {output_directory}")
    if evaluate:
        metrics = tr.evaluate(corpus, results)
        click.echo(
            f"WER: {metrics['wer']:.4f}  CER: {metrics['cer']:.4f} "
            f"({metrics['num_utterances']} utterances)"
        )


def _export_transcription_textgrids(
    corpus, results, output_directory, output_format,
    include_original_text=False,
):
    """Per-file TextGrid/json/csv with one utterance-text tier per speaker
    (reference ``mfa transcribe --output_type transcription`` export,
    ``command_line/transcribe.py:69-79``)."""
    from montreal_forced_aligner_tpu.io.textgrid import Interval, TextGrid
    from montreal_forced_aligner_tpu.io.wav import read_wave

    extensions = {
        "long_textgrid": ".TextGrid",
        "short_textgrid": ".TextGrid",
        "json": ".json",
        "csv": ".csv",
    }
    output_directory = Path(output_directory)
    output_directory.mkdir(parents=True, exist_ok=True)
    by_file = {}
    for utt in corpus.utterances:
        by_file.setdefault(utt.file_name, []).append(utt)
    out_paths = []
    for file_name, utts in by_file.items():
        tg = TextGrid()
        tg.xmax = read_wave(corpus.files[file_name]).duration
        speakers = sorted({u.speaker for u in utts})
        for spk in speakers:
            tier = []
            texts = []
            for utt in utts:
                if utt.speaker != spk or utt.id not in results:
                    continue
                tier.append(
                    Interval(
                        utt.begin, utt.end or tg.xmax, results[utt.id].text
                    )
                )
                if include_original_text:
                    texts.append(
                        Interval(utt.begin, utt.end or tg.xmax, utt.text)
                    )
            name = spk if len(speakers) > 1 else "utterances"
            tg.tiers[name] = tier
            if include_original_text:
                tg.tiers[f"{name} - original"] = texts
        out = output_directory / f"{file_name}{extensions[output_format]}"
        if output_format == "json":
            tg.write_json(out)
        elif output_format == "csv":
            tg.write_csv(
                out, default_speaker=speakers[0] if speakers else "speaker"
            )
        else:
            tg.write(out, output_format=output_format)
        out_paths.append(out)
    return out_paths


def _export_transcripts(corpus, texts, output_directory):
    """One ``<speaker>/<file>.lab`` per corpus file; multi-utterance files
    (TextGrid corpora) concatenate their utterances' transcripts in order
    rather than overwriting."""
    from collections import OrderedDict
    from pathlib import Path as _P

    out = _P(output_directory)
    by_file = OrderedDict()
    for utt in corpus.utterances:
        if utt.id not in texts:
            continue
        by_file.setdefault((utt.speaker, utt.file_name), []).append(
            texts[utt.id]
        )
    for (speaker, file_name), lines in by_file.items():
        d = out / speaker
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{file_name}.lab").write_text("\n".join(lines) + "\n")


@cli.command("transcribe_whisper")
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("model_path", type=click.Path(exists=True))
@click.argument("output_directory", type=click.Path())
@click.option("--language", default=None, help="decoding language hint")
def transcribe_whisper_cli(corpus_directory, model_path, output_directory,
                           language):
    """Transcribe a corpus with a local Whisper checkpoint (reference:
    ``mfa transcribe_whisper``, ``transcription/transcriber.py:1850``).
    Requires the transformers package and a locally downloaded model
    directory (this auxiliary workload runs on host/torch, not TPU)."""
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.transcription.torch_models import (
        WhisperTranscriber,
    )

    tr = WhisperTranscriber(model_path, language=language)
    corpus = Corpus.load(corpus_directory, require_transcripts=False)
    results = tr.transcribe_corpus(corpus)
    _export_transcripts(corpus, results, output_directory)
    click.echo(f"Transcribed {len(results)} utterances to {output_directory}")


@cli.command("transcribe_speechbrain")
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("model_path", type=click.Path(exists=True))
@click.argument("output_directory", type=click.Path())
@click.option("--language", default=None, help="decoding language hint")
def transcribe_speechbrain_cli(corpus_directory, model_path,
                               output_directory, language):
    """Transcribe a corpus with a local SpeechBrain ASR checkpoint
    (reference: ``mfa transcribe_speechbrain``,
    ``transcription/transcriber.py:1967``). Requires the speechbrain
    package and a local checkpoint directory."""
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.transcription.torch_models import (
        SpeechbrainTranscriber,
    )

    tr = SpeechbrainTranscriber(model_path, language=language)
    corpus = Corpus.load(corpus_directory, require_transcripts=False)
    results = tr.transcribe_corpus(corpus)
    _export_transcripts(corpus, results, output_directory)
    click.echo(f"Transcribed {len(results)} utterances to {output_directory}")


@cli.command("train_g2p")
@_num_jobs_option
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("output_model_path", type=click.Path())
@click.option("--order", default=8, show_default=True)
@click.option("--num_alignment_iterations", default=10, show_default=True)
@click.option("--evaluate", "--validate", "evaluation_mode", is_flag=True,
              default=False,
              help="Hold out a random tenth of the dictionary, report word "
                   "accuracy and phone error rate on it (reference "
                   "--evaluate/--validate)")
@click.option("--phonetisaurus", is_flag=True, default=False,
              help="Use the Phonetisaurus-style engine (many-to-many "
                   "chunked EM alignment + graphone n-gram, reference "
                   "g2p/phonetisaurus_trainer.py). Default is the "
                   "pair-ngram engine with random-start EM (reference "
                   "PyniniTrainer, g2p/trainer.py)")
@click.option("--random_starts", default=10, show_default=True,
              help="Random EM starts for the pair-ngram engine (reference "
                   "--num_random_starts, default 25 there)")
@click.option("--reference_format", is_flag=True, default=False,
              help="Write the model as a reference-format G2P archive "
                   "(binary OpenFst model.fst + symbol tables, loadable by "
                   "pynini/MFA as well as this framework) instead of the "
                   "graphone-LM zip")
def train_g2p_cli(dictionary_path, output_model_path, order,
                  num_alignment_iterations, evaluation_mode, phonetisaurus,
                  random_starts, reference_format):
    """Train a G2P model from a pronunciation dictionary (reference:
    ``mfa train_g2p`` — default PyniniTrainer pair-ngram engine,
    ``g2p/trainer.py:79-880``; ``--phonetisaurus`` selects the
    chunked-graphone engine, ``g2p/phonetisaurus_trainer.py``)."""
    from montreal_forced_aligner_tpu.dictionary.lexicon import (
        parse_dictionary_file,
    )
    from montreal_forced_aligner_tpu.g2p.pair_ngram import PairNgramTrainer
    from montreal_forced_aligner_tpu.g2p.trainer import G2PTrainer

    def make_trainer():
        if phonetisaurus:
            return G2PTrainer(
                order=order,
                num_alignment_iterations=num_alignment_iterations,
            )
        return PairNgramTrainer(
            order=order,
            num_random_starts=random_starts,
            max_em_iterations=num_alignment_iterations * 2,
        )

    if evaluation_mode:
        # 90/10 split evaluation before the full train (reference
        # ``g2p/trainer.py:736-770``, validation_proportion 0.1)
        import random

        from montreal_forced_aligner_tpu.g2p.generator import (
            G2PGenerator,
            evaluate_g2p,
        )

        pairs = [
            (word, pron.phones)
            for word, pron in parse_dictionary_file(dictionary_path)
        ]
        rng = random.Random(1234)
        words = sorted({w for w, _p in pairs})
        held = set(rng.sample(words, max(1, len(words) // 10)))
        train_pairs = [(w, p) for w, p in pairs if w not in held]
        test_pairs = [(w, p) for w, p in pairs if w in held]
        eval_model = make_trainer().train_from_pairs(train_pairs)
        metrics = evaluate_g2p(G2PGenerator(eval_model), test_pairs)
        click.echo(
            f"Evaluation on {len(test_pairs)} held-out pronunciations: "
            f"word accuracy {metrics['word_accuracy']:.4f}, "
            f"phone error rate {metrics['phone_error_rate']:.4f}"
        )
    model = make_trainer().train_from_dictionary(dictionary_path)
    if reference_format:
        from montreal_forced_aligner_tpu.g2p.export_openfst import (
            export_reference_g2p,
        )

        export_reference_g2p(model, output_model_path)
        click.echo(
            f"Saved reference-format G2P archive to {output_model_path}"
        )
    else:
        model.save(output_model_path)
        click.echo(f"Saved G2P model to {output_model_path}")


@cli.command("g2p")
@_num_jobs_option
@click.argument("input_path", type=click.Path(exists=True))
@click.argument("g2p_model_path", type=click.Path(exists=True))
@click.argument("output_path", type=click.Path())
@click.option("--num_pronunciations", default=1, show_default=True)
@click.option("--dictionary_path", type=click.Path(exists=True), default=None,
              help="Existing dictionary: only OOV words get pronunciations")
@click.option("--include_bracketed", is_flag=True, default=False,
              help="Also generate for [bracketed]/(...)/<...> words")
@click.option("--export_scores", is_flag=True, default=False,
              help="Add a column with each pronunciation's score")
@click.option("--sorted", "sorted_output", is_flag=True, default=False,
              help="Sort the output alphabetically")
@click.option("--config_path", type=click.Path(exists=True), default=None,
              help="Yaml parameter file (reference --config_path semantics)")
@click.pass_context
def g2p_cli(ctx, input_path, g2p_model_path, output_path, num_pronunciations,
            dictionary_path, include_bracketed, export_scores, sorted_output,
            config_path):
    """Generate pronunciations for a word list (one word per line) or a
    corpus directory's vocabulary (reference: ``mfa g2p``,
    ``g2p/generator.py:475-1100``)."""
    from pathlib import Path as _P

    if config_path:
        data = _load_command_config(config_path)
        ov = _config_overrides(
            ctx, data,
            ["num_pronunciations", "include_bracketed", "export_scores"],
        )
        num_pronunciations = ov.get("num_pronunciations", num_pronunciations)
        include_bracketed = ov.get("include_bracketed", include_bracketed)
        export_scores = ov.get("export_scores", export_scores)

    from montreal_forced_aligner_tpu.g2p.generator import G2PGenerator
    from montreal_forced_aligner_tpu.g2p.trainer import G2PModel

    model = G2PModel.load(g2p_model_path)
    gen = G2PGenerator(model)
    input_path = _P(input_path)
    if input_path.is_dir():
        # corpus mode: vocabulary from every transcript (reference
        # PyniniCorpusGenerator / PyniniDictionaryCorpusGenerator). The
        # transcripts are scanned directly so text-only corpora (no audio)
        # work too.
        from montreal_forced_aligner_tpu.dictionary.tokenizer import (
            SimpleTokenizer,
        )
        from montreal_forced_aligner_tpu.io.textgrid import TextGrid

        tok = SimpleTokenizer()
        vocab = set()
        for ext in (".lab", ".txt"):
            for f in input_path.rglob(f"*{ext}"):
                vocab.update(tok.tokenize(f.read_text(encoding="utf-8")))
        for ext in (".TextGrid", ".textgrid"):
            for f in input_path.rglob(f"*{ext}"):
                tg = TextGrid.read(f)
                for ivs in tg.tiers.values():
                    for iv in ivs:
                        if iv.label.strip():
                            vocab.update(tok.tokenize(iv.label))
        words = sorted(vocab)
    else:
        words = [
            w.strip().lower()
            for w in input_path.read_text(encoding="utf-8").splitlines()
            if w.strip()
        ]
    if not include_bracketed:
        words = [
            w for w in words if not (w[:1] in "[(<" and w[-1:] in "])>")
        ]
    if dictionary_path:
        from montreal_forced_aligner_tpu.dictionary.lexicon import Lexicon

        known = set(Lexicon.load(dictionary_path).words)
        words = [w for w in words if w not in known]
    if sorted_output:
        words = sorted(words)
    with open(output_path, "w", encoding="utf-8") as f:
        n = 0
        for w in words:
            for phones, score in gen.generate(w, num_pronunciations):
                if export_scores:
                    f.write(f"{w}\t{score:.4f}\t{' '.join(phones)}\n")
                else:
                    f.write(f"{w}\t{' '.join(phones)}\n")
                n += 1
    click.echo(f"Wrote {n} pronunciations for {len(words)} words to {output_path}")


@cli.command("train_ivector")
@_num_jobs_option
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("output_model_path", type=click.Path())
@click.option("--num_gauss", default=256, show_default=True)
@click.option("--ivector_dim", default=192, show_default=True)
@click.option("--num_iterations", default=10, show_default=True)
@click.option("--batch_size", default=16, show_default=True)
@click.option("--plda/--no_plda", "train_plda", default=True,
              show_default=True,
              help="Also train PLDA on the corpus's speaker-labeled "
                   "i-vectors and bundle it (reference PldaTrainer stage, "
                   "ivector/trainer.py:634)")
def train_ivector_cli(corpus_directory, output_model_path, num_gauss,
                      ivector_dim, num_iterations, batch_size, train_plda):
    """Train a UBM + i-vector extractor (reference: ``mfa train_ivector``,
    ``ivector/trainer.py``)."""
    import numpy as np

    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.ivector.extractor import (
        extract_ivectors,
        length_normalize,
        train_ivector_extractor,
    )
    from montreal_forced_aligner_tpu.ivector.pipeline import (
        corpus_feature_batches,
    )
    from montreal_forced_aligner_tpu.ivector.ubm import train_ubm

    corpus = Corpus.load(corpus_directory, require_transcripts=False)
    batches, order = corpus_feature_batches(corpus, batch_size=batch_size)
    ubm = train_ubm(batches, num_gauss=num_gauss)
    extractor = train_ivector_extractor(
        batches, ubm, ivector_dim=ivector_dim, num_iterations=num_iterations
    )
    if train_plda and len(corpus.speakers) >= 2:
        from montreal_forced_aligner_tpu.ivector.plda import Plda

        iv = length_normalize(extract_ivectors(extractor, batches))
        spk_of = {s: i for i, s in enumerate(corpus.speakers)}
        speaker_ids = np.array(
            [spk_of[corpus.utterances[i].speaker] for i in order]
        )
        extractor.plda = Plda.train(iv, speaker_ids)
        click.echo(
            f"Trained PLDA over {len(corpus.speakers)} speakers "
            f"({len(iv)} i-vectors)"
        )
    elif train_plda:
        click.echo("Skipping PLDA: need at least 2 speakers", err=True)
    extractor.save(output_model_path)
    click.echo(
        f"Trained {ubm.num_gauss}-gauss UBM + {ivector_dim}-dim extractor "
        f"-> {output_model_path}"
    )


@cli.command("diarize_speakers")
@_num_jobs_option
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("ivector_extractor_path", type=str)
@click.argument("output_directory", type=click.Path())
@click.option("--xvector_model_path", type=click.Path(exists=True),
              default=None,
              help="Local SpeechBrain EncoderClassifier checkpoint for "
                   "neural speaker embeddings; used when "
                   "IVECTOR_EXTRACTOR_PATH is the literal 'speechbrain' "
                   "(reference engages x-vectors the same way, "
                   "diarization/multiprocessing.py:610)")
@click.option("--expected_num_speakers", default=0, show_default=True,
              help="0 = threshold-based")
@click.option("--distance_threshold", default=0.5, show_default=True)
@click.option("--cluster_type", default="agglomerative", show_default=True,
              type=click.Choice(["agglomerative", "kmeans", "spectral",
                                 "dbscan", "hdbscan", "optics", "affinity",
                                 "meanshift"]),
              help="Clustering algorithm (reference ClusterType)")
@click.option("--min_cluster_size", default=15, show_default=True,
              help="Density methods: smallest cluster / core-point degree")
@click.option("--batch_size", default=16, show_default=True)
@click.option("--evaluate/--no_evaluate", "--validate", "evaluate",
              default=False,
              help="Score the clustering against the corpus's original "
                   "speaker labels (reference --evaluate/--validate)")
@click.option("--classify/--cluster", "classify", default=False,
              show_default=True,
              help="classify: reassign each utterance to the best-scoring "
                   "known speaker (PLDA if bundled, else cosine); cluster: "
                   "unsupervised (reference --classify/--cluster)")
@click.option("--metric", default="cosine", show_default=True,
              type=click.Choice(["cosine", "plda"]),
              help="Distance for clustering (plda requires a PLDA-bundled "
                   "extractor, reference DistanceMetric)")
@click.option("--visualize/--no_visualize", default=False,
              help="Write cluster_plot.png: 2D manifold projection of the "
                   "i-vectors colored by cluster (reference "
                   "SpeakerDiarizer.visualize_clusters)")
@click.option("--manifold_algorithm", default="tsne", show_default=True,
              type=click.Choice(["tsne", "mds", "spectral", "isomap"]),
              help="Projection for --visualize (reference ManifoldAlgorithm)")
@click.option("--output_format", default="long_textgrid", show_default=True,
              type=click.Choice(
                  ["long_textgrid", "short_textgrid", "json", "csv"],
                  case_sensitive=False),
              help="Format for relabeled transcript exports (reference "
                   "SpeakerDiarizer.export_files)")
@click.option("--config_path", type=click.Path(exists=True), default=None,
              help="Yaml parameter file (reference --config_path semantics)")
@click.pass_context
def diarize_speakers_cli(ctx, corpus_directory, ivector_extractor_path,
                         output_directory, xvector_model_path,
                         expected_num_speakers,
                         distance_threshold, cluster_type, min_cluster_size,
                         batch_size, evaluate, classify, metric,
                         visualize, manifold_algorithm, output_format,
                         config_path):
    """Cluster utterances into speakers (reference: ``mfa diarize_speakers``,
    ``diarization/speaker_diarizer.py``). Writes utt2spk.tsv."""
    from pathlib import Path as _P

    if config_path:
        data = _load_command_config(config_path)
        ov = _config_overrides(
            ctx, data,
            ["expected_num_speakers", "distance_threshold", "cluster_type",
             "min_cluster_size", "batch_size", "metric", "output_format",
             "manifold_algorithm"],
        )
        expected_num_speakers = ov.get(
            "expected_num_speakers", expected_num_speakers
        )
        distance_threshold = ov.get("distance_threshold", distance_threshold)
        cluster_type = ov.get("cluster_type", cluster_type)
        min_cluster_size = ov.get("min_cluster_size", min_cluster_size)
        batch_size = ov.get("batch_size", batch_size)
        metric = ov.get("metric", metric)
        output_format = ov.get("output_format", output_format)
        manifold_algorithm = ov.get("manifold_algorithm", manifold_algorithm)

    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.diarization.speaker_diarizer import (
        SpeakerDiarizer,
    )
    from montreal_forced_aligner_tpu.ivector.extractor import IvectorExtractor
    from montreal_forced_aligner_tpu.ivector.pipeline import (
        corpus_feature_batches,
    )

    corpus = Corpus.load(corpus_directory, require_transcripts=False)
    if ivector_extractor_path == "speechbrain":
        # neural x-vector front end (reference surface: passing the literal
        # 'speechbrain' engages EncoderClassifier embeddings); the
        # clustering/classification below is shared with the i-vector path
        if xvector_model_path is None:
            raise click.ClickException(
                "IVECTOR_EXTRACTOR_PATH 'speechbrain' needs "
                "--xvector_model_path pointing at a local "
                "EncoderClassifier checkpoint (no network egress here)"
            )
        from montreal_forced_aligner_tpu.diarization.embeddings import (
            XVectorDiarizer,
            XVectorEmbedder,
        )

        try:
            embedder = XVectorEmbedder(xvector_model_path)
        except RuntimeError as e:
            raise click.ClickException(str(e))
        if metric == "plda":
            raise click.ClickException(
                "--metric plda is not available with x-vector embeddings "
                "(no PLDA model in a speechbrain checkpoint); use cosine"
            )
        xdiarizer = XVectorDiarizer(embedder, metric=metric)
        order = list(range(corpus.num_utterances))
        if classify:
            import numpy as np

            from montreal_forced_aligner_tpu.diarization.speaker_diarizer import (
                DiarizationResult,
            )
            from montreal_forced_aligner_tpu.ivector.extractor import (
                length_normalize,
            )

            emb = length_normalize(embedder.embed_corpus(corpus))
            enrolled = {
                s: emb[
                    [
                        i for i, u in enumerate(corpus.utterances)
                        if u.speaker == s
                    ]
                ].mean(axis=0)
                for s in corpus.speakers
            }
            names = list(enrolled)
            enroll = length_normalize(
                np.stack([enrolled[n] for n in names])
            )
            a = enroll / np.linalg.norm(enroll, axis=1, keepdims=True)
            b = emb / np.linalg.norm(emb, axis=1, keepdims=True)
            assigned = [names[i] for i in (a @ b.T).argmax(axis=0)]
            name_idx = {s: i for i, s in enumerate(corpus.speakers)}
            result = DiarizationResult(
                labels=np.array([name_idx[n] for n in assigned]),
                ivectors=emb,
            )
            moved = sum(
                1 for i, u in enumerate(corpus.utterances)
                if assigned[i] != u.speaker
            )
            click.echo(
                f"Classification reassigned {moved}/{len(order)} utterances"
            )
        else:
            result = xdiarizer.cluster_corpus(
                corpus,
                num_speakers=expected_num_speakers or None,
                threshold=(
                    None if expected_num_speakers else distance_threshold
                ),
                method=cluster_type,
                min_cluster_size=min_cluster_size,
            )
        return _export_diarization(
            corpus, result, order, output_directory, classify, evaluate,
            visualize, manifold_algorithm, output_format,
            metric=metric, extractor_path="speechbrain",
            expected_num_speakers=expected_num_speakers,
            cluster_type=cluster_type,
            distance_threshold=distance_threshold,
            min_cluster_size=min_cluster_size,
        )
    from pathlib import Path as _Path

    if not _Path(ivector_extractor_path).exists():
        # plain-str argument (to admit the literal 'speechbrain'); restore
        # click.Path(exists=True)'s clean failure for mistyped paths
        raise click.ClickException(
            f"IVECTOR_EXTRACTOR_PATH {ivector_extractor_path!r} does not "
            "exist (pass an i-vector extractor archive, or the literal "
            "'speechbrain' with --xvector_model_path)"
        )
    batches, order = corpus_feature_batches(corpus, batch_size=batch_size)
    extractor = IvectorExtractor.load(ivector_extractor_path)
    if metric == "plda" and extractor.plda is None:
        raise click.ClickException(
            "--metric plda needs an extractor with bundled PLDA "
            "(train with mfa train_ivector --plda)"
        )
    diarizer = SpeakerDiarizer(
        extractor, plda=extractor.plda, metric=metric
    )
    if classify:
        # speaker classification against the corpus's own labels (reference
        # classify_speakers, speaker_diarizer.py:307): enroll per-speaker
        # mean i-vectors, then reassign every utterance
        import numpy as np

        iv = diarizer.utterance_ivectors(batches)
        enrolled = {}
        for s in corpus.speakers:
            rows = [
                pos for pos, ui in enumerate(order)
                if corpus.utterances[ui].speaker == s
            ]
            enrolled[s] = iv[rows].mean(axis=0)
        names = diarizer.classify_speakers(batches, enrolled, ivectors=iv)
        name_idx = {s: i for i, s in enumerate(corpus.speakers)}
        from montreal_forced_aligner_tpu.diarization.speaker_diarizer import (
            DiarizationResult,
        )

        result = DiarizationResult(
            labels=np.array([name_idx[n] for n in names]), ivectors=iv
        )
        moved = sum(
            1 for pos, ui in enumerate(order)
            if names[pos] != corpus.utterances[ui].speaker
        )
        click.echo(
            f"Classification reassigned {moved}/{len(order)} utterances"
        )
    else:
        result = diarizer.cluster_utterances(
            batches,
            num_speakers=expected_num_speakers or None,
            threshold=None if expected_num_speakers else distance_threshold,
            method=cluster_type,
            min_cluster_size=min_cluster_size,
        )
    _export_diarization(
        corpus, result, order, output_directory, classify, evaluate,
        visualize, manifold_algorithm, output_format,
        metric=metric, extractor_path=str(ivector_extractor_path),
        expected_num_speakers=expected_num_speakers,
        cluster_type=cluster_type, distance_threshold=distance_threshold,
        min_cluster_size=min_cluster_size,
    )


def _export_diarization(
    corpus, result, order, output_directory, classify, evaluate,
    visualize, manifold_algorithm, output_format, *,
    metric="cosine", extractor_path="", expected_num_speakers=0,
    cluster_type="agglomerative", distance_threshold=0.5,
    min_cluster_size=15,
):
    """Shared diarization export tail (utt2spk.tsv, relabeled transcripts,
    parameters.yaml, optional plot/evaluation) for the i-vector and
    x-vector paths (reference SpeakerDiarizer.export_files,
    ``speaker_diarizer.py:1505``)."""
    from pathlib import Path as _P

    out = _P(output_directory)
    out.mkdir(parents=True, exist_ok=True)
    with open(out / "utt2spk.tsv", "w", encoding="utf-8") as f:
        for pos, utt_idx in enumerate(order):
            utt = corpus.utterances[utt_idx]
            end = "" if utt.end is None else f"{utt.end}"
            new_spk = (
                corpus.speakers[int(result.labels[pos])]
                if classify
                else f"speaker{int(result.labels[pos])}"
            )
            f.write(f"{utt.speaker}/{utt.file_name}\t{utt.begin}\t{end}\t"
                    f"{new_spk}\n")
    # relabeled transcript files + run parameters (reference
    # SpeakerDiarizer.export_files, speaker_diarizer.py:1505): whole-file
    # utterances export as .lab, segmented files as tiers per new speaker
    import yaml as _yaml

    new_speaker = {}
    for pos, utt_idx in enumerate(order):
        lbl = result.labels[pos]
        new_speaker[utt_idx] = (
            corpus.speakers[int(lbl)] if classify else f"speaker{int(lbl)}"
        )
    with open(out / "parameters.yaml", "w", encoding="utf-8") as f:
        _yaml.safe_dump(
            {
                "ivector_extractor_path": extractor_path,
                "expected_num_speakers": expected_num_speakers,
                "cluster": not classify,
                "metric": metric,
                "cluster_type": cluster_type,
                "distance_threshold": distance_threshold,
                "min_cluster_size": min_cluster_size,
            },
            f,
        )
    from montreal_forced_aligner_tpu.io.textgrid import Interval, TextGrid

    by_file = {}
    for utt in corpus.utterances:
        by_file.setdefault(utt.file_name, []).append(utt)
    ext = {
        "long_textgrid": ".TextGrid", "short_textgrid": ".TextGrid",
        "json": ".json", "csv": ".csv",
    }[output_format.lower()]
    for fname, utts in by_file.items():
        # file_name mirrors the corpus-relative path (reference
        # construct_output_path); create intermediate directories
        target_parent = (out / fname).parent
        target_parent.mkdir(parents=True, exist_ok=True)
        if len(utts) == 1 and utts[0].end is None:
            (out / f"{fname}.lab").write_text(
                utts[0].text, encoding="utf-8"
            )
            continue
        tiers = {}
        xmax = 0.0
        for utt in utts:
            spk = new_speaker.get(utt.id, utt.speaker)
            end = utt.end if utt.end is not None else utt.begin
            tiers.setdefault(spk, []).append(
                Interval(utt.begin, end, utt.text)
            )
            xmax = max(xmax, end)
        tg = TextGrid(xmin=0.0, xmax=xmax, tiers=tiers)
        if output_format.lower() == "json":
            tg.write_json(out / f"{fname}{ext}")
        elif output_format.lower() == "csv":
            tg.write_csv(out / f"{fname}{ext}")
        else:
            tg.write(out / f"{fname}{ext}", output_format=output_format.lower())
    n = len(set(result.labels.tolist()))
    click.echo(f"Clustered {corpus.num_utterances} utterances into {n} speakers")
    if visualize:
        from montreal_forced_aligner_tpu.diarization.visualization import (
            manifold_points,
            plot_clusters,
        )

        points = manifold_points(
            result.ivectors,
            algorithm=manifold_algorithm,
            metric="cosine" if metric == "plda" else metric,
            quick=corpus.num_utterances < 200,
        )
        plot_path = plot_clusters(points, result.labels, out / "cluster_plot.png")
        click.echo(f"Wrote cluster plot to {plot_path}")
    if evaluate:
        from montreal_forced_aligner_tpu.diarization.clustering import (
            adjusted_rand_index,
            cluster_purity,
        )

        truth = [corpus.utterances[i].speaker for i in order]
        labels = [int(x) for x in result.labels]
        ari = adjusted_rand_index(truth, labels)
        purity = cluster_purity(truth, labels)
        click.echo(
            f"Evaluation vs original speakers: purity {purity:.4f}, "
            f"adjusted Rand index {ari:.4f} "
            f"({len(set(truth))} true speakers)"
        )


@cli.command("train_tokenizer")
@_num_jobs_option
@click.argument("training_file", type=click.Path(exists=True))
@click.argument("output_model_path", type=click.Path())
@click.option("--order", default=6, show_default=True)
@click.option("--evaluate", "--validate", "evaluation_mode", is_flag=True,
              default=False,
              help="Hold out a random tenth of the pairs and report "
                   "utterance accuracy and character error rate on it "
                   "(reference --evaluate/--validate)")
@click.option("--phonetisaurus", is_flag=True, default=False,
              help="Accepted for reference-CLI parity: the trainable "
                   "tokenizer is always the pair-ngram EM aligner here")
def train_tokenizer_cli(training_file, output_model_path, order,
                        evaluation_mode, phonetisaurus):
    """Train a tokenizer from tab-separated (raw, tokenized) lines
    (reference: ``mfa train_tokenizer``, ``tokenization/trainer.py``)."""
    from pathlib import Path as _P

    from montreal_forced_aligner_tpu.tokenization.trainer import TokenizerTrainer

    pairs = []
    for line in _P(training_file).read_text(encoding="utf-8").splitlines():
        if "\t" in line:
            raw, tok = line.split("\t", 1)
            pairs.append((raw.strip(), tok.strip()))
    if evaluation_mode and len(pairs) >= 10:
        import random

        from montreal_forced_aligner_tpu.evaluation import edit_distance

        rng = random.Random(1234)
        idx = set(rng.sample(range(len(pairs)), max(1, len(pairs) // 10)))
        train = [p for i, p in enumerate(pairs) if i not in idx]
        test = [p for i, p in enumerate(pairs) if i in idx]
        tok = TokenizerTrainer(order=order).train_from_pairs(train)
        correct = 0
        cers = []
        for raw, ref in test:
            hyp = tok.tokenize(raw)
            correct += hyp == ref
            # spaces count: they are exactly what tokenization predicts
            cers.append(
                edit_distance(list(ref), list(hyp)) / max(len(ref), 1)
            )
        click.echo(
            f"Evaluation on {len(test)} held-out lines: utterance accuracy "
            f"{correct / len(test):.4f}, CER "
            f"{sum(cers) / len(cers):.4f}"
        )
    tokenizer = TokenizerTrainer(order=order).train_from_pairs(pairs)
    tokenizer.model.save(output_model_path)
    click.echo(f"Trained tokenizer on {len(pairs)} pairs -> {output_model_path}")


@cli.command("tokenize")
@_num_jobs_option
@click.argument("input_path", type=click.Path(exists=True))
@click.argument("tokenizer_model_path", type=click.Path(exists=True))
@click.argument("output_path", type=click.Path())
def tokenize_cli(input_path, tokenizer_model_path, output_path):
    """Tokenize text with a trained tokenizer (reference: ``mfa tokenize``)."""
    from pathlib import Path as _P

    from montreal_forced_aligner_tpu.g2p.trainer import G2PModel
    from montreal_forced_aligner_tpu.tokenization.trainer import TrainedTokenizer

    tok = TrainedTokenizer(model=G2PModel.load(tokenizer_model_path))
    lines = _P(input_path).read_text(encoding="utf-8").splitlines()
    with open(output_path, "w", encoding="utf-8") as f:
        for line in lines:
            f.write(tok.tokenize(line.strip()) + "\n")
    click.echo(f"Tokenized {len(lines)} lines -> {output_path}")


@cli.command("train_dictionary")
@_num_jobs_option
@click.argument("corpus_directory", type=click.Path(exists=True))
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.argument("acoustic_model_path", type=click.Path(exists=True))
@click.argument("output_dictionary_path", type=click.Path())
@click.option("--batch_size", default=16, show_default=True)
@click.option("--silence_probabilities/--no_silence_probabilities",
              default=True, show_default=True,
              help="Also export per-pronunciation silence-before/after "
                   "probabilities (reference --silence_probabilities)")
@click.option("--speaker_characters", "-s", default="0", show_default=True)
@click.option("--audio_directory", "-a", type=click.Path(exists=True),
              default=None)
def train_dictionary_cli(corpus_directory, dictionary_path,
                         acoustic_model_path, output_dictionary_path,
                         batch_size, silence_probabilities,
                         speaker_characters, audio_directory):
    """Align a corpus and export a dictionary with estimated pronunciation
    and silence probabilities (reference: ``mfa train_dictionary``,
    ``pretrained.py:561`` DictionaryTrainer)."""
    from montreal_forced_aligner_tpu.align.aligner import (
        AlignerConfig,
        PretrainedAligner,
    )
    from montreal_forced_aligner_tpu.corpus.corpus import Corpus
    from montreal_forced_aligner_tpu.training.pronunciation import (
        PronunciationCounter,
        apply_probabilities_to_lexicon,
        compute_pronunciation_probabilities,
    )

    aligner = PretrainedAligner(
        acoustic_model_path, dictionary_path, AlignerConfig(batch_size=batch_size)
    )
    corpus = Corpus.load(
        corpus_directory,
        speaker_characters=speaker_characters,
        audio_directory=audio_directory,
    )
    results = aligner.align_corpus(corpus)
    counter = PronunciationCounter()
    for aln in results.values():
        counter.add_utterance(aln, aligner.lexicon.silence_phone)
    probs = compute_pronunciation_probabilities(counter)
    apply_probabilities_to_lexicon(aligner.lexicon, probs)
    if not silence_probabilities:
        # probability-only export (reference DictionaryTrainer
        # silence_probabilities=False, pretrained.py:561)
        for prons in aligner.lexicon.words.values():
            for p in prons:
                p.silence_after_probability = None
                p.silence_before_correction = None
                p.non_silence_before_correction = None
    aligner.lexicon.write(output_dictionary_path)
    click.echo(
        f"Exported dictionary with pronunciation probabilities to "
        f"{output_dictionary_path}"
    )


@cli.command("validate_dictionary")
@click.argument("dictionary_path", type=click.Path(exists=True))
@click.option("--order", default=6, show_default=True)
def validate_dictionary_cli(dictionary_path, order):
    """G2P-based dictionary QA (reference: ``mfa validate_dictionary``,
    ``validation/dictionary_validator.py:15``): train a G2P model on the
    dictionary and flag entries whose pronunciations disagree strongly."""
    from montreal_forced_aligner_tpu.dictionary.lexicon import (
        parse_dictionary_file,
    )
    from montreal_forced_aligner_tpu.evaluation import edit_distance
    from montreal_forced_aligner_tpu.g2p.generator import G2PGenerator
    from montreal_forced_aligner_tpu.g2p.trainer import G2PTrainer

    pairs = [
        (w, p.phones) for w, p in parse_dictionary_file(dictionary_path)
    ]
    model = G2PTrainer(order=order).train_from_pairs(pairs)
    gen = G2PGenerator(model)
    flagged = []
    for w, phones in pairs:
        hyps = gen.generate(w, num_pronunciations=3)
        if not hyps:
            continue
        best = min(
            edit_distance(list(phones), list(h)) for h, _s in hyps
        )
        if best > max(2, len(phones) // 2):
            flagged.append((w, " ".join(phones), best))
    click.echo(f"Validated {len(pairs)} entries; {len(flagged)} flagged")
    for w, pron, d in flagged[:50]:
        click.echo(f"  {w}\t{pron}\t(phone distance {d})")


@cli.command("configure")
@click.option("--profile", default=None, help="Profile name to edit")
@click.option("--batch_size", default=None, type=int)
@click.option("--seed", default=None, type=int)
@click.option("--clean/--no_clean", default=None)
@click.option("--debug/--no_debug", default=None)
@click.option("--temporary_directory", default=None)
def configure_cli(profile, **options):
    """Persist default options to the global profile store (reference:
    ``mfa configure``, ``config.py:167-280``)."""
    from montreal_forced_aligner_tpu.config import get_config

    cfg = get_config()
    if profile:
        cfg.current_profile_name = profile
    cfg.current_profile.update({k: v for k, v in options.items() if v is not None})
    cfg.save()
    click.echo(f"Saved profile {cfg.current_profile_name!r}")


@cli.command("history")
@click.option("--depth", default=10, show_default=True)
def history_cli(depth):
    """Show recent command history (reference: ``mfa history``)."""
    from montreal_forced_aligner_tpu.config import load_history

    for entry in load_history()[-depth:]:
        click.echo(
            f"{entry['time']}  (exit {entry['exit_code']})  "
            + " ".join(entry["command"])
        )


# the reference registers the model group under both names
# (command_line/mfa.py:190-191)
cli.add_command(model_cli, name="models")

if __name__ == "__main__":
    cli()
