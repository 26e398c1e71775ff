"""Worker for the multi-host validate CLI test (see ``test_distributed.py``).

Two processes × 4 virtual CPU devices under ``jax.distributed``; each runs
``mfa-tpu validate --test_transcriptions``. The per-speaker-LM decode shards
speakers per host (``cli.py``), matching the reference's speaker-sharded
``TrainSpeakerLmFunction`` + ``PerSpeakerDecodeFunction`` jobs — each host
trains LMs for and decodes only its own speakers.

Usage: python multihost_validate_worker.py PROC_ID N PORT CORPUS DICT MODEL
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()


def main():
    proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    corpus_dir, dict_path, model_path = sys.argv[4:7]

    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(num_procs)
    os.environ["JAX_PROCESS_ID"] = str(proc_id)

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from click.testing import CliRunner

    from montreal_forced_aligner_tpu.cli import cli

    result = CliRunner().invoke(
        cli,
        [
            "validate", corpus_dir, dict_path,
            "--acoustic_model_path", model_path,
            "--test_transcriptions", "--ignore_acoustics",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert (
        f"host {proc_id}/{num_procs}" in result.output
    ), result.output
    assert "Transcription check: WER" in result.output, result.output
    # the host decoded a strict subset of the corpus (speakers were split)
    import re

    m = re.search(r"WER [\d.]+ over (\d+) utterances", result.output)
    assert m is not None, result.output
    print(f"DECODED {m.group(1)}")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
