"""Worker for the multi-host align CLI test (see ``test_distributed.py``).

Two processes × 4 virtual CPU devices under ``jax.distributed``; each runs
``mfa-tpu align`` on the shared corpus. The align path shards speakers per
host (``cli.py``), so each process aligns and exports only its own
utterances — alignment needs no cross-host reduction.

Usage: python multihost_align_worker.py PROC_ID N PORT CORPUS DICT MODEL OUT
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
    corpus_dir, dict_path, model_path, out_dir = sys.argv[4:8]

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
            "align", corpus_dir, dict_path, model_path, out_dir,
            "--batch_size", "4",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    assert f"host {proc_id}/{num_procs}" in result.output, result.output
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
