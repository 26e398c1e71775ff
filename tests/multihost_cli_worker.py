"""Worker for the multi-host CLI test (see ``test_distributed.py``).

Each process owns 4 virtual CPU devices; ``jax.distributed`` stitches them
into one 8-device global mesh. The worker then drives the PRODUCT path —
``mfa-tpu train --distributed`` via the click CLI — on a shared corpus:
``TrainableAligner`` shards speakers onto hosts
(``parallel/multihost.shard_corpus_for_host``) and the training pipeline
runs in SPMD lockstep, so the model statistics ride the cross-process
channel exactly as they would ride DCN across real TPU hosts.

Usage: python multihost_cli_worker.py PROC_ID NUM_PROCS PORT CORPUS DICT OUT
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
    corpus_dir, dict_path, out_model = sys.argv[4], sys.argv[5], sys.argv[6]

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

    cfg = os.path.join(os.path.dirname(out_model), "recipe.yaml")
    runner = CliRunner()
    result = runner.invoke(
        cli,
        [
            "train", corpus_dir, dict_path, out_model,
            "--config_path", cfg, "--batch_size", "4",
            "--distributed", "--chain_topology",
        ],
        catch_exceptions=False,
    )
    assert result.exit_code == 0, result.output
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
