"""Worker process for the multi-process (2 hosts x 4 CPU devices) CI test.

NOT a test module — launched by tests/test_multiprocess.py with
COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env set.  Each rank runs in
its OWN working directory (simulating a pod WITHOUT a shared filesystem) and
drives the full stage-1 trainer twice: a fresh 1-epoch run, then an elastic
``--resume auto`` continuation to epoch 2.  Exercises for real:

* maybe_initialize_distributed (explicit coordinator wiring)
* the global 8-device mesh spanning 2 processes
* DevicePrefetcher's make_array_from_process_local_data multi-host path
* lead-host-only eval/checkpoint IO
* resume-auto resolution on the lead + broadcast_string/broadcast_pytree
  (rank 1 has NO checkpoint files locally — the state must arrive by wire)
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    rank = int(sys.argv[1])
    base = sys.argv[2]
    workdir = os.path.join(base, f"proc{rank}")
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import config as run_config
    from real_esrgan_tpu.configuration import (
        DegradationConfig, ModelConfig, PipelineGeometry, TrainConfig,
    )

    run_config.geometry = PipelineGeometry(hr_size=64, crop_size=32, scale=4)
    run_config.model = ModelConfig(num_rrdb=1, channels=16, growth_channels=8)
    run_config.degradation = DegradationConfig(usm_radius=13)
    run_config.train_esrnet = TrainConfig(batch_size=8, print_frequency=1,
                                          epochs=1, num_workers=2)

    import train_realesrnet as trainer

    def args(**overrides):
        ns = dict(epochs=1, batch_size=8, resume="", synthetic=True,
                  steps_per_epoch=2, no_tensorboard=True)
        ns.update(overrides)
        return argparse.Namespace(**ns)

    trainer.main(args())
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    # Rank 1 must have NO local checkpoints (no shared fs): resume state can
    # only come from the lead via broadcast.
    samples = os.path.join("samples", run_config.exp_name)
    if rank != 0:
        assert not os.path.isdir(samples) or not os.listdir(samples), \
            "non-lead host unexpectedly wrote checkpoints"

    trainer.main(args(epochs=2, resume="auto"))

    if rank == 0:
        from real_esrgan_tpu.train.checkpoint import load_checkpoint

        tree = load_checkpoint(os.path.join("results", run_config.exp_name,
                                            "g_last"))
        assert int(tree["epoch"]) == 2, tree["epoch"]
        assert int(np.asarray(tree["step"])) == 4, tree["step"]
    print(f"MP_WORKER_OK rank={rank}")


if __name__ == "__main__":
    main()
