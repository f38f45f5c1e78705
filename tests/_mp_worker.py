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


def _make_train_images(path: str, n: int = 32, size: int = 80) -> None:
    """Deterministic tiny training set, identical on every rank (a pod's
    hosts all see the same data store; here each rank materializes it in
    its own workdir — no shared fs needed)."""
    import cv2
    import numpy as np

    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(42)
    for i in range(n):
        img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(path, f"img_{i:03d}.png"), img)


def main() -> None:
    rank = int(sys.argv[1])
    base = sys.argv[2]
    loader_mode = sys.argv[3] if len(sys.argv) > 3 else "synthetic"
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
    grain = loader_mode == "grain"
    if grain:
        # real files through grain's sharded deterministic stream:
        # 32 records / (8 per-host batch x 2 shards) = 2 steps/epoch
        _make_train_images("train_data")
        run_config.train_esrnet = TrainConfig(
            batch_size=8, print_frequency=1, epochs=1, num_workers=2,
            loader="grain", train_image_dir="train_data")
    else:
        run_config.train_esrnet = TrainConfig(batch_size=8, print_frequency=1,
                                              epochs=1, num_workers=2)

    import train_realesrnet as trainer

    def args(**overrides):
        ns = dict(epochs=1, batch_size=8, resume="", synthetic=not grain,
                  steps_per_epoch=2, no_tensorboard=True)
        ns.update(overrides)
        return argparse.Namespace(**ns)

    trainer.main(args())
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    samples = os.path.join("samples", run_config.exp_name)
    if rank != 0:
        # Rank 1 must have NO local checkpoints (no shared fs): resume state
        # can only come from the lead via broadcast.  With grain, the ONLY
        # rank-local artifact allowed is its own shard's stream-position file
        # (by design: each host owns its iterator, it never crosses hosts).
        local = sorted(os.listdir(samples)) if os.path.isdir(samples) else []
        allowed = {f"loader_state_p{rank}.bin"} if grain else set()
        assert set(local) <= allowed, \
            f"non-lead host unexpectedly wrote checkpoints: {local}"
        if grain:
            assert local, "grain rank 1 did not persist its stream position"

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
