"""Single-image x4 super-resolution CLI.

TPU-native counterpart of the reference CLI (/root/reference/inference.py):
same flags (--inputs_path, --output_path, --weights_path), loads either the
reference's ``.pth.tar`` checkpoints (weights converted on the fly) or this
framework's Orbax checkpoints, runs one jitted forward on the default JAX
device (TPU when present, CPU otherwise).
"""

import argparse
import os
import time


def build_generator(upscale_factor: int, num_rrdb: int = 23, dtype=None):
    import jax.numpy as jnp

    from real_esrgan_tpu.models import Generator

    return Generator(upscale_factor=upscale_factor, num_rrdb=num_rrdb,
                     dtype=dtype if dtype is not None else jnp.float32)


def main(args) -> str:
    # select the backend BEFORE anything touches jax (env vars are too late:
    # the TPU plugin registers at interpreter startup via sitecustomize)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from real_esrgan_tpu.train.checkpoint import load_generator_params
    from real_esrgan_tpu.utils.imgio import (
        array_to_image, image_to_array, load_image_rgb, save_image_rgb,
    )

    model = build_generator(args.upscale_factor,
                            dtype=jnp.bfloat16 if args.bfloat16 else jnp.float32)

    if args.weights_path and os.path.exists(args.weights_path):
        params = load_generator_params(args.weights_path)
        print(f"Loaded `{args.weights_path}` weights.")
    else:
        # random init (keeps the CLI runnable without published weights)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 32, 3)))["params"]
        print("WARNING: no weights file found — using random initialization.")

    lr_image = load_image_rgb(args.inputs_path)
    apply_fn = jax.jit(lambda p, x: model.apply({"params": p}, x))

    t0 = time.time()
    if args.tile > 0:
        # overlap-tile serving: static tile shapes, tile batch sharded over
        # all devices — the 2K->8K large-image path
        from real_esrgan_tpu.parallel.tiling import tiled_upscale

        sr_np = tiled_upscale(apply_fn, params, lr_image,
                              scale=args.upscale_factor, tile=args.tile,
                              overlap=args.tile_overlap,
                              tile_batch=args.tile_batch)
    else:
        sr = apply_fn(params, jnp.asarray(image_to_array(lr_image)))
        sr.block_until_ready()
        sr_np = np.asarray(sr)
    print(f"SR {lr_image.shape[0]}x{lr_image.shape[1]} -> "
          f"{sr_np.shape[-3]}x{sr_np.shape[-2]} in {time.time() - t0:.3f}s "
          f"on {jax.devices()[0].platform}")

    save_image_rgb(args.output_path, array_to_image(sr_np))
    print(f"SR image save location: {args.output_path}")
    return args.output_path


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Real-ESRGAN x4 single-image super-resolution (TPU-native)")
    parser.add_argument("--inputs_path", type=str,
                        default="./figure/tree_lr.png",
                        help="Path to the low-resolution input image.")
    parser.add_argument("--output_path", type=str,
                        default="./figure/tree_sr.png",
                        help="Where to write the super-resolved image.")
    parser.add_argument("--weights_path", type=str,
                        default="./results/pretrained_models/RealESRGAN_x4-DFO2K.pth.tar",
                        help="Generator weights (.pth.tar, Orbax dir, or "
                             ".npz snapshot).")
    parser.add_argument("--upscale_factor", type=int, default=4)
    parser.add_argument("--bfloat16", action="store_true",
                        help="Run the trunk in bfloat16 (faster on TPU).")
    parser.add_argument("--tile", type=int, default=0,
                        help="Tile size for overlap-tile large-image serving "
                             "(0 = whole image in one forward; 528 is the "
                             "measured-best tile, see parallel/tiling.py).")
    parser.add_argument("--tile_overlap", type=int, default=8)
    parser.add_argument("--tile_batch", type=int, default=8)
    parser.add_argument("--cpu", action="store_true",
                        help="Force the CPU backend (no TPU required).")
    main(parser.parse_args())
