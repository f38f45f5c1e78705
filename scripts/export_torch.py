"""Export an Orbax checkpoint to the reference's ``.pth.tar`` format.

Lets a torch user take a generator trained with this framework and load it
with the reference stack unchanged (payload grammar of
/root/reference/train_realesrnet.py:117-123, including the ``model.``-prefixed
``ema_state_dict`` that reference consumers strip at inference.py:33).

Usage:
    python scripts/export_torch.py --checkpoint results/.../g_best \
        --output g_best.pth.tar
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(args) -> str:
    import numpy as np
    import torch

    from real_esrgan_tpu.models.convert import export_generator
    from real_esrgan_tpu.train.checkpoint import load_checkpoint

    tree = load_checkpoint(args.checkpoint)
    params = tree.get("params", tree)
    ema = tree.get("ema_params") or params

    def to_torch(sd):
        return {k: torch.from_numpy(np.asarray(v))
                for k, v in export_generator(sd).items()}

    payload = {
        "epoch": int(tree.get("epoch", 0)),
        "best_niqe": float(tree.get("best_niqe", 100.0)),
        "state_dict": to_torch(params),
        "ema_state_dict": {f"model.{k}": v for k, v in to_torch(ema).items()},
        "optimizer": None,   # optax state has no torch equivalent
        "scheduler": None,
    }
    torch.save(payload, args.output)
    print(f"Exported `{args.checkpoint}` -> `{args.output}` "
          f"({len(payload['state_dict'])} tensors)")
    return args.output


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Orbax -> reference .pth.tar export")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="Orbax checkpoint directory (g_best / g_epoch_N)")
    p.add_argument("--output", type=str, required=True,
                   help="Output .pth.tar path")
    main(p.parse_args())
