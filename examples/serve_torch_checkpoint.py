"""Serve a torchvision-format ResNet checkpoint on TPU.

    python examples/serve_torch_checkpoint.py resnet50.pth --tier bf16w
    python examples/serve_torch_checkpoint.py --demo        # no checkpoint:
        builds tiny random bottleneck AND basic ResNets in torch,
        round-trips them through .pth files, and checks our logits
        against torch's.

Any torchvision ResNet state_dict works — bottleneck (50/101/152) or
basic (18/34); the block family and depth are inferred. BN folding and all
fused-kernel layouts happen offline at load.
"""

import argparse
import os
import sys

# Runnable without installing the package: put the repo root first.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", nargs="?", help=".pt/.pth state_dict file")
    ap.add_argument("--tier", default="f32", choices=["f32", "bf16w", "int8"])
    ap.add_argument("--demo", action="store_true",
                    help="self-contained demo with a tiny random model")
    ap.add_argument("--platform", default=None, help="e.g. cpu")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from winograd_tpu import engine_from_torch

    if args.demo:
        import torch

        from winograd_tpu.models.import_torch import (
            build_torch_reference_resnet,
        )

        demos = {
            "bottleneck": build_torch_reference_resnet((2, 2, 2, 2), seed=0),
            "basic": build_torch_reference_resnet(
                (2, 2), stem_c=16, planes=(16, 32), classes=16, seed=1,
                block="basic",
            ),
        }
        for family, model in demos.items():
            with tempfile.NamedTemporaryFile(suffix=".pth") as f:
                torch.save(model.state_dict(), f.name)
                engine = engine_from_torch(f.name, tier=args.tier)
            x = torch.randn(2, 3, 64, 64)
            with torch.no_grad():
                ref = model(x).numpy()
            xh = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
            ours = np.asarray(engine(xh))
            rel = np.abs(ours - ref).max() / np.abs(ref).max()
            print(f"demo[{family}]: engine={type(engine).__name__} "
                  f"tier={args.tier} rel_err vs torch = {rel:.2e}")
            print(f"demo[{family}]: classes = {np.asarray(engine.classify(xh))}")
        return 0

    if not args.checkpoint:
        ap.error("give a checkpoint path or --demo")
    engine = engine_from_torch(args.checkpoint, tier=args.tier)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    print("classes:", np.asarray(engine.classify(x)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
