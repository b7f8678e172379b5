"""Serve a torchvision-format ResNet checkpoint on TPU.

    python examples/serve_torch_checkpoint.py resnet50.pth --tier bf16w
    python examples/serve_torch_checkpoint.py --demo        # no checkpoint:
        builds a tiny random bottleneck ResNet in torch, round-trips it
        through a .pth file, and checks our logits against torch's.

Any torchvision bottleneck ResNet state_dict works (50/101/152 — depth is
inferred); BN folding and all fused-kernel layouts happen offline at load.
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

    from winograd_tpu import ResNet50Engine

    if args.demo:
        import torch

        from winograd_tpu.models.import_torch import (
            build_torch_reference_resnet,
        )

        model = build_torch_reference_resnet((2, 2, 2, 2), seed=0)
        with tempfile.NamedTemporaryFile(suffix=".pth") as f:
            torch.save(model.state_dict(), f.name)
            engine = ResNet50Engine.from_torch(f.name, tier=args.tier)
        x = torch.randn(2, 3, 64, 64)
        with torch.no_grad():
            ref = model(x).numpy()
        ours = np.asarray(engine(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
        rel = np.abs(ours - ref).max() / np.abs(ref).max()
        print(f"demo: tier={args.tier} rel_err vs torch = {rel:.2e}")
        print(f"demo: classes = {np.asarray(engine.classify(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))}")
        return 0

    if not args.checkpoint:
        ap.error("give a checkpoint path or --demo")
    engine = ResNet50Engine.from_torch(args.checkpoint, tier=args.tier)
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    print("classes:", np.asarray(engine.classify(x)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
