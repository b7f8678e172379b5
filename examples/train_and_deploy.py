"""Train a classifier, checkpoint it, deploy at the int8 tier.

    python examples/train_and_deploy.py --tiny --platform cpu

The forward of every train step runs the SAME fused kernels serving uses
(kernels/vjp.py custom VJPs); the checkpoint stores the trainable
parameterization; deployment derives the serving layouts offline and
serves at any tier (f32 / bf16w / int8). --tiny uses a toy geometry so the
whole pipeline runs in seconds on CPU; drop it for the real ResNet-50.
"""

import argparse
import os
import sys

# Runnable without installing the package: put the repo root first.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import dataclasses
import tempfile

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--train-tier", default="f32", choices=("f32", "bf16w"),
        help="bf16w trains through the bf16 weight-storage serving kernels "
             "(f32 master weights; half the forward's streamed HBM bytes)",
    )
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from winograd_tpu import CASES, ResNet50Engine
    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.models import (
        make_resnet50_train_step,
        save_model,
        trainable_resnet50_params,
    )
    from winograd_tpu.models.resnet50 import init_resnet50_params

    if args.tiny:

        @dataclasses.dataclass(frozen=True)
        class _Tiny(ResNet50Config):
            stages = ((32, 16, 8, 1), (64, 16, 4, 1))
            img: int = 32
            stem_c: int = 16
            num_classes: int = 16

        cfg = _Tiny("example_tiny")
    else:
        cfg = CASES[16]  # the real ResNet-50

    params = trainable_resnet50_params(init_resnet50_params(cfg, seed=0))
    momentum = jax.tree.map(jnp.zeros_like, params)
    step = make_resnet50_train_step(
        lr=1e-2,
        precision=None if args.train_tier == "f32" else args.train_tier,
    )

    key = jax.random.PRNGKey(0)
    images = jax.random.normal(key, (4, cfg.img, cfg.img, 3), jnp.float32)
    labels = jnp.arange(4) % cfg.num_classes
    for i in range(args.steps):
        params, momentum, loss = step(params, momentum, images, labels)
        print(f"step {i}: loss {float(loss):.4f}")

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        save_model(f.name, params)
        engine = ResNet50Engine.from_checkpoint(f.name, tier="int8")
    print("deployed int8 classes:", np.asarray(engine.classify(images)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
