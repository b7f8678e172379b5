"""Serving engine: artifact/checkpoint loading, single-chip and DP serving."""

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.config import CASES
from winograd_tpu.datagen.generate import block_params_list, make_block_case
from winograd_tpu.engine import BottleneckEngine
from winograd_tpu.parallel import make_mesh


def test_engine_matches_golden():
    case = make_block_case(CASES[6], seed=6)
    engine = BottleneckEngine(block_params_list(CASES[6], case))
    out = np.asarray(engine(case["x"]))
    assert np.abs(out - case["golden"]).max() < 1e-3


def test_engine_stage_and_throughput():
    cfg = CASES[8]
    case = make_block_case(cfg, seed=8)
    engine = BottleneckEngine(block_params_list(cfg, case))
    out = np.asarray(engine(case["x"]))
    assert np.abs(out - case["golden"]).max() < 1e-3
    stats = engine.throughput(batch=2, iters=2)
    assert stats["images_per_sec"] > 0


def test_engine_int8_tier():
    """tier="int8" serves through the quantized streaming stage kernel at
    the 8-bit accuracy bound."""
    case = make_block_case(CASES[6], seed=6)
    engine = BottleneckEngine(block_params_list(CASES[6], case), tier="int8")
    out = np.asarray(engine(case["x"]))
    gold = case["golden"]
    rel = np.abs(out - gold).max() / max(np.abs(gold).max(), 1.0)
    assert rel < 5e-2, rel
    assert np.corrcoef(out.ravel(), gold.ravel())[0, 1] > 0.995


def test_engine_data_parallel_matches_single():
    case = make_block_case(CASES[6], seed=3)
    params = block_params_list(CASES[6], case)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 14, 14, 1024), jnp.float32)
    single = BottleneckEngine(params)(x)
    mesh = make_mesh(8, model_axis=1)
    sharded = BottleneckEngine(params, mesh=mesh)(x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)


def test_backbone_engine_both_tiers():
    """BackboneEngine serves the 13-block backbone case at both tiers."""
    from winograd_tpu.datagen.generate import backbone_stages, make_case
    from winograd_tpu.engine import BackboneEngine

    case = make_case(13, seed=13)
    stages = backbone_stages(CASES[13], case)
    gold = case["golden"]
    out = np.asarray(BackboneEngine(stages)(case["x"]))
    assert np.abs(out - gold).max() < 1e-3
    out8 = np.asarray(BackboneEngine(stages, tier="int8")(case["x"]))
    rel = np.abs(out8 - gold).max() / max(np.abs(gold).max(), 1.0)
    assert rel < 2e-1 and np.corrcoef(out8.ravel(), gold.ravel())[0, 1] > 0.98


def test_resnet50_engine_tiers_and_dp():
    """ResNet50Engine serves the complete classifier (image -> logits) at
    every tier, and DP-sharded over a mesh it matches single-chip."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.datagen.generate import make_resnet50_case
    from winograd_tpu.engine import ResNet50Engine

    @dataclasses.dataclass(frozen=True)
    class _Tiny(ResNet50Config):
        stages = ((64, 16, 8, 1), (128, 32, 4, 1))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 24

    cfg = _Tiny("tiny_resnet50_engine")
    case = make_resnet50_case(cfg, seed=11)
    gold = case["golden"]
    engine = ResNet50Engine.from_case(case, cfg)
    out = np.asarray(engine(case["x"]))
    assert out.shape == (cfg.num_classes,)
    assert np.abs(out - gold).max() < 1e-3
    assert int(engine.classify(case["x"])) == int(np.argmax(gold))

    out8 = np.asarray(ResNet50Engine.from_case(case, cfg, tier="int8")(case["x"]))
    rel = np.abs(out8 - gold).max() / max(np.abs(gold).max(), 1.0)
    assert rel < 5e-2 and np.corrcoef(out8.ravel(), gold.ravel())[0, 1] > 0.98

    # Preprocessed-input serving contract: prepare on the host, serve from
    # the prepared operand — identical logits to the raw-image route.
    xpre = engine.prepare_input(case["x"])
    out_pre = np.asarray(engine.serve_pre(xpre, img=cfg.img))[0]
    np.testing.assert_array_equal(out_pre, out)

    xb = np.stack([case["x"]] * 8) * np.linspace(0.5, 1.5, 8)[:, None, None, None]
    xb = xb.astype(np.float32)
    single = np.asarray(engine(xb))
    sharded = np.asarray(
        ResNet50Engine.from_case(case, cfg, mesh=make_mesh(8, model_axis=1))(xb)
    )
    np.testing.assert_allclose(sharded, single, atol=1e-4)


def test_resnet50_engine_from_checkpoint(tmp_path):
    """Whole-model train -> deploy pipeline: trained (raw-filter) params
    through save_model / load_model / prepare_resnet50_serving into
    ResNet50Engine match the served forward built from full artifacts."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.engine import ResNet50Engine
    from winograd_tpu.models.checkpoint import save_model
    from winograd_tpu.models.resnet50 import (
        init_resnet50_params,
        resnet50_forward_pallas,
    )

    @dataclasses.dataclass(frozen=True)
    class _Tiny(ResNet50Config):
        stages = ((16, 8, 8, 1), (32, 8, 4, 1))
        img: int = 32
        stem_c: int = 8
        num_classes: int = 16

    from winograd_tpu.models.train import trainable_resnet50_params

    full = init_resnet50_params(_Tiny("ckpt_r50"), seed=11)
    # The library's own definition of a trained checkpoint's param set.
    trained = jax.tree.map(np.asarray, trainable_resnet50_params(full))
    path = str(tmp_path / "r50.npz")
    save_model(path, trained, extra={"step": np.asarray(7)})
    engine = ResNet50Engine.from_checkpoint(path)
    x = jax.random.normal(jax.random.PRNGKey(3), (32, 32, 3), jnp.float32)
    want = resnet50_forward_pallas(x, full)
    np.testing.assert_allclose(np.asarray(engine(x)), np.asarray(want), atol=1e-4)


def test_engine_from_checkpoint(tmp_path):
    from winograd_tpu.models import init_bottleneck_params, save_params
    from winograd_tpu.models.resnet import bottleneck_block_pallas

    params = init_bottleneck_params(0, c_io=128, c_mid=128)
    raw = {k: np.asarray(v) for k, v in params.items() if k not in ("u_mid", "w9_mid")}
    path = str(tmp_path / "ckpt.npz")
    save_params(path, raw)
    engine = BottleneckEngine.from_checkpoint(path)
    x = jax.random.normal(jax.random.PRNGKey(1), (14, 14, 128), jnp.float32)
    want = bottleneck_block_pallas(x, params)
    np.testing.assert_allclose(np.asarray(engine(x)), np.asarray(want), atol=1e-5)
