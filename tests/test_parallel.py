"""Multi-chip layer on the 8-virtual-CPU-device mesh (conftest.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from winograd_tpu.models.resnet import init_bottleneck_params, winograd_transform_params
from winograd_tpu.ops import jnp_ops
from winograd_tpu.parallel import (
    block_shardings,
    init_train_state,
    make_mesh,
    make_train_step,
    sharded_block_inference,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8, model_axis=2)


def test_mesh_shape(mesh):
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_sharded_inference_matches_single_device(mesh):
    c_io, c_mid = 32, 16
    params = init_bottleneck_params(0, c_io=c_io, c_mid=c_mid)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 14, 14, c_io), jnp.float32)
    single = jnp_ops.bottleneck_block(x, params)
    sharded = sharded_block_inference(mesh, params, x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)


def test_sharded_pallas_inference_matches_single_device(mesh):
    from winograd_tpu.parallel import sharded_block_inference_pallas
    from winograd_tpu.models.resnet import bottleneck_block_pallas

    c_io, c_mid = 128, 128  # pallas kernels want lane-width channels
    params = init_bottleneck_params(0, c_io=c_io, c_mid=c_mid)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 14, 14, c_io), jnp.float32)
    single = bottleneck_block_pallas(x, params)
    sharded = sharded_block_inference_pallas(mesh, params, x)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=1e-5)


def test_train_step_decreases_loss(mesh):
    c_io, c_mid = 32, 16
    params, momentum = init_train_state(jax.random.PRNGKey(0), c_io=c_io, c_mid=c_mid)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 14, 14, c_io), jnp.float32)
    target = jax.random.normal(jax.random.PRNGKey(2), (8, 14, 14, c_io), jnp.float32)
    with mesh:
        step = make_train_step(mesh, lr=1e-2)
        losses = []
        for _ in range(5):
            params, momentum, loss = step(params, momentum, x, target)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # Winograd artifact can be re-derived from trained weights.
    u = winograd_transform_params(params["w_mid"])
    assert u.shape == (36, c_mid, c_mid)


def test_tp_pointwise_reduce_matches(mesh):
    from winograd_tpu.parallel import conv1x1_bn_tp_reduce
    from winograd_tpu.ops import jnp_ops

    cin, cout = 256, 128
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(k[0], (4, 14, 14, cin), jnp.float32)
    w = jax.random.normal(k[1], (cin, cout), jnp.float32) * 0.1
    s = jax.random.normal(k[2], (cout,), jnp.float32)
    b = jax.random.normal(k[3], (cout,), jnp.float32)
    want = jnp_ops.conv1x1_bn(x, w, s, b, relu=True)
    got = conv1x1_bn_tp_reduce(mesh, x, w, s, b, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_tp_pointwise_expand_matches(mesh):
    from winograd_tpu.parallel import conv1x1_bn_tp_expand
    from winograd_tpu.ops import jnp_ops

    cin, cout = 128, 256
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    x = jax.random.normal(k[0], (4, 14, 14, cin), jnp.float32)
    w = jax.random.normal(k[1], (cin, cout), jnp.float32) * 0.1
    s = jax.random.normal(k[2], (cout,), jnp.float32)
    b = jax.random.normal(k[3], (cout,), jnp.float32)
    want = jnp_ops.conv1x1_bn(x, w, s, b, relu=False)
    got = conv1x1_bn_tp_expand(mesh, x, w, s, b, relu=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_tp_conv3x3_direct_matches(mesh):
    from winograd_tpu.kernels.direct import direct_filter
    from winograd_tpu.parallel import conv3x3_bn_tp_direct

    cin, cout = 64, 32
    k = jax.random.split(jax.random.PRNGKey(2), 4)
    x = jax.random.normal(k[0], (4, 14, 14, cin), jnp.float32)
    w = jax.random.normal(k[1], (cout, cin, 3, 3), jnp.float32) * 0.1
    s = jax.random.normal(k[2], (cout,), jnp.float32)
    b = jax.random.normal(k[3], (cout,), jnp.float32)
    want = jnp_ops.conv3x3_bn_relu(x, w, s, b, relu=True)
    w9r = jnp.asarray(direct_filter(np.asarray(w))).reshape(9, cin, cout)
    got = conv3x3_bn_tp_direct(mesh, x, w9r, s, b, relu=True)
    # Unit-normal (not unit-scale) data: allow the relative-error tier of
    # the bf16x3 local GEMMs on O(10) outputs.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_tp_bottleneck_block_matches(mesh):
    """Megatron-style block TP (one psum per block) over the fused Pallas
    kernels matches the XLA block."""
    from winograd_tpu.parallel import bottleneck_block_tp

    c_io, c_mid = 64, 32
    params = init_bottleneck_params(3, c_io=c_io, c_mid=c_mid)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 14, 14, c_io), jnp.float32)
    want = jnp_ops.bottleneck_block(x, params)
    got = bottleneck_block_tp(mesh, x, params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_block_shardings_cover_all_params(mesh):
    _, p_sh = block_shardings(mesh)
    params = init_bottleneck_params(0, c_io=32, c_mid=16)
    assert set(params) <= set(p_sh)


def test_tp_stage_model_sharded_matches(mesh):
    """resnet_stage_tp: a whole identity stage with weights sharded over
    "model" (the conv5_x HBM lever) must match the single-device streaming
    stage kernel and the golden-composed XLA chain."""
    from winograd_tpu.models.resnet import resnet_stage_pallas
    from winograd_tpu.parallel.tensor_parallel import resnet_stage_tp

    c_io, c_mid = 128, 32
    params_list = [
        init_bottleneck_params(i, c_io=c_io, c_mid=c_mid) for i in range(2)
    ]
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 7, 7, c_io), jnp.float32) * 0.5
    single = resnet_stage_pallas(x, params_list)
    tp = resnet_stage_tp(mesh, x, params_list)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(single), atol=1e-4)
    xla = x
    for p in params_list:
        xla = jnp_ops.bottleneck_block(xla, p)
    np.testing.assert_allclose(np.asarray(tp), np.asarray(xla), atol=1e-4)


def test_backbone_engine_mesh_dp_matches(mesh):
    """BackboneEngine(mesh=...): batch-sharded serving of a multi-stage
    backbone (transition included) matches the single-device engine."""
    from winograd_tpu.config import BackboneConfig
    from winograd_tpu.datagen.generate import backbone_stages, make_backbone_case
    from winograd_tpu.engine import BackboneEngine

    import dataclasses

    @dataclasses.dataclass(frozen=True)
    class _TinyBackbone(BackboneConfig):
        stages = ((64, 16, 8, 1), (128, 32, 4, 1))

    cfg = _TinyBackbone("tiny_backbone", batch=8)
    case = make_backbone_case(cfg, seed=3)
    stages = backbone_stages(cfg, case)
    single = BackboneEngine(stages)
    dp = BackboneEngine(stages, mesh=mesh)
    x = case["x"]
    out_single = np.asarray(single(x))
    out_dp = np.asarray(dp(x))
    np.testing.assert_allclose(out_dp, out_single, atol=1e-5)
    assert np.abs(out_dp - case["golden"]).max() < 1e-3

    dp_int8 = BackboneEngine(stages, mesh=mesh, tier="int8")
    out_i8 = np.asarray(dp_int8(x))
    rel = np.abs(out_i8 - case["golden"]).max() / np.abs(case["golden"]).max()
    assert rel < 5e-2, rel


def test_tp_full_classifier_matches(mesh):
    """resnet50_forward_tp: the WHOLE classifier (stem, projection entry,
    transitions, identity blocks, head) with every block's weights sharded
    over "model" must match the single-device fused forward."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.datagen.generate import make_resnet50_case
    from winograd_tpu.models.resnet50 import (
        resnet50_forward_pallas,
        resnet50_params,
    )
    from winograd_tpu.parallel import resnet50_forward_tp

    @dataclasses.dataclass(frozen=True)
    class _TinyTP(ResNet50Config):
        # channel widths divisible by model_axis=2; num_classes too.
        stages = ((32, 16, 8, 1), (64, 16, 4, 2))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    cfg = _TinyTP("tp_full")
    case = make_resnet50_case(cfg, seed=19)
    params = resnet50_params(case, cfg)
    # batch 4 divides the mesh's data axis; vary the images.
    x = jnp.stack([
        jnp.asarray(case["x"]) * s for s in (1.0, 0.5, -0.25, 2.0)
    ])
    want = np.asarray(resnet50_forward_pallas(x, params))
    got = np.asarray(resnet50_forward_tp(mesh, params, x))
    assert got.shape == (4, 16), got.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
    # ...and against the float64 golden, same bar as the serving path.
    assert np.abs(got[0] - case["golden"]).max() < 2e-4


def test_tp_full_classifier_undivisible_head(mesh):
    """num_classes not divisible by the model axis: the head falls back to
    replicated FC; everything else stays sharded."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.models.resnet50 import (
        init_resnet50_params,
        resnet50_forward_pallas,
    )
    from winograd_tpu.parallel import resnet50_forward_tp

    @dataclasses.dataclass(frozen=True)
    class _TinyTP(ResNet50Config):
        stages = ((32, 16, 8, 1),)
        img: int = 32
        stem_c: int = 16
        num_classes: int = 13

    params = init_resnet50_params(_TinyTP("tp_odd_head"), seed=20)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 32, 32, 3), jnp.float32)
    want = np.asarray(resnet50_forward_pallas(x, params))
    got = np.asarray(resnet50_forward_tp(mesh, params, x))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_engine_model_partition(mesh):
    """ResNet50Engine(partition='model') serves through the whole-model TP
    path and matches the data-parallel engine's logits."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.engine import ResNet50Engine
    from winograd_tpu.models.resnet50 import init_resnet50_params

    @dataclasses.dataclass(frozen=True)
    class _TinyE(ResNet50Config):
        stages = ((32, 16, 8, 1), (64, 16, 4, 1))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    params = init_resnet50_params(_TinyE("engine_tp"), seed=31)
    x = jax.random.normal(jax.random.PRNGKey(13), (4, 32, 32, 3), jnp.float32)
    dp = ResNet50Engine(params, mesh=mesh)
    tp = ResNet50Engine(params, mesh=mesh, partition="model")
    np.testing.assert_allclose(
        np.asarray(tp(x)), np.asarray(dp(x)), atol=2e-4
    )
    assert tp.classify(x).shape == (4,)


def test_tp_full_classifier_bf16w(mesh):
    """Model-sharded serving at the bf16 weight-storage tier: TP + half
    the per-chip streamed bytes, within the tier bound of the f32 TP."""
    import dataclasses

    from winograd_tpu.config import BF16W_RTOL_BACKBONE, ResNet50Config
    from winograd_tpu.engine import ResNet50Engine
    from winograd_tpu.models.resnet50 import init_resnet50_params

    @dataclasses.dataclass(frozen=True)
    class _TinyE(ResNet50Config):
        stages = ((32, 16, 8, 1), (64, 16, 4, 1))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    params = init_resnet50_params(_TinyE("engine_tp_bf"), seed=33)
    x = jax.random.normal(jax.random.PRNGKey(14), (4, 32, 32, 3), jnp.float32)
    f32 = np.asarray(ResNet50Engine(params, mesh=mesh, partition="model")(x))
    bf = np.asarray(
        ResNet50Engine(params, tier="bf16w", mesh=mesh, partition="model")(x)
    )
    rel = np.abs(bf - f32).max() / np.abs(f32).max()
    assert rel < BF16W_RTOL_BACKBONE, rel


def test_tp_full_classifier_model_axis_4():
    """4-way model sharding (data=2 x model=4): the Megatron composition
    must hold at deeper weight splits, not just 2-way."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.models.resnet50 import (
        init_resnet50_params,
        resnet50_forward_pallas,
    )
    from winograd_tpu.parallel import make_mesh, resnet50_forward_tp

    @dataclasses.dataclass(frozen=True)
    class _TinyTP4(ResNet50Config):
        stages = ((32, 16, 8, 1), (64, 16, 4, 1))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    mesh4 = make_mesh(8, model_axis=4)
    params = init_resnet50_params(_TinyTP4("tp4_full"), seed=41)
    x = jax.random.normal(jax.random.PRNGKey(17), (2, 32, 32, 3), jnp.float32)
    want = np.asarray(resnet50_forward_pallas(x, params))
    got = np.asarray(resnet50_forward_tp(mesh4, params, x))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_tp_full_classifier_int8(mesh):
    """Model-sharded int8 serving: quantized matrices shard like their f32
    twins, the row-parallel 3x3 dequantizes before the psum, and the
    result stays within the int8 tier bound of the f32 TP forward."""
    import dataclasses

    from winograd_tpu.config import INT8_RTOL_BACKBONE, ResNet50Config
    from winograd_tpu.engine import ResNet50Engine
    from winograd_tpu.models.resnet50 import init_resnet50_params

    @dataclasses.dataclass(frozen=True)
    class _TinyE(ResNet50Config):
        stages = ((32, 16, 8, 1), (64, 16, 4, 1))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    params = init_resnet50_params(_TinyE("engine_tp_i8"), seed=45)
    x = jax.random.normal(jax.random.PRNGKey(19), (4, 32, 32, 3), jnp.float32)
    f32 = np.asarray(ResNet50Engine(params, mesh=mesh, partition="model")(x))
    i8 = np.asarray(
        ResNet50Engine(params, tier="int8", mesh=mesh, partition="model")(x)
    )
    rel = np.abs(i8 - f32).max() / np.abs(f32).max()
    assert rel < INT8_RTOL_BACKBONE, rel
    # ...and against the single-device int8 engine (same quantization).
    single_i8 = np.asarray(ResNet50Engine(params, tier="int8")(x))
    rel2 = np.abs(i8 - single_i8).max() / np.abs(single_i8).max()
    assert rel2 < 2e-2, rel2


def _tiny_basic_case(name, seed):
    """Tiny BASIC-family classifier for multi-chip tests: channel widths
    (16/32) and lane-padded classes divide model_axis 2 and 4."""
    import dataclasses

    from winograd_tpu.config import BasicNetConfig
    from winograd_tpu.datagen.generate import make_basicnet_case
    from winograd_tpu.models.basic import basicnet_params

    @dataclasses.dataclass(frozen=True)
    class _TinyB(BasicNetConfig):
        stages = ((16, 16, 2), (32, 8, 2))
        img: int = 32
        stem_c: int = 16
        num_classes: int = 16

    cfg = _TinyB(name)
    case = make_basicnet_case(cfg, seed=seed)
    return case, basicnet_params(case, cfg)


def test_tp_basicnet_matches(mesh):
    """basicnet_forward_tp: the WHOLE basic-block classifier with every
    block's 3x3 weights sharded over "model" (column-parallel conv a,
    row-parallel conv b, one psum per block) must match the single-device
    fused forward AND the float64 golden."""
    from winograd_tpu.models.basic import basicnet_forward_pallas
    from winograd_tpu.parallel import basicnet_forward_tp

    case, params = _tiny_basic_case("tp_basic", seed=51)
    x = jnp.stack([
        jnp.asarray(case["x"]) * s for s in (1.0, 0.5, -0.25, 2.0)
    ])
    want = np.asarray(basicnet_forward_pallas(x, params))
    got = np.asarray(basicnet_forward_tp(mesh, params, x))
    assert got.shape == (4, 16), got.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
    assert np.abs(got[0] - case["golden"]).max() < 2e-4


def test_tp_basicnet_model_axis_4():
    """4-way model sharding of the basic family (data=2 x model=4)."""
    from winograd_tpu.models.basic import basicnet_forward_pallas
    from winograd_tpu.parallel import basicnet_forward_tp, make_mesh

    case, params = _tiny_basic_case("tp4_basic", seed=52)
    mesh4 = make_mesh(8, model_axis=4)
    x = jnp.stack([jnp.asarray(case["x"]), jnp.asarray(case["x"]) * -0.5])
    want = np.asarray(basicnet_forward_pallas(x, params))
    got = np.asarray(basicnet_forward_tp(mesh4, params, x))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_basic_engine_model_partition_tiers(mesh):
    """ResNetBasicEngine(partition='model') at all three tiers: f32
    matches the data-parallel engine; bf16w/int8 stay inside their tier
    bounds of the f32 TP logits."""
    from winograd_tpu.config import BF16W_RTOL_BACKBONE, INT8_RTOL_BACKBONE
    from winograd_tpu.engine import ResNetBasicEngine

    case, params = _tiny_basic_case("engine_tp_basic", seed=53)
    x = jax.random.normal(jax.random.PRNGKey(21), (4, 32, 32, 3), jnp.float32)
    dp = np.asarray(ResNetBasicEngine(params, mesh=mesh)(x))
    f32 = np.asarray(ResNetBasicEngine(params, mesh=mesh, partition="model")(x))
    np.testing.assert_allclose(f32, dp, atol=2e-4)
    bf = np.asarray(
        ResNetBasicEngine(params, tier="bf16w", mesh=mesh, partition="model")(x)
    )
    assert np.abs(bf - f32).max() / np.abs(f32).max() < BF16W_RTOL_BACKBONE
    i8 = np.asarray(
        ResNetBasicEngine(params, tier="int8", mesh=mesh, partition="model")(x)
    )
    assert np.abs(i8 - f32).max() / np.abs(f32).max() < INT8_RTOL_BACKBONE
