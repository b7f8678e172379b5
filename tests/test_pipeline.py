"""GPipe-style pipeline over the conv4_x stage, on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from winograd_tpu.config import CASES
from winograd_tpu.datagen.generate import block_params_list, make_block_case
from winograd_tpu.ops import jnp_ops
from winograd_tpu.parallel.pipeline import make_pipe_mesh, pipelined_stage_inference


@pytest.mark.parametrize("n_stages,microbatch", [(2, 2), (3, 1)])
def test_pipeline_matches_sequential(n_stages, microbatch):
    cfg = CASES[8]  # 6 blocks — divisible by 2 and 3 stages
    case = make_block_case(cfg, seed=11)
    params_list = block_params_list(cfg, case)
    n = 4
    x = jax.random.normal(jax.random.PRNGKey(0), (n, 14, 14, cfg.c_io), jnp.float32) * 0.1

    def sequential(x_):
        for p in params_list:
            x_ = jnp_ops.bottleneck_block(x_, p)
        return x_

    want = np.asarray(jax.jit(sequential)(x))
    mesh = make_pipe_mesh(n_stages)
    got = np.asarray(pipelined_stage_inference(mesh, params_list, x, microbatch=microbatch))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pipeline_runs_fused_pallas_blocks():
    """The pipeline carries the fused megakernel (not just the XLA block):
    2 stages x 2 blocks, matches the sequential megakernel chain."""
    from winograd_tpu.models.resnet import bottleneck_block_pallas, init_bottleneck_params

    params_list = [init_bottleneck_params(i, c_io=64, c_mid=32) for i in range(4)]
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 14, 14, 64), jnp.float32) * 0.1

    def sequential(x_):
        for p in params_list:
            x_ = bottleneck_block_pallas(x_, p)
        return x_

    want = np.asarray(sequential(x))
    mesh = make_pipe_mesh(2)
    got = np.asarray(
        pipelined_stage_inference(
            mesh, params_list, x, microbatch=2, block_fn=bottleneck_block_pallas
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pipeline_rejects_indivisible():
    cfg = CASES[8]
    case = make_block_case(cfg, seed=11)
    params_list = block_params_list(cfg, case)
    mesh = make_pipe_mesh(4)  # 6 blocks do not split over 4 stages
    x = jnp.zeros((4, 14, 14, cfg.c_io))
    with pytest.raises(AssertionError):
        pipelined_stage_inference(mesh, params_list, x, microbatch=2)


def test_pipelined_resnet50_matches_single_device():
    """The heterogeneous 4-stage classifier pipeline (flat padded
    inter-stage buffers, lax.switch stage dispatch) reproduces the
    single-device full-model forward."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.models.resnet50 import (
        init_resnet50_params,
        resnet50_forward_pallas,
    )
    from winograd_tpu.parallel import make_pipe_mesh, pipelined_resnet50_inference

    @dataclasses.dataclass(frozen=True)
    class _Tiny4(ResNet50Config):
        # Four trunk stages (the pipeline's stage count), toy sizes.
        stages = ((16, 8, 16, 1), (32, 8, 8, 1), (64, 16, 4, 1), (128, 16, 2, 1))
        img: int = 64
        stem_c: int = 8
        num_classes: int = 24

    params = init_resnet50_params(_Tiny4("pipe_r50"), seed=8)
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 64, 64, 3), jnp.float32)
    want = np.asarray(resnet50_forward_pallas(x, params))
    mesh = make_pipe_mesh(4)
    got = np.asarray(pipelined_resnet50_inference(mesh, params, x, microbatch=2))
    assert got.shape == (4, 24), got.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_balanced_partition_minimizes_bottleneck():
    from winograd_tpu.parallel.pipeline import _balanced_partition

    # ResNet-152-shaped cost profile: conv4_x dominates. A named-stage
    # split puts all 35 mid blocks on one rank; the balanced split must
    # spread them.
    costs = [10] + [3] * 7 + [8] * 35 + [5] * 2
    b = _balanced_partition(costs, 4)
    assert b[0] == 0 and b[-1] == len(costs)
    groups = [sum(costs[b[i]:b[i + 1]]) for i in range(4)]
    assert max(groups) < sum(costs[8:43])       # beats stage-split bottleneck
    assert max(groups) <= sum(costs) / 4 + max(costs)

    # Degenerate: k == n -> every group has exactly one item.
    assert _balanced_partition([1, 2, 3], 3) == [0, 1, 2, 3]
    # No group may be empty even when one cost dominates (an empty group
    # would idle a whole pipeline rank on a tie).
    assert _balanced_partition([4, 1, 1], 3) == [0, 1, 2, 3]


def test_pipelined_classifier_arbitrary_ranks():
    """The block-granular partition frees the pipeline from the named
    4-stage split: 2-, 3- and 6-rank pipes must all match the
    single-device forward on a DEEP (multi-block-per-stage) model."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.models.resnet50 import (
        init_resnet50_params,
        resnet50_forward_pallas,
    )
    from winograd_tpu.parallel import make_pipe_mesh, pipelined_resnet50_inference

    @dataclasses.dataclass(frozen=True)
    class _TinyDeep(ResNet50Config):
        stages = ((16, 8, 8, 2), (32, 8, 4, 3), (64, 16, 2, 2))
        img: int = 32
        stem_c: int = 8
        num_classes: int = 24

    params = init_resnet50_params(_TinyDeep("pipe_deep"), seed=21)
    x = jax.random.normal(jax.random.PRNGKey(6), (6, 32, 32, 3), jnp.float32)
    want = np.asarray(resnet50_forward_pallas(x, params))
    for ranks, mb in ((2, 3), (3, 2), (6, 1)):
        got = np.asarray(
            pipelined_resnet50_inference(
                make_pipe_mesh(ranks), params, x, microbatch=mb
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-4, err_msg=f"ranks={ranks}")


def test_pipelined_classifier_bf16w_tier():
    """The bf16 weight-storage tier pipelines too: per-rank segments run
    the same bf16w kernels as the single-device forward."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.models.resnet50 import (
        init_resnet50_params,
        resnet50_forward_pallas,
    )
    from winograd_tpu.parallel import make_pipe_mesh, pipelined_resnet50_inference

    @dataclasses.dataclass(frozen=True)
    class _TinyB(ResNet50Config):
        stages = ((16, 8, 8, 2), (32, 8, 4, 2))
        img: int = 32
        stem_c: int = 8
        num_classes: int = 24

    params = init_resnet50_params(_TinyB("pipe_bf16w"), seed=23)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 32, 32, 3), jnp.float32)
    want = np.asarray(resnet50_forward_pallas(x, params, precision="bf16w"))
    got = np.asarray(
        pipelined_resnet50_inference(
            make_pipe_mesh(4), params, x, microbatch=2, precision="bf16w"
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pipelined_classifier_int8_tier():
    """The int8 tier pipelines: quantized params, per-segment int8 kernels,
    same logits as the single-device int8 forward."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.models.resnet50 import (
        init_resnet50_params,
        quantize_resnet50,
        resnet50_forward_int8,
    )
    from winograd_tpu.parallel import make_pipe_mesh, pipelined_resnet50_inference

    @dataclasses.dataclass(frozen=True)
    class _TinyI(ResNet50Config):
        stages = ((16, 8, 8, 2), (32, 8, 4, 2))
        img: int = 32
        stem_c: int = 8
        num_classes: int = 24

    params = init_resnet50_params(_TinyI("pipe_int8"), seed=29)
    q = quantize_resnet50(params)
    x = jax.random.normal(jax.random.PRNGKey(12), (4, 32, 32, 3), jnp.float32)
    want = np.asarray(resnet50_forward_int8(x, q))
    got = np.asarray(
        pipelined_resnet50_inference(
            make_pipe_mesh(4), q, x, microbatch=2, precision="int8"
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pipelined_classifier_odd_transition_maps():
    """Odd feature maps entering a transition (img=28 -> hw 7 -> ceil 4):
    the analytic boundary shapes must use ceil like the kernels do."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.models.resnet50 import (
        init_resnet50_params,
        resnet50_forward_pallas,
    )
    from winograd_tpu.parallel import make_pipe_mesh, pipelined_resnet50_inference

    @dataclasses.dataclass(frozen=True)
    class _TinyOdd(ResNet50Config):
        stages = ((16, 8, 7, 1), (32, 8, 4, 1))
        img: int = 28
        stem_c: int = 8
        num_classes: int = 24

    params = init_resnet50_params(_TinyOdd("pipe_odd"), seed=35)
    x = jax.random.normal(jax.random.PRNGKey(15), (4, 28, 28, 3), jnp.float32)
    want = np.asarray(resnet50_forward_pallas(x, params))
    got = np.asarray(
        pipelined_resnet50_inference(make_pipe_mesh(4), params, x, microbatch=2)
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_engine_pipe_partition():
    """ResNet50Engine(partition='pipe'): GPipe serving through the engine
    API at f32 and int8, matching the single-device engine."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.engine import ResNet50Engine
    from winograd_tpu.models.resnet50 import init_resnet50_params

    @dataclasses.dataclass(frozen=True)
    class _TinyP(ResNet50Config):
        stages = ((16, 8, 8, 2), (32, 8, 4, 1))
        img: int = 32
        stem_c: int = 8
        num_classes: int = 24

    params = init_resnet50_params(_TinyP("engine_pipe"), seed=37)
    x = jax.random.normal(jax.random.PRNGKey(16), (4, 32, 32, 3), jnp.float32)
    mesh = make_pipe_mesh(4)
    for tier in ("f32", "int8"):
        single = ResNet50Engine(params, tier=tier)
        piped = ResNet50Engine(
            params, tier=tier, mesh=mesh, partition="pipe", microbatch=2
        )
        np.testing.assert_allclose(
            np.asarray(piped(x)), np.asarray(single(x)), atol=2e-5,
            err_msg=tier,
        )


def test_pipelined_classifier_int8_two_ranks_coalesced():
    """2 ranks over a deep int8 model: whole multi-block runs coalesce into
    single stacked int8 stage-kernel calls and still match single-device."""
    import dataclasses

    from winograd_tpu.config import ResNet50Config
    from winograd_tpu.models.resnet50 import (
        init_resnet50_params,
        quantize_resnet50,
        resnet50_forward_int8,
    )
    from winograd_tpu.parallel import make_pipe_mesh, pipelined_resnet50_inference

    @dataclasses.dataclass(frozen=True)
    class _TinyI2(ResNet50Config):
        stages = ((16, 8, 8, 3), (32, 8, 4, 2))
        img: int = 32
        stem_c: int = 8
        num_classes: int = 24

    params = init_resnet50_params(_TinyI2("pipe_int8_2r"), seed=43)
    q = quantize_resnet50(params)
    x = jax.random.normal(jax.random.PRNGKey(18), (4, 32, 32, 3), jnp.float32)
    want = np.asarray(resnet50_forward_int8(x, q))
    got = np.asarray(
        pipelined_resnet50_inference(
            make_pipe_mesh(2), q, x, microbatch=2, precision="int8"
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_pipelined_basicnet_matches_single_device():
    """The BASIC-block classifier as a FLOP-balanced GPipe pipeline (2 and
    3 ranks) matches the single-device fused forward at f32, and the int8
    pipeline matches single-device int8 serving."""
    from winograd_tpu.models.basic import (
        basicnet_forward_int8,
        basicnet_forward_pallas,
        quantize_basicnet,
    )
    from winograd_tpu.parallel import make_pipe_mesh, pipelined_basicnet_inference
    from tests.test_parallel import _tiny_basic_case

    case, params = _tiny_basic_case("pipe_basic", seed=61)
    x = jnp.stack([
        jnp.asarray(case["x"]) * s for s in (1.0, 0.5, -0.25, 2.0)
    ])
    want = np.asarray(basicnet_forward_pallas(x, params))
    for ranks in (2, 3):
        got = np.asarray(
            pipelined_basicnet_inference(
                make_pipe_mesh(ranks), params, x, microbatch=2
            )
        )
        np.testing.assert_allclose(got, want, atol=2e-5, err_msg=str(ranks))
    q = quantize_basicnet(params)
    want_i8 = np.asarray(basicnet_forward_int8(x, q))
    got_i8 = np.asarray(
        pipelined_basicnet_inference(
            make_pipe_mesh(2), q, x, microbatch=2, precision="int8"
        )
    )
    np.testing.assert_allclose(got_i8, want_i8, atol=2e-5)


def test_basic_engine_pipe_partition():
    """ResNetBasicEngine(partition='pipe') serves through the GPipe path
    at f32 and bf16w, matching the single-device engine."""
    from winograd_tpu.engine import ResNetBasicEngine
    from tests.test_parallel import _tiny_basic_case

    case, params = _tiny_basic_case("engine_pipe_basic", seed=62)
    x = jax.random.normal(jax.random.PRNGKey(23), (4, 32, 32, 3), jnp.float32)
    mesh = make_pipe_mesh(3)
    for tier in ("f32", "bf16w"):
        single = ResNetBasicEngine(params, tier=tier)
        piped = ResNetBasicEngine(
            params, tier=tier, mesh=mesh, partition="pipe", microbatch=2
        )
        np.testing.assert_allclose(
            np.asarray(piped(x)), np.asarray(single(x)), atol=2e-5,
            err_msg=tier,
        )
