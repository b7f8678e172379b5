"""Bottleneck block / stage composition through the fused Pallas kernels."""

import numpy as np
import pytest
import jax

from winograd_tpu.config import CASES, PARITY_ATOL
from winograd_tpu.datagen.generate import make_block_case
from winograd_tpu.models import resnet


def _params_from_case(case):
    keys = (
        "w_reduce", "s_reduce", "b_reduce", "w_mid", "u_mid", "w9_mid", "s_mid",
        "b_mid", "w_expand", "s_expand", "b_expand",
    )
    return {k: case[k] for k in keys}


def test_block_pallas_matches_golden():
    cfg = CASES[6]
    case = make_block_case(cfg, seed=6)
    params = _params_from_case(case)
    for algo in ("fused", "direct", "winograd"):
        out = np.asarray(resnet.bottleneck_block_pallas(case["x"], params, algo3x3=algo))
        err = np.abs(out - case["golden"]).max()
        # Three chained convs: allow 10x the single-layer bar.
        assert err < 10 * PARITY_ATOL, f"block[{algo}] max err {err}"


def test_block_baseline_matches_golden():
    cfg = CASES[6]
    case = make_block_case(cfg, seed=6)
    params = _params_from_case(case)
    out = np.asarray(resnet.bottleneck_block_baseline(case["x"], params))
    err = np.abs(out - case["golden"]).max()
    assert err < 10 * PARITY_ATOL, f"block max err {err}"


def test_conv4x_stage_matches_golden():
    """Mode 8: the full ResNet-50 conv4_x stage (6 chained bottlenecks)."""
    from winograd_tpu.datagen.generate import block_params_list, make_block_case

    cfg = CASES[8]
    assert cfg.blocks == 6
    case = make_block_case(cfg, seed=8)
    # Guard against vanishing activations making the parity check trivial.
    assert np.abs(case["golden"]).max() > 1e-2
    params_list = block_params_list(cfg, case)
    out = np.asarray(resnet.resnet_stage_pallas(case["x"], params_list))
    err = np.abs(out - case["golden"]).max()
    assert err < 10 * PARITY_ATOL, f"stage max err {err}"


@pytest.mark.parametrize("mode", [9, 10])
def test_other_stage_geometries(mode):
    """conv3_x (28x28, 512/128) and conv5_x (7x7, 2048/512) blocks; conv5_x
    exceeds the megakernel's VMEM weight budget and must auto-fall back to
    the per-layer kernels."""
    cfg = CASES[mode]
    case = make_block_case(cfg, seed=mode)
    params = _params_from_case(case)
    out = np.asarray(resnet.bottleneck_block_pallas(case["x"], params))
    err = np.abs(out - case["golden"]).max()
    assert err < 10 * PARITY_ATOL, f"mode {mode} max err {err}"


def test_stage_winograd2_mid_at_28x28():
    """The weight-streaming stage kernel with the F(2,3) winograd mid-layer
    (auto-selected on large maps) matches the golden chain, vs the direct
    mid as a cross-check."""
    from winograd_tpu.config import BlockConfig
    from winograd_tpu.datagen.generate import block_params_list, make_block_case
    from winograd_tpu.kernels.stage import resnet_stage_fused_pallas, stack_stage_params

    cfg = BlockConfig("t", c_io=256, c_mid=64, hw=28, blocks=2)
    case = make_block_case(cfg, seed=28)
    stacked = stack_stage_params(block_params_list(cfg, case))
    out_w = np.asarray(resnet_stage_fused_pallas(case["x"], stacked, mid_algo="winograd2"))
    out_d = np.asarray(resnet_stage_fused_pallas(case["x"], stacked, mid_algo="direct"))
    assert np.abs(out_w - case["golden"]).max() < 10 * PARITY_ATOL
    assert np.abs(out_d - case["golden"]).max() < 10 * PARITY_ATOL


def test_init_and_stage():
    params = [
        resnet.init_bottleneck_params(i, c_io=128, c_mid=128) for i in range(2)
    ]
    x = jax.random.normal(jax.random.PRNGKey(9), (14, 14, 128))
    out = resnet.resnet_stage_pallas(x, params)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    assert (np.asarray(out) >= 0).all()  # final ReLU


def test_stage_weight_resident_batched():
    """Batched inputs take the block-outer weight-resident stage layout
    (kernels/stage.py::_stage_kernel_resident — each block's weights are
    fetched once for the whole batch). Must match the per-image streaming
    kernel bitwise-close and the golden chain, on both mid algorithms."""
    from winograd_tpu.config import BlockConfig
    from winograd_tpu.datagen.generate import block_params_list, make_block_case
    from winograd_tpu.kernels.stage import resnet_stage_fused_pallas, stack_stage_params

    cfg = BlockConfig("t", c_io=256, c_mid=64, hw=14, blocks=3, batch=4)
    case = make_block_case(cfg, seed=41)
    stacked = stack_stage_params(block_params_list(cfg, case))
    x = case["x"]
    assert x.shape[0] == 4
    # resident is an explicit opt-in (the image-outer layout measured
    # faster end-to-end); winograd2 mid silently keeps the image-outer
    # kernel, covering the opt-out path.
    for mid_algo in ("direct", "winograd2"):
        out_b = np.asarray(
            resnet_stage_fused_pallas(
                x, stacked, mid_algo=mid_algo, resident=True
            )
        )
        per_img = np.stack(
            [
                np.asarray(
                    resnet_stage_fused_pallas(x[i], stacked, mid_algo=mid_algo)
                )
                for i in range(x.shape[0])
            ]
        )
        assert np.abs(out_b - per_img).max() < PARITY_ATOL, mid_algo
        assert np.abs(out_b - case["golden"]).max() < 10 * PARITY_ATOL, mid_algo
    # bf16w tier rides the same resident layout.
    out_bf = np.asarray(
        resnet_stage_fused_pallas(
            x, stacked, mid_algo="direct", precision="bf16w", resident=True
        )
    )
    rel = np.abs(out_bf - case["golden"]).max() / np.abs(case["golden"]).max()
    assert rel < 5e-3, rel
