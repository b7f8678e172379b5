"""Data generator: determinism, artifact contract, golden integrity."""

import numpy as np

from winograd_tpu.config import CASES
from winograd_tpu.datagen.generate import (
    generate_all,
    make_case,
    make_pointwise_case,
    make_winograd_case,
)
from winograd_tpu.utils.io import get_parameter


def test_seed_determinism():
    a = make_winograd_case(CASES[0], seed=7)
    b = make_winograd_case(CASES[0], seed=7)
    c = make_winograd_case(CASES[0], seed=8)
    np.testing.assert_array_equal(a["x"], b["x"])
    assert not np.array_equal(a["x"], c["x"])


def test_all_cases_constructible():
    from winograd_tpu.config import BackboneConfig, BasicNetConfig

    for mode in CASES:
        cfg = CASES[mode]
        if isinstance(cfg, (BackboneConfig, BasicNetConfig)) and cfg.batch > 1:
            # Batched model modes (14/18/26/27/28) reuse a batch-1 twin's
            # structure; their float64 golden chains cost minutes each —
            # constructibility is covered by the batch-1 mode.
            continue
        case = make_case(mode, seed=mode)
        assert "golden" in case and np.isfinite(case["golden"]).all()


def test_artifact_files(tmp_path):
    """Every case writes its own complete file set (fixing the reference's
    missing-256 and aliased-1x1 quirks, SURVEY.md §3.4)."""
    outdir = str(tmp_path / "data")
    generate_all(outdir, seed=0)
    # mode 1 (256-ch winograd) files exist — the reference never generates these.
    x = get_parameter(f"{outdir}/input_14_1_256.bin", 16 * 16 * 256)
    u = get_parameter(f"{outdir}/weight_winograd_256_256.bin", 36 * 256 * 256)
    assert np.isfinite(x).all() and np.isfinite(u).all()
    # Per-case 1x1 weights, not one aliased 1024 blob.
    w = get_parameter(f"{outdir}/weight_one_512_128.bin", 512 * 128)
    gold = get_parameter(f"{outdir}/golden_one_512_128.bin", 14 * 14 * 128)
    assert np.isfinite(w).all() and np.isfinite(gold).all()


def test_winograd_input_file_is_padded(tmp_path):
    """input_14_1_128.bin is the padded 16x16xC NHWC blob, matching the
    reference's file contract (data_generator.py:49-53)."""
    outdir = str(tmp_path / "data")
    generate_all(outdir, seed=3)
    case = make_case(0, seed=3)
    xp = get_parameter(f"{outdir}/input_14_1_128.bin", 16 * 16 * 128).reshape(16, 16, 128)
    np.testing.assert_array_equal(xp[1:15, 1:15], case["x"])
    assert (xp[0] == 0).all() and (xp[:, 0] == 0).all()


def test_pointwise_golden_matches_recompute():
    from winograd_tpu.ops import reference

    cfg = CASES[4]
    case = make_pointwise_case(cfg, seed=4)
    gold = reference.conv1x1_bn(case["x"], case["w"], case["scale"], case["bias"], cfg.relu)
    np.testing.assert_array_equal(gold, case["golden"])
