"""Feature-map size generality: the reference is hard-coded to 14x14; this
framework handles the other ResNet stages (7x7, 28x28) and rectangular maps."""

import numpy as np
import pytest

from winograd_tpu.config import PARITY_ATOL
from winograd_tpu.kernels import transforms
from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas, direct_filter
from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas
from winograd_tpu.ops import reference


@pytest.mark.parametrize("hw", [(7, 7), (28, 28), (14, 10), (9, 13)])
def test_conv3x3_sizes(hw):
    h, w = hw
    rng = np.random.default_rng(h * 100 + w)
    x = (rng.random((h, w, 128), dtype=np.float32) - 0.5)
    wf = (rng.random((128, 128, 3, 3), dtype=np.float32) - 0.5)
    s = (rng.random(128, dtype=np.float32) - 0.5)
    b = (rng.random(128, dtype=np.float32) - 0.5)
    gold = reference.conv3x3_bn_relu(x, wf, s, b, relu=True)
    u = transforms.transform_filter(wf)
    outw = np.asarray(conv3x3_bn_winograd_pallas(x, u, s, b, relu=True))
    assert np.abs(outw - gold).max() < PARITY_ATOL, f"winograd {h}x{w}"
    outd = np.asarray(
        conv3x3_bn_direct_pallas(x, np.asarray(direct_filter(wf)), s, b, relu=True)
    )
    assert np.abs(outd - gold).max() < PARITY_ATOL, f"direct {h}x{w}"


@pytest.mark.parametrize("hw", [(7, 7), (28, 28)])
def test_conv1x1_sizes(hw):
    h, w = hw
    rng = np.random.default_rng(h)
    x = (rng.random((h, w, 256), dtype=np.float32) - 0.5)
    wt = (rng.random((256, 128), dtype=np.float32) - 0.5)
    s = (rng.random(128, dtype=np.float32) - 0.5)
    b = (rng.random(128, dtype=np.float32) - 0.5)
    gold = reference.conv1x1_bn(x, wt, s, b, relu=True)
    out = np.asarray(conv1x1_bn_pallas(x, wt, s, b, relu=True))
    assert np.abs(out - gold).max() < PARITY_ATOL
