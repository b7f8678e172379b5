"""Cross-implementation consistency sweep: every conv implementation must
agree with the numpy golden across a grid of shapes and flags."""

import numpy as np
import pytest

from winograd_tpu.config import PARITY_ATOL
from winograd_tpu.kernels import transforms
from winograd_tpu.kernels.direct import conv3x3_bn_direct_pallas, direct_filter
from winograd_tpu.kernels.pointwise import conv1x1_bn_pallas
from winograd_tpu.kernels.winograd import conv3x3_bn_winograd_pallas
from winograd_tpu.ops import jnp_ops, reference


@pytest.mark.parametrize(
    "n,hw,cin,cout,relu",
    [
        (1, 14, 128, 128, True),
        (2, 7, 256, 128, False),
        (1, 11, 128, 256, True),
    ],
)
def test_conv3x3_all_implementations_agree(n, hw, cin, cout, relu):
    rng = np.random.default_rng(hash((n, hw, cin, cout)) % 2**31)
    x = (rng.random((n, hw, hw, cin), dtype=np.float32) - 0.5)
    w = (rng.random((cout, cin, 3, 3), dtype=np.float32) - 0.5)
    s = (rng.random(cout, dtype=np.float32) - 0.5)
    b = (rng.random(cout, dtype=np.float32) - 0.5)
    gold = reference.conv3x3_bn_relu(x, w, s, b, relu=relu)
    outs = {
        "winograd4": conv3x3_bn_winograd_pallas(
            x, transforms.transform_filter(w, m=4), s, b, relu=relu
        ),
        "winograd2": conv3x3_bn_winograd_pallas(
            x, transforms.transform_filter(w, m=2), s, b, relu=relu
        ),
        "direct": conv3x3_bn_direct_pallas(x, np.asarray(direct_filter(w)), s, b, relu=relu),
        "xla": jnp_ops.conv3x3_bn_relu(x, w, s, b, relu=relu),
    }
    for name, out in outs.items():
        err = np.abs(np.asarray(out) - gold).max()
        assert err < PARITY_ATOL, f"{name} @ {(n, hw, cin, cout, relu)}: {err}"


@pytest.mark.parametrize(
    "lead,cin,cout,relu",
    [((5, 5), 384, 256, True), ((3, 9, 2), 128, 640, False), ((1,), 256, 256, True)],
)
def test_conv1x1_shapes_and_flags(lead, cin, cout, relu):
    rng = np.random.default_rng(hash((lead, cin, cout)) % 2**31)
    x = (rng.random(lead + (cin,), dtype=np.float32) - 0.5)
    w = (rng.random((cin, cout), dtype=np.float32) - 0.5)
    s = (rng.random(cout, dtype=np.float32) - 0.5)
    b = (rng.random(cout, dtype=np.float32) - 0.5)
    gold = reference.conv1x1_bn(x, w, s, b, relu=relu)
    out = np.asarray(conv1x1_bn_pallas(x, w, s, b, relu=relu))
    assert out.shape == gold.shape
    assert np.abs(out - gold).max() < PARITY_ATOL
