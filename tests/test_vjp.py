"""Custom VJPs (Pallas forward / XLA backward) vs jax.grad of the jnp ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from winograd_tpu.kernels import vjp
from winograd_tpu.ops import jnp_ops


def _rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * 0.5


def _grads(fn, args):
    loss = lambda *a: jnp.sum(fn(*a) ** 2)
    return jax.grad(loss, argnums=tuple(range(len(args))))(*args)


@pytest.mark.parametrize("relu", [True, False])
def test_pointwise_grads_match(relu):
    x, w = _rand(0, 14, 14, 128), _rand(1, 128, 128)
    s, b = _rand(2, 128), _rand(3, 128)
    got = _grads(lambda *a: vjp.conv1x1_bn_train(*a, relu), (x, w, s, b))
    want = _grads(lambda *a: jnp_ops.conv1x1_bn(*a, relu), (x, w, s, b))
    for g, w_, name in zip(got, want, ("dx", "dw", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=2e-4, atol=2e-3, err_msg=name)


@pytest.mark.parametrize("relu", [True, False])
def test_winograd_grads_match(relu):
    x, w = _rand(0, 14, 14, 128), _rand(1, 128, 128, 3, 3)
    s, b = _rand(2, 128), _rand(3, 128)
    got = _grads(lambda *a: vjp.conv3x3_bn_winograd_train(*a, relu, 4), (x, w, s, b))
    want = _grads(lambda *a: jnp_ops.conv3x3_bn_relu(*a, relu), (x, w, s, b))
    for g, w_, name in zip(got, want, ("dx", "dw", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=2e-4, atol=5e-3, err_msg=name)


def test_forward_values_match_pallas():
    x, w = _rand(0, 14, 14, 128), _rand(1, 128, 128, 3, 3)
    s, b = _rand(2, 128), _rand(3, 128)
    out = vjp.conv3x3_bn_winograd_train(x, w, s, b, True, 4)
    want = jnp_ops.conv3x3_bn_relu(x, w, s, b, True)
    # Both sides are f32 approximations (pallas-winograd vs XLA direct conv);
    # their mutual difference can exceed the 1e-4 golden-parity bar slightly.
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=2e-4, atol=1e-3)


def test_filter_transform_jnp_matches_numpy():
    from winograd_tpu.kernels import transforms

    w = np.asarray(_rand(5, 8, 4, 3, 3))
    got = np.asarray(vjp.filter_transform_jnp(jnp.asarray(w), m=4))
    want = transforms.transform_filter(w, m=4)
    np.testing.assert_allclose(got, want, atol=1e-5)
