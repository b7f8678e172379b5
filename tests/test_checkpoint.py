"""Checkpoint save/load and deployment-artifact export."""

import numpy as np
import jax
import jax.numpy as jnp

from winograd_tpu.models import (
    bottleneck_block_pallas,
    export_artifacts,
    init_bottleneck_params,
    load_params,
    save_params,
)
from winograd_tpu.models.resnet import bottleneck_block_train
from winograd_tpu.utils.io import get_parameter


def test_save_load_roundtrip(tmp_path):
    params = init_bottleneck_params(0, c_io=32, c_mid=16)
    path = str(tmp_path / "ckpt.npz")
    save_params(path, params, extra={"step": np.int64(7)})
    back, extra = load_params(path)
    assert extra["step"] == 7
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(back[k], np.asarray(params[k]))


def test_export_artifacts_closes_training_loop(tmp_path):
    """Train-format params -> reference-format blobs -> fused inference,
    matching the differentiable forward (the full deploy pipeline)."""
    params = init_bottleneck_params(1, c_io=128, c_mid=128)
    x = jax.random.normal(jax.random.PRNGKey(2), (14, 14, 128), jnp.float32)

    outdir = str(tmp_path / "artifacts")
    export_artifacts(params, outdir)

    u = get_parameter(f"{outdir}/weight_winograd_128_128.bin", 36 * 128 * 128).reshape(
        36, 128, 128
    )
    infer_params = dict(params)
    infer_params["u_mid"] = jnp.asarray(u)
    y_infer = bottleneck_block_pallas(x, infer_params)
    y_train = bottleneck_block_train(x, params)
    np.testing.assert_allclose(np.asarray(y_infer), np.asarray(y_train), atol=1e-4)


def test_train_block_grads_flow():
    params = init_bottleneck_params(3, c_io=128, c_mid=128)
    params.pop("u_mid")
    x = jax.random.normal(jax.random.PRNGKey(4), (14, 14, 128), jnp.float32)

    def loss(p):
        return jnp.mean(bottleneck_block_train(x, p) ** 2)

    grads = jax.grad(loss)(params)
    assert set(grads) == set(params)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads.values())
    assert float(jnp.abs(grads["w_mid"]).max()) > 0
