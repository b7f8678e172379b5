"""Cross-framework parity: torchvision-format ResNet checkpoints.

Builds a torchvision-naming-compatible bottleneck ResNet in torch (the
standard public architecture: conv1/bn1 stem, layer{1..4} bottlenecks with
downsample entries, fc head — torchvision isn't installed here, so the
module tree is reconstructed with the same names), runs it in eval mode,
and requires our fused-kernel serving path to match the torch logits after
import. torch's CPU conv backend is a fully independent implementation, so
agreement validates the weight mapping, BN folding, stride/padding
conventions, and the offline layout derivation end to end."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from winograd_tpu.models.import_torch import (  # noqa: E402
    build_torch_reference_resnet,
    resnet_serving_params_from_torch,
    resnet_train_params_from_torch,
)


def _random_eval_model(layers, seed=0):
    return build_torch_reference_resnet(layers, seed=seed)


def test_torch_import_structure():
    model = _random_eval_model((2, 2, 3, 2))
    p = resnet_train_params_from_torch(model.state_dict())
    assert set(p) == {"stem", "proj", "stages", "head"}
    assert p["stem"]["w7_stem"].shape == (16, 3, 7, 7)
    assert "w_proj" in p["proj"] and p["proj"]["w_mid"].shape == (4, 4, 3, 3)
    assert [len(s["blocks"]) for s in p["stages"]] == [1, 1, 2, 1]
    assert [s["transition"] is not None for s in p["stages"]] == [
        False, True, True, True]
    assert p["head"]["w_fc"].shape == (64, 16)


def test_torch_import_logits_match():
    """Eval-mode torch logits == our fused serving path after import."""
    from winograd_tpu.models.resnet50 import resnet50_forward_pallas

    model = _random_eval_model((2, 2, 3, 2), seed=1)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = model(x).numpy()[0]

    params = resnet_serving_params_from_torch(model.state_dict())
    ours = np.asarray(
        resnet50_forward_pallas(jnp.asarray(x.numpy()[0].transpose(1, 2, 0)), params)
    )
    rel = np.abs(ours - ref).max() / np.abs(ref).max()
    assert rel < 5e-4, rel


def test_torch_import_serving_tiers():
    """Imported checkpoints serve at every tier: bf16w and int8 logits stay
    within their tier bounds of the torch reference."""
    from winograd_tpu.config import BF16W_RTOL_BACKBONE, INT8_RTOL_BACKBONE
    from winograd_tpu.engine import ResNet50Engine

    model = _random_eval_model((2, 2, 2, 2), seed=3)
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref = model(x).numpy()[0]
    xj = jnp.asarray(x.numpy()[0].transpose(1, 2, 0))

    def rel(a):
        r = np.asarray(ref, np.float64)
        return np.abs(np.asarray(a, np.float64) - r).max() / np.abs(r).max()

    sd = model.state_dict()
    assert rel(ResNet50Engine.from_torch(sd, tier="bf16w")(xj)) < BF16W_RTOL_BACKBONE
    assert rel(ResNet50Engine.from_torch(sd, tier="int8")(xj)) < INT8_RTOL_BACKBONE


def test_engine_from_torch_checkpoint_file(tmp_path):
    """The .pth round trip: torch.save -> ResNet50Engine.from_torch, with
    the common {'state_dict': ...} + 'module.' DataParallel wrapping."""
    from winograd_tpu.engine import ResNet50Engine

    model = _random_eval_model((2, 2, 2, 2), seed=2)
    wrapped = {
        "state_dict": {f"module.{k}": v for k, v in model.state_dict().items()}
    }
    path = str(tmp_path / "ckpt.pth")
    torch.save(wrapped, path)

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref = model(x).numpy()

    eng = ResNet50Engine.from_torch(path)
    ours = np.asarray(eng(jnp.asarray(x.numpy().transpose(0, 2, 3, 1))))
    rel = np.abs(ours - ref).max() / np.abs(ref).max()
    assert rel < 5e-4, rel
    assert eng.classify(jnp.asarray(x.numpy()[0].transpose(1, 2, 0))).shape == ()
