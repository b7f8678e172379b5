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
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from winograd_tpu.models.import_torch import (  # noqa: E402
    resnet_serving_params_from_torch,
    resnet_train_params_from_torch,
)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.relu(self.bn2(self.conv2(h)))
        h = self.bn3(self.conv3(h))
        return self.relu(h + idt)


class _ResNet(nn.Module):
    """torchvision.models.ResNet's structure and parameter names."""

    def __init__(self, layers, stem_c=16, planes=(4, 8, 16, 16), classes=16):
        super().__init__()
        self.conv1 = nn.Conv2d(3, stem_c, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(stem_c)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = stem_c
        for li, (p, n) in enumerate(zip(planes, layers), start=1):
            stride = 1 if li == 1 else 2
            down = nn.Sequential(
                nn.Conv2d(inplanes, p * 4, 1, stride=stride, bias=False),
                nn.BatchNorm2d(p * 4),
            )
            blocks = [_Bottleneck(inplanes, p, stride, down)]
            inplanes = p * 4
            blocks += [_Bottleneck(inplanes, p) for _ in range(n - 1)]
            setattr(self, f"layer{li}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(inplanes, classes)

    def forward(self, x):
        h = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(1, 5):
            h = getattr(self, f"layer{li}")(h)
        return self.fc(torch.flatten(self.avgpool(h), 1))


def _random_eval_model(layers, seed=0):
    torch.manual_seed(seed)
    model = _ResNet(layers)
    # Random (but sane) BN running stats so the fold is non-trivial.
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)
    return model.eval()


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
