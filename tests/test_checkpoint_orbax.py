"""Orbax checkpoint backend: async per-array production checkpoints that
round-trip the nested classifier tree (None leaves, lists) and restore
sharded onto a mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.config import ResNet50Config
from winograd_tpu.models import load_model_orbax, save_model_orbax
from winograd_tpu.models.resnet50 import init_resnet50_params


@dataclasses.dataclass(frozen=True)
class _Tiny(ResNet50Config):
    stages = ((16, 8, 8, 1), (32, 8, 4, 1))
    img: int = 32
    stem_c: int = 8
    num_classes: int = 16


def _trees_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert jax.tree_util.tree_structure(a) == jax.tree_util.tree_structure(b)
    return max(
        float(np.abs(np.asarray(x) - np.asarray(y)).max()) for x, y in zip(la, lb)
    )


def test_orbax_roundtrip(tmp_path):
    params = init_resnet50_params(_Tiny("orbax_rt"), seed=5)
    save_model_orbax(str(tmp_path / "ckpt"), params)
    restored = load_model_orbax(str(tmp_path / "ckpt"), like=params)
    assert _trees_equal(params, restored) == 0.0


def test_orbax_async_and_mesh_restore(tmp_path):
    from winograd_tpu.parallel import make_mesh

    params = init_resnet50_params(_Tiny("orbax_mesh"), seed=6)
    ck = save_model_orbax(str(tmp_path / "ckpt"), params, wait=False)
    ck.wait_until_finished()

    mesh = make_mesh(8, model_axis=2)
    restored = load_model_orbax(str(tmp_path / "ckpt"), like=params, mesh=mesh)
    assert _trees_equal(params, restored) == 0.0
    # Arrays actually landed on the mesh, replicated.
    leaf = restored["head"]["w_fc"]
    assert isinstance(leaf, jax.Array) and len(leaf.sharding.device_set) == 8

    # ...and the restored tree serves.
    from winograd_tpu.engine import ResNet50Engine

    eng = ResNet50Engine(jax.tree.map(np.asarray, restored))
    out = eng(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert out.shape == (1, 16)
