"""Device mesh construction and sharding layouts.

The reference is strictly single-GPU (cudaSetDevice(0), no NCCL/MPI —
SURVEY.md §2 parallelism ledger), so nothing here translates CUDA; this
layer is the TPU-native scaling story the reference lacks: a
(data, model) jax.sharding.Mesh with

* DP  — batch dim sharded over "data" (gradients psum over ICI),
* TP  — the wide channel dims (Cio=1024) of the bottleneck sharded over
        "model": w_reduce is column-sharded on Cin, w_expand row-sharded on
        Cout, so the reduce GEMM needs no collective and the expand GEMM's
        partial sums meet the skip-add after one psum — XLA inserts exactly
        that from the shardings.

PP/SP/EP are N/A by construction for this model family (single 14x14 CNN
block: no pipeline stages worth cutting at this depth, no sequence axis, no
experts) — documented as absent-by-design, mirroring SURVEY.md §5.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_axis: int | None = None) -> Mesh:
    """Build a (data, model) mesh over the first n_devices devices.

    model_axis defaults to min(n_devices, 2): channel sharding wants the
    fastest ICI hops, data parallelism takes the rest.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    if model_axis is None:
        model_axis = 2 if n % 2 == 0 and n > 1 else 1
    assert n % model_axis == 0, (n, model_axis)
    arr = np.asarray(devices[:n]).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def block_shardings(mesh: Mesh):
    """NamedShardings for (x, params) of a bottleneck block.

    x: (N, H, W, Cio) — batch over "data", Cio over "model" (activations
    enter/leave the block channel-sharded; the skip add stays local).
    """
    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    x_sharding = ns("data", None, None, "model")
    param_shardings = {
        "w_reduce": ns("model", None),   # Cin (=Cio) sharded: local partial GEMM
        "s_reduce": ns(None),
        "b_reduce": ns(None),
        "w_mid": ns(None, None, None, None),
        "u_mid": ns(None, None, None),
        "u2_mid": ns(None, None, None),
        "w9_mid": ns(None, None),
        "s_mid": ns(None),
        "b_mid": ns(None),
        "w_expand": ns(None, "model"),   # Cout (=Cio) sharded: output stays sharded
        "s_expand": ns("model"),
        "b_expand": ns("model"),
    }
    return x_sharding, param_shardings
