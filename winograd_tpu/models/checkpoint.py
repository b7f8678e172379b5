"""Checkpoint / resume and deployment-artifact export.

The reference's only persistence is its offline artifact contract: raw
float32 blobs that the kernels load verbatim (SURVEY.md §5 "Checkpoint /
resume"). This module keeps that contract and adds real checkpointing:

* save_params / load_params — npz checkpoints of a param pytree (with
  optimizer state if given), atomic rename so a crash never leaves a
  half-written file.
* export_artifacts — turn trained block params into the reference-format
  deployment artifact set (offline-Winograd-transformed weights + folded BN
  blobs), i.e. the training -> offline-preprocessing -> inference pipeline
  end to end.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from winograd_tpu.kernels import transforms
from winograd_tpu.utils.io import save_parameter


def save_params(path: str, params: Dict, extra: Optional[Dict] = None) -> None:
    """Atomically save a flat dict-of-arrays checkpoint."""
    arrays = {f"params/{k}": np.asarray(v) for k, v in params.items()}
    if extra:
        arrays.update({f"extra/{k}": np.asarray(v) for k, v in extra.items()})
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_params(path: str) -> Tuple[Dict, Dict]:
    """Load (params, extra) saved by save_params."""
    params, extra = {}, {}
    with np.load(path) as z:
        for k in z.files:
            group, name = k.split("/", 1)
            (params if group == "params" else extra)[name] = z[k]
    return params, extra


def export_artifacts(params: Dict, outdir: str, m: int = 4) -> None:
    """Write a trained bottleneck block as reference-format blobs.

    Emits the offline-transformed 3x3 filter ([a^2][Cin][Cout] layout like
    weight_winograd_*.bin, data_generator.py:63-78) and the folded-BN
    scale/bias blobs the fused kernels consume at inference.
    """
    os.makedirs(outdir, exist_ok=True)
    w_mid = np.asarray(params["w_mid"])
    cmid = w_mid.shape[0]
    cio = np.asarray(params["w_reduce"]).shape[0]
    save_parameter(f"{outdir}/weight_NCHW_{cmid}_{cmid}.bin", w_mid)
    save_parameter(
        f"{outdir}/weight_winograd_{cmid}_{cmid}.bin",
        transforms.transform_filter(w_mid, m=m),
    )
    save_parameter(f"{outdir}/weight_one_{cio}_{cmid}.bin", params["w_reduce"])
    save_parameter(f"{outdir}/weight_one_{cmid}_{cio}.bin", params["w_expand"])
    for name, key in [
        (f"bnScale_winograd_{cmid}", "s_mid"),
        (f"bnBias_winograd_{cmid}", "b_mid"),
        (f"bnScale_myKernel_one_{cmid}", "s_reduce"),
        (f"bnBias_myKernel_one_{cmid}", "b_reduce"),
        (f"bnScale_myKernel_one_{cio}", "s_expand"),
        (f"bnBias_myKernel_one_{cio}", "b_expand"),
    ]:
        save_parameter(f"{outdir}/{name}.bin", params[key])
