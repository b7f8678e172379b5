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


def save_model(path: str, tree, extra: Optional[Dict] = None) -> None:
    """Atomically save a NESTED param pytree (dicts / lists / None leaves —
    the full-classifier structure of models/resnet50.py). The structure is
    stored as JSON with leaf placeholders; arrays go in the same npz."""
    import json

    arrays = {}

    def enc(node, pfx):
        if node is None:
            return None
        if isinstance(node, dict):
            return {k: enc(v, f"{pfx}/{k}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return [enc(v, f"{pfx}/{i}") for i, v in enumerate(node)]
        arrays[pfx] = np.asarray(node)
        return {"__leaf__": pfx}

    structure = {"tree": enc(tree, "p"), "extra": enc(extra or {}, "e")}
    arrays["__structure__"] = np.frombuffer(
        json.dumps(structure).encode(), np.uint8
    ).copy()
    tmp = f"{path}.tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_model(path: str) -> Tuple[object, Dict]:
    """Load (tree, extra) saved by save_model."""
    import json

    with np.load(path) as z:
        arrays = {k: z[k] for k in z.files}
    structure = json.loads(bytes(arrays.pop("__structure__")).decode())

    def dec(node):
        if node is None:
            return None
        if isinstance(node, dict):
            if "__leaf__" in node:
                return arrays[node["__leaf__"]]
            return {k: dec(v) for k, v in node.items()}
        return [dec(v) for v in node]

    return dec(structure["tree"]), dec(structure["extra"])


def prepare_resnet50_serving(train_params: Dict) -> Dict:
    """The offline-preprocessing step of the training -> deployment
    pipeline for the COMPLETE classifier: take TRAINED params (raw
    filters, folded BN — the mode-19 parameterization) and derive every
    serving artifact the fused kernels consume: the stem's s2d GEMM layout
    (w192_stem), each block's direct + F(2,3) Winograd filter layouts
    (w9_mid / u2_mid), and each transition's fused expand+projection
    stream (wep / bep). Mirrors what datagen ships for random cases."""
    from winograd_tpu.kernels.direct import direct_filter
    from winograd_tpu.kernels.transition import fuse_transition_weights
    from winograd_tpu.models.resnet50 import stem_filter, stem_filter_s2d

    def with_mid(d):
        out = dict(d)
        w_mid = np.asarray(d["w_mid"])
        out["w9_mid"] = np.asarray(direct_filter(w_mid))
        out["u2_mid"] = transforms.transform_filter(w_mid, m=2)
        return out

    def with_fused(d):
        out = with_mid(d)
        wep, bep = fuse_transition_weights(d)
        out["wep"], out["bep"] = np.asarray(wep), np.asarray(bep)
        return out

    stem = dict(train_params["stem"])
    w7 = np.asarray(stem["w7_stem"])
    stem["w49_stem"] = stem_filter(w7)
    stem["w192_stem"] = stem_filter_s2d(w7)
    return {
        "stem": stem,
        "proj": with_mid(train_params["proj"]),
        "stages": [
            {
                "transition": None
                if st.get("transition") is None
                else with_fused(st["transition"]),
                "blocks": [with_mid(b) for b in st["blocks"]],
            }
            for st in train_params["stages"]
        ],
        "head": dict(train_params["head"]),
    }


def prepare_basicnet_serving(train_params: Dict) -> Dict:
    """Offline preprocessing for the BASIC-block family (ResNet-18/34):
    derive every serving artifact from trained params (raw OIHW filters,
    folded BN — models/basic.py::basicnet_forward_train's structure): the
    stem's GEMM layouts, each stride-1 3x3's F(2,3) Winograd + direct
    layouts (u2_*/w9_*), and each entry block's strided direct layout."""
    from winograd_tpu.kernels.direct import direct_filter
    from winograd_tpu.models.resnet50 import stem_filter, stem_filter_s2d

    def with_layouts(d, winograd=("a", "b")):
        out = dict(d)
        for leg in ("a", "b"):
            w = np.asarray(d[f"w_{leg}"])
            out[f"w9_{leg}"] = np.asarray(direct_filter(w))
            if leg in winograd:
                out[f"u2_{leg}"] = transforms.transform_filter(w, m=2)
        return out

    stem = dict(train_params["stem"])
    w7 = np.asarray(stem["w7_stem"])
    stem["w49_stem"] = stem_filter(w7)
    stem["w192_stem"] = stem_filter_s2d(w7)
    from winograd_tpu.models.basic import attach_fused_stage_artifacts

    return attach_fused_stage_artifacts({
        "stem": stem,
        "stages": [
            {
                # The entry's first conv is strided — direct layout only.
                "entry": None
                if st.get("entry") is None
                else with_layouts(st["entry"], winograd=("b",)),
                "blocks": [with_layouts(b) for b in st["blocks"]],
            }
            for st in train_params["stages"]
        ],
        "head": dict(train_params["head"]),
    })


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


def save_model_orbax(path: str, tree, *, wait: bool = True):
    """Save a nested param pytree with orbax (StandardCheckpointer): an
    ASYNC, per-array, production checkpoint directory — the at-scale
    complement to save_model's single-file npz (atomic + dependency-free).
    With wait=False the save runs in the background; call
    .wait_until_finished() on the returned checkpointer (e.g. overlap a
    checkpoint with the next training steps)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    if wait:
        ckptr.wait_until_finished()
        return None
    return ckptr


def load_model_orbax(path: str, like=None, mesh=None):
    """Restore a save_model_orbax directory. `like` (an abstract tree of
    the same structure, e.g. init_resnet50_params(cfg)) makes the restore
    structure-checked; with a mesh, arrays land replicated on it (ready
    for the DP/TP serving paths)."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = None
    if like is not None:
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P())
            target = jax.tree.map(
                lambda v: jax.ShapeDtypeStruct(
                    np.shape(v), np.asarray(v).dtype, sharding=sh
                ),
                like,
            )
        else:
            target = jax.tree.map(
                lambda v: jax.ShapeDtypeStruct(np.shape(v), np.asarray(v).dtype),
                like,
            )
    out = ckptr.restore(os.path.abspath(path), target)
    ckptr.wait_until_finished()
    return out
