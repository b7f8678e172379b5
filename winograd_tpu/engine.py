"""Inference engine: the serving layer over the fused kernels.

Ties the framework together for deployment: load offline artifacts (native
threaded IO) or a checkpoint, pin parameters to device(s) once, jit once,
and serve batches — single-chip or data-parallel over a Mesh. The
reference's nearest analog is each benchmark entry point re-allocating,
re-uploading and re-freeing everything per call
(/root/reference/Kernel128_winograd.cu:215-434); a serving path wants the
opposite: weights resident, one compiled program, steady-state latency.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from winograd_tpu.models.resnet import bottleneck_block_pallas


class BottleneckEngine:
    """Serves a stack of bottleneck blocks through the fused Pallas kernels.

    params_list: one param dict per block (models/resnet.py layout, with the
    offline w9_mid/u_mid artifacts). With a mesh, inputs are batch-sharded
    over the "data" axis and each device runs the megakernel on its shard.
    """

    def __init__(
        self,
        params_list,
        mesh=None,
        algo3x3: str = "auto",
        tier: str = "f32",
    ):
        """tier "f32" (default) serves the strict-parity megakernels;
        "bf16w" streams bfloat16 weights at half the f32 HBM bytes
        (~1e-3 relative — the middle serving tier); "int8" quantizes the
        weights at load time (per-output-channel) and serves through the
        int8 weight-streaming stage kernel — the throughput option for
        HBM-bound geometries (~1e-2 relative)."""
        self.algo3x3 = algo3x3
        self.mesh = mesh
        self.tier = tier
        assert tier in ("f32", "bf16w", "int8"), tier
        dev = jax.devices()[0]
        if tier == "int8":
            from winograd_tpu.kernels.quantized import quantize_stage_params

            self._qstacked = jax.device_put(
                quantize_stage_params(params_list), dev
            )
        if mesh is None:
            self.params_list = [
                {k: jax.device_put(jnp.asarray(v), dev) for k, v in p.items()}
                for p in params_list
            ]
            self._fn = jax.jit(self._stage)
        else:
            from jax import shard_map
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            self.params_list = [
                {k: jax.device_put(jnp.asarray(v), rep) for k, v in p.items()}
                for p in params_list
            ]
            inner = shard_map(
                lambda x, ps: self._stage(x, ps),
                mesh=mesh,
                in_specs=(P("data", None, None, None), jax.tree.map(lambda _: P(), self.params_list)),
                out_specs=P("data", None, None, None),
                check_vma=False,
            )
            self._fn = jax.jit(inner)

    def _stage(self, x, params_list=None):
        from winograd_tpu.models.resnet import resnet_stage_pallas

        if self.tier == "int8":
            from winograd_tpu.kernels.quantized import resnet_stage_int8_pallas

            return resnet_stage_int8_pallas(x, self._qstacked)
        plist = params_list if params_list is not None else self.params_list
        if self.tier == "bf16w":
            return resnet_stage_pallas(x, plist, precision="bf16w")
        if self.algo3x3 == "auto" and len(plist) > 1:
            return resnet_stage_pallas(x, plist)  # fused stage kernel when it fits
        for p in plist:
            x = bottleneck_block_pallas(x, p, algo3x3=self.algo3x3)
        return x

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "BottleneckEngine":
        """Build from a models.checkpoint npz (single block), deriving the
        offline inference artifacts from the trained weights."""
        from winograd_tpu.kernels.direct import direct_filter
        from winograd_tpu.models.checkpoint import load_params
        from winograd_tpu.models.resnet import winograd_transform_params

        params, _ = load_params(path)
        params.setdefault("u_mid", np.asarray(winograd_transform_params(jnp.asarray(params["w_mid"]))))
        params.setdefault("u2_mid", np.asarray(winograd_transform_params(jnp.asarray(params["w_mid"]), m=2)))
        params.setdefault("w9_mid", np.asarray(direct_filter(params["w_mid"])))
        return cls([params], **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        """Run the stage. x: (H, W, Cio) or (N, H, W, Cio)."""
        return self._fn(jnp.asarray(x, jnp.float32), self.params_list)

    def throughput(
        self, batch: int, c_io: Optional[int] = None, iters: int = 20, hw: int = 14
    ) -> Dict:
        return _throughput(self, batch, c_io or self.params_list[0]["w_reduce"].shape[0], iters, hw)


def _with_fused_transition(tparams):
    """Precompute the transition kernel's fused expand+projection matrix
    ONCE at engine init (kernels/transition.py::fuse_transition_weights).
    Engines pass params as jit ARGUMENTS, so an in-trace fold would re-run
    on device every call — ~25 MB of extra HBM traffic for conv4->5."""
    if "wep" in tparams or "w_expand" not in tparams:
        return tparams
    from winograd_tpu.kernels.transition import fuse_transition_weights

    wep, bep = fuse_transition_weights(tparams)
    return {**tparams, "wep": wep, "bep": bep}


class BackboneEngine:
    """Serves a full multi-stage backbone (models/downsample.py
    resnet50_stages structure: identity stages + stride-2 transitions)
    through the fused megakernels, at the f32 tier or the int8
    weight-streaming tier.

    With a mesh, inputs are batch-sharded over the "data" axis and every
    device runs the megakernel chain on its shard (weights replicated) —
    the serving-throughput scaling path for modes 14/15. For per-chip
    weight-bandwidth scaling of an HBM-bound stage, see
    parallel/tensor_parallel.py::resnet_stage_tp (model-sharded weights)."""

    def __init__(self, stages, tier: str = "f32", mesh=None):
        assert tier in ("f32", "bf16w", "int8"), tier
        self.tier = tier
        self.mesh = mesh
        if mesh is None:
            dest = jax.devices()[0]
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dest = NamedSharding(mesh, P())  # weights replicated on every chip
        put = lambda p: {k: jax.device_put(jnp.asarray(v), dest) for k, v in p.items()}
        self.stages = [
            {
                "transition": None
                if st.get("transition") is None
                else put(_with_fused_transition(st["transition"])),
                "blocks": [put(b) for b in st["blocks"]],
            }
            for st in stages
        ]
        if tier == "int8":
            from winograd_tpu.models.downsample import quantize_backbone

            qstages = quantize_backbone(self.stages)
            if mesh is not None:
                qstages = jax.device_put(qstages, dest)
            self._params = qstages

            def fwd(x, qstages_):
                from winograd_tpu.models.downsample import resnet50_stages_int8

                return resnet50_stages_int8(x, qstages_)
        else:
            precision = "bf16w" if tier == "bf16w" else None
            self._params = self.stages

            def fwd(x, stages_):
                from winograd_tpu.models.downsample import resnet50_stages

                return resnet50_stages(x, stages_, precision=precision)

        if mesh is None:
            self._fn = jax.jit(fwd)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            inner = shard_map(
                fwd,
                mesh=mesh,
                in_specs=(
                    P("data", None, None, None),
                    jax.tree.map(lambda _: P(), self._params),
                ),
                out_specs=P("data", None, None, None),
                check_vma=False,
            )
            self._fn = jax.jit(inner)

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (H, W, C_in) or (N, H, W, C_in) at the first stage's shape
        (with a mesh, N must divide by the "data" axis)."""
        return self._fn(jnp.asarray(x, jnp.float32), self._params)

    def throughput(self, batch: int, hw: int, c_in: int, iters: int = 20) -> Dict:
        return _throughput(self, batch, c_in, iters, hw)


class ResNet50Engine:
    """Serves the COMPLETE ResNet-50 classifier (224x224x3 image in, 1000
    logits out) through the fused kernels — the deployment surface for
    bench mode 16.

    params: the models/resnet50.py forward structure ({"stem", "proj",
    "stages", "head"}, e.g. from resnet50_params(case, cfg) or
    init_resnet50_params(cfg)). tier selects the serving precision
    (f32 strict / bf16w / int8 — the stem's s2d GEMM maps the tier onto
    its split_dot pass count rather than int8 weights, see
    models/resnet50.py::stem_pallas). With a mesh, inputs are
    batch-sharded over the "data" axis; partition="data" (default)
    replicates weights on every chip, partition="model" shards every
    block's weights over the "model" axis too (the Megatron recipe,
    parallel/tensor_parallel.py::make_resnet50_tp_fn — per-chip weight
    bytes drop to ~1/model_axis), partition="pipe" runs the FLOP-balanced
    GPipe schedule over a ("pipe",) mesh. Every tier serves under every
    partition."""

    def __init__(self, params, tier: str = "f32", mesh=None, partition="data",
                 microbatch: int = 1):
        assert tier in ("f32", "bf16w", "int8"), tier
        assert partition in ("data", "model", "pipe"), partition
        self.tier = tier
        self.mesh = mesh
        if partition == "pipe":
            # GPipe over a ("pipe",) mesh (parallel/pipeline.py): block-
            # granular FLOP-balanced rank groups, all three tiers. The
            # batch must be a multiple of microbatch.
            assert mesh is not None and "pipe" in mesh.axis_names, mesh
            from winograd_tpu.parallel import pipelined_resnet50_inference

            if tier == "int8":
                from winograd_tpu.models.resnet50 import quantize_resnet50

                params = quantize_resnet50(params)
            prec = None if tier == "f32" else tier
            self._params = jax.tree.map(jnp.asarray, params)
            self._fn = lambda x, p: pipelined_resnet50_inference(
                mesh, p, x, microbatch=microbatch, precision=prec
            )
            return
        if partition == "model":
            assert mesh is not None, "partition='model' needs a mesh"
            from winograd_tpu.parallel import make_resnet50_tp_fn

            prec = None if tier == "f32" else tier
            # The builder converts all weight arrays ONCE; __call__ does no
            # per-call host->device re-upload.
            tp_fn = make_resnet50_tp_fn(mesh, params, precision=prec)
            self._params = None
            self._fn = lambda x, p: tp_fn(x)
            return
        if mesh is None:
            dest = jax.devices()[0]
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dest = NamedSharding(mesh, P())
        if tier == "int8":
            from winograd_tpu.models.resnet50 import quantize_resnet50

            self._params = jax.device_put(quantize_resnet50(params), dest)

            def fwd(x, p):
                from winograd_tpu.models.resnet50 import resnet50_forward_int8

                return resnet50_forward_int8(x, p)
        else:
            precision = "bf16w" if tier == "bf16w" else None
            params = dict(params)
            params["stages"] = [
                {
                    "transition": None
                    if st.get("transition") is None
                    else _with_fused_transition(st["transition"]),
                    "blocks": st["blocks"],
                }
                for st in params["stages"]
            ]
            self._params = jax.device_put(
                jax.tree.map(jnp.asarray, params), dest
            )

            def fwd(x, p):
                from winograd_tpu.models.resnet50 import resnet50_forward_pallas

                return resnet50_forward_pallas(x, p, precision=precision)

        if mesh is None:
            self._fn = jax.jit(fwd)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            inner = shard_map(
                fwd,
                mesh=mesh,
                in_specs=(
                    P("data", None, None, None),
                    jax.tree.map(lambda _: P(), self._params),
                ),
                out_specs=P("data", None),
                check_vma=False,
            )
            self._fn = jax.jit(inner)

    @classmethod
    def from_case(cls, case, cfg, **kw) -> "ResNet50Engine":
        """Build from a flat make_resnet50_case dict (datagen)."""
        from winograd_tpu.models.resnet50 import resnet50_params

        return cls(resnet50_params(case, cfg), **kw)

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "ResNet50Engine":
        """The deployment end of the training pipeline: load a save_model
        checkpoint of TRAINED params (mode-19 parameterization), run the
        offline preprocessing (models/checkpoint.py::
        prepare_resnet50_serving — filter layouts, fused streams), serve."""
        from winograd_tpu.models.checkpoint import (
            load_model,
            prepare_resnet50_serving,
        )

        params, _ = load_model(path)
        return cls(prepare_resnet50_serving(params), **kw)

    @classmethod
    def from_torch(cls, sd_or_path, **kw) -> "ResNet50Engine":
        """Serve a torchvision-format ResNet-50/101/152 checkpoint: a
        state_dict (dict of tensors/arrays) or a .pt/.pth path. BN folding
        and every fused-kernel layout happen offline here
        (models/import_torch.py); depth is inferred from the state_dict."""
        from winograd_tpu.models.import_torch import (
            load_torch_checkpoint,
            resnet_serving_params_from_torch,
        )

        import os

        sd = (
            load_torch_checkpoint(os.fspath(sd_or_path))
            if isinstance(sd_or_path, (str, os.PathLike))
            else sd_or_path
        )
        return cls(resnet_serving_params_from_torch(sd), **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (224, 224, 3) or (N, 224, 224, 3) image(s); returns
        (num_classes,) / (N, num_classes) logits. Single images are run
        as N=1 so the mesh path sees a batch axis."""
        x = jnp.asarray(x, jnp.float32)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        out = self._fn(x, self._params)
        return out[0] if squeeze else out

    def classify(self, x: jax.Array) -> jax.Array:
        """Argmax class id(s) for image(s) x."""
        return jnp.argmax(self(x), axis=-1)

    def prepare_input(self, x: jax.Array) -> jax.Array:
        """The preprocessed-input serving contract, host side: raw
        image(s) -> the stem's s2d patch operand (kernels/stem.py::
        stem_prepare_input). Run this in the input pipeline (CPU) and
        serve via serve_pre — the device then never pays the ~50-65 us
        stem gather relayout. The offline-transform philosophy (the
        reference ships pre-transformed filters, data_generator.py:63-78)
        applied to the input side."""
        return _prepare_input(self.tier, x)

    def serve_pre(self, xb: jax.Array, img: int = 224) -> jax.Array:
        """Logits from a PREPARED operand (see prepare_input). Plain
        single-host serving only (f32/bf16w tiers; mesh partitions and
        the int8 tier take the raw-image route)."""
        from winograd_tpu.models.resnet50 import resnet50_forward_pre

        return _serve_pre(self, resnet50_forward_pre, xb, img)

    def throughput(self, batch: int, iters: int = 20, img: int = 224) -> Dict:
        """img must match the deployment image side (224 for the standard
        model) — the compiled program is shape-specific."""
        return _throughput(self, batch, 3, iters, img)


def _prepare_input(tier: str, x: jax.Array) -> jax.Array:
    from winograd_tpu.kernels.stem import stem_prepare_input

    prec = {"f32": "bf16x3", "bf16w": "bf16w", "int8": "bf16"}[tier]
    return stem_prepare_input(jnp.asarray(x, jnp.float32), precision=prec)


def _serve_pre(engine, forward_pre, xb: jax.Array, img: int) -> jax.Array:
    assert engine.mesh is None and engine.tier != "int8", (
        "serve_pre: plain f32/bf16w serving only"
    )
    key = (forward_pre.__name__, img)
    if getattr(engine, "_pre_key", None) != key:
        prec = "bf16w" if engine.tier == "bf16w" else None
        engine._pre_fn = jax.jit(
            lambda xb_, p: forward_pre(xb_, p, precision=prec, h=img, w=img)
        )
        engine._pre_key = key
    return engine._pre_fn(xb, engine._params)


class ResNetBasicEngine:
    """Serves the COMPLETE BASIC-block family (ResNet-18/34: image in,
    logits out) through the fused kernels — the deployment surface for
    bench modes 23/24.

    params: the models/basic.py forward structure ({"stem", "stages",
    "head"}, e.g. from basicnet_params(case, cfg)). tier selects the
    serving precision (f32 strict / bf16w / int8). With a mesh, inputs are
    batch-sharded over the "data" axis; partition="data" (default)
    replicates weights on every chip (the basic family's largest weight
    stream — conv 512x512x3x3, 9.4 MB f32 — is an order of magnitude under
    the bottleneck family's HBM-bound stages, so data parallelism is the
    scaling path that usually pays), partition="model" shards every
    block's 3x3 weights over the "model" axis (the per-BASIC-block
    Megatron recipe: column-parallel conv a, row-parallel conv b, ONE
    psum per block — parallel/tensor_parallel.py::make_basicnet_tp_fn),
    partition="pipe" runs the FLOP-balanced GPipe schedule over a
    ("pipe",) mesh. Every tier serves under every partition."""

    def __init__(self, params, tier: str = "f32", mesh=None, partition="data",
                 microbatch: int = 1):
        assert tier in ("f32", "bf16w", "int8"), tier
        assert partition in ("data", "model", "pipe"), partition
        self.tier = tier
        self.mesh = mesh
        if partition == "pipe":
            assert mesh is not None and "pipe" in mesh.axis_names, mesh
            from winograd_tpu.parallel import pipelined_basicnet_inference

            if tier == "int8":
                from winograd_tpu.models.basic import quantize_basicnet

                params = quantize_basicnet(params)
            prec = None if tier == "f32" else tier
            self._params = jax.tree.map(jnp.asarray, params)
            self._fn = lambda x, p: pipelined_basicnet_inference(
                mesh, p, x, microbatch=microbatch, precision=prec
            )
            return
        if partition == "model":
            assert mesh is not None, "partition='model' needs a mesh"
            from winograd_tpu.parallel import make_basicnet_tp_fn

            prec = None if tier == "f32" else tier
            tp_fn = make_basicnet_tp_fn(mesh, params, precision=prec)
            self._params = None
            self._fn = lambda x, p: tp_fn(x)
            return
        if mesh is None:
            dest = jax.devices()[0]
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dest = NamedSharding(mesh, P())
        if tier == "int8":
            from winograd_tpu.models.basic import quantize_basicnet

            self._params = jax.device_put(quantize_basicnet(params), dest)

            def fwd(x, p):
                from winograd_tpu.models.basic import basicnet_forward_int8

                return basicnet_forward_int8(x, p)
        else:
            precision = "bf16w" if tier == "bf16w" else None
            self._params = jax.device_put(
                jax.tree.map(jnp.asarray, params), dest
            )

            def fwd(x, p):
                from winograd_tpu.models.basic import basicnet_forward_pallas

                return basicnet_forward_pallas(x, p, precision=precision)

        if mesh is None:
            self._fn = jax.jit(fwd)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            inner = shard_map(
                fwd,
                mesh=mesh,
                in_specs=(
                    P("data", None, None, None),
                    jax.tree.map(lambda _: P(), self._params),
                ),
                out_specs=P("data", None),
                check_vma=False,
            )
            self._fn = jax.jit(inner)

    @classmethod
    def from_case(cls, case, cfg, **kw) -> "ResNetBasicEngine":
        """Build from a flat make_basicnet_case dict (datagen)."""
        from winograd_tpu.models.basic import basicnet_params

        return cls(basicnet_params(case, cfg), **kw)

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "ResNetBasicEngine":
        """Load a save_model checkpoint of TRAINED basic-family params
        (basicnet_forward_train's structure), run the offline preprocessing
        (models/checkpoint.py::prepare_basicnet_serving), serve."""
        from winograd_tpu.models.checkpoint import (
            load_model,
            prepare_basicnet_serving,
        )

        params, _ = load_model(path)
        return cls(prepare_basicnet_serving(params), **kw)

    @classmethod
    def from_torch(cls, sd_or_path, **kw) -> "ResNetBasicEngine":
        """Serve a torchvision-format ResNet-18/34 checkpoint: a state_dict
        (dict of tensors/arrays) or a .pt/.pth path. BN folding and every
        fused-kernel layout happen offline here (models/import_torch.py);
        depth is inferred from the state_dict."""
        import os

        from winograd_tpu.models.import_torch import (
            basicnet_serving_params_from_torch,
            load_torch_checkpoint,
        )

        sd = (
            load_torch_checkpoint(os.fspath(sd_or_path))
            if isinstance(sd_or_path, (str, os.PathLike))
            else sd_or_path
        )
        return cls(basicnet_serving_params_from_torch(sd), **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (H, W, 3) or (N, H, W, 3) image(s); returns (num_classes,) /
        (N, num_classes) logits. Single images run as N=1 so the mesh path
        sees a batch axis."""
        x = jnp.asarray(x, jnp.float32)
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        out = self._fn(x, self._params)
        return out[0] if squeeze else out

    def classify(self, x: jax.Array) -> jax.Array:
        """Argmax class id(s) for image(s) x."""
        return jnp.argmax(self(x), axis=-1)

    def prepare_input(self, x: jax.Array) -> jax.Array:
        """Preprocessed-input contract, host side (see
        ResNet50Engine.prepare_input)."""
        return _prepare_input(self.tier, x)

    def serve_pre(self, xb: jax.Array, img: int = 224) -> jax.Array:
        """Logits from a PREPARED operand (see prepare_input)."""
        from winograd_tpu.models.basic import basicnet_forward_pre

        return _serve_pre(self, basicnet_forward_pre, xb, img)

    def throughput(self, batch: int, iters: int = 20, img: int = 224) -> Dict:
        """img must match the deployment image side (224 for the standard
        model) — the compiled program is shape-specific."""
        return _throughput(self, batch, 3, iters, img)


def engine_from_torch(sd_or_path, **kw):
    """Serve ANY torchvision-format ResNet checkpoint: detects the block
    family from the state_dict (models/import_torch.py::resnet_family) and
    returns the matching engine — ResNet50Engine for bottleneck 50/101/152,
    ResNetBasicEngine for basic 18/34. kw passes through (tier, mesh, ...).
    """
    import os

    from winograd_tpu.models.import_torch import (
        load_torch_checkpoint,
        resnet_family,
    )

    sd = (
        load_torch_checkpoint(os.fspath(sd_or_path))
        if isinstance(sd_or_path, (str, os.PathLike))
        else sd_or_path
    )
    cls = {"bottleneck": ResNet50Engine, "basic": ResNetBasicEngine}[
        resnet_family(sd)
    ]
    return cls.from_torch(sd, **kw)


def _throughput(engine, batch: int, c_in: int, iters: int, hw: int) -> Dict:
    """Steady-state images/sec at the given batch size and feature-map
    side (hw must match the deployment shape — the compiled program is
    shape-specific). Inputs are random (representative ReLU sparsity,
    nothing constant-foldable), not zeros."""
    import time

    x = jax.random.normal(
        jax.random.PRNGKey(0), (batch, hw, hw, c_in), jnp.float32
    )
    out = engine(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [engine(x) for _ in range(iters)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    return {
        "batch": batch,
        "iters": iters,
        "images_per_sec": batch * iters / dt,
        "latency_ms": dt / iters * 1e3,
    }
