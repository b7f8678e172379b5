"""Fused 1x1 conv + folded-BN (+ ReLU) as one parameterized Pallas TPU kernel.

Replaces the reference's four hand-written CUDA kernels (kernel_512_one_128,
kernel_128_one_512, kernel_1024_one_256, kernel_256_one_1024 —
/root/reference/Kernel128_one.cu:24-54,244-273, Kernel256_one.cu:26-56,
246-274) with ONE kernel parameterized over (Cin, Cout, relu).

Design (TPU-first, not a translation):
* A 1x1 conv over NHWC activations is exactly a GEMM
  X[(N*H*W), Cin] @ W[Cin, Cout] — the MXU-native shape. The reference's
  "line"-blocked shared-memory outer-product strategy is a SIMT workaround;
  on TPU we hand the MXU full 128x128-aligned tiles and let Mosaic schedule.
* The folded-BN FMA and the optional ReLU live in the kernel epilogue, so
  activations make exactly one HBM round trip (like the reference's fusion).
* Grid tiles rows (pixels), output channels, and the contraction dim, with
  f32 accumulation directly in the output VMEM block (the k-dim is the
  innermost grid axis, so each output block is revisited consecutively).
* The ReLU asymmetry of the reference is preserved via the static `relu`
  flag: expand layers (->512 / ->1024) apply BN only
  (/root/reference/Kernel128_one.cu:271-272, Kernel256_one.cu:273).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b


def largest_divisor_leq(n: int, cap: int) -> int:
    """Largest divisor of n that is <= cap (>= 1). Auto tile selection must
    DIVIDE the dimension, not merely bound it — cout=768 with a blind
    min(cout, 512) cap would crash the grid math."""
    for d in range(min(n, cap), 0, -1):
        if n % d == 0:
            return d
    return 1


def mxu_lane_divisor(n: int, cap: int) -> int:
    """Largest divisor of n <= cap that Mosaic lowers as a MINOR-dim block
    size: a multiple of the 128-lane tile, or n itself. A minor-dim block
    that is neither (e.g. 288 for n=576) crashes the TPU lowering ("last
    two dimensions of your block shape [must be] divisible by 8 and 128
    respectively, or be equal to the respective dimensions"), so when n has
    no lane-multiple divisor under the cap the whole dim is the only valid
    choice — n=576=2**6*9 from a 9*Cin im2col width must stay untiled."""
    if n <= cap:
        return n
    for d in range(cap - cap % 128, 0, -128):
        if n % d == 0:
            return d
    return n


def _matmul_bn_kernel(
    x_ref, w_ref, scale_ref, bias_ref, out_ref, *, relu: bool, n_k: int, precision: str
):
    """One (TILE_P, TILE_K) x (TILE_K, TILE_N) MXU step with fused epilogue."""
    from winograd_tpu.kernels.direct import split_dot

    if n_k == 1:
        # Single contraction step: write the epilogue result directly, no
        # zero-init / accumulate passes over the output VMEM block (three
        # block-sized VMEM traversals become one — measurable at the
        # reference's 196-pixel layer sizes).
        y = split_dot(x_ref[:], w_ref[:], precision) * scale_ref[:] + bias_ref[:]
        out_ref[:] = jnp.maximum(y, 0.0) if relu else y
        return

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += split_dot(x_ref[:], w_ref[:], precision)

    @pl.when(k == n_k - 1)
    def _epilogue():
        y = out_ref[:] * scale_ref[:] + bias_ref[:]
        out_ref[:] = jnp.maximum(y, 0.0) if relu else y


@functools.partial(
    jax.jit,
    static_argnames=("relu", "tile_p", "tile_n", "tile_k", "interpret", "precision"),
)
def _conv1x1_bn_2d(
    x2d: jax.Array,
    w: jax.Array,
    scale2d: jax.Array,
    bias2d: jax.Array,
    relu: bool,
    tile_p: int,
    tile_n: int,
    tile_k: int,
    interpret: bool,
    precision: str,
) -> jax.Array:
    p_pad, cin = x2d.shape
    cout = w.shape[1]
    n_p, n_n, n_k = p_pad // tile_p, cout // tile_n, cin // tile_k

    grid = (n_p, n_n, n_k)
    kernel = functools.partial(_matmul_bn_kernel, relu=relu, n_k=n_k, precision=precision)
    flops = 2 * p_pad * cin * cout
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_p, tile_k), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, tile_n), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_p, tile_n), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p_pad, cout), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (p_pad * cin + cin * cout + p_pad * cout),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, w, scale2d, bias2d)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "tile_p", "tile_n", "tile_k", "interpret", "precision"),
)
def conv1x1_bn_pallas(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    relu: bool,
    *,
    tile_p: int | None = None,
    tile_n: int | None = None,
    tile_k: int | None = None,
    interpret: bool | None = None,
    precision: str = "bf16x3",
) -> jax.Array:
    """Fused pointwise conv + BN (+ReLU).

    Default precision "bf16x3" is f32-faithful to ~1e-5 for unit-scale data
    (see kernels/direct.py:split_dot); pass "highest" for strict f32.

    x: (..., Cin) float32 (any leading dims, e.g. (H, W) or (N, H, W));
    w: (Cin, Cout) — the reference's on-disk weight layout
       (/root/reference/data_generator.py:86-89);
    scale, bias: (Cout,) offline-folded BN parameters.
    Returns x.shape[:-1] + (Cout,) float32.
    """
    cin, cout = w.shape
    assert x.shape[-1] == cin, f"x channels {x.shape[-1]} != weight Cin {cin}"
    lead = x.shape[:-1]
    p = 1
    for d in lead:
        p *= d
    # precision="bf16" keeps a bfloat16 activation matrix bfloat16 end to
    # end (half the HBM stream; the int8-tier stem route).
    x2d = x.reshape(p, cin).astype(
        jnp.bfloat16 if precision == "bf16" else jnp.float32
    )

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # Tile selection: MXU-aligned, sized so a (tile_p, tile_k) + (tile_k,
    # tile_n) + (tile_p, tile_n) working set stays a few MB of VMEM.
    # When all rows fit one tile, the block row dim is p ITSELF (legal for
    # Mosaic: equal-to-dim needs no 8-multiple) — the XLA pad before the
    # kernel and the out[:p] slice after it both disappear, and the kernel
    # touches only live rows (measured on the reference's 196-row cases:
    # mode 2 1.68 -> 1.47 us, mode 3 2.14 -> 2.08 us).
    tp = tile_p or (p if p <= 512 else min(_round_up(p, 128), 512))
    tn = tile_n or mxu_lane_divisor(cout, 512)
    tk = tile_k or mxu_lane_divisor(cin, 512)
    assert cout % tn == 0 and cin % tk == 0, (cin, cout, tn, tk)

    p_pad = _round_up(p, tp)
    if p_pad != p:
        x2d = jnp.pad(x2d, ((0, p_pad - p), (0, 0)))

    out = _conv1x1_bn_2d(
        x2d,
        w.astype(
            jnp.bfloat16 if precision in ("bf16w", "bf16") else jnp.float32
        ),
        scale.reshape(1, cout).astype(jnp.float32),
        bias.reshape(1, cout).astype(jnp.float32),
        relu,
        tp,
        tn,
        tk,
        interpret,
        precision,
    )
    return out[:p].reshape(*lead, cout)
