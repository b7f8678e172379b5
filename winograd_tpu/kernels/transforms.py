"""Winograd F(4x4, 3x3) transform matrices, in MXU-friendly Kronecker form.

The classic formulation (Lavin & Gray, "Fast Algorithms for Convolutional
Neural Networks") computes, per 6x6 input tile d and 3x3 filter g:

    Y = At @ [ (G g Gt)  *  (Bt d Bt^T) ] @ At^T          (4x4 outputs)

The reference applies Bt/At as two sequential 6-wide row/column passes per
tile inside hand-written CUDA (input transform: Kernel128_winograd.cu:26-120,
inverse: :123-183) and performs the filter transform offline in numpy
(data_generator.py:63-78).

On TPU we instead *vectorize the tile dimension* and turn both transforms
into single matmuls using the Kronecker identity

    vec(Bt d Bt^T) = (Bt ⊗ Bt) vec(d),
    vec(At M At^T) = (At ⊗ At) vec(M),

so the input transform is one (36, 36) x (36, C) MXU matmul per tile batch
and the inverse transform is one (16, 36) x (36, C) matmul — no shuffles,
no 6-row register passes, everything rides the systolic array. Convention
is cross-correlation (DL "conv"), matching the reference's cuDNN mode.
"""

from __future__ import annotations

import numpy as np

# --- Base F(4x4, 3x3) matrices (interpolation points 0, ±1, ±2, inf) -------

# Input transform Bt (6x6): V = Bt d Bt^T
BT = np.array(
    [
        [4, 0, -5, 0, 1, 0],
        [0, -4, -4, 1, 1, 0],
        [0, 4, -4, -1, 1, 0],
        [0, -2, -1, 2, 1, 0],
        [0, 2, -1, -2, 1, 0],
        [0, 4, 0, -5, 0, 1],
    ],
    dtype=np.float64,
)

# Filter transform G (6x3): U = G g G^T  (applied OFFLINE, like the
# reference's data_generator.py:63-78 — load-bearing for runtime speed).
G = np.array(
    [
        [1.0 / 4.0, 0.0, 0.0],
        [-1.0 / 6.0, -1.0 / 6.0, -1.0 / 6.0],
        [-1.0 / 6.0, 1.0 / 6.0, -1.0 / 6.0],
        [1.0 / 24.0, 1.0 / 12.0, 1.0 / 6.0],
        [1.0 / 24.0, -1.0 / 12.0, 1.0 / 6.0],
        [0.0, 0.0, 1.0],
    ],
    dtype=np.float64,
)

# Inverse transform At (4x6): Y = At M At^T
AT = np.array(
    [
        [1, 1, 1, 1, 1, 0],
        [0, 1, -1, 2, -2, 0],
        [0, 1, 1, 4, 4, 0],
        [0, 1, -1, 8, -8, 1],
    ],
    dtype=np.float64,
)

# --- F(2x2, 3x3) matrices (interpolation points 0, ±1, inf) ----------------
# The smaller tile trades more tile-GEMM rows (49 tiles on a 14x14 map vs 16)
# for less FLOP reduction — on the MXU the extra rows mean ~3x better
# systolic-array utilization per position, so both algebras are first-class
# and selectable per layer.

BT2 = np.array(
    [
        [1, 0, -1, 0],
        [0, 1, 1, 0],
        [0, -1, 1, 0],
        [0, 1, 0, -1],
    ],
    dtype=np.float64,
)

G2 = np.array(
    [
        [1.0, 0.0, 0.0],
        [0.5, 0.5, 0.5],
        [0.5, -0.5, 0.5],
        [0.0, 0.0, 1.0],
    ],
    dtype=np.float64,
)

AT2 = np.array(
    [
        [1, 1, 1, 0],
        [0, 1, -1, -1],
    ],
    dtype=np.float64,
)

ALPHA = 6  # F(4,3) input tile side (m + r - 1)
TILE_M = 4  # F(4,3) output tile side
TILE_R = 3  # filter side

_MATS = {4: (BT, G, AT), 2: (BT2, G2, AT2)}


def matrices(m: int = 4):
    """(Bt, G, At) for F(m x m, 3x3); m in {2, 4}."""
    if m not in _MATS:
        raise ValueError(f"unsupported Winograd tile size m={m}; choose 2 or 4")
    return _MATS[m]


def alpha(m: int = 4) -> int:
    return m + TILE_R - 1


# --- Kronecker (vectorized-tile) forms --------------------------------------

# (36, 36): vec(Bt d Bt^T) = BT_KRON @ vec(d)
BT_KRON = np.kron(BT, BT)
# (16, 36): vec(At M At^T) = AT_KRON @ vec(M)
AT_KRON = np.kron(AT, AT)


def bt_kron(dtype=np.float32, m: int = 4) -> np.ndarray:
    bt = matrices(m)[0]
    return np.kron(bt, bt).astype(dtype)


def at_kron(dtype=np.float32, m: int = 4) -> np.ndarray:
    at = matrices(m)[2]
    return np.kron(at, at).astype(dtype)


def transform_filter(w: np.ndarray, dtype=np.float32, m: int = 4) -> np.ndarray:
    """Offline Winograd filter transform: (Cout, Cin, 3, 3) -> (a^2, Cin, Cout).

    a = m + 2 (6 for F(4,3) -> 36 positions, 4 for F(2,3) -> 16 positions).
    Output layout is position-major with a (Cin, Cout) GEMM-ready matrix per
    tile position — the same layout the reference writes to disk
    (data_generator.py:72-75: offset = cin*Cout + cout, element-position-major),
    chosen so the per-position tile GEMM is V[p] (tiles, Cin) @ U[p]
    (Cin, Cout) with channels on the MXU lanes.
    """
    cout, cin, r, r2 = w.shape
    assert r == TILE_R and r2 == TILE_R, f"expected 3x3 filters, got {r}x{r2}"
    g = matrices(m)[1]
    a = alpha(m)
    # U[o, i] = G @ w[o, i] @ G^T : contract with einsum over both 3-dims.
    u = np.einsum("ar,oirs,bs->aboi", g, w.astype(np.float64), g)  # (a,a,Cout,Cin)
    u = u.reshape(a * a, cout, cin).transpose(0, 2, 1)  # (a^2, Cin, Cout)
    return np.ascontiguousarray(u.astype(dtype))


def fold_batchnorm(
    gamma: np.ndarray,
    beta: np.ndarray,
    mean: np.ndarray,
    var: np.ndarray,
    eps: float = 1e-5,
    dtype=np.float32,
):
    """Offline BN(inference) folding into one FMA: y = scale*x + bias.

    scale = gamma / sqrt(var + eps); bias = beta - gamma*mean/sqrt(var + eps)
    (reference: data_generator.py:41-47,107-113).
    """
    inv_std = 1.0 / np.sqrt(var.astype(np.float64) + eps)
    scale = gamma.astype(np.float64) * inv_std
    bias = beta.astype(np.float64) - gamma.astype(np.float64) * mean.astype(np.float64) * inv_std
    return scale.astype(dtype), bias.astype(dtype)
