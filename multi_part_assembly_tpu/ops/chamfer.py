"""Chamfer distance: the hottest op in the framework.

TPU-native replacement for the reference's CUDA extension
(reference: multi_part_assembly/utils/chamfer/cuda/chamfer_kernel.cu:32-95
forward shared-memory tiled min-scan; :176-210 atomicAdd backward;
multi_part_assembly/utils/chamfer/chamfer.py:36-64 public API).

Design notes (TPU), in order of impact:
  - **Part-structured kernels** (`chamfer_parts` / `chamfer_diag`): valid
    parts are a prefix of the padded part axis, so a scalar-prefetched part
    count lets the kernel loop only over valid part pairs -- the reference
    instead pushed padded parts 1e3 away and brute-forced the full
    (P*N)^2 distance field (loss.py:172-182).
  - **Transposed layout**: points ride the 128-lane axis ([..., 8, Npad]
    blocks); a [N, 3] block would waste 125/128 lanes of VMEM.
  - **One distance pass, both directions**: each tile's row-min updates
    dist1 and its col-min updates dist2 (the CUDA kernel ran the O(N^2)
    scan twice, chamfer_kernel.cu:135-173).
  - **Split-packed distance matmul**: |x - y|^2 is augmented into a K=8
    inner product, whose operands are 3-term bf16 mantissa splits packed
    along K (K=48) -- f32-exact in ONE bf16 MXU pass, ~6x cheaper than a
    HIGHEST f32 matmul, because a K <= 128 contraction costs one pass
    regardless of K (see `_pack_x48`).
  - **Grouped part-pair tiles**: the forward processes gy y-parts per MXU
    tile ([Npad, gy*Npad] from a lane-packed VMEM scratch) -- same FLOPs,
    ~gy x fewer loop-iteration overheads (measured ~2us per fori_loop
    iteration at p=20).
  - **Triangle-inequality tile pruning (exact)**: the forward visits a
    scalar-prefetched (x-part, y-group) tile list built in XLA from
    per-part centroids and radii -- a tile is dropped only when its
    lower-bound distance |c_i - c_j| - r_i - r_j strictly exceeds the
    upper bound min_k(|c_i - c_k| + r_i + r_k) of EVERY part it could
    serve, so dropped tiles provably contain no point's nearest neighbor
    (nor an exact tie).  Kept tiles run in ascending scan order: values,
    witnesses, and the CUDA first-hit tie rule are bit-identical to the
    unpruned kernel.  Assembled shapes (parts spread out) skip most
    off-diagonal tiles; fully-overlapping clouds degrade gracefully to
    the dense visit order (see `_forward_pairs`).
  - **Exact-witness backward, no scatter, no recompute**: the forward
    records each point's flat witness index (first hit in scan order, the
    CUDA tie rule); the backward builds scatter weights from a pure iota
    compare and accumulates both directions' gradients through two skinny
    MXU matmuls (the CUDA backward scattered with atomicAdd,
    chamfer_kernel.cu:203-208; XLA scatter was 3x slower).  It visits only
    witness-linked (part, group) tiles, listed in XLA and scalar-prefetched
    to SMEM (an in-kernel relevance scan cost ~6.5us per SKIPPED pair).
  - The min values stay f32-accurate (the 0.01 part-accuracy threshold
    needs it; the CUDA ext pinned f32 via AMP `custom_fwd`, chamfer.py:14);
    only the backward's gradient accumulation runs in bf16
    (`BWD_ACC_PRECISION`).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; tests run in interpret mode
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

__all__ = ['chamfer_distance', 'nn_distance', 'chamfer_distance_ref',
           'set_fused_mode', 'set_prune_mode']

_PAD_VAL = 1e6  # padding coordinate: far from everything, no f32 overflow

# precision of the backward witness-accumulation matmuls.  DEFAULT (one
# bf16 MXU pass) gives ~0.7% relative gradient error -- below minibatch
# noise and comparable to the reference's fp16 AMP training -- at ~6x the
# speed of HIGHEST.  Flip to jax.lax.Precision.HIGHEST for bitwise-faithful
# parity studies.
BWD_ACC_PRECISION = None  # None == DEFAULT


# ---------------------------------------------------------------------------
# pure-jnp reference (used for testing and tiny inputs)
# ---------------------------------------------------------------------------


def _pairwise_sqdist(x, y):
    """[B, N1, 3] x [B, N2, 3] -> [B, N1, N2] squared distances (f32 exact)."""
    x2 = jnp.sum(x * x, axis=-1)
    y2 = jnp.sum(y * y, axis=-1)
    xy = jax.lax.dot_general(
        x, y, (((2, ), (2, )), ((0, ), (0, ))),
        precision=jax.lax.Precision.HIGHEST)
    return x2[:, :, None] + y2[:, None, :] - 2.0 * xy


def chamfer_distance_ref(xyz1, xyz2):
    """Naive full-matrix chamfer; returns (dist1, idx1, dist2, idx2)."""
    d = _pairwise_sqdist(xyz1, xyz2)
    dist1 = jnp.min(d, axis=2)
    idx1 = jnp.argmin(d, axis=2).astype(jnp.int32)
    dist2 = jnp.min(d, axis=1)
    idx2 = jnp.argmin(d, axis=1).astype(jnp.int32)
    return dist1, idx1, dist2, idx2


# ---------------------------------------------------------------------------
# pallas tiled forward
# ---------------------------------------------------------------------------


def _nn_kernel(xt_ref, yt_ref, dist_ref, idx_ref, *, tn, n2):
    """One (batch, x-tile) program: nearest-neighbor dist/argmin into y.

    xt_ref: [1, 8, TM]  (3 coordinate rows, sublane-padded to 8)
    yt_ref: [1, 8, N2]
    dist_ref: [1, 8, TM] f32;  idx_ref: [1, 8, TM] i32 (row 0 is the result;
    the 8-row sublane padding satisfies TPU tiling)
    """
    xt = xt_ref[0, :3, :]  # [3, TM]
    x2 = jnp.sum(xt * xt, axis=0)  # [TM]
    tm = xt.shape[-1]
    n_chunks = n2 // tn

    def body(j, carry):
        best, best_idx = carry
        yj = yt_ref[0, :3, pl.ds(j * tn, tn)]  # [3, TN]
        y2 = jnp.sum(yj * yj, axis=0)  # [TN]
        cross = jax.lax.dot_general(
            xt, yj, (((0, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # [TM, TN]
        d = x2[:, None] + y2[None, :] - 2.0 * cross
        chunk_min = jnp.min(d, axis=1)
        chunk_arg = jnp.argmin(d, axis=1).astype(jnp.int32) + j * tn
        take = chunk_min < best
        return (jnp.where(take, chunk_min, best),
                jnp.where(take, chunk_arg, best_idx))

    init = (jnp.full((tm, ), jnp.inf, jnp.float32),
            jnp.zeros((tm, ), jnp.int32))
    best, best_idx = jax.lax.fori_loop(0, n_chunks, body, init)
    dist_ref[0, 0, :] = jnp.maximum(best, 0.0)  # clamp fp cancellation noise
    idx_ref[0, 0, :] = best_idx


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=('interpret', ))
def _nn_direction_pallas(x, y, interpret=False):
    """dist/idx of nearest y for each x.  x: [B, N1, 3], y: [B, N2, 3]."""
    B, N1, _ = x.shape
    N2 = y.shape[1]
    TM = 512 if N1 >= 512 else _round_up(N1, 128)
    TN = 1024 if N2 >= 1024 else _round_up(N2, 128)
    N1p = _round_up(N1, TM)
    N2p = _round_up(N2, TN)

    # transpose to [B, 8, N] (sublane-pad 3 -> 8) and pad the point axis
    def prep(p, npad):
        pt = jnp.swapaxes(p, 1, 2)  # [B, 3, N]
        pt = jnp.pad(pt, ((0, 0), (0, 5), (0, npad - p.shape[1])),
                     constant_values=_PAD_VAL)
        return pt

    xt = prep(x, N1p)
    yt = prep(y, N2p)

    grid = (B, N1p // TM)
    dist, idx = pl.pallas_call(
        functools.partial(_nn_kernel, tn=TN, n2=N2p),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, TM), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 8, N2p), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, TM), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 8, TM), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, N1p), jnp.float32),
            jax.ShapeDtypeStruct((B, 8, N1p), jnp.int32),
        ],
        interpret=interpret,
    )(xt, yt)
    return dist[:, 0, :N1], jnp.minimum(idx[:, 0, :N1], N2 - 1)


def _nn_direction(x, y, interpret=False):
    """Dispatch: pallas on TPU-shaped problems, jnp reference otherwise."""
    N1, N2 = x.shape[1], y.shape[1]
    on_tpu = jax.default_backend() == 'tpu' or any(
        d.platform == 'tpu' for d in jax.devices()) if not interpret else False
    if interpret or (on_tpu and N1 * N2 >= 128 * 128):
        return _nn_direction_pallas(x, y, interpret=interpret)
    d = _pairwise_sqdist(x, y)
    return jnp.maximum(jnp.min(d, axis=2), 0.0), \
        jnp.argmin(d, axis=2).astype(jnp.int32)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _chamfer(xyz1, xyz2):
    dist1, _ = _nn_direction(xyz1, xyz2)
    dist2, _ = _nn_direction(xyz2, xyz1)
    return dist1, dist2


def _chamfer_fwd(xyz1, xyz2):
    dist1, idx1 = _nn_direction(xyz1, xyz2)
    dist2, idx2 = _nn_direction(xyz2, xyz1)
    return (dist1, dist2), (xyz1, xyz2, idx1, idx2)


def _chamfer_bwd(res, grads):
    xyz1, xyz2, idx1, idx2 = res
    g1, g2 = grads  # [B, N1], [B, N2]
    # direction 1: dist1_i = |x_i - y_{idx1_i}|^2
    y_w = jnp.take_along_axis(xyz2, idx1[..., None], axis=1)  # [B, N1, 3]
    diff1 = 2.0 * g1[..., None] * (xyz1 - y_w)
    # direction 2: dist2_j = |y_j - x_{idx2_j}|^2
    x_w = jnp.take_along_axis(xyz1, idx2[..., None], axis=1)  # [B, N2, 3]
    diff2 = 2.0 * g2[..., None] * (xyz2 - x_w)

    dx = diff1
    dy = diff2
    # scatter-add the witness-side contributions (CUDA atomicAdd equivalent,
    # chamfer_kernel.cu:203-208)
    dy = dy + jnp.zeros_like(xyz2).at[
        jnp.arange(xyz1.shape[0])[:, None], idx1].add(-diff1)
    dx = dx + jnp.zeros_like(xyz1).at[
        jnp.arange(xyz2.shape[0])[:, None], idx2].add(-diff2)
    return dx, dy


_chamfer.defvjp(_chamfer_fwd, _chamfer_bwd)


# ---------------------------------------------------------------------------
# part-structured chamfer: skips padded parts entirely
# ---------------------------------------------------------------------------
#
# The reference's `shape_cd_loss` (utils/loss.py:141-202) computes a dense
# [B, P*N, P*N] chamfer after pushing padded parts 1e3 away.  Since valid
# parts are always a *prefix* of the P axis (both datasets left-pack parts),
# a TPU kernel can instead loop only over the `n_parts[b]` valid parts via a
# scalar-prefetched part count -- typical Breaking-Bad shapes use 2-8 of 20
# slots, so this skips >80% of the O((P*N)^2) work with identical masked
# semantics.


def _aug_x(p, npad):
    """[B, P, N, 3] -> [B, P, 8, Npad] rows (x, y, z, 1, |p|^2, 0...).

    Paired with _aug_y so the K=8 matmul yields the FULL squared distance
    |x|^2 + |y|^2 - 2 x.y directly (no per-pair epilogue adds)."""
    B, P, N, _ = p.shape
    pt = jnp.swapaxes(p, 2, 3)  # [B, P, 3, N]
    pt = jnp.pad(pt, ((0, 0), (0, 0), (0, 0), (0, npad - N)),
                 constant_values=_PAD_VAL)
    ones = jnp.ones((B, P, 1, npad), pt.dtype)
    sq = jnp.sum(pt * pt, axis=2, keepdims=True)
    zeros = jnp.zeros((B, P, 3, npad), pt.dtype)
    return jnp.concatenate([pt, ones, sq, zeros], axis=2)


def _aug_y(p, npad):
    """[B, P, N, 3] -> [B, P, 8, Npad] rows (-2x, -2y, -2z, |p|^2, 1, 0...)."""
    B, P, N, _ = p.shape
    pt = jnp.swapaxes(p, 2, 3)
    pt = jnp.pad(pt, ((0, 0), (0, 0), (0, 0), (0, npad - N)),
                 constant_values=_PAD_VAL)
    sq = jnp.sum(pt * pt, axis=2, keepdims=True)  # [B, P, 1, Npad]
    ones = jnp.ones((B, P, 1, npad), pt.dtype)
    zeros = jnp.zeros((B, P, 3, npad), pt.dtype)
    return jnp.concatenate([-2.0 * pt, sq, ones, zeros], axis=2)


def _nn_parts_kernel(nparts_ref, x_ref, y_ref, dist_ref, idx_ref, *, npad,
                     max_parts):
    """Per-(batch, part) nearest neighbor across all valid parts of y.

    x_ref: [1, 1, 8, Npad] augmented query part
    y_ref: [1, P, 8, Npad] all augmented target parts of this batch element
    dist_ref/idx_ref: [1, 1, 8, Npad] (row 0 valid)
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    n_p = nparts_ref[b]

    @pl.when(i >= n_p)
    def _():
        dist_ref[0, 0, 0, :] = jnp.zeros((npad, ), jnp.float32)
        idx_ref[0, 0, 0, :] = jnp.zeros((npad, ), jnp.int32)

    @pl.when(i < n_p)
    def _():
        xa = x_ref[0, 0]  # [8, Npad] augmented rows
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)

        def body(j, carry):
            best, best_idx = carry
            ya = y_ref[0, j]  # [8, Npad] augmented rows
            # chunk[m, n] = |x_m - y_n|^2 (full distance via augmentation)
            chunk = jax.lax.dot_general(
                xa, ya, (((0, ), (0, )), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            m = jnp.min(chunk, axis=1)
            local = jnp.min(
                jnp.where(chunk == m[:, None], col_ids, npad), axis=1)
            gidx = (j * npad + local).astype(jnp.int32)
            take = m < best
            return (jnp.where(take, m, best),
                    jnp.where(take, gidx, best_idx))

        init = (jnp.full((npad, ), jnp.inf, jnp.float32),
                jnp.zeros((npad, ), jnp.int32))
        best, best_idx = jax.lax.fori_loop(0, n_p, body, init)
        dist_ref[0, 0, 0, :] = jnp.maximum(best, 0.0)
        idx_ref[0, 0, 0, :] = best_idx


@functools.partial(jax.jit, static_argnames=('interpret', ))
def _nn_parts_pallas(x, y, n_parts, interpret=False):
    """Part-structured NN search.

    Args:
        x: [B, P, N, 3] query parts;  y: [B, P, N, 3] target parts
        n_parts: [B] int32 number of valid (prefix) parts

    Returns:
        dist: [B, P, N] squared NN distance (0 for invalid parts)
        idx:  [B, P, N] flat index into y viewed as [B, P*Npad, 3] (Npad-padded)
    """
    B, P, N, _ = x.shape
    npad = _round_up(N, 128)
    xa = _aug_x(x.astype(jnp.float32), npad)
    ya = _aug_y(y.astype(jnp.float32), npad)

    on_tpu = any(d.platform == 'tpu' for d in jax.devices())
    if _HAS_PLTPU and on_tpu and not interpret:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, P),
            in_specs=[
                pl.BlockSpec((1, 1, 8, npad), lambda b, i, nref: (b, i, 0, 0)),
                pl.BlockSpec((1, P, 8, npad), lambda b, i, nref: (b, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, 8, npad), lambda b, i, nref: (b, i, 0, 0)),
                pl.BlockSpec((1, 1, 8, npad), lambda b, i, nref: (b, i, 0, 0)),
            ],
        )
        dist, idx = pl.pallas_call(
            functools.partial(
                _nn_parts_kernel, npad=npad, max_parts=P),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B, P, 8, npad), jnp.float32),
                jax.ShapeDtypeStruct((B, P, 8, npad), jnp.int32),
            ],
            interpret=interpret,
        )(n_parts.astype(jnp.int32), xa, ya)
    else:
        # interpret path: PrefetchScalarGridSpec is TPU-only; emulate with
        # grid-free masked jnp (same math) for CPU testing
        return _nn_parts_ref(x, y, n_parts, npad)
    return dist[:, :, 0, :N], idx[:, :, 0, :N]


def _nn_parts_ref(x, y, n_parts, npad=None):
    """jnp reference for the part-structured NN (used on CPU / in tests)."""
    B, P, N, _ = x.shape
    npad = npad or N
    part_valid = jnp.arange(P)[None, :] < n_parts[:, None]  # [B, P]
    yf = y.reshape(B, P * N, 3)
    point_valid = jnp.repeat(part_valid, N, axis=1)  # [B, P*N]
    d = _pairwise_sqdist(x.reshape(B, P * N, 3), yf)  # [B, P*N, P*N]
    d = jnp.where(point_valid[:, None, :], d, jnp.inf)
    dist = jnp.min(d, axis=2)
    idx = jnp.argmin(d, axis=2).astype(jnp.int32)
    # remap flat [P*N] index to the [P*Npad] convention of the pallas kernel
    idx = (idx // N) * npad + idx % N
    dist = jnp.where(point_valid, jnp.maximum(dist, 0.0), 0.0)
    idx = jnp.where(point_valid, idx, 0)
    return dist.reshape(B, P, N), idx.reshape(B, P, N)


# --- fused dual-direction kernels -----------------------------------------
#
# The production path: ONE pass over valid part-pair chunks computes both
# chamfer directions (row-min and col-min of the same distance tile), and
# the backward recomputes the tiles and identifies witnesses by comparing
# against the saved min values -- gradients accumulate through two skinny
# MXU matmuls per tile instead of an XLA scatter (the CUDA reference used
# atomicAdd, chamfer_kernel.cu:203-208).  On exact distance ties the
# gradient is split evenly among witnesses (the CUDA kernel picks the first
# scan hit; ties are measure-zero for real data).


def _split3(aug):
    """f32 -> three bf16 terms covering 8+8+8 mantissa bits (~f32 exact).

    Truncating splits are built by bitcast mantissa masking: under
    --xla_allow_excess_precision (set in this runtime) XLA may elide a
    plain f32->bf16 rounding, which would zero the tail terms."""

    def trunc8(v):
        bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32)

    a1f = trunc8(aug)
    r1 = aug - a1f
    a2f = trunc8(r1)
    a3 = (r1 - a2f).astype(jnp.bfloat16)
    return a1f.astype(jnp.bfloat16), a2f.astype(jnp.bfloat16), a3


def _pack_x48(aug):
    """[B, P, 8, Npad] f32 -> [B, P, 48, Npad] bf16.

    With X48 = [a1,a1,a1,a2,a2,a3] and Y48 = [b1,b2,b3,b1,b2,b1], one bf16
    MXU pass of X48^T Y48 (f32 accumulation) sums the 6 significant
    cross-products of the 3-term splits -- f32 x f32 accuracy to ~2^-24
    relative (the dropped terms are <= 2^-32).  On the MXU a K <= 128
    contraction costs one pass regardless of K, so this is ~6x cheaper
    than a HIGHEST (6-pass) f32 matmul of the same shape."""
    a1, a2, a3 = _split3(aug)
    return jnp.concatenate([a1, a1, a1, a2, a2, a3], axis=2)


def _pack_y48(aug):
    b1, b2, b3 = _split3(aug)
    return jnp.concatenate([b1, b2, b3, b1, b2, b1], axis=2)


def _pick_gy(max_parts, npad):
    """Y-group width for the fused forward: the largest divisor of P (<= 8)
    whose [Npad, gy*Npad] f32 tile fits a ~24MB VMEM budget.  Grouping
    amortizes the ~2us per-loop-iteration overhead over one big MXU tile.
    MPA_CHAMFER_GY overrides (bench knob; must divide P and fit VMEM)."""
    budget = 24 * 1024 * 1024
    env = os.environ.get('MPA_CHAMFER_GY')
    if env:
        g = int(env)
        # validate against the SAME constraints as the auto pick: a
        # non-divisor breaks the grid math and an over-budget tile fails
        # at Mosaic compile (or silently degrades) -- warn and fall
        # through to auto instead (ADVICE r4).
        if max_parts % g == 0 and g * npad * npad * 4 <= budget:
            return g
        import warnings
        warnings.warn(
            f'MPA_CHAMFER_GY={g} ignored: must divide max_parts='
            f'{max_parts} and fit the {budget >> 20}MB VMEM budget '
            f'(tile would be {g * npad * npad * 4 >> 20}MB)')
    best = 1
    for g in range(1, min(max_parts, 8) + 1):
        if max_parts % g == 0 and g * npad * npad * 4 <= budget:
            best = g
    return best


def _finalize_parts(n_p, d1_ref, d2_ref, w1_ref, w2_ref, npad, max_parts):
    """Clamp fp noise at 0; zero dists / -1 witnesses at invalid parts."""
    part_valid = jax.lax.broadcasted_iota(
        jnp.int32, (max_parts, npad), 0) < n_p
    d1_ref[0, :, 0, :] = jnp.where(
        part_valid, jnp.maximum(d1_ref[0, :, 0, :], 0.0), 0.0)
    d2_ref[0, :, 0, :] = jnp.where(
        part_valid, jnp.maximum(d2_ref[0, :, 0, :], 0.0), 0.0)
    w1_ref[0, :, 0, :] = jnp.where(part_valid, w1_ref[0, :, 0, :], -1)
    w2_ref[0, :, 0, :] = jnp.where(part_valid, w2_ref[0, :, 0, :], -1)


def _fused_parts_fwd_kernel(plist_ref, x_ref, y_ref, d1_ref, d2_ref,
                            w1_ref, w2_ref, yscr_ref, *, npad, max_parts,
                            gy):
    """Grid (B,).  x_ref/y_ref: [1, P, 48, Npad] split-packed bf16 parts
    (invalid parts pre-pushed to _PAD_VAL by the packing step, so no
    in-kernel validity masking is needed -- pad-coordinate distances are
    ~1e12 and never win a min against real points).
    plist_ref[b] = [n_p, n_rel, pid_0, pid_1, ...] scalar-prefetched tile
    list (pid = i * (P//gy) + c, ascending -- scan order preserved), built
    by `_forward_pairs` with exact triangle-inequality pruning (or the
    dense list when pruning is off).
    d1_ref/d2_ref: [1, P, 8, Npad] f32, row 0 = min squared distance.
    w1_ref/w2_ref: [1, P, 8, Npad] i32, row 0 = FLAT witness index into
    the other cloud viewed as [P*Npad] (first hit in scan order, exactly
    the CUDA kernel's tie rule, chamfer_kernel.cu:32-95).  Exact indices
    let the backward build its scatter weights from an iota compare --
    no distance recompute, no equality masks, no tie normalization.
    yscr_ref: [P/gy, 48, gy*Npad] bf16 VMEM scratch -- y parts lane-packed
    into groups once per program; each (x-part, y-group) pair is then ONE
    [Npad, gy*Npad] MXU tile instead of gy small ones (amortizes the ~2us
    per-loop-iteration overhead)."""
    b = pl.program_id(0)
    n_p = plist_ref[b, 0]
    n_rel = plist_ref[b, 1]
    BIG = jnp.float32(1e30)

    d1_ref[0, :, 0, :] = jnp.full((max_parts, npad), BIG, jnp.float32)
    d2_ref[0, :, 0, :] = jnp.full((max_parts, npad), BIG, jnp.float32)
    w1_ref[0, :, 0, :] = jnp.full((max_parts, npad), -1, jnp.int32)
    w2_ref[0, :, 0, :] = jnp.full((max_parts, npad), -1, jnp.int32)

    for c0 in range(max_parts // gy):  # lane-pack y groups (VMEM copies)
        yscr_ref[c0] = jnp.concatenate(
            [y_ref[0, c0 * gy + r] for r in range(gy)], axis=1)

    n_groups = max_parts // gy

    def pair_body(k, _):
        pid = plist_ref[b, 2 + k]
        i = pid // n_groups
        c = pid - i * n_groups
        x48 = x_ref[0, i]  # [48, Npad] bf16 split-packed
        # one bf16 MXU pass = full |x - y|^2 in f32 accuracy (see _pack_x48)
        # for gy parts at once
        d = jax.lax.dot_general(
            x48, yscr_ref[c], (((0, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)  # [Npad, gy*Npad]
        # row min + witness column: argmin returns the FIRST minimum index,
        # exactly the CUDA scan's tie rule (chamfer_kernel.cu:32-95) --
        # one fused reduction instead of the eq/where/min sequence that
        # cost ~37% of round-2 forward time (ROADMAP item 2)
        base = c * gy * npad
        m = jnp.min(d, axis=1)  # [Npad]
        midx = jnp.argmin(d, axis=1).astype(jnp.int32) + base
        take1 = m < d1_ref[0, i, 0, :]
        d1_ref[0, i, 0, :] = jnp.where(take1, m, d1_ref[0, i, 0, :])
        w1_ref[0, i, 0, :] = jnp.where(take1, midx, w1_ref[0, i, 0, :])
        # column minima + first-hit witness row
        cm = jnp.min(d, axis=0)  # [gy*Npad]
        am = jnp.argmin(d, axis=0).astype(jnp.int32) + i * npad
        for r in range(gy):
            j = c * gy + r
            cmr = cm[r * npad:(r + 1) * npad]
            take2 = cmr < d2_ref[0, j, 0, :]
            d2_ref[0, j, 0, :] = jnp.where(take2, cmr, d2_ref[0, j, 0, :])
            w2_ref[0, j, 0, :] = jnp.where(
                take2, am[r * npad:(r + 1) * npad], w2_ref[0, j, 0, :])
        return 0

    jax.lax.fori_loop(0, n_rel, pair_body, 0)
    _finalize_parts(n_p, d1_ref, d2_ref, w1_ref, w2_ref, npad, max_parts)


def _fused_diag_fwd_kernel(nparts_ref, x_ref, y_ref, d1_ref, d2_ref,
                           w1_ref, w2_ref, *, npad, max_parts):
    """Diagonal mode: part i of x pairs only with part i of y (per-part
    chamfer, reference loss.py:113-138 / eval_utils.py:12-46).  Linear in
    n_p, so no grouping.  Witness indices are flat (i*Npad + local)."""
    b = pl.program_id(0)
    n_p = nparts_ref[b]
    BIG = jnp.float32(1e30)

    d1_ref[0, :, 0, :] = jnp.full((max_parts, npad), BIG, jnp.float32)
    d2_ref[0, :, 0, :] = jnp.full((max_parts, npad), BIG, jnp.float32)
    w1_ref[0, :, 0, :] = jnp.full((max_parts, npad), -1, jnp.int32)
    w2_ref[0, :, 0, :] = jnp.full((max_parts, npad), -1, jnp.int32)

    def pair_body(i, _):
        x48 = x_ref[0, i]
        y48 = y_ref[0, i]
        d = jax.lax.dot_general(
            x48, y48, (((0, ), (0, )), ((), ())),
            preferred_element_type=jnp.float32)
        # argmin = first minimum index, the CUDA first-hit tie rule
        d1_ref[0, i, 0, :] = jnp.min(d, axis=1)
        w1_ref[0, i, 0, :] = jnp.argmin(d, axis=1).astype(jnp.int32) + \
            i * npad
        d2_ref[0, i, 0, :] = jnp.min(d, axis=0)
        w2_ref[0, i, 0, :] = jnp.argmin(d, axis=0).astype(jnp.int32) + \
            i * npad
        return 0

    jax.lax.fori_loop(0, n_p, pair_body, 0)
    _finalize_parts(n_p, d1_ref, d2_ref, w1_ref, w2_ref, npad, max_parts)


def _recon_x(x48):
    """f32 coords from an x split-pack: terms at rows 0-7 (a1), 24-31
    (a2), 40-47 (a3) -- see _pack_x48."""
    return (x48[0:3, :].astype(jnp.float32) +
            x48[24:27, :].astype(jnp.float32) +
            x48[40:43, :].astype(jnp.float32))


def _recon_y(y48):
    """f32 coords from a y split-pack (rows scaled by -2): terms at rows
    0-7 (b1), 8-15 (b2), 16-23 (b3) -- see _pack_y48."""
    return (y48[0:3, :].astype(jnp.float32) +
            y48[8:11, :].astype(jnp.float32) +
            y48[16:19, :].astype(jnp.float32)) * (-0.5)


def _bwd_accumulate(W, xc, yc):
    """Gradient contributions of one tile given its scatter weights W.

    W[m, n] = g1[m]*[witness(x_m) == y_n] + g2[n]*[witness(y_n) == x_m];
    gradients then ride two skinny MXU matmuls instead of a scatter (the
    CUDA backward used atomicAdd, chamfer_kernel.cu:203-208):
        dx += 2 (rowsum(W) x - W y),
        dy -= 2 (W^T x - colsum(W) y).
    """
    row_w = jnp.sum(W, axis=1)  # [Nx]
    col_w = jnp.sum(W, axis=0)  # [Ny]
    # gradient accumulation tolerates bf16 operand rounding (~0.1%
    # relative -- the reference trains under fp16 AMP anyway), so these
    # ride the MXU in one pass instead of HIGHEST's six
    y_acc = jax.lax.dot_general(
        yc, W, (((1, ), (1, )), ((), ())),
        preferred_element_type=jnp.float32,
        precision=BWD_ACC_PRECISION)  # [3, Nx]
    x_acc = jax.lax.dot_general(
        xc, W, (((1, ), (0, )), ((), ())),
        preferred_element_type=jnp.float32,
        precision=BWD_ACC_PRECISION)  # [3, Ny]
    dx = 2.0 * (row_w[None, :] * xc - y_acc)
    dy = -2.0 * (x_acc - col_w[None, :] * yc)
    return dx, dy


def _fused_parts_bwd_kernel(plist_ref, x_ref, y_ref, w1_ref, w2_ref,
                            g1_ref, g2_ref, dx_ref, dy_ref, *, npad,
                            max_parts, gy):
    """Backward of the fused whole-shape chamfer over the witness-linked
    (x-part, y-group) tiles ONLY.

    plist_ref[b] = [n_rel, pid_0, pid_1, ...] (pid = i * n_groups + c) is
    precomputed in XLA from the forward's witness maps (see
    `_relevant_pairs`) and scalar-prefetched to SMEM, so the loop runs
    exactly n_rel times -- an in-kernel relevance scan costs ~6.5us per
    SKIPPED pair, which dominated the old backward at p=20.  The exact
    witness indices recorded by the forward turn the scatter weights into
    a pure iota compare: no distance recompute, no equality masks, no tie
    normalization (first-hit semantics, like the CUDA scan)."""
    b = pl.program_id(0)
    n_rel = plist_ref[b, 0]
    n_groups = max_parts // gy

    dx_ref[0] = jnp.zeros((max_parts, 8, npad), jnp.float32)
    dy_ref[0] = jnp.zeros((max_parts, 8, npad), jnp.float32)

    gcol = jax.lax.broadcasted_iota(jnp.int32, (npad, gy * npad), 1)
    grow = jax.lax.broadcasted_iota(jnp.int32, (npad, gy * npad), 0)

    def pair_body(k, _):
        pid = plist_ref[b, 1 + k]
        i = pid // n_groups
        c = pid - i * n_groups
        w1 = w1_ref[0, i, 0, :]  # [Nx] flat witness index into y
        g1 = g1_ref[0, i, 0, :]
        # [1, gy*Npad] lane concats (Mosaic implements 2-D lane-axis
        # concatenation; 1-D vector concat past the first tile does not
        # lower -- "Input offsets outside of the first tile")
        w2cat = jnp.concatenate(
            [w2_ref[0, c * gy + r, 0:1, :] for r in range(gy)], axis=1)
        g2cat = jnp.concatenate(
            [g2_ref[0, c * gy + r, 0:1, :] for r in range(gy)], axis=1)
        base = c * gy * npad
        W = (gcol + base == w1[:, None]).astype(jnp.float32) * \
            g1[:, None] + \
            (grow + i * npad == w2cat).astype(jnp.float32) * g2cat
        xc = _recon_x(x_ref[0, i])
        yc = jnp.concatenate(
            [_recon_y(y_ref[0, c * gy + r]) for r in range(gy)],
            axis=1)  # [3, gy*Npad]
        dx, dy = _bwd_accumulate(W, xc, yc)
        dx_ref[0, i, 0:3, :] += dx
        for r in range(gy):
            dy_ref[0, c * gy + r, 0:3, :] += \
                dy[:, r * npad:(r + 1) * npad]
        return 0

    jax.lax.fori_loop(0, n_rel, pair_body, 0)


def _fused_diag_bwd_kernel(nparts_ref, x_ref, y_ref, w1_ref, w2_ref,
                           g1_ref, g2_ref, dx_ref, dy_ref, *, npad,
                           max_parts):
    """Diagonal-mode backward: every witness lies within the pair itself,
    so no pair list is needed; scatter weights come from the forward's
    exact witness indices."""
    b = pl.program_id(0)
    n_p = nparts_ref[b]

    dx_ref[0] = jnp.zeros((max_parts, 8, npad), jnp.float32)
    dy_ref[0] = jnp.zeros((max_parts, 8, npad), jnp.float32)

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 0)

    def pair_body(i, _):
        base = i * npad
        W = (col_iota + base == w1_ref[0, i, 0, :][:, None]).astype(
            jnp.float32) * g1_ref[0, i, 0, :][:, None] + \
            (row_iota + base == w2_ref[0, i, 0, :][None, :]).astype(
                jnp.float32) * g2_ref[0, i, 0, :][None, :]
        xc = _recon_x(x_ref[0, i])
        yc = _recon_y(y_ref[0, i])
        dx, dy = _bwd_accumulate(W, xc, yc)
        dx_ref[0, i, 0:3, :] += dx
        dy_ref[0, i, 0:3, :] += dy
        return 0

    jax.lax.fori_loop(0, n_p, pair_body, 0)


def _tile_list(keep_tile, n_parts):
    """[B, P, G] bool keep mask -> [B, 2 + P*G] i32 prefetch rows
    [n_p, n_rel, pid...] with pids ascending (scan order)."""
    B, P, G = keep_tile.shape
    ntiles = P * G
    relf = keep_tile.reshape(B, ntiles)
    count = jnp.sum(relf, axis=1, dtype=jnp.int32)
    ids = jnp.where(relf, jnp.arange(ntiles, dtype=jnp.int32), ntiles)
    ids = jnp.sort(ids, axis=1).astype(jnp.int32)
    return jnp.concatenate([n_parts.astype(jnp.int32)[:, None],
                            count[:, None], ids], axis=1)


def _dense_forward_pairs(n_parts, max_parts, gy):
    """The unpruned forward tile list: every (i < n_p, c < ceil(n_p/gy))."""
    G = max_parts // gy
    vi = jnp.arange(max_parts)[None, :, None] < n_parts[:, None, None]
    vc = jnp.arange(G)[None, None, :] < \
        ((n_parts + gy - 1) // gy)[:, None, None]
    return _tile_list(vi & vc, n_parts)


def _forward_pairs(x, y, n_parts, max_parts, gy):
    """Exact triangle-inequality forward tile list (runs in XLA).

    For every point p of x-part i, its final NN distance into y is bounded
    above by ub1_i = min over valid j of (|c_i - c_j| + r_i + r_j), and
    every distance from part i into y-part j is bounded below by
    lb_ij = |c_i - c_j| - r_i - r_j.  A tile (i, group c) is dropped only
    when lb_ij > ub1_i AND lb_ij > ub2_j for EVERY j in the group (ub2 is
    the symmetric y-side bound), so a dropped tile's distances all exceed
    the final min of every point it could serve -- it can neither win nor
    tie, and the kept tiles (ascending pid) preserve the first-hit scan
    order exactly.  The argmin-j tile is always kept (lb <= ub for the
    same pair), so every valid part keeps at least one tile.  A relative
    slack guards the fp error of the centroid/radius reduction.

    Args:
        x, y: [B, P, N, 3] f32 part clouds (invalid parts may hold any
            values -- they are masked by n_parts)
        n_parts: [B] i32 valid-prefix counts

    Returns:
        [B, 2 + P*(P//gy)] i32 rows [n_p, n_rel, pid...].
    """
    B, P = x.shape[:2]
    c1 = jnp.mean(x, axis=2)  # [B, P, 3]
    c2 = jnp.mean(y, axis=2)
    r1 = jnp.sqrt(jnp.max(jnp.sum(
        (x - c1[:, :, None]) ** 2, axis=-1), axis=2))  # [B, P]
    r2 = jnp.sqrt(jnp.max(jnp.sum(
        (y - c2[:, :, None]) ** 2, axis=-1), axis=2))
    D = jnp.sqrt(jnp.sum(
        (c1[:, :, None] - c2[:, None, :]) ** 2, axis=-1))  # [B, Pi, Pj]
    rsum = r1[:, :, None] + r2[:, None, :]
    vi = jnp.arange(P)[None, :] < n_parts[:, None]
    pair_valid = vi[:, :, None] & vi[:, None, :]
    ub = jnp.where(pair_valid, D + rsum, jnp.inf)
    # relative fp-slack: centroid/radius reductions are ~1e-7-relative
    # accurate; 1e-4 of the pair scale can only make pruning conservative
    lb = jnp.maximum(D - rsum - 1e-4 * (D + rsum), 0.0)
    lb = jnp.where(pair_valid, lb, jnp.inf)
    ub1 = jnp.min(ub, axis=2)  # [B, Pi] upper bound on part i's max-min
    ub2 = jnp.min(ub, axis=1)  # [B, Pj]
    # pair_valid mask: invalid pairs carry lb = ub = inf and inf <= inf
    # is True -- without it every invalid part's tiles would be kept
    keep = pair_valid & ((lb <= ub1[:, :, None]) | (lb <= ub2[:, None, :]))
    G = P // gy
    keep_tile = jnp.any(keep.reshape(B, P, G, gy), axis=3)
    # only the groups the dense kernel would visit (c < ceil(n_p/gy))
    keep_tile &= jnp.arange(G)[None, None, :] < \
        ((n_parts + gy - 1) // gy)[:, None, None]
    return _tile_list(keep_tile, n_parts)


def _fused_parts_fwd_pallas(x48, y48, prefetch, diagonal=False,
                            interpret=False):
    """prefetch: [B] n_parts (diagonal) or a [B, 2+P*G] forward tile list
    from `_forward_pairs` / `_dense_forward_pairs` (whole-shape mode)."""
    B, P, _, npad = x48.shape
    kwargs = {} if interpret else {
        'compiler_params': pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}
    if diagonal:
        kernel = functools.partial(
            _fused_diag_fwd_kernel, npad=npad, max_parts=P)
        scratch = []
    else:
        gy = _pick_gy(P, npad)
        assert prefetch.ndim == 2, 'whole-shape mode takes a tile list'
        kernel = functools.partial(
            _fused_parts_fwd_kernel, npad=npad, max_parts=P, gy=gy)
        scratch = [pltpu.VMEM((P // gy, 48, gy * npad), jnp.bfloat16)]
    d1, d2, w1, w2 = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, ),
            in_specs=[
                pl.BlockSpec((1, P, 48, npad), lambda b, nref: (b, 0, 0, 0)),
                pl.BlockSpec((1, P, 48, npad), lambda b, nref: (b, 0, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, P, 8, npad), lambda b, nref: (b, 0, 0, 0)),
            ] * 4,
            scratch_shapes=scratch,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, P, 8, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, P, 8, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, P, 8, npad), jnp.int32),
            jax.ShapeDtypeStruct((B, P, 8, npad), jnp.int32),
        ],
        interpret=interpret,
        **kwargs,
    )(prefetch.astype(jnp.int32), x48, y48)
    return d1, d2, w1, w2


def _relevant_pairs(w1, w2, n, max_parts, npad, gy):
    """[B, 1 + P*(P/gy)] i32 tile list for the backward: per batch element,
    the count of witness-linked (x-part i, y-group c) tiles followed by
    their ids (pid = i * n_groups + c, ascending).  A tile is linked when
    some point of x-part i has its forward witness in group c (w1, flat
    indices) or some point of a group-c part has its witness in part i
    (w2); only the first `n` (real) points of each part are consulted --
    pad-point witnesses are artifacts.  Runs in XLA between the forward
    and backward pallas calls."""
    B = w1.shape[0]
    n_groups = max_parts // gy
    win1g = w1[:, :, 0, :n] // (npad * gy)  # [B, P, n] witness y-GROUP
    win2p = w2[:, :, 0, :n] // npad         # [B, P, n] witness x-PART
    cid = jnp.arange(n_groups, dtype=jnp.int32)
    pid = jnp.arange(max_parts, dtype=jnp.int32)
    rel1 = jnp.any(win1g[..., None] == cid, axis=2)   # [B, P_i, C]
    rel2 = jnp.any(win2p[..., None] == pid, axis=2)   # [B, P_j, P_i]
    # group rel2 over j: tile (i, c) linked if any part j in group c has a
    # witness in part i
    rel2g = jnp.any(rel2.reshape(B, n_groups, gy, max_parts), axis=2)
    rel = rel1 | jnp.swapaxes(rel2g, 1, 2)            # [B, P_i, C]
    ntiles = max_parts * n_groups
    relf = rel.reshape(B, ntiles)
    count = jnp.sum(relf, axis=1, dtype=jnp.int32)
    ids = jnp.where(relf, jnp.arange(ntiles, dtype=jnp.int32), ntiles)
    ids = jnp.sort(ids, axis=1).astype(jnp.int32)
    return jnp.concatenate([count[:, None], ids], axis=1)


def _fused_parts_bwd_pallas(x48, y48, w1, w2, g1, g2, n_parts,
                            n_real, diagonal=False, interpret=False):
    B, P, _, npad = x48.shape
    kwargs = {} if interpret else {
        'compiler_params': pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}
    if diagonal:
        kernel = functools.partial(_fused_diag_bwd_kernel, npad=npad,
                                   max_parts=P)
        prefetch = n_parts.astype(jnp.int32)
    else:
        gy = _pick_gy(P, npad)
        kernel = functools.partial(_fused_parts_bwd_kernel, npad=npad,
                                   max_parts=P, gy=gy)
        prefetch = _relevant_pairs(w1, w2, n_real, P, npad, gy)
    dx, dy = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, ),
            in_specs=[
                pl.BlockSpec((1, P, 48, npad), lambda b, nref: (b, 0, 0, 0)),
                pl.BlockSpec((1, P, 48, npad), lambda b, nref: (b, 0, 0, 0)),
            ] + [
                pl.BlockSpec((1, P, 8, npad), lambda b, nref: (b, 0, 0, 0))
            ] * 4,
            out_specs=[
                pl.BlockSpec((1, P, 8, npad), lambda b, nref: (b, 0, 0, 0)),
                pl.BlockSpec((1, P, 8, npad), lambda b, nref: (b, 0, 0, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, P, 8, npad), jnp.float32),
            jax.ShapeDtypeStruct((B, P, 8, npad), jnp.float32),
        ],
        interpret=interpret,
        **kwargs,
    )(prefetch, x48, y48, w1, w2, g1, g2)
    return dx, dy


def _row0_embed(v, npad):
    """[B, P, N] -> [B, P, 8, Npad] with data in row 0 (kernel layout)."""
    B, P, N = v.shape
    out = jnp.zeros((B, P, 8, npad), jnp.float32)
    return out.at[:, :, 0, :N].set(v)


def _parts_bwd_one(g, x, y, idx, npad):
    """Gradient of one direction: d_i = |x_i - y_{idx_i}|^2."""
    B, P, N, _ = x.shape
    ypad = jnp.pad(y, ((0, 0), (0, 0), (0, npad - N), (0, 0)))
    yf = ypad.reshape(B, P * npad, 3)
    idxf = jnp.clip(idx.reshape(B, P * N), 0, P * npad - 1)
    w = jnp.take_along_axis(yf, idxf[..., None], axis=1)  # [B, P*N, 3]
    diff = 2.0 * g.reshape(B, P * N, 1) * (x.reshape(B, P * N, 3) - w)
    dx = diff.reshape(B, P, N, 3)
    dyf = jnp.zeros_like(yf).at[jnp.arange(B)[:, None], idxf].add(-diff)
    dy = dyf.reshape(B, P, npad, 3)[:, :, :N, :]
    return dx, dy


def chamfer_parts(part_pcs1, part_pcs2, valids):
    """Chamfer between two whole shapes stored as padded parts.

    Equivalent to the reference's whole-shape chamfer over [B, P*N, 3] with
    padded parts pushed far away (loss.py:172-182), but skips padded parts
    on-device.  Valid parts must be a prefix (true for both datasets).

    Args:
        part_pcs1 / part_pcs2: [B, P, N, 3] (already posed)
        valids: [B, P] 1/0 float mask

    Returns:
        dist1, dist2: [B, P*N] squared distances (0 at padded entries)
    """
    B, P, N, _ = part_pcs1.shape
    n_parts = jnp.sum(valids.astype(jnp.int32), axis=1)
    d1, d2 = _chamfer_parts_core(part_pcs1, part_pcs2, n_parts)
    return d1.reshape(B, P * N), d2.reshape(B, P * N)


# Fused-kernel dispatch override.  'auto' uses the fused pallas kernels on
# TPU and the jnp fallbacks elsewhere; 'force' runs the fused kernels
# everywhere (interpret mode off-TPU -- this is how CI exercises the
# production kernels on CPU, see tests/test_ops.py); 'off' always falls
# back to jnp.
_FUSED_MODE = os.environ.get('MPA_CHAMFER_FUSED', 'auto')

# Triangle-inequality forward tile pruning (exact -- see _forward_pairs).
# On by default; MPA_CHAMFER_PRUNE=0 forces the dense tile list (A/B
# benchmarking; results are identical either way).
_PRUNE_MODE = os.environ.get('MPA_CHAMFER_PRUNE', '1') != '0'


def set_fused_mode(mode):
    """Set fused-kernel dispatch: 'auto' | 'force' | 'off' (test hook)."""
    global _FUSED_MODE
    assert mode in ('auto', 'force', 'off'), mode
    _FUSED_MODE = mode


def set_prune_mode(on):
    """Toggle exact forward tile pruning (test/bench hook)."""
    global _PRUNE_MODE
    _PRUNE_MODE = bool(on)


def _on_tpu():
    return any(d.platform == 'tpu' for d in jax.devices())


def _use_fused():
    if _FUSED_MODE == 'force':
        return _HAS_PLTPU
    if _FUSED_MODE == 'off':
        return False
    return _HAS_PLTPU and _on_tpu()


def _fused_interpret():
    """Interpret the fused kernels when no TPU backend is present."""
    return not _on_tpu()


def _make_parts_core(diagonal):
    """Build the custom-VJP chamfer core.

    diagonal=False: whole-shape chamfer across all valid part pairs.
    diagonal=True: per-part chamfer -- part i of cloud 1 vs part i of
    cloud 2 only (reference's flattened per-part chamfer calls).
    """

    @jax.custom_vjp
    def core(xyz1, xyz2, n_parts):
        return core_fwd(xyz1, xyz2, n_parts)[0]

    def core_fwd(xyz1, xyz2, n_parts):
        N = xyz1.shape[2]
        if _use_fused():
            npad = _round_up(N, 128)
            # push INVALID parts to the pad coordinate so the grouped
            # forward needs no in-kernel validity masking (pad distances
            # are ~1e12 and never win a min against real points)
            P = xyz1.shape[1]
            ok = (jnp.arange(P)[None, :] < n_parts[:, None])[..., None, None]
            x1 = jnp.where(ok, xyz1.astype(jnp.float32), _PAD_VAL)
            x2 = jnp.where(ok, xyz2.astype(jnp.float32), _PAD_VAL)
            x48 = _pack_x48(_aug_x(x1, npad))
            y48 = _pack_y48(_aug_y(x2, npad))
            if diagonal:
                prefetch = n_parts
            elif _PRUNE_MODE:
                prefetch = _forward_pairs(x1, x2, n_parts, P,
                                          _pick_gy(P, npad))
            else:
                prefetch = _dense_forward_pairs(n_parts, P,
                                                _pick_gy(P, npad))
            d1e, d2e, w1e, w2e = _fused_parts_fwd_pallas(
                x48, y48, prefetch, diagonal=diagonal,
                interpret=_fused_interpret())
            # the backward needs only the packs, witness indices and part
            # counts (exact-witness scatter; no distance recompute)
            return (d1e[:, :, 0, :N], d2e[:, :, 0, :N]), \
                (x48, y48, w1e, w2e, n_parts)
        if diagonal:
            # reference path: each part as an independent 1-part shape
            B, P = xyz1.shape[:2]
            flags = (jnp.arange(P)[None, :] <
                     n_parts[:, None]).astype(jnp.int32).reshape(B * P)
            x1 = xyz1.reshape(B * P, 1, N, 3)
            x2 = xyz2.reshape(B * P, 1, N, 3)
            d1, i1 = _nn_parts_pallas(x1, x2, flags)
            d2, i2 = _nn_parts_pallas(x2, x1, flags)
            return (d1.reshape(B, P, N), d2.reshape(B, P, N)), \
                (xyz1, xyz2, i1, i2, n_parts)
        d1, i1 = _nn_parts_pallas(xyz1, xyz2, n_parts)
        d2, i2 = _nn_parts_pallas(xyz2, xyz1, n_parts)
        return (d1, d2), (xyz1, xyz2, i1, i2, n_parts)

    def core_bwd(res, grads):
        g1, g2 = grads
        # the dispatch decision is trace-time static, so fwd/bwd agree on
        # the residual structure
        if _use_fused():
            x48, y48, w1e, w2e, n_parts = res
            npad = x48.shape[-1]
            N = g1.shape[-1]
            g1e = _row0_embed(g1, npad)
            g2e = _row0_embed(g2, npad)
            dxe, dye = _fused_parts_bwd_pallas(
                x48, y48, w1e, w2e, g1e, g2e, n_parts, N,
                diagonal=diagonal, interpret=_fused_interpret())
            dx = jnp.swapaxes(dxe[:, :, 0:3, :N], 2, 3)  # [B, P, N, 3]
            dy = jnp.swapaxes(dye[:, :, 0:3, :N], 2, 3)
            return dx, dy, None

        xyz1, xyz2, i1, i2, n_parts = res
        B, P, N = xyz1.shape[:3]
        npad = _round_up(N, 128)
        # zero cotangents at padded parts: their dist outputs are sentinel
        # zeros with garbage witness indices
        part_valid = (jnp.arange(P)[None, :] < n_parts[:, None])[..., None]
        g1 = jnp.where(part_valid, g1, 0.0)
        g2 = jnp.where(part_valid, g2, 0.0)
        if diagonal:
            sh = (B * P, 1, N)
            x1 = xyz1.reshape(B * P, 1, N, 3)
            x2 = xyz2.reshape(B * P, 1, N, 3)
            dx_a, dy_a = _parts_bwd_one(g1.reshape(sh), x1, x2, i1, npad)
            dy_b, dx_b = _parts_bwd_one(g2.reshape(sh), x2, x1, i2, npad)
            return (dx_a + dx_b).reshape(xyz1.shape), \
                (dy_a + dy_b).reshape(xyz2.shape), None
        dx_a, dy_a = _parts_bwd_one(g1, xyz1, xyz2, i1, npad)
        dy_b, dx_b = _parts_bwd_one(g2, xyz2, xyz1, i2, npad)
        return dx_a + dx_b, dy_a + dy_b, None

    core.defvjp(core_fwd, core_bwd)
    return core


_chamfer_parts_core = _make_parts_core(diagonal=False)
_chamfer_diag_core = _make_parts_core(diagonal=True)


def chamfer_diag(pts1, pts2, valids):
    """Per-part chamfer: part i of pts1 vs part i of pts2, padded parts
    skipped on device.  Drop-in for the reference's flattened per-part
    chamfer (loss.py:113-138, eval_utils.py:12-46).

    Args:
        pts1, pts2: [B, P, N, 3];  valids: [B, P] 1/0 prefix mask

    Returns:
        dist1, dist2: [B, P, N] (zeros at padded parts)
    """
    n_parts = jnp.sum(valids.astype(jnp.int32), axis=1)
    return _chamfer_diag_core(pts1, pts2, n_parts)


def chamfer_pairs(pts1, pts2, pair_valids):
    """Per-pair chamfer with invalid pairs skipped on device.

    Drop-in for the reference's flattened per-part chamfer
    (loss.py:113-138, eval_utils.py:12-46: chamfer over [B*P, N, 3] where
    padded parts are all-zero clouds).  Treat each pair as a 1-part shape:
    invalid pairs get 0 distances and are skipped by the kernel.

    Args:
        pts1, pts2: [M, N, 3];  pair_valids: [M] 1/0

    Returns:
        dist1, dist2: [M, N]
    """
    M, N, _ = pts1.shape
    d1, d2 = _chamfer_parts_core(
        pts1[:, None], pts2[:, None],
        pair_valids.astype(jnp.int32).reshape(M))
    return d1.reshape(M, N), d2.reshape(M, N)


def chamfer_distance(xyz1, xyz2, transpose=False, sqrt=False, eps=1e-12):
    """Chamfer distance between two batched point clouds.

    Mirrors the reference API (utils/chamfer/chamfer.py:36-64).

    Args:
        xyz1: [B, N1, 3] (or [B, 3, N1] with transpose=True)
        xyz2: [B, N2, 3]
        transpose: whether the coordinate axis comes first
        sqrt: return sqrt of the squared distances

    Returns:
        (dist1 [B, N1], dist2 [B, N2])
    """
    if xyz1.ndim == 2:
        xyz1 = xyz1[None]
        xyz2 = xyz2[None]
    if transpose:
        xyz1 = jnp.swapaxes(xyz1, 1, 2)
        xyz2 = jnp.swapaxes(xyz2, 1, 2)
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    dist1, dist2 = _chamfer(xyz1, xyz2)
    if sqrt:
        dist1 = jnp.sqrt(jnp.maximum(dist1, eps))
        dist2 = jnp.sqrt(jnp.maximum(dist2, eps))
    return dist1, dist2


def nn_distance(xyz1, xyz2, transpose=False, sqrt=False):
    """Chamfer plus argmin indices (reference chamfer.py:67-76)."""
    if transpose:
        xyz1 = jnp.swapaxes(xyz1, 1, 2)
        xyz2 = jnp.swapaxes(xyz2, 1, 2)
    xyz1 = xyz1.astype(jnp.float32)
    xyz2 = xyz2.astype(jnp.float32)
    dist1, idx1 = _nn_direction(xyz1, xyz2)
    dist2, idx2 = _nn_direction(xyz2, xyz1)
    if sqrt:
        dist1 = jnp.sqrt(jnp.maximum(dist1, 1e-12))
        dist2 = jnp.sqrt(jnp.maximum(dist2, 1e-12))
    return dist1, idx1, dist2, idx2
