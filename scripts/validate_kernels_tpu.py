"""On-TPU validation of the fused pallas chamfer kernels vs exact references.

pytest runs on the virtual CPU mesh (reference paths only), so this script
is the hardware check: run it on a TPU host after touching
multi_part_assembly_tpu/ops/chamfer.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from multi_part_assembly_tpu.ops import chamfer as C


def main():
    assert any(d.platform == 'tpu' for d in jax.devices()), 'needs a TPU'
    rng = np.random.RandomState(0)
    B, P, N = 3, 5, 256
    x = jnp.asarray(rng.randn(B, P, N, 3).astype(np.float32))
    y = jnp.asarray(rng.randn(B, P, N, 3).astype(np.float32))
    nparts = np.array([2, 5, 3])
    valids = jnp.asarray(
        (np.arange(P)[None] < nparts[:, None]).astype(np.float32))
    pv = jnp.repeat(valids, N, 1)

    d1, d2 = jax.jit(lambda a, b: C.chamfer_parts(a, b, valids))(x, y)

    def loss_ref(a, b):
        af = jnp.where(pv[..., None] > 0, a.reshape(B, P * N, 3), 1e3)
        bf = jnp.where(pv[..., None] > 0, b.reshape(B, P * N, 3), 1e3)
        d = C._pairwise_sqdist(af, bf)
        return (jnp.sum(jnp.min(d, 2) * pv) + jnp.sum(jnp.min(d, 1) * pv),
                (jnp.min(d, 2), jnp.min(d, 1)))

    _, (rd1, rd2) = jax.jit(loss_ref)(x, y)
    fwd_err = float(jnp.max(jnp.abs((d1 - rd1) * pv)))
    print(f'forward max err: {fwd_err:.2e}')
    assert fwd_err < 1e-4

    def loss_f(a, b):
        da, db = C.chamfer_parts(a, b, valids)
        return jnp.sum(da * pv) + jnp.sum(db * pv)

    ga = jax.jit(jax.grad(loss_f, argnums=(0, 1)))(x, y)
    gr = jax.jit(jax.grad(lambda a, b: loss_ref(a, b)[0],
                          argnums=(0, 1)))(x, y)
    scale = float(jnp.max(jnp.abs(gr[0])))
    gerr = max(float(jnp.max(jnp.abs(ga[0] - gr[0]))),
               float(jnp.max(jnp.abs(ga[1] - gr[1])))) / scale
    print(f'grad max rel err: {gerr:.2e} '
          f'(bf16 witness accumulation; ~1e-6 with '
          f'BWD_ACC_PRECISION=HIGHEST)')
    assert gerr < 0.02

    # diagonal (per-part) path
    dd1, dd2 = jax.jit(lambda a, b: C.chamfer_diag(a, b, valids))(x, y)
    ref1, _, ref2, _ = C.chamfer_distance_ref(
        x.reshape(B * P, N, 3), y.reshape(B * P, N, 3))
    m = np.asarray(valids).reshape(-1)[:, None]
    derr = np.abs((np.asarray(dd1).reshape(B * P, N) -
                   np.asarray(ref1)) * m).max()
    print(f'diag forward max err: {derr:.2e}')
    assert derr < 1e-4

    # multi-group forward/backward (P=10 -> gy=5, two y-groups: exercises
    # the grouped tiles + pair-list backward across group boundaries on
    # real Mosaic lowering, not just interpret mode)
    B, P, N = 2, 10, 256
    xg = jnp.asarray(rng.randn(B, P, N, 3).astype(np.float32))
    yg = jnp.asarray(rng.randn(B, P, N, 3).astype(np.float32))
    npg = np.array([7, 10])
    vg = jnp.asarray((np.arange(P)[None] < npg[:, None]).astype(np.float32))
    pvg = jnp.repeat(vg, N, 1)
    gd1, gd2 = jax.jit(lambda a, b: C.chamfer_parts(a, b, vg))(xg, yg)
    agf = jnp.where(pvg[..., None] > 0, xg.reshape(B, P * N, 3), 1e3)
    bgf = jnp.where(pvg[..., None] > 0, yg.reshape(B, P * N, 3), 1e3)
    rgd = C._pairwise_sqdist(agf, bgf)
    gerr1 = float(jnp.max(jnp.abs(
        (gd1.reshape(B, P * N) - jnp.min(rgd, 2)) * pvg)))
    gerr2 = float(jnp.max(jnp.abs(
        (gd2.reshape(B, P * N) - jnp.min(rgd, 1)) * pvg)))
    print(f'multigroup fwd max err: {max(gerr1, gerr2):.2e}')
    assert max(gerr1, gerr2) < 1e-4

    def loss_g(a, b):
        da, db = C.chamfer_parts(a, b, vg)  # [B, P*N] each
        return jnp.sum(da * pvg) + 0.5 * jnp.sum(db * pvg)

    def loss_g_ref(a, b):
        af = jnp.where(pvg[..., None] > 0, a.reshape(B, P * N, 3), 1e3)
        bf = jnp.where(pvg[..., None] > 0, b.reshape(B, P * N, 3), 1e3)
        d = C._pairwise_sqdist(af, bf)
        return jnp.sum(jnp.min(d, 2) * pvg) + 0.5 * jnp.sum(
            jnp.min(d, 1) * pvg)

    gga = jax.jit(jax.grad(loss_g, argnums=(0, 1)))(xg, yg)
    ggr = jax.jit(jax.grad(loss_g_ref, argnums=(0, 1)))(xg, yg)
    gscale = float(jnp.max(jnp.abs(ggr[0])))
    ggerr = max(float(jnp.max(jnp.abs(gga[0] - ggr[0]))),
                float(jnp.max(jnp.abs(gga[1] - ggr[1])))) / gscale
    print(f'multigroup grad max rel err: {ggerr:.2e}')
    assert ggerr < 0.02

    # pruned-vs-dense bit-identity on real Mosaic lowering: separated
    # parts (the regime where tiles actually get dropped).  Pruning must
    # be invisible in values AND gradients (see chamfer._forward_pairs).
    B, P, N = 2, 10, 256
    xs = (rng.randn(B, P, N, 3) * 0.1).astype(np.float32)
    ys = (rng.randn(B, P, N, 3) * 0.1).astype(np.float32)
    xs[..., 0] += np.arange(P, dtype=np.float32)[None, :, None]
    ys[..., 0] += np.arange(P, dtype=np.float32)[None, :, None]
    xs, ys = jnp.asarray(xs), jnp.asarray(ys)
    nps = np.array([10, 6])
    vs = jnp.asarray((np.arange(P)[None] < nps[:, None]).astype(np.float32))
    pvs = jnp.repeat(vs, N, 1)
    gy = C._pick_gy(P, C._round_up(N, 128))
    plist = np.asarray(C._forward_pairs(
        xs, ys, jnp.asarray(nps, jnp.int32), P, gy))
    dense_pl = np.asarray(C._dense_forward_pairs(
        jnp.asarray(nps, jnp.int32), P, gy))
    assert (plist[:, 1] < dense_pl[:, 1]).all(), 'no tiles were pruned'

    def loss_s(a, b):
        da, db = C.chamfer_parts(a, b, vs)
        return jnp.sum(da * pvs) + 0.5 * jnp.sum(db * pvs)

    def run_s():
        d = jax.jit(lambda a, b: C.chamfer_parts(a, b, vs))(xs, ys)
        g = jax.jit(jax.grad(loss_s, argnums=(0, 1)))(xs, ys)
        return [np.asarray(t) for t in (*d, *g)]

    C.set_prune_mode(True)
    pr = run_s()
    C.set_prune_mode(False)
    try:
        dn = run_s()
    finally:
        C.set_prune_mode(True)
    for a, b in zip(pr, dn):
        np.testing.assert_array_equal(a, b)
    kept = plist[:, 1].sum() / dense_pl[:, 1].sum()
    print(f'prune-vs-dense on-chip: bit-identical '
          f'(kept {kept:.2%} of tiles on the separated fixture)')

    # quick perf
    B, P, N = 32, 20, 1000
    offs = (rng.randn(B, P, 1, 3) * 0.3).astype(np.float32)
    xb = jnp.asarray((rng.randn(B, P, N, 3) * 0.1).astype(np.float32) + offs)
    yb = jnp.asarray((rng.randn(B, P, N, 3) * 0.1).astype(np.float32) + offs)
    v = jnp.ones((B, P))
    g = jax.jit(jax.grad(
        lambda a, b: sum(map(jnp.sum, C.chamfer_parts(a, b, v))),
        argnums=(0, 1)))
    o = g(xb, yb)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(5):
        o = g(xb, yb)
    jax.block_until_ready(o)
    print(f'fwd+bwd p=20 separated: {(time.perf_counter()-t0)/5*1e3:.1f} ms')

    # device-sampler kernels on real Mosaic lowering: dense vs chunked
    # layouts must draw IDENTICAL points (the chunked kernel leans on
    # block-index clamping + when-gated output revisits that interpret
    # mode does not exercise faithfully)
    import tempfile

    from multi_part_assembly_tpu.datasets import device_sampler as dsmp
    from multi_part_assembly_tpu.datasets.mesh_io import MeshSampler

    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i, nf in enumerate([300, 128, 37, 520]):
            v = rng.randn(nf * 3, 3).astype(np.float32)
            lines = [f'v {a} {b} {c}' for a, b, c in v]
            lines += [f'f {3 * k + 1} {3 * k + 2} {3 * k + 3}'
                      for k in range(nf)]
            p = os.path.join(td, f'soup{i}.obj')
            with open(p, 'w') as f:
                f.write('\n'.join(lines) + '\n')
            paths.append(p)
        ms = MeshSampler()
        dense = dsmp.build_device_tables(paths, ms, layout='dense')
        chunk = dsmp.build_device_tables(paths, ms, layout='chunked',
                                         chunk_f=128)
        slots = jnp.asarray([0, 3, 1, 2, 3, 0], jnp.int32)
        key = jax.random.PRNGKey(11)
        out_d = jax.block_until_ready(dsmp.sample_packed(
            dense.table, dense.n_faces, slots, key, 200))
        out_c = jax.block_until_ready(dsmp.sample_packed(
            chunk.table, chunk.n_faces, slots, key, 200))
        npad = 256
        u = jnp.asarray(rng.rand(6, 8, npad).astype(np.float32))
        ref = dsmp.sample_packed_ref(dense.table, dense.n_faces, slots,
                                     u, 200)
        ker = dsmp._sample_points(dense.table, dense.n_faces, slots, u, 200)
        serr = float(jnp.max(jnp.abs(ker - ref)))
        cerr = float(jnp.max(jnp.abs(out_c - out_d)))
        print(f'sampler dense-vs-oracle max err: {serr:.2e}; '
              f'chunked-vs-dense max err: {cerr:.2e}')
        assert serr < 1e-6
        assert cerr == 0.0

    print('ALL KERNEL CHECKS PASSED')


if __name__ == '__main__':
    main()
