"""Real-chip dense-vs-chunked device-sampler kernel cost (ROADMAP 3a).

The chunked table layout exists for HBM scale (memory ~ total faces); this
measures what it costs in KERNEL time on the bench dataset so the
auto-selection policy (dense when it fits) is evidence-backed.

Measurement discipline (= scripts/bench_chamfer.py `timed_chain`): the
axon remote runtime caches identical (executable, values) invocations and
defers execution until a value fetch, so per-call wall timing with a fetch
per iteration mostly measures the ~100ms-class flush overhead.  Every
number here is time(k=8 seed-chained samples in ONE executable) minus
time(k=1), divided by 7, with a fresh base seed per timed call.

On the v2 bench dataset all pieces have 768 faces, so the two layouts do
near-identical MXU work (dense: 2 x [16,768] one-hot matmuls/row; chunked:
2 chunks x 1 x [24,512]); real fracture sets are skewed, where dense cost
scales with the GLOBAL max face count and chunked with each piece's own.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def make_chain(n_points, k):
    """k seed-chained sample_packed calls -> one scalar probe.

    The table/n_faces/slots ride as ARGUMENTS, not closure constants: a
    closed-over device array is baked into the executable and shipped in
    the remote-compile request body (a 334MB chunked table overflowed the
    compile helper's request limit with HTTP 413)."""
    from multi_part_assembly_tpu.datasets import device_sampler as dsmp

    @jax.jit
    def f(table, n_faces, slots, base):
        def body(i, acc):
            # acc feeds the seed (1e-30-scaled: a 0.0* coupling gets
            # strength-reduced + DCE'd, ROADMAP gotchas) so iterations
            # form a true dependency chain the runtime cannot reorder
            seed = base + i + (acc * 1e-30).astype(jnp.int32)
            key = jax.random.fold_in(jax.random.PRNGKey(0x5e1ec7ab), seed)
            pts = dsmp.sample_packed(table, n_faces, slots, key, n_points)
            return acc + jnp.sum(pts[0, 0])
        return lax.fori_loop(0, k, body, jnp.float32(0.0))

    return f


def timed_chain(tables, slots, n_points, k_long=8, reps=3):
    f1 = make_chain(n_points, 1)
    f8 = make_chain(n_points, k_long)
    args = (tables.table, tables.n_faces, slots)
    float(np.asarray(f1(*args, jnp.int32(0))))   # compile + warm
    float(np.asarray(f8(*args, jnp.int32(1))))

    def run(f, salt):
        best = 1e9
        for r in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(f(*args, jnp.int32(1000 + salt * 100 + r))))
            best = min(best, (time.perf_counter() - t0) * 1e3)
        return best

    return (run(f8, 1) - run(f1, 2)) / (k_long - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--rows', type=int, nargs='*', default=[240, 640],
                    help='packed-row counts to time (prod Kpad ~240 at '
                         'mean p 5.75 x B=32; 640 = worst-case B*P)')
    ap.add_argument('--n-points', type=int, default=1000)
    args = ap.parse_args()
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench
    from multi_part_assembly_tpu.datasets import device_sampler as dsmp
    from multi_part_assembly_tpu.datasets.mesh_io import MeshSampler

    data = bench._ensure_data('geometry')
    paths = []
    for root, _, files in os.walk(data):
        paths += [os.path.join(root, f) for f in sorted(files)
                  if f.endswith('.obj')]
    print(f'{len(paths)} pieces')
    ms = MeshSampler()
    dense = dsmp.build_device_tables(paths, ms, layout='dense')
    chunk = dsmp.build_device_tables(paths, ms, layout='chunked')
    print(f'dense table {dense.table.shape} = '
          f'{dense.table.size * 4 / 1e6:.1f} MB; '
          f'chunked {chunk.table.shape} = '
          f'{chunk.table.size * 4 / 1e6:.1f} MB '
          f'(Cmax={chunk.n_faces.shape[0] - 3})')
    rng = np.random.default_rng(0)
    for K in args.rows:
        slots = jnp.asarray(rng.integers(0, len(paths), K), jnp.int32)
        td = timed_chain(dense, slots, args.n_points)
        print(f'K={K:4d}: dense   {td:7.3f} ms/call', flush=True)
        tc = timed_chain(chunk, slots, args.n_points)
        print(f'K={K:4d}: chunked {tc:7.3f} ms/call '
              f'({tc / td:.2f}x dense)', flush=True)
    # correctness on the full real table set, real chip
    kk = jax.random.PRNGKey(42)
    slots = jnp.asarray(rng.integers(0, len(paths), 640), jnp.int32)
    od = dsmp.sample_packed(dense.table, dense.n_faces, slots, kk,
                            args.n_points)
    oc = dsmp.sample_packed(chunk.table, chunk.n_faces, slots, kk,
                            args.n_points)
    err = float(jnp.max(jnp.abs(od - oc)))
    print(f'chunked-vs-dense max err over 640 rows: {err:.2e}')
    assert err == 0.0


if __name__ == '__main__':
    main()
