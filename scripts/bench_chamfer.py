"""Micro-benchmark of the fused chamfer kernels on the real TPU.

Times forward-only and forward+backward of chamfer_parts (whole-shape)
and chamfer_diag (per-part) across part-count regimes, to track the
ROADMAP kernel backlog.  PartNet worst case is n_p=20.

Measurement discipline: the axon remote-execution helper can serve
IDENTICAL repeated computations from a cache, so wall-timing independent
calls is unreliable (we measured 0.05ms for a 90ms kernel).  Every number
here comes from a DEPENDENCY-CHAINED loop compiled into one executable:
time(k=8 chained calls) - time(k=1), divided by 7.

Usage: python scripts/bench_chamfer.py [--iters-chain 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def timed_chain(make_chain, args, k_long=8, reps=2):
    f1, f8 = make_chain(1), make_chain(k_long)
    jax.block_until_ready(f1(*args))
    jax.block_until_ready(f8(*args))

    def run(f):
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, (time.perf_counter() - t0) * 1e3)
        return best

    return (run(f8) - run(f1)) / (k_long - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters-chain', type=int, default=8)
    ap.add_argument('--batch', type=int, default=32)
    args = ap.parse_args()

    from multi_part_assembly_tpu.ops import chamfer as C

    B, P, N = args.batch, 20, 1000
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, P, N, 3)), jnp.float32)
    # overlapping clouds: witness links cross parts freely (the worst case
    # for the backward's pair list; realistic for early training)
    y = jnp.asarray(rng.standard_normal((B, P, N, 3)), jnp.float32)

    def fwd_chain(k, diag=False):
        @jax.jit
        def f(x, y, valids):
            fn = C.chamfer_diag if diag else C.chamfer_parts
            def body(i, c):
                d1, d2 = fn(c, y, valids)
                return c + 0.0 * d1[0, 0]
            return lax.fori_loop(0, k, body, x)
        return f

    def fwdbwd_chain(k, diag=False):
        @jax.jit
        def f(x, y, valids):
            fn = C.chamfer_diag if diag else C.chamfer_parts
            def body(i, c):
                g = jax.grad(lambda a: sum(fn(a, y, valids)).sum())(c)
                return c + 0.0 * g
            return lax.fori_loop(0, k, body, x)
        return f

    kc = args.iters_chain
    results = {}
    for np_ in [2, 5, 10, 20]:
        valids = jnp.asarray(np.arange(P)[None] < np_,
                             jnp.float32) * jnp.ones((B, 1))
        row = {
            'parts_fwd_ms': timed_chain(fwd_chain, (x, y, valids), kc),
            'parts_fwdbwd_ms': timed_chain(fwdbwd_chain, (x, y, valids), kc),
            'diag_fwd_ms': timed_chain(
                lambda k: fwd_chain(k, True), (x, y, valids), kc),
            'diag_fwdbwd_ms': timed_chain(
                lambda k: fwdbwd_chain(k, True), (x, y, valids), kc),
        }
        row = {k: round(v, 2) for k, v in row.items()}
        results[f'n_p={np_}'] = row
        print(f'n_p={np_}', json.dumps(row), flush=True)

    print(json.dumps({
        'backend': jax.default_backend(),
        'device': jax.devices()[0].device_kind,
        'B': B, 'P': P, 'N': N,
        'results': results,
    }))


if __name__ == '__main__':
    main()
