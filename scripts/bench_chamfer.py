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


def timed_chain(make_chain, make_args, k_long=8, reps=2):
    """time(k_long chained calls) - time(1 call), per extra call.

    EVERY timed invocation gets FRESH argument values: the axon runtime
    serves identical (executable, args) repeats from a result cache, so
    even a dependency-chained executable reads as ~0ms when re-run on the
    same inputs (measured round 3; round 2 only knew about the
    independent-call variant of this trap)."""
    f1, f8 = make_chain(1), make_chain(k_long)
    # chains return SCALARS and timing fetches the VALUE:
    # jax.block_until_ready is a no-op under the axon remote runtime
    # (confirms dispatch, not execution) -- only a host fetch drains it
    float(np.asarray(f1(*make_args(0))))   # compile
    float(np.asarray(f8(*make_args(1))))

    def run(f, salt):
        best = 1e9
        for r in range(reps):
            a = make_args(1000 + salt * 100 + r)
            np.asarray(a[0]).ravel()
            t0 = time.perf_counter()
            float(np.asarray(f(*a)))
            best = min(best, (time.perf_counter() - t0) * 1e3)
        return best

    return (run(f8, 1) - run(f1, 2)) / (k_long - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters-chain', type=int, default=8)
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--scenario', default='overlap',
                    choices=['overlap', 'assembled', 'init'],
                    help='overlap: clouds fully interpenetrate (prune '
                         'worst case). assembled: both clouds are spread '
                         'unit shapes with small parts, pred ~ GT '
                         '(converged training). init: pred parts piled at '
                         'the origin vs an assembled GT (fresh model).')
    ap.add_argument('--no-prune', action='store_true',
                    help='force the dense forward tile list (A/B)')
    args = ap.parse_args()

    from multi_part_assembly_tpu.ops import chamfer as C
    if args.no_prune:
        C.set_prune_mode(False)

    B, P, N = args.batch, 20, 1000
    rng = np.random.default_rng(0)
    if args.scenario == 'overlap':
        # overlapping clouds: witness links cross parts freely (the worst
        # case for the backward's pair list AND forward pruning)
        x = jnp.asarray(rng.standard_normal((B, P, N, 3)), jnp.float32)
        y = jnp.asarray(rng.standard_normal((B, P, N, 3)), jnp.float32)
    else:
        # unit-scale object fractured into P COMPACT parts (uniform cube,
        # half-extent 0.15 -> bounded radius <=0.26 like real mesh
        # fragments; a Gaussian's max-of-1000 tail radius ~0.6 would make
        # every pair's radius sum exceed the center spread and defeat the
        # centroid/radius prune bound) with centers spread in the unit box
        # (the Breaking-Bad regime)
        centers = rng.uniform(-0.5, 0.5, (B, P, 1, 3)).astype(np.float32)
        pts = 0.15 * rng.uniform(-1, 1, (B, P, N, 3)).astype(np.float32)
        ynp = centers + pts
        if args.scenario == 'assembled':
            # pred within ~0.05 of GT: late-training shape_cd inputs
            xnp = ynp + 0.05 * rng.standard_normal(
                (B, P, N, 3)).astype(np.float32)
        else:  # init: untrained pred poses leave every part near 0
            xnp = pts + 0.02 * rng.standard_normal(
                (B, P, 1, 3)).astype(np.float32)
        x, y = jnp.asarray(xnp), jnp.asarray(ynp)

    def fwd_chain(k, diag=False):
        @jax.jit
        def f(x, y, valids):
            fn = C.chamfer_diag if diag else C.chamfer_parts
            def body(i, c):
                d1, d2 = fn(c, y, valids)
                # 1e-30 (not 0.0): XLA strength-reduces `0.0 * x` and then
                # DCEs the whole chamfer call, collapsing the chain
                return c + 1e-30 * d1.reshape(-1)[0]
            return lax.fori_loop(0, k, body, x).sum()  # scalar fetch
        return f

    def fwdbwd_chain(k, diag=False):
        @jax.jit
        def f(x, y, valids):
            fn = C.chamfer_diag if diag else C.chamfer_parts
            def body(i, c):
                g = jax.grad(lambda a: sum(fn(a, y, valids)).sum())(c)
                return c + 1e-30 * g
            return lax.fori_loop(0, k, body, x).sum()  # scalar fetch
        return f

    kc = args.iters_chain
    results = {}
    for np_ in [2, 5, 10, 20]:
        valids = jnp.asarray(np.arange(P)[None] < np_,
                             jnp.float32) * jnp.ones((B, 1))

        def make_args(seed):
            # fresh values each timed call (axon result-cache, see
            # timed_chain); same shapes/sharding so no recompile
            return (x + seed * 1e-6, y, valids)

        row = {
            'parts_fwd_ms': timed_chain(fwd_chain, make_args, kc),
            'parts_fwdbwd_ms': timed_chain(fwdbwd_chain, make_args, kc),
            'diag_fwd_ms': timed_chain(
                lambda k: fwd_chain(k, True), make_args, kc),
            'diag_fwdbwd_ms': timed_chain(
                lambda k: fwdbwd_chain(k, True), make_args, kc),
        }
        row = {k: round(v, 2) for k, v in row.items()}
        results[f'n_p={np_}'] = row
        print(f'n_p={np_}', json.dumps(row), flush=True)

    print(json.dumps({
        'backend': jax.default_backend(),
        'device': jax.devices()[0].device_kind,
        'B': B, 'P': P, 'N': N,
        'scenario': args.scenario, 'prune': not args.no_prune,
        'results': results,
    }))


if __name__ == '__main__':
    main()
