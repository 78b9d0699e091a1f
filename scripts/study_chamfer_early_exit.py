"""Ceiling study for DYNAMIC chamfer early exit (VERDICT r4 next-7).

The shipped forward prunes (x-part, y-group) tiles with STATIC bounds:
tile (i, c) is kept iff some pair (i, j in c) has lb_ij <= ub1_i or
lb_ij <= ub2_j, where lb/ub come from centroid/radius geometry alone
(ops/chamfer.py `_forward_pairs`).  ROADMAP item 9 measured: zero win on
compact-fragment `assembled` fixtures (radii eat the center spread).

The next granularity the VERDICT names is an ORDERED scan with a RUNNING
best: visit part i's y-groups in ascending lb order and terminate when
  max_p(current min dist of point p into visited groups) < lb(next group)
-- every remaining distance then exceeds every point's current best, so
values, witnesses, and gradients stay exact.  Because one tile serves BOTH
chamfer directions, the dynamic scheme must either keep y-relevant tiles
anyway (static ub2 test) or SPLIT directions: an x-pass (row mins only)
and a y-pass (col mins only), each with its own ordered scan.  A
single-direction tile pays the same MXU matmul but ~half the VPU
reduction, so we count it as 0.6 dual-tiles (ROADMAP item 4: ~3.4us MXU +
~10us VPU per dual tile; one direction drops one of the two min/argmin
reductions).

This script SIMULATES the ideal dynamic scheme exactly (per-point running
minima over groups visited in lb order, termination on the true running
best) and reports tile counts -- the achievable ceiling, free of kernel
implementation noise.  If the assembled-regime ceiling is <10% we reject
the kernel complexity with numbers; if it is large we implement.

Usage: MPA_PLATFORM=cpu python scripts/study_chamfer_early_exit.py
       [--batch 8] [--parts 20]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_fixture(scenario, B, P, N, rng):
    """Same geometry as scripts/bench_chamfer.py fixtures."""
    if scenario == 'overlap':
        x = rng.standard_normal((B, P, N, 3)).astype(np.float32)
        y = rng.standard_normal((B, P, N, 3)).astype(np.float32)
        return x, y
    centers = rng.uniform(-0.5, 0.5, (B, P, 1, 3)).astype(np.float32)
    pts = 0.15 * rng.uniform(-1, 1, (B, P, N, 3)).astype(np.float32)
    y = centers + pts
    if scenario == 'assembled':
        x = y + 0.05 * rng.standard_normal((B, P, N, 3)).astype(np.float32)
    elif scenario == 'separated':
        # multi-object / eval layout: parts spread over a 3x wider box
        centers2 = rng.uniform(-1.5, 1.5, (B, P, 1, 3)).astype(np.float32)
        x = centers2 + pts
    else:  # init: untrained pred leaves all parts piled near the origin
        x = pts + 0.02 * rng.standard_normal((B, P, 1, 3)).astype(np.float32)
    return x, y


def pair_stats(x, y):
    """Per-pair per-point min distances: m1[b,i,j,p] = min_q |x_ip - y_jq|,
    m2[b,j,i,q] = min_p (same matrix, other axis).  O(B P^2 N^2) flops --
    keep B small."""
    B, P, N, _ = x.shape
    m1 = np.empty((B, P, P, N), np.float32)
    m2 = np.empty((B, P, P, N), np.float32)
    for b in range(B):
        yb = y[b].reshape(P * N, 3)
        # squared distances via the matmul identity, in part-row blocks
        yy = (yb * yb).sum(-1)
        for i in range(P):
            xi = x[b, i]  # [N, 3]
            d = ((xi * xi).sum(-1)[:, None] + yy[None, :]
                 - 2.0 * xi @ yb.T)  # [N, P*N]
            d = d.reshape(N, P, N)  # axes (p, j, q)
            m1[b, i] = np.sqrt(np.maximum(d.min(axis=2), 0.0)).T  # [j, p]
    for b in range(B):
        xx = (x[b].reshape(P * N, 3) ** 2).sum(-1)
        for j in range(P):
            yj = y[b, j]
            d = ((yj * yj).sum(-1)[:, None] + xx[None, :]
                 - 2.0 * yj @ x[b].reshape(P * N, 3).T)
            d = d.reshape(N, P, N)  # axes (q, i, p)
            m2[b, j] = np.sqrt(np.maximum(d.min(axis=2), 0.0)).T  # [i, q]
    return m1, m2


def bounds(x, y):
    c1 = x.mean(axis=2)
    c2 = y.mean(axis=2)
    r1 = np.sqrt(((x - c1[:, :, None]) ** 2).sum(-1).max(axis=2))
    r2 = np.sqrt(((y - c2[:, :, None]) ** 2).sum(-1).max(axis=2))
    D = np.sqrt(((c1[:, :, None] - c2[:, None]) ** 2).sum(-1))
    rsum = r1[:, :, None] + r2[:, None, :]
    lb = np.maximum(D - rsum, 0.0)
    ub = D + rsum
    return lb, ub


def dynamic_tiles_one_side(lb_pair, m, gy):
    """Ideal ordered-scan tile count for ONE direction.

    lb_pair: [P, P] pair lower bounds (source part -> target part).
    m: [P, P, N] per-point min distance of source part i's points into
       target part j.  Returns visited single-direction tiles."""
    P = lb_pair.shape[0]
    G = P // gy
    lb_group = lb_pair.reshape(P, G, gy).min(axis=2)  # [P, G]
    visited = 0
    for i in range(P):
        order = np.argsort(lb_group[i], kind='stable')
        best = np.full(m.shape[2], np.inf, np.float32)
        for t, c in enumerate(order):
            # terminate BEFORE group c if its lb exceeds the running best
            # of every point (strict: ties must still be visited)
            if t > 0 and best.max() < lb_group[i, c]:
                break
            visited += 1
            gm = m[i, c * gy:(c + 1) * gy].min(axis=0)
            best = np.minimum(best, gm)
    return visited


def static_tiles(lb, ub, gy):
    """The shipped `_forward_pairs` keep rule, dual-direction tiles."""
    P = lb.shape[0]
    G = P // gy
    ub1 = ub.min(axis=1)  # [P] x-side upper bound
    ub2 = ub.min(axis=0)  # [P] y-side
    keep = (lb <= ub1[:, None]) | (lb <= ub2[None, :])
    return int(keep.reshape(P, G, gy).any(axis=2).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=8)
    ap.add_argument('--parts', type=int, default=20)
    ap.add_argument('--points', type=int, default=1000)
    ap.add_argument('--gy', type=int, default=5)
    args = ap.parse_args()
    B, P, N, gy = args.batch, args.parts, args.points, args.gy
    G = P // gy
    # single-direction tile cost relative to a dual tile: same MXU matmul,
    # one of the two min/argmin reduction sets (~3.4 + 10/2 vs ~3.4 + 10 us)
    SINGLE_COST = (3.4 + 5.0) / (3.4 + 10.0)

    out = {}
    for scenario in ['init', 'overlap', 'assembled', 'separated']:
        rng = np.random.default_rng(0)
        x, y = make_fixture(scenario, B, P, N, rng)
        m1, m2 = pair_stats(x, y)
        dense = B * P * G
        stat = dyn = 0.0
        for b in range(B):
            lb, ub = bounds(x[b:b + 1], y[b:b + 1])
            lb, ub = lb[0], ub[0]
            stat += static_tiles(lb, ub, gy)
            dyn += SINGLE_COST * (
                dynamic_tiles_one_side(lb, m1[b], gy)
                + dynamic_tiles_one_side(lb.T, m2[b], gy))
        out[scenario] = {
            'dense_tiles': dense,
            'static_kept_pct': round(100.0 * stat / dense, 1),
            'dynamic_cost_pct': round(100.0 * dyn / dense, 1),
            'dynamic_vs_static_speedup': round(stat / max(dyn, 1e-9), 2),
        }
        print(scenario, json.dumps(out[scenario]), flush=True)
    print(json.dumps({'B': B, 'P': P, 'N': N, 'gy': gy,
                      'single_tile_cost': round(SINGLE_COST, 3),
                      'results': out}))


if __name__ == '__main__':
    main()
