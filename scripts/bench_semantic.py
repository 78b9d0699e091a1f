"""Component breakdown of the semantic (PartNet) train-step device time.

The partnet bench row is the slowest per-sample (187ms/step round 3);
this isolates WHERE the device time goes so optimization effort lands on
the right sub-path:

  - lap:      the device-side Jonker-Volgenant solve alone ([S*B, P, P])
  - cost:     the P x P pair-chamfer cost matrix alone (einsum + 2 mins)
  - match:    full match_parts (cost + LAP + permute), vmapped over S
  - cd_loss:  rot_pt_cd + shape_cd chamfer losses, vmapped over S
  - mon_fwd:  forward mon_loss for the pn_transformer partnet model
  - mon_grad: value_and_grad of the same (the real train-step core)

All timings use the chained fresh-args method from bench_chamfer
(the axon runtime caches (executable, argument-values) repeats and defers
execution until a host value fetch; see ROADMAP gotchas).

Usage:
    python scripts/bench_semantic.py [--batch 32] [--samples 5] [--parts 20]
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np

from bench_chamfer import timed_chain  # noqa: E402  (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--samples', type=int, default=5)
    ap.add_argument('--parts', type=int, default=20)
    ap.add_argument('--points', type=int, default=1000)
    ap.add_argument('--only', default='',
                    help='comma list of component names to run')
    args = ap.parse_args()

    import jax
    if os.environ.get('MPA_PLATFORM'):  # CPU smoke: MPA_PLATFORM=cpu
        jax.config.update('jax_platforms', os.environ['MPA_PLATFORM'])
    import jax.numpy as jnp

    from multi_part_assembly_tpu.ops import matching as M

    B, S, P, N = args.batch, args.samples, args.parts, args.points
    rng = np.random.default_rng(0)

    # partnet-chair-like batch: ~60% of parts valid, match groups of 2-4
    nparts = rng.integers(P // 2, P + 1, B)
    valids = (np.arange(P)[None] < nparts[:, None]).astype(np.float32)
    match_ids = (rng.integers(0, 4, (B, P)) * valids).astype(np.int32)
    pcs = (rng.standard_normal((B, P, N, 3)) * 0.3).astype(np.float32)
    q = rng.standard_normal((B, P, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)

    pcs_d = jnp.asarray(pcs)
    gt_q = jnp.asarray(q)
    gt_t = jnp.asarray((rng.standard_normal((B, P, 3)) * 0.1)
                       .astype(np.float32))
    valids_d = jnp.asarray(valids)
    mid = jnp.asarray(match_ids)

    def fresh_pred(seed):
        """Fresh predicted poses (argument values must change per timed
        call; the runtime result-caches identical repeats)."""
        r = np.random.default_rng(seed)
        pq = r.standard_normal((S, B, P, 4)).astype(np.float32)
        pq /= np.linalg.norm(pq, axis=-1, keepdims=True)
        pt = (r.standard_normal((S, B, P, 3)) * 0.1).astype(np.float32)
        return jnp.asarray(pq), jnp.asarray(pt)

    def chain(body_one, k):
        """k dependency-chained invocations; couples via 1e-30 * prev
        (0.0 * prev gets strength-reduced + DCE'd, ROADMAP gotcha)."""
        @jax.jit
        def f(pq, pt):
            acc = jnp.float32(0.0)
            for i in range(k):
                acc = body_one(pq + 1e-30 * acc, pt + 1e-30 * acc)
            return acc
        return f

    results = {}

    def bench(name, body_one):
        if args.only and name not in args.only.split(','):
            return
        ms = timed_chain(functools.partial(chain, body_one), fresh_pred)
        results[name] = ms
        print(f'{name:10s} {ms:8.2f} ms', flush=True)

    # --- lap alone: random block-masked costs, same sparsity as real ---
    same = (mid[:, :, None] == mid[:, None, :]) & (mid[:, :, None] > 0)
    eye = jnp.eye(P, dtype=bool)[None]

    def lap_one(pq, pt):
        c = jnp.abs(pq[..., 0][..., :, None] - pt[..., 0][..., None, :])
        cost = jnp.where(same[None], c, 1e9)  # [S, B, P, P]
        cost = jnp.where(eye[None] & ~(mid[None, :, :, None] > 0), 0.0,
                         cost)
        perm = M.solve_lap(cost)
        return jnp.sum(perm).astype(jnp.float32)

    bench('lap', lap_one)

    # --- subsample + pose transform alone (the match_parts preamble;
    # isolates the one-hot row-selection vs fancy-index gather cost) ---
    from multi_part_assembly_tpu.utils.transforms import transform_pc

    def sub_one(pq, pt):
        import jax.random as jr
        idx = jr.permutation(jr.PRNGKey(0), N)[:100]
        sel = (idx[:, None] ==
               jnp.arange(N, dtype=idx.dtype)[None]).astype(jnp.float32)
        pts = jnp.einsum('sn,bpnc->bpsc', sel, pcs_d,
                         precision=jax.lax.Precision.HIGHEST)
        out = jax.vmap(lambda qq, tt: transform_pc(tt, qq, pts,
                                                   rot_type='quat'))(pq, pt)
        return jnp.sum(out)

    bench('sub', sub_one)

    # --- cost matrix alone (einsum + two min-reductions) ---
    sub = pcs_d[:, :, :100]

    def cost_one(pq, pt):
        pred = jax.vmap(lambda qq, tt: transform_pc(tt, qq, sub,
                                                    rot_type='quat'))(pq, pt)
        gt = transform_pc(gt_t, gt_q, sub, rot_type='quat')
        c = jax.vmap(M._pair_chamfer_cost, in_axes=(0, None))(pred, gt)
        return jnp.sum(c)

    bench('cost', cost_one)

    # --- full match_parts over S MoN samples ---
    def match_one(pq, pt):
        def one(k, qq, tt):
            nt, nr = M.match_parts(pcs_d, tt, qq, gt_t, gt_q, mid, k,
                                    'quat')
            return jnp.sum(nt) + jnp.sum(nr)
        keys = jax.random.split(jax.random.PRNGKey(0), S)
        return jnp.sum(jax.vmap(one)(keys, pq, pt))

    bench('match', match_one)

    # --- chamfer losses over S samples ---
    from multi_part_assembly_tpu.utils.loss import (rot_points_cd_loss,
                                                    shape_cd_loss)
    from multi_part_assembly_tpu.utils.rotation import Rotation3D

    def cd_one(pq, pt):
        def one(qq, tt):
            pr = Rotation3D(qq, 'quat')
            gr = Rotation3D(gt_q, 'quat')
            l1 = rot_points_cd_loss(pcs_d, pr, gr, valids_d)
            l2 = shape_cd_loss(pcs_d, tt, gt_t, pr, gr, valids_d,
                               training=True)
            return jnp.sum(l1) + jnp.sum(l2)
        return jnp.sum(jax.vmap(one)(pq, pt))

    bench('cd_loss', cd_one)

    # --- full MoN loss fwd and grad for the partnet pn_transformer ---
    from multi_part_assembly_tpu.models import build_model
    from multi_part_assembly_tpu.train import mon_loss
    from multi_part_assembly_tpu.utils import load_cfg_file
    cfg = load_cfg_file('configs/pn_transformer/pn_transformer/'
                        'pn_transformer-32x1-cosine_400e-partnet_chair.py')
    cfg.exp.batch_size = B
    cfg.data.max_num_part = P
    cfg.loss.sample_iter = S
    cfg.freeze()
    model = build_model(cfg)
    n_class = 57  # partnet chair part classes; any fixed width works here
    batch = {
        'part_pcs': pcs_d,
        'part_quat': gt_q,
        'part_trans': gt_t,
        'part_valids': valids_d,
        'match_ids': mid.astype(jnp.float32),
        'part_label': jnp.zeros((B, P, n_class), jnp.float32),
        'instance_label': jnp.zeros((B, P, 20), jnp.float32),
        'part_ids': jnp.zeros((B, P), jnp.int32),
        'valid_matrix': jnp.asarray(valids[:, :, None] * valids[:, None, :]),
    }
    variables = model.init(
        {'params': jax.random.PRNGKey(0), 'noise': jax.random.PRNGKey(1),
         'dropout': jax.random.PRNGKey(2)}, batch, train=True)
    params = variables['params']
    stats = variables.get('batch_stats', {})

    def mon_fwd_one(pq, pt):
        b = dict(batch)
        b['part_trans'] = gt_t + 1e-30 * jnp.sum(pt)
        loss, _, _ = mon_loss(model, params, stats, b,
                              jax.random.PRNGKey(3), cfg=cfg, training=True)
        return loss

    bench('mon_fwd', mon_fwd_one)

    def mon_grad_one(pq, pt):
        b = dict(batch)
        b['part_trans'] = gt_t + 1e-30 * jnp.sum(pt)

        def lf(p):
            loss, _, _ = mon_loss(model, p, stats, b, jax.random.PRNGKey(3),
                                  cfg=cfg, training=True)
            return loss
        loss, grads = jax.value_and_grad(lf)(params)
        return loss + 1e-30 * jax.tree_util.tree_reduce(
            lambda a, g: a + jnp.sum(g), grads, jnp.float32(0.0))

    bench('mon_grad', mon_grad_one)

    import json
    print('SEMBENCH ' + json.dumps({k: round(v, 2)
                                    for k, v in results.items()}))


if __name__ == '__main__':
    main()
