"""Isolated train-step device-time benchmark on the real TPU.

Separates DEVICE step time from the host pipeline: synthetic dense
batches (no loader), and the per-step cost comes from a dependency-chain
difference -- time(G=8 steps in one lax.scan executable) minus
time(G=1), divided by 7.  Fresh argument values per timed call (the axon
runtime serves identical (executable, args) repeats from a cache).

Usage:
    python scripts/bench_train_step.py [--cfg CFG] [--profile DIR]

With --profile, wraps the G=8 call in jax.profiler.trace (mine with
scripts/profile_summary.py; absolute times inflate ~3x, trust ranking).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULT_CFG = ('configs/pn_transformer/pn_transformer/'
               'pn_transformer-32x1-cosine_400e-everyday.py')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg', default=DEFAULT_CFG)
    ap.add_argument('--profile', default='')
    ap.add_argument('--chain', type=int, default=8)
    ap.add_argument('--opts', nargs='+', default=[],
                    help='cfg overrides, e.g. --opts model.encoder dgcnn')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multi_part_assembly_tpu.models import build_model
    from multi_part_assembly_tpu.parallel.mesh import make_train_step_multi
    from multi_part_assembly_tpu.train import create_train_state
    from multi_part_assembly_tpu.utils import load_cfg_file
    from multi_part_assembly_tpu.utils.precision import configure_precision

    cfg = load_cfg_file(args.cfg)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    configure_precision(cfg)
    B, P, N = (cfg.exp.batch_size, cfg.data.max_num_part,
               cfg.data.num_pc_points)
    model = build_model(cfg)

    # everyday-like part-count mix (same pool as bench.py's dataset)
    part_pool = np.asarray([2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8,
                            10, 12, 16, 20])

    def raw_batch(seed, G):
        rng = np.random.RandomState(seed)
        nparts = np.minimum(part_pool[rng.randint(0, len(part_pool),
                                                  (G, B))], P)
        valids = (np.arange(P)[None, None] <
                  nparts[..., None]).astype(np.float32)
        return {
            'part_pcs_raw': jnp.asarray(
                (rng.randn(G, B, P, N, 3) * 0.3).astype(np.float32)),
            'part_valids': jnp.asarray(valids),
            'part_label': jnp.zeros((G, B, P, 0), jnp.float32),
            'instance_label': jnp.zeros((G, B, P, 0), jnp.float32),
            'part_ids': jnp.asarray(
                rng.randint(0, 3, (G, B, P)), jnp.int32),
            'valid_matrix': jnp.asarray(
                valids[..., :, None] * valids[..., None, :]),
        }

    def one(d, g):  # [1, ...] -> [B, ...] slice for init
        return {k: v[g] for k, v in d.items()}

    from multi_part_assembly_tpu.datasets import augment_geometry_batch
    init_raw = one(raw_batch(0, 1), 0)
    aug = augment_geometry_batch(init_raw['part_pcs_raw'],
                                 init_raw['part_valids'],
                                 jax.random.PRNGKey(0))
    init_batch = {**{k: v for k, v in init_raw.items()
                     if k != 'part_pcs_raw'}, **aug}
    state, tx, _ = create_train_state(
        model, cfg, init_batch, jax.random.PRNGKey(0), steps_per_epoch=16)
    stepG, _ = make_train_step_multi(model, tx, cfg, mesh=None, donate=False)

    flops = None
    try:
        lowered = stepG.lower(state, raw_batch(1, 1), jax.random.PRNGKey(0))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get('flops', 0.0)) or None
    except Exception:
        pass

    def put(b):
        """Place a batch on device BEFORE timing and force the transfer:
        the H2D of a [G, B, P, N, 3] f32 batch through the remote tunnel
        is 10s-100s of ms and must not pollute the step timing.  A value
        fetch per leaf forces materialization (block_until_ready only
        confirms dispatch under the axon runtime)."""
        b = jax.device_put(b)
        for v in b.values():
            if v.size:
                float(np.asarray(v).ravel()[0])
        return b

    def run(G, seed):
        b = put(raw_batch(seed, G))
        _, logs = stepG(state, b, jax.random.PRNGKey(seed))
        float(np.asarray(logs).ravel()[0])  # drain (value fetch)

    # compile both executables (untimed)
    run(1, 10)
    run(args.chain, 11)

    def best(G, salt, reps=3):
        out = 1e9
        for r in range(reps):
            b = put(raw_batch(2000 + salt * 17 + r, G))
            key = jax.random.PRNGKey(salt * 100 + r)
            t0 = time.perf_counter()
            _, logs = stepG(state, b, key)
            float(np.asarray(logs).ravel()[0])
            out = min(out, time.perf_counter() - t0)
        return out

    t1 = best(1, 1)
    tG = best(args.chain, 2)
    per_step_ms = (tG - t1) / (args.chain - 1) * 1e3
    print(f'G=1 wall: {t1 * 1e3:.2f} ms   G={args.chain} wall: '
          f'{tG * 1e3:.2f} ms   per-extra-step: {per_step_ms:.2f} ms')
    if flops:
        print(f'flops/step: {flops / 1e12:.4f} TF   '
              f'implied MFU at per-step: '
              f'{flops / (per_step_ms / 1e3) / 197e12 * 100:.2f}% (v5e)')

    if args.profile:
        with jax.profiler.trace(args.profile):
            b = raw_batch(999, args.chain)
            _, logs = stepG(state, b, jax.random.PRNGKey(999))
            float(np.asarray(logs).ravel()[0])
        print(f'profile written to {args.profile}')


if __name__ == '__main__':
    main()
