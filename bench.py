"""Throughput benchmark: PN-Transformer train step on Breaking-Bad-shaped
batches, real TPU chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline note: the reference publishes no throughput numbers
(BASELINE.md).  REF_A100_SPS below is an engineering estimate of the
PyTorch reference's train samples/sec on one A100 for the PN-Transformer
everyday config (batch 32, fp16): its step is dominated by the dense
20000x20000 CUDA chamfer in shape_cd_loss plus per-part encoder work; with
dataloader overlap the reference sustains on the order of ~150 samples/s.
The north-star target is >= 4x that per chip (BASELINE.json).
"""

import json
import time

import numpy as np

REF_A100_SPS = 150.0

# everyday-like part-count mix (most shapes 2-6 parts, tail to 20)
PART_COUNT_POOL = [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 10, 12,
                   16, 20]


def main():
    import jax
    import jax.numpy as jnp

    from multi_part_assembly_tpu.datasets import augment_geometry_batch
    from multi_part_assembly_tpu.models import build_model
    from multi_part_assembly_tpu.parallel import (make_mesh, make_train_step,
                                                  shard_batch)
    from multi_part_assembly_tpu.train import create_train_state
    from multi_part_assembly_tpu.utils import CN

    B, P, N = 32, 20, 1000
    cfg = CN()
    cfg.exp = CN({'batch_size': B, 'num_epochs': 400, 'val_every': 10,
                  'seed': 0})
    cfg.data = CN({'dataset': 'geometry', 'max_num_part': P,
                   'num_pc_points': N, 'data_keys': ('part_ids', ),
                   'rot_range': -1.})
    cfg.optimizer = CN({'lr': 1e-3, 'weight_decay': 0., 'warmup_ratio': 0.05,
                        'clip_grad': None, 'lr_scheduler': 'cosine',
                        'lr_decay_factor': 100.})
    cfg.model = CN({'name': 'pn_transformer', 'rot_type': 'quat',
                    'pc_feat_dim': 256, 'encoder': 'pointnet',
                    'transformer_feat_dim': 1024, 'transformer_heads': 8,
                    'transformer_layers': 4, 'transformer_pre_ln': True})
    cfg.loss = CN({'noise_dim': 0, 'sample_iter': 1, 'trans_loss_w': 1.,
                   'rot_pt_cd_loss_w': 10., 'transform_pt_cd_loss_w': 10.,
                   'use_rot_loss': True, 'rot_loss_w': 0.2,
                   'use_rot_pt_l2_loss': True, 'rot_pt_l2_loss_w': 1.})
    cfg.freeze()

    rng = np.random.RandomState(0)
    nparts = np.asarray(
        [PART_COUNT_POOL[rng.randint(len(PART_COUNT_POOL))]
         for _ in range(B)])
    valids = (np.arange(P)[None] < nparts[:, None]).astype(np.float32)
    # fracture-like parts: each piece is a small cloud at a distinct offset
    # within the unit object (real Breaking-Bad pieces have distinct
    # centroids, which the GT translations encode)
    offsets = (rng.randn(B, P, 1, 3) * 0.3).astype(np.float32)
    raw = ((rng.randn(B, P, N, 3) * 0.1).astype(np.float32) + offsets) * \
        valids[:, :, None, None]

    mesh = make_mesh(batch_size=B)
    model = build_model(cfg)

    def make_batch(key):
        aug = augment_geometry_batch(
            jnp.asarray(raw), jnp.asarray(valids), key)
        return {
            **aug,
            'part_valids': jnp.asarray(valids),
            'part_label': jnp.zeros((B, P, 0), jnp.float32),
            'instance_label': jnp.zeros((B, P, 0), jnp.float32),
            'part_ids': jnp.zeros((B, P), jnp.int32),
            'valid_matrix': jnp.asarray(
                valids[:, :, None] * valids[:, None, :]),
        }

    batch = shard_batch(
        jax.tree_util.tree_map(np.asarray, make_batch(jax.random.PRNGKey(0))),
        mesh)
    state, tx, _ = create_train_state(
        model, cfg, batch, jax.random.PRNGKey(0), steps_per_epoch=100)
    train_step = make_train_step(model, tx, cfg, mesh, donate=True)

    # warmup / compile
    for i in range(3):
        state, logs = train_step(state, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(logs['loss'])

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        state, logs = train_step(state, batch, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(logs['loss'])
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    sps_per_chip = (B * n_iters) / dt / max(1, n_chips)
    print(json.dumps({
        'metric': 'pn_transformer_everyday_train_samples_per_sec_per_chip',
        'value': round(sps_per_chip, 2),
        'unit': 'samples/s/chip',
        'vs_baseline': round(sps_per_chip / REF_A100_SPS, 3),
    }))


if __name__ == '__main__':
    main()
