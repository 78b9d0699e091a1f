"""Producer-side pipeline throughput probe (no train step).

Drives the REAL loader exactly as bench.py does (native sampling, packed
f16 wire, producer-thread device_put + expand, optional G-batch grouping)
and measures how fast batches can be PRODUCED and materialized on device.
This is the host+wire ceiling the train step must hide behind device
compute.

Usage: MPA_BENCH_SPC=8 python scripts/bench_producer.py [--batches 48]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, default=48)
    ap.add_argument('--cfg', default='configs/pn_transformer/pn_transformer/'
                    'pn_transformer-32x1-cosine_400e-everyday.py')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import _ensure_data

    from multi_part_assembly_tpu.datasets import build_dataloader
    from multi_part_assembly_tpu.datasets.geometry import warm_unpack_cache
    from multi_part_assembly_tpu.parallel import make_mesh
    from multi_part_assembly_tpu.train.trainer import install_device_prep
    from multi_part_assembly_tpu.utils import load_cfg_file

    cfg = load_cfg_file(args.cfg)
    cfg.data.data_dir = _ensure_data('geometry')
    cfg.exp.num_workers = min(8, os.cpu_count() or 4)
    cfg.freeze()
    B = cfg.exp.batch_size
    mesh = make_mesh(batch_size=B)
    train_loader, _ = build_dataloader(cfg)
    assert getattr(train_loader, 'batch_collate', False)

    # pre-parse the mesh registry (bench.py warm-row protocol)
    ds = train_loader.dataset
    for i in range(len(ds)):
        for p in ds._mesh_files(i):
            ds.sampler.load(p)

    spc = int(os.environ.get('MPA_BENCH_SPC', '8'))
    warm_unpack_cache(B, cfg.data.max_num_part, cfg.data.num_pc_points,
                      mesh=mesh, data_keys=tuple(cfg.data.data_keys),
                      wire_dtype=jnp.dtype(
                          cfg.data.get('wire_dtype', 'float16')),
                      expand=True, group_size=spc)
    install_device_prep(train_loader, cfg, mesh,
                        group_size=spc if spc > 1 else 1)

    def stream():
        e = 0
        while True:
            train_loader.set_epoch(e)
            for b in train_loader:
                yield b
            e += 1

    s = stream()
    # warmup one epoch's worth
    for _ in range(16 // max(1, spc) if spc > 1 else 16):
        next(s)

    n = 0
    t0 = time.perf_counter()
    last = None
    while n < args.batches:
        item = next(s)
        g = int(item.get('__group__', 1))
        n += g
        last = item
    # force materialization of the last group (drains the dispatch chain)
    key = next(k for k in last
               if not k.startswith('__') and getattr(last[k], 'size', 0))
    float(np.asarray(last[key]).ravel()[0])
    dt = time.perf_counter() - t0
    print(f'producer: {n} batches in {dt * 1e3:.1f} ms '
          f'-> {dt / n * 1e3:.2f} ms/batch '
          f'({B * n / dt:.0f} samples/s) at spc={spc}')


if __name__ == '__main__':
    main()
