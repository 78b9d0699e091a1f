"""Throughput benchmark on the real TPU chip, pipeline-inclusive.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Protocol (VERDICT r1 #4: no cached-batch shortcuts):
  - data streams through the REAL pipeline: synthetic on-disk datasets in
    the reference formats (Breaking-Bad fracture dirs / PartNet npy),
    native C++ mesh sampler, thread-prefetch DataLoader, host->device
    transfer, device-side augmentation fused into the jitted train step;
  - three rows: PN-Transformer everyday (flagship, the headline metric),
    DGL everyday (the reference's slowest path: dense PxP edge MLP x3
    iters), PN-Transformer PartNet chair (semantic p<=20 regime incl.
    on-device Hungarian matching);
  - an XLA-cost-analysis MFU estimate against the chip's bf16 peak.

Baseline note: the reference publishes NO throughput numbers (BASELINE.md).
REF_A100_SPS is an engineering ESTIMATE of the torch reference's train
samples/s on one A100 (batch 32, fp16, dataloader overlap; step dominated
by the dense 20000^2 CUDA chamfer) -- `vs_baseline` is therefore an
estimate, labeled as such in `vs_baseline_note`.

Env: MPA_BENCH_MODELS=pn_transformer_everyday[,dgl_everyday,...] to subset.
"""

import json
import os
import time

import numpy as np

REF_A100_SPS = 150.0  # ESTIMATE; reference publishes no throughput
_BF16_PEAK_FLOPS = {  # per chip
    'v4': 275e12,
    'v5e': 197e12, 'v5litepod': 197e12, 'v5 litepod': 197e12,
    'v5 lite': 197e12,  # device_kind reads "TPU v5 lite"
    'v5p': 459e12,
    'v6e': 918e12, 'trillium': 918e12,
}

BENCH_MODELS = {
    'pn_transformer_everyday': {
        'cfg': 'configs/pn_transformer/pn_transformer/'
               'pn_transformer-32x1-cosine_400e-everyday.py',
        'kind': 'geometry',
    },
    'dgl_everyday': {
        'cfg': 'configs/dgl/dgl-32x1-cosine_200e-everyday.py',
        'kind': 'geometry',
    },
    'pn_transformer_partnet': {
        'cfg': 'configs/pn_transformer/pn_transformer/'
               'pn_transformer-32x1-cosine_400e-partnet_chair.py',
        'kind': 'partnet',
    },
    'lstm_everyday': {  # the sequential (GRU-scan) architecture family
        'cfg': 'configs/lstm/lstm-32x1-cosine_200e-everyday.py',
        'kind': 'geometry',
    },
    'global_everyday': {
        'cfg': 'configs/global/global-32x1-cosine_200e-everyday.py',
        'kind': 'geometry',
    },
    'rgl_net_everyday': {
        'cfg': 'configs/rgl_net/rgl_net-32x1-cosine_200e-everyday.py',
        'kind': 'geometry',
    },
    'pn_transformer_refine_everyday': {
        'cfg': 'configs/pn_transformer/pn_transformer_refine/'
               'pn_transformer_refine-32x1-cosine_400e-everyday.py',
        'kind': 'geometry',
    },
    'identity_everyday': {  # free floor: loss+pipeline with a no-op model
        'cfg': 'configs/identity/identity-32x1-cosine_200e-everyday.py',
        'kind': 'geometry',
    },
    # cold-cache row (VERDICT r2 weak-2): the C++ mesh registry is evicted
    # every epoch, so each epoch re-pays OBJ parse + file IO like a
    # real-scale dataset (~34k fractures) whose meshes outrun RAM
    'pn_transformer_everyday_cold': {
        'cfg': 'configs/pn_transformer/pn_transformer/'
               'pn_transformer-32x1-cosine_400e-everyday.py',
        'kind': 'geometry',
        'cold': True,
    },
    # encoder-arch rows (VERDICT r4 next-6): the flagship config with the
    # two non-pointnet encoders, so all four archs have tracked sps.
    # These run LAST: their exact-parity memory floors sit near the HBM
    # edge (AOT temp at batch 32: dgcnn 7.7GB, pn2ssg 13.8GB -- the
    # reference pays the same blowups on GPU, dgcnn.py:18-38), so a
    # worker OOM here must not poison the other rows' timed windows.
    'pn_transformer_everyday_dgcnn': {
        'cfg': 'configs/pn_transformer/pn_transformer/'
               'pn_transformer-32x1-cosine_400e-everyday.py',
        'kind': 'geometry',
        'opts': ['model.encoder', 'dgcnn'],
    },
    # batch 16: the grouped-MLP forward peak is inherent to the exact
    # algorithm ([B*P, 512, 64, 128] activations; 13.8GB AOT temp at
    # batch 32 > the chip) -- the reference OOMs the same way on a 16GB
    # GPU.  sps is per-sample comparable across batch sizes.
    'pn_transformer_everyday_pn2ssg': {
        'cfg': 'configs/pn_transformer/pn_transformer/'
               'pn_transformer-32x1-cosine_400e-everyday.py',
        'kind': 'geometry',
        'opts': ['model.encoder', 'pointnet2_ssg',
                 'exp.batch_size', '16'],
    },
    # real-scale data-plane stress (VERDICT r4 next-4): ~3200 shapes /
    # ~12.7k pieces with a SKEWED face-count mix (70% small, 5% up to
    # 4.8k-face meshes) -- exercises chunked-table auto-selection under
    # the HBM budget, the persistent sidecar cache, and loader throughput
    # at Breaking-Bad-like scale.  `optional`: one-time dataset build is
    # ~7 min; run with MPA_BENCH_MODELS=pn_transformer_everyday_scale.
    'pn_transformer_everyday_scale': {
        'cfg': 'configs/pn_transformer/pn_transformer/'
               'pn_transformer-32x1-cosine_400e-everyday.py',
        'kind': 'geometry_scale',
        'optional': True,
    },
}
PRIMARY = 'pn_transformer_everyday'

# everyday-like part-count mix (most shapes 2-6 parts, tail to 20)
GEOMETRY_PART_POOL = [2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 10,
                      12, 16, 20]


def _ensure_data(kind):
    """Build the on-disk synthetic dataset once (reference formats)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), 'scripts'))
    from make_synthetic_data import generate, generate_partnet
    smoke = bool(os.environ.get('MPA_BENCH_SMOKE'))
    root = os.environ.get('MPA_BENCH_DATA', '/tmp/mpa_bench_data')
    # v2: 512 shapes (16 batches/epoch -- the round-2 128-shape set gave
    # 4-batch epochs, so the pipeline restarted before reaching steady
    # state) and detail=8 meshes (~390 verts/piece, realistic parse cost)
    path = os.path.join(root, kind + ('_smoke' if smoke else '_v2'))
    marker = os.path.join(path, '.done')
    if os.path.exists(marker):
        return path
    os.makedirs(path, exist_ok=True)
    if kind == 'geometry_scale':
        # Breaking-Bad-scale stress set (VERDICT r4 next-4): ~3200 shapes,
        # ~12.7k pieces, SKEWED face counts (detail 2..20 -> 48..4800 tris
        # per piece, 70/25/5 small/medium/large) -- the real dataset walks
        # ~34k fracture dirs with heavy-tailed mesh sizes
        # (geometry_data.py:48-71)
        rng = np.random.default_rng(7)
        n_shapes = 3200
        details = rng.choice(
            [2, 3, 4, 6, 8, 10, 12, 16, 20], n_shapes,
            p=[.25, .25, .20, .12, .08, .05, .025, .015, .01])
        parts = rng.choice([2, 2, 3, 3, 3, 4, 4, 5, 6, 8], n_shapes)
        for i in range(n_shapes):
            generate(path, n_shapes=1, min_parts=int(parts[i]),
                     max_parts=int(parts[i]), seed=i,
                     category=f'S{i:04d}', detail=int(details[i]))
        cats = sorted(d for d in os.listdir(path)
                      if os.path.isdir(os.path.join(path, d)))
        lines = [f'{c}/obj000' for c in cats]
        for split in ('train', 'val'):
            with open(os.path.join(path, f'everyday.{split}.txt'), 'w') as f:
                f.write('\n'.join(lines) + '\n')
    elif kind == 'geometry':
        rng = np.random.default_rng(0)
        # write per-shape part counts from the everyday-like pool by
        # generating in groups (generate() draws uniform in [min, max])
        n_shapes = 16 if smoke else 512
        for i, n in enumerate(rng.choice(GEOMETRY_PART_POOL, n_shapes)):
            generate(path, n_shapes=1, min_parts=int(n), max_parts=int(n),
                     seed=i, category=f'S{i:03d}',
                     detail=1 if smoke else 8)
        # generate() overwrites the txt lists per call; rebuild them
        cats = sorted(d for d in os.listdir(path)
                      if os.path.isdir(os.path.join(path, d)))
        lines = [f'{c}/obj000' for c in cats]
        for split in ('train', 'val'):
            with open(os.path.join(path, f'everyday.{split}.txt'), 'w') as f:
                f.write('\n'.join(lines) + '\n')
    else:
        generate_partnet(path, n_shapes=16 if smoke else 256,
                         min_parts=3, max_parts=8 if smoke else 20,
                         num_points=64 if smoke else 1000, seed=0,
                         split_prefix='Chair.')
    with open(marker, 'w') as f:
        f.write('ok')
    return path


def _chamfer_flops_per_step(cfg, dataset):
    """Analytic FLOPs of the pallas chamfer kernels for ONE train step.

    XLA `cost_analysis` does NOT see inside mosaic custom calls unless the
    pallas_call carries an explicit CostEstimate (verified on-chip r5: a
    plain kernel reports flops=None, one with CostEstimate reports the
    given number) -- so every BENCH_r01..r04 `mfu_pct` undercounted the
    chamfer, which is ~75% of semantic device time.  This model counts the
    fused kernels' MXU tiles from the DATASET's actual part-count
    distribution (per-batch tile counts are data-dependent), so the
    estimate matches what the average benched step really launches:

      per loss pass per element with n valid parts
        rot_pt_cd   (diag):  n tiles of [npad, npad]
        transform_pt_cd (whole-shape): n*ceil(n/gy) tiles of [npad, gy*npad]
      per tile elem:  fwd = K=48 bf16 matmul (2*48) + min/argmin (~6)
                      bwd = witness-weight build (~6) + two skinny
                            matmuls (2*2*3) + row/col sums (~2)
      per step: x sample_iter (MoN vmaps fwd AND bwd over all samples)
                x T loss passes (all-iter supervision: gnn_iter /
                  refine_steps; reference dgl/network.py:284-293)

    Upper-bound caveats (documented, small in the bench regime): forward
    tile pruning keeps ~99-100% of tiles on fragment data (ROADMAP item
    9), and backward visits witness-LINKED tiles <= the dense count.
    The device-sampler's alias-table draws are not counted (no matmuls).
    """
    from multi_part_assembly_tpu.ops.chamfer import _pick_gy, _round_up
    N = cfg.data.num_pc_points
    P = cfg.data.max_num_part
    npad = _round_up(N, 128)
    gy = _pick_gy(P, npad)
    S = cfg.loss.get('sample_iter', 1)
    T = cfg.model.get('gnn_iter', None) or cfg.model.get('refine_steps', 1)
    counts = []
    try:
        if hasattr(dataset, '_mesh_files'):  # geometry
            counts = [len(dataset._mesh_files(i))
                      for i in range(len(dataset))]
        elif hasattr(dataset, '_load_raw'):  # partnet
            counts = [dataset._load_raw(s)['part_pcs'].shape[0]
                      for s in dataset.shape_ids]
    except Exception:
        pass
    if not counts:
        return None
    n = np.minimum(np.asarray(counts, np.float64), P)
    diag_tiles = n.mean()
    shape_tiles = (n * np.ceil(n / gy)).mean()
    FWD, BWD = 2 * 48 + 6, 6 + 12 + 2
    per_elem = (diag_tiles * npad * npad
                + shape_tiles * gy * npad * npad) * (FWD + BWD)
    return float(cfg.exp.batch_size * S * T * per_elem)


def bench_one(name, spec, n_iters=50):
    """Run one row with guaranteed teardown.

    Rows run sequentially in ONE process (the driver invokes bench.py
    once); without teardown each finished row leaves its producer threads
    parked on a full prefetch queue holding batches, the native mesh
    registry resident, and its HBM tables alive -- by the later rows the
    1-core host and the chip carry every earlier row's leftovers."""
    cleanup = []
    try:
        return _bench_one(name, spec, n_iters, cleanup)
    finally:
        for fn in reversed(cleanup):
            try:
                fn()
            except Exception:  # noqa: BLE001 -- teardown must not mask rows
                pass


def _bench_one(name, spec, n_iters, cleanup):
    import jax
    n_iters = int(os.environ.get('MPA_BENCH_ITERS', n_iters))

    from multi_part_assembly_tpu.datasets import build_dataloader
    from multi_part_assembly_tpu.models import build_model
    from multi_part_assembly_tpu.parallel import make_mesh
    from multi_part_assembly_tpu.parallel.mesh import (
        make_train_step_multi, make_train_step_stacked)
    from multi_part_assembly_tpu.train import create_train_state
    from multi_part_assembly_tpu.train.trainer import _prep_batch
    from multi_part_assembly_tpu.utils import load_cfg_file
    from multi_part_assembly_tpu.utils.precision import configure_precision

    cfg = load_cfg_file(spec['cfg'])
    if spec.get('opts'):
        cfg.merge_from_list(list(spec['opts']))
    cfg.data.data_dir = _ensure_data(spec['kind'])
    cfg.exp.num_workers = min(8, os.cpu_count() or 4)
    if os.environ.get('MPA_BENCH_SMOKE'):  # tiny CPU plumbing check
        cfg.data.num_pc_points = 64
        cfg.exp.batch_size = 8
        n_iters = 3
    cfg.freeze()
    configure_precision(cfg)

    B = cfg.exp.batch_size
    mesh = make_mesh(batch_size=B)
    model = build_model(cfg)
    train_loader, _ = build_dataloader(cfg)
    sampler = getattr(train_loader.dataset, 'sampler', None)
    if sampler is not None and hasattr(sampler, 'close'):
        cleanup.append(sampler.close)  # evict the native registry
    if cfg.data.dataset == 'geometry':
        # lay the fast wire out for the mesh's data axis (no-op on 1 chip)
        from multi_part_assembly_tpu.datasets.geometry import \
            configure_wire_shards
        configure_wire_shards(train_loader, mesh)

    reparse_bytes = None
    if spec.get('cold'):
        # evict the C++ parsed-mesh registry at every epoch boundary: each
        # epoch re-pays sidecar reload + file IO, modeling a real-scale
        # dataset whose meshes don't fit the RAM registry
        ds = train_loader.dataset
        # one UNTIMED pass to populate the persistent sidecar cache first:
        # a fresh container (the driver's capture) otherwise pays
        # first-sight OBJ parse + sidecar WRITES inside the first timed
        # epoch (BENCH_r04 recorded the cold row at 3.0x warm from exactly
        # this; steady state for a real-scale dataset is sidecar RE-loads,
        # which is what the eviction hook below re-pays every epoch)
        if hasattr(ds, '_mesh_files'):
            for i in range(len(ds)):
                for p in ds._mesh_files(i):
                    ds.sampler.load(p)
            ds.sampler.close()
        orig_set_epoch = ds.set_epoch

        def cold_set_epoch(e):
            ds.sampler.close()
            orig_set_epoch(e)

        ds.set_epoch = cold_set_epoch
        reparse_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(cfg.data.data_dir)
            for f in fs if f.endswith('.obj'))
    elif hasattr(train_loader.dataset, '_mesh_files'):
        # warm rows: pre-parse the whole registry so first-sight OBJ parse
        # doesn't leak into the timed window (one-time cost in real runs)
        ds = train_loader.dataset
        for i in range(len(ds)):
            for p in ds._mesh_files(i):
                ds.sampler.load(p)

    # steps-per-call grouping (geometry packed wire): the producer stacks
    # G collated batches into ONE device_put + ONE vmapped expand, and the
    # consumer runs them in ONE lax.scan'd G-step dispatch -- each RPC
    # through the remote runtime costs ~2-6ms of host CPU (measured), so
    # per-batch puts + dispatches bound the pipeline on this 1-core host
    spc = 1
    if (cfg.data.dataset == 'geometry'
            and getattr(train_loader, 'batch_collate', False)):
        default_spc = '1' if os.environ.get('MPA_BENCH_SMOKE') else '8'
        spc = int(os.environ.get('MPA_BENCH_SPC', default_spc))

    # partnet resident-HBM point table (datasets/part_table.py): the wire
    # carries part slot ids; grouping then applies to the semantic path too
    ptable = None
    if (cfg.data.dataset == 'partnet'
            and not os.environ.get('MPA_BENCH_HOST_WIRE')
            and not os.environ.get('MPA_BENCH_SMOKE')):
        from multi_part_assembly_tpu.datasets.partnet import \
            enable_device_table
        ptable = enable_device_table(train_loader, cfg, mesh=mesh)
        if ptable is not None:
            spc = int(os.environ.get('MPA_BENCH_SPC', '8'))

    # device-side mesh sampling (datasets/device_sampler.py): the wire
    # carries piece slot ids instead of point clouds.  The cold row keeps
    # the host wire on purpose -- it models the re-parse + full-wire
    # regime of datasets whose tables outgrow HBM.
    tables = None
    if (cfg.data.dataset == 'geometry' and not spec.get('cold')
            and getattr(train_loader, 'batch_collate', False)
            and not os.environ.get('MPA_BENCH_HOST_WIRE')):
        from multi_part_assembly_tpu.datasets.geometry import \
            enable_device_sampling
        tables = enable_device_sampling(train_loader, cfg, mesh=mesh)

    # warm every packed-hop Kpad bucket BEFORE the producer thread starts
    # (compiles + per-shape transfer setup must not land mid-stream), then
    # move the device hop into the producer thread so H2D overlaps compute
    if getattr(train_loader, 'batch_collate', False):
        import jax.numpy as jnp
        from multi_part_assembly_tpu.datasets.device_sampler import \
            warm_sample_cache
        from multi_part_assembly_tpu.datasets.geometry import \
            warm_unpack_cache
        from multi_part_assembly_tpu.train.trainer import install_device_prep
        if ptable is not None:
            from multi_part_assembly_tpu.datasets.part_table import \
                warm_gather_cache
            warm_gather_cache(ptable, B, cfg.data.max_num_part, mesh=mesh,
                              group_size=spc)
        elif tables is not None:
            warm_sample_cache(
                tables, B, cfg.data.max_num_part, cfg.data.num_pc_points,
                mesh=mesh, data_keys=tuple(cfg.data.data_keys),
                group_size=spc, interpret=tables.interpret,
                shards=mesh.shape['data'])
        else:
            warm_unpack_cache(
                B, cfg.data.max_num_part, cfg.data.num_pc_points, mesh=mesh,
                data_keys=tuple(cfg.data.data_keys),
                wire_dtype=jnp.dtype(cfg.data.get('wire_dtype', 'float16')),
                expand=cfg.data.dataset == 'geometry', group_size=spc,
                shards=mesh.shape['data']
                if cfg.data.dataset == 'geometry' else 1)
        install_device_prep(train_loader, cfg, mesh)

    def batches():
        """Endless stream through the real loader (fresh resample/epoch)."""
        epoch = 0
        while True:
            train_loader.set_epoch(epoch)
            for b in train_loader:
                yield b
            epoch += 1

    stream = batches()
    cleanup.append(stream.close)  # sets the loader's stop event
    host_first = next(stream)
    # init needs an augmented batch (part_pcs present); the timed loop
    # feeds raw batches so augmentation runs fused inside the step
    init_batch, _ = _prep_batch(host_first, cfg, mesh, jax.random.PRNGKey(0),
                                augment=True)
    first, _ = _prep_batch(host_first, cfg, mesh, jax.random.PRNGKey(0),
                           augment=False)
    state, tx, _ = create_train_state(
        model, cfg, init_batch, jax.random.PRNGKey(0),
        steps_per_epoch=max(1, len(train_loader)))
    train_step, _ = make_train_step_stacked(model, tx, cfg, mesh,
                                            donate=True)

    # AOT-compile once; the same executable serves the FLOP estimate and
    # the timed loop (a second traced call would compile a second copy)
    train_step = train_step.lower(
        state, first, jax.random.PRNGKey(0)).compile()
    flops = None
    flops_xla = flops_chamfer = None
    try:
        cost = train_step.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_xla = float(cost.get('flops', 0.0)) or None
    except Exception:
        pass
    # cost_analysis misses pallas custom calls -- add the analytic chamfer
    # model (see _chamfer_flops_per_step; verified on-chip r5)
    flops_chamfer = _chamfer_flops_per_step(cfg, train_loader.dataset)
    if flops_xla or flops_chamfer:
        flops = (flops_xla or 0.0) + (flops_chamfer or 0.0)

    if os.environ.get('MPA_BENCH_COMPILE_ONLY'):
        # AOT memory report without executing -- for diagnosing rows that
        # crash the worker at first execution (compile-time accounting
        # passed, runtime allocation did not)
        row = {'compile_only': True}
        try:
            ma = train_step.memory_analysis()
            if isinstance(ma, (list, tuple)):
                ma = ma[0]
            for k in ('temp_size_in_bytes', 'argument_size_in_bytes',
                      'output_size_in_bytes', 'generated_code_size_in_bytes'):
                row[k] = int(getattr(ma, k, -1))
        except Exception as e:  # noqa: BLE001
            row['error'] = f'{type(e).__name__}: {e}'
        return row

    train_step_multi = None
    if spc > 1:
        # switch the producer to grouped mode; the multi step compiles on
        # the first real group during warmup (its jit cache entry must see
        # the REAL input shardings -- see warm_unpack_cache docstring)
        from multi_part_assembly_tpu.train.trainer import install_device_prep
        install_device_prep(train_loader, cfg, mesh, group_size=spc)
        train_step_multi, _ = make_train_step_multi(model, tx, cfg, mesh,
                                                    donate=True)
        stream = batches()  # restart so groups form from the epoch start
        n_iters = -(-n_iters // spc) * spc  # whole groups per window

    def run_window(n_steps, key0):
        """Dispatch-only loop over >= n_steps train steps; returns
        (wall_s, data_wait_s, steps_run).  The final VALUE fetch forces
        the whole chained window: under the axon remote runtime
        jax.block_until_ready confirms dispatch, not execution -- only a
        host value fetch drains the dependency chain, and the steps chain
        through the donated train state."""
        nonlocal state
        steps, data_t, last = 0, 0.0, None
        phases = {'key': 0.0, 'prep': 0.0, 'dispatch': 0.0, 'kick': 0.0}
        # the remote runtime starts EXECUTING dispatched work only when the
        # client flushes (a value fetch) -- without periodic kicks the whole
        # window's device time serializes after the loop (measured: drain
        # == sum of all step times, zero overlap with the producer).  A
        # LAGGED fetch (the kicker keeps kick_lag handles in flight) starts
        # the pipeline without blocking on the newest step.
        # defaults track Trainer's, which carry the measured grid evidence
        # (round 4: threaded every-2/lag-4 1118.1 sps vs blocking lag-2
        # 1097.0; round 3: blocking every-2/lag-2 867 vs 732 no-kick)
        from multi_part_assembly_tpu.train.trainer import (ExecutionKicker,
                                                           Trainer)
        # uniform env parse for the three knobs: unset -> Trainer default,
        # '' or '0' -> off/0, else int (ADVICE r4: MPA_BENCH_KICK used to
        # treat '' as default while MPA_BENCH_KICK_THREAD treated it as off)
        def _env_int(name, default):
            v = os.environ.get(name)
            return default if v is None else int(v or 0)
        kick_every = _env_int('MPA_BENCH_KICK', Trainer.KICK_EVERY)
        kick_lag = _env_int('MPA_BENCH_LAG', Trainer.KICK_LAG)
        threaded = bool(_env_int('MPA_BENCH_KICK_THREAD',
                                 Trainer.KICK_THREADED))
        kicker = ExecutionKicker(
            every=kick_every, lag=kick_lag, enabled=bool(kick_every),
            threaded=threaded)
        t0 = time.perf_counter()
        n_disp = 0
        while steps < n_steps:
            td = time.perf_counter()
            host = next(stream)
            t1 = time.perf_counter()
            data_t += t1 - td
            g = int(host.get('__group__', 1))
            key = jax.random.PRNGKey(key0 + steps)
            t2 = time.perf_counter()
            batch, _ = _prep_batch(host, cfg, mesh, key, augment=False)
            t3 = time.perf_counter()
            if g > 1:
                state, last = train_step_multi(state, batch, key)
            else:
                state, last = train_step(state, batch, key)
            t4 = time.perf_counter()
            phases['key'] += t2 - t1
            phases['prep'] += t3 - t2
            phases['dispatch'] += t4 - t3
            steps += g
            n_disp += 1
            if kick_every and os.environ.get('MPA_BENCH_KICK_ASYNC'):
                if n_disp % kick_every == 0:
                    last.copy_to_host_async()  # non-blocking flush?
            else:
                kicker.note(last)
            phases['kick'] += time.perf_counter() - t4
        td = time.perf_counter()
        float(np.asarray(last).reshape(-1)[0])  # drain the chain
        kicker.close()
        phases['drain'] = time.perf_counter() - td
        if os.environ.get('MPA_BENCH_TIMING'):
            import sys
            print({k: round(v / steps * 1e3, 2) for k, v in phases.items()},
                  f'(ms/step, window of {steps})', file=sys.stderr)
        return time.perf_counter() - t0, data_t, steps

    run_window(max(2, 2 * spc), key0=1)  # warmup (incl. multi-step compile)

    # repeat the timed window and keep the best: single 20-iter windows on
    # this 1-CPU host are +-10% noisy (scheduler jitter on the producer
    # threads); the best window is the honest steady-state capability
    repeats = 1 if os.environ.get('MPA_BENCH_SMOKE') else \
        int(os.environ.get('MPA_BENCH_REPEATS', 3))
    dt, data_t, n_steps = float('inf'), 0.0, n_iters
    for rep in range(repeats):
        rep_dt, rep_data_t, rep_steps = run_window(n_iters,
                                                   key0=100 * (rep + 1))
        if rep_dt / rep_steps < dt / n_steps:
            dt, data_t, n_steps = rep_dt, rep_data_t, rep_steps

    n_chips = jax.device_count()
    sps_chip = (B * n_steps) / dt / max(1, n_chips)
    row = {
        'samples_per_sec_per_chip': round(sps_chip, 2),
        'step_ms': round(dt / n_steps * 1e3, 2),
        'data_wait_ms': round(data_t / n_steps * 1e3, 2),
        'steps_per_call': spc,
        'wire': ('device-sampling' if tables is not None else
                 'device-table' if ptable is not None else 'packed-f16'),
    }
    if reparse_bytes is not None:
        row['cold_cache'] = True
        row['reparse_bytes_per_epoch'] = int(reparse_bytes)
    if flops:
        kind = jax.devices()[0].device_kind.lower()
        peak = next((v for k, v in _BF16_PEAK_FLOPS.items() if k in kind),
                    None)
        row['tflops_per_step'] = round(flops / 1e12, 3)
        if flops_chamfer:
            # provenance split: xla = cost_analysis (HLO ops), pallas =
            # analytic chamfer-kernel model (custom calls are invisible
            # to cost_analysis -- BENCH_r01..r04 mfu omitted this part)
            row['tflops_xla'] = round((flops_xla or 0.0) / 1e12, 3)
            row['tflops_pallas_est'] = round(flops_chamfer / 1e12, 3)
        if peak:
            row['mfu_pct'] = round(
                100.0 * flops * (n_steps / dt) / (peak * n_chips), 2)
    return row


def _tpu_reachable(timeout_s=240):
    """Probe backend init in a SUBPROCESS.

    A down axon tunnel makes jax.devices() hang ~10 minutes in-process
    (observed round 3); the driver's bench artifact is better served by a
    fast structured failure line than by an apparent hang.  Probe cost
    when the tunnel is healthy: one backend init (~20-30s).
    """
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, '-c', 'import jax; jax.devices()'],
            timeout=timeout_s, capture_output=True)
        err = (r.stderr or b'').decode('utf-8', 'replace')[-300:]
        return r.returncode == 0, err
    except subprocess.TimeoutExpired:
        return False, f'backend init timed out after {timeout_s}s ' \
            '(axon tunnel down?)'


def _h2d_probe_mbps():
    """Measured H2D bandwidth through the runtime, MiB/s (best of 3).

    The tunnel's H2D bandwidth is SESSION-dependent (ROADMAP item 3a:
    barrier-measured ~90MB/s to >400MB/s across sessions on identical
    code).  The cold row's packed wire (~1.2MB/batch) scales with it
    directly -- at 90MB/s the wire alone adds ~13ms/step -- so the
    driver's capture records the bandwidth it ran under.  Each probe
    puts FRESH values (the runtime caches repeated computations on
    argument values) and fetches a scalar (block_until_ready is
    dispatch-only under the remote runtime; only a fetch forces)."""
    import time

    import jax
    import jax.numpy as jnp

    def timed_put(nelem, val):
        a = np.full((nelem, ), val, np.float32)
        t0 = time.perf_counter()
        float(jnp.sum(jax.device_put(a)[:1]))
        return time.perf_counter() - t0

    try:
        timed_put(4, -1.0)  # compile the tiny sum once
        overhead = min(timed_put(4, float(r)) for r in range(3))
        nbytes = 8 * 1024 * 1024
        best = min(timed_put(nbytes // 4, 100.0 + r) for r in range(3))
        return round((nbytes / (1024.0 * 1024.0))
                     / max(best - overhead, 1e-6), 1)
    except Exception:  # noqa: BLE001 -- diagnostics must not kill the bench
        return None


def main():
    if os.environ.get('MPA_PLATFORM', '') != 'cpu' and \
            os.environ.get('MPA_BENCH_SKIP_PROBE', '') != '1':
        ok, err = _tpu_reachable()
        if not ok:
            print(json.dumps({
                'metric': 'pn_transformer_everyday_train_samples_per_sec'
                          '_per_chip',
                'value': 0.0, 'unit': 'samples/s/chip', 'vs_baseline': 0.0,
                'error': f'TPU unreachable: {err}',
            }))
            raise SystemExit(1)

    from multi_part_assembly_tpu.parallel import init_distributed
    init_distributed()  # honors MPA_PLATFORM/MPA_NUM_CPU_DEVICES overrides
    import jax
    h2d_mbps = _h2d_probe_mbps() \
        if jax.devices()[0].platform != 'cpu' else None
    only = os.environ.get('MPA_BENCH_MODELS', '')
    names = [n for n in only.split(',') if n] or [
        n for n, s in BENCH_MODELS.items() if not s.get('optional')]
    rows = {}
    for name in names:
        # one bad row must not kill the whole bench (the driver records
        # the single JSON line; the primary metric should survive, e.g.,
        # a transient tunnel failure on a later row)
        try:
            rows[name] = bench_one(name, BENCH_MODELS[name])
        except Exception as e:  # noqa: BLE001
            import traceback
            traceback.print_exc()
            rows[name] = {'error': f'{type(e).__name__}: {e}'}

    primary = rows.get(PRIMARY) or next(iter(rows.values()))
    if 'samples_per_sec_per_chip' not in primary:
        ok = [r for r in rows.values() if 'samples_per_sec_per_chip' in r]
        if not ok:
            print(json.dumps({
                'metric':
                    'pn_transformer_everyday_train_samples_per_sec_per_chip',
                'value': 0.0, 'unit': 'samples/s/chip', 'vs_baseline': 0.0,
                'error': primary.get('error', 'all rows failed'),
                'models': rows,
            }))
            raise SystemExit(1)
        primary = ok[0]
    sps = primary['samples_per_sec_per_chip']
    print(json.dumps({
        'metric': 'pn_transformer_everyday_train_samples_per_sec_per_chip',
        'value': sps,
        'unit': 'samples/s/chip',
        'vs_baseline': round(sps / REF_A100_SPS, 3),
        'vs_baseline_note': 'baseline is an ESTIMATE (~150 samples/s, '
                            'A100 fp16); reference publishes no throughput',
        'pipeline': 'loader+native-sampler+H2D+fused-augment included',
        'h2d_mbps': h2d_mbps,
        'h2d_note': 'tunnel H2D bandwidth is session-dependent (~90 to '
                    '>400 MiB/s observed); the COLD row ships ~1.2MB/batch '
                    'over the host wire, so its ratio to the warm rows '
                    '(device-sampling wire, KBs/batch) tracks this number',
        'dataset': 'synthetic-everyday v2: 512 shapes, realistic part-count '
                   'mix with a 10-20-part tail (chamfer cost ~P^2; rounds '
                   '<=2 benched an easier 128-shape low-P mix -- cross-round '
                   'sps are not comparable)',
        'models': rows,
    }))


if __name__ == '__main__':
    main()
