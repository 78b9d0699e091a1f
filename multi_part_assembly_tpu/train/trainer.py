"""Training/eval harness.

Replaces the reference's PyTorch-Lightning Trainer wiring
(reference scripts/train.py:17-123): epoch loop driving the jitted
data-parallel step, validation every `val_every` epochs with
batch-size-weighted metric averaging (base_model.py:65-88), Orbax top-k
checkpointing monitored on `val/part_acc` with auto-resume
(train.py:56-63, 97-106), and JSONL/console logging (wandb's role;
train.py:74-79).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from ..datasets import augment_geometry_batch, build_dataloader
from ..datasets.geometry import expand_geometry_batch, unpack_parts
from ..models import build_model
from ..parallel.mesh import (make_eval_step_stacked, make_mesh,
                             make_train_step_stacked, shard_batch)
from .state import create_train_state

__all__ = ['Trainer', 'JSONLLogger', 'WandbLogger', 'build_logger',
           'ExecutionKicker']

_DROP_KEYS = ('data_id', 'shape_id')  # host-only metadata


class ExecutionKicker:
    """Lagged value-fetch kicks for the remote runtime.

    The axon runtime DEFERS EXECUTION of dispatched computations until the
    client flushes (any host value fetch): a dispatch-only loop leaves the
    device idle and the whole backlog serializes into the final fetch
    (measured round 3; jax.block_until_ready does NOT flush).  Every
    `every` dispatched handles, ONE value of a handle `lag` notes old is
    fetched: the flush starts device execution mid-loop, the lag keeps the
    fetch from blocking on fresh work, and the ~100ms per-flush runtime
    overhead amortizes.  Tuned on bench.py (every-2/lag-2: 867 vs 732
    samples/s no-kick; per-dispatch kicks or deeper lags were worse).

    `enabled=None` auto-disables on the CPU backend (eager-ish execution,
    kicks are pure overhead there).

    `threaded=True` moves the blocking fetch onto a daemon worker thread:
    the dispatch loop only enqueues the handle, so the ~100ms flush RPC
    overlaps the next dispatches instead of stalling them (the fetch
    releases the GIL while waiting on the runtime).  A small bounded
    queue applies backpressure if the runtime falls behind."""

    def __init__(self, every=2, lag=2, enabled=None, threaded=False):
        self.every = max(1, every)
        self.lag = max(1, lag)
        self.enabled = (jax.default_backend() != 'cpu'
                        if enabled is None else enabled)
        self._q = []
        self._n = 0
        self.kicked = 0  # fetches issued (observability/tests)
        self.threaded = threaded and self.enabled
        self._fetch_q = None
        if self.threaded:
            import queue
            import threading
            self._fetch_q = queue.Queue(maxsize=4)
            t = threading.Thread(target=self._drain, daemon=True,
                                 name='execution-kicker')
            t.start()

    def _fetch(self, handle):
        float(np.asarray(handle).reshape(-1)[0])
        self.kicked += 1

    def _drain(self):
        while True:
            h = self._fetch_q.get()
            try:
                if h is not None:
                    self._fetch(h)
            finally:
                self._fetch_q.task_done()
            if h is None:  # close() sentinel
                return

    def note(self, handle):
        """Register a dispatched device array; may issue one lagged fetch."""
        if not self.enabled:
            return
        self._n += 1
        if self._n % self.every:
            return
        self._q.append(handle)
        if len(self._q) > self.lag:
            h = self._q.pop(0)
            if self.threaded:
                self._fetch_q.put(h)
            else:
                self._fetch(h)

    def sync(self):
        """Wait until all enqueued threaded fetches have completed."""
        if self._fetch_q is not None:
            self._fetch_q.join()

    def close(self):
        """Finish queued fetches and stop the worker thread (callers that
        construct one kicker per epoch must close it, or threads pile up
        across epochs).  No-op when not threaded."""
        if self._fetch_q is not None:
            self._fetch_q.put(None)
            self._fetch_q.join()
            self._fetch_q = None
            self.threaded = False


class JSONLLogger:
    """Metric sink: one JSON object per line + console echo."""

    def __init__(self, log_dir, name='metrics', quiet=False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f'{name}.jsonl')
        self.quiet = quiet
        self._f = open(self.path, 'a')

    def log(self, record, step=None, echo=None):
        record = {k: (float(v) if hasattr(v, 'item') else v)
                  for k, v in record.items()}
        if step is not None:
            record['step'] = int(step)
        self._f.write(json.dumps(record) + '\n')
        self._f.flush()
        if echo and not self.quiet:
            msg = '; '.join(f'{k}: {record[k]:.6f}'
                            for k in echo if k in record)
            print(msg, flush=True)

    def log_assemblies(self, tag, gt_pcs, pred_pcs_list, valids, colors,
                       step=None, max_shapes=3):
        """3D assembly hook: scalar-only sinks no-op (the PLY export in
        Trainer._export_val_vis is the on-disk record); the wandb mirror
        overrides this with Object3D uploads (reference callback.py:30-35)."""

    def close(self):
        self._f.close()


class WandbLogger(JSONLLogger):
    """JSONL sink + wandb mirror (the reference's only observability
    channel, scripts/train.py:74-79).  Degrades to plain JSONL when the
    `wandb` package is absent (it is not in this image) or init fails, so
    enabling it is always safe."""

    def __init__(self, log_dir, name='metrics', quiet=False,
                 project='multi_part_assembly_tpu', run_name=None,
                 config=None):
        super().__init__(log_dir, name=name, quiet=quiet)
        self._wandb = None
        try:
            import wandb
            self._wandb = wandb.init(
                project=project, name=run_name, dir=log_dir,
                config=config, resume='allow')
        except Exception as e:  # absent package / offline / auth failure
            print(f'wandb unavailable ({e!r}); logging to JSONL only',
                  flush=True)

    def log(self, record, step=None, echo=None):
        super().log(record, step=step, echo=echo)
        if self._wandb is not None:
            numeric = {k: float(v) for k, v in record.items()
                       if isinstance(v, (int, float)) or hasattr(v, 'item')}
            self._wandb.log(numeric,
                            step=None if step is None else int(step))

    def log_assemblies(self, tag, gt_pcs, pred_pcs_list, valids, colors,
                       step=None, max_shapes=3):
        """Mirror sampled assemblies into the run as wandb.Object3D point
        clouds, the reference's per-val-epoch 3D logging
        (reference utils/callback.py:30-35 logs gt + one cloud per MoN
        sample).  Columns are xyzrgb via colorize_part_pc."""
        if self._wandb is None:
            return
        import wandb

        from ..utils.misc import colorize_part_pc
        gt = np.asarray(gt_pcs)
        valids = np.asarray(valids)
        colors = np.asarray(colors)
        objs = {}
        for b in range(min(max_shapes, gt.shape[0])):
            p = max(1, int(valids[b].sum()))
            objs[f'{tag}/gt_{b}'] = wandb.Object3D(
                colorize_part_pc(gt[b, :p], colors).reshape(-1, 6))
            for s, pred in enumerate(pred_pcs_list):
                objs[f'{tag}/pred{s}_{b}'] = wandb.Object3D(
                    colorize_part_pc(np.asarray(pred)[b, :p],
                                     colors).reshape(-1, 6))
        self._wandb.log(objs, step=None if step is None else int(step))

    def close(self):
        if self._wandb is not None:
            self._wandb.finish()
        super().close()


def build_logger(cfg, log_dir, quiet=False):
    """Logger factory: `cfg.exp.wandb: True` opts into the wandb mirror."""
    if cfg is not None and cfg.exp.get('wandb', False):
        return WandbLogger(
            log_dir, quiet=quiet,
            project=cfg.exp.get('wandb_project', 'multi_part_assembly_tpu'),
            run_name=cfg.exp.get('name', None))
    return JSONLLogger(log_dir, quiet=quiet)


def _pin_empty_leaves(batch, mesh, batch_axis=0):
    """Re-pin zero-size leaves (empty instance/part labels) to the batch
    spec.  XLA canonicalizes empty-array shardings to REPLICATED on the way
    out of the sharded wire hops, which misses the AOT step executables'
    P(...'data') contract.  Rather than resharding (a multi-process
    device_put of a differently-ordered sharding is unsupported), the leaf
    is rebuilt from host zeros -- free, it has no bytes.  batch_axis: which
    axis carries 'data' (1 for grouped [G, B, ...] batches)."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import put_sharded
    spec = P(*([None] * batch_axis + ['data']))
    n_proc = jax.process_count()
    out = {}
    for k, v in batch.items():
        if hasattr(v, 'size') and getattr(v, 'ndim', 0) > 0 and v.size == 0:
            local = list(v.shape)
            local[batch_axis] //= n_proc
            out[k] = put_sharded(np.zeros(local, v.dtype), mesh, spec)
        else:
            out[k] = v
    return out


def _prep_batch(batch, cfg, mesh, rng, augment=True):
    """Host batch -> device batch: pad to the mesh's data-axis multiple and
    shard.  Geometry batches carry raw points ('part_pcs_raw'); with
    augment=True the device-side augmentation (recenter + random rotation,
    the reference's per-sample CPU transform) runs here eagerly, otherwise
    it is fused into the compiled train/eval step (parallel/mesh.py
    `_maybe_augment`).

    Batches that already went through the producer-thread device prep
    (`install_device_prep`) carry a '__real_bs__' marker and pass through
    untouched (augment still applies when requested).

    Returns (device_batch, real_batch_size); rows past real_batch_size are
    edge-replicated padding (remainder val batches) to be sliced off after
    per-element eval.
    """
    if '__group__' in batch:  # device-ready G-step group (see group_prep)
        real_bs = batch['__real_bs__']
        return {k: v for k, v in batch.items()
                if k not in ('__real_bs__', '__group__')}, real_bs
    if '__real_bs__' in batch:  # device-ready from the producer thread
        real_bs = batch['__real_bs__']
        batch = {k: v for k, v in batch.items() if k != '__real_bs__'}
    elif 'part_counts' in batch:
        # minimal geometry wire: packed f16 rows (or, with device-side
        # sampling, just the piece slot ids) + per-sample counts; all
        # small keys derive on device (expand is its own small jitted fn,
        # so only IT recompiles across Kpad buckets -- the AOT-compiled
        # train/eval steps always see the fixed [B, P, N, 3] contract).
        # 2D counts = the multi-chip sharded wire: a leading [D] shard
        # axis, one row group per data-axis device (configure_wire_shards)
        counts = batch['part_counts']
        sharded_wire = counts.ndim == 2
        n_local = int(counts.shape[0]) if sharded_wire else 1
        n_expect = n_local * jax.process_count() if sharded_wire else 1
        assert mesh.shape['data'] == n_expect, (
            f'wire shard axis ({n_local} local shards x '
            f'{jax.process_count()} processes) does not match the mesh '
            f"data axis {mesh.shape['data']}; call configure_wire_shards "
            'after make_mesh')
        real_bs = int(batch.pop('real_bs',
                                counts.size if sharded_wire
                                else counts.shape[0]))
        tables = batch.get('__tables__')
        device = {k: v for k, v in batch.items()
                  if k not in _DROP_KEYS and k != '__tables__'}
        device = shard_batch(device, mesh)
        if tables is not None:  # slot wire: the device samples the meshes
            from ..datasets.device_sampler import (sample_and_expand,
                                                   sample_and_expand_sharded)
            if sharded_wire:
                batch = sample_and_expand_sharded(
                    tables.table, tables.n_faces,
                    device['part_slots__packed'], device['part_counts'],
                    device['sample_seed'], mesh,
                    n_points=int(cfg.data.num_pc_points),
                    max_parts=int(cfg.data.max_num_part),
                    data_keys=tuple(cfg.data.data_keys),
                    interpret=tables.interpret)
            else:
                batch = sample_and_expand(
                    tables.table, tables.n_faces,
                    device['part_slots__packed'], device['part_counts'],
                    jnp.asarray(batch['sample_seed'], jnp.int32),
                    n_points=int(cfg.data.num_pc_points),
                    max_parts=int(cfg.data.max_num_part),
                    data_keys=tuple(cfg.data.data_keys),
                    interpret=tables.interpret)
        elif sharded_wire:
            from ..datasets.geometry import expand_geometry_batch_sharded
            batch = expand_geometry_batch_sharded(
                device['part_pcs_raw__packed'], device['part_counts'],
                max_parts=int(cfg.data.max_num_part),
                data_keys=tuple(cfg.data.data_keys))
        else:
            batch = expand_geometry_batch(
                device['part_pcs_raw__packed'], device['part_counts'],
                max_parts=int(cfg.data.max_num_part),
                data_keys=tuple(cfg.data.data_keys))
    else:
        # resident-table wire (partnet): slots gather the clouds from HBM
        # after sharding; everything else is the ordinary dense path
        ptable = batch.pop('__ptable__', None)
        batch = {k: np.asarray(v) for k, v in batch.items()
                 if k not in _DROP_KEYS}
        real_bs = batch['part_valids'].shape[0]
        n_data = mesh.shape['data']
        padded = -(-real_bs // n_data) * n_data
        if padded != real_bs:
            batch = {
                k: np.concatenate(
                    [v] + [v[-1:]] * (padded - real_bs), axis=0)
                if not k.endswith('__packed') else v  # packed: no B axis
                for k, v in batch.items()
            }
        batch = shard_batch(batch, mesh)
        packed_keys = [k for k in batch if k.endswith('__packed')]
        if packed_keys:
            # eager unpack (see expand note above)
            idx = batch.pop('pack_index')
            for k in packed_keys:
                batch[k[:-len('__packed')]] = unpack_parts(
                    batch[k], idx, batch['part_valids'])
                del batch[k]
        if ptable is not None:
            from ..datasets.part_table import gather_part_table
            slots = batch.pop('part_slots')
            batch['part_pcs'] = gather_part_table(ptable.table, slots,
                                                  batch['part_valids'])
    if 'part_valids' in batch and hasattr(batch['part_valids'], 'sharding'):
        batch = _pin_empty_leaves(batch, mesh)
    if augment and 'part_pcs_raw' in batch:
        aug = augment_geometry_batch(
            batch['part_pcs_raw'], batch['part_valids'], rng,
            rot_range=float(cfg.data.get('rot_range', -1.0)))
        batch = {**{k: v for k, v in batch.items() if k != 'part_pcs_raw'},
                 **aug}
    return batch, real_bs


def install_device_prep(loader, cfg, mesh, group_size=1):
    """Move the host->device hop into `loader`'s producer thread: each
    collated batch is device_put + (for packed wires) expanded there, so
    H2D serialization overlaps the device compute of in-flight steps and
    the consumer's data wait collapses to a queue get.  The enqueued dict
    carries '__real_bs__' so `_prep_batch` passes it through.

    With `group_size` > 1 (geometry minimal wire only), the producer
    stacks G collated batches and ships them in ONE device_put + ONE
    vmapped expand: each RPC through the remote runtime costs ~2-6ms of
    host CPU (measured round 3), so per-batch puts made the producer the
    bottleneck on this 1-core host.  Group dicts carry '__group__' = G
    and feed `make_train_step_multi`; epoch tails fall back to the
    per-batch path."""
    def prep(host_batch):
        device_batch, bs = _prep_batch(host_batch, cfg, mesh, None,
                                       augment=False)
        device_batch['__real_bs__'] = bs
        return device_batch
    loader.transform = prep
    if group_size <= 1:
        return

    from jax.sharding import PartitionSpec as P

    from ..datasets.geometry import (expand_geometry_batch_group_sharded,
                                     expand_geometry_batch_multi)
    from ..parallel.mesh import batch_sharding, put_sharded

    def _pin_empty(out):
        return _pin_empty_leaves(out, mesh, batch_axis=1)

    def group_prep(host_batches):
        if 'part_slots' in host_batches[0]:
            # partnet resident-table wire: stack G slot batches, ONE
            # put_sharded + ONE vmapped table gather (datasets/part_table)
            from ..datasets.part_table import gather_part_table_multi
            ptable = host_batches[0]['__ptable__']
            G = len(host_batches)
            stack = {k: np.stack([np.asarray(b[k]) for b in host_batches])
                     for k in host_batches[0]
                     if k not in _DROP_KEYS and k != '__ptable__'}
            dev = put_sharded(stack, mesh, P(None, 'data'))
            slots = dev.pop('part_slots')
            dev['part_pcs'] = gather_part_table_multi(ptable.table, slots,
                                                      dev['part_valids'])
            out = _pin_empty(dev)
            out['__group__'] = G
            out['__real_bs__'] = int(stack['part_valids'].shape[1])
            return out
        if 'part_counts' not in host_batches[0]:
            raise ValueError('grouped prep requires the geometry packed '
                             'wire (part_counts) or the partnet table '
                             'wire (part_slots)')
        G = len(host_batches)
        counts = np.stack([b['part_counts'] for b in host_batches])
        # sharded wire: per-batch arrays carry a leading [D] shard axis;
        # grouped stacks are [G, D, ...] sharded P(None, 'data')
        sharded_wire = counts.ndim == 3
        gspec = P(None, 'data') if sharded_wire else P('data')
        if 'part_slots__packed' in host_batches[0]:
            # device-sampling slot wire: ship [G, (D,) Kpad] piece ids +
            # seeds (a few KB); the TPU samples + expands in ONE dispatch
            from ..datasets.device_sampler import (
                sample_and_expand_multi, sample_and_expand_multi_sharded)
            tables = host_batches[0]['__tables__']
            kmax = max(b['part_slots__packed'].shape[-1]
                       for b in host_batches)
            slots = np.zeros(counts.shape[:-1] + (kmax, ), np.int32)
            for g, b in enumerate(host_batches):
                rows = b['part_slots__packed']
                slots[g, ..., :rows.shape[-1]] = rows
            seeds = np.asarray([b['sample_seed'] for b in host_batches],
                               np.int32)
            dev = put_sharded(
                {'slots': slots, 'counts': counts, 'seeds': seeds},
                mesh, gspec)
            kwargs = dict(n_points=int(cfg.data.num_pc_points),
                          max_parts=int(cfg.data.max_num_part),
                          data_keys=tuple(cfg.data.data_keys),
                          interpret=tables.interpret)
            if sharded_wire:
                out = sample_and_expand_multi_sharded(
                    tables.table, tables.n_faces, dev['slots'],
                    dev['counts'], dev['seeds'], mesh, **kwargs)
            else:
                out = sample_and_expand_multi(
                    tables.table, tables.n_faces, dev['slots'],
                    dev['counts'], dev['seeds'], **kwargs)
            out = _pin_empty(out)
            out['__group__'] = G
            out['__real_bs__'] = int(counts[0].size)
            return out
        kmax = max(b['part_pcs_raw__packed'].shape[-3]
                   for b in host_batches)
        n, c = host_batches[0]['part_pcs_raw__packed'].shape[-2:]
        packed = np.zeros(counts.shape[:-1] + (kmax, n, c),
                          host_batches[0]['part_pcs_raw__packed'].dtype)
        for g, b in enumerate(host_batches):
            rows = b['part_pcs_raw__packed']
            packed[g, ..., :rows.shape[-3], :, :] = rows
        dev = put_sharded({'packed': packed, 'counts': counts}, mesh, gspec)
        if sharded_wire:
            out = expand_geometry_batch_group_sharded(
                dev['packed'], dev['counts'],
                max_parts=int(cfg.data.max_num_part),
                data_keys=tuple(cfg.data.data_keys))
        else:
            out = expand_geometry_batch_multi(
                dev['packed'], dev['counts'],
                max_parts=int(cfg.data.max_num_part),
                data_keys=tuple(cfg.data.data_keys))
        out = _pin_empty(out)
        out['__group__'] = G
        out['__real_bs__'] = int(counts[0].size)
        return out

    loader.group_size = group_size
    loader.group_transform = group_prep
    # only full-size batches group; the epoch-tail remainder batch (and
    # anything else with a different batch axis) takes the per-batch path
    loader.group_key = lambda b: (b['part_counts'].shape
                                  if 'part_counts' in b
                                  else b['part_slots'].shape)


class Trainer:
    def __init__(self, cfg, ckp_dir=None, resume=True, quiet=False):
        from ..utils.precision import configure_precision
        configure_precision(cfg)  # cfg.exp.bf16 -> global compute dtype
        self.cfg = cfg
        self.mesh = make_mesh(batch_size=cfg.exp.batch_size)
        # BN statistics scope: sync-BN over the global batch (default) or
        # strict per-replica parity with the reference's DDP BN
        # (cfg.exp.sync_bn = False -> one stat group per data-axis device)
        from ..models.modules.norm import set_bn_groups
        set_bn_groups(1 if cfg.exp.get('sync_bn', True)
                      else self.mesh.shape['data'])
        self.model = build_model(cfg)
        self.train_loader, self.val_loader = build_dataloader(cfg)
        steps_per_epoch = max(1, len(self.train_loader))
        # partnet resident-HBM point table (datasets/part_table.py): the
        # wire carries part slot ids instead of the packed point rows.
        # 'auto' = on on real accelerators (the host wire is free on CPU);
        # enabling it also turns batch collation on for multi-device
        # meshes (the slot wire keeps a batch axis on every array)
        if cfg.data.dataset == 'partnet':
            dev_table = cfg.data.get('device_table', 'auto')
            if dev_table == 'auto':
                dev_table = jax.default_backend() != 'cpu'
            if dev_table:
                from ..datasets.partnet import enable_device_table
                enable_device_table(self.train_loader, cfg, mesh=self.mesh)
                enable_device_table(self.val_loader, cfg, mesh=self.mesh)
        # steps_per_call: how many train steps ride one lax.scan'd runtime
        # invocation (grouped H2D + one dispatch).  0 = auto: pays off on
        # the remote TPU runtime where every RPC costs ~2-6ms of host CPU;
        # pointless on the local CPU backend tests use.
        spc = int(cfg.exp.get('steps_per_call', 0) or 0)
        if spc <= 0:
            spc = 8 if (getattr(self.train_loader, 'batch_collate', False)
                        and jax.default_backend() != 'cpu') else 1
        self.steps_per_call = spc
        if getattr(self.train_loader, 'batch_collate', False):
            from ..datasets.geometry import (configure_wire_shards,
                                             enable_device_sampling,
                                             warm_unpack_cache)
            # multi-chip wire: one row group per data-axis device (the
            # fast wire no longer falls back on data-parallel meshes)
            configure_wire_shards(self.train_loader, self.mesh)
            configure_wire_shards(self.val_loader, self.mesh)
            n_data = self.mesh.shape['data']
            n_proc = jax.process_count()
            # device-side mesh sampling (datasets/device_sampler.py): the
            # wire carries piece ids instead of point clouds.  'auto' = on
            # whenever the run is on real accelerators (on the CPU backend
            # the host wire is free and interpret-mode pallas is not)
            dev_sampling = cfg.data.get('device_sampling', 'auto')
            if dev_sampling == 'auto':
                dev_sampling = (jax.default_backend() != 'cpu'
                                and cfg.data.dataset == 'geometry')
            if dev_sampling:
                enable_device_sampling(self.train_loader, cfg,
                                       mesh=self.mesh)
                enable_device_sampling(self.val_loader, cfg, mesh=self.mesh)
            from ..datasets.device_sampler import warm_sample_cache
            for loader, bs in ((self.train_loader, cfg.exp.batch_size),
                               (self.val_loader, cfg.exp.batch_size * 2)):
                spc = self.steps_per_call \
                    if loader is self.train_loader else 1
                bs_global = bs * n_proc  # warms take the global batch
                tables = getattr(loader.dataset, '_device_tables', None)
                ptable = getattr(loader.dataset, '_device_ptable', None)
                if ptable is not None:
                    from ..datasets.part_table import warm_gather_cache
                    warm_gather_cache(ptable, bs_global,
                                      cfg.data.max_num_part,
                                      mesh=self.mesh, group_size=spc)
                elif tables is not None:
                    warm_sample_cache(
                        tables, bs_global, cfg.data.max_num_part,
                        cfg.data.num_pc_points, mesh=self.mesh,
                        data_keys=tuple(cfg.data.data_keys),
                        group_size=spc, interpret=tables.interpret,
                        shards=n_data, fixed_kpad=n_proc > 1)
                else:
                    warm_unpack_cache(
                        bs_global, cfg.data.max_num_part,
                        cfg.data.num_pc_points,
                        mesh=self.mesh, data_keys=tuple(cfg.data.data_keys),
                        wire_dtype=jnp.dtype(
                            cfg.data.get('wire_dtype', 'float16')),
                        expand=cfg.data.dataset == 'geometry',
                        group_size=spc, shards=n_data,
                        fixed_kpad=n_proc > 1)
            # producer-thread device placement (H2D overlaps device compute)
            install_device_prep(self.train_loader, cfg, self.mesh)
            install_device_prep(self.val_loader, cfg, self.mesh)

        # init from one sample batch (BEFORE group mode: init needs one
        # plain augmented batch, not a [G, ...] group)
        rng = jax.random.PRNGKey(cfg.exp.get('seed', 0))
        self._data_rng, init_rng = jax.random.split(rng)
        first = next(iter(self.train_loader))
        init_batch, _ = _prep_batch(first, cfg, self.mesh,
                                    jax.random.PRNGKey(0))
        groupable = (cfg.data.dataset == 'geometry'
                     or getattr(self.train_loader.dataset, '_device_ptable',
                                None) is not None)
        if (self.steps_per_call > 1 and groupable
                and getattr(self.train_loader, 'batch_collate', False)):
            install_device_prep(self.train_loader, cfg, self.mesh,
                                group_size=self.steps_per_call)
        self.state, self.tx, self.lr_schedule = create_train_state(
            self.model, cfg, init_batch, init_rng,
            steps_per_epoch=steps_per_epoch)

        # stacked-log step variants: all metrics come back as ONE device
        # array per step (a per-buffer fetch costs a ~12ms round trip
        # through the remote runtime)
        self.train_step, self._train_log_keys = make_train_step_stacked(
            self.model, self.tx, cfg, self.mesh,
            lr_schedule=self.lr_schedule)
        self.eval_step, self._eval_log_keys = make_eval_step_stacked(
            self.model, cfg, self.mesh)
        if self.steps_per_call > 1:
            from ..parallel.mesh import make_train_step_multi
            self.train_step_multi, self._train_log_keys_multi = \
                make_train_step_multi(self.model, self.tx, cfg, self.mesh,
                                      lr_schedule=self.lr_schedule)
        else:
            self.train_step_multi = None
            self._train_log_keys_multi = self._train_log_keys

        self.ckp_dir = ckp_dir or cfg.exp.get('ckp_dir', 'checkpoint/')
        os.makedirs(self.ckp_dir, exist_ok=True)
        self.logger = build_logger(cfg, self.ckp_dir, quiet=quiet)
        self.ckpt_mgr = ocp.CheckpointManager(
            os.path.abspath(os.path.join(self.ckp_dir, 'models')),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=5,
                best_fn=lambda m: m.get('val/part_acc', 0.0),
                best_mode='max',
                # async: the save's device->host copy overlaps the next
                # train epoch (ROADMAP item 4); close()/fit() join it
                enable_async_checkpointing=True,
            ))
        self.start_epoch = 0
        self.test_results = None
        self._host_step = 0  # mirrors state.step without device syncs
        self._log_buf = []   # buffered (log_vec, step, data_time) handles
        if resume:
            self._try_resume()

    # ------------------------------------------------------------------
    # checkpointing (reference train.py:97-118 auto-resume semantics)
    # ------------------------------------------------------------------
    def _try_resume(self):
        latest = self.ckpt_mgr.latest_step()
        if latest is None:
            return
        target = {'state': self.state, 'epoch': 0}
        restored = self.ckpt_mgr.restore(
            latest, args=ocp.args.StandardRestore(target))
        self.state = restored['state']
        self.start_epoch = int(restored['epoch']) + 1
        self._host_step = int(self.state.step)
        print(f'resumed from epoch {restored["epoch"]} '
              f'(step {self._host_step})', flush=True)

    def save_checkpoint(self, epoch, metrics):
        self.ckpt_mgr.save(
            epoch, args=ocp.args.StandardSave(
                {'state': self.state, 'epoch': epoch}),
            metrics={k: float(v) for k, v in metrics.items()})

    def load_weights(self, path):
        """Load a bare checkpoint directory saved by save_checkpoint.

        Accepts either the pytree item dir itself or a CheckpointManager
        STEP dir (`models/<epoch>`, which holds `default/` + `metrics/`
        items) — the manager layout is what `test.py --weight
        checkpoint/run-{}` resolves to."""
        path = os.path.abspath(path)
        if os.path.isdir(os.path.join(path, 'default')):
            path = os.path.join(path, 'default')
        ckptr = ocp.StandardCheckpointer()
        target = {'state': self.state, 'epoch': 0}
        restored = ckptr.restore(path, target)
        self.state = restored['state']

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------
    def _next_rng(self):
        self._data_rng, k = jax.random.split(self._data_rng)
        return k

    # steps whose log vectors stay on device before one batched fetch;
    # EVERY host-side sync through the remote runtime costs a ~100ms
    # flush (measured: 7 pipelined steps run in 1.5ms/step, but one
    # blocking fetch per step makes the same loop 150-300ms/step)
    LOG_FLUSH_STEPS = 32
    # execution-kick cadence (see ExecutionKicker).  Round-4 bench grid
    # (scripts/bench_grid.py, pn_transformer everyday, real chip): every
    # threaded cell except kick-every-dispatch beat its blocking twin --
    # spc8 blocking 1097.0 sps / 29.17ms vs threaded lag-4 1118.1 sps /
    # 28.62ms (best of 8 cells; threaded lag-2 1110.6, spc16 threaded
    # 1107.0, kick-every-dispatch 1055.0 is the one regression).  The
    # worker thread absorbs the ~100ms runtime flush, so a deeper lag
    # keeps more dispatches in flight without stalling the dispatch
    # thread; benches can still override via MPA_BENCH_KICK/LAG/
    # KICK_THREAD.
    KICK_EVERY = 2
    KICK_LAG = 4
    KICK_THREADED = True

    def _flush_train_logs(self):
        """Materialize all buffered step-log arrays in batched stacked
        fetches and write them to the JSONL logger; returns the last
        step's log dict (or None if the buffer was empty).

        Buffer entries are (arr, steps, t_data) where arr is [M] (one
        step) or [G, M] (one `make_train_step_multi` group of G steps).
        Consecutive same-shape entries stack into one padded
        LOG_FLUSH_STEPS-ary fetch: the fixed arity keeps the number of
        distinct remote executables at one per shape (each distinct stack
        arity would compile its own, ~100s through the compile helper),
        and flush sizes vary at epoch/validation boundaries."""
        buf = self._log_buf
        if not buf:
            return None
        # whichever step variant ran filled its (sorted, hence identical)
        # key list; a grouped epoch may never touch the single-step path
        keys = self._train_log_keys or self._train_log_keys_multi
        last = None
        i = 0
        while i < len(buf):
            run = [buf[i]]
            while (len(run) < self.LOG_FLUSH_STEPS
                   and i + len(run) < len(buf)
                   and buf[i + len(run)][0].shape == run[0][0].shape):
                run.append(buf[i + len(run)])
            i += len(run)
            vecs = [v for v, _, _ in run]
            vecs += [vecs[-1]] * (self.LOG_FLUSH_STEPS - len(vecs))
            mats = np.asarray(jnp.stack(vecs))[:len(run)]  # one fetch
            for (v, steps, t_data), mat in zip(run, mats):
                rows = mat if mat.ndim == 2 else mat[None]
                for step_no, row in zip(steps, rows):
                    logs = dict(zip(keys, row.astype(float)))
                    # a group's queue wait amortizes over its G steps
                    logs['data_time'] = t_data / len(steps)
                    if jax.process_index() == 0:
                        self.logger.log(
                            {f'train/{k}': v for k, v in logs.items()},
                            step=step_no)
                    last = logs
        buf.clear()
        return last

    def train_epoch(self, epoch):
        """One epoch of dispatch-only steps; metrics materialize in
        batches.

        The loop never blocks on the device: steps and H2D transfers
        pipeline freely, per-step [M] log vectors accumulate as device
        handles ACROSS epochs, and every LOG_FLUSH_STEPS (and before any
        validation/checkpoint) ONE stacked fetch materializes them all
        for the JSONL logger.  Other runtime-tunnel hygiene:
          - one PRNG key per EPOCH (the step folds in state.step itself);
          - lr computed inside the jitted step (see make_train_step);
          - the step counter is tracked host-side across epochs
            (`self._host_step`): even `int(state.step)` once per epoch
            costs a full runtime flush.
        Returns the most recent MATERIALIZED step's logs (None if the
        buffer hasn't hit the flush threshold yet).
        """
        self.train_loader.set_epoch(epoch)
        epoch_rng = self._next_rng()
        t_last = time.perf_counter()
        last = None
        kicker = ExecutionKicker(self.KICK_EVERY, self.KICK_LAG,
                                 threaded=self.KICK_THREADED)

        for batch in self.train_loader:
            t_data = time.perf_counter() - t_last
            n_steps = int(batch.get('__group__', 1))
            device_batch, _ = _prep_batch(batch, self.cfg, self.mesh,
                                          epoch_rng, augment=False)
            if n_steps > 1:
                # G steps in one lax.scan'd dispatch ([G, M] log matrix)
                self.state, log_arr = self.train_step_multi(
                    self.state, device_batch, epoch_rng)
            else:
                self.state, log_arr = self.train_step(
                    self.state, device_batch, epoch_rng)
            steps = tuple(range(self._host_step + 1,
                                self._host_step + 1 + n_steps))
            self._host_step += n_steps
            self._log_buf.append((log_arr, steps, t_data))
            kicker.note(log_arr)
            if len(self._log_buf) >= self.LOG_FLUSH_STEPS:
                last = self._flush_train_logs() or last
            t_last = time.perf_counter()
        kicker.close()
        return last

    def _eval_loop(self, loader, prefix):
        """Batch-size weighted averaging (reference base_model.py:65-88).

        Multi-host: each host evaluates its own data shard; the weighted
        sums are all-reduced across hosts (the reference's
        `sync_dist=True`)."""
        sums, weights = {}, 0.0
        # dispatch-only loop: per-batch [M, B] log matrices stay on device
        # (every host sync costs a ~100ms runtime flush); lagged execution
        # kicks (see KICK_EVERY) start device execution mid-loop -- the
        # remote runtime otherwise defers ALL execution to the final
        # stacked fetch -- and bound how many queued INPUT batches pile up
        # in HBM (block_until_ready is a no-op under the remote runtime:
        # it confirms dispatch, not execution)
        done = []
        kicker = ExecutionKicker(self.KICK_EVERY, self.KICK_LAG,
                                 threaded=self.KICK_THREADED)
        for batch in loader:
            rng = self._next_rng()
            device_batch, bs = _prep_batch(batch, self.cfg, self.mesh, rng,
                                           augment=False)
            done.append((self.eval_step(self.state, device_batch, rng), bs))
            kicker.note(done[-1][0])
        kicker.close()
        if not done:
            return {}
        # group consecutive same-shape matrices so each group stacks into
        # one fetch (typically 1 group + the remainder batch = 2 flushes;
        # robust to any mid-stream shape change, not just a final one)
        mats = []
        run = [done[0][0]]
        for m, _ in done[1:]:
            if m.shape == run[0].shape:
                run.append(m)
            else:
                mats.extend(np.asarray(jnp.stack(run)))
                run = [m]
        mats.extend(np.asarray(jnp.stack(run)))
        n_proc = jax.process_count()
        for (m, bs), mat in zip(done, mats):
            # each host sums ITS OWN rows of the (replicated) global
            # per-element matrix: the global batch concatenates the hosts'
            # local shards in process order, so host p owns the p-th
            # contiguous block (bs counts the real rows of that block;
            # padding replicas sit at the block's end).  The cross-host
            # allgather below then adds disjoint shards -- summing
            # row[:bs] on every host would count host 0's shard n times
            # and drop the rest.
            off = (mat.shape[1] // n_proc) * jax.process_index()
            for k, row in zip(self._eval_log_keys, mat):
                sums[k] = sums.get(k, 0.0) + float(row[off:off + bs].sum())
            weights += bs
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils
            keys = sorted(sums)
            local = np.asarray([sums[k] for k in keys] + [weights],
                               np.float64)
            gathered = multihost_utils.process_allgather(local)
            total = np.asarray(gathered).sum(axis=0)
            sums = dict(zip(keys, total[:-1]))
            weights = total[-1]
        return {f'{prefix}/{k}': v / max(weights, 1.0)
                for k, v in sums.items()}

    def validate(self, epoch):
        self._flush_train_logs()  # keep the JSONL in step order
        metrics = self._eval_loop(self.val_loader, 'val')
        if jax.process_index() == 0:
            self.logger.log(metrics, step=self._host_step,
                            echo=sorted(metrics))
        n_vis = self.cfg.exp.get('val_sample_vis', 0)
        # vis export is single-process only: it runs forward passes on one
        # host, which would desync a multi-host mesh (and its _next_rng
        # draw would advance rank 0's data rng stream past the others')
        if n_vis and n_vis > 0 and jax.process_count() == 1:
            self._export_val_vis(epoch, n_vis)
        return metrics

    def _export_val_vis(self, epoch, n_vis):
        """Sampled-assembly PLY export every val epoch on one fixed train
        AND one fixed val batch (the reference's PCAssemblyLogCallback
        logged both to wandb, callback.py:20-35)."""
        from .vis_utils import export_assembly_samples, sample_assembly
        colors = self.cfg.data.get('colors', [[127, 127, 127]] * 21)
        variables = {'params': self.state.params,
                     'batch_stats': self.state.batch_stats}
        for split, loader in [('train', self.train_loader),
                              ('val', self.val_loader)]:
            try:
                batch = next(iter(loader))
            except StopIteration:
                continue
            if '__group__' in batch:  # grouped loader: vis one step's batch
                bs = batch['__real_bs__']
                batch = {k: v[0] for k, v in batch.items()
                         if k not in ('__group__', '__real_bs__')}
                batch['__real_bs__'] = bs
            device_batch, bs = _prep_batch(batch, self.cfg, self.mesh,
                                           jax.random.PRNGKey(epoch))
            gt_pcs, preds = sample_assembly(
                self.model, variables, device_batch, self._next_rng(),
                rot_type=self.cfg.model.rot_type,
                sample_iter=self.cfg.loss.get('sample_iter', 1))
            gt_cut = jax.tree_util.tree_map(lambda x: x[:bs], gt_pcs)
            preds_cut = [p[:bs] for p in preds]
            valids_cut = device_batch['part_valids'][:bs]
            export_assembly_samples(
                gt_cut, preds_cut, valids_cut,
                colors, os.path.join(self.ckp_dir, 'vis'),
                prefix=f'epoch{epoch}_{split}', max_shapes=min(n_vis, bs))
            self.logger.log_assemblies(
                f'assembly/{split}', gt_cut, preds_cut, valids_cut, colors,
                step=self._host_step, max_shapes=min(n_vis, bs))

    def fit(self):
        cfg = self.cfg
        for epoch in range(self.start_epoch, cfg.exp.num_epochs):
            t0 = time.perf_counter()
            logs = self.train_epoch(epoch)
            dt = time.perf_counter() - t0
            if jax.process_index() == 0 and logs is not None:
                # logs are the latest MATERIALIZED step's (the buffer may
                # span epochs; short epochs print at flush boundaries)
                print(f'epoch {epoch}: loss={float(logs["loss"]):.6f} '
                      f'({dt:.1f}s)', flush=True)
            if (epoch + 1) % cfg.exp.val_every == 0 or \
                    epoch == cfg.exp.num_epochs - 1:
                metrics = self.validate(epoch)
                self.save_checkpoint(epoch, metrics)
        self._flush_train_logs()
        self.ckpt_mgr.wait_until_finished()

    def swap_loaders(self, cfg):
        """Re-point the data pipeline at a new cfg (e.g. another category)
        WITHOUT rebuilding the compiled train/eval steps.  Batch shapes are
        category-invariant (max_num_part / num_points come from the shared
        base cfg), so the jit caches stay hot -- this is what lets
        `scripts/test.py --category all` sweep 20 categories with ONE
        compile instead of one per category (reference test.py:33-62 pays
        a fresh Trainer per category)."""
        assert cfg.data.max_num_part == self.cfg.data.max_num_part, \
            'swap_loaders requires category-invariant batch shapes'
        self.cfg = cfg
        self.train_loader, self.val_loader = build_dataloader(cfg)

    def test(self):
        """Eval on the val split; stash results like reference
        base_model.py:90-111 test_epoch_end."""
        metrics = self._eval_loop(self.val_loader, 'test')
        print('; '.join(f'{k}: {v:.6f}' for k, v in sorted(metrics.items())),
              flush=True)
        self.test_results = metrics
        return metrics

    def close(self):
        self._flush_train_logs()
        self.logger.close()
        self.ckpt_mgr.wait_until_finished()
        self.ckpt_mgr.close()
        # reset the process-global BN statistics scope so a later Trainer
        # (or bare eval) in the same process doesn't inherit this run's
        # per-replica grouping (ADVICE r4)
        from ..models.modules.norm import set_bn_groups
        set_bn_groups(1)
