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
import numpy as np
import orbax.checkpoint as ocp

from ..datasets import augment_geometry_batch, build_dataloader
from ..datasets.geometry import unpack_parts
from ..models import build_model
from ..parallel.mesh import (make_eval_step, make_mesh, make_train_step,
                             shard_batch)
from .state import create_train_state

__all__ = ['Trainer', 'JSONLLogger']

_DROP_KEYS = ('data_id', 'shape_id')  # host-only metadata


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

    def close(self):
        self._f.close()


def _prep_batch(batch, cfg, mesh, rng, augment=True):
    """Host batch -> device batch: pad to the mesh's data-axis multiple and
    shard.  Geometry batches carry raw points ('part_pcs_raw'); with
    augment=True the device-side augmentation (recenter + random rotation,
    the reference's per-sample CPU transform) runs here eagerly, otherwise
    it is fused into the compiled train/eval step (parallel/mesh.py
    `_maybe_augment`).

    Returns (device_batch, real_batch_size); rows past real_batch_size are
    edge-replicated padding (remainder val batches) to be sliced off after
    per-element eval.
    """
    batch = {k: np.asarray(v) for k, v in batch.items()
             if k not in _DROP_KEYS}
    real_bs = batch['part_valids'].shape[0]
    n_data = mesh.shape['data']
    padded = -(-real_bs // n_data) * n_data
    if padded != real_bs:
        batch = {
            k: np.concatenate(
                [v] + [v[-1:]] * (padded - real_bs), axis=0)
            if not k.endswith('__packed') else v  # packed rows: no B axis
            for k, v in batch.items()
        }
    batch = shard_batch(batch, mesh)
    packed_keys = [k for k in batch if k.endswith('__packed')]
    if packed_keys:
        # eager unpack: its own small jitted selection matmul, so only IT
        # recompiles across Kpad buckets -- the (AOT-compilable)
        # train/eval steps always see the fixed [B, P, N, 3] contract
        idx = batch.pop('pack_index')
        for k in packed_keys:
            batch[k[:-len('__packed')]] = unpack_parts(
                batch[k], idx, batch['part_valids'])
            del batch[k]
    if augment and 'part_pcs_raw' in batch:
        aug = augment_geometry_batch(
            batch['part_pcs_raw'], batch['part_valids'], rng,
            rot_range=float(cfg.data.get('rot_range', -1.0)))
        batch = {**{k: v for k, v in batch.items() if k != 'part_pcs_raw'},
                 **aug}
    return batch, real_bs


class Trainer:
    def __init__(self, cfg, ckp_dir=None, resume=True, quiet=False):
        from ..utils.precision import configure_precision
        configure_precision(cfg)  # cfg.exp.bf16 -> global compute dtype
        self.cfg = cfg
        self.mesh = make_mesh(batch_size=cfg.exp.batch_size)
        self.model = build_model(cfg)
        self.train_loader, self.val_loader = build_dataloader(cfg)
        steps_per_epoch = max(1, len(self.train_loader))
        if getattr(self.train_loader, 'batch_collate', False):
            from ..datasets.geometry import warm_unpack_cache
            for bs in {cfg.exp.batch_size, cfg.exp.batch_size * 2}:
                warm_unpack_cache(bs, cfg.data.max_num_part,
                                  cfg.data.num_pc_points, mesh=self.mesh)

        # init from one sample batch
        rng = jax.random.PRNGKey(cfg.exp.get('seed', 0))
        self._data_rng, init_rng = jax.random.split(rng)
        first = next(iter(self.train_loader))
        init_batch, _ = _prep_batch(first, cfg, self.mesh,
                                    jax.random.PRNGKey(0))
        self.state, self.tx, self.lr_schedule = create_train_state(
            self.model, cfg, init_batch, init_rng,
            steps_per_epoch=steps_per_epoch)

        self.train_step = make_train_step(self.model, self.tx, cfg,
                                          self.mesh)
        self.eval_step = make_eval_step(self.model, cfg, self.mesh)

        self.ckp_dir = ckp_dir or cfg.exp.get('ckp_dir', 'checkpoint/')
        os.makedirs(self.ckp_dir, exist_ok=True)
        self.logger = JSONLLogger(self.ckp_dir, quiet=quiet)
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
        print(f'resumed from epoch {restored["epoch"]} '
              f'(step {int(self.state.step)})', flush=True)

    def save_checkpoint(self, epoch, metrics):
        self.ckpt_mgr.save(
            epoch, args=ocp.args.StandardSave(
                {'state': self.state, 'epoch': epoch}),
            metrics={k: float(v) for k, v in metrics.items()})

    def load_weights(self, path):
        """Load a bare checkpoint directory saved by save_checkpoint."""
        ckptr = ocp.StandardCheckpointer()
        target = {'state': self.state, 'epoch': 0}
        restored = ckptr.restore(os.path.abspath(path), target)
        self.state = restored['state']

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------
    def _next_rng(self):
        self._data_rng, k = jax.random.split(self._data_rng)
        return k

    def train_epoch(self, epoch):
        """One epoch, with the host one step behind the device.

        Each iteration dispatches the (async) H2D transfer and train step,
        then materializes the PREVIOUS step's metrics -- so the next
        batch's host->device copy and the logger's float() sync overlap
        the current step's compute (double-buffered input pipeline,
        ROADMAP item 3).  The step counter is tracked host-side to avoid
        syncing on `state.step` (a device scalar of the in-flight step).
        """
        self.train_loader.set_epoch(epoch)
        step0 = int(self.state.step)
        t_last = time.perf_counter()
        pending, last = None, None

        def flush(p):
            logs, step_no, t_data = p
            logs = {k: float(v) for k, v in logs.items()}  # device sync
            logs['data_time'] = t_data
            logs['lr'] = float(self.lr_schedule(step_no))
            if jax.process_index() == 0:
                self.logger.log(
                    {f'train/{k}': v for k, v in logs.items()}, step=step_no)
            return logs

        for i, batch in enumerate(self.train_loader):
            t_data = time.perf_counter() - t_last
            rng = self._next_rng()
            device_batch, _ = _prep_batch(batch, self.cfg, self.mesh, rng,
                                          augment=False)
            self.state, logs = self.train_step(self.state, device_batch, rng)
            if pending is not None:
                last = flush(pending)
            pending = (logs, step0 + i + 1, t_data)
            t_last = time.perf_counter()
        if pending is not None:
            last = flush(pending)
        return last

    def _eval_loop(self, loader, prefix):
        """Batch-size weighted averaging (reference base_model.py:65-88).

        Multi-host: each host evaluates its own data shard; the weighted
        sums are all-reduced across hosts (the reference's
        `sync_dist=True`)."""
        sums, weights = {}, 0.0
        # keep a couple of (async) eval steps in flight so the next batch's
        # H2D overlaps the current step's compute; bounded so queued device
        # batches don't pile up in HBM
        in_flight = []

        def drain(p):
            nonlocal weights
            logs, bs = p
            for k, v in logs.items():
                sums[k] = sums.get(k, 0.0) + float(
                    np.asarray(v)[:bs].sum())
            weights += bs

        for batch in loader:
            rng = self._next_rng()
            device_batch, bs = _prep_batch(batch, self.cfg, self.mesh, rng,
                                           augment=False)
            in_flight.append((self.eval_step(self.state, device_batch, rng),
                              bs))
            if len(in_flight) > 2:
                drain(in_flight.pop(0))
        for p in in_flight:
            drain(p)
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
        metrics = self._eval_loop(self.val_loader, 'val')
        if jax.process_index() == 0:
            self.logger.log(metrics, step=int(self.state.step),
                            echo=sorted(metrics))
            n_vis = self.cfg.exp.get('val_sample_vis', 0)
            if n_vis and n_vis > 0:
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
            device_batch, bs = _prep_batch(batch, self.cfg, self.mesh,
                                           jax.random.PRNGKey(epoch))
            gt_pcs, preds = sample_assembly(
                self.model, variables, device_batch, self._next_rng(),
                rot_type=self.cfg.model.rot_type,
                sample_iter=self.cfg.loss.get('sample_iter', 1))
            export_assembly_samples(
                jax.tree_util.tree_map(lambda x: x[:bs], gt_pcs),
                [p[:bs] for p in preds], device_batch['part_valids'][:bs],
                colors, os.path.join(self.ckp_dir, 'vis'),
                prefix=f'epoch{epoch}_{split}', max_shapes=min(n_vis, bs))

    def fit(self):
        cfg = self.cfg
        for epoch in range(self.start_epoch, cfg.exp.num_epochs):
            t0 = time.perf_counter()
            logs = self.train_epoch(epoch)
            dt = time.perf_counter() - t0
            if jax.process_index() == 0 and logs is not None:
                print(f'epoch {epoch}: loss={float(logs["loss"]):.6f} '
                      f'({dt:.1f}s)', flush=True)
            if (epoch + 1) % cfg.exp.val_every == 0 or \
                    epoch == cfg.exp.num_epochs - 1:
                metrics = self.validate(epoch)
                self.save_checkpoint(epoch, metrics)
        self.ckpt_mgr.wait_until_finished()

    def test(self):
        """Eval on the val split; stash results like reference
        base_model.py:90-111 test_epoch_end."""
        metrics = self._eval_loop(self.val_loader, 'test')
        print('; '.join(f'{k}: {v:.6f}' for k, v in sorted(metrics.items())),
              flush=True)
        self.test_results = metrics
        return metrics

    def close(self):
        self.logger.close()
        self.ckpt_mgr.wait_until_finished()
        self.ckpt_mgr.close()
