"""Device mesh, shardings, and the compiled train/eval steps.

TPU-native replacement for the reference's PyTorch-Lightning DDP strategy
(reference scripts/train.py:85: `strategy='ddp'` + NCCL allreduce).  Here a
single `jax.sharding.Mesh` with a `data` axis spans ICI (and DCN across
hosts); batches are sharded on `data`, parameters are replicated, and XLA
inserts the gradient/metric all-reduces.  The mesh carries an (unused,
size-1) `model` axis so model-parallel shardings can be introduced without
changing the step signatures.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.core import mon_loss


def _maybe_augment(batch, key, cfg):
    """Geometry batches may arrive raw ('part_pcs_raw'); augmentation then
    runs inside the compiled step (no extra dispatch / HBM round trip).
    Packed batches are unpacked to 'part_pcs_raw' by `_prep_batch` BEFORE
    the step so the step's shapes stay fixed across Kpad buckets."""
    if 'part_pcs_raw' not in batch:
        return batch
    from ..datasets.geometry import augment_geometry_batch
    aug = augment_geometry_batch(
        batch['part_pcs_raw'], batch['part_valids'], key,
        rot_range=float(cfg.data.get('rot_range', -1.0)))
    batch = {k: v for k, v in batch.items() if k != 'part_pcs_raw'}
    batch.update(aug)
    return batch

__all__ = ['make_mesh', 'batch_sharding', 'replicated', 'shard_batch',
           'put_sharded', 'make_train_step', 'make_eval_step',
           'make_train_step_stacked', 'make_eval_step_stacked',
           'make_train_step_multi', 'init_distributed']


def init_distributed():
    """Multi-host init (reference: Lightning/SLURM spawn; here
    jax.distributed over the cluster coordinator).  No-op single-host.

    Env overrides (must run before any backend-initializing JAX call):
      MPA_PLATFORM=cpu           - force a platform (the container's
                                   sitecustomize ignores JAX_PLATFORMS)
      MPA_NUM_CPU_DEVICES=8      - virtual CPU device count (CI / e2e
                                   checks without TPU hardware)
    """
    import os
    platform = os.environ.get('MPA_PLATFORM')
    if platform:
        jax.config.update('jax_platforms', platform)
        n = os.environ.get('MPA_NUM_CPU_DEVICES')
        if n:
            jax.config.update('jax_num_cpu_devices', int(n))
    if os.environ.get('JAX_COORDINATOR_ADDRESS'):
        jax.distributed.initialize()


def make_mesh(devices=None, model_axis=1, batch_size=None):
    """1D data-parallel mesh (optionally with a trivial model axis).

    With `batch_size`, the data axis is shrunk to gcd(batch, n_devices) so
    small debug batches still shard evenly.
    """
    import math
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_axis == 0
    n_data = n // model_axis
    if batch_size is not None:
        n_data = math.gcd(batch_size, n_data)
    devices = devices[:n_data * model_axis]
    arr = np.asarray(devices).reshape(n_data, model_axis)
    return Mesh(arr, ('data', 'model'))


def batch_sharding(mesh):
    return NamedSharding(mesh, P('data'))


def replicated(mesh):
    return NamedSharding(mesh, P())


def put_sharded(tree, mesh, spec):
    """Place host (numpy) arrays on the mesh under `spec`.

    Single-process: one pytree device_put.  Multi-process: each host's
    arrays are its LOCAL shard of the sharded axes;
    `jax.make_array_from_process_local_data` assembles the global arrays
    (a bare device_put would treat every host's local array as the whole
    global value)."""
    sh = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda v: jax.make_array_from_process_local_data(
                sh, np.asarray(v)), tree)
    return jax.device_put(tree, sh)


def shard_batch(batch, mesh):
    """Place a host batch onto the mesh, sharded along the batch axis.

    Single-process: one pytree-level device_put (not one per leaf: each
    device_put call pays a dispatch round trip through the runtime,
    ~0.5ms x n_keys of pure overhead on the host loop).

    Multi-process: each host's loader yields a DIFFERENT local shard
    (per-process index sharding, like the reference's DistributedSampler),
    so the global batch is assembled with
    `jax.make_array_from_process_local_data` -- a bare device_put would
    treat every host's local array as the whole global value."""
    arrays = {k: v for k, v in batch.items()
              if hasattr(v, 'ndim') and v.ndim > 0}
    moved = put_sharded(arrays, mesh, P('data'))
    return {**batch, **moved}


def _train_step_body(model, tx, cfg, lr_schedule, state, batch, rng):
    """One training step (shared by the dict and stacked-log variants)."""
    rng = jax.random.fold_in(rng, state.step)
    aug_key, rng = jax.random.split(rng)
    batch = _maybe_augment(batch, aug_key, cfg)

    def loss_fn(params):
        loss, log_dict, new_stats = mon_loss(
            model, params, state.batch_stats, batch, rng, cfg=cfg,
            training=True)
        return loss, (log_dict, new_stats)

    grads, (log_dict, new_stats) = jax.grad(
        loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(tx, grads, new_stats)
    if lr_schedule is not None:
        log_dict = dict(log_dict)
        log_dict['lr'] = lr_schedule(state.step)
    return new_state, log_dict


def make_train_step(model, tx, cfg, mesh=None, donate=True,
                    lr_schedule=None):
    """Build the jitted data-parallel train step.

    batch sharded on `data`; state replicated; gradient mean over the global
    batch comes out of XLA's partitioner (no explicit psum needed under jit
    + sharding -- the reduction in the loss already spans the global batch).

    With `lr_schedule`, logs include 'lr' computed INSIDE the step: an
    eager host-side schedule evaluation costs ~40ms/step of tiny remote
    dispatches through this runtime's tunnel.
    """

    def step(state, batch, rng):
        return _train_step_body(model, tx, cfg, lr_schedule, state, batch,
                                rng)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, ) if donate else ())

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0, ) if donate else (),
    )


def make_eval_step(model, cfg, mesh=None):
    """Jitted eval step returning the per-batch mean loss/metric dict."""

    def step(state, batch, rng):
        aug_key, rng = jax.random.split(rng)
        batch = _maybe_augment(batch, aug_key, cfg)
        # reduce=False: per-element vectors so host-side padding rows of
        # remainder batches can be sliced before weighted averaging
        _, log_dict, _ = mon_loss(
            model, state.params, state.batch_stats, batch, rng, cfg=cfg,
            training=False, reduce=False)
        return log_dict

    if mesh is None:
        return jax.jit(step)
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, bsh, rep), out_shardings=rep)


def _stack_dict(log_dict, log_keys):
    """Sorted-key stack of a log dict into ONE f32 array, recording the
    key order into `log_keys` at trace time.  Fetching N separate log
    buffers through the remote runtime pays a synchronous round trip PER
    BUFFER (~12ms each, measured); a stacked fetch pays one."""
    keys = sorted(log_dict)
    if not log_keys:
        log_keys.extend(keys)  # runs at trace time
    elif keys != log_keys:  # a retrace must not silently mislabel rows
        raise ValueError(
            f'log keys changed across retraces: {log_keys} -> {keys}')
    return jnp.stack([jnp.asarray(log_dict[k], jnp.float32) for k in keys])


def make_train_step_stacked(model, tx, cfg, mesh=None, donate=True,
                            lr_schedule=None):
    """Trainer-facing make_train_step: returns (jitted_step, log_keys);
    the step yields (new_state, stacked_logs [M]) -- see `_stack_dict`.
    log_keys fills on the first call."""
    log_keys = []

    def step(state, batch, rng):
        new_state, log_dict = _train_step_body(
            model, tx, cfg, lr_schedule, state, batch, rng)
        return new_state, _stack_dict(log_dict, log_keys)

    if mesh is None:
        return jax.jit(
            step, donate_argnums=(0, ) if donate else ()), log_keys
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0, ) if donate else (),
    ), log_keys


def make_train_step_multi(model, tx, cfg, mesh=None, donate=True,
                          lr_schedule=None):
    """N train steps per runtime invocation via `lax.scan`.

    Every jitted call through this runtime's tunnel pays a fixed
    multi-millisecond invocation overhead (dispatch serialization +
    scheduling), measured at ~half of a 60ms pn_transformer step; scanning
    N steps inside ONE executable amortizes it N-fold.  Semantics are
    IDENTICAL to N sequential `make_train_step_stacked` calls with the
    same epoch rng: the body folds the rng with `state.step`, which
    increments through the scan carry exactly as across separate calls.

    Returns (jitted_fn, log_keys); jitted_fn(state, stacked_batches, rng)
    -> (state, logs [N, M]) where stacked_batches has a leading step axis
    (see `stack_device_batches`) and N is inferred from it at trace time.
    """
    log_keys = []

    def step(state, batches, rng):
        def body(st, batch):
            new_st, log_dict = _train_step_body(
                model, tx, cfg, lr_schedule, st, batch, rng)
            return new_st, _stack_dict(log_dict, log_keys)

        state2, logs = jax.lax.scan(body, state, batches)
        return state2, logs

    if mesh is None:
        return jax.jit(
            step, donate_argnums=(0, ) if donate else ()), log_keys
    rep = replicated(mesh)
    bsh = NamedSharding(mesh, P(None, 'data'))
    return jax.jit(
        step,
        in_shardings=(rep, bsh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0, ) if donate else (),
    ), log_keys


def make_eval_step_stacked(model, cfg, mesh=None):
    """Trainer-facing make_eval_step: returns (jitted_step, log_keys);
    the step yields stacked per-element logs [M, B]."""
    log_keys = []

    def step(state, batch, rng):
        aug_key, rng = jax.random.split(rng)
        batch = _maybe_augment(batch, aug_key, cfg)
        _, log_dict, _ = mon_loss(
            model, state.params, state.batch_stats, batch, rng, cfg=cfg,
            training=False, reduce=False)
        return _stack_dict(log_dict, log_keys)

    if mesh is None:
        return jax.jit(step), log_keys
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, bsh, rep),
                   out_shardings=rep), log_keys
