"""Train state + optimizer construction.

Replaces Lightning's optimizer plumbing (reference base_model.py:389-425):
Adam when weight_decay == 0, AdamW with bias/Norm exclusion otherwise
(reference utils.py:90-125 `filter_wd_parameters`), cosine-warmup schedule,
optional global-norm gradient clipping (reference train.py:89
`gradient_clip_val`).
"""

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax

from ..utils.misc import wd_param_mask
from .schedules import build_lr_schedule

__all__ = ['TrainState', 'create_train_state', 'build_optimizer']


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    def apply_gradients(self, tx, grads, new_batch_stats):
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params,
            batch_stats=new_batch_stats, opt_state=new_opt_state)


def build_optimizer(cfg, steps_per_epoch, params):
    """optax chain mirroring the reference's configure_optimizers."""
    schedule = build_lr_schedule(cfg, steps_per_epoch)
    wd = cfg.optimizer.weight_decay
    if wd > 0.0:
        mask = wd_param_mask(params)
        opt = optax.adamw(schedule, weight_decay=wd, mask=mask)
    else:
        opt = optax.adam(schedule)
    clip = cfg.optimizer.get('clip_grad', None)
    if clip:
        opt = optax.chain(optax.clip_by_global_norm(clip), opt)
    return opt, schedule


def create_train_state(model, cfg, sample_batch, rng, steps_per_epoch=1):
    """Initialize params/batch_stats/optimizer from a sample batch."""
    init_rngs = {'params': rng,
                 'noise': jax.random.fold_in(rng, 1),
                 'dropout': jax.random.fold_in(rng, 2)}
    data = dict(sample_batch)
    # jit the init: flax Module.init otherwise executes op-by-op, and the
    # big grouped encoders (pointnet2/dgcnn) materialize every broadcast
    # at full shape eagerly -- a [B*P, npoint, nsample, C] BN mask alone
    # is ~10GB on the everyday config (measured OOM at init, round 5);
    # under jit XLA fuses them into the reductions like the train step
    variables = jax.jit(
        lambda rngs, d: model.init(rngs, d, train=True))(init_rngs, data)
    params = variables['params']
    batch_stats = variables.get('batch_stats', {})
    tx, schedule = build_optimizer(cfg, steps_per_epoch, params)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=tx.init(params))
    return state, tx, schedule
