"""The bf16 switch must actually change compiled behavior (VERDICT r1 #7:
the reference's --fp16 equivalent was parsed but dead)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_part_assembly_tpu.models.modules.encoders import PointNet
from multi_part_assembly_tpu.models.modules.regressor import PoseRegressor
from multi_part_assembly_tpu.models.modules.transformer import \
    TransformerEncoder
from multi_part_assembly_tpu.train.schedules import build_lr_schedule
from multi_part_assembly_tpu.utils import CN
from multi_part_assembly_tpu.utils.precision import (compute_dtype,
                                                     configure_precision,
                                                     set_compute_dtype)


@pytest.fixture(autouse=True)
def restore_precision():
    yield
    set_compute_dtype(jnp.bfloat16)


def _intermediate_dtypes(mod, variables, *args, **kwargs):
    _, state = mod.apply(variables, *args, capture_intermediates=True,
                         **kwargs)
    dtypes = set()
    jax.tree_util.tree_map(
        lambda v: dtypes.add(v.dtype),
        state['intermediates'])
    return dtypes


def test_bf16_switch_changes_encoder_compute(rng):
    x = jnp.asarray(rng.randn(4, 32, 3), jnp.float32)
    mod = PointNet(feat_dim=16)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)

    set_compute_dtype(jnp.float32)
    out_f32 = mod.apply(variables, x, train=False,
                        mutable=['batch_stats'])[0]
    set_compute_dtype(jnp.bfloat16)
    out_bf16 = mod.apply(variables, x, train=False,
                         mutable=['batch_stats'])[0]
    # params and output stay f32 either way...
    assert out_f32.dtype == out_bf16.dtype == jnp.float32
    # ...but the matmul path changes numerics (bf16 rounding is visible)
    assert float(jnp.max(jnp.abs(out_f32 - out_bf16))) > 0.0


def test_bf16_switch_transformer_and_regressor(rng):
    tokens = jnp.asarray(rng.randn(2, 6, 32), jnp.float32)
    tr = TransformerEncoder(d_model=32, num_heads=4, ffn_dim=64,
                            num_layers=1)
    tvars = tr.init(jax.random.PRNGKey(0), tokens, train=False)
    reg = PoseRegressor(rot_type='quat')
    rvars = reg.init(jax.random.PRNGKey(0), tokens)

    set_compute_dtype(jnp.float32)
    t32 = tr.apply(tvars, tokens, train=False)
    r32 = reg.apply(rvars, tokens)
    set_compute_dtype(jnp.bfloat16)
    t16 = tr.apply(tvars, tokens, train=False)
    r16 = reg.apply(rvars, tokens)
    assert t32.dtype == t16.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(t32 - t16))) > 0.0
    assert float(jnp.max(jnp.abs(r32[1] - r16[1]))) > 0.0
    # rotation output stays normalized in both modes
    n = jnp.linalg.norm(r16[0], axis=-1)
    np.testing.assert_allclose(np.asarray(n), 1.0, atol=1e-5)


def test_configure_precision_reads_cfg():
    cfg = CN({'exp': {'bf16': False}})
    configure_precision(cfg)
    assert compute_dtype() == jnp.float32
    cfg2 = CN({'exp': {}})  # default: bf16 on
    configure_precision(cfg2)
    assert compute_dtype() == jnp.bfloat16


def _sched_cfg(kind):
    return CN({
        'exp': {'num_epochs': 100},
        'optimizer': {'lr': 1e-3, 'lr_scheduler': kind,
                      'warmup_ratio': 0.05, 'lr_decay_factor': 100.},
    })


def test_linear_schedule_wired():
    sched = build_lr_schedule(_sched_cfg('linear'), steps_per_epoch=10)
    lr0 = float(sched(0))
    lr_peak = float(sched(5 * 10))  # epoch 5 = warmup end
    lr_end = float(sched(100 * 10 - 1))  # epoch 99: one epoch short of min
    assert lr0 < lr_peak
    np.testing.assert_allclose(lr_peak, 1e-3, rtol=1e-5)
    expected_end = 1e-5 + (1e-3 - 1e-5) * 1.0 / 95.0
    np.testing.assert_allclose(lr_end, expected_end, rtol=1e-4)
    # linear: midpoint between warmup end and total sits halfway in LR
    mid = float(sched(int((5 + 100) / 2) * 10))
    np.testing.assert_allclose(mid, (lr_peak + 1e-5) / 2, rtol=0.02)


def test_cosine_schedule_still_default():
    sched = build_lr_schedule(_sched_cfg('cosine'), steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(5 * 10)), 1e-3, rtol=1e-5)
    assert float(sched(99 * 10)) < 2e-5
