"""Global mixed-precision switch.

The reference exposes fp16 AMP via ``train.py --fp16`` (reference
scripts/train.py:88, ``precision=16``); the TPU-native equivalent is bf16
compute with f32 parameters and f32 normalization statistics.  bf16 is the
default (it is the TPU's native matmul format); ``--no-bf16`` or
``cfg.exp.bf16 = False`` flips every dtype-aware module (encoders,
transformer, regressors) to full f32.

Modules read the switch lazily at trace time via :func:`compute_dtype`, so
it must be set before the train/eval step is jit-compiled (the Trainer and
all CLIs do this from ``cfg.exp.bf16``).
"""

import jax.numpy as jnp

__all__ = ['set_compute_dtype', 'compute_dtype', 'configure_precision']

_COMPUTE_DTYPE = jnp.bfloat16


def set_compute_dtype(dtype):
    """Set the global matmul compute dtype (jnp.bfloat16 or jnp.float32)."""
    global _COMPUTE_DTYPE
    assert dtype in (jnp.bfloat16, jnp.float32), dtype
    _COMPUTE_DTYPE = dtype


def compute_dtype():
    """The current matmul compute dtype for dtype-aware modules."""
    return _COMPUTE_DTYPE


def configure_precision(cfg):
    """Apply ``cfg.exp.bf16`` (default True) to the global switch."""
    bf16 = bool(cfg.exp.get('bf16', True)) if hasattr(cfg, 'exp') else True
    set_compute_dtype(jnp.bfloat16 if bf16 else jnp.float32)
