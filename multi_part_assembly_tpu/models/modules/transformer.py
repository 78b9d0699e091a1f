"""Transformer encoder with key-padding masks.

Counterpart of reference models/pn_transformer/transformer.py:4-79 (stack
of torch TransformerEncoderLayers with `src_key_padding_mask`).  The P=20
token axis is tiny, so attention here is plain XLA einsum -- the MXU eats
it; no flash-attention needed at this scale.
"""

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...utils.precision import compute_dtype as _global_compute_dtype

__all__ = ['TransformerEncoder']


class _EncoderLayer(nn.Module):
    """One pre/post-LN transformer encoder layer (torch semantics).

    Attention/FFN matmuls run in the global compute dtype (bf16 by
    default); softmax and LayerNorm statistics stay f32."""

    d_model: int
    num_heads: int
    ffn_dim: int
    norm_first: bool = True
    dropout: float = 0.1
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, pad_mask=None, train=True):
        """x: [B, N, C]; pad_mask: [B, N] True = padded."""
        cdt = self.compute_dtype or _global_compute_dtype()
        attn_mask = None
        if pad_mask is not None:
            # [B, 1, 1, N]: queries may not attend to padded keys
            attn_mask = ~pad_mask[:, None, None, :]

        def _sa(h):
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, qkv_features=self.d_model,
                dropout_rate=self.dropout, deterministic=not train,
                dtype=cdt, force_fp32_for_softmax=True,
                name='self_attn')(h.astype(cdt), h.astype(cdt),
                                  mask=attn_mask)
            return nn.Dropout(self.dropout, deterministic=not train)(h)

        def _ffn(h):
            h = nn.Dense(self.ffn_dim, dtype=cdt, name='linear1')(
                h.astype(cdt))
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = nn.Dense(self.d_model, dtype=cdt, name='linear2')(h)
            return nn.Dropout(self.dropout, deterministic=not train)(h)

        # epsilon: torch LayerNorm default (1e-5; flax defaults to 1e-6 --
        # a ~1e-3 drift through stacked residuals, caught by the forward
        # goldens in tests/test_golden_forward.py)
        norm1 = nn.LayerNorm(epsilon=1e-5, name='norm1')
        norm2 = nn.LayerNorm(epsilon=1e-5, name='norm2')
        if self.norm_first:
            x = x + _sa(norm1(x))
            x = x + _ffn(norm2(x))
        else:
            x = norm1(x + _sa(x))
            x = norm2(x + _ffn(x))
        return x.astype(jnp.float32)


class TransformerEncoder(nn.Module):
    """Stacked encoder layers + optional final LN / output projection
    (reference transformer.py:37-79)."""

    d_model: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    norm_first: bool = True
    dropout: float = 0.1
    out_dim: Optional[int] = None

    @nn.compact
    def __call__(self, tokens, valid_masks=None, train=True):
        """tokens: [B, N, C]; valid_masks: [B, N] True = valid."""
        pad_mask = None if valid_masks is None else ~(valid_masks > 0)
        x = tokens
        for i in range(self.num_layers):
            x = _EncoderLayer(
                d_model=self.d_model, num_heads=self.num_heads,
                ffn_dim=self.ffn_dim, norm_first=self.norm_first,
                dropout=self.dropout, name=f'layer{i}')(x, pad_mask, train)
        if self.norm_first:  # final LN only in pre-LN mode (reference :33)
            x = nn.LayerNorm(epsilon=1e-5, name='norm')(x)
        if self.out_dim is not None:
            x = nn.Dense(self.out_dim, name='out_fc')(x)
        return x
