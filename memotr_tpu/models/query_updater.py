"""Long-term-memory query updater, fixed-slot formulation.

Behavioral spec: ``/root/reference/models/query_updater.py:18-255``.  The
reference updates a ragged list of active tracks; here every step is a masked
write over the ``(B, S)`` slot tensors so the computation has a single static
shape.

Per-slot math (query_updater.py:82-152), gated by
``is_pos = max(sigmoid(logits)) > UPDATE_THRESH``:

  ref_pts          <- logit(stop_grad(boxes))                     where is_pos
  confidence_w      = sigmoid(MLP(output_embed))
  short_memory      = MLP([confidence_w * output_embed, last_output])
  query_pos         = MLP(sine_embed(sigmoid(ref_pts)))
  tgt2              = MHA(q=short_memory+pos, k=stop_grad(long_memory)+pos,
                          v=output_embed)        # attention across slots
  tgt               = FFN(LN(output_embed + drop(tgt2)))
  query_feat        = FFN(LN(long_memory + drop(tgt)))
  long_memory      <- (1-lambda)*stop_grad(long_memory) + lambda*output_embed
                                                                  where is_pos
  last_output      <- output_embed                                where is_pos
  query_embed      <- query_feat                                  where is_pos

Dead slots are excluded from the memory attention keys.  The D-DETR variant
additionally updates the positional half of the 2C query embedding through a
two-linear+LayerNorm head (query_updater.py:146-152).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..utils.misc import inverse_sigmoid, logits_to_scores, pos_to_pos_embed
from .layers import FFN, MLP, MultiheadAttention


class QueryUpdater(nn.Module):
    hidden_dim: int
    ffn_dim: int
    dropout: float = 0.0
    use_dab: bool = True
    update_threshold: float = 0.5
    long_memory_lambda: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_embed, ref_pts, logits, boxes, output_embed,
                 last_output, long_memory, slot_mask,
                 deterministic: bool = True):
        """All inputs are (B, S, ...) slot tensors; slot_mask (B, S) True=live.

        Returns dict of updated (query_embed, ref_pts, long_memory,
        last_output) slot tensors.
        """
        c = self.hidden_dim
        scores = jnp.max(logits_to_scores(logits.astype(jnp.float32)), axis=-1)
        is_pos = (scores > self.update_threshold) & slot_mask      # (B, S)
        gate = is_pos[..., None]

        new_ref = inverse_sigmoid(jax.lax.stop_gradient(boxes))
        ref_pts = jnp.where(gate, new_ref, ref_pts)

        query_pos = pos_to_pos_embed(jax.nn.sigmoid(ref_pts), num_pos_feats=c // 2)
        query_pos = MLP(c, c, 2, dtype=self.dtype, name="query_pos_head")(
            query_pos.astype(self.dtype))

        output_embed = output_embed.astype(self.dtype)
        last_output = last_output.astype(self.dtype)
        long_mem_detached = jax.lax.stop_gradient(long_memory).astype(self.dtype)

        conf_w = jax.nn.sigmoid(
            MLP(c, c, 2, dtype=self.dtype, name="confidence_weight_net")(
                output_embed))
        short_memory = MLP(2 * c, c, 2, dtype=self.dtype,
                           name="short_memory_fusion")(
            jnp.concatenate([conf_w * output_embed, last_output], axis=-1))

        q = short_memory + query_pos
        k = long_mem_detached + query_pos
        tgt2 = MultiheadAttention(8, self.dropout, dtype=self.dtype,
                                  name="memory_attn")(
            q, k, output_embed, key_padding_mask=~slot_mask,
            deterministic=deterministic)
        tgt = output_embed + nn.Dropout(self.dropout,
                                        deterministic=deterministic)(tgt2)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="memory_norm")(tgt)
        tgt = FFN(self.ffn_dim, self.dropout, dtype=self.dtype,
                  name="memory_ffn")(tgt, deterministic)

        query_feat = long_mem_detached + nn.Dropout(
            self.dropout, deterministic=deterministic)(tgt.astype(self.dtype))
        query_feat = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                  name="query_feat_norm")(query_feat)
        query_feat = FFN(self.ffn_dim, self.dropout, dtype=self.dtype,
                         name="query_feat_ffn")(query_feat, deterministic)

        # Long-memory EMA, gradient only through the lambda*output term
        # (query_updater.py:135-141).
        ema = ((1.0 - self.long_memory_lambda) * long_mem_detached
               + self.long_memory_lambda * output_embed)
        new_long_memory = jnp.where(gate, ema, long_memory)
        new_last_output = jnp.where(gate, output_embed, last_output)

        if self.use_dab:
            new_query_embed = jnp.where(gate, query_feat.astype(jnp.float32),
                                        query_embed)
        else:
            feat_half = jnp.where(gate, query_feat.astype(jnp.float32),
                                  query_embed[..., c:])
            new_pos = nn.Dense(c, dtype=self.dtype, name="linear_pos2")(
                nn.relu(nn.Dense(c, dtype=self.dtype, name="linear_pos1")(
                    output_embed)))
            pos_half = query_embed[..., :c] + new_pos
            pos_half = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                    name="norm_pos")(pos_half)
            pos_half = jnp.where(gate, pos_half, query_embed[..., :c])
            new_query_embed = jnp.concatenate([pos_half, feat_half], axis=-1)

        return {
            "query_embed": new_query_embed.astype(jnp.float32),
            "ref_pts": ref_pts,
            "long_memory": new_long_memory.astype(jnp.float32),
            "last_output": new_last_output.astype(jnp.float32),
        }


def build_query_updater(config: dict) -> QueryUpdater:
    from ..config import cfg_get
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        cfg_get(config, "DTYPE", "bfloat16")]
    return QueryUpdater(
        hidden_dim=config["HIDDEN_DIM"],
        ffn_dim=config["FFN_DIM"],
        dropout=config["DROPOUT"],
        use_dab=cfg_get(config, "USE_DAB", True),
        update_threshold=config["UPDATE_THRESH"],
        long_memory_lambda=config["LONG_MEMORY_LAMBDA"],
        dtype=dtype,
    )
