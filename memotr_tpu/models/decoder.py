"""Deformable transformer decoder with DAB anchors, merge-det-track layering
and iterative box refinement.

Behavioral spec: ``/root/reference/models/deformable_decoder.py:22-319`` plus
the head math of ``memotr.py:144-162``.  Key semantics preserved:

- **merge_det_track_layer**: decoder layers with ``lid < merge`` process only
  detection queries — track queries pass through untouched and are invisible
  as self-attention keys (deformable_decoder.py:292-297,316-317), and their
  reference points are not refined (:149-159).  The merge index is static
  config, so this is compiled control flow, with the pass-through realized as
  masked selects over the fixed det+track query tensor.
- **DAB query pos**: per-layer sine embedding of the (valid-ratio-scaled)
  anchor box -> ``ref_point_head`` MLP, scaled by ``query_scale(output)``
  except at layer 0 (:88-95).
- **box refinement**: ``new_ref = sigmoid(bbox_head_l(out) + logit(ref))``
  with stop-gradient on the carried reference (:139-159).  The per-layer
  class/box heads live *inside* the decoder (they are the same parameters the
  reference shares between refinement and output heads via
  ``set_refine_bbox_embed``, deformable_transformer.py:272-274) and the
  per-layer logits/boxes are returned directly.
- aux ``queries``: the *input* embedding of each layer is recorded before the
  layer runs (:96); layer ``i``'s aux output carries ``queries[i+1]``
  downstream (memotr.py:198-207) — the criterion and runtime tracker read new
  track query embeddings from the second-to-last layer's output.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..utils.misc import inverse_sigmoid, pos_to_pos_embed
from .layers import MLP, MultiheadAttention
from .msda_module import MSDeformAttn


def _class_bias_init(num_classes: int):
    """Focal prior init: bias = -log((1-p)/p), p=0.01 (memotr.py:79-81)."""
    val = -float(np.log((1 - 0.01) / 0.01))
    return lambda *_: jnp.full((num_classes,), val, jnp.float32)


class BBoxHead(nn.Module):
    """3-layer MLP -> 4 coords; final layer zero-init, wh bias -2 for layer 0
    (memotr.py:82-90)."""
    d_model: int
    wh_bias: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.d_model, dtype=self.dtype, name="layers_0")(x))
        h = nn.relu(nn.Dense(self.d_model, dtype=self.dtype, name="layers_1")(h))
        bias0 = jnp.asarray([0.0, 0.0, self.wh_bias, self.wh_bias], jnp.float32)
        return nn.Dense(4, dtype=jnp.float32,
                        kernel_init=nn.initializers.zeros,
                        bias_init=lambda *_: bias0, name="layers_2")(h)


class DecoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dropout: float = 0.0
    extra_track_attn: bool = False
    n_det_queries: int = 300
    msda_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points_input, src,
                 spatial_shapes, query_mask, src_padding_mask,
                 merge_det_track: bool, deterministic: bool = True):
        """tgt/query_pos: (B, Nq, C); reference_points_input: (B, Nq, L, 4);
        query_mask: (B, Nq) True = padded/dead slot.
        When ``merge_det_track`` is False, track queries ([Nd:]) are frozen:
        excluded from attention keys and restored at the end."""
        nd = self.n_det_queries
        b, nq, _ = tgt.shape
        tgt_in = tgt
        if not merge_det_track:
            track_block = jnp.concatenate(
                [jnp.zeros((b, nd), bool), jnp.ones((b, nq - nd), bool)], axis=1)
            key_mask = query_mask | track_block
        else:
            key_mask = query_mask

        # optional extra track-only attention (deformable_decoder.py:254-261)
        if self.extra_track_attn and merge_det_track:
            qk_t = (tgt + query_pos.astype(tgt.dtype))[:, nd:]
            t2 = MultiheadAttention(self.n_heads, self.dropout,
                                    dtype=self.dtype, name="track_attn")(
                qk_t, qk_t, tgt[:, nd:],
                key_padding_mask=query_mask[:, nd:],
                deterministic=deterministic)
            t = tgt[:, nd:] + nn.Dropout(self.dropout,
                                         deterministic=deterministic)(t2)
            t = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm4")(t)
            tgt = jnp.concatenate([tgt[:, :nd], t], axis=1)

        # self attention over queries (deformable_decoder.py:245-252)
        qk = tgt + query_pos.astype(tgt.dtype)
        tgt2 = MultiheadAttention(self.n_heads, self.dropout, dtype=self.dtype,
                                  name="self_attn")(
            qk, qk, tgt, key_padding_mask=key_mask, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(tgt)

        # deformable cross attention (deformable_decoder.py:303-310)
        tgt2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, impl=self.msda_impl,
                            dtype=self.dtype, name="cross_attn")(
            tgt + query_pos.astype(tgt.dtype), reference_points_input, src,
            spatial_shapes, src_padding_mask)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=deterministic)(tgt2)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(tgt)

        # FFN (deformable_decoder.py:263-273)
        h = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(tgt)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(tgt)

        if not merge_det_track:
            # track queries pass through untouched
            tgt = jnp.concatenate([tgt[:, :nd], tgt_in[:, nd:]], axis=1)
        return tgt


class Decoder(nn.Module):
    num_layers: int
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    num_classes: int
    n_det_queries: int = 300
    merge_det_track_layer: int = 0
    dropout: float = 0.0
    extra_track_attn: bool = False
    use_dab: bool = True
    with_box_refine: bool = True
    use_checkpoint: bool = False
    msda_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, reference_points, src, spatial_shapes,
                 valid_ratios, query_pos, query_mask, src_padding_mask,
                 deterministic: bool = True):
        """tgt: (B, Nq, C); reference_points: (B, Nq, 4) sigmoid space;
        query_pos: (B, Nq, C) for D-DETR else None; valid_ratios: (B, L, 2).

        Returns dict with per-layer stacks:
          outputs  (L, B, Nq, C)  — layer output embeddings
          refs     (L, B, Nq, 4)  — post-refinement references (sigmoid space)
          queries  (L, B, Nq, C)  — layer *input* embeddings
          logits   (L, B, Nq, K)
          boxes    (L, B, Nq, 4)  — sigmoid space cxcywh
        and "init_reference" (B, Nq, 4).
        """
        nd = self.n_det_queries
        output = tgt
        init_reference = reference_points
        ref = reference_points  # D-DETR uses 2-d working refs at layer 0
        ref_backup = reference_points
        if not self.use_dab:
            ref = reference_points[..., :2]

        outputs, refs, queries, logits_l, boxes_l = [], [], [], [], []
        layer_cls = DecoderLayer
        if self.use_checkpoint:
            # static: spatial_shapes, merge_det_track, deterministic
            # (flax counts `self` as argnum 0)
            layer_cls = nn.remat(DecoderLayer, static_argnums=(5, 8, 9))

        # Modules shared across the layer loop are constructed once.
        if self.use_dab:
            ref_point_head = MLP(self.d_model, self.d_model, 2,
                                 dtype=self.dtype, name="ref_point_head")
            query_scale = MLP(self.d_model, self.d_model, 2,
                              dtype=self.dtype, name="query_scale")
        layers = [layer_cls(self.d_model, self.d_ffn, self.n_levels,
                            self.n_heads, self.n_points, self.dropout,
                            self.extra_track_attn, nd, self.msda_impl,
                            self.dtype, name=f"layer_{lid}")
                  for lid in range(self.num_layers)]
        class_heads = [nn.Dense(self.num_classes, dtype=jnp.float32,
                                bias_init=_class_bias_init(self.num_classes),
                                name=f"class_embed_{lid}")
                       for lid in range(self.num_layers)]
        n_bbox_heads = self.num_layers if self.with_box_refine else 1
        bbox_heads = [BBoxHead(self.d_model, wh_bias=-2.0 if i == 0 else 0.0,
                               dtype=self.dtype, name=f"bbox_embed_{i}")
                      for i in range(n_bbox_heads)]

        for lid in range(self.num_layers):
            merge = lid >= self.merge_det_track_layer
            # scale references by per-level valid ratios
            if ref.shape[-1] == 4:
                vr = jnp.concatenate([valid_ratios, valid_ratios], axis=-1)
                ref_input = ref[:, :, None, :] * vr[:, None, :, :]
            else:
                ref_input = ref[:, :, None, :] * valid_ratios[:, None, :, :]

            if self.use_dab:
                anchor_embed = pos_to_pos_embed(
                    ref_input[:, :, 0, :], num_pos_feats=self.d_model // 2)
                raw_pos = ref_point_head(anchor_embed.astype(self.dtype))
                if lid == 0:
                    qp = raw_pos
                else:
                    qp = query_scale(output) * raw_pos
            else:
                qp = query_pos

            queries.append(output)
            output = layers[lid](
                output, qp, ref_input, src, spatial_shapes, query_mask,
                src_padding_mask, merge, deterministic)

            # per-layer heads (shared with refinement, memotr.py:147-162)
            cls_logits = class_heads[lid](output.astype(jnp.float32))
            head_idx = lid if self.with_box_refine else 0
            delta = bbox_heads[head_idx](output)
            if ref.shape[-1] == 4:
                box = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
            else:
                delta = delta.at[..., :2].add(inverse_sigmoid(ref))
                box = jax.nn.sigmoid(delta)

            new_ref = jax.lax.stop_gradient(box)
            if not merge:
                # det refs refine, track refs keep their originals
                if self.use_dab:
                    keep = ref if ref.shape[-1] == 4 else ref_backup
                else:
                    keep = ref_backup
                new_ref = jnp.concatenate(
                    [new_ref[:, :nd], keep[:, nd:]], axis=1)
            ref = new_ref

            outputs.append(output)
            refs.append(ref)
            logits_l.append(cls_logits)
            boxes_l.append(box)

        return {
            "outputs": jnp.stack(outputs),
            "refs": jnp.stack(refs),
            "queries": jnp.stack(queries),
            "logits": jnp.stack(logits_l),
            "boxes": jnp.stack(boxes_l),
            "init_reference": init_reference,
        }
