"""Deformable transformer: level flattening + encoder + decoder.

Behavioral spec: ``/root/reference/models/deformable_transformer.py:24-274``.
Feature maps arrive NHWC; each level is flattened to (B, H*W, C), gets its
level embedding added to the positional encoding (:196-219), valid ratios are
computed from the padding masks (:175-190), then encoder and decoder run.
Two-stage mode is unsupported, like the reference (:234-235).
"""
from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .decoder import Decoder
from .encoder import Encoder


def valid_ratios_from_masks(masks: List[jnp.ndarray]) -> jnp.ndarray:
    """masks: per-level (B, H, W) True=pad -> (B, L, 2) as (w_ratio, h_ratio)
    (deformable_transformer.py:175-190)."""
    ratios = []
    for m in masks:
        _, h, w = m.shape
        valid_h = jnp.sum(~m[:, :, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~m[:, 0, :], axis=1).astype(jnp.float32)
        ratios.append(jnp.stack([valid_w / w, valid_h / h], axis=-1))
    return jnp.stack(ratios, axis=1)


class DeformableTransformer(nn.Module):
    d_model: int = 256
    d_ffn: int = 1024
    n_levels: int = 4
    n_heads: int = 8
    n_enc_points: int = 4
    n_dec_points: int = 4
    n_enc_layers: int = 6
    n_dec_layers: int = 6
    num_classes: int = 1
    n_det_queries: int = 300
    merge_det_track_layer: int = 0
    dropout: float = 0.0
    extra_track_attn: bool = False
    use_dab: bool = True
    with_box_refine: bool = True
    use_checkpoint: bool = False
    msda_impl: str = "auto"
    # "deformable" = reference-faithful MSDA encoder; "windowed" = TPU-native
    # windowed dense attention + cross-level fusion (models/windowed_encoder.py)
    encoder_type: str = "deformable"
    windowed_lepe: bool = True
    windowed_bottomup: bool = True
    windowed_relpos: bool = True
    windowed_window: int = 8
    windowed_prenorm: bool = False
    windowed_shared_cpb: bool = False
    windowed_attn_impl: str = "auto"   # WINDOWED_ATTN_IMPL (ops/window_attn)
    hybrid_deform_min_level: int = 1
    # Sequence parallelism: shard the flattened token axis over this mesh
    # axis.  Encoder MSDA is per-query independent and gather-bound on TPU
    # (PERF_NOTES.md), so sharding tokens divides the dominant cost across
    # chips; XLA inserts the value all-gathers over ICI.
    token_shard_axis: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, srcs: List[jnp.ndarray], masks: List[jnp.ndarray],
                 pos_embeds: List[jnp.ndarray], query_embed: jnp.ndarray,
                 ref_pts: jnp.ndarray, query_mask: jnp.ndarray,
                 deterministic: bool = True):
        """srcs/pos_embeds: per-level (B, H, W, C); masks: (B, H, W) True=pad.
        query_embed: (B, Nq, C) [DAB] or (B, Nq, 2C) [D-DETR];
        ref_pts: (B, Nq, 4) logit space; query_mask: (B, Nq) True=dead slot.
        """
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.n_levels, self.d_model), jnp.float32)

        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        src_flat = jnp.concatenate(
            [s.reshape(s.shape[0], -1, s.shape[-1]) for s in srcs], axis=1)
        mask_flat = jnp.concatenate(
            [m.reshape(m.shape[0], -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [(p + level_embed[i][None, None, None, :]).reshape(
                p.shape[0], -1, p.shape[-1])
             for i, p in enumerate(pos_embeds)], axis=1)
        valid_ratios = valid_ratios_from_masks(masks)

        if self.token_shard_axis is not None:
            from jax.sharding import PartitionSpec as P
            spec = P(None, self.token_shard_axis, None)
            src_flat = jax.lax.with_sharding_constraint(src_flat, spec)
            pos_flat = jax.lax.with_sharding_constraint(pos_flat, spec)

        if self.encoder_type == "conv":
            from .conv_encoder import ConvEncoder
            memory = ConvEncoder(
                self.n_enc_layers, self.d_model, self.d_ffn,
                use_bottomup=self.windowed_bottomup,
                dropout=self.dropout, use_checkpoint=self.use_checkpoint,
                dtype=self.dtype, name="encoder")(
                src_flat, spatial_shapes, valid_ratios, pos_flat, mask_flat,
                deterministic)
        elif self.encoder_type == "windowed":
            from .windowed_encoder import WindowedEncoder
            memory = WindowedEncoder(
                self.n_enc_layers, self.d_model, self.d_ffn, self.n_heads,
                window=self.windowed_window,
                use_lepe=self.windowed_lepe,
                use_bottomup=self.windowed_bottomup,
                use_relpos=self.windowed_relpos,
                prenorm=self.windowed_prenorm,
                shared_cpb=self.windowed_shared_cpb,
                attn_impl=self.windowed_attn_impl,
                dropout=self.dropout, use_checkpoint=self.use_checkpoint,
                dtype=self.dtype, name="encoder")(
                src_flat, spatial_shapes, valid_ratios, pos_flat, mask_flat,
                deterministic)
        elif self.encoder_type == "hybrid":
            from .hybrid_encoder import HybridEncoder
            memory = HybridEncoder(
                self.n_enc_layers, self.d_model, self.d_ffn, self.n_heads,
                n_points=self.n_enc_points,
                deform_min_level=self.hybrid_deform_min_level,
                window=self.windowed_window,
                use_lepe=self.windowed_lepe,
                use_bottomup=self.windowed_bottomup,
                use_relpos=self.windowed_relpos,
                prenorm=self.windowed_prenorm,
                attn_impl=self.windowed_attn_impl,
                dropout=self.dropout, use_checkpoint=self.use_checkpoint,
                msda_impl=self.msda_impl, dtype=self.dtype, name="encoder")(
                src_flat, spatial_shapes, valid_ratios, pos_flat, mask_flat,
                deterministic)
        else:
            memory = Encoder(self.n_enc_layers, self.d_model, self.d_ffn,
                             self.n_levels, self.n_heads, self.n_enc_points,
                             self.dropout, self.use_checkpoint, self.msda_impl,
                             self.dtype, name="encoder")(
                src_flat, spatial_shapes, valid_ratios, pos_flat, mask_flat,
                deterministic)

        if self.use_dab:
            tgt = query_embed
            query_pos = None
        else:
            query_pos, tgt = jnp.split(query_embed, 2, axis=-1)
            query_pos = query_pos.astype(self.dtype)
        reference_points = jax.nn.sigmoid(ref_pts.astype(jnp.float32))

        dec = Decoder(self.n_dec_layers, self.d_model, self.d_ffn,
                      self.n_levels, self.n_heads, self.n_dec_points,
                      self.num_classes, self.n_det_queries,
                      self.merge_det_track_layer, self.dropout,
                      self.extra_track_attn, self.use_dab,
                      self.with_box_refine, self.use_checkpoint,
                      self.msda_impl, self.dtype, name="decoder")(
            tgt.astype(self.dtype), reference_points, memory, spatial_shapes,
            valid_ratios, query_pos, query_mask, mask_flat, deterministic)
        # encoder memory exposed for feature distillation (engine/trainer.py)
        dec = dict(dec, memory=memory, memory_mask=mask_flat)
        return dec
