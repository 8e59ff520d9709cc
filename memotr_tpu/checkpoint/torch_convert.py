"""PyTorch -> JAX weight conversion.

Converts reference-format MeMOTR checkpoints (and raw DAB-Deformable-DETR
pretrained checkpoints) into this framework's parameter trees so released
weights reproduce published HOTA without retraining.

Layout transforms:
- Linear ``weight (out,in)`` -> Dense ``kernel (in,out)`` (transpose)
- Conv2d ``(out,in,kh,kw)`` -> flax HWIO ``(kh,kw,in,out)``
- LayerNorm/GroupNorm ``weight``/``bias`` -> ``scale``/``bias``
- ``nn.MultiheadAttention`` joint ``in_proj_weight (3E,E)`` -> separate
  q/k/v Dense kernels
- FrozenBatchNorm buffers -> the ``frozen`` variable collection

The DAB-D-DETR pretrained remap rules mirror ``load_pretrained_model``
(``/root/reference/models/utils.py:88-168``): ``class_embed`` row slicing per
class count (rows 1:1+K of the 91-class COCO head; BDD100K keeps random
init), ``query_embed``/``tgt_embed`` -> ``det_query_embed``,
``refpoint_embed`` -> ``det_anchor``, ``backbone.0.body`` / ``input_proj``
prefix rewrites.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _linear(tree, base: Tuple[str, ...], key: str, v: np.ndarray):
    if key == "weight":
        _set(tree, base + ("kernel",), _np(v).T)
    else:
        _set(tree, base + ("bias",), _np(v))


def _norm(tree, base: Tuple[str, ...], key: str, v: np.ndarray):
    _set(tree, base + ("scale" if key == "weight" else "bias",), _np(v))


def _conv(tree, base: Tuple[str, ...], key: str, v: np.ndarray):
    if key == "weight":
        _set(tree, base + ("kernel",), _np(v).transpose(2, 3, 1, 0))
    else:
        _set(tree, base + ("bias",), _np(v))


def remap_pretrained_dab(sd: Dict[str, Any], num_classes: int) -> Dict[str, Any]:
    """Apply the reference's pretrained-checkpoint key remaps
    (models/utils.py:88-168) producing reference-MeMOTR-format keys."""
    out = {}
    for k, v in sd.items():
        v = _np(v)
        if "class_embed" in k and v.ndim >= 1 and v.shape[0] > 8:
            # COCO 91-class head -> slice rows [1 : 1+num_classes]
            if num_classes in (1, 2, 3):
                v = v[1:1 + num_classes]
                out[k] = v
            else:
                continue  # BDD100K: keep random init (utils.py:106-108)
        elif re.match(r"^(transformer\.)?(query_embed|tgt_embed)", k):
            out["det_query_embed"] = v
        elif "refpoint_embed" in k:
            out["det_anchor"] = v
        elif k.startswith("backbone.0.body"):
            out["backbone.backbone.backbone" + k[15:]] = v
        elif k.startswith("input_proj"):
            out["feature_projs" + k[10:]] = v
        else:
            out[k] = v
    return out


def convert_torch_state_dict(sd: Dict[str, Any], use_dab: bool = True
                             ) -> Tuple[Dict, Dict, Dict]:
    """reference-MeMOTR state dict -> (model_params, updater_params, frozen).

    Returned trees use this framework's module names; unknown keys are
    collected under the "_unconverted" list for the caller to report.
    """
    model: Dict = {}
    updater: Dict = {}
    frozen: Dict = {}
    unconverted = []
    mha_buffers: Dict[Tuple[str, ...], Dict[str, np.ndarray]] = {}

    def mha(base: Tuple[str, ...], sub: str, v):
        """Collect torch MHA pieces; materialized at the end."""
        mha_buffers.setdefault(base, {})[sub] = _np(v)

    for k, v in sd.items():
        # the reference shares bbox/class heads between the decoder's box
        # refinement and the output heads (set_refine_bbox_embed,
        # deformable_transformer.py:272-274), so its state dict carries the
        # same tensors twice; normalize the decoder alias onto the canonical
        # top-level name (harmless identical overwrite)
        k = re.sub(r"^transformer\.decoder\.(bbox_embed|class_embed)\.",
                   r"\1.", k)

        # ---------------- backbone ------------------------------------------
        m = re.match(r"backbone\.backbone\.backbone\.(.*)", k)
        if m:
            rest = m.group(1)
            bm = re.match(
                r"(?:layer(\d)\.(\d+)\.)?"
                r"(conv\d|bn\d|downsample\.0|downsample\.1)\.(.*)", rest)
            if not bm:
                unconverted.append(k)
                continue
            layer, block, comp, key = bm.groups()
            prefix = ("backbone",)
            if layer is not None:
                prefix += (f"layer{layer}_{block}",)
            if comp.startswith("conv") or comp == "downsample.0":
                name = "downsample_conv" if comp == "downsample.0" else comp
                _conv(model, prefix + (name,), key, v)
            else:  # bn / downsample.1 -> frozen collection
                name = "downsample_bn" if comp == "downsample.1" else comp
                _set(frozen, prefix + (name, key), _np(v))
            continue

        # ---------------- feature projections --------------------------------
        m = re.match(r"feature_projs\.(\d+)\.(\d)\.(weight|bias)", k)
        if m:
            i, sub, key = m.groups()
            if sub == "0":
                _conv(model, (f"feature_proj_{i}_conv",), key, v)
            else:
                _norm(model, (f"feature_proj_{i}_norm",), key, v)
            continue

        # ---------------- det queries / misc top-level ----------------------
        if k == "det_query_embed":
            _set(model, ("det_query_embed",), _np(v))
            continue
        if k == "det_anchor":
            _set(model, ("det_anchor",), _np(v))
            continue
        if k == "transformer.level_embed":
            _set(model, ("transformer", "level_embed"), _np(v))
            continue
        m = re.match(r"transformer\.reference_points\.(weight|bias)", k)
        if m:
            _linear(model, ("reference_points",), m.group(1), v)
            continue

        # ---------------- encoder layers -------------------------------------
        m = re.match(r"transformer\.encoder\.layers\.(\d+)\.(.*)", k)
        if m:
            i, rest = m.groups()
            base = ("transformer", "encoder", f"layer_{i}")
            _convert_msda_layer(model, base, rest, v, unconverted, k, mha)
            continue

        # ---------------- decoder layers -------------------------------------
        m = re.match(r"transformer\.decoder\.layers\.(\d+)\.(.*)", k)
        if m:
            i, rest = m.groups()
            base = ("transformer", "decoder", f"layer_{i}")
            _convert_msda_layer(model, base, rest, v, unconverted, k, mha)
            continue

        # ---------------- decoder heads (DAB) --------------------------------
        m = re.match(
            r"transformer\.decoder\.(ref_point_head|query_scale)"
            r"\.layers\.(\d+)\.(weight|bias)", k)
        if m:
            name, j, key = m.groups()
            _linear(model, ("transformer", "decoder", name, f"layers_{j}"),
                    key, v)
            continue

        # ---------------- class / bbox heads ----------------------------------
        m = re.match(r"class_embed\.(\d+)\.(weight|bias)", k)
        if m:
            i, key = m.groups()
            _linear(model, ("transformer", "decoder", f"class_embed_{i}"),
                    key, v)
            continue
        m = re.match(r"bbox_embed\.(\d+)\.layers\.(\d+)\.(weight|bias)", k)
        if m:
            i, j, key = m.groups()
            _linear(model, ("transformer", "decoder", f"bbox_embed_{i}",
                            f"layers_{j}"), key, v)
            continue

        # ---------------- query updater ---------------------------------------
        m = re.match(r"query_updater\.(.*)", k)
        if m:
            rest = m.group(1)
            um = re.match(r"confidence_weight_net\.0\.layers\.(\d+)\.(weight|bias)",
                          rest)
            if um:
                _linear(updater, ("confidence_weight_net",
                                  f"layers_{um.group(1)}"), um.group(2), v)
                continue
            um = re.match(
                r"(short_memory_fusion|query_pos_head)\.layers\.(\d+)\.(weight|bias)",
                rest)
            if um:
                _linear(updater, (um.group(1), f"layers_{um.group(2)}"),
                        um.group(3), v)
                continue
            um = re.match(r"memory_attn\.(in_proj_weight|in_proj_bias)", rest)
            if um:
                mha(("updater", "memory_attn"), um.group(1), v)
                continue
            um = re.match(r"memory_attn\.out_proj\.(weight|bias)", rest)
            if um:
                _linear(updater, ("memory_attn", "out_proj"), um.group(1), v)
                continue
            um = re.match(r"(memory_norm|query_feat_norm)\.(weight|bias)", rest)
            if um:
                _norm(updater, (um.group(1),), um.group(2), v)
                continue
            um = re.match(
                r"(memory_ffn|query_feat_ffn)\.(linear1|linear2)\.(weight|bias)",
                rest)
            if um:
                _linear(updater, (um.group(1), um.group(2)), um.group(3), v)
                continue
            um = re.match(r"(memory_ffn|query_feat_ffn)\.norm\.(weight|bias)",
                          rest)
            if um:
                _norm(updater, (um.group(1), "norm"), um.group(2), v)
                continue
            um = re.match(r"(linear_pos1|linear_pos2)\.(weight|bias)", rest)
            if um:
                _linear(updater, (um.group(1),), um.group(2), v)
                continue
            um = re.match(r"norm_pos\.(weight|bias)", rest)
            if um:
                _norm(updater, ("norm_pos",), um.group(1), v)
                continue
            unconverted.append(k)
            continue

        unconverted.append(k)

    # materialize joint-MHA projections into q/k/v Dense params
    for base, bufs in mha_buffers.items():
        tree = updater if base[0] == "updater" else model
        path = base[1:]
        if "in_proj_weight" in bufs:
            w = bufs["in_proj_weight"]
            e = w.shape[0] // 3
            for name, chunk in zip(("q_proj", "k_proj", "v_proj"),
                                   (w[:e], w[e:2 * e], w[2 * e:])):
                _set(tree, path + (name, "kernel"), chunk.T)
        if "in_proj_bias" in bufs:
            b = bufs["in_proj_bias"]
            e = b.shape[0] // 3
            for name, chunk in zip(("q_proj", "k_proj", "v_proj"),
                                   (b[:e], b[e:2 * e], b[2 * e:])):
                _set(tree, path + (name, "bias"), chunk)

    model["_unconverted"] = unconverted
    return model, updater, frozen


def _convert_msda_layer(model, base, rest, v, unconverted, full_key, mha):
    """Shared encoder/decoder layer-component mapping."""
    m = re.match(
        r"(self_attn|cross_attn)\.(sampling_offsets|attention_weights|"
        r"value_proj|output_proj)\.(weight|bias)", rest)
    if m:
        attn, comp, key = m.groups()
        _linear(model, base + (attn, comp), key, v)
        return
    m = re.match(r"(self_attn|track_attn)\.(in_proj_weight|in_proj_bias)", rest)
    if m:
        mha(("model",) + base + (m.group(1),), m.group(2), v)
        return
    m = re.match(r"(self_attn|track_attn)\.out_proj\.(weight|bias)", rest)
    if m:
        _linear(model, base + (m.group(1), "out_proj"), m.group(2), v)
        return
    m = re.match(r"(norm\d)\.(weight|bias)", rest)
    if m:
        _norm(model, base + (m.group(1),), m.group(2), v)
        return
    m = re.match(r"(linear\d)\.(weight|bias)", rest)
    if m:
        _linear(model, base + (m.group(1),), m.group(2), v)
        return
    unconverted.append(full_key)
