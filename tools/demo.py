"""Video tracking demo: run MeMOTR-TPU on a video file and write an
annotated copy.

Script equivalent of the reference's ``tools/demo.ipynb``: same
``process_image`` resize as the streaming SeqDataset, the runtime-tracker
loop, OC-SORT-style color-per-id box plotting, annotated video out.

  python tools/demo.py --config configs/train_dancetrack.yaml \
      --checkpoint outputs/memotr_dancetrack/checkpoint_19 \
      --video in.mp4 --out out.mp4
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import cv2
import jax.numpy as jnp
import numpy as np

from memotr_tpu.checkpoint.orbax_io import load_checkpoint
from memotr_tpu.config import cfg_get, yaml_to_dict
from memotr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from memotr_tpu.engine.submit import make_eval_step
from memotr_tpu.models.memotr import build_model
from memotr_tpu.models.query_updater import build_query_updater
from memotr_tpu.structures.track_state import TrackState


def color_for_id(i: int):
    rng = np.random.default_rng(int(i) * 9781 + 3)
    return tuple(int(c) for c in rng.integers(64, 255, 3))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--video", required=True)
    p.add_argument("--out", default="demo_out.avi")
    p.add_argument("--score-thresh", type=float, default=0.5)
    args = p.parse_args()

    config = yaml_to_dict(args.config)
    model = build_model(config)
    updater = build_query_updater(config)
    ckpt = load_checkpoint(args.checkpoint)
    params = {"params": ckpt["params"]["model"]}
    if "frozen" in ckpt:
        params["frozen"] = ckpt["frozen"]
    uparams = {"params": ckpt["params"]["updater"]}

    slots = cfg_get(config, "TRACK_SLOTS", 64)
    step = make_eval_step(model, updater, config["NUM_DET_QUERIES"],
                          config["DET_SCORE_THRESH"],
                          config["TRACK_SCORE_THRESH"],
                          config["MISS_TOLERANCE"])
    state = TrackState.empty(1, slots, config["HIDDEN_DIM"],
                             model.num_classes,
                             use_dab=cfg_get(config, "USE_DAB", True))

    cap = cv2.VideoCapture(args.video)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25
    ow = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    oh = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(args.out, cv2.VideoWriter_fourcc(*"XVID"),
                             fps, (ow, oh))
    short, long_max = (cfg_get(config, "EVAL_SHORT_SIDE", 800),
                       cfg_get(config, "EVAL_MAX_SIDE", 1536))
    canvas_hw = (short, long_max) if ow >= oh else (long_max, short)

    n = 0
    while True:
        ok, frame_bgr = cap.read()
        if not ok:
            break
        rgb = cv2.cvtColor(frame_bgr, cv2.COLOR_BGR2RGB)
        scale = short / min(oh, ow)
        if max(oh, ow) * scale > long_max:
            scale = long_max / max(oh, ow)
        th, tw = int(oh * scale), int(ow * scale)
        resized = cv2.resize(rgb, (tw, th)).astype(np.float32) / 255.0
        resized = (resized - IMAGENET_MEAN) / IMAGENET_STD
        canvas = np.zeros((*canvas_hw, 3), np.float32)
        mask = np.ones(canvas_hw, bool)
        canvas[:th, :tw] = resized
        mask[:th, :tw] = False

        results, state = step(params, uparams, jnp.asarray(canvas)[None],
                              jnp.asarray(mask)[None], state)
        keep = np.asarray(results["mask"][0]) & \
            (np.asarray(results["scores"][0]) > args.score_thresh)
        boxes = np.asarray(results["boxes"][0])
        ids = np.asarray(results["ids"][0])
        for j in np.nonzero(keep)[0]:
            cx, cy, w, h = boxes[j]
            x1, y1 = int((cx - w / 2) * ow), int((cy - h / 2) * oh)
            x2, y2 = int((cx + w / 2) * ow), int((cy + h / 2) * oh)
            c = color_for_id(ids[j])
            cv2.rectangle(frame_bgr, (x1, y1), (x2, y2), c, 2)
            cv2.putText(frame_bgr, str(int(ids[j])), (x1, max(y1 - 5, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.6, c, 2)
        writer.write(frame_bgr)
        n += 1
        if n % 50 == 0:
            print(f"{n} frames", flush=True)
    writer.release()
    print(f"wrote {args.out} ({n} frames)")


if __name__ == "__main__":
    main()
