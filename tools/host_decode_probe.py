"""Host-side decode throughput probe (no TPU needed).

Measures the data-plane half of end-to-end streaming: JPEG read + decode
(native dataplane if built, PIL otherwise) + resize-to-canvas + uint8
canvas assembly, via the actual ``SeqDataset`` used by the Submitter.
On deployment hardware e2e streaming FPS = min(this, device-step FPS);
through the axon relay the link itself dominates (PERF_NOTES.md round 3).

Usage: python tools/host_decode_probe.py [seq_dir] [n_frames]
(default seq_dir is the synthetic 1080p sequence bench.py e2e creates)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    seq_dir = sys.argv[1] if len(sys.argv) > 1 \
        else "/tmp/bench_e2e/dancetrack0000"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    if not os.path.isdir(os.path.join(seq_dir, "img1")):
        from bench import make_jpeg_sequence
        make_jpeg_sequence(seq_dir, n_frames=n)

    from memotr_tpu.data.seq_dataset import SeqDataset
    out = {}
    for label, kw in (("uint8 (pipelined submit path)", {"uint8": True}),
                      ("f32 normalized (native plane)", {"uint8": False})):
        ds = SeqDataset(seq_dir, 800, 1536, **kw)
        m = min(n, len(ds))
        ds[0]                                # warm caches / open files
        t0 = time.perf_counter()
        for i in range(m):
            item = ds[i]
        wall = time.perf_counter() - t0
        out[label] = {"fps": round(m / wall, 3),
                      "canvas": list(item["image"].shape), "n_frames": m}
    print(json.dumps({
        "metric": "host decode+resize throughput (SeqDataset, 1080p JPEG "
                  "-> 800x1536 canvas)", "unit": "frames/s", **out}))


if __name__ == "__main__":
    main()
