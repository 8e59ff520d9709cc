"""Metric parity: our HOTA/CLEAR/Identity vs the TrackEval reference oracle.

TrackEval (vendored in the reference repo) is the metric oracle the reference
shells out to; we import it read-only and demand numerical agreement on
randomized synthetic tracking scenarios.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/TrackEval")

from memotr_tpu.metrics.clear import clear_sequence, combine_clear
from memotr_tpu.metrics.hota import combine_hota, hota_sequence
from memotr_tpu.metrics.identity import combine_identity, identity_sequence
from memotr_tpu.metrics.similarity import build_sequence_data, iou_xywh

trackeval = pytest.importorskip("trackeval")
from trackeval.metrics import HOTA, CLEAR, Identity  # noqa: E402


def synth_scenario(rng, n_frames=30, n_gt=6, drop_p=0.2, noise=5.0,
                   id_switch_p=0.05, fp_p=0.1):
    """Random GT tracks + noisy tracker with drops, switches and FPs."""
    gt_frames, pr_frames = [], []
    base = rng.uniform(50, 400, (n_gt, 2))
    vel = rng.uniform(-3, 3, (n_gt, 2))
    wh = rng.uniform(20, 60, (n_gt, 2))
    id_map = np.arange(n_gt)
    for t in range(n_frames):
        pos = base + vel * t
        gids, gboxes, pids, pboxes = [], [], [], []
        for g in range(n_gt):
            gids.append(g)
            gboxes.append([pos[g, 0], pos[g, 1], wh[g, 0], wh[g, 1]])
            if rng.random() > drop_p:
                if rng.random() < id_switch_p:
                    id_map[g] = 100 + rng.integers(0, 50)
                pids.append(int(id_map[g]))
                jitter = rng.normal(0, noise, 2)
                pboxes.append([pos[g, 0] + jitter[0], pos[g, 1] + jitter[1],
                               wh[g, 0], wh[g, 1]])
        for _ in range(rng.poisson(fp_p * n_gt)):
            pids.append(int(1000 + rng.integers(0, 30)))
            xy = rng.uniform(0, 500, 2)
            pboxes.append([xy[0], xy[1], 30, 40])
        gt_frames.append((np.asarray(gids), np.asarray(gboxes, np.float64)))
        pr_frames.append((np.asarray(pids, np.int64),
                          np.asarray(pboxes, np.float64).reshape(-1, 4)))
    return gt_frames, pr_frames


def to_trackeval(data):
    return {
        "num_tracker_dets": data["num_pr_dets"],
        "num_gt_dets": data["num_gt_dets"],
        "num_gt_ids": data["num_gt_ids"],
        "num_tracker_ids": data["num_pr_ids"],
        "gt_ids": data["gt_ids"],
        "tracker_ids": data["pr_ids"],
        "similarity_scores": data["similarity"],
        "num_timesteps": data["num_timesteps"],
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hota_matches_trackeval(seed):
    rng = np.random.default_rng(seed)
    data = build_sequence_data(*synth_scenario(rng))
    ours = hota_sequence(data)
    ref = HOTA().eval_sequence(to_trackeval(data))
    for k in ("HOTA", "DetA", "AssA", "DetRe", "DetPr", "LocA"):
        np.testing.assert_allclose(ours[k], ref[k], atol=1e-10, err_msg=k)
    np.testing.assert_array_equal(ours["HOTA_TP"], ref["HOTA_TP"])


@pytest.mark.parametrize("seed", [3, 4])
def test_clear_matches_trackeval(seed):
    rng = np.random.default_rng(seed)
    data = build_sequence_data(*synth_scenario(rng))
    ours = clear_sequence(data)
    ref = CLEAR({"THRESHOLD": 0.5, "PRINT_CONFIG": False}).eval_sequence(
        to_trackeval(data))
    for k in ("MOTA", "MOTP", "sMOTA", "MODA", "CLR_TP", "CLR_FN",
              "CLR_FP", "IDSW", "MT",
              "PT", "ML", "Frag", "CLR_Re", "CLR_Pr"):
        np.testing.assert_allclose(float(ours[k]), float(ref[k]),
                                   atol=1e-10, err_msg=k)


@pytest.mark.parametrize("seed", [5, 6])
def test_identity_matches_trackeval(seed):
    rng = np.random.default_rng(seed)
    data = build_sequence_data(*synth_scenario(rng))
    ours = identity_sequence(data)
    ref = Identity({"THRESHOLD": 0.5, "PRINT_CONFIG": False}).eval_sequence(
        to_trackeval(data))
    for k in ("IDF1", "IDR", "IDP", "IDTP", "IDFN", "IDFP"):
        np.testing.assert_allclose(float(ours[k]), float(ref[k]),
                                   atol=1e-10, err_msg=k)


def test_combination_matches_trackeval():
    rng = np.random.default_rng(7)
    datas = [build_sequence_data(*synth_scenario(rng, n_frames=15))
             for _ in range(3)]
    ours = combine_hota([hota_sequence(d) for d in datas])
    h = HOTA()
    ref = h.combine_sequences(
        {i: h.eval_sequence(to_trackeval(d)) for i, d in enumerate(datas)})
    np.testing.assert_allclose(ours["HOTA"], ref["HOTA"], atol=1e-10)
    c_ours = combine_clear([clear_sequence(d) for d in datas])
    c = CLEAR({"THRESHOLD": 0.5, "PRINT_CONFIG": False})
    c_ref = c.combine_sequences(
        {i: c.eval_sequence(to_trackeval(d)) for i, d in enumerate(datas)})
    np.testing.assert_allclose(c_ours["MOTA"], c_ref["MOTA"], atol=1e-10)
    np.testing.assert_allclose(c_ours["sMOTA"], c_ref["sMOTA"], atol=1e-10)
    i_ours = combine_identity([identity_sequence(d) for d in datas])
    i_m = Identity({"THRESHOLD": 0.5, "PRINT_CONFIG": False})
    i_ref = i_m.combine_sequences(
        {i: i_m.eval_sequence(to_trackeval(d)) for i, d in enumerate(datas)})
    np.testing.assert_allclose(i_ours["IDF1"], i_ref["IDF1"], atol=1e-10)


def test_perfect_tracker_is_perfect():
    rng = np.random.default_rng(8)
    gt, _ = synth_scenario(rng, drop_p=0.0, noise=0.0, id_switch_p=0.0,
                           fp_p=0.0)
    data = build_sequence_data(gt, gt)
    h = hota_sequence(data)
    np.testing.assert_allclose(h["HOTA"], 1.0)
    c = clear_sequence(data)
    assert c["MOTA"] == 1.0 and c["IDSW"] == 0
    i = identity_sequence(data)
    assert i["IDF1"] == 1.0


from memotr_tpu.metrics.vace import vace_sequence, combine_vace
from memotr_tpu.metrics.ideucl import ideucl_sequence

from trackeval.metrics import VACE, IDEucl  # noqa: E402


@pytest.mark.parametrize("seed", [9, 10])
def test_vace_matches_trackeval(seed):
    rng = np.random.default_rng(seed)
    data = build_sequence_data(*synth_scenario(rng))
    ours = vace_sequence(data)
    ref = VACE().eval_sequence(to_trackeval(data))
    for k in ("STDA", "ATA", "FDA", "SFDA"):
        np.testing.assert_allclose(float(ours[k]), float(ref[k]),
                                   atol=1e-10, err_msg=k)


@pytest.mark.parametrize("seed", [11, 12])
def test_ideucl_matches_trackeval(seed):
    rng = np.random.default_rng(seed)
    gt_frames, pr_frames = synth_scenario(rng)
    data = build_sequence_data(gt_frames, pr_frames)
    ours = ideucl_sequence(data)
    te = to_trackeval(data)
    # TrackEval's IDEucl consumes xyxy gt_dets; ours uses xywh internally
    te["gt_dets"] = [
        np.concatenate([b[:, :2], b[:, :2] + b[:, 2:]], axis=1)
        for b in data["gt_dets"]]
    ref = IDEucl({"THRESHOLD": 0.5, "PRINT_CONFIG": False}).eval_sequence(te)
    np.testing.assert_allclose(float(ours["IDEucl"]), float(ref["IDEucl"]),
                               atol=1e-10)


def test_seqmap_selects_sequence_subset(tmp_path):
    """evaluate_mot_challenge must honor a TrackEval seqmap file
    (the reference passes --SEQMAP_FILE, eval_engine.py:93-97)."""
    from memotr_tpu.metrics.evaluator import (evaluate_mot_challenge,
                                              load_seqmap)

    gt_dir = tmp_path / "gt"
    tr_dir = tmp_path / "tracker"
    tr_dir.mkdir()
    # seq_a: tracker perfect; seq_b: tracker empty (would tank HOTA)
    for seq, track in (("seq_a", True), ("seq_b", False)):
        d = gt_dir / seq / "gt"
        d.mkdir(parents=True)
        lines = [f"{t},1,{10 + t},20,30,40,1,1,1.0\n" for t in range(1, 6)]
        (d / "gt.txt").write_text("".join(lines))
        (tr_dir / f"{seq}.txt").write_text("".join(lines) if track else "")

    smap = tmp_path / "val_seqmap.txt"
    smap.write_text("name\nseq_a\n")
    assert load_seqmap(str(smap)) == ["seq_a"]

    only_a = evaluate_mot_challenge(str(gt_dir), str(tr_dir),
                                    seqmap_file=str(smap), num_parallel=1)
    both = evaluate_mot_challenge(str(gt_dir), str(tr_dir), num_parallel=1)
    np.testing.assert_allclose(only_a["HOTA"], 100.0, atol=1e-6)
    assert both["HOTA"] < 99.0


def test_count_matches_trackeval():
    from memotr_tpu.metrics.count import count_sequence, combine_count
    from trackeval.metrics import Count
    rng = np.random.default_rng(13)
    datas = [build_sequence_data(*synth_scenario(rng)) for _ in range(3)]
    ours = [count_sequence(d) for d in datas]
    refs = [Count().eval_sequence(to_trackeval(d)) for d in datas]
    for o, r in zip(ours, refs):
        for f in ("Dets", "GT_Dets", "IDs", "GT_IDs"):
            assert o[f] == r[f], f
    comb = combine_count(ours)
    rcomb = Count().combine_sequences({str(i): r for i, r in enumerate(refs)})
    assert comb == {k: int(v) for k, v in rcomb.items()}


def test_track_map_matches_trackeval():
    from memotr_tpu.metrics.track_map import (build_track_data,
                                              combine_track_map,
                                              track_map_sequence)
    from trackeval.metrics import TrackMAP

    tm = TrackMAP({"PRINT_CONFIG": False})
    rng = np.random.default_rng(21)
    ours_seq, ref_seq = [], {}
    for s in range(3):
        gt_frames, pr_frames = synth_scenario(rng, n_frames=12, n_gt=5)
        # per-frame scores so track scores differ (sorted at combine time)
        pr_scores = [rng.uniform(0.3, 1.0, len(ids)) for ids, _ in pr_frames]
        data = build_track_data(gt_frames, pr_frames, pr_scores)
        ours_seq.append(track_map_sequence(data))
        ref_seq[s] = tm.eval_sequence({
            "gt_track_ids": data["gt_track_ids"],
            "dt_track_ids": data["dt_track_ids"],
            "gt_tracks": data["gt_tracks"],
            "dt_tracks": data["dt_tracks"],
            "dt_track_scores": data["dt_track_scores"],
            "gt_track_areas": data["gt_track_areas"],
            "dt_track_areas": data["dt_track_areas"],
            "gt_track_lengths": data["gt_track_lengths"],
            "dt_track_lengths": data["dt_track_lengths"],
            "gt_track_iscrowd": None,
            "iou_type": "bbox", "boxformat": "xywh",
        })
    ours = combine_track_map(ours_seq)
    ref = tm.combine_sequences(ref_seq)
    for lbl in ("all", "area_s", "area_m", "area_l",
                "time_s", "time_m", "time_l"):
        np.testing.assert_allclose(ours[f"AP_{lbl}"], ref[f"AP_{lbl}"],
                                   atol=1e-10, err_msg=f"AP_{lbl}")
        np.testing.assert_allclose(ours[f"AR_{lbl}"], ref[f"AR_{lbl}"],
                                   atol=1e-10, err_msg=f"AR_{lbl}")
