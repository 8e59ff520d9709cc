import pytest

from memotr_tpu.config import update_config, cfg_get, num_classes_for_dataset


def test_cli_overlay_wins():
    cfg = {"LR": 1e-4, "NESTED": {"DEPTH": 2}}
    out = update_config(cfg, {"lr": 5e-5})
    assert out["LR"] == 5e-5
    assert cfg["LR"] == 1e-4  # original untouched


def test_none_options_skipped():
    cfg = {"LR": 1e-4}
    out = update_config(cfg, {"lr": None})
    assert out["LR"] == 1e-4


def test_unknown_key_errors():
    with pytest.raises(KeyError):
        update_config({"LR": 1.0}, {"bogus": 3})


def test_nested_overlay():
    cfg = {"OUTER": {"INNER": 1}}
    out = update_config(cfg, {"inner": 9})
    assert out["OUTER"]["INNER"] == 9


def test_defaults():
    assert cfg_get({}, "MERGE_DET_TRACK_LAYER") == 0
    assert cfg_get({"MERGE_DET_TRACK_LAYER": 1}, "MERGE_DET_TRACK_LAYER") == 1
    assert num_classes_for_dataset("BDD100K") == 8
    assert num_classes_for_dataset("DanceTrack") == 1


def test_prenorm_width_trap_warns():
    """WINDOWED_PRENORM at HIDDEN_DIM>=256 is a measured-bad combination
    (31.2 vs 50.2 HOTA, QUALITY.md round 4) — build_model must warn."""
    import warnings

    from memotr_tpu.models.memotr import build_model

    base = dict(DATASET="DanceTrack", NUM_DET_QUERIES=10,
                NUM_FEATURE_LEVELS=4, HIDDEN_DIM=256, FFN_DIM=64,
                NUM_HEADS=8, NUM_ENC_POINTS=4, NUM_DEC_POINTS=4,
                NUM_ENC_LAYERS=1, NUM_DEC_LAYERS=1, DROPOUT=0.0,
                ENCODER_TYPE="windowed", WINDOWED_PRENORM=True)
    with pytest.warns(UserWarning, match="WINDOWED_PRENORM"):
        build_model(dict(base))
    # 64-dim pre-norm (the depth-ablation regime) stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        build_model(dict(base, HIDDEN_DIM=64))
    # post-norm at width stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        build_model(dict(base, WINDOWED_PRENORM=False))


def test_tpu_native_key_overlay_without_yaml_entry():
    """CLI flags for known TPU-native keys (``_DEFAULTS``) overlay even when
    the experiment yaml omits them; unknown keys still error."""
    out = update_config({"LR": 1.0}, {"submit-batch": 8,
                                      "encoder-type": "windowed"})
    assert out["SUBMIT_BATCH"] == 8
    assert out["ENCODER_TYPE"] == "windowed"
    with pytest.raises(KeyError):
        update_config({"LR": 1.0}, {"not-a-key": 1})
