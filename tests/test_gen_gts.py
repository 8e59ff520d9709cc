"""GT-converter semantics (reference: data/gen_mot17_gts.py,
data/gen_crowdhuman_gts.py, data/gen_bdd100k_gts.py).

Pins the quirks the datasets downstream rely on:
- MOT17: only considered (mark != 0) pedestrian (label == 1) rows survive;
  track ids are renumbered *on change*, not per unique id (a re-appearing
  id gets a NEW number — gen_mot17_gts.py keeps only `tid != tid_last`
  state, and the dancetrack-style loaders only need per-frame uniqueness);
  coordinates are int-truncated, visibility kept as float.
- CrowdHuman: person-tag boxes minus extra.ignore==1, fresh id per box
  (it is a detection dataset posing as single-frame tracks).
- BDD100K: 8-class map shifted +1 (0 is background downstream,
  bdd100k.py:21-46), crowd attributes dropped, <name>.jpg -> <name>.txt.
"""
import json
import os

from memotr_tpu.data.gen_gts import gen_bdd100k, gen_crowdhuman, gen_mot17


def _read(path):
    with open(path) as f:
        return [line.split() for line in f.read().splitlines()]


def test_mot17_filters_and_renumbers_on_change(tmp_path):
    seq = tmp_path / "src" / "MOT17-02" / "gt"
    seq.mkdir(parents=True)
    rows = [
        # frame, tid, x, y, w, h, mark, label, vis
        "1,5,10.7,20.2,30,40,1,1,0.5",     # kept -> new id 1
        "1,9,1,1,5,5,0,1,1.0",             # mark 0: ignored (no renumber)
        "1,7,2,2,6,6,1,2,1.0",             # label != 1 (non-ped): ignored
        # tid_last only advances on surviving rows, so the two ignored rows
        # above do not break the run: tid 5 still matches -> keeps id 1
        "2,5,11,21,30,40,1,1,0.25",
        "2,8,50,60,7,8,1,1,1.0",           # new tid -> id 2
        "3,5,12,22,30,40,1,1,1.0",         # 5 after 8: CHANGE -> id 3
    ]
    (seq / "gt.txt").write_text("\n".join(rows) + "\n")
    out = tmp_path / "gts"
    gen_mot17(str(tmp_path / "src"), str(out))

    f1 = _read(out / "MOT17-02" / "img1" / "000001.txt")
    assert f1 == [["0", "1", "10", "20", "30", "40", "0.500000"]]
    f2 = _read(out / "MOT17-02" / "img1" / "000002.txt")
    assert [r[1] for r in f2] == ["1", "2"]
    f3 = _read(out / "MOT17-02" / "img1" / "000003.txt")
    assert [r[1] for r in f3] == ["3"]      # re-appearing tid -> new number
    # filtered frames write no ignored rows anywhere
    all_rows = f1 + f2 + f3
    assert all(r[0] == "0" for r in all_rows)


def test_crowdhuman_person_only_fresh_ids(tmp_path):
    ann = tmp_path / "ann.odgt"
    recs = [
        {"ID": "img_a", "gtboxes": [
            {"tag": "person", "fbox": [1.9, 2.9, 10, 20], "extra": {}},
            {"tag": "mask", "fbox": [0, 0, 5, 5], "extra": {}},
            {"tag": "person", "fbox": [3, 4, 5, 6],
             "extra": {"ignore": 1}},
        ]},
        {"ID": "img_b", "gtboxes": [
            {"tag": "person", "fbox": [7, 8, 9, 10], "extra": {}},
        ]},
    ]
    ann.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    out = tmp_path / "out"
    # data_root must actually contain every annotated image — the reference
    # cv2.imread()s each one (gen_crowdhuman_gts.py:34-40) and dies otherwise.
    import pytest
    with pytest.raises(FileNotFoundError):
        gen_crowdhuman(str(tmp_path), str(ann), str(out))
    (tmp_path / "img_a.jpg").write_bytes(b"\xff")
    (tmp_path / "img_b.jpg").write_bytes(b"\xff")
    gen_crowdhuman(str(tmp_path), str(ann), str(out))

    a = _read(out / "img_a.txt")
    b = _read(out / "img_b.txt")
    assert a == [["0", "1", "1", "2", "10", "20"]]   # ints truncated
    assert b == [["0", "2", "7", "8", "9", "10"]]    # ids global across imgs


def test_bdd100k_classmap_and_crowd_filter(tmp_path):
    ann_dir = tmp_path / "labels"
    ann_dir.mkdir()
    frames = [{
        "name": "vid-0000001.jpg",
        "labels": [
            {"category": "pedestrian", "id": 3,
             "box2d": {"x1": 1.0, "y1": 2.0, "x2": 11.0, "y2": 22.0},
             "attributes": {}},
            {"category": "car", "id": 4,
             "box2d": {"x1": 0.0, "y1": 0.0, "x2": 4.0, "y2": 4.0},
             "attributes": {"crowd": True}},              # dropped
            {"category": "traffic sign", "id": 5,         # unmapped class
             "box2d": {"x1": 0.0, "y1": 0.0, "x2": 1.0, "y2": 1.0},
             "attributes": {}},
            # Aliases in CATEGORY_TO_LABEL are for READING foreign GTs; the
            # reference generator's executed filter (filter_ignore=True,
            # gen_bdd100k_gts.py:23-25,56-57) keeps only the 8 canonical
            # names, so 'other person' must be dropped here.
            {"category": "other person", "id": 6,
             "box2d": {"x1": 0.0, "y1": 0.0, "x2": 2.0, "y2": 2.0},
             "attributes": {}},
        ],
    }, {
        # zero labels -> NO file (gen_bdd100k_gts.py:42-43): downstream
        # bdd100k.py must see this frame as GT-missing, not GT-empty.
        "name": "vid-0000002.jpg",
        "labels": [],
    }, {
        # labels existed but all were filtered -> EMPTY file (the reference
        # opens the file before filtering).
        "name": "vid-0000003.jpg",
        "labels": [
            {"category": "trailer", "id": 7,
             "box2d": {"x1": 0.0, "y1": 0.0, "x2": 2.0, "y2": 2.0},
             "attributes": {}},
        ],
    }]
    (ann_dir / "vid.json").write_text(json.dumps(frames))
    out = tmp_path / "filter_labels"
    gen_bdd100k(str(ann_dir), str(out))

    got = _read(out / "vid" / "vid-0000001.txt")
    # pedestrian is label 0 in CATEGORY_TO_LABEL -> written as 1 (+1 shift)
    assert got == [["1", "3", "1.0", "2.0", "10.0", "20.0"]]
    assert not os.path.exists(out / "vid" / "vid-0000002.txt")
    assert _read(out / "vid" / "vid-0000003.txt") == []
