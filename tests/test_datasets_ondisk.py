"""On-disk layout tests for the tracking/person/fisheye datasets: build a
tiny REAL directory layout (odgt / MOT gt.txt + seqinfo.ini / WoodScape
folders) and check the parsers + the reference-mirrored knobs
(bbox_types/boxes_limit, visibility_threshold/random_step,
seg_classes/merge_classes/fragment)."""

import configparser
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from aloception_tpu import alodataset
from aloception_tpu.alodataset import Split


def _png(path, hw=(32, 40), value=None, gray=False):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if gray:
        img = value
    else:
        img = np.random.RandomState(0).randint(
            0, 255, hw + (3,)).astype(np.uint8) if value is None else value
    cv2.imwrite(path, img)


def test_crowdhuman_odgt_bbox_types_and_limit(tmp_path):
    root = tmp_path / "crowd"
    img_dir = root / "CrowdHuman_train" / "Images"
    recs = []
    for k in range(2):
        _png(str(img_dir / f"im{k}.jpg"), hw=(40, 60))
        gt = [
            {"tag": "person", "fbox": [2, 2, 20, 30], "vbox": [4, 4, 10, 20],
             "hbox": [6, 2, 8, 8]},
            {"tag": "person", "fbox": [30, 5, 25, 30], "vbox": [31, 6, 20, 25],
             "hbox": [35, 5, 8, 8]},
            {"tag": "person", "fbox": [1, 1, 5, 5], "vbox": [1, 1, 4, 4],
             "hbox": [1, 1, 2, 2]},
            {"tag": "mask", "fbox": [0, 0, 10, 10]},              # dropped
            {"tag": "person", "fbox": [9, 9, 9, 9],
             "extra": {"ignore": 1}},                             # dropped
        ]
        recs.append({"ID": f"im{k}", "gtboxes": gt})
    with open(root / "annotation_train.odgt", "w") as f:
        f.write("\n".join(json.dumps(r) for r in recs))

    ds = alodataset.CrowdHumanDataset(
        dataset_dir=str(root), split=Split.TRAIN,
        bbox_types=("fbox", "vbox", "hbox"), boxes_limit=2)
    assert len(ds) == 2
    frame = ds.getitem(0)
    # all three types live as NAMED boxes2d children, limited to the 2
    # widest of the 3 kept persons (mask/ignore records dropped)
    named = frame.get_child("boxes2d")
    assert set(named) == {"fbox", "vbox", "hbox"}
    assert all(b.shape[0] == 2 for b in named.values())
    # widest-first: the tiny 5x5 person was dropped by boxes_limit
    areas = np.asarray(named["fbox"].area())
    assert areas.min() > (5 * 5) / (40 * 60)


def test_crowdhuman_test_split_images_only(tmp_path):
    root = tmp_path / "crowd"
    _png(str(root / "CrowdHuman_test" / "Images" / "t0.jpg"), hw=(24, 24))
    ds = alodataset.CrowdHumanDataset(dataset_dir=str(root), split=Split.TEST)
    assert len(ds) == 1
    frame = ds.getitem(0)
    assert frame.boxes2d is None or frame.boxes2d.shape[0] == 0


def _make_mot(root, seq="MOT17-02-FRCNN", n=6, hw=(32, 40)):
    seq_dir = root / "train" / seq
    for t in range(1, n + 1):
        _png(str(seq_dir / "img1" / f"{t:06d}.jpg"), hw=hw)
    ini = configparser.ConfigParser()
    ini["Sequence"] = {"name": seq, "seqLength": str(n),
                       "imWidth": str(hw[1]), "imHeight": str(hw[0])}
    os.makedirs(seq_dir, exist_ok=True)
    with open(seq_dir / "seqinfo.ini", "w") as f:
        ini.write(f)
    rows = []
    for t in range(1, n + 1):
        rows.append(f"{t},1,2,2,10,12,1,1,0.9")       # visible track
        rows.append(f"{t},2,20,8,8,10,1,1,0.1")       # mostly occluded
        rows.append(f"{t},3,5,5,4,4,0,1,1.0")         # conf 0 -> dropped
    os.makedirs(seq_dir / "gt", exist_ok=True)
    with open(seq_dir / "gt" / "gt.txt", "w") as f:
        f.write("\n".join(rows))


def test_mot17_visibility_threshold_and_sets(tmp_path):
    _make_mot(tmp_path)
    ds = alodataset.Mot17(dataset_dir=str(tmp_path), split=Split.TRAIN,
                          validation_sequences=["MOT17-09"],
                          detections_set=["FRCNN", "SDP"],
                          visibility_threshold=0.5, sequence_size=2)
    assert len(ds) > 0
    frame = ds.getitem(0)                 # (T, C, H, W)
    assert frame.names[0] == "T" and frame.shape[0] == 2
    # only the visible track survives the 0.5 threshold
    t0 = frame[0]
    assert t0.boxes2d.shape[0] == 1


def test_mot17_random_step_stays_in_bounds(tmp_path):
    _make_mot(tmp_path, n=5)
    ds = alodataset.Mot17(dataset_dir=str(tmp_path), split=Split.TRAIN,
                          validation_sequences=["MOT17-09"],
                          sequence_size=2, random_step=10)
    np.random.seed(0)
    for idx in range(len(ds)):
        frame = ds.getitem(idx)           # must not raise on missing frames
        assert frame.shape[0] == 2


def _make_woodscape(root, n=6):
    cams = ["FV", "RV", "MVL", "MVR", "FV", "RV"]
    names = [f"{k:05d}_{cams[k % len(cams)]}.png" for k in range(n)]
    for name in names:
        _png(str(root / "rgb_images" / name), hw=(24, 32))
        stem = os.path.splitext(name)[0]
        with open_box(root, stem) as f:
            f.write("vehicles,1,2,2,12,10\nperson,3,16,4,24,12\n")
        sem = np.zeros((24, 32), np.uint8)
        sem[:8] = 1                        # road
        sem[8:12] = 6                      # vehicles
        sem[12:14] = 4                     # person
        _png(str(root / "semantic_annotations" / "gtLabels" / name),
             value=sem, gray=True)
    return names


def open_box(root, stem):
    p = root / "box_2d_annotations" / (stem + ".txt")
    os.makedirs(os.path.dirname(str(p)), exist_ok=True)
    return open(p, "w")


def test_woodscape_cameras_fragment_and_seg_merge(tmp_path):
    _make_woodscape(tmp_path)
    # camera filter
    ds = alodataset.WooDScapeDataset(
        dataset_dir=str(tmp_path), labels=("boxes_2d", "seg"),
        cameras=("FV",), seg_classes=("road", "vehicles", "person"))
    assert len(ds) == 2
    frame = ds.getitem(0)
    assert frame.boxes2d.shape[0] == 2
    seg = frame.segmentation
    assert seg.shape[0] == 3               # one channel per selected class
    assert tuple(seg.labels.labels_names) == ("road", "vehicles", "person")
    assert float(np.asarray(seg.array)[0].sum()) > 0   # road plane nonempty

    # merged segmentation -> single renamed channel
    ds_m = alodataset.WooDScapeDataset(
        dataset_dir=str(tmp_path), labels=("seg",),
        seg_classes=("road", "vehicles"), merge_classes=True,
        rename_merged="drivable")
    seg_m = ds_m.getitem(0).segmentation
    assert seg_m.shape[0] == 1
    assert tuple(seg_m.labels.labels_names) == ("drivable",)

    # signed fragment: -2 takes the LAST two items
    ds_tail = alodataset.WooDScapeDataset(dataset_dir=str(tmp_path),
                                          fragment=-2)
    assert len(ds_tail) == 2
    assert ds_tail.items == sorted(ds_tail.items)
    full = alodataset.WooDScapeDataset(dataset_dir=str(tmp_path)).items
    assert ds_tail.items == full[-2:]


def test_woodscape_split_dataset(tmp_path):
    _make_woodscape(tmp_path, n=20)   # val = last 10% -> 2 items
    tr = alodataset.WooDScapeSplitDataset(dataset_dir=str(tmp_path),
                                          split=Split.TRAIN)
    va = alodataset.WooDScapeSplitDataset(dataset_dir=str(tmp_path),
                                          split=Split.VAL)
    assert len(tr) > 0 and len(va) > 0
    assert not set(tr.items) & set(va.items)
