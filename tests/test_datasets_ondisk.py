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


def test_crowdhuman_prepare_roundtrip(tmp_path):
    """prepare() mirrors the reference disk converter
    (crowd_human_dataset.py:276): >1333px images downscaled with aspect
    kept, small ones copied, annotations rewritten RELATIVE, config/instance
    repointed to <dir>_prepared — and box geometry survives the roundtrip."""
    root = tmp_path / "crowd"
    img_dir = root / "CrowdHuman_train" / "Images"
    # "4K-ish" image + one already-small image
    _png(str(img_dir / "big.jpg"), hw=(1500, 2000))
    _png(str(img_dir / "small.jpg"), hw=(40, 60))
    recs = []
    for iid, (H, W) in (("big", (1500, 2000)), ("small", (40, 60))):
        gt = [{"tag": "person",
               "fbox": [W * 0.1, H * 0.2, W * 0.3, H * 0.4]},
              {"tag": "person",
               "fbox": [W * 0.5, H * 0.5, W * 0.2, H * 0.3]}]
        recs.append({"ID": iid, "gtboxes": gt})
    with open(root / "annotation_train.odgt", "w") as f:
        f.write("\n".join(json.dumps(r) for r in recs))

    ds = alodataset.CrowdHumanDataset(dataset_dir=str(root), split=Split.TRAIN)
    before = [np.asarray(ds.getitem(i).boxes2d.array) for i in range(len(ds))]

    prepared = ds.prepare()
    assert prepared.endswith("_prepared") and os.path.isdir(prepared)
    assert ds._rel_boxes and ds.dataset_dir == prepared

    big = cv2.imread(os.path.join(prepared, "CrowdHuman_train", "Images",
                                  "big.jpg"))
    small = cv2.imread(os.path.join(prepared, "CrowdHuman_train", "Images",
                                    "small.jpg"))
    assert max(big.shape[:2]) <= 1333            # downscaled
    assert small.shape[:2] == (40, 60)           # copied untouched
    # aspect ratio preserved (2000/1500 = 4/3)
    assert abs(big.shape[1] / big.shape[0] - 4 / 3) < 0.01

    # annotations now relative in the prepared odgt
    with open(os.path.join(prepared, "annotation_train.odgt")) as f:
        rec = json.loads(f.readline())
    assert all(0.0 <= v <= 1.0 for v in rec["gtboxes"][0]["fbox"])

    # the reloaded items yield the SAME relative geometry as before
    after = [np.asarray(ds.getitem(i).boxes2d.array) for i in range(len(ds))]
    for b0, b1 in zip(before, after):
        assert np.abs(b0 - b1).max() < 1e-5

    # idempotent: second call is a no-op returning the same dir
    assert ds.prepare() == prepared
