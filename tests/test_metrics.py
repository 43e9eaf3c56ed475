"""Metrics: mAP / PQ / depth (mirrors reference alonet/metrics semantics)."""

import numpy as np

from aloception_tpu.aloscene import BoundingBoxes2D, Labels, Mask, Depth
from aloception_tpu.metrics import ApMetrics, PQMetrics, DepthMetrics


def _boxes(data, labels, scores=None, names=("a", "b", "c")):
    return BoundingBoxes2D(
        np.asarray(data, np.float32), boxes_format="xyxy", absolute=False,
        labels=Labels(np.asarray(labels, np.float32),
                      scores=None if scores is None
                      else np.asarray(scores, np.float32),
                      labels_names=names))


def test_ap_perfect_predictions():
    gt = _boxes([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.8, 0.8]], [0, 1])
    pred = _boxes([[0.1, 0.1, 0.3, 0.3], [0.5, 0.5, 0.8, 0.8]], [0, 1],
                  scores=[0.9, 0.8])
    m = ApMetrics()
    m.add_sample(pred, gt)
    all_maps, per_class = m.calc_map()
    assert all_maps["all"][50] > 99
    assert all_maps["all"][95] > 99
    assert per_class["a"]["ap50"] > 99


def test_ap_false_positive_lowers_precision():
    gt = _boxes([[0.1, 0.1, 0.3, 0.3]], [0])
    pred_good = _boxes([[0.1, 0.1, 0.3, 0.3]], [0], scores=[0.9])
    pred_fp = _boxes([[0.1, 0.1, 0.3, 0.3], [0.6, 0.6, 0.7, 0.7]], [0, 0],
                     scores=[0.5, 0.9])  # FP scored HIGHER than the TP
    m1, m2 = ApMetrics(), ApMetrics()
    m1.add_sample(pred_good, gt)
    m2.add_sample(pred_fp, gt)
    a1 = m1.calc_map()[0]["all"][50]
    a2 = m2.calc_map()[0]["all"][50]
    assert a2 < a1


def test_ap_localization_threshold():
    gt = _boxes([[0.1, 0.1, 0.5, 0.5]], [0])
    # shifted box: IoU ~ 0.6 -> hit at 0.5, miss at 0.9
    pred = _boxes([[0.15, 0.15, 0.55, 0.55]], [0], scores=[0.9])
    m = ApMetrics()
    m.add_sample(pred, gt)
    all_maps, _ = m.calc_map()
    assert all_maps["all"][50] > 99
    assert all_maps["all"][90] < 1


def test_pq_metrics():
    gt_m = np.zeros((2, 16, 16), np.float32)
    gt_m[0, :8] = 1
    gt_m[1, 8:] = 1
    gt = Mask(gt_m, labels=Labels(np.array([1.0, 2.0], np.float32)))
    # perfect prediction
    pq = PQMetrics()
    pq.add_sample(gt, gt)
    out = pq.pq_average()
    assert abs(out["pq"] - 1.0) < 1e-6 and out["n"] == 2
    # half-wrong prediction
    pred_m = np.zeros((2, 16, 16), np.float32)
    pred_m[0, :4] = 1   # half of segment 1
    pred_m[1, 8:] = 1   # exact segment 2
    pred = Mask(pred_m, labels=Labels(np.array([1.0, 2.0], np.float32)))
    pq2 = PQMetrics()
    pq2.add_sample(pred, gt)
    out2 = pq2.pq_average()
    assert out2["pq"] < 1.0
    # things/stuff split
    pq3 = PQMetrics()
    pq3.add_sample(gt, gt, isthing={1: True, 2: False})
    assert pq3.pq_average(isthing=True)["n"] == 1
    assert pq3.pq_average(isthing=False)["n"] == 1


def test_depth_metrics():
    t = Depth(np.full((1, 8, 8), 10.0, np.float32))
    m = DepthMetrics()
    m.add_sample(t, t)
    out = m.calc_map()
    assert out["rmse"] < 1e-6 and out["a1"] == 1.0
    m2 = DepthMetrics()
    p = Depth(np.full((1, 8, 8), 15.0, np.float32))
    m2.add_sample(p, t)
    out2 = m2.calc_map()
    assert out2["abs_rel"] - 0.5 < 1e-6
    assert out2["a1"] == 0.0  # ratio 1.5 > 1.25
    assert out2["a2"] == 1.0  # 1.5 < 1.5625


def test_pq_instance_level_matching():
    """Two gt instances of the SAME class: instance-level PQ (reference
    compute_pq.py/panopticapi) must match them separately — a
    class-collapsed id map would merge them into one segment and score the
    exact-on-one prediction at IoU 0.5 (no TP)."""
    gt_m = np.zeros((2, 16, 16), np.float32)
    gt_m[0, :8] = 1
    gt_m[1, 8:] = 1
    gt = Mask(gt_m, labels=Labels(np.array([1.0, 1.0], np.float32)))
    pred_m = np.zeros((1, 16, 16), np.float32)
    pred_m[0, :8] = 1  # nails instance 0, misses instance 1
    pred = Mask(pred_m, labels=Labels(np.array([1.0], np.float32)))
    pq = PQMetrics()
    pq.add_sample(pred, gt)
    stat = pq[1]
    assert stat.tp == 1 and stat.fn == 1 and stat.fp == 0
    assert abs(pq.pq_average()["pq"] - 1.0 / 1.5) < 1e-6


def test_pq_void_rule():
    """An unmatched prediction lying mostly on VOID ground truth is not a
    false positive (panopticapi rule, compute_pq.py)."""
    gt_m = np.zeros((1, 16, 16), np.float32)
    gt_m[0, :8] = 1                       # bottom half of the image is void
    gt = Mask(gt_m, labels=Labels(np.array([1.0], np.float32)))
    pred_m = np.zeros((2, 16, 16), np.float32)
    pred_m[0, :8] = 1                     # TP on the gt segment
    pred_m[1, 12:] = 1                    # entirely on void -> ignored
    pred = Mask(pred_m, labels=Labels(np.array([1.0, 1.0], np.float32)))
    pq = PQMetrics()
    pq.add_sample(pred, gt)
    stat = pq[1]
    assert stat.tp == 1 and stat.fp == 0 and stat.fn == 0
    assert abs(pq.pq_average()["pq"] - 1.0) < 1e-6
