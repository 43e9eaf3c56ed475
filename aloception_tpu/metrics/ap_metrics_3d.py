"""3D mAP (reference: alonet/metrics/compute_map_3d.py:122 ApMetrics3D):
same AP machinery as ApMetrics but matches by 3D IoU (cal_iou_3d)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from .ap_metrics import APDataObject, print_map_table

IOU3D_THRESHOLDS = (0.1, 0.25, 0.5, 0.7)


class ApMetrics3D:

    def __init__(self, iou_thresholds=IOU3D_THRESHOLDS):
        self.iou_thresholds = list(iou_thresholds)
        self.class_names: Optional[List[str]] = None
        self.ap_data: Optional[Dict] = None

    def init_data_objects(self, class_names: List[str]):
        self.class_names = list(class_names)
        self.ap_data = {t: [APDataObject() for _ in class_names]
                        for t in self.iou_thresholds}

    def add_sample(self, p_boxes3d, t_boxes3d):
        """p/t: aloscene.BoundingBoxes3D with Labels(scores)
        (compute_map_3d.py add_sample)."""
        t_labels = t_boxes3d.get_child("labels")
        p_labels = p_boxes3d.get_child("labels")
        if self.class_names is None:
            names = t_labels.labels_names if t_labels is not None else None
            if names is None:
                hi = int(max(np.asarray(t_labels.as_numpy()).max(initial=0),
                             np.asarray(p_labels.as_numpy()).max(initial=0))) + 1
                names = [str(i) for i in range(hi)]
            self.init_data_objects(names)

        classes = np.asarray(p_labels.as_numpy()).astype(int)
        scores = np.asarray(p_labels.scores) if p_labels.scores is not None \
            else np.ones(len(classes))
        gt_classes = np.asarray(t_labels.as_numpy()).astype(int)

        iou = p_boxes3d.iou3d_with(t_boxes3d) if len(classes) and \
            len(gt_classes) else np.zeros((len(classes), len(gt_classes)))

        order = np.argsort(-scores)
        for t in self.iou_thresholds:
            for c in set(classes.tolist()) | set(gt_classes.tolist()):
                if c < 0 or c >= len(self.class_names):
                    continue
                obj = self.ap_data[t][c]
                gt_mask = gt_classes == c
                obj.add_gt_positives(int(gt_mask.sum()))
                matched = np.zeros(len(gt_classes), bool)
                for pi in order:
                    if classes[pi] != c:
                        continue
                    best_j, best = -1, t
                    for j in np.nonzero(gt_mask)[0]:
                        if not matched[j] and iou[pi, j] > best:
                            best_j, best = j, iou[pi, j]
                    if best_j >= 0:
                        matched[best_j] = True
                        obj.push(float(scores[pi]), True)
                    else:
                        obj.push(float(scores[pi]), False)

    def calc_map(self, print_result: bool = False):
        assert self.ap_data is not None
        all_maps = {"all": {}}
        for t in self.iou_thresholds:
            aps = [o.get_ap() for o in self.ap_data[t] if not o.is_empty()]
            all_maps["all"][int(round(t * 100))] = \
                100 * float(np.mean(aps)) if aps else 0.0
        all_maps["all"]["all"] = float(np.mean(list(all_maps["all"].values())))
        if print_result:
            print_map_table(all_maps, {})
        return all_maps
