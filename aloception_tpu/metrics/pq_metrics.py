"""Panoptic Quality (reference: alonet/metrics/compute_pq.py:31 PQMetrics).

PQ = sum(IoU of TP) / (TP + FP/2 + FN/2), split things/stuff. Samples arrive
as (pred Mask w/ Labels, gt Mask w/ Labels); INSTANCE-level matching — each
mask channel is one segment, same-class pairs match at IoU > 0.5 over the
argmax instance-id maps, with the panopticapi void rule for unmatched
predictions (compute_pq.py:46-77 semantics).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

VOID = -1


class PQStatCat:
    """(compute_pq.py:14)"""

    def __init__(self):
        self.iou = 0.0
        self.tp = 0
        self.fp = 0
        self.fn = 0

    def __iadd__(self, o):
        self.iou += o.iou
        self.tp += o.tp
        self.fp += o.fp
        self.fn += o.fn
        return self


class PQMetrics:

    def __init__(self, iou_threshold: float = 0.5):
        self.iou_threshold = iou_threshold
        self.pq_per_cat: Dict[int, PQStatCat] = {}
        self.isthing: Dict[int, bool] = {}
        self.class_names: Optional[list] = None

    def __getitem__(self, label_id: int) -> PQStatCat:
        return self.pq_per_cat.setdefault(label_id, PQStatCat())

    @staticmethod
    def _segments(mask):
        """(N, H, W) channel stack -> ((H, W) instance-id map with VOID
        where no channel covers the pixel, per-channel class ids). Each
        channel is one segment — instance-level, like the reference's
        panopticapi id maps (compute_pq.py:46)."""
        arr = np.asarray(mask.as_numpy() if hasattr(mask, "as_numpy")
                         else mask)
        if arr.shape[0] == 0:
            return (np.full(arr.shape[-2:], VOID, np.int32),
                    np.zeros(0, np.int32))
        inst = arr.argmax(0).astype(np.int32)
        inst = np.where(arr.max(0) > 0.5, inst, VOID)
        labels = mask.get_child("labels") if hasattr(mask, "get_child") \
            else None
        if labels is not None and not isinstance(labels, dict):
            cats = np.asarray(labels.as_numpy()).astype(np.int32)
        else:
            cats = np.zeros(arr.shape[0], np.int32)
        return inst, cats

    def add_sample(self, p_mask, t_mask, isthing: Optional[Dict[int, bool]] = None):
        """p_mask / t_mask: aloscene.Mask (N, H, W) with Labels.

        Instance-level PQ matching (compute_pq.py / panopticapi semantics):
        each mask channel is one segment via the argmax instance-id map —
        like the reference (compute_pq.py:185 builds pred segments from
        ``mask2id``), a channel fully occluded by later channels has zero
        id-map area and drops out entirely (it is NOT an FP; panopticapi
        operates on id maps where overlaps cannot exist). Same-class pairs
        match at IoU > threshold, one-to-one; at the standard 0.5 threshold
        id-map matches are unique mathematically, the explicit guard covers
        lower thresholds. Unmatched preds are FP unless more than half
        their area lies on VOID ground truth; unmatched gts are FN."""
        p_inst, p_cats = self._segments(p_mask)
        t_inst, t_cats = self._segments(t_mask)

        t_labels = t_mask.get_child("labels")
        if self.class_names is None and t_labels is not None:
            self.class_names = t_labels.labels_names
        if isthing:
            self.isthing.update(isthing)

        p_ids, p_counts = np.unique(p_inst[p_inst != VOID],
                                    return_counts=True)
        t_ids, t_counts = np.unique(t_inst[t_inst != VOID],
                                    return_counts=True)
        p_area = dict(zip(p_ids.tolist(), p_counts.tolist()))
        t_area = dict(zip(t_ids.tolist(), t_counts.tolist()))

        # pairwise intersections in one pass over the pixel grid
        both = (p_inst != VOID) & (t_inst != VOID)
        K = int(t_inst.max()) + 2
        keys, inters = np.unique(
            p_inst[both].astype(np.int64) * K + t_inst[both],
            return_counts=True)

        matched_p, matched_t = set(), set()
        for key, inter in zip(keys.tolist(), inters.tolist()):
            i, j = key // K, key % K
            if p_cats[i] != t_cats[j] or i in matched_p or j in matched_t:
                continue
            union = p_area[i] + t_area[j] - inter
            iou = inter / union if union else 0.0
            if iou > self.iou_threshold:
                c = int(p_cats[i])
                self[c].tp += 1
                self[c].iou += iou
                matched_p.add(i)
                matched_t.add(j)

        void = t_inst == VOID
        for i in p_ids.tolist():
            if i in matched_p:
                continue
            # panopticapi void rule: mostly-void predictions are not FP
            void_overlap = int(np.count_nonzero((p_inst == i) & void))
            if void_overlap <= 0.5 * p_area[i]:
                self[int(p_cats[i])].fp += 1
        for j in t_ids.tolist():
            if j not in matched_t:
                self[int(t_cats[j])].fn += 1

    def pq_average(self, isthing: Optional[bool] = None,
                   print_result: bool = False) -> Dict[str, float]:
        """(compute_pq.py:79) returns {pq, sq, rq, n}."""
        pq = sq = rq = n = 0.0
        for label, stat in self.pq_per_cat.items():
            if isthing is not None and self.isthing.get(label, True) != isthing:
                continue
            if stat.tp + stat.fp + stat.fn == 0:
                continue
            n += 1
            pq_c = stat.iou / (stat.tp + 0.5 * stat.fp + 0.5 * stat.fn)
            sq_c = stat.iou / stat.tp if stat.tp else 0.0
            rq_c = stat.tp / (stat.tp + 0.5 * stat.fp + 0.5 * stat.fn)
            pq += pq_c
            sq += sq_c
            rq += rq_c
        out = {"pq": pq / n if n else 0.0, "sq": sq / n if n else 0.0,
               "rq": rq / n if n else 0.0, "n": n}
        if print_result:
            tag = {None: "all", True: "things", False: "stuff"}[isthing]
            print(f"PQ[{tag}] pq={out['pq']:.3f} sq={out['sq']:.3f} "
                  f"rq={out['rq']:.3f} (n={int(n)})")
        return out
