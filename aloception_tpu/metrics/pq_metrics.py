"""Panoptic Quality (reference: alonet/metrics/compute_pq.py:31 PQMetrics).

PQ = sum(IoU of TP) / (TP + FP/2 + FN/2), split things/stuff. Samples arrive
as (pred Mask w/ Labels, gt Mask w/ Labels); matching by segment IoU > 0.5
over the mask2id maps.
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

    def add_sample(self, p_mask, t_mask, isthing: Optional[Dict[int, bool]] = None):
        """p_mask / t_mask: aloscene.Mask (N, H, W) with Labels
        (compute_pq.py add_sample semantics via id maps)."""
        p_ids = p_mask.mask2id(background_id=VOID) if p_mask.shape[0] else \
            np.full(p_mask.shape[-2:], VOID, int)
        t_ids = t_mask.mask2id(background_id=VOID) if t_mask.shape[0] else \
            np.full(t_mask.shape[-2:], VOID, int)

        t_labels = t_mask.get_child("labels")
        if self.class_names is None and t_labels is not None:
            self.class_names = t_labels.labels_names
        if isthing:
            self.isthing.update(isthing)

        # segment inventories: (class_id -> total area per instance) using
        # connected instance channels instead of ids; simpler: treat each
        # class id in the id map as one segment per class per image
        # (consistent with mask2id collapsing instances by class).
        p_classes = [c for c in np.unique(p_ids) if c != VOID]
        t_classes = [c for c in np.unique(t_ids) if c != VOID]

        matched_t = set()
        for c in p_classes:
            pm = p_ids == c
            best_iou, best_t = 0.0, None
            for tc in t_classes:
                if tc != c or tc in matched_t:
                    continue
                tm = t_ids == tc
                inter = float(np.logical_and(pm, tm).sum())
                union = float(np.logical_or(pm, tm).sum())
                iou = inter / union if union else 0.0
                if iou > best_iou:
                    best_iou, best_t = iou, tc
            if best_t is not None and best_iou > self.iou_threshold:
                self[c].tp += 1
                self[c].iou += best_iou
                matched_t.add(best_t)
            else:
                self[c].fp += 1
        for tc in t_classes:
            if tc not in matched_t:
                self[tc].fn += 1

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
