import torch


def nms(boxes: torch.Tensor, scores: torch.Tensor, iou_threshold: float):
    """Plain O(n^2) NMS on xyxy boxes; returns kept indices sorted by score
    (the torchvision contract)."""
    if boxes.numel() == 0:
        return torch.zeros(0, dtype=torch.int64)
    order = scores.argsort(descending=True)
    x1, y1, x2, y2 = boxes.unbind(-1)
    areas = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
    keep = []
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    for idx in order.tolist():
        if suppressed[idx]:
            continue
        keep.append(idx)
        xx1 = torch.maximum(x1[idx], x1)
        yy1 = torch.maximum(y1[idx], y1)
        xx2 = torch.minimum(x2[idx], x2)
        yy2 = torch.minimum(y2[idx], y2)
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[idx] + areas - inter).clamp(min=1e-9)
        suppressed |= iou > iou_threshold
    return torch.as_tensor(keep, dtype=torch.int64)
