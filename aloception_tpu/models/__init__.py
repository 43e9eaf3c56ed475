"""Model zoo: DETR family, Deformable-DETR, RAFT, panoptic heads (flax/NHWC)."""
