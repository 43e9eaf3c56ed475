"""Pallas TPU kernels for the framework's hot ops.

Design notes — what is (and is not) a Pallas kernel here:

- **corr_volume + pyramid (RAFT)**: Pallas kernel (corr_kernel.py). The
  all-pairs volume at Sintel scale is ~200 MB; building the 4-level pyramid
  with separate XLA ops re-reads it from HBM three times. The fused kernel
  computes each row-tile of the volume on the MXU and immediately emits all
  pyramid levels from VMEM — one HBM write per level, zero re-reads. This is
  the HBM-bandwidth case Pallas exists for.

- **deformable-attention sampling**: Pallas kernel
  (ms_deform_attn_kernel.py), but NOT as a gather — Mosaic has no
  vector-gather primitive. The bilinear corner selection becomes one-hot
  coefficient planes built in VMEM (compare+FMA passes on the VPU) and the
  sampling collapses to one (Tq, HW_l) @ (HW_l, C) MXU matmul per level.
  Measured vs the best XLA formulation ('block' dynamic slices): encoder
  4.2x, decoder 2.8x. The dense plane never touches HBM — that per-tile
  VMEM residency is exactly what XLA cannot express.

- **RAFT corr lookup**: NOT Pallas — the same one-hot idea wins in plain
  XLA (corr_lookup_onehot) because each query owns its own small volume
  row, so the "plane" is tiny and batched: two 2-sparse einsums, 20x faster
  than gathers, no kernel needed.

- **matmuls / convs / attention**: left to XLA — at DETR/RAFT sizes the MXU
  scheduling XLA emits is already the right program; hand-written kernels
  would re-derive it.
"""

from .corr_kernel import corr_volume_pyramid_pallas  # noqa: F401
from .ms_deform_attn_kernel import ms_deform_attn_pallas  # noqa: F401
