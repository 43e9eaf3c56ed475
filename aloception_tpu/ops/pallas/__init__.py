"""Pallas TPU kernels for the framework's hot ops.

Design notes — what is (and is not) a Pallas kernel here:

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

- **RAFT corr volume + pyramid**: NOT Pallas (deleted round 4). A fused
  volume+pyramid kernel (AlternateCorrBlock analog) passed parity after a
  HIGHEST-precision fix but lost the hardware timing to the plain XLA
  matmul+pool path (2.85/2.11 ms vs 2.07 ms at Sintel 46x96 B=2) and could
  not tile the bench geometry (H*W not a multiple of 8). The volume is one
  big MXU matmul — exactly what XLA schedules best.

- **matmuls / convs / attention**: left to XLA — at DETR/RAFT sizes the MXU
  scheduling XLA emits is already the right program; hand-written kernels
  would re-derive it.
"""

from .ms_deform_attn_kernel import ms_deform_attn_pallas  # noqa: F401
