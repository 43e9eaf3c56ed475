"""Pallas TPU kernels for the framework's hot ops.

Design notes — what is (and is not) a Pallas kernel here:

- **corr_volume + pyramid (RAFT)**: Pallas kernel (corr_kernel.py). The
  all-pairs volume at Sintel scale is ~200 MB; building the 4-level pyramid
  with separate XLA ops re-reads it from HBM three times. The fused kernel
  computes each row-tile of the volume on the MXU and immediately emits all
  pyramid levels from VMEM — one HBM write per level, zero re-reads. This is
  the HBM-bandwidth case Pallas exists for.

- **deformable-attention / corr lookup gathers**: NOT Pallas, by design.
  These are data-dependent gathers; Mosaic has no vector-gather primitive
  (see the guide's API surface), so a Pallas version would serialize into
  per-element dynamic slices — strictly worse than XLA's native gather HLO.
  The TPU-optimal expression is a *single-axis row gather*
  (take_along_axis over the flattened spatial axis, contiguous lane-dim
  rows), implemented in ops/ms_deform_attn.py::ms_deform_attn_fast and
  ops/correlation.py::corr_lookup, bit-exact against the pure-lax
  references.

- **matmuls / convs / attention**: left to XLA — at DETR/RAFT sizes the MXU
  scheduling XLA emits is already the right program; hand-written kernels
  would re-derive it.
"""

from .corr_kernel import corr_volume_pyramid_pallas  # noqa: F401
