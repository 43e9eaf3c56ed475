"""aloception_tpu: a TPU-native (JAX/XLA/Pallas/pjit) computer-vision framework
with the capabilities of Visual-Behavior/aloception-oss.

Packages:
- ``aloscene``   — augmented arrays (Frame, boxes, masks, flow, depth, ...)
- ``alodataset`` — streaming datasets + label-aware augmentation
- ``models``     — DETR, Deformable-DETR, RAFT, panoptic heads (flax)
- ``ops``        — jit/Pallas compute kernels (deformable attention,
                   correlation, Hungarian matching, box geometry)
- ``parallel``   — device meshes, sharding rules, multi-host helpers
- ``train``      — training harness (optax/orbax/logging)
- ``metrics``    — mAP / PQ / depth / EPE evaluation
- ``export``     — AOT/StableHLO deployment artifacts (TensorRT analog)
"""

__version__ = "0.1.0"
