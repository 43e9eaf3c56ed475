"""CLI entry points (reference: alonet/*/train_on_coco.py, eval_on_coco.py,
raft/train_on_chairs.py, eval_on_sintel.py). Run as
``python -m aloception_tpu.commands.<name>``."""
