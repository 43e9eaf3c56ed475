"""Finetuning variants: pretrained trunk + fresh class head
(reference: alonet/detr/detr_r50_finetune.py:12 DetrR50Finetune,
deformable_detr/deformable_detr_r50_finetune.py).

The reference swaps ``class_embed`` for a new head sized to the target
classes and loads every other weight from the released checkpoint. Here
``finetune_params`` grafts converted pretrained params into a fresh init,
re-initializing the class head (and optionally the box head).
"""

from __future__ import annotations

from typing import Any, Optional

import jax

from .detr import Detr, detr_r50


def detr_r50_finetune(num_classes: int, background_class: Optional[int] = None,
                      **kwargs) -> Detr:
    """(detr_r50_finetune.py:12) a DETR-R50 with a num_classes+1 head."""
    return detr_r50(num_classes=num_classes, **kwargs)


def finetune_params(fresh_params: Any, pretrained_params: Any,
                    reinit_keys=("class_embed",)) -> Any:
    """Graft pretrained weights into a fresh init, keeping the fresh values
    for ``reinit_keys`` subtrees (the class-head swap)."""
    flat_fresh = dict(jax.tree_util.tree_leaves_with_path(fresh_params))
    flat_pre = dict(jax.tree_util.tree_leaves_with_path(pretrained_params))

    def keep_fresh(path) -> bool:
        names = [str(getattr(p, "key", p)) for p in path]
        return any(k in names for k in reinit_keys)

    out = {}
    for path, fresh_leaf in flat_fresh.items():
        pre = flat_pre.get(path)
        if pre is not None and not keep_fresh(path) \
                and pre.shape == fresh_leaf.shape:
            out[path] = pre
        else:
            out[path] = fresh_leaf
    # rebuild the tree
    treedef = jax.tree_util.tree_structure(fresh_params)
    leaves_with_path = jax.tree_util.tree_leaves_with_path(fresh_params)
    return jax.tree_util.tree_unflatten(
        treedef, [out[p] for p, _ in leaves_with_path])
