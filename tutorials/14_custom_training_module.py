"""Tutorial 14 — customizing the training module: finetune heads, custom
criteria, custom callbacks (reference analogs: tutorials/5.2-detrmod_lit_.py
+ 5.6-custom_detrmod.py, which subclass LitDetr).

The Trainer is assembled from four swappable parts — model, criterion,
prepare_batch, callbacks. This tutorial customizes three of them for a
1-class "person detector" finetune:

1. a fresh 1-class head grafted onto existing trunk weights
   (models/detr/finetune.py, the DetrR50Finetune analog)
2. a custom criterion that re-weights the losses
3. a custom callback that watches a metric during training

Run: python tutorials/14_custom_training_module.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import numpy as np

from aloception_tpu.models.detr import Detr
from aloception_tpu.models.detr.criterion import detr_criterion
from aloception_tpu.models.detr.finetune import finetune_params
from aloception_tpu.train import CocoDetection2Detr, make_detr_trainer
from aloception_tpu.train.callbacks import Callback, MetricsCallback


class Coco2PersonDetr(CocoDetection2Detr):
    """COCO batches with every label collapsed to one 'person-like' class —
    the reference's _obj2person remap (tutorials/5.6): a 1-class head fed
    91-class label ids would index past its 2 logits (jnp fills OOB gathers
    with NaN), so the data module is where the remap belongs."""

    def prepare_batch(self, frames_list, training=True):
        batch = super().prepare_batch(frames_list, training)
        batch["targets"]["labels"] = np.zeros_like(
            batch["targets"]["labels"])
        return batch


def tiny_detr(num_classes):
    return Detr(num_classes=num_classes, hidden_dim=64, num_queries=20,
                nheads=4, num_encoder_layers=1, num_decoder_layers=1,
                dim_feedforward=128, stage_sizes=(1, 1, 1, 1))


# --- 2. custom criterion: same matcher/losses, different weighting ---------
def person_criterion(m_outputs, targets):
    """The stock DETR criterion with the box losses emphasized (crowded
    person scenes care more about localization; reference analog: LitDetr
    subclasses override build_criterion, 5.6)."""
    loss, metrics = detr_criterion(m_outputs, targets,
                                   loss_ce_weight=1.0,
                                   loss_boxes_weight=10.0,
                                   loss_giou_weight=4.0)
    return loss, metrics


# --- 3. custom callback ------------------------------------------------------
class CardinalityWatcher(Callback):
    """Track the cardinality error (|#pred - #gt|) during training — the
    custom-callback hook points (reference: DetrObjectDetectorCallback)."""

    def __init__(self):
        self.history = []

    def on_train_batch_end(self, trainer, metrics, step):
        if "cardinality_error" in metrics:
            self.history.append((step, metrics["cardinality_error"]))


def main():
    dm = Coco2PersonDetr(sample=True, batch_size=2, size=(96, 128))

    # --- 1. the head swap: graft "pretrained" trunk weights into a fresh
    # 1-class init, keeping the fresh class head -----------------------------
    pretrained = tiny_detr(num_classes=91)      # stands in for detr_r50(91)
    person = tiny_detr(num_classes=1)
    rng = np.random.RandomState(0)
    images = np.asarray(rng.randn(1, 96, 128, 3), np.float32)
    mask = np.zeros((1, 96, 128), np.float32)
    p_pre = pretrained.init(jax.random.PRNGKey(0), images, mask)
    p_new = person.init(jax.random.PRNGKey(1), images, mask)
    grafted = finetune_params(p_new, p_pre, reinit_keys=("class_embed",))
    # trunk weights came from the 'pretrained' init, the class head did not
    same = np.allclose(
        np.asarray(jax.tree.leaves(grafted["params"]["backbone"])[0]),
        np.asarray(jax.tree.leaves(p_pre["params"]["backbone"])[0]))
    print("backbone grafted from pretrained:", same)

    # --- assemble the customized trainer ------------------------------------
    watcher = CardinalityWatcher()
    trainer = make_detr_trainer(
        model=person, data_module=dm,
        criterion=person_criterion,          # swapped criterion
        callbacks=[MetricsCallback(), watcher],   # stock + custom
        limit_train_batches=2, limit_val_batches=1)
    trainer.fit(dm.train_dataloader(), dm.val_dataloader(), max_epochs=1)
    print("watched cardinality:", watcher.history)
    print("val:", {k: round(v, 3) for k, v in trainer.last_val_metrics.items()})


if __name__ == "__main__":
    main()
