"""CLI integration tests (mirrors reference unittest/test_train.py: run the
real training mains with fast_dev_run + samples)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_train_on_coco_fast_dev_run(capsys):
    from aloception_tpu.commands import train_on_coco
    train_on_coco.main(["--cpu", "--sample", "--tiny", "--fast_dev_run",
                        "--size", "64", "96", "--batch_size", "4"])
    out = capsys.readouterr().out
    assert "[train_on_coco] done: step=" in out


def test_eval_on_coco(capsys):
    from aloception_tpu.commands import eval_on_coco
    eval_on_coco.main(["--cpu", "--sample", "--tiny", "--limit_batches", "1",
                       "--size", "64", "96"])
    out = capsys.readouterr().out
    assert "[eval_on_coco] AP=" in out


@pytest.mark.slow
def test_train_on_coco_panoptic_fast_dev_run(capsys):
    """--model panoptic wires make_panoptic_trainer end to end
    (reference alonet/detr_panoptic/train_on_coco.py)."""
    from aloception_tpu.commands import train_on_coco
    train_on_coco.main(["--cpu", "--sample", "--tiny", "--fast_dev_run",
                        "--model", "panoptic", "--size", "64", "96",
                        "--batch_size", "2"])
    out = capsys.readouterr().out
    assert "[train_on_coco] done: step=" in out
    assert "PQ[all]" in out


def test_eval_on_coco_panoptic(capsys):
    """--model panoptic produces a PQ table from the eval CLI
    (reference alonet/detr_panoptic/eval_on_coco.py)."""
    from aloception_tpu.commands import eval_on_coco
    eval_on_coco.main(["--cpu", "--sample", "--tiny", "--model", "panoptic",
                       "--limit_batches", "1", "--size", "64", "96"])
    out = capsys.readouterr().out
    assert "[eval_on_coco] PQ=" in out


def test_eval_on_coco_panoptic_default_geometry(capsys):
    """Regression: pred_masks come out at stride 4; PQ eval at the default
    frame size must upsample them to full resolution before matching GT
    (reference detr_panoptic.py:239 F.interpolate) — this crashed with a
    (120,160) vs (480,640) broadcast error before the frame_size plumbing
    in inference_with_masks."""
    from aloception_tpu.commands import eval_on_coco
    eval_on_coco.main(["--cpu", "--sample", "--tiny", "--model", "panoptic",
                       "--limit_batches", "1", "--size", "96", "128"])
    out = capsys.readouterr().out
    assert "[eval_on_coco] PQ=" in out


def test_export_model_cli(tmp_path, capsys):
    import os
    from aloception_tpu.commands import export_model
    out_path = str(tmp_path / "m.hlo")
    export_model.main(["--cpu", "--model", "detr", "--tiny", "--out", out_path,
                       "--size", "64", "96"])
    assert os.path.exists(out_path)
    out = capsys.readouterr().out
    assert "[export] wrote" in out


@pytest.mark.slow
def test_train_then_eval_from_checkpoint(tmp_path, capsys):
    """The documented happy path: train 2 steps, then eval FROM that run's
    checkpoint by run_id (reference: pl_helpers.py:222 load_training +
    eval_on_coco --run_id). The eval must restore the trained step and print
    the AP table."""
    from aloception_tpu.commands import train_on_coco, eval_on_coco
    train_on_coco.main(["--cpu", "--sample", "--tiny", "--max_steps", "2",
                        "--size", "64", "96", "--batch_size", "2",
                        "--project", "clitest", "--run_id", "evalrun1",
                        "--log_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "[train_on_coco] done: step=2" in out
    eval_on_coco.main(["--cpu", "--sample", "--tiny", "--limit_batches", "1",
                       "--size", "64", "96", "--run_id", "evalrun1",
                       "--project", "clitest", "--log_dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "[eval] run_id evalrun1 ->" in out
    assert "[eval] restored step 2" in out
    assert "[eval_on_coco] AP=" in out


@pytest.mark.slow
def test_train_on_coco_panoptic_deformable_fast_dev_run(capsys):
    """--model panoptic_deformable wires a DeformableDETR detector +
    focal base criterion/matcher into the panoptic trainer (reference
    alonet/deformable_detr_panoptic/train_on_coco.py)."""
    from aloception_tpu.commands import train_on_coco
    train_on_coco.main(["--cpu", "--sample", "--tiny", "--fast_dev_run",
                        "--model", "panoptic_deformable",
                        "--size", "64", "96", "--batch_size", "2"])
    out = capsys.readouterr().out
    assert "[train_on_coco] done: step=" in out
    assert "PQ[all]" in out


@pytest.mark.slow
def test_eval_on_coco_panoptic_deformable(capsys):
    """--model panoptic_deformable produces the PQ table (reference
    alonet/deformable_detr_panoptic/eval_on_coco.py)."""
    from aloception_tpu.commands import eval_on_coco
    eval_on_coco.main(["--cpu", "--sample", "--tiny",
                       "--model", "panoptic_deformable",
                       "--limit_batches", "1", "--size", "96", "128"])
    out = capsys.readouterr().out
    assert "[eval_on_coco] PQ=" in out


@pytest.mark.slow
def test_raft_train_then_eval_from_checkpoint(capsys):
    """RAFT counterpart of the happy path above: train 2 steps on the
    chairs sample, then eval_on_sintel FROM that run's checkpoint. Guards
    the restore_tree path (a fresh no-optimizer state cannot restore a
    trained checkpoint — opt_state structure mismatch, caught by the
    round-5 eval rehearsal)."""
    from aloception_tpu.commands import train_on_chairs, eval_on_sintel
    ckpt_dir = train_on_chairs.main(
        ["--cpu", "--sample", "--tiny", "--max_steps", "2",
         "--batch_size", "2", "--iters", "2"])
    out = capsys.readouterr().out
    assert "[train_on_chairs] done: step=2" in out
    epe = eval_on_sintel.main(
        ["--cpu", "--sample", "--tiny", "--iters", "2",
         "--ckpt_dir", ckpt_dir, "--limit_samples", "2"])
    out = capsys.readouterr().out
    assert "[eval] restored step 2" in out
    assert "[eval_on_sintel] EPE=" in out
    import math
    assert math.isfinite(epe)
