"""Tutorial 15 — the train -> checkpoint -> eval workflow (reference
analogs: tutorials/5.3-train_on_coco.py + 5.4-eval_on_coco.py).

Every train run gets (project, expe_name, run_id) and writes orbax
checkpoints + a metrics registry under
<log_dir>/<project>/<expe_name>_<date>/<run_id>/. The eval CLI resolves a
run by its run_id alone and restores best/last weights — no paths to
copy around.

The same commands work from a shell:
  python -m aloception_tpu.commands.train_on_coco --sample --tiny ...
  python -m aloception_tpu.commands.eval_on_coco  --run_id demo42 ...

Run: python tutorials/15_train_eval_workflow.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from aloception_tpu.commands import eval_on_coco, train_on_coco


def main():
    log_dir = tempfile.mkdtemp(prefix="alo_tutorial15_")

    # --- train: 2 steps on the offline sample set ---------------------------
    # --run_id pins the id (omit it for a fresh uuid; the CLI prints it)
    train_on_coco.main([
        "--cpu", "--sample", "--tiny",
        "--max_steps", "2", "--batch_size", "2", "--size", "64", "96",
        "--project", "tutorial", "--run_id", "demo42",
        "--log_dir", log_dir,
    ])

    # --- eval: resolve the SAME run by its id and restore the checkpoint ----
    eval_on_coco.main([
        "--cpu", "--sample", "--tiny",
        "--limit_batches", "1", "--size", "64", "96",
        "--run_id", "demo42", "--project", "tutorial",
        "--log_dir", log_dir,
    ])

    # --- what landed on disk -------------------------------------------------
    for root, _, files in os.walk(log_dir):
        for f in sorted(files)[:3]:
            print("  ", os.path.relpath(os.path.join(root, f), log_dir))

    # resuming training later uses the same registry:
    #   train_on_coco --run_id demo42 --resume ...


if __name__ == "__main__":
    main()
