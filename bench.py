"""Headline benchmark: DETR-R50 / Deformable-DETR / RAFT throughput on one
TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "extra"}:
the headline metric is DETR-R50 COCO inference throughput; "extra" carries
the RAFT and Deformable-DETR numbers so every round's record is
multi-metric.

Baseline context (BASELINE.md): the reference publishes no throughput
numbers; the build target is >=3x TensorRT-A100 images/sec. We take
TRT_A100_IMG_S = 96.0 img/s as the assumed reference point (DETR-R50 fp16,
batch 8, ~1333x800-class input is ~60-100 img/s on A100 TRT; we benchmark at
640x640, the scale the reference's production exporter targets for DETR,
alonet/detr/trt_exporter.py). vs_baseline = value / TRT_A100_IMG_S.

Timing methodology (tunneled TPU backend):
- block_until_ready() does NOT synchronize here; only host value fetches do.
- Each jitted call returns ONE array and the loop chains it data-dependently;
  extra returned device handles cost a tunnel round-trip per call (that
  artifact capped round-1 records at ~253 img/s for a ~880 img/s model).
- Difference timing (2N iters minus N iters) cancels the constant ~0.2 s
  fetch overhead.
"""

import argparse
import json
import os
import time

import numpy as np


TRT_A100_IMG_S = 96.0


def _fetch(x):
    import jax.numpy as jnp
    return float(jnp.sum(x.astype(jnp.float32)))


def _time_chain(chained, x0, iters):
    """Compile, warm, then difference-time `iters` chained calls."""
    _fetch(chained(x0))

    def run(n):
        t0 = time.perf_counter()
        x = x0
        for _ in range(n):
            x = chained(x)
        _fetch(x)
        return time.perf_counter() - t0

    run(2)  # warm
    t1 = run(iters)
    t2 = run(2 * iters)
    return max(t2 - t1, 1e-9) / iters


def bench_detr(args):
    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.detr import Detr, detr_r50

    if args.tiny:
        model = Detr(num_classes=10, hidden_dim=64, num_queries=20, nheads=4,
                     num_encoder_layers=2, num_decoder_layers=2,
                     dim_feedforward=128, stage_sizes=(1, 1, 1, 1),
                     dtype=jnp.bfloat16)
        size, batch = min(args.size, 128), min(args.batch, 2)
    else:
        model = detr_r50(num_classes=91, dtype=jnp.bfloat16)
        size, batch = args.size, args.batch

    images = jnp.asarray(
        np.random.RandomState(0).randn(batch, size, size, 3), jnp.float32)
    mask = jnp.zeros((batch, size, size), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images[:1], mask[:1])

    @jax.jit
    def chained(x):
        out = model.apply(params, x, mask)
        return x + out["pred_logits"].mean().astype(x.dtype) * 1e-6

    dt = _time_chain(chained, images, args.iters)
    img_s = batch / dt
    return {
        "metric": f"detr_r50_inference_imgs_per_sec_bs{batch}_{size}px",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_s / TRT_A100_IMG_S, 3),
    }


def bench_deformable(args):
    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.deformable_detr import deformable_detr_r50

    batch = 2 if args.tiny else min(args.batch, 16)
    size = 128 if args.tiny else args.size
    model = deformable_detr_r50(num_classes=91, with_box_refine=True,
                                dtype=jnp.bfloat16)
    images = jnp.asarray(
        np.random.RandomState(0).randn(batch, size, size, 3), jnp.float32)
    mask = jnp.zeros((batch, size, size), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), images[:1], mask[:1])

    @jax.jit
    def chained(x):
        out = model.apply(params, x, mask)
        return x + out["pred_logits"].mean().astype(x.dtype) * 1e-6

    dt = _time_chain(chained, images, max(args.iters // 2, 4))
    img_s = batch / dt
    return {
        "metric": f"deformable_detr_r50_refine_imgs_per_sec_bs{batch}_{size}px",
        "value": round(img_s, 2),
        "unit": "images/sec/chip",
        "vs_baseline": None,  # the 96 img/s TRT point is DETR-specific
    }


def bench_raft(args):
    """RAFT frame-pairs/sec at the round-target shape 368x496, 12 iters."""
    import jax
    import jax.numpy as jnp
    from aloception_tpu.models.raft import RAFT

    model = RAFT(dtype=jnp.bfloat16) if not args.tiny else RAFT(
        hidden_dim=32, context_dim=32, corr_levels=2, corr_radius=2)
    B = min(args.batch, 2)
    H, W = (368, 496) if not args.tiny else (96, 128)
    iters = 12 if not args.tiny else 2
    rng = np.random.RandomState(0)
    f1 = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    f2 = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), f1[:1], f2[:1], iters=1)

    @jax.jit
    def chained_2(x, other):
        # `other` must be an ARGUMENT: as a closure constant XLA
        # constant-folds fnet(frame2) away entirely at compile time
        flow = model.apply(variables, x, other, iters=iters, only_last=True)
        return x + (jnp.sum(flow.astype(jnp.float32)) * 1e-9).astype(x.dtype)

    def chained(x):
        return chained_2(x, f2)

    dt = _time_chain(chained, f1, max(args.iters // 2, 4))
    pairs_s = B / dt
    return {
        "metric": f"raft_flow_pairs_per_sec_bs{B}_{H}x{W}_it{iters}",
        "value": round(pairs_s, 2),
        "unit": "frame-pairs/sec/chip",
        "vs_baseline": None,
    }


def bench_loader(args):
    """Host data-path throughput: the native C++ loader (runtime/
    aloloader.cpp: threaded JPEG decode + bilinear resize + resnet
    normalize into one caller-owned buffer) on synthetic COCO-sized
    JPEGs. Hardware-independent — the host side of training throughput
    (reference analog: torch DataLoader's C++ worker pool)."""
    import tempfile

    import cv2
    from aloception_tpu.runtime.loader import (NativeImageLoader,
                                               native_loader_available)
    if not native_loader_available():
        raise RuntimeError("native loader unavailable")

    n_img = 64
    rng = np.random.RandomState(0)
    tmp = tempfile.mkdtemp(prefix="alo_bench_loader_")
    paths = []
    for i in range(n_img):
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        p = os.path.join(tmp, f"{i}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
        paths.append(p)

    loader = NativeImageLoader(size=(480, 640), mode="resnet",
                          n_threads=max(os.cpu_count() or 1, 1))
    out, ok = loader.load_batch(paths)          # warm (page cache + pool)
    assert bool(ok.all()), "native loader failed on synthetic jpegs"
    iters = max(args.iters // 4, 2)
    t0 = time.perf_counter()
    for _ in range(iters):
        out, ok = loader.load_batch(paths)
    dt = (time.perf_counter() - t0) / (iters * n_img)
    return {
        "metric": "native_loader_decode_resize_norm_imgs_per_sec_640px",
        "value": round(1.0 / dt, 1),
        "unit": "images/sec/host",
        "vs_baseline": None,
    }


def _device_probe(timeout_s: int = 240) -> bool:
    """Fail fast if the TPU claim is unreachable. The axon claim can wedge
    server-side (DEVELOPMENT.md round-3: jax.devices() hung >15h after a
    concurrent-process wedge); without this probe bench.py would hang at
    the first device op and the round record would be an empty file rather
    than a diagnosable one."""
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _parity_gate(smoke: bool = False,
                 scripts=("tpu_parity_msda.py", "tpu_parity_models.py")
                 ) -> bool:
    """Run the TPU-vs-CPU-oracle parity audits BEFORE any timing: the
    round-2 backend-miscompile episode (DEVELOPMENT.md "silently WRONG on
    real TPU") proved a wrong-but-fast kernel would otherwise record a
    green BENCH number. Runs the scripts as subprocesses (exit-code
    contract) so a crash also gates.

    The subprocess gets an explicit PYTHONPATH pointing at the repo root:
    a bare ``python scripts/foo.py`` puts ``scripts/`` at sys.path[0], so
    ``import aloception_tpu`` fails — exactly the bug that nulled
    BENCH_r04 (the driver runs ``python bench.py`` with no env). The gate
    mechanics are under test (tests/test_bench_gate.py) so this can never
    silently regress again.

    ``smoke=True`` passes ``--smoke`` to the scripts (tiny dims) — used by
    the CPU test to exercise this exact subprocess path. ``scripts`` narrows
    the run (the default-suite mechanics test runs the msda script only;
    the slow-marked variant and every real bench run cover both).
    """
    import os
    import subprocess
    import sys
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env["PYTHONPATH"] = here + os.pathsep + env.get("PYTHONPATH", "")
    ok = True
    residuals = {}
    for script in scripts:
        path = os.path.join(here, "scripts", script)
        print(f"[bench] parity gate: {script} ...", file=sys.stderr,
              flush=True)
        cmd = [sys.executable, path] + (["--smoke"] if smoke else [])
        try:
            r = subprocess.run(cmd, capture_output=True, cwd=here, env=env,
                               text=True, timeout=1800)
        except subprocess.TimeoutExpired as e:
            sys.stderr.write(f"[bench] {script} TIMED OUT: {e}\n")
            ok = False
            residuals[script] = "TIMEOUT"
            continue
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-500:])
        ok &= r.returncode == 0
        # keep the residual lines for the BENCH record: a green number must
        # carry the parity evidence it was gated on
        residuals[script] = [
            ln for ln in r.stdout.splitlines()
            if ("vs CPU-lax" in ln or "grad " in ln or "parity" in ln
                or "maxdiff" in ln or "rel diff" in ln or "WORST" in ln)
            and "INFO" not in ln][-14:]
    _parity_gate.residuals = residuals
    return ok


def bench_train(args):
    """DETR-R50 TRAINING steps/sec (fp32, the demonstrated learning config:
    scripts/overfit_tpu.py reached AP 0.902 with it). One jitted lax.scan
    block of K steps per dispatch — the production dispatch pattern on this
    tunnel. Reference contract: training throughput is a first-class metric
    (VERDICT round 2: 'training perf is unaccountable' without it)."""
    import jax
    import jax.numpy as jnp
    import optax
    from aloception_tpu.models.detr import Detr, detr_r50
    from aloception_tpu.models.detr.criterion import detr_criterion
    from aloception_tpu.train.state import make_optimizer, make_train_state

    if args.tiny:
        model = Detr(num_classes=4, hidden_dim=64, num_queries=20, nheads=4,
                     num_encoder_layers=2, num_decoder_layers=2,
                     dim_feedforward=128, stage_sizes=(1, 1, 1, 1),
                     dropout=0.0)
        B, size, K = 2, 96, 2
    else:
        model = detr_r50(num_classes=91, dropout=0.0)
        B, size, K = 16, 384, 10

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, size, size, 3), jnp.float32)
    mask = jnp.zeros((B, size, size), jnp.float32)
    targets = {
        "boxes": jnp.asarray(rng.rand(B, 4, 4), jnp.float32),
        "labels": jnp.asarray(rng.randint(0, 4, (B, 4)), jnp.int32),
        "valid": jnp.ones((B, 4), bool),
    }
    params = model.init(jax.random.PRNGKey(0), images[:1], mask[:1])
    tx = make_optimizer(lr=1e-4, lr_backbone=1e-4, grad_clip=0.1)
    state0 = make_train_state(model, params, tx=tx)

    @jax.jit
    def block(state):
        def body(st, _):
            def loss_fn(p):
                out = model.apply(p, images, mask)
                loss, _ = detr_criterion(out, targets)
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_gradients(grads=grads), loss
        state, losses = jax.lax.scan(body, state, jnp.arange(K))
        return state, losses

    def fetch(state):
        leaf = jax.tree.leaves(state.params)[0]
        return float(jnp.sum(leaf.astype(jnp.float32)))

    state, _ = block(state0)
    fetch(state)  # compile + warm
    t0 = time.perf_counter()
    n_blocks = max(args.iters // K, 2)
    for _ in range(n_blocks):
        state, _ = block(state)
    fetch(state)
    dt = (time.perf_counter() - t0) / (n_blocks * K)
    return {
        "metric": f"detr_r50_train_steps_per_sec_bs{B}_{size}px_fp32",
        "value": round(1.0 / dt, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": None,
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default=None, help="force jax platform (cpu)")
    p.add_argument("--model", default="all",
                   choices=["all", "detr", "raft", "deformable", "train",
                            "loader"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=640)
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--tiny", action="store_true", help="tiny model (CPU smoke)")
    p.add_argument("--skip_parity", action="store_true",
                   help="skip the parity-before-perf gate (debug only)")
    args = p.parse_args()

    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    on_tpu = not args.backend or args.backend not in ("cpu",)
    if on_tpu and not _device_probe():
        import sys
        print(json.dumps({
            "metric": "detr_r50_inference_imgs_per_sec_bs32_640px",
            "value": None, "unit": "images/sec/chip", "vs_baseline": None,
            "extra": {"error": "TPU claim unreachable: jax.devices() hung "
                               ">240s (axon claim wedge, DEVELOPMENT.md)"}}))
        sys.exit(1)
    if on_tpu and not args.tiny and not args.skip_parity:
        if not _parity_gate():
            import sys
            print("[bench] PARITY GATE FAILED — refusing to record perf "
                  "numbers for kernels that do not match the CPU oracle.",
                  file=sys.stderr, flush=True)
            sys.exit(1)

    benches = {"detr": bench_detr, "raft": bench_raft,
               "deformable": bench_deformable, "train": bench_train,
               "loader": bench_loader}
    if args.model != "all":
        print(json.dumps(benches[args.model](args)))
        return

    extra = {}
    if getattr(_parity_gate, "residuals", None):
        extra["parity_gate"] = _parity_gate.residuals
    # multi-scale training demo record (scripts/train_geometry_tpu.py writes
    # it; VERDICT r4 #5 — round-over-round training perf must be diffable)
    geo = os.path.join(os.path.dirname(os.path.abspath(__file__)), "docs",
                       "geometry_demo.json")
    if os.path.exists(geo):
        with open(geo) as f:
            extra["geometry_demo_steps_per_sec"] = json.load(f)
    headline = bench_detr(args)
    for name in ("raft", "deformable", "train", "loader"):
        try:
            r = benches[name](args)
            extra[r["metric"]] = {"value": r["value"], "unit": r["unit"]}
        except Exception as e:  # a broken secondary bench must not zero the record
            extra[name] = {"error": f"{type(e).__name__}: {e}"}
    headline["extra"] = extra
    print(json.dumps(headline))


if __name__ == "__main__":
    main()
