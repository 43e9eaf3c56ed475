"""Full-model forward parity: real TPU vs CPU, fp32, HIGHEST matmul
precision.

Motivated by the round-2 discovery that the tunneled TPU backend can
MISCOMPILE fused XLA patterns (DEVELOPMENT.md "silently WRONG on real
TPU"): op-level parity is not enough — whole-model jit programs fuse
differently and must be audited directly. Run after any model change:

    python scripts/tpu_parity_models.py

Expected: max rel diff ~1e-4 (fp32 HIGHEST on both sides). A percent-level
or larger diff means a backend miscompile or a real bug — bisect with the
per-level masking technique in scripts/tpu_parity_msda.py.
"""

import os
import sys

# Bootstrap: a bare ``python scripts/tpu_parity_models.py`` puts scripts/ at
# sys.path[0], not the repo root — the exact ModuleNotFoundError that nulled
# BENCH_r04. bench.py's gate also sets PYTHONPATH (belt), this is braces.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np


def _run(build, make_inputs, outs, cpu_build=None, apply_kwargs=None):
    import jax

    kw = apply_kwargs or {}
    model, params_key = build()
    cpu_model = model if cpu_build is None else cpu_build()[0]
    inputs = make_inputs()
    with jax.default_matmul_precision("highest"):
        params = model.init(jax.random.PRNGKey(params_key), *inputs)

        f = jax.jit(lambda p, *xs: model.apply(p, *xs, **kw))
        t = outs(f(params, *inputs))
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            c = outs(jax.jit(lambda p, *xs: cpu_model.apply(p, *xs, **kw))(
                jax.device_put(params, cpu),
                *[jax.device_put(x, cpu) for x in inputs]))
    report = {}
    for k in t:
        a, b = np.asarray(t[k], np.float32), np.asarray(c[k], np.float32)
        denom = max(np.abs(b).max(), 1e-6)
        report[k] = float(np.abs(a - b).max() / denom)
    return report


def main(smoke: bool = False, collect_only: bool = False) -> float:
    """Returns the worst max-rel-diff; exit code 0 iff < 1e-3 (bench.py
    gates perf records on this). ``smoke`` forces CPU + smaller inputs so
    tests/test_bench_gate.py can exercise the exact subprocess path in
    seconds; the models are already tiny, only the device changes much.
    ``collect_only`` imports + constructs every audited model and exits."""
    import jax
    if smoke or collect_only:
        # sitecustomize pre-imports jax, so JAX_PLATFORMS env is captured
        # too late (tests/conftest.py) — force CPU via config instead.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.RandomState(0)

    def detr():
        from aloception_tpu.models.detr import Detr
        m = Detr(num_classes=10, hidden_dim=64, num_queries=20, nheads=4,
                 num_encoder_layers=2, num_decoder_layers=2,
                 dim_feedforward=128, stage_sizes=(1, 1, 1, 1))
        return m, 0

    H, W = (64, 96) if smoke else (128, 160)
    B = 1 if smoke else 2

    def detr_in():
        return (jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
                jnp.zeros((B, H, W), jnp.float32))

    def deformable(impl="block"):
        # CPU side runs impl="block" (pure XLA — the pallas dispatcher only
        # interprets when the DEFAULT backend is cpu, and here it is axon);
        # block is oracle-exact (scripts/tpu_parity_msda.py), so TPU-pallas
        # vs CPU-block is a valid whole-model parity check.
        from aloception_tpu.models.deformable_detr import DeformableDETR
        m = DeformableDETR(num_classes=10, hidden_dim=64, num_queries=20,
                           nheads=4, num_encoder_layers=2,
                           num_decoder_layers=2, dim_feedforward=128,
                           num_feature_levels=4, stage_sizes=(1, 1, 1, 1),
                           with_box_refine=True, msda_impl=impl)
        return m, 0

    def raft():
        from aloception_tpu.models.raft import RAFT
        m = RAFT(hidden_dim=32, context_dim=32, corr_levels=2, corr_radius=2)
        return m, 0

    rH, rW = (48, 64) if smoke else (96, 128)

    def raft_in():
        return (jnp.asarray(rng.randn(1, rH, rW, 3), jnp.float32),
                jnp.asarray(rng.randn(1, rH, rW, 3), jnp.float32))

    if collect_only:
        # import + construct every model under audit, then stop before any
        # device work: a seconds-cheap default-suite guard against the exact
        # bug class that nulled BENCH_r04 (module-level import failures or
        # constructor signature drift in THIS script), while the full run
        # stays on the real bench path / slow-marked test.
        for name, build in [("detr", detr),
                            ("deformable", lambda: deformable("pallas")),
                            ("raft", raft)]:
            build()
            print(f"collect {name}: OK", flush=True)
        print("COLLECT OK", flush=True)
        return 0.0

    checks = [
        ("detr", detr, detr_in,
         lambda o: {"pred_logits": o["pred_logits"],
                    "pred_boxes": o["pred_boxes"]}),
        ("deformable", lambda: deformable("pallas"), detr_in,
         lambda o: {"pred_logits": o["pred_logits"],
                    "pred_boxes": o["pred_boxes"]},
         lambda: deformable("block")),
        ("raft", raft, raft_in,
         lambda o: {"flow": o if not isinstance(o, (list, tuple)) else o[-1]}),
        # the only_last inference fast path (raft.py:144-173) is the shape
        # bench.py times — its restructured scan (carry-only body + one
        # final masked step) must be audited on the real backend too, not
        # just the training-path scan above (round-5 RAFT restructure).
        ("raft_lastup", raft, raft_in, lambda o: {"flow": o}, None,
         {"only_last": True}),
    ]
    worst = 0.0
    for name, build, make_inputs, outs, *extra in checks:
        try:
            rep = _run(build, make_inputs, outs,
                       cpu_build=extra[0] if extra else None,
                       apply_kwargs=extra[1] if len(extra) > 1 else None)
            for k, v in rep.items():
                flag = "" if v < 1e-3 else "  <-- SUSPECT"
                print(f"{name:11s} {k:12s} max rel diff {v:.2e}{flag}",
                      flush=True)
                worst = max(worst, v)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            worst = max(worst, 1.0)
    print(f"WORST {worst:.2e} ({'OK' if worst < 1e-3 else 'INVESTIGATE'})",
          flush=True)
    return worst


if __name__ == "__main__":
    sys.exit(0 if main(smoke="--smoke" in sys.argv[1:],
                       collect_only="--collect" in sys.argv[1:]) < 1e-3
             else 1)
