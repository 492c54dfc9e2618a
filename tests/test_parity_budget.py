"""Full-budget trajectory parity vs the reference (BASELINE.md accuracy
target). Runs benchmarks/parity_budget.py in a subprocess (it needs
jax_enable_x64 for the float64 leg, which must not leak into this process's
jax config) and checks both JSON verdicts."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_trajectory_parity_full_budget():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "parity_budget.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    results = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{")
    ]
    by_prec = {r["precision"]: r for r in results}
    assert set(by_prec) == {"float64", "float32"}

    f64 = by_prec["float64"]
    # Semantic proof: epoch-resynced f64 lockstep tracks at the noise floor
    # through >=2 epochs, a resume boundary, and both LR-fire points.
    assert f64["steps"] >= 60
    # True f64 noise floor (round-2 fix: the resume-boundary trainer now
    # keeps dtype=float64; measured 1.3e-15).
    assert f64["max_step_loss_rel_diff"] < 1e-12
    assert f64["mpjpe_gap_mm"] < 1e-5
    assert f64["resume_boundary"] and len(f64["lr_fires"]) == 2

    f32 = by_prec["float32"]
    # Deployment precision, no resync: the BASELINE.md 0.5 mm target.
    assert f32["mpjpe_gap_mm"] < 0.5


@pytest.mark.slow
@pytest.mark.budget
def test_hourglass_trajectory_parity_full_budget():
    """Companion harness for the hourglass trainer: reference loop semantics
    (sum-of-stacks MSE, clip(1), RMSprop) + the FULL reference eval protocol
    (BN reset + cumulative recalibration + flip TTA + argmax + PCKh)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "benchmarks", "parity_budget_hourglass.py")],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    results = [
        json.loads(line)
        for line in proc.stdout.splitlines()
        if line.startswith("{")
    ]
    legs = {(r["precision"], r["variant"]): r for r in results}
    # Both reference model families: torch7 (train_hourglass.py) and
    # preact (train_hourglass_FT.py's StackedHourglass).
    assert set(legs) == {
        ("float64", "torch7"), ("float32", "torch7"),
        ("float64", "preact"), ("float32", "preact"),
    }
    for variant in ("torch7", "preact"):
        f64 = legs[("float64", variant)]
        # Epoch-resynced f64 lockstep through a resume boundary. The first
        # step after every sync must sit at the f64 noise floor (systematic
        # formula errors land here); later steps amplify the floor at a
        # model-dependent chaotic rate (preact ~10x/step) under a loose
        # envelope, and the final reference-protocol PCKh must agree
        # exactly (tol = ~2 argmax ties).
        assert f64["steps"] >= 18
        assert f64["max_first_step_rel_diff"] < 1e-9, variant
        # Chaos envelope (control: torch-vs-torch with a 1e-13 perturbation
        # reaches 1.7e-2 by step 8 on preact).
        assert f64["max_per_step_loss_rel_diff"] < (
            1e-3 if variant == "torch7" else 0.2
        ), variant
        assert f64["pckh_gap"] <= 0.003, variant
        assert legs[("float32", variant)]["pckh_gap"] <= 0.02, variant
