"""Summarize an outer-driver budget run (scripts/{bilinear,hourglass}.sh)
from its run.log + per-epoch metric JSONs.

Usage:
    python benchmarks/budget_summary.py --run-log /tmp/hgbudget/run.log \
        --save-dir /tmp/hgbudget/save/Hourglass

Prints a per-invocation table (train epochs, wall time, loss, metric) plus
resume/contract evidence (counts of resumes and eval invocations), the shape
of evidence VERIFICATION_R3 §1/§6/§7 records.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
from datetime import datetime

TS = re.compile(r"(\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2})")


def _t(line):
    m = TS.search(line)
    return datetime.strptime(m.group(1), "%Y-%m-%d %H:%M:%S") if m else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-log", required=True)
    ap.add_argument("--save-dir", required=True)
    args = ap.parse_args()

    epochs = []  # (epoch, loss, ts)
    resumes = []  # (epoch, step, ts)
    evals = []  # (epoch, ts)
    for line in open(args.run_log, errors="replace"):
        m = re.search(r"Epoch (\d+) saved \(loss: ([0-9.eE+-]+)\)", line)
        if m:
            epochs.append((int(m.group(1)), float(m.group(2)), _t(line)))
        m = re.search(r"Resumed from epoch (\d+) \(step (\d+)\)", line)
        if m:
            resumes.append((int(m.group(1)), int(m.group(2)), _t(line)))
        m = re.search(r"Evaluating epoch (\d+)", line)
        if m:
            evals.append((int(m.group(1)), _t(line)))

    metrics = {}
    for f in glob.glob(os.path.join(args.save_dir, "pckh_epoch*.json")) + glob.glob(
        os.path.join(args.save_dir, "mpjpe_epoch*.json")
    ):
        d = json.load(open(f))
        ep = d.get("epoch")
        if ep is None:
            m = re.search(r"epoch(\d+)", os.path.basename(f))
            ep = int(m.group(1)) if m else -1
        metrics[int(ep)] = d.get("avg", d.get("avg_mpjpe_mm"))

    print(f"train epochs logged : {len(epochs)}"
          f" (last epoch {epochs[-1][0] if epochs else '-'})")
    print(f"auto-resumes logged : {len(resumes)}")
    print(f"valid invocations   : {len(evals)}")
    if epochs:
        t0, t1 = epochs[0][2], epochs[-1][2]
        if t0 and t1:
            print(f"wall (first->last epoch): {(t1 - t0).total_seconds()/3600:.2f} h")
    # Restart invariance: every resume step must equal epochs*steps_per_epoch+1
    if len(resumes) >= 2:
        vals = sorted({round((step - 1) / ep, 6)
                       for ep, step, _ in resumes if ep})
        print(f"steps/epoch implied by resumes: {vals}"
              f" ({'INVARIANT' if len(vals) == 1 else 'VARIES'})")
    print("\nmetric trajectory:")
    for ep in sorted(metrics):
        print(f"  epoch {ep:4d}: {metrics[ep]:.4g}")
    # Per-invocation wall times (gap between consecutive 'saved' lines > 60 s
    # marks an invocation boundary: startup + valid in between).
    if epochs:
        bounds = []
        start = epochs[0][2]
        prev = epochs[0][2]
        first_ep = epochs[0][0]
        for ep, _ls, ts in epochs[1:]:
            if ts and prev and (ts - prev).total_seconds() > 0 and ep % 10 == 1:
                bounds.append((first_ep, prev))
                first_ep = ep
                start = ts
            prev = ts
        bounds.append((first_ep, prev))
        print(f"\ninvocations (by epoch ranges): {len(bounds)}")


if __name__ == "__main__":
    main()
