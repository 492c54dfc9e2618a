"""Summarize the chain run: stage wall times + MPJPE GT vs SH+FT gap."""
import json, glob, os, re, sys

log = open("/tmp/r4chain/go.log").read()
# stage boundaries
stages = re.findall(r"=== \[(\d)\] ([^=]+)===", log)
times = re.findall(r"t=(\d+)s", log)
print("stage end times (s since chain start):")
prev = 0
for (num, name), t in zip(stages[1:] + [("7", "end")], times):
    t = int(t)
    print(f"  [{num}] {name.strip():50s} +{t - prev:5d}s  (t={t}s)")
    prev = t

for comment in ("Bilinear SH+FT", "Bilinear GT"):
    d = f"/tmp/r4chain/save/{comment}"
    for p in sorted(glob.glob(os.path.join(d, "mpjpe_epoch*.json"))):
        with open(p) as f:
            m = json.load(f)
        print(f"{comment}: {os.path.basename(p)} overall={m['overall']:.3f} mm, "
              f"actions={len(m.get('per_action', {}))}")
