"""Publish the sustained-run artifacts (summary + CSV + heartbeat tail)
into artifacts/published/ for RESULTS.md citation."""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUN = os.path.join(REPO, "artifacts", "train", "sustained_r5")
PUB = os.path.join(REPO, "artifacts", "published")

shutil.copy(os.path.join(RUN, "training.csv"),
            os.path.join(PUB, "sustained_r5_training.csv"))
with open(os.path.join(RUN, "heartbeat.jsonl")) as f:
    lines = f.readlines()
with open(os.path.join(PUB, "sustained_r5_heartbeat_tail.jsonl"), "w") as f:
    f.writelines(lines[-50:])
drill = os.path.join(REPO, "artifacts", "train", "watchdog_drill_r5")
out = {}
for name in (".anomaly_type", ".HALT"):
    p = os.path.join(drill, name)
    out[name] = open(p).read().strip() if os.path.exists(p) else None
with open(os.path.join(PUB, "watchdog_drill_r5.json"), "w") as f:
    json.dump(out, f, indent=1)
print("published", out)
