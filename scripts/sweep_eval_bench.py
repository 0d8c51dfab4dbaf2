"""Serial sweep of eval-bench configs (env-knob driven) on the real TPU.

Each config runs bench.py in a subprocess (fresh jax, persistent compile
cache makes repeats cheap). One TPU client at a time; run only when the
host CPU is otherwise idle (host-side timing skews under load).

Results are appended to /tmp/sweep_eval.log as each config finishes, so a
killed parent (session death) loses at most the in-flight config. Launch
detached (setsid nohup) to survive session restarts.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (label, env overrides)
    ("base d768 bt-auto", {}),
    ("inline d768 bt-auto", {"AUM_SCAN_INLINE_DECAY": "1"}),
    ("inline d768 bt2", {"AUM_SCAN_INLINE_DECAY": "1", "AUM_SCAN_BTILE": "2"}),
    ("inline d768 bt8", {"AUM_SCAN_INLINE_DECAY": "1", "AUM_SCAN_BTILE": "8"}),
    ("inline d1536 bt2", {"AUM_SCAN_INLINE_DECAY": "1",
                          "AUM_SCAN_DBLOCK": "1536", "AUM_SCAN_BTILE": "2"}),
    ("conv-xla (best scan)", {"AUM_CONV_KERNEL": "0"}),
]


LOG = "/tmp/sweep_eval.log"


def emit(msg):
    print(msg, flush=True)
    with open(LOG, "a") as f:
        f.write(msg + "\n")


def main():
    configs = CONFIGS
    if len(sys.argv) > 1:
        configs = eval(sys.argv[1])
    for label, overrides in configs:
        env = dict(os.environ, **overrides)
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=2400)
        line = ""
        for ln in r.stdout.splitlines():
            if ln.startswith("{"):
                line = ln
        if line:
            val = json.loads(line)["value"]
            emit(f"{label:28s} {val:8.2f} clips/s")
        else:
            err = (r.stderr or r.stdout).strip().splitlines()
            emit(f"{label:28s} FAILED: {err[-1][:160] if err else '?'}")
    emit("== sweep done ==")


if __name__ == "__main__":
    main()
