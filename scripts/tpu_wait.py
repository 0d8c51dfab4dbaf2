"""Wait for the TPU lease to become healthy, retrying patient probes.

Each attempt runs a tiny op in a fresh subprocess with NO kill/timeout
(killing any TPU client — even one just waiting for the relay claim —
wedges the lease for ~30+ min; see CLAUDE.md). The relay itself fails a
starved client after ~25 min, which is our natural retry boundary.

Appends one line per attempt to /tmp/tpu_wait.log and exits 0 on the
first successful probe. Launch detached: `setsid nohup python
scripts/tpu_wait.py &`.
"""

import subprocess
import sys
import time

PROBE = (
    "import time,jax,jax.numpy as jnp;"
    "t0=time.time();y=float((jnp.ones((8,8))+1).sum());"
    "print('ok',y,round(time.time()-t0,1))"
)
LOG = "/tmp/tpu_wait.log"


def emit(msg):
    line = f"{time.strftime('%H:%M:%S')} {msg}"
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def main():
    for attempt in range(1, 25):
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", PROBE],
                           capture_output=True, text=True)
        dt = time.time() - t0
        if r.returncode == 0 and "ok" in r.stdout:
            emit(f"attempt {attempt}: TPU HEALTHY after {dt:.0f}s")
            return 0
        tail = (r.stderr or r.stdout).strip().splitlines()
        emit(f"attempt {attempt}: failed after {dt:.0f}s: "
             f"{tail[-1][:200] if tail else '?'}")
        time.sleep(30)
    return 1


if __name__ == "__main__":
    sys.exit(main())
