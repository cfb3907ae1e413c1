"""Unattended supervisor for the 10k-start headline run.

The residual TPU-runtime hazard on this environment (docs/PERFORMANCE.md
"TPU runtime hazards") is that a faulted >=1024-member execution can wedge
the process's TPU client — subsequent device_puts fail until the PROCESS
restarts. A 10k-start run is ~20 sequential 512-chunks, so the production
answer is supervision, not hope: run ``bench.headline_bench`` as a child
with screening-chunk checkpointing enabled, watch for crashes or stalls
(no checkpoint progress), and restart the child with RESUME=1 so it
continues after the last completed chunk on a FRESH client. Zero manual
restarts by construction.

    TPUSYSBIO_HEADLINE_N=10000 TPUSYSBIO_HEADLINE_TOPK=256 \
        python -m bench.headline_supervisor

Prints the child's final JSON line augmented with supervision stats
(restarts, total unattended wall-clock including compiles + restarts).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

MAX_RESTARTS = int(os.environ.get("TPUSYSBIO_SUP_MAX_RESTARTS", "10"))
# No-checkpoint-progress watchdog. Must exceed the worst single-phase gap
# with zero checkpoint writes: warm-up compiles (2-7 min/entry point on
# the remote AOT helper) plus the polish phase. 30 min is comfortably
# above both while still catching a truly wedged client.
STALL_S = float(os.environ.get("TPUSYSBIO_SUP_STALL_S", "1800"))
POLL_S = 10.0


def main() -> int:
    env = dict(os.environ)
    ckpt = env.get("TPUSYSBIO_HEADLINE_CKPT")
    if not ckpt:
        ckpt = os.path.join(tempfile.mkdtemp(prefix="headline_"),
                            "screen_ckpt.npz")
        env["TPUSYSBIO_HEADLINE_CKPT"] = ckpt

    t_start = time.time()
    restarts = 0
    last_json = None
    while restarts <= MAX_RESTARTS:
        env["TPUSYSBIO_HEADLINE_RESUME"] = "1" if restarts else "0"
        # Child stdout goes to a FILE, not a PIPE: an undrained pipe
        # blocks the child once it fills (~64KB), and after a stall-kill
        # any helper grandchild holding the write end would hang a
        # blocking read() here forever. A file has neither failure mode.
        out_path = ckpt + f".stdout.{restarts}"
        with open(out_path, "w") as out_f:
            child = subprocess.Popen(
                [sys.executable, "-m", "bench.headline_bench"], env=env,
                stdout=out_f, stderr=sys.stderr, text=True,
                cwd=os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__))))
            last_progress = time.time()
            last_mtime = (os.path.getmtime(ckpt)
                          if os.path.exists(ckpt) else 0.0)
            stalled = False
            while child.poll() is None:
                time.sleep(POLL_S)
                mtime = (os.path.getmtime(ckpt)
                         if os.path.exists(ckpt) else 0.0)
                if mtime > last_mtime:
                    last_mtime, last_progress = mtime, time.time()
                if time.time() - last_progress > STALL_S:
                    stalled = True
                    child.kill()
                    break
            child.wait()  # reap; also settles returncode after a kill
        with open(out_path) as f:
            out = f.read()
        for line in out.splitlines():
            line = line.strip()
            if line.startswith("{"):
                last_json = line
        if child.returncode == 0 and last_json and not stalled:
            break
        restarts += 1
        print(f"[supervisor] child {'stalled' if stalled else 'failed'} "
              f"(rc={child.returncode}); restart {restarts}/{MAX_RESTARTS}",
              file=sys.stderr)
    else:
        print("[supervisor] giving up after max restarts", file=sys.stderr)
        return 1

    rec = json.loads(last_json)
    rec["detail"]["supervisor_restarts"] = restarts
    rec["detail"]["unattended_total_seconds"] = round(
        time.time() - t_start, 1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
