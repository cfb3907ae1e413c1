"""Crash-recovery drill: prove the headline supervision layer actually
works by killing the bench child mid-screen and watching the supervisor
restart it with RESUME=1, the restarted child resume after the last
checkpointed chunk, and the final record flag the partial resume.

Kills are strictly PID-based (the supervisor's direct child, read from
/proc/<pid>/task/*/children) — never pattern-based.

    python -m bench.experiments.crash_recovery_drill
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

N = os.environ.get("TPUSYSBIO_DRILL_N", "4096")
KILL_AFTER_CHUNKS = int(os.environ.get("TPUSYSBIO_DRILL_KILL_AT", "3"))


def children_of(pid: int):
    kids = []
    task_dir = f"/proc/{pid}/task"
    try:
        for t in os.listdir(task_dir):
            with open(f"{task_dir}/{t}/children") as f:
                kids += [int(p) for p in f.read().split()]
    except OSError:
        pass
    return kids


def main():
    ckpt = os.path.join(tempfile.mkdtemp(prefix="drill_"), "ck.npz")
    env = dict(os.environ)
    env.update({
        "TPUSYSBIO_HEADLINE_N": N,
        "TPUSYSBIO_HEADLINE_TOPK": "64",
        "TPUSYSBIO_HEADLINE_CKPT": ckpt,
    })
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    sup = subprocess.Popen(
        [sys.executable, "-m", "bench.headline_supervisor"], env=env,
        cwd=repo, stdout=subprocess.PIPE, stderr=sys.stderr, text=True)

    # wait for the screen phase to checkpoint KILL_AFTER_CHUNKS chunks,
    # then kill the supervisor's direct child (the bench process)
    import numpy as np
    killed = False
    while sup.poll() is None and not killed:
        time.sleep(5.0)
        if not os.path.exists(ckpt):
            continue
        try:
            done = int(np.load(ckpt)["chunks_done"])
        except Exception:
            continue
        if done >= KILL_AFTER_CHUNKS:
            for kid in children_of(sup.pid):
                try:
                    os.kill(kid, signal.SIGKILL)
                except ProcessLookupError:
                    continue  # child exited in the race window; retry
                print(f"[drill] checkpoint at chunk {done}; killed bench "
                      f"child pid {kid}", file=sys.stderr, flush=True)
                killed = True
    out, _ = sup.communicate()
    line = [ln for ln in out.splitlines() if ln.strip().startswith("{")]
    rec = json.loads(line[-1])
    d = rec["detail"]
    assert killed, "never killed the child — drill invalid"
    assert d["supervisor_restarts"] >= 1, d
    assert d["chunks_resumed"] >= KILL_AFTER_CHUNKS, d
    assert d["partial_resume"] is True, d
    assert d["anchor_ok"] is None, "anchor must not be asserted on a partial run"
    assert d["screen_converged"] >= 0 and d["best_cost"] < 20.0, d
    print(json.dumps({
        "drill": "crash-recovery", "ok": True,
        "killed_at_chunk": KILL_AFTER_CHUNKS,
        "supervisor_restarts": d["supervisor_restarts"],
        "chunks_resumed": d["chunks_resumed"],
        "best_cost": d["best_cost"],
        "final_record": rec,
    }))


if __name__ == "__main__":
    main()
