"""Round-ritual entry point for the compiled-Mosaic smoke lane.

VERDICT r4 #8: the compiled-kernel correctness checks in
``bench/experiments/tpu_smoke.py`` used to be a by-hand, once-per-round
step — exactly the lane that would have mechanically caught the r4
mis-built EFT guard. This wrapper makes it a one-liner whose artifact is
committed per round (like ``BENCH_rN.json``):

    python -m bench.tpu_smoke --json TPU_SMOKE_r05.json

Prints the same single JSON line as the underlying script and, with
``--json PATH``, also writes it (pretty-printed) to PATH. Exit status is
non-zero when any compiled-kernel check fails, zero on success or when
the backend is not a TPU (the lane is meaningless off-chip; the JSON
records the skip).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--json", metavar="PATH", default=None,
                    help="also write the result JSON to PATH")
    ns = ap.parse_args(argv)

    from bench.experiments import tpu_smoke

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = tpu_smoke.main()
    line = buf.getvalue().strip().splitlines()[-1]
    print(line)
    if ns.json:
        with open(ns.json, "w") as fh:
            json.dump(json.loads(line), fh, indent=1)
            fh.write("\n")
    return rc


if __name__ == "__main__":
    sys.exit(main())
