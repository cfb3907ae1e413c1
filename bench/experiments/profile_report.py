"""Summarize a captured JAX device trace: top self-time ops.

Usage: python bench/experiments/profile_report.py /tmp/bdf_profile
Prints the hlo_stats tool output (top rows by self time) from the
xprof converter.
"""
import glob
import json
import sys


def main(trace_dir):
    paths = sorted(glob.glob(
        f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        print(f"no .xplane.pb under {trace_dir}")
        return 1
    from xprof.convert import raw_to_tool_data as r2t

    names = r2t.xspace_to_tool_names(paths[-1:])
    print("tools:", names)
    for tool in ("hlo_stats", "framework_op_stats", "op_profile"):
        if tool not in str(names):
            continue
        try:
            data, _ = r2t.xspace_to_tool_data(paths[-1:], tool, {})
        except Exception as e:  # noqa: BLE001
            print(f"{tool}: ERR {e}")
            continue
        out = f"/tmp/{tool}.out"
        mode = "wb" if isinstance(data, bytes) else "w"
        with open(out, mode) as fh:
            fh.write(data)
        print(f"{tool}: wrote {out} ({len(data)} bytes)")
        if tool == "hlo_stats" and isinstance(data, (str, bytes)):
            try:
                j = json.loads(data)
                print(json.dumps(j, indent=1)[:4000])
            except Exception:  # noqa: BLE001
                s = data if isinstance(data, str) else data.decode(
                    "utf-8", "replace")
                print(s[:4000])
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/bdf_profile"))
