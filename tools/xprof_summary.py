"""Summarise a ``jax.profiler.trace`` capture by JAX-level op.

The reference ships only wall-clock timers (regressor demo.py:230-237)
and opt-in CUDA event prints; on TPU the equivalent first-class tool is
an xprof capture. This reads the trace-viewer JSON export that
``jax.profiler.trace(logdir)`` writes (``*.trace.json.gz``) and prints
device time grouped by the ``tf_op`` attribution (the JAX primitive +
jaxpr path), which is how the round-3 train-step decomposition in
BENCH.md was produced.

Usage:
  python tools/xprof_summary.py <logdir-or-trace.json.gz> [--steps N]
         [--group tf_op|name|shape] [--top K]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace(path: str) -> str:
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "**", "*.trace.json.gz"), recursive=True))
    if not hits:
        sys.exit(f"no *.trace.json.gz under {path}")
    return hits[-1]  # newest capture


def shapes_of(long_name: str) -> str:
    head = long_name.split(" fusion(")[0].split(" convolution(")[0]
    toks = re.findall(r"(?:bf16|f32|f16|s32|s8|u8|pred)\[[\d,]*\]", head)
    return ",".join(toks) if toks else "?"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--steps", type=int, default=1,
                    help="number of steps captured (divides the totals)")
    ap.add_argument("--group", default="tf_op",
                    choices=["tf_op", "name", "shape"])
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    trace = find_trace(args.path)
    data = json.load(gzip.open(trace, "rt") if trace.endswith(".gz")
                     else open(trace))
    events = data.get("traceEvents", [])

    tnames = {}
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e["args"].get("name")
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name")

    device_pids = {p for p, n in pnames.items() if n and "TPU" in n}
    ops = [e for e in events if e.get("ph") == "X"
           and e["pid"] in device_pids
           and tnames.get((e["pid"], e["tid"])) == "XLA Ops"]
    if not ops:
        sys.exit("no device 'XLA Ops' lane in this trace "
                 f"(processes: {pnames})")

    agg = collections.defaultdict(float)
    cnt = collections.Counter()
    for e in ops:
        a = e.get("args", {})
        if args.group == "tf_op":
            key = a.get("tf_op", "?")
        elif args.group == "shape":
            key = shapes_of(a.get("long_name", ""))
        else:
            key = re.sub(r"[.\d]+$", "", e["name"].lstrip("%"))
        agg[key] += e["dur"]
        cnt[key] += 1

    total = sum(agg.values())
    n = max(args.steps, 1)
    print(f"# {trace}")
    print(f"# device op time: {total / 1e3 / n:.2f} ms/step "
          f"({len(ops)} events, {n} steps)")
    for k, t in sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{t / 1e3 / n:9.2f} ms {100 * t / total:5.1f}% "
              f"{cnt[k] // n:6d}x  {k[:120]}")


if __name__ == "__main__":
    main()
