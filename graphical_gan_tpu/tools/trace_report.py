"""Device-timeline attribution report from a ``jax.profiler`` trace.

Round 3's ssgan plateau analysis (BASELINE.md) was done by hand over the
raw Chrome-trace events; this tool makes that a one-command instrument:

    GGAN_PROFILE=/tmp/prof python -m graphical_gan_tpu.runs.gan_inference ...
    python -m graphical_gan_tpu.tools.trace_report /tmp/prof [--iters N]

It parses the ``*.trace.json.gz`` the profiler writes, takes the device
lanes (``/device:TPU:*`` → "XLA Ops"; host-CPU executor threads as the
fallback when profiling under ``JAX_PLATFORMS=cpu``), computes **self
time** per event — a ``while`` (the scanned hot loop) or ``conditional``
(the do-gen branch) is a container whose duration covers its children, so
naive per-category sums double-count — and aggregates by the compiler's
own ``hlo_category`` tag (convolution fusion / loop fusion / data
formatting / ...).  Container self time is the scheduling gap between the
ops inside it, reported as its own row: nonzero "while" self time IS the
dispatch/scheduling bubble.

Output: a human table plus one JSON line (machine-readable, like
``bench.py``) with total busy ms, per-category self-time shares, and the
top ops; ``--iters N`` adds per-iteration figures.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Tuple


def find_trace(path: str) -> str:
    """``path`` may be the profile dir, a session dir, or the trace file."""
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(os.path.join(
        path, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path!r}")
    return hits[-1]


def load_events(trace_file: str):
    with gzip.open(trace_file, "rt") as f:
        trace = json.load(f)
    evs = trace["traceEvents"]
    procs: Dict[int, str] = {}
    threads: Dict[Tuple[int, int], str] = {}
    for e in evs:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            procs[e["pid"]] = e["args"]["name"]
        elif e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"]["name"]
    return evs, procs, threads


def device_lanes(procs, threads) -> List[Tuple[int, int]]:
    """(pid, tid) lanes holding device op events.  Prefer real device
    "XLA Ops" lanes; fall back to the CPU client executor threads so the
    tool also works on JAX_PLATFORMS=cpu traces (CI)."""
    lanes = [(pid, tid) for (pid, tid), tn in threads.items()
             if procs.get(pid, "").startswith("/device:")
             and tn == "XLA Ops"]
    if lanes:
        return lanes
    return [(pid, tid) for (pid, tid), tn in threads.items()
            if "XLAPjRtCpuClient" in tn or tn == "XLA Ops"]


_CPU_NAME_CATEGORIES = (
    ("conv", "convolution"),
    ("dot", "matmul"),
    ("matmul", "matmul"),
    ("all-reduce", "collective"), ("all-gather", "collective"),
    ("reduce-scatter", "collective"), ("collective", "collective"),
    ("copy", "data formatting"), ("transpose", "data formatting"),
    ("while", "while"), ("conditional", "conditional"),
)


def _category(e) -> str:
    cat = e.get("args", {}).get("hlo_category")
    if cat:
        return cat
    name = e.get("name", "")
    for frag, cat in _CPU_NAME_CATEGORIES:
        if frag in name:
            return cat
    return "other"


def _is_op_event(e) -> bool:
    # infra markers on CPU lanes ("end: foo", "ThunkExecutor::…") are not
    # HLO ops; real op names are identifier-shaped
    name = e.get("name", "")
    return bool(name) and " " not in name and "::" not in name


def self_times(events) -> List[Tuple[dict, float]]:
    """[(event, self_dur_us)] with children's time subtracted.

    Nesting is a PER-LANE property: events on one (pid, tid) lane are
    properly nested complete events, but two lanes (multi-chip "XLA Ops",
    multiple CPU executor threads) overlap freely — mixing them into one
    stack would treat concurrent spans as parent/child and produce
    negative self times.  Events are therefore grouped by lane and each
    lane gets its own stack pass; results concatenate."""
    by_lane: Dict[Tuple, List[dict]] = defaultdict(list)
    for e in events:
        by_lane[(e.get("pid"), e.get("tid"))].append(e)
    if len(by_lane) > 1:
        out: List[Tuple[dict, float]] = []
        for lane_events in by_lane.values():
            out.extend(self_times(lane_events))
        return out
    evs = sorted(events, key=lambda e: (e["ts"], -e.get("dur", 0.0)))
    out: List[Tuple[dict, float]] = []
    stack: List[Tuple[dict, float, float]] = []  # (event, end, child_sum)
    for e in evs:
        ts, dur = e["ts"], e.get("dur", 0.0)
        while stack and ts >= stack[-1][1] - 1e-9:
            ev, end, child = stack.pop()
            out.append((ev, ev.get("dur", 0.0) - child))
            if stack:
                stack[-1] = (stack[-1][0], stack[-1][1],
                             stack[-1][2] + ev.get("dur", 0.0))
        stack.append((e, ts + dur, 0.0))
    while stack:
        ev, end, child = stack.pop()
        out.append((ev, ev.get("dur", 0.0) - child))
        if stack:
            stack[-1] = (stack[-1][0], stack[-1][1],
                         stack[-1][2] + ev.get("dur", 0.0))
    return out


def report(path: str, iters: Optional[int] = None,
           top: int = 10) -> Dict:
    trace_file = find_trace(path)
    evs, procs, threads = load_events(trace_file)
    lanes = set(device_lanes(procs, threads))
    ops = [e for e in evs
           if e.get("ph") == "X" and (e["pid"], e.get("tid")) in lanes
           and _is_op_event(e)]
    if not ops:
        raise ValueError(f"no op events on device lanes of {trace_file!r}")

    attributed = self_times(ops)
    by_cat: Dict[str, float] = defaultdict(float)
    n_cat: Dict[str, int] = defaultdict(int)
    by_op: Dict[str, float] = defaultdict(float)
    op_meta: Dict[str, str] = {}
    for e, self_us in attributed:
        cat = _category(e)
        by_cat[cat] += self_us
        n_cat[cat] += 1
        by_op[e["name"]] += self_us
        tf_op = e.get("args", {}).get("tf_op")
        if tf_op and e["name"] not in op_meta:
            op_meta[e["name"]] = tf_op
    total_us = sum(by_cat.values())

    cats = sorted(by_cat.items(), key=lambda kv: -kv[1])
    top_ops = sorted(by_op.items(), key=lambda kv: -kv[1])[:top]
    out = {
        "trace": trace_file,
        "n_events": len(ops),
        "busy_ms": round(total_us / 1e3, 3),
        "categories": [
            {"category": c, "ms": round(us / 1e3, 3),
             "share": round(us / total_us, 4), "events": n_cat[c]}
            for c, us in cats],
        "top_ops": [
            {"op": name, "ms": round(us / 1e3, 3),
             "tf_op": op_meta.get(name, "")}
            for name, us in top_ops],
    }
    if iters:
        out["iters"] = iters
        out["busy_ms_per_iter"] = round(total_us / 1e3 / iters, 4)
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("path", help="profile dir (GGAN_PROFILE target) or "
                                "trace.json.gz file")
    p.add_argument("--iters", type=int, default=None,
                   help="iterations the trace covers (adds per-iter rows)")
    p.add_argument("--top", type=int, default=10)
    args = p.parse_args(argv)
    r = report(args.path, iters=args.iters, top=args.top)

    print(f"trace: {r['trace']}")
    per_iter = f"  ({r['busy_ms_per_iter']} ms/iter)" if args.iters else ""
    print(f"device busy: {r['busy_ms']} ms over {r['n_events']} op "
          f"events{per_iter}")
    print(f"{'category':32s} {'ms':>10s} {'share':>7s} {'events':>7s}")
    for c in r["categories"]:
        print(f"{c['category']:32s} {c['ms']:10.3f} "
              f"{c['share']*100:6.1f}% {c['events']:7d}")
    print("top ops by self time:")
    for o in r["top_ops"]:
        print(f"  {o['ms']:10.3f} ms  {o['op']}  {o['tf_op']}")
    print(json.dumps(r["categories"][:5] and {
        "metric": "trace_attribution", "busy_ms": r["busy_ms"],
        **({"busy_ms_per_iter": r["busy_ms_per_iter"]} if args.iters
           else {}),
        "top_categories": {c["category"]: c["share"]
                           for c in r["categories"][:5]}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
