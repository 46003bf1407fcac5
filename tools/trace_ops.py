#!/usr/bin/env python
"""Per-op device-time summary from a ``jax.profiler.trace`` capture.

The methodology behind every PERF.md close-out (rounds 3-5): on this
environment ``tensorboard_plugin_profile``'s ``xplane_pb2`` import fails,
so we parse the Chrome-trace export instead — sum the ``"X"`` (complete)
events on the device "XLA Ops" lanes and group them by op-name base
(``re.sub(r"[.\\d]+$", "", name)``), which folds ``fusion.123`` /
``fusion.7`` into one ``fusion`` row.

Two hard-won rules for reading the numbers (PERF.md "Measurement
hazards"):

* Only profile a DEPENDENT chain of steps (each step consuming the
  previous step's output).  Independent same-arg calls overlap on the
  axon pool and the per-op sums exceed any wall time you can sustain.
* Per-op sums over a dependent chain DO match the chain's wall time —
  that is the check that the trace is trustworthy (pass ``--steps N`` to
  get per-step numbers and compare against your measured wall).

Usage::

    with jax.profiler.trace("/tmp/mytrace"):
        for _ in range(4):                 # dependent chain!
            state, m = step(state, batch)
        m["loss"].block_until_ready()

    python tools/trace_ops.py /tmp/mytrace --steps 4 --top 25

Library use: ``summarize_trace(path)`` returns ``{group: (ms, count)}``.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from typing import Dict, Tuple


def _find_trace_file(path: str) -> str:
    """Accept the trace dir passed to jax.profiler.trace, any parent of the
    dump, or the .trace.json(.gz) file itself."""
    if os.path.isfile(path):
        return path
    hits = sorted(
        glob.glob(os.path.join(path, "**", "*.trace.json.gz"), recursive=True)
        + glob.glob(os.path.join(path, "**", "*.trace.json"), recursive=True),
        key=os.path.getmtime,
    )
    if not hits:
        raise FileNotFoundError(
            f"no *.trace.json(.gz) under {path}: pass the directory given to "
            "jax.profiler.trace (the dump lands in plugins/profile/<ts>/)")
    return hits[-1]  # newest capture


def load_events(path: str) -> list:
    f = _find_trace_file(path)
    opener = gzip.open if f.endswith(".gz") else open
    with opener(f, "rt") as fh:
        doc = json.load(fh)
    if isinstance(doc, dict):
        if "traceEvents" not in doc:
            raise ValueError(
                f"{f}: JSON object has no 'traceEvents' key — not a Chrome "
                "trace (pass the directory given to jax.profiler.trace)")
        return doc["traceEvents"]
    return doc


def summarize_trace(
    path: str,
    lane: str = "XLA Ops",
    device_substr: str = "",
) -> Dict[str, Tuple[float, int]]:
    """{op-name base: (total device ms, event count)} for one capture.

    :param lane: thread-name of the lanes to sum ("XLA Ops" is where XLA
        reports per-op device times; "TensorFlow Ops" mirrors it with
        framework names).
    :param device_substr: keep only processes whose name contains this
        (e.g. "/device:TPU"); empty = all devices that carry the lane.
    """
    events = load_events(path)
    procs: Dict[int, str] = {}
    lanes = set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name" and e["args"].get("name") == lane:
            lanes.add((e["pid"], e["tid"]))
    groups: Dict[str, Tuple[float, int]] = {}
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in lanes:
            continue
        if device_substr and device_substr not in procs.get(e["pid"], ""):
            continue
        base = re.sub(r"[.\d]+$", "", e["name"])
        ms, n = groups.get(base, (0.0, 0))
        groups[base] = (ms + e.get("dur", 0) / 1000.0, n + 1)
    if not groups:
        known = sorted({procs.get(p, str(p)) for p, _ in lanes}) or list(
            procs.values())
        raise ValueError(
            f"no '{lane}' events matched device filter {device_substr!r}; "
            f"processes in this trace: {known}")
    return groups


def main() -> None:
    ap = argparse.ArgumentParser(
        description="Per-op device-time table from a jax.profiler trace")
    ap.add_argument("trace", help="dir passed to jax.profiler.trace, or the "
                    ".trace.json(.gz) file")
    ap.add_argument("--steps", type=int, default=1,
                    help="dependent steps captured: divides ms and counts")
    ap.add_argument("--top", type=int, default=20, help="rows to print")
    ap.add_argument("--lane", default="XLA Ops")
    ap.add_argument("--device", default="",
                    help="substring filter on process name, e.g. /device:TPU")
    args = ap.parse_args()
    if args.steps < 1:
        ap.error(f"--steps must be >= 1, got {args.steps}")

    groups = summarize_trace(args.trace, lane=args.lane,
                             device_substr=args.device)
    rows = sorted(groups.items(), key=lambda kv: -kv[1][0])
    total_ms = sum(ms for ms, _ in groups.values())
    total_n = sum(n for _, n in groups.values())
    print(f"{'group':<44} {'ms/step':>9} {'ops/step':>9}")
    for name, (ms, n) in rows[: args.top]:
        print(f"{name:<44} {ms / args.steps:>9.3f} {n / args.steps:>9.1f}")
    rest = rows[args.top:]
    if rest:
        ms = sum(m for _, (m, _) in rest)
        n = sum(k for _, (_, k) in rest)
        print(f"{f'... {len(rest)} more groups':<44} "
              f"{ms / args.steps:>9.3f} {n / args.steps:>9.1f}")
    print(f"{'TOTAL (compare vs dependent-chain wall!)':<44} "
          f"{total_ms / args.steps:>9.3f} {total_n / args.steps:>9.1f}")


if __name__ == "__main__":
    main()
