"""Distill a ``jax.profiler`` trace into an op-level perf dossier.

SURVEY.md §5 tracing row, round 4: the ``--profile_dir`` hook captures a
device trace of epoch 1; this module turns that raw trace into the table a
human actually wants — top ops by DEVICE time, ms/step and % of step, plus
an HLO-category rollup — with no tensorboard dependency (the box has
none): it reads the chrome-trace JSON the profiler writes next to the
xplane. Device ops live on the device pid's "XLA Ops" thread as complete
('X') events whose ``dur`` is microseconds of device time.

The one non-obvious step is SELF time: XLA-Ops events nest (a ``while``
contains ``conditional`` contains fusions...), so summing raw durations
multi-counts every container. ``distill_trace`` stack-walks each thread's
time-sorted events and subtracts immediate children from their parent;
the resulting self-time totals reconcile with the module-level event to
<0.1% (verified against real v5e captures, RESULTS.md round-4 dossier).

Used by ``experiments/profile_trace.py`` (standalone flagship captures)
and ``train/loop.py`` (auto-dossier after a ``--profile_dir`` epoch).
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
from typing import Optional


def find_trace(trace_root: str) -> Optional[str]:
    """Newest chrome-trace file under a profiler output dir, or None."""
    paths = sorted(glob.glob(os.path.join(
        trace_root, "plugins/profile/*/*.trace.json.gz")))
    return paths[-1] if paths else None


def distill_trace(trace_root: str, steps: int) -> Optional[dict]:
    """Aggregate device-side self time per op and per HLO category.

    ``steps`` is the number of training steps the traced window covered
    (outer + aggressive inner, if any) — it only scales the ms/step
    columns. Returns None when the trace has no device timeline (e.g. a
    CPU-backend run, where XLA emits no per-op device events).
    """
    path = find_trace(trace_root)
    if path is None:
        return None
    ev = json.load(gzip.open(path))["traceEvents"]

    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n}
    tnames = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
              if e.get("ph") == "M" and e.get("name") == "thread_name"}

    by_tid = collections.defaultdict(list)
    modules_us = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        thread = tnames.get((e["pid"], e["tid"]), "")
        if thread == "XLA Modules":
            modules_us += e.get("dur", 0)
        elif thread == "XLA Ops":
            by_tid[(e["pid"], e["tid"])].append(e)
    if not by_tid:
        return None
    # Multi-device traces carry one timeline PER device pid, all executing
    # the same SPMD program in parallel — report the PER-DEVICE mean, not
    # the sum, or every ms/step metric inflates by the mesh size.
    n_dev = len({pid for pid, _ in by_tid})

    ops = collections.Counter()      # (base name, category) -> self us
    counts = collections.Counter()
    bytes_acc = collections.Counter()
    cats = collections.Counter()
    for evs in by_tid.values():
        # parents first at equal start times (longer duration wins)
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []   # end timestamps of open ancestors
        cells = []   # child-time accumulator per open ancestor
        recorded = []
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1] - 1e-9:
                stack.pop()
                cells.pop()
            if cells:
                cells[-1][0] += dur  # credit to the immediate parent
            cell = [0.0]
            stack.append(ts + dur)
            cells.append(cell)
            args = e.get("args", {})
            recorded.append((re.sub(r"\.\d+$", "", e["name"]),
                             args.get("hlo_category", "?"), dur, cell,
                             args.get("bytes_accessed", 0)))
        for base, cat, dur, cell, nbytes in recorded:
            self_us = max(dur - cell[0], 0.0)
            key = (base, cat)
            ops[key] += self_us
            counts[key] += 1
            cats[cat] += self_us
            try:
                bytes_acc[key] += int(nbytes)
            except (TypeError, ValueError):
                pass

    total_us = sum(ops.values())
    per_dev = 1e3 * n_dev  # us -> per-device ms
    table = [{
        "op": name, "category": cat,
        "ms_total": round(us / per_dev, 3),
        "ms_per_step": round(us / per_dev / steps, 4),
        "pct_device": round(100.0 * us / max(total_us, 1e-9), 2),
        "calls": int(round(counts[(name, cat)] / n_dev)),
        "gb_accessed": round(bytes_acc[(name, cat)] / 1e9 / n_dev, 3),
    } for (name, cat), us in ops.most_common()]
    categories = [{
        "category": c, "ms_per_step": round(us / per_dev / steps, 4),
        "pct_device": round(100.0 * us / max(total_us, 1e-9), 2),
    } for c, us in cats.most_common()]
    return {"trace": path, "steps": steps, "devices": n_dev,
            "device_busy_ms": round(modules_us / per_dev, 3),
            "ops_total_ms": round(total_us / per_dev, 3),
            "ms_per_step_device": round(total_us / per_dev / steps, 4),
            "categories": categories, "table": table}


def render_dossier(summary: dict, title: str = "Profiler dossier",
                   header_lines: tuple = (), top: int = 15) -> str:
    """Markdown dossier from a ``distill_trace`` summary."""
    steps = max(summary.get("steps", 1), 1)
    lines = [f"# {title}", ""]
    lines += list(header_lines)
    if summary.get("devices", 1) > 1:
        lines.append(f"- per-device mean over {summary['devices']} device "
                     f"timelines (SPMD)")
    lines += [
        f"- device-busy (XLA Modules): {summary['device_busy_ms']:.1f} ms "
        f"→ {summary['device_busy_ms'] / steps:.2f} ms/step "
        f"over {steps} steps",
        f"- sum of XLA Ops self time: {summary['ops_total_ms']:.1f} ms "
        f"({summary['ms_per_step_device']:.2f} ms/step)",
        "", "## By HLO category (self time)", "",
        "| category | ms/step | % of device |", "|---|---|---|"]
    for row in summary["categories"]:
        lines.append(f"| {row['category']} | {row['ms_per_step']:.3f} "
                     f"| {row['pct_device']:.1f}% |")
    lines += ["", "## Top ops (self time)", "",
              "| op | category | ms/step | % of device | calls | GB moved |",
              "|---|---|---|---|---|---|"]
    for row in summary["table"][:top]:
        lines.append(f"| `{row['op'][:48]}` | {row['category']} "
                     f"| {row['ms_per_step']:.3f} | {row['pct_device']:.1f}% "
                     f"| {row['calls']} | {row['gb_accessed']:.2f} |")
    return "\n".join(lines) + "\n"


def write_dossier(trace_root: str, steps: int, out_path: str,
                  title: str = "Profiler dossier") -> Optional[dict]:
    """Distill + write markdown (and a sibling .json); None if no device
    timeline (CPU runs)."""
    summary = distill_trace(trace_root, steps)
    if summary is None:
        return None
    with open(out_path, "w") as fh:
        fh.write(render_dossier(summary, title=title))
    with open(os.path.splitext(out_path)[0] + ".json", "w") as fh:
        json.dump(summary, fh, indent=1)
    return summary
