"""Device-trace analysis: turn a jax.profiler capture into a ranked report.

The reference's only runtime observability is a sec/batch print
(reference: mcat/main.py:63-68). This framework captures real device traces
(train/logging.py::profile_trace, ``cli train --profile-dir``); this module
makes them readable WITHOUT TensorBoard: parse the chrome-trace export jax
writes, aggregate per-op device time, busy-union occupancy, and a category
breakdown (matmuls / fusions / data movement / rng / tail), and format a
ranked table. Exposed as ``cli profile``, which trains a couple of epochs
(the first untraced, so compile + cache upload stay out of the numbers) and
prints the report.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict
from typing import Any, Dict, List, Optional, Tuple


def _category(name: str) -> str:
    low = name.lower()
    if low.startswith(("convolution", "dot")):
        return "matmul"
    if low.startswith("custom-call"):
        # Pallas kernels (e.g. the row-gather copy kernel) lower as TPU
        # custom calls — their own bucket, NOT matmul: the headline custom
        # call in this framework is pure data movement
        return "custom-call (pallas)"
    # both spellings appear in traces: HLO instruction names use dashes
    # (dynamic-update-slice.3), fusion names use underscores
    # (dynamic_update_slice, bitcast_concatenate_fusion)
    if low.startswith(("copy", "slice", "dynamic-update-slice",
                       "dynamic_update_slice", "dynamic-slice", "reshape",
                       "bitcast", "transpose", "broadcast", "concatenate",
                       "pad")):
        return "data movement"
    if "rng" in low:
        return "rng"
    if "fusion" in low:
        return "fusion"
    if low.startswith(("all-reduce", "all-gather", "reduce-scatter",
                       "collective", "psum", "send", "recv")):
        return "collective"
    return "other"


def _load_events(trace_dir: str) -> Tuple[Dict[int, str], Dict[int, list]]:
    """Read every ``*.trace.json.gz`` under ``trace_dir`` (jax writes them to
    ``plugins/profile/<timestamp>/``; the newest run wins if several exist).
    Returns (pid -> process name, pid -> complete-events)."""
    runs = sorted(glob.glob(os.path.join(trace_dir, "plugins", "profile", "*")))
    search_root = runs[-1] if runs else trace_dir
    paths = glob.glob(os.path.join(search_root, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        raise FileNotFoundError(
            f"no *.trace.json.gz under {trace_dir} — was the trace captured "
            "with jax.profiler (profile_trace / --profile-dir)?"
        )
    meta: Dict[int, str] = {}
    events: Dict[int, list] = defaultdict(list)
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                meta[e["pid"]] = e.get("args", {}).get("name", "")
            elif e.get("ph") == "X":
                events[e["pid"]].append(e)
    return meta, events


def _busy_union_us(evs: List[dict]) -> float:
    """Total wall time covered by >=1 event (merged intervals), in us."""
    spans = sorted((e["ts"], e["ts"] + e.get("dur", 0)) for e in evs if e.get("dur"))
    busy = 0.0
    cur_s = cur_e = None
    for s, t in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                busy += cur_e - cur_s
            cur_s, cur_e = s, t
        else:
            cur_e = max(cur_e, t)
    if cur_e is not None:
        busy += cur_e - cur_s
    return busy


def parse_trace(trace_dir: str, steps: Optional[int] = None) -> Dict[str, Any]:
    """Aggregate the device track of a jax chrome trace.

    Returns a summary dict: per-op totals ranked by device time, category
    breakdown, busy-union occupancy over the traced wall span, and (with
    ``steps``) per-step normalization. Falls back to the busiest track when
    no ``/device:`` process exists (CPU-backend traces)."""
    meta, events = _load_events(trace_dir)
    dev_pids = [
        pid for pid, name in meta.items()
        if name.startswith("/device:") and "CPU" not in name
        and events.get(pid)  # e.g. "/device:CUSTOM:Megascale Trace" is empty
    ]
    fallback = False
    if not dev_pids:
        # CPU backend: jax still emits per-device tracks named /device:CPU or
        # only host TraceMe tracks; rank whatever track has the most events.
        fallback = True
        candidates = [pid for pid in events if events[pid]]
        dev_pids = sorted(candidates, key=lambda p: -len(events[p]))[:1]
    evs: List[dict] = []
    for pid in dev_pids:
        evs.extend(events[pid])
    # Aggregate SELF time (duration minus nested children): executable/step
    # containers — jit_<fn>, while-loop frames, numeric step markers,
    # host-side TraceMe wrappers — enclose the real ops on the same thread
    # track, so raw durations would double-count every nesting level. A
    # per-(tid) interval stack attributes each span only the time not
    # covered by its children, container-name-agnostic.
    tot: Dict[str, float] = defaultdict(float)
    cnt: Dict[str, int] = defaultdict(int)
    by_tid: Dict[Any, List[dict]] = defaultdict(list)
    for e in evs:
        by_tid[(e.get("pid"), e.get("tid"))].append(e)
    for track in by_tid.values():
        # sort by start asc, then duration desc: parents come before children
        track.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack: List[dict] = []  # enclosing spans, each with _child accumulator
        for e in track:
            dur = e.get("dur", 0)
            end = e["ts"] + dur
            while stack and e["ts"] >= stack[-1]["_end"] - 1e-9:
                done = stack.pop()
                self_us = max(done["_dur"] - done["_child"], 0.0)
                tot[done["_name"]] += self_us
                cnt[done["_name"]] += 1
            if stack:
                stack[-1]["_child"] += dur
            stack.append({"_name": e["name"], "_end": end, "_dur": dur, "_child": 0.0})
        while stack:
            done = stack.pop()
            self_us = max(done["_dur"] - done["_child"], 0.0)
            tot[done["_name"]] += self_us
            cnt[done["_name"]] += 1
    # pure containers contribute ~0 self time and drop out of the ranking;
    # suppress the residual known wrapper names entirely so their scheduling
    # slack does not show up as fake op time.
    for name in list(tot):
        if name.startswith(("jit_", "pjit", "while", "$", "ThunkExecutor", "PjitFunction")) or name.isdigit():
            del tot[name], cnt[name]
    ops = sorted(
        ({"name": k, "total_us": v, "count": cnt[k], "category": _category(k)}
         for k, v in tot.items()),
        key=lambda r: -r["total_us"],
    )
    cats: Dict[str, float] = defaultdict(float)
    for r in ops:
        cats[r["category"]] += r["total_us"]
    op_us = sum(r["total_us"] for r in ops)
    tail = [r for r in ops if steps and r["total_us"] / steps < 3.0]
    spans = [e for e in evs if e.get("dur")]
    wall_us = (
        max(e["ts"] + e["dur"] for e in spans) - min(e["ts"] for e in spans)
        if spans else 0.0
    )
    return {
        "tracks": {pid: meta.get(pid, "?") for pid in dev_pids},
        "fallback_track": fallback,
        "ops": ops,
        "categories": dict(sorted(cats.items(), key=lambda kv: -kv[1])),
        "total_op_us": op_us,
        "busy_union_us": _busy_union_us(spans),
        "wall_us": wall_us,
        "steps": steps,
        "tail_op_count": len(tail),
        "tail_us": sum(r["total_us"] for r in tail),
    }


def format_report(summary: Dict[str, Any], top: int = 25) -> str:
    """Human-readable ranked report for :func:`parse_trace` output."""
    steps = summary.get("steps")
    div = steps or 1
    unit = "us/step" if steps else "us total"
    lines = []
    tracks = ", ".join(f"{name} (pid {pid})" for pid, name in summary["tracks"].items())
    lines.append(f"trace tracks: {tracks}"
                 + ("  [no device track — busiest track shown]" if summary["fallback_track"] else ""))
    op_ms = summary["total_op_us"] / 1e3
    lines.append(
        f"device op-time {op_ms:.2f} ms"
        + (f"  ({summary['total_op_us'] / div:.1f} us/step over {steps} steps)" if steps else "")
    )
    if summary["wall_us"]:
        occ = 100.0 * summary["busy_union_us"] / summary["wall_us"]
        lines.append(
            f"occupancy {occ:.1f}% (busy-union {summary['busy_union_us']/1e3:.2f} ms"
            f" / traced span {summary['wall_us']/1e3:.2f} ms)"
        )
    lines.append("categories: " + "  ".join(
        f"{k} {v / div:.1f}" for k, v in summary["categories"].items()
    ) + f"  [{unit}]")
    if steps:
        lines.append(
            f"sub-3us/step tail: {summary['tail_op_count']} distinct ops,"
            f" {summary['tail_us'] / div:.1f} us/step"
        )
    lines.append("")
    lines.append(f"{'rank':>4}  {unit:>12}  {'count':>7}  {'category':<14} op")
    for i, r in enumerate(summary["ops"][:top], 1):
        lines.append(
            f"{i:>4}  {r['total_us'] / div:>12.2f}  {r['count']:>7}  "
            f"{r['category']:<14} {r['name'][:100]}"
        )
    return "\n".join(lines)


def profile_training(
    trainer, trace_dir: str, epochs: int = 1, top: int = 25, verbose: bool = True
) -> Dict[str, Any]:
    """Run one UNtraced warmup epoch (compile + device-cache upload), then
    trace ``epochs`` training epochs into ``trace_dir`` and parse them.
    Returns the :func:`parse_trace` summary (also pretty-printed when
    ``verbose``)."""
    from multimodal_path_omic_tpu.train.logging import profile_trace

    trainer.train_epoch(0)  # compile + cache build, outside the trace
    n_steps = 0
    with profile_trace(trace_dir):
        for e in range(1, 1 + epochs):
            trainer.train_epoch(e)
            n_steps += getattr(trainer, "last_epoch_steps", 0)
    n_steps = n_steps or None
    summary = parse_trace(trace_dir, steps=n_steps)
    if verbose:
        print(format_report(summary, top=top))
    return summary
