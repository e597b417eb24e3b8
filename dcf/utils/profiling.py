"""Tracing / profiling utilities (SURVEY.md aux subsystem 1).

Two tools shaped by this environment's tunneled-TPU runtime, where
`jax.block_until_ready` returns at enqueue and host fetches pay a ~25 ms
RPC round trip:

- `device_latency`: true per-execution device time via execution chaining
  (enqueue N calls back-to-back, fetch once; the slope between two chain
  lengths cancels both round-trip and enqueue overhead).
- `trace_op_table`: run one call under jax.profiler and aggregate the
  device-plane op durations from the Chrome trace, attributing HLO fusion
  names back to python source via the compiled HLO metadata.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import time
from typing import Callable, Dict, List, Optional, Tuple

import jax
import numpy as np


def device_latency(fn: Callable, args: tuple, n_small: int = 4,
                   n_big: int = 24, repeats: int = 3) -> float:
    """Median per-execution device time (seconds) of jitted `fn(*args)`.

    `fn` should return a small array (its fetch is the completion barrier).
    """
    out = fn(*args)
    np.asarray(jax.device_get(out))                  # compile + settle

    def chain(n: int) -> float:
        t0 = time.perf_counter()
        r = None
        for _ in range(n):
            r = fn(*args)
        jax.device_get(r)                            # waits for the queue
        return time.perf_counter() - t0

    chain(2)
    samples = []
    for _ in range(repeats):
        t_small = chain(n_small)
        t_big = chain(n_big)
        samples.append((t_big - t_small) / (n_big - n_small))
    return float(np.median(samples))


def hlo_source_map(compiled_text: str) -> Dict[str, Tuple[str, str]]:
    """HLO op name -> (op_name metadata, file:line).

    A fusion op often carries no metadata of its own (its root merged
    many traced ops); fall back to the majority source file inside its
    called fused computation so profiles don't report it as
    unattributed."""
    out = {}
    pat = (r"%?([\w.\-]+) = [^\n]*?metadata=\{op_name=\"([^\"]*)\""
           r"(?: source_file=\"([^\"]*)\" source_line=(\d+))?")
    for m in re.finditer(pat, compiled_text):
        src = f"{m.group(3)}:{m.group(4)}" if m.group(3) else ""
        out[m.group(1)] = (m.group(2), src)

    # fused-computation bodies: majority source file AND majority op_name
    # per computation (a fusion's own metadata often names only its root,
    # which may be a reshape/copy -- the body majority names the module)
    comp_srcs: Dict[str, collections.Counter] = {}
    comp_names: Dict[str, collections.Counter] = {}
    current = None
    for line in compiled_text.splitlines():
        head = re.match(r"\s*%?(fused_computation[\w.\-]*)\s*\(", line)
        if head:
            current = head.group(1)
            comp_srcs[current] = collections.Counter()
            comp_names[current] = collections.Counter()
        elif current is not None:
            if line.strip() == "}":
                current = None
            else:
                s = re.search(r'source_file="([^"]*)" source_line=(\d+)',
                              line)
                if s:
                    comp_srcs[current][f"{s.group(1)}:{s.group(2)}"] += 1
                n = re.search(r'op_name="([^"]*)"', line)
                if n:
                    comp_names[current][n.group(1)] += 1
    for m in re.finditer(
            r"%?([\w.\-]+) = [^\n]*?fusion\([^\n]*?calls=%?"
            r"(fused_computation[\w.\-]*)", compiled_text):
        op, comp = m.group(1), m.group(2)
        have_name, have_src = out.get(op, ("", ""))
        if have_name and have_src:
            continue
        counts = comp_srcs.get(comp)
        names = comp_names.get(comp)
        src = have_src or (counts.most_common(1)[0][0] if counts else "")
        nm = have_name or (names.most_common(1)[0][0] if names else "")
        if src or nm:
            out[op] = (nm, src)
    return out


def trace_op_table(fn: Callable, args: tuple, trace_dir: str,
                   top_k: int = 40,
                   compiled_text: Optional[str] = None
                   ) -> List[Tuple[float, str, str, str]]:
    """Profile one execution; return [(ms, hlo_op, op_name, source), ...]
    sorted by device time, attributed via `compiled_text` when given."""
    out = fn(*args)
    np.asarray(jax.device_get(out))                  # compile first
    jax.profiler.start_trace(trace_dir)
    np.asarray(jax.device_get(fn(*args)))
    jax.profiler.stop_trace()

    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz",
                             recursive=True))
    with gzip.open(files[-1]) as fh:
        tr = json.load(fh)
    events = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    agg: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
            agg[e["name"]] += e.get("dur", 0)
    meta = hlo_source_map(compiled_text) if compiled_text else {}
    table = []
    for name, dur in agg.most_common(top_k):
        op_name, src = meta.get(name, ("", ""))
        table.append((dur / 1000.0, name, op_name, src))
    return table
