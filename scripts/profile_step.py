"""Profile the fused MMSSL train chunk on the real TPU and attribute device
time to HLO fusions.

Reuses bench.py's dataset/config, runs one traced chunk under
jax.profiler.trace, then parses the perfetto trace (vm.trace.json.gz) and
prints the top ops by total device time with their HLO provenance.

Usage: python scripts/profile_step.py [trace_dir] [zoo_entry]

``zoo_entry`` (default ``mmssl`` = the Baby-scale flagship) is any
scripts/bench_zoo.py model name (mf/lightgcn/.../mmssl_tiktok/mmssl_sports);
the profiled Trainer is built by bench_zoo.build_trainer so the trace
measures exactly the benched program (incl. MMSSL_BENCH_OVERRIDES/_MESH).
"""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mmssl_trace"
    entry = sys.argv[2] if len(sys.argv) > 2 else "mmssl"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench_zoo

    tr, spd, _B = bench_zoo.build_trainer(entry)

    t0 = time.time()
    m = tr.train_chunk(0, spd)
    _ = float(np.asarray(m)[-1, 0])
    print(f"warmup {time.time()-t0:.1f}s", file=sys.stderr)

    with jax.profiler.trace(trace_dir):
        m = tr.train_chunk(spd, spd)
        _ = float(np.asarray(m)[-1, 0])

    # parse perfetto trace
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # Keep only device-lane events (TensorCore); host lanes have pid names
    pid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "Device" in n or "/device" in n}
    agg = defaultdict(lambda: [0.0, 0, ""])
    total = 0.0
    for e in events:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # ms
        name = e.get("name", "?")
        args = e.get("args", {}) or {}
        key = name
        agg[key][0] += dur
        agg[key][1] += 1
        if not agg[key][2]:
            agg[key][2] = str(args.get("long_name", args.get("tf_op", "")))[:160]
        total += dur
    print(f"\ntrace {path}\ntotal device-lane time: {total:.1f} ms over {spd} steps")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]
    for name, (dur, cnt, long_name) in rows:
        print(f"{dur:9.2f} ms {100*dur/max(total,1e-9):5.1f}% x{cnt:<5} {name[:70]}")
        if long_name:
            print(f"             {long_name}")


if __name__ == "__main__":
    main()
