"""Aggregate a jax.profiler trace into a per-op time report (no xprof UI).

Parses the perfetto trace.json.gz written by jax.profiler.start_trace and
sums durations of device-track events, grouped by a normalized op name
(fusion loop indices stripped), so kernel-level hot spots are visible from
the shell.

Usage: python tools/trace_report.py /tmp/trace_dir [top_n]
"""
import collections
import glob
import gzip
import json
import re
import sys


def load_events(trace_dir):
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace.json.gz under {trace_dir}"
    path = max(paths)  # latest
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return data["traceEvents"], path


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    events, path = load_events(trace_dir)

    # find process ids whose name suggests a device (TPU/accelerator)
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {pid for pid, name in proc_names.items()
                   if re.search(r"TPU|device|/device|XLA", name, re.I)}

    total = collections.Counter()
    count = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        # strip fusion numbering for grouping
        key = re.sub(r"\.\d+", "", name)
        key = re.sub(r"__\d+", "", key)
        total[key] += e["dur"]
        count[key] += 1

    grand = sum(total.values())
    print(f"trace: {path}")
    print(f"device tracks: {[proc_names[p] for p in device_pids] or 'ALL'}")
    print(f"total device-event time: {grand/1e3:.1f} ms (all iterations)")
    print(f"{'op group':60s} {'ms':>9s} {'%':>6s} {'n':>6s}")
    for key, dur in total.most_common(top_n):
        print(f"{key[:60]:60s} {dur/1e3:9.2f} {100*dur/grand:6.1f} "
              f"{count[key]:6d}")


if __name__ == "__main__":
    main()
