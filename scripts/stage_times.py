"""Digest a Spark event log into per-stage wall/executor-time rows.

Measurement loop for scaling work: run any job with
SPARK_GRAFT_EVENTLOG=<dir>, then

    python scripts/stage_times.py <dir>/<app-id> [--top 25]

prints one row per stage (submitted order): wall span, summed task
executorRunTime, task count, GC, shuffle bytes — plus totals and the
serial gap (app wall not covered by any running stage), which is the
driver-side Amdahl term the scaling gate pays for.
"""
import json
import sys


def _open(path):
    """Accept a rolling-v2 event-log dir, a .zstd file, or plain text."""
    import io
    import os

    if os.path.isdir(path):
        names = [n for n in os.listdir(path) if n.startswith("events")]
        if not names:  # app dir containing eventlog_v2_* subdir
            sub = [n for n in os.listdir(path)
                   if n.startswith("eventlog_v2")]
            path = os.path.join(path, sub[0])
            names = [n for n in os.listdir(path) if n.startswith("events")]
        path = os.path.join(path, sorted(names)[0])
    if path.endswith(".zstd"):
        import pyarrow as pa
        return io.TextIOWrapper(
            pa.input_stream(path, compression="zstd"), encoding="utf-8")
    return open(path)


def main() -> None:
    path = sys.argv[1]
    top = int(sys.argv[2].split("=")[-1]) if len(sys.argv) > 2 else 30
    stages: dict = {}
    app_start = app_end = None
    for line in _open(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = {
                "sid": si["Stage ID"],
                "name": si["Stage Name"].split(" at ")[0],
                "ntask": si["Number of Tasks"],
                "sub": si.get("Submission Time"),
                "run_ms": 0, "gc_ms": 0, "sh_read": 0, "sh_write": 0,
                "ndone": 0, "comp": None,
            }
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            s = stages.get(si["Stage ID"])
            if s is not None:
                s["sub"] = si.get("Submission Time", s["sub"])
                s["comp"] = si.get("Completion Time")
        elif e == "SparkListenerTaskEnd":
            s = stages.get(ev["Stage ID"])
            m = ev.get("Task Metrics")
            if s is None or not m:
                continue
            s["ndone"] += 1
            s["run_ms"] += m.get("Executor Run Time", 0)
            s["gc_ms"] += m.get("JVM GC Time", 0)
            s["sh_read"] += (m.get("Shuffle Read Metrics", {})
                             .get("Remote Bytes Read", 0)
                             + m.get("Shuffle Read Metrics", {})
                             .get("Local Bytes Read", 0))
            s["sh_write"] += (m.get("Shuffle Write Metrics", {})
                              .get("Shuffle Bytes Written", 0))

    rows = [s for s in stages.values() if s["sub"] and s["comp"]]
    rows.sort(key=lambda s: s["sub"])
    total_run = sum(s["run_ms"] for s in rows) / 1e3
    # serial gap: app wall minus the union of [sub, comp] spans
    spans = sorted((s["sub"], s["comp"]) for s in rows)
    covered, cur_a, cur_b = 0, None, None
    for a, b in spans:
        if cur_b is None or a > cur_b:
            if cur_b is not None:
                covered += cur_b - cur_a
            cur_a, cur_b = a, b
        else:
            cur_b = max(cur_b, b)
    if cur_b is not None:
        covered += cur_b - cur_a
    wall = ((app_end - app_start) / 1e3
            if app_start and app_end else float("nan"))

    print(f"{'stage':>5} {'wall_s':>7} {'run_s':>8} {'gc_s':>6} "
          f"{'tasks':>5} {'shR_MB':>7} {'shW_MB':>7}  name")
    big = sorted(rows, key=lambda s: -s["run_ms"])[:top]
    bigset = {id(s) for s in big}
    for s in rows:
        if id(s) not in bigset:
            continue
        print(f"{s['sid']:>5} {(s['comp'] - s['sub']) / 1e3:>7.2f} "
              f"{s['run_ms'] / 1e3:>8.2f} {s['gc_ms'] / 1e3:>6.2f} "
              f"{s['ndone']:>5} {s['sh_read'] / 1e6:>7.1f} "
              f"{s['sh_write'] / 1e6:>7.1f}  {s['name']}")
    # aggregate by stage name
    by_name: dict = {}
    for s in rows:
        d = by_name.setdefault(s["name"], [0.0, 0.0, 0])
        d[0] += (s["comp"] - s["sub"]) / 1e3
        d[1] += s["run_ms"] / 1e3
        d[2] += 1
    print("\n== by stage name ==")
    for name, (w, rn, n) in sorted(by_name.items(), key=lambda kv: -kv[1][1]):
        print(f"  {name:34s} wall {w:8.2f}s  run {rn:8.2f}s  x{n}")
    print(f"\napp wall {wall:.2f}s | stage-covered {covered / 1e3:.2f}s | "
          f"serial gap {wall - covered / 1e3:.2f}s | "
          f"sum executorRunTime {total_run:.2f}s")


if __name__ == "__main__":
    main()
