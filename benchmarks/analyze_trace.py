"""Summarize a jax.profiler device trace: top ops by device self time.

Reads the .xplane.pb written by jax.profiler.start_trace/stop_trace
(via profile_gnn.py --trace DIR or tpu.profile_dir) and prints a
per-op table straight from the XSpace proto — no tensorboard server.
The committed GNN roofline analysis (VERDICT r4 item 3) is produced
with this.

The installed tensorboard_plugin_profile's converter is ABI-mismatched
with the baked-in tensorflow, so this parses the XPlane proto directly
(tensorflow.tsl.profiler.protobuf.xplane_pb2, pure-python descriptors;
run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the default
upb runtime rejects the generated code).

Usage: python analyze_trace.py TRACE_DIR [top_n] [--by-line]
"""

import collections
import glob
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def find_xplane(trace_dir: str) -> str:
    hits = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                     recursive=True)
    if not hits:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    return max(hits, key=os.path.getmtime)  # newest run wins


def load_xspace(path: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def device_op_table(xs):
    """Aggregate XEvents on device planes (TPU/accelerator) by op
    name: {op: [total_us, count]} per plane. Host planes are skipped —
    the hot-loop question is device self time."""
    tables = {}
    for plane in xs.planes:
        name = plane.name
        # device planes: "/device:TPU:0" / "TPU:0" / gpu streams; the
        # CPU-backend trace calls its device plane "/host:CPU" lines w/
        # XLA modules — keep anything that is not pure python/host
        # bookkeeping so the analyzer works on both backends.
        lower = name.lower()
        if "tpu" not in lower and "gpu" not in lower and \
                "device" not in lower:
            continue
        md = plane.event_metadata
        agg = collections.defaultdict(lambda: [0.0, 0])
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step/module lines would
            # double count
            if "step" in lname or "module" in lname:
                continue
            for ev in line.events:
                op = md[ev.metadata_id].name if ev.metadata_id in md \
                    else str(ev.metadata_id)
                rec = agg[op]
                rec[0] += ev.duration_ps / 1e6  # ps -> us
                rec[1] += 1
        if agg:
            tables[name] = agg
    return tables


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    trace_dir = args[0]
    top_n = int(args[1]) if len(args) > 1 else 30
    xp = find_xplane(trace_dir)
    print(f"# {xp}", file=sys.stderr)
    xs = load_xspace(xp)
    tables = device_op_table(xs)
    if not tables:
        print("no device planes found; planes were:", file=sys.stderr)
        for plane in xs.planes:
            print(f"  {plane.name}: lines="
                  f"{[line.name for line in plane.lines][:8]}",
                  file=sys.stderr)
        return
    for plane_name, agg in tables.items():
        rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
        total = sum(v[0] for _, v in rows)
        print(f"== {plane_name} (total {total / 1e3:.2f} ms across "
              f"{sum(v[1] for _, v in rows)} events)")
        print(f"{'self_us':>12} {'pct':>6} {'count':>7}  op")
        for op, (us, n) in rows[:top_n]:
            print(f"{us:12.0f} {100.0 * us / max(total, 1e-9):6.1f} "
                  f"{n:7d}  {op[:110]}")


if __name__ == "__main__":
    main()
