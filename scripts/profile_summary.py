"""Summarize a jax.profiler TPU trace (xplane.pb) per-op and per-category.

The reference has no profiling tooling at all (its Trainer just logs
steps); this framework captures device traces via `jax.profiler`
(utils/profiling.py window in the Trainer, `bench.py --profile_dir`) and
this script answers "where did the device time go" without TensorBoard —
the tensorboard_plugin_profile converter in this image is broken
(protobuf codegen mismatch), so we parse the XSpace proto directly. The
schema below is the stable tensorflow/core/profiler xplane.proto; the
generated module is cached next to this script via `protoc`.

Usage:
    python scripts/profile_summary.py /tmp/prof/b16 [--calls 5] [--top 20]

Finds the newest */plugins/profile/*/\\*.xplane.pb under the given dir.
Durations are reported in ms per call (--calls divides the totals, for
traces that captured N identical timed calls).
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import subprocess
import sys

XPLANE_PROTO = """
syntax = "proto3";
package ns2vc_profiler;
message XSpace { repeated XPlane planes = 1; }
message XPlane {
  int64 id = 1;
  string name = 2;
  repeated XLine lines = 3;
  map<int64, XEventMetadata> event_metadata = 4;
  map<int64, XStatMetadata> stat_metadata = 5;
  repeated XStat stats = 6;
}
message XLine {
  int64 id = 1;
  int64 display_id = 10;
  string name = 2;
  string display_name = 11;
  int64 timestamp_ns = 3;
  int64 duration_ps = 9;
  repeated XEvent events = 4;
}
message XEvent {
  int64 metadata_id = 1;
  oneof data { int64 offset_ps = 2; int64 num_occurrences = 5; }
  int64 duration_ps = 3;
  repeated XStat stats = 4;
}
message XStat {
  int64 metadata_id = 1;
  oneof value {
    double double_value = 2;
    uint64 uint64_value = 3;
    int64 int64_value = 4;
    string str_value = 5;
    bytes bytes_value = 6;
    uint64 ref_value = 7;
  }
}
message XEventMetadata {
  int64 id = 1;
  string name = 2;
  bytes metadata = 3;
  string display_name = 4;
  repeated XStat stats = 5;
  repeated int64 child_id = 6;
}
message XStatMetadata { int64 id = 1; string name = 2; string description = 3; }
"""


def _load_pb2():
    """protoc-compile the xplane schema into a cached module."""
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".xplane_gen")
    src = os.path.join(cache, "ns2vc_xplane.proto")
    gen = os.path.join(cache, "ns2vc_xplane_pb2.py")
    if not os.path.exists(gen):
        os.makedirs(cache, exist_ok=True)
        with open(src, "w") as f:
            f.write(XPLANE_PROTO)
        subprocess.run(["protoc", f"-I{cache}", f"--python_out={cache}",
                        src], check=True)
    sys.path.insert(0, cache)
    import ns2vc_xplane_pb2

    return ns2vc_xplane_pb2


def categorize(name: str) -> str:
    # Classify by the DEFINING instruction only (the text before " = ").
    # The full xplane op string includes operand references like
    # "fusion(%copy-done.3, ...)", so substring-matching the whole line
    # misattributes every consumer of an async copy to the copy category
    # (measured: that inflated "async copies/slices" from 5% to 55% of a
    # train step).
    head = name.split(" = ", 1)[0]
    if "convolution" in head or re.search(r"fusion\.\d+\.convolution",
                                          head):
        return "convolution"
    if ("copy-start" in head or "copy-done" in head
            or "copy." in head or head.endswith("copy")):
        return "async copies"
    if "custom-call" in name and "tpu_custom_call" in name:
        return "pallas kernels"
    if re.match(r"%dot", head):
        return "dot (matmul)"
    if "fusion" in head:
        # classify by the OUTPUT tuple only (text up to the operand list):
        # any 4-D result marks an attention-probs/softmax fusion
        outputs = name.split(" fusion(", 1)[0]
        if re.search(r"\[\d+,\d+,\d+,\d+\]", outputs):
            return "attention fusions (4-D)"
        # a rank-2 operand with both dims >= 128 is a weight matrix: the
        # fusion is an XLA output-fusion AROUND A DOT (e.g. the UNet FF
        # family: GEGLU elementwise -> down-proj dot -> bias+residual
        # adds, fused as one `add_add_fusion`). Round-3 finding: these
        # are 74 of the "100 ms elementwise" in the B=16 synth profile —
        # the program is matmul-output-fusion bound, not pure-elementwise
        # bound. (>= 128 keeps (B, C) FiLM broadcasts, B <= 64, out.)
        operands = name.split(" fusion(", 1)[1] if " fusion(" in name else ""
        if any(int(a) >= 128 and int(b) >= 128
               for a, b in re.findall(r"\[(\d+),(\d+)\]\{", operands)):
            return "dot output-fusions"
        # rank-2 OUTPUT with both dims >= 128 = a weight-gradient dot
        # (dL/dW: two rank-3 operands contracted over batch*time)
        if any(int(a) >= 128 and int(b) >= 128
               for a, b in re.findall(r"\[(\d+),(\d+)\]\{", outputs)):
            return "dot output-fusions"
        if "reduce" in head:
            return "norm-stat reduce fusions"
        return "elementwise fusions"
    if "dynamic-update-slice" in head or "dynamic-slice" in head:
        return "dynamic slices"
    if "slice" in head:
        return "slices"
    return "misc"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--calls", type=int, default=1,
                    help="divide totals by this (number of timed calls)")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    pbs = sorted(glob.glob(os.path.join(
        args.trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not pbs:
        sys.exit(f"no *.xplane.pb under {args.trace_dir}")
    pb2 = _load_pb2()
    xs = pb2.XSpace()
    xs.ParseFromString(open(pbs[-1], "rb").read())

    plane = next((p for p in xs.planes if "TPU" in p.name.upper()), None)
    if plane is None:
        sys.exit(f"no TPU plane in {pbs[-1]} "
                 f"(planes: {[p.name for p in xs.planes]})")
    md = plane.event_metadata
    line = next((l for l in plane.lines if l.name == "XLA Ops"), None)
    if line is None:
        sys.exit(f"no 'XLA Ops' line (lines: "
                 f"{[l.name for l in plane.lines]})")

    per_op = collections.defaultdict(float)
    per_cat = collections.defaultdict(float)
    count = collections.defaultdict(int)
    total = 0.0
    for e in line.events:
        name = md[e.metadata_id].name
        if name.startswith("%while") or "jit_" in name:
            continue  # containers double-count their bodies
        d = e.duration_ps / 1e9 / args.calls
        per_op[name] += d
        count[name] += 1
        per_cat[categorize(name)] += d
        total += d

    print(f"trace: {pbs[-1]}")
    print(f"device leaf-op total: {total:.1f} ms/call "
          f"({len(per_op)} distinct ops)\n")
    print("by category:")
    for cat, d in sorted(per_cat.items(), key=lambda kv: -kv[1]):
        print(f"  {d:9.2f} ms  {100 * d / max(total, 1e-9):5.1f}%  {cat}")
    print(f"\ntop {args.top} ops:")
    for name, d in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"  {d:9.2f} ms  x{count[name]:<6d} {name[:100]}")


if __name__ == "__main__":
    main()
