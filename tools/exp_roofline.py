"""Analytic roofline for the deploy forward: how close is the measured
e2e latency to the hardware's speed of light?

Per node, speed-of-light time is max(FLOPs / peak_flops, HBM bytes /
peak_bw).  Two byte models bracket reality:

* fused    — elementwise ops (BN/relu/add/mul/sigmoid/dropout/identity)
             are free (fused into the producing conv's epilogue); convs,
             pools, resizes and concats pay their input+output+weight
             traffic once.  This is the optimistic bound XLA approaches
             with perfect fusion.
* unfused  — every node pays input+output traffic.  The pessimistic
             bound (no fusion at all).

The true machine sits between the two; compare against the measured
deploy latency (docs/ROADMAP.md: 23.4 ms pruned R101 @1025x2049 bf16,
~33 ms unpruned R50-path label forward).

Pure host-side analysis — runs anywhere, no TPU needed.

Usage: python tools/exp_roofline.py [--model deeplabv3] [--backbone
resnet101] [--hw 1025,2049] [--dtype-bytes 2] [--channel-cfg cfg.msgpack]
Env: DCFP_PEAK_TFLOPS (default 197, v5e bf16), DCFP_PEAK_GBS (819).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = float(os.environ.get("DCFP_PEAK_TFLOPS", "197")) * 1e12
PEAK_BW = float(os.environ.get("DCFP_PEAK_GBS", "819")) * 1e9

ELEMENTWISE = {"bn", "relu", "sigmoid", "add", "mul", "dropout",
               "identity", "barrier"}


def node_cost(graph, hw, node, dtype_bytes):
    """(flops, bytes_moved) for one node; elementwise byte cost reported
    separately so the two byte models can include/exclude it."""
    from dcfp_tpu.utils.flops import _channels

    op = node.op
    if op == "input":
        return 0, 0
    oh, ow = hw[node.name]
    out_ch = _channels(graph, node.name)
    out_bytes = oh * ow * out_ch * dtype_bytes
    in_bytes = 0
    for parent in node.inputs:
        ih, iw = hw[parent]
        in_bytes += ih * iw * _channels(graph, parent) * dtype_bytes

    flops = 0
    weight_bytes = 0
    if op == "conv":
        a = node.attrs
        flops = 2 * (a["kernel"] ** 2) * (a["in_ch"] // a["groups"]) \
            * a["out_ch"] * oh * ow
        weight_bytes = (a["kernel"] ** 2) * (a["in_ch"] // a["groups"]) \
            * a["out_ch"] * dtype_bytes
    elif op in ELEMENTWISE:
        flops = 2 * oh * ow * out_ch
    elif op in ("maxpool", "avgpool", "globalpool"):
        flops = in_bytes // dtype_bytes  # one op per input element
    elif op == "resize":
        flops = 8 * oh * ow * out_ch  # 4-tap bilinear: ~8 flops/output
    return flops, in_bytes + out_bytes + weight_bytes


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="deeplabv3")
    ap.add_argument("--backbone", default="resnet101")
    ap.add_argument("--backbone-para", default='{"os":8,"mg_unit":[1,2,4],'
                                               '"inplanes":128}')
    ap.add_argument("--num-classes", type=int, default=19)
    ap.add_argument("--hw", default="1025,2049")
    ap.add_argument("--dtype-bytes", type=int, default=2)
    ap.add_argument("--channel-cfg", default=None,
                    help="pruned widths to analyze (msgpack/pth)")
    ap.add_argument("--prune", type=float, default=0.0,
                    help="prune to this FLOPs ratio first with bench.py's "
                         "synthetic-EIC recipe (e.g. 0.5)")
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args(argv)

    from dcfp_tpu.graph.shapes import infer_shapes
    from dcfp_tpu.models.registry import build_model

    model = build_model(args.model, backbone=args.backbone,
                        backbone_para=json.loads(args.backbone_para),
                        num_classes=args.num_classes, align_corner=True,
                        deepsup=False)
    g = model.graph
    if args.prune:
        import jax
        import numpy as np
        from dcfp_tpu.graph.apply import init_graph
        from dcfp_tpu.prune.eic import prunable_bn_names
        from dcfp_tpu.prune.search import prune_to_flops
        params, state = init_graph(g, jax.random.key(0))
        rng = np.random.default_rng(7)
        eic = {bn: np.abs(rng.standard_normal(
            g.node(bn).attrs["channels"])).astype(np.float32)
            for bn in prunable_bn_names(g)}
        result, gp, report = prune_to_flops(
            g, g, params, state, eic, prune_ratio=1.0 - args.prune,
            layer_keep=0.02, except_start_keys=(), channel_align=128)
        g = result.graph
        print(f"pruned to flops_ratio={report['flops_ratio']:.3f} "
              f"(global_percent={gp:.2f}, channel_align=128)")
    if args.channel_cfg:
        from dcfp_tpu.prune.pruner import apply_channel_cfg
        from dcfp_tpu.utils.checkpoint import load_channel_cfg
        g = apply_channel_cfg(g, load_channel_cfg(args.channel_cfg))

    hw_in = tuple(int(x) for x in args.hw.split(","))
    hw = infer_shapes(g, hw_in)

    rows = []
    for node in g.toposorted():
        flops, bytes_all = node_cost(g, hw, node, args.dtype_bytes)
        t_flops = flops / PEAK_FLOPS
        t_bytes = bytes_all / PEAK_BW
        rows.append({
            "name": node.name, "op": node.op, "flops": flops,
            "bytes": bytes_all, "t_flops_us": t_flops * 1e6,
            "t_bytes_us": t_bytes * 1e6,
            "bound": "compute" if t_flops >= t_bytes else "memory",
            "sol_us": max(t_flops, t_bytes) * 1e6,
        })

    sol_unfused = sum(r["sol_us"] for r in rows) / 1e3
    fused = [r for r in rows if r["op"] not in ELEMENTWISE]
    # fused model: elementwise time vanishes into conv epilogues, but
    # their FLOPs still ride the VPU in parallel with the MXU — ignore
    sol_fused = sum(r["sol_us"] for r in fused) / 1e3
    total_flops = sum(r["flops"] for r in rows)
    total_bytes_f = sum(r["bytes"] for r in fused)

    print(f"model={args.model}/{args.backbone} hw={hw_in} "
          f"dtype_bytes={args.dtype_bytes} "
          f"peaks: {PEAK_FLOPS/1e12:.0f} TFLOP/s, {PEAK_BW/1e9:.0f} GB/s")
    print(f"total: {total_flops/1e12:.2f} TFLOP, "
          f"{total_bytes_f/1e9:.2f} GB (fused traffic)")
    print(f"speed-of-light: fused {sol_fused:.2f} ms | "
          f"unfused {sol_unfused:.2f} ms")
    print(f"pure-compute floor: {total_flops/PEAK_FLOPS*1e3:.2f} ms | "
          f"pure-bandwidth floor (fused): "
          f"{total_bytes_f/PEAK_BW*1e3:.2f} ms")
    mem_bound = sum(1 for r in fused if r["bound"] == "memory")
    print(f"{mem_bound}/{len(fused)} non-elementwise nodes are "
          f"memory-bound at these shapes")
    # per-stage aggregation, comparable to tools/exp_suffix.py segments
    def stage_of(name):
        parts = name.split(".")
        if parts[0] == "backbone":
            return "backbone." + parts[1]
        return parts[0]

    stages = {}
    for r in fused:
        s = stages.setdefault(stage_of(r["name"]),
                              {"sol_us": 0.0, "flops": 0, "bytes": 0})
        s["sol_us"] += r["sol_us"]
        s["flops"] += r["flops"]
        s["bytes"] += r["bytes"]
    print("\nper-stage SOL (fused model):")
    for name, s in sorted(stages.items(), key=lambda kv: -kv[1]["sol_us"]):
        print(f"  {s['sol_us']/1e3:7.2f} ms  {name}  "
              f"({s['flops']/1e9:.0f} GFLOP, {s['bytes']/1e9:.2f} GB)")

    print(f"\ntop {args.top} nodes by SOL time (fused model):")
    for r in sorted(fused, key=lambda r: -r["sol_us"])[:args.top]:
        print(f"  {r['sol_us']:9.1f} us  {r['bound']:7s} "
              f"{r['op']:9s} {r['name']}  "
              f"({r['flops']/1e9:.1f} GFLOP, {r['bytes']/1e6:.0f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
