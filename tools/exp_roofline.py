"""Analytic roofline for the deploy forward AND the train step: how
close is the measured latency to the hardware's speed of light?

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

--train extends the model to the full training step (reference hot loop
train.py:239-288): forward at batch size + BN batch stats, backward
(dX and dW convs: 2x the forward conv FLOPs; bytes re-read the saved
activation and the weights and write both gradients), the full-res loss
tail (log-softmax + weighted CE over (N, H, W, C) f32 logits for the
main and deepsup heads), the SGD-momentum/AdamW update (pure-bandwidth
passes over the f32 param/grad/momentum trees), and the EIC EMA.  The
fused byte model stays the optimistic bound: BN stat reduces and
normalize passes are charged zero extra (perfect fusion into producer /
consumer kernels) — the measured gap between this bound and the real
step is therefore an upper bound on what better fusion could recover.

Pure host-side analysis — runs anywhere, no TPU needed.

Usage: python tools/exp_roofline.py [--model deeplabv3] [--backbone
resnet101] [--hw 1025,2049] [--dtype-bytes 2] [--channel-cfg cfg.msgpack]
       python tools/exp_roofline.py --train [--batch 8] [--hw 769,769]
           [--backbone resnet50] [--optim sgd] [--prune 0.5]
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


def train_cost(graph, hw, node, dtype_bytes, batch):
    """(flops, fused_bytes) of one node for forward+backward at ``batch``.

    Convs: bwd = dX (full conv) + dW (full conv) -> 3x fwd FLOPs total.
    Fused bytes: fwd reads in+w, writes out (the activation IS saved for
    backward — that write is real in training); bwd reads the saved
    input (dW), the grad_out, and the weights (dX), writes grad_in and
    the weight grad: 2*in + out + 2*w on top of fwd.  Elementwise ops
    are free in both directions (optimistic fusion bound); pools and
    resizes pay their traffic twice (fwd + grad scatter)."""
    fwd_flops, fwd_bytes = node_cost(graph, hw, node, dtype_bytes)
    op = node.op
    if op == "conv":
        a = node.attrs
        w_bytes = (a["kernel"] ** 2) * (a["in_ch"] // a["groups"]) \
            * a["out_ch"] * dtype_bytes
        oh, ow = hw[node.name]
        from dcfp_tpu.utils.flops import _channels
        out_b = oh * ow * _channels(graph, node.name) * dtype_bytes
        in_b = fwd_bytes - out_b - w_bytes  # per-sample activation reads
        # weights are read ONCE per step, not once per sample — only the
        # activation traffic scales with batch (matches the bwd model,
        # which likewise charges 2*w_bytes once)
        fwd_flops = fwd_flops * batch
        fwd_bytes = batch * (in_b + out_b) + w_bytes
        bwd_flops = 2 * fwd_flops  # dX + dW, each a full conv
        bwd_bytes = batch * (2 * in_b + out_b) + 2 * w_bytes
    elif op in ELEMENTWISE:
        fwd_flops, fwd_bytes = fwd_flops * batch, fwd_bytes * batch
        bwd_flops, bwd_bytes = fwd_flops, 0
    else:  # pools / resizes / concat: grad pass mirrors the fwd traffic
        fwd_flops, fwd_bytes = fwd_flops * batch, fwd_bytes * batch
        bwd_flops, bwd_bytes = fwd_flops, fwd_bytes
    return fwd_flops + bwd_flops, fwd_bytes + bwd_bytes, fwd_flops, \
        fwd_bytes


def apply_width_flags(g, args):
    """Apply --prune (synthetic-EIC search, same recipe as bench.py) and
    --channel-cfg to the graph — shared by the train and deploy paths so
    both roofline the same pruned widths."""
    if args.prune:
        import jax
        import numpy as np
        from dcfp_tpu.graph.apply import init_graph
        from dcfp_tpu.prune.eic import prunable_bn_names
        from dcfp_tpu.prune.search import prune_to_flops
        params, state = init_graph(g, jax.random.key(0))
        # seed 0 = the same synthetic-EIC draw as bench.py and
        # exp_suffix.py, so rooflines line up with their measurements
        rng = np.random.default_rng(0)
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
    return g


def run_train(args):
    import json as _json
    from dcfp_tpu.graph.shapes import infer_shapes
    from dcfp_tpu.models.registry import build_model

    model = build_model(args.model, backbone=args.backbone,
                        backbone_para=_json.loads(args.backbone_para),
                        num_classes=args.num_classes, align_corner=True,
                        deepsup=True)
    g = apply_width_flags(model.graph, args)
    hw_in = tuple(int(x) for x in args.hw.split(","))
    hw = infer_shapes(g, hw_in)
    B = args.batch

    from dcfp_tpu.utils.flops import count_flops_params
    _, n_params = count_flops_params(g, hw_in)

    rows = []
    for node in g.toposorted():
        if node.op == "resize" and node.attrs.get("to_input"):
            # final upsamples run inside the fused channels-first loss
            # tail (engine/trainer.py) — charged by the loss rows below
            continue
        t_flops, t_bytes, f_flops, f_bytes = train_cost(
            g, hw, node, args.dtype_bytes, B)
        rows.append({"name": node.name, "op": node.op,
                     "flops": t_flops, "bytes": t_bytes,
                     "fwd_flops": f_flops, "fwd_bytes": f_bytes})

    # loss tail per head (main + deepsup): full-res f32 logits.  The
    # fused channels-first tail (ROADMAP round-3 win) upsamples the
    # low-res logits, log-softmaxes, gathers via one-hot reduce and
    # reduces — ~4 passes over (B, H, W, C) f32 fwd+bwd, ~30 flops/pixel.
    n_heads = 2  # pred + deepsup (both charged: ds_weight=0.4 recipe)
    hw_full = hw_in[0] * hw_in[1]
    loss_bytes = 4 * B * hw_full * args.num_classes * 4
    loss_flops = 2 * 30 * B * hw_full * args.num_classes
    for i in range(n_heads):
        rows.append({"name": f"loss.head{i}", "op": "loss",
                     "flops": loss_flops, "bytes": loss_bytes,
                     "fwd_flops": loss_flops // 2,
                     "fwd_bytes": loss_bytes // 2})

    # optimizer: f32 passes over the param tree.  SGD-momentum: read
    # p/g/m, write p/m = 5 passes; AdamW: read p/g/m/v, write p/m/v = 7.
    opt_passes = {"sgd": 5, "adamw": 7}[args.optim]
    rows.append({"name": "optimizer", "op": "opt", "flops": 4 * n_params,
                 "bytes": opt_passes * n_params * 4,
                 "fwd_flops": 0, "fwd_bytes": 0})
    # EIC EMA over BN scales: negligible but listed (dcfp_pruner.py:15-20)
    bn_ch = sum(n.attrs.get("channels", 0) for n in g.toposorted()
                if n.op == "bn")
    rows.append({"name": "eic", "op": "eic", "flops": 6 * bn_ch,
                 "bytes": 4 * bn_ch * 4, "fwd_flops": 0, "fwd_bytes": 0})

    def sol_ms(flops, byts):
        return max(flops / PEAK_FLOPS, byts / PEAK_BW) * 1e3

    fused = [r for r in rows if r["op"] not in ELEMENTWISE]
    total_flops = sum(r["flops"] for r in rows)
    total_bytes = sum(r["bytes"] for r in fused)
    sol = sum(sol_ms(r["flops"], r["bytes"]) for r in fused)
    sol_fwd = sum(sol_ms(r["fwd_flops"], r["fwd_bytes"]) for r in fused)
    fwd_flops = sum(r["fwd_flops"] for r in rows)

    print(f"TRAIN step: {args.model}/{args.backbone} hw={hw_in} "
          f"batch={B} deepsup dtype_bytes={args.dtype_bytes} "
          f"optim={args.optim} params={n_params/1e6:.1f}M")
    print(f"total: {total_flops/1e12:.2f} TFLOP "
          f"(fwd {fwd_flops/1e12:.2f}), {total_bytes/1e9:.2f} GB fused")
    print(f"speed-of-light (fused): TOTAL {sol:.1f} ms | "
          f"fwd+loss {sol_fwd:.1f} ms | bwd+opt {sol - sol_fwd:.1f} ms")
    print(f"pure-compute floor: {total_flops/PEAK_FLOPS*1e3:.1f} ms | "
          f"pure-bandwidth floor: {total_bytes/PEAK_BW*1e3:.1f} ms")

    def stage_of(name):
        parts = name.split(".")
        if parts[0] == "backbone":
            return "backbone." + parts[1]
        return parts[0]

    stages = {}
    for r in fused:
        s = stages.setdefault(stage_of(r["name"]),
                              {"sol": 0.0, "flops": 0, "bytes": 0})
        s["sol"] += sol_ms(r["flops"], r["bytes"])
        s["flops"] += r["flops"]
        s["bytes"] += r["bytes"]
    print("\nper-stage SOL, fwd+bwd (fused model):")
    for name, s in sorted(stages.items(), key=lambda kv: -kv[1]["sol"]):
        print(f"  {s['sol']:7.2f} ms  {name}  "
              f"({s['flops']/1e9:.0f} GFLOP, {s['bytes']/1e9:.2f} GB)")
    print(f"\ntop {args.top} nodes by SOL time (fused, fwd+bwd):")
    for r in sorted(fused,
                    key=lambda r: -sol_ms(r["flops"], r["bytes"])
                    )[:args.top]:
        print(f"  {sol_ms(r['flops'], r['bytes'])*1e3:9.1f} us  "
              f"{r['op']:9s} {r['name']}  "
              f"({r['flops']/1e9:.1f} GFLOP, {r['bytes']/1e6:.0f} MB)")
    return 0


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
    ap.add_argument("--train", action="store_true",
                    help="roofline the full train step (fwd+bwd+loss+"
                         "opt+EIC) instead of the deploy forward")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--optim", default="sgd", choices=["sgd", "adamw"])
    args = ap.parse_args(argv)
    if args.train:
        return run_train(args)

    from dcfp_tpu.graph.shapes import infer_shapes
    from dcfp_tpu.models.registry import build_model

    model = build_model(args.model, backbone=args.backbone,
                        backbone_para=json.loads(args.backbone_para),
                        num_classes=args.num_classes, align_corner=True,
                        deepsup=False)
    g = apply_width_flags(model.graph, args)

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
