"""Worker for the 2-process x 2-device CPU multi-process test
(launched by tests/test_multiprocess.py, NOT collected by pytest).

Each process owns 2 virtual CPU devices; together they form a
4-device 'data' mesh.  The worker:

* initializes the multi-host runtime (parallel.distributed.initialize —
  the reference engine.py:38-46 analog);
* feeds its LOCAL slice of a deterministic global batch through
  mesh.shard_batch (jax.make_array_from_process_local_data path);
* runs train steps (ce + EIC) over the global mesh and checks the
  distributed loss/params/EIC against an UNSHARDED local recomputation
  on the full global batch — data-parallel SPMD must be numerically a
  batch-mean, so the two agree;
* exercises allreduce_confusion across processes
  (reference evaluate.py:370-372);
* runs a distributed PIPELINED eval (device-resident confusion through
  the ms+flip device path) and a distributed --use-aot ss eval through a
  serialized executable, each checked bit-exact against a local
  recomputation over the full image set.

Writes 'OK' (or the failure) to <outdir>/proc<id>.txt.
"""

import os
import sys


def main() -> int:
    port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # replace (not append): the parent test session's XLA_FLAGS pin a
    # different virtual device count
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import numpy as np
    import jax
    import jax.numpy as jnp

    from dcfp_tpu.parallel import distributed
    from dcfp_tpu.parallel.mesh import replicate_tree, shard_batch

    distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()

    from dcfp_tpu.engine.evaluator import allreduce_confusion
    from dcfp_tpu.engine.optim import build_optimizer
    from dcfp_tpu.engine.trainer import create_train_state, make_train_step
    from dcfp_tpu.losses.criteria import build_criterions
    from dcfp_tpu.graph.apply import init_graph
    from dcfp_tpu.models.registry import build_model
    from dcfp_tpu.parallel.distributed import (create_pod_mesh,
                                               process_batch_slice)

    model = build_model("simple", backbone="resnet50",
                        backbone_para={"os": 32, "mg_unit": [1, 1, 1],
                                       "inplanes": 64},
                        num_classes=5, align_corner=False, deepsup=False)
    params, bn = init_graph(model.graph, jax.random.key(0))
    # host snapshot of the initial weights: the train step donates its
    # state buffers, which would delete the original device arrays
    params0 = jax.tree.map(np.asarray, params)
    tx = build_optimizer(optim="sgd", learning_rate=0.01, momentum=0.9,
                         weight_decay=5e-4, num_steps=10, power=0.9,
                         warmup=0)
    crit = build_criterions("ce", ignore_label=255)
    step = make_train_step(model, crit, tx)

    # deterministic GLOBAL batches; every process derives the same ones
    r = np.random.default_rng(0)
    n_steps, gb = 3, 4
    batches = []
    for _ in range(n_steps):
        img = r.standard_normal((gb, 33, 33, 3)).astype(np.float32) * 0.5
        lab = r.integers(0, 5, (gb, 33, 33)).astype(np.int32)
        lab[r.random((gb, 33, 33)) < 0.1] = 255
        batches.append({"img": img, "label": lab})

    mesh = create_pod_mesh(n_spatial=1)
    assert mesh.devices.size == 4

    # ---- distributed run: local slice in, SPMD over the global mesh ----
    state = create_train_state(model, params, bn, tx, prune_type="dcfp")
    state = replicate_tree(mesh, state)
    sl = process_batch_slice(gb)
    dist_losses, state1 = [], None
    for i, b in enumerate(batches):
        local = {"img": b["img"][sl], "label": b["label"][sl]}
        sharded = shard_batch(mesh, local, spatial=False)
        state, m = step(state, sharded, jax.random.key(0))
        dist_losses.append(float(m["loss"]))
        if i == 0:
            state1 = jax.tree.map(np.asarray, state)

    # ---- unsharded local recomputation on the full global batch --------
    state_ref = create_train_state(model, params, bn, tx,
                                   prune_type="dcfp")
    ref_losses, ref1 = [], None
    for i, b in enumerate(batches):
        state_ref, m = step(state_ref,
                            {"img": jnp.asarray(b["img"]),
                             "label": jnp.asarray(b["label"])},
                            jax.random.key(0))
        ref_losses.append(float(m["loss"]))
        if i == 0:
            ref1 = jax.tree.map(np.asarray, state_ref)

    # step 0 is a pure forward from identical weights: tight; later
    # steps compound f32 accumulation-order noise chaotically through BN
    # stats (see tests/test_dynamics.py) — loose but behavioral bound
    np.testing.assert_allclose(dist_losses[0], ref_losses[0], rtol=1e-5,
                               err_msg="step-0 distributed loss")
    np.testing.assert_allclose(dist_losses, ref_losses, rtol=2e-2,
                               err_msg="distributed loss trajectory")
    # state after ONE step: the update VECTORS (step1 - init) of the two
    # runs must point the same way.  Elementwise equality is unattainable
    # for early-layer gradients (large cancellation sums whose f32
    # rounding depends on the reduction layout — see test_dynamics), so
    # compare direction, like the reference-parity dynamics golden.
    for name in ["backbone.conv1.0", "backbone.layer2.0.conv1"]:
        d_got = (np.asarray(state1.params[name]["kernel"], np.float64)
                 - np.asarray(params0[name]["kernel"], np.float64)).ravel()
        d_want = (np.asarray(ref1.params[name]["kernel"], np.float64)
                  - np.asarray(params0[name]["kernel"],
                               np.float64)).ravel()
        cos = float(d_got @ d_want /
                    (np.linalg.norm(d_got) * np.linalg.norm(d_want)
                     + 1e-30))
        assert cos > 0.95, f"update direction at {name}: cos={cos:.4f}"
    # EIC ranking agreement (what the scores exist for)
    eic_name = "backbone.layer2.0.bn1"
    got = np.asarray(state1.eic[eic_name], np.float64)
    want = np.asarray(ref1.eic[eic_name], np.float64)
    corr = float(np.corrcoef(got, want)[0, 1])
    assert corr > 0.95, f"eic corr {corr:.4f}"
    bn_name = "backbone.bn1"
    np.testing.assert_allclose(np.asarray(state1.bn_state[bn_name]["mean"]),
                               np.asarray(ref1.bn_state[bn_name]["mean"]),
                               rtol=1e-3, atol=1e-6)

    # ---- multi-process confusion reduction -----------------------------
    full = np.arange(16, dtype=np.float64).reshape(4, 4)
    partial = full * 0.25 + (0.25 if pid == 1 else -0.25)
    summed = allreduce_confusion(partial)
    want = 2 * (full * 0.25)  # the +/-0.25 halves cancel
    np.testing.assert_allclose(summed, want, rtol=1e-12,
                               err_msg="allreduce_confusion mismatch")

    # ---- compact-batch 2-D arrays assemble over 'data', not replicated -
    # 'pad' triples and 'weight_class' vectors are per-image: each process
    # holds different rows, so a replicated spec would mis-assemble the
    # global array (or get the global shape wrong entirely)
    g_pad = np.arange(gb * 3, dtype=np.int32).reshape(gb, 3)
    g_wc = np.arange(gb * 6, dtype=np.float32).reshape(gb, 6)
    compact = {"img": batches[0]["img"][sl],
               "label": {"ori": batches[0]["label"][sl],
                         "weight_class": g_wc[sl]},
               "pad": g_pad[sl]}
    sharded_c = shard_batch(mesh, compact, spatial=False)
    for arr, want in ((sharded_c["pad"], g_pad),
                      (sharded_c["label"]["weight_class"], g_wc)):
        assert arr.shape == want.shape, (arr.shape, want.shape)
        for shard in arr.addressable_shards:
            np.testing.assert_array_equal(np.asarray(shard.data),
                                          want[shard.index])

    # ---- distributed PIPELINED eval: device-resident confusion halves
    # reduced across processes (_finalize_eval -> allreduce_confusion,
    # reference evaluate.py:370-372), through the ms+flip device path
    # (predict_multiscale, reference evaluate.py:198-227).  The reduced
    # global confusion must equal a local recomputation over ALL images
    # through the identical device path, bit for bit.
    from dcfp_tpu.engine.deploy import (export_serialized_split,
                                        load_serialized,
                                        make_split_inference_fn)
    from dcfp_tpu.engine.evaluator import (Predictor, confusion_matrix,
                                           evaluate_pipelined)

    p_ev, bn_ev = init_graph(model.graph, jax.random.key(2))
    ev_imgs = r.standard_normal((4, 33, 33, 3)).astype(np.float32) * 0.5
    ev_labs = r.integers(0, 5, (4, 33, 33)).astype(np.int32)
    ev_labs[r.random((4, 33, 33)) < 0.1] = 255
    esl = slice(pid * 2, pid * 2 + 2)
    loader = [{"img": ev_imgs[i:i + 1], "label": ev_labs[i:i + 1]}
              for i in range(esl.start, esl.stop)]

    # scales (1.0,) + flip forces the predict_multiscale accumulation
    # path (flip disables the ss fast path) WITHOUT compiling a second
    # scale shape — each extra compile costs ~1 min/process on the
    # suite's 1-core hosts and the scale-resize math is already
    # golden-tested single-process (test_evaluator.py)
    predictor = Predictor(model.graph, p_ev, bn_ev)
    res = evaluate_pipelined(predictor, loader, num_classes=5,
                             whole=True, scales=(1.0,), flip=True,
                             fps_warmup=0)
    cm_ref = np.zeros((5, 5), np.float64)
    for i in range(4):
        out = predictor.predict_multiscale(
            jnp.asarray(ev_imgs[i:i + 1]), (769, 769), (1.0,), 5,
            True, False, True)
        cm_ref += confusion_matrix(ev_labs[i:i + 1], np.asarray(out), 5,
                                   255)
    np.testing.assert_array_equal(res["confusion"], cm_ref,
                                  err_msg="distributed pipelined ms+flip")

    # ---- --use-aot serving under the cluster: each process serves its
    # split through a serialized argmax executable (the --use-trt analog,
    # reference evaluate.py:273-276); the cross-process confusion must
    # equal a local recomputation through the SAME executable
    body_fn, tail_fn, dev_p = make_split_inference_fn(
        model.graph, p_ev, bn_ev, dtype=jnp.float32, fold_bn=True,
        output="argmax", input_format="nhwc")
    aot_path = os.path.join(outdir, f"model_p{pid}.stablehlo")
    export_serialized_split(body_fn, tail_fn, dev_p, (1, 33, 33, 3),
                            aot_path)
    run = load_serialized(aot_path)
    predictor_aot = Predictor(model.graph, p_ev, bn_ev)
    predictor_aot.use_aot_whole(run, dev_p)
    res_aot = evaluate_pipelined(predictor_aot, loader, num_classes=5,
                                 whole=True, scales=(1.0,), flip=False,
                                 fps_warmup=0)
    cm_aot = np.zeros((5, 5), np.float64)
    for i in range(4):
        out = predictor_aot.predict_whole_labels(
            jnp.asarray(ev_imgs[i:i + 1]))
        cm_aot += confusion_matrix(ev_labs[i:i + 1], np.asarray(out), 5,
                                   255)
    np.testing.assert_array_equal(res_aot["confusion"], cm_aot,
                                  err_msg="distributed --use-aot ss")

    # ---- preemption consensus: SIGTERM to ONE rank only ----------------
    # A signal landing on a single rank must not desert the SPMD program
    # (peers would block in the next collective); TrainLoop agrees on
    # stopping via process_allgather at log boundaries, so BOTH ranks
    # snapshot and stop at the SAME step.
    import signal as _signal
    from dcfp_tpu.engine.trainer import TrainLoop
    snap_steps = []
    loop = TrainLoop(model=model, criterion=crit, tx=tx, num_steps=12,
                     lr_schedule=lambda s: jnp.asarray(0.01),
                     save_pred_every=10 ** 9, save_steps=10 ** 9,
                     snapshot_hook=lambda st, s: snap_steps.append(s),
                     log_every=2, handle_signals=True)

    def gen():
        i = 0
        while True:
            b = batches[i % len(batches)]
            local = {"img": b["img"][sl], "label": b["label"][sl]}
            if i == 3 and pid == 1:  # mid-run, rank 1 ONLY
                os.kill(os.getpid(), _signal.SIGTERM)
            yield shard_batch(mesh, local, spatial=False)
            i += 1

    params2, bn2 = init_graph(model.graph, jax.random.key(0))
    state2 = replicate_tree(mesh, create_train_state(model, params2, bn2,
                                                     tx))
    loop.run(state2, gen(), jax.random.key(1))
    assert snap_steps and snap_steps[-1] < 12, snap_steps

    with open(os.path.join(outdir, f"proc{pid}.txt"), "w") as f:
        f.write("OK\n")
        f.write(" ".join(f"{x:.6f}" for x in dist_losses))
        f.write(f"\nstop={snap_steps[-1]}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except SystemExit:
        raise
    except BaseException as e:  # record the failure for the parent test
        import traceback
        outdir = sys.argv[3]
        pid = sys.argv[2]
        with open(os.path.join(outdir, f"proc{pid}.txt"), "w") as f:
            f.write("FAIL\n")
            f.write(traceback.format_exc())
        raise
