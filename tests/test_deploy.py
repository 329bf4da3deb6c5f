"""Deploy-path tests: BN folding exactness, AOT compile, serialization
round-trip, latency benchmark harness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dcfp_tpu.engine.deploy import (aot_compile, benchmark,
                                    export_serialized, fold_batchnorm,
                                    load_serialized, make_inference_fn)
from dcfp_tpu.graph.apply import graph_apply, init_graph
from dcfp_tpu.graph.ir import GraphBuilder


def small_net(num_classes=4):
    b = GraphBuilder("net")
    x = b.input("image")
    x = b.conv(x, "c1", out_ch=8, kernel=3)
    x = b.bn(x, "n1")
    x = b.relu(x, "r1")
    c = b.conv(x, "c2", out_ch=8, kernel=3)
    c = b.bn(c, "n2")
    s = b.add_([c, x], "sum")
    x = b.relu(s, "r2")
    pred = b.conv(x, "pred", out_ch=num_classes, kernel=1, padding=0,
                  bias=True)
    return b.finish([pred])


def randomized_bn(g, rng):
    params, state = init_graph(g, jax.random.key(0))
    params = jax.tree.map(np.asarray, params)
    state = {k: {kk: np.asarray(vv) for kk, vv in v.items()}
             for k, v in state.items()}
    for bn in [n.name for n in g.bn_nodes()]:
        ch = g.node(bn).attrs["channels"]
        params[bn]["scale"] = rng.standard_normal(ch).astype(np.float32)
        params[bn]["bias"] = rng.standard_normal(ch).astype(np.float32)
        state[bn]["mean"] = rng.standard_normal(ch).astype(np.float32)
        state[bn]["var"] = (np.abs(rng.standard_normal(ch)) + 0.3
                            ).astype(np.float32)
    return params, state


def test_bn_folding_exact(rng):
    g = small_net()
    params, state = randomized_bn(g, rng)
    x = rng.standard_normal((2, 15, 15, 3), dtype=np.float32)
    want, _ = graph_apply(g, params, state, {"image": jnp.asarray(x)},
                          train=False)
    fg, fp, fs = fold_batchnorm(g, params, state)
    assert not fs  # everything folded
    got, _ = graph_apply(fg, fp, fs, {"image": jnp.asarray(x)}, train=False)
    np.testing.assert_allclose(np.asarray(got["pred"]),
                               np.asarray(want["pred"]), rtol=1e-4,
                               atol=1e-4)
    # params shrank: no BN tensors remain
    assert all(not k.startswith("n") for k in fp)


def test_inference_fn_bf16_and_argmax(rng):
    g = small_net()
    params, state = randomized_bn(g, rng)
    x = rng.standard_normal((1, 16, 16, 3), dtype=np.float32)
    fn, p = make_inference_fn(g, params, state, dtype=jnp.bfloat16,
                              output="logits")
    logits = fn(p, jnp.asarray(x))
    assert logits.dtype == jnp.float32
    # bf16 forward tracks the f32 forward loosely
    want, _ = graph_apply(g, params, state, {"image": jnp.asarray(x)})
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want["pred"]),
                               rtol=0.1, atol=0.15)
    fn2, p2 = make_inference_fn(g, params, state, output="argmax")
    am = fn2(p2, jnp.asarray(x))
    assert am.dtype == jnp.uint8 and am.shape == (1, 16, 16)


def test_aot_and_benchmark(rng):
    g = small_net()
    params, state = randomized_bn(g, rng)
    fn, p = make_inference_fn(g, params, state, dtype=jnp.float32)
    compiled = aot_compile(fn, p, (1, 16, 16, 3))
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    out = compiled(p, x)
    eager = fn(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(eager),
                               rtol=1e-5, atol=1e-5)
    stats = benchmark(lambda img: compiled(p, img), x, warmup=2, iters=5)
    assert stats["ms_per_batch"] > 0 and stats["images_per_sec"] > 0


def test_serialize_roundtrip(rng, tmp_path):
    g = small_net()
    params, state = randomized_bn(g, rng)
    fn, p = make_inference_fn(g, params, state, dtype=jnp.float32)
    path = str(tmp_path / "engine.bin")
    export_serialized(fn, p, (1, 16, 16, 3), path)
    run = load_serialized(path)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    got = run(p, x)
    want = fn(p, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def stem_like_net(num_classes=4):
    """A deep-stem-shaped net (conv-bn-relu x3 + maxpool) with the
    reference's backbone.conv1.* naming so stem_pad_targets finds it."""
    b = GraphBuilder("stem")
    x = b.input("image")
    x = b.conv(x, "backbone.conv1.0", out_ch=6, kernel=3, stride=2)
    x = b.bn(x, "backbone.conv1.1")
    x = b.relu(x, "backbone.conv1.relu0")
    x = b.conv(x, "backbone.conv1.3", out_ch=6, kernel=3)
    x = b.bn(x, "backbone.conv1.4")
    x = b.relu(x, "backbone.conv1.relu1")
    x = b.conv(x, "backbone.conv1.6", out_ch=12, kernel=3)
    x = b.bn(x, "backbone.bn1")
    x = b.relu(x, "backbone.relu1")
    x = b.maxpool(x, "backbone.maxpool", kernel=3, stride=2, padding=1)
    pred = b.conv(x, "pred", out_ch=num_classes, kernel=1, padding=0,
                  bias=True)
    return b.finish([pred])


def test_stem_channel_padding_exact(rng):
    """pad_conv_out_channels must be numerically exact: zero output lanes
    through relu/maxpool into zero input rows of every consumer conv."""
    from dcfp_tpu.engine.deploy import (pad_conv_out_channels,
                                        stem_pad_targets)
    g = stem_like_net()
    params, state = randomized_bn(g, rng)
    fg, fp, fs = fold_batchnorm(g, params, state)
    x = rng.standard_normal((1, 33, 33, 3), dtype=np.float32)
    want, _ = graph_apply(fg, fp, fs, {"image": jnp.asarray(x)},
                          train=False)

    targets = stem_pad_targets(fg, 16)
    assert targets == {"backbone.conv1.0": 16, "backbone.conv1.3": 16,
                       "backbone.conv1.6": 16}
    pg, pp = pad_conv_out_channels(fg, fp, targets)
    assert pg.node("backbone.conv1.0").attrs["out_ch"] == 16
    assert pg.node("backbone.conv1.3").attrs["in_ch"] == 16
    assert pg.node("pred").attrs["in_ch"] == 16
    assert pp["pred"]["kernel"].shape == (1, 1, 16, 4)
    got, _ = graph_apply(pg, pp, fs, {"image": jnp.asarray(x)},
                         train=False)
    np.testing.assert_allclose(np.asarray(got["pred"]),
                               np.asarray(want["pred"]), rtol=1e-6,
                               atol=1e-6)


def test_split_concat_projection_matches_on_aspp(rng):
    """split_concat_projection rewrites ASPP's concat->1x1 as per-branch
    matmuls summed, with the global-pool branch's projection commuted
    through its broadcast resize.  Logits must match the plain deploy
    path (reassociation-level), and the rewrite must actually fire."""
    from dcfp_tpu.engine.deploy import (fold_batchnorm, make_inference_fn,
                                        split_concat_projection)
    from dcfp_tpu.models.registry import build_model

    model = build_model("deeplabv3", backbone="resnet50",
                        backbone_para={"os": 16}, num_classes=7,
                        align_corner=False, deepsup=False)
    g = model.graph
    params, state = randomized_bn(g, rng)
    x = jnp.asarray(rng.standard_normal((1, 65, 65, 3),
                                        dtype=np.float32))

    outs = {}
    for split in (False, True):
        fn, p = make_inference_fn(g, params, state, dtype=jnp.float32,
                                  output="logits", split_concat=split)
        outs[split] = np.asarray(jax.jit(fn)(p, x))
    np.testing.assert_allclose(outs[True], outs[False],
                               rtol=1e-4, atol=1e-4)

    # structural assertions on the rewritten graph
    fg, fp, fs = fold_batchnorm(g, *randomized_bn(g, rng))
    rg, rp = split_concat_projection(fg, fp)
    assert "aspp.cat" not in rg.nodes          # concat gone
    assert rg.node("aspp.conv1").op == "add"   # projection is now a sum
    splits = [n for n in rg.nodes if n.startswith("aspp.conv1.s")]
    assert len(splits) >= 5 + 1  # 5 branch convs + the commuted resize
    # the pool branch's split conv reads the PRE-resize (1x1) tensor
    pool_convs = [n for n in rg.conv_nodes()
                  if n.name.startswith("aspp.conv1.s")
                  and any("global" in i for i in n.inputs)]
    assert pool_convs, "global-pool projection was not commuted"


def test_inference_fn_pad_stem_matches(rng):
    from dcfp_tpu.engine.deploy import make_inference_fn
    g = stem_like_net()
    params, state = randomized_bn(g, rng)
    x = rng.standard_normal((1, 33, 33, 3), dtype=np.float32)
    outs = {}
    for pad in (0, 16):
        fn, p = make_inference_fn(g, params, state, dtype=jnp.float32,
                                  output="argmax", fuse_tail=False,
                                  pad_stem=pad)
        outs[pad] = np.asarray(jax.jit(fn)(p, jnp.asarray(x)))
    np.testing.assert_array_equal(outs[0], outs[16])


def test_env_compiler_options_parsing(monkeypatch):
    from dcfp_tpu.engine.deploy import env_compiler_options
    monkeypatch.delenv("DCFP_XLA_OPTIONS", raising=False)
    assert env_compiler_options() is None
    # values coerce to bool/int: XLA:CPU's PJRT option parser rejects
    # the string "false" for bool options; typed values work everywhere
    monkeypatch.setenv("DCFP_XLA_OPTIONS",
                       "xla_tpu_scoped_vmem_limit_kib=65536, a_flag=false")
    assert env_compiler_options() == {
        "xla_tpu_scoped_vmem_limit_kib": 65536, "a_flag": False}
    monkeypatch.setenv("DCFP_XLA_OPTIONS", "not_a_pair")
    with pytest.raises(ValueError):
        env_compiler_options()


def test_aot_compile_with_compiler_options(rng):
    # CPU backend also validates option names server-side; use a generic
    # (non-TPU) debug option so the test runs on the CPU test platform.
    g = small_net()
    params, state = randomized_bn(g, rng)
    fn, p = make_inference_fn(g, params, state, dtype=jnp.float32)
    compiled = aot_compile(fn, p, (1, 16, 16, 3),
                           compiler_options={"xla_backend_optimization_level": "2"})
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    np.testing.assert_allclose(np.asarray(compiled(p, x)),
                               np.asarray(fn(p, x)), rtol=1e-5, atol=1e-5)
