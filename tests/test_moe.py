"""MoE-ViT / EP tests: routing semantics, graph surface, mesh sharding.

The EP family (models/moe.py) closes the last parallelism axis of
SURVEY §2.3 with an implementation instead of a documented non-goal:
Switch-style top-1 routed MLP as dense dispatch/combine einsums, experts
sharded over the mesh "model" axis via GSPMD. These tests pin the
routing semantics against a per-token python loop, the tappable node
surface (including the "experts" router tap), and GSPMD equivalence of
the EP-sharded program on the 8-virtual-device CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from interactive_vit_tpu.graph.executor import Executor
from interactive_vit_tpu.graph.ir import Graph
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.models import moe
from interactive_vit_tpu.models.moe_plugin import make_moe_model
from interactive_vit_tpu.ops.node_ops import register_builtin
from interactive_vit_tpu.parallel import mesh as mesh_lib

CFG = moe.MoEViTConfig("moe_test", img_size=32, patch=16, width=64,
                       depth=2, heads=4, num_classes=10, n_experts=4,
                       capacity_factor=4.0)


@pytest.fixture(scope="module")
def setup():
    params = moe.init_params(jax.random.key(0), CFG)
    moe.VARIANTS["moe_test"] = CFG
    model = make_moe_model("moe_test", params=params,
                           with_categories=False)
    reg = Registry()
    register_builtin(reg)
    model.register(reg)
    return params, model, reg


# -- routing semantics --------------------------------------------------------


def test_moe_mlp_matches_reference_loop(setup):
    params, _, _ = setup
    h = jnp.asarray(np.random.default_rng(1).standard_normal((2, 7, 64)),
                    jnp.float32)
    y, gates, aux = moe.moe_mlp(h, params["blocks"][1], CFG)
    yref = moe.moe_mlp_reference(h, params["blocks"][1], CFG)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gates.sum(-1)), 1.0, atol=1e-5)
    assert float(aux) >= 1.0 - 1e-5  # Switch aux lower bound (balanced=1)


def test_capacity_overflow_drops_tokens(setup):
    params, _, _ = setup
    tight = moe.MoEViTConfig("moe_tight", img_size=32, patch=16, width=64,
                             depth=2, heads=4, num_classes=10, n_experts=4,
                             capacity_factor=0.5)
    h = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8, 64)),
                    jnp.float32)
    y = moe.moe_mlp(h, params["blocks"][1], tight)[0]
    yref = moe.moe_mlp_reference(h, params["blocks"][1], tight)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref), atol=1e-5)
    dropped = int((np.abs(np.asarray(y)).sum(-1) == 0).sum())
    assert dropped > 0  # overflow actually happened at f=0.5


def test_aux_loss_sees_raw_routing_not_capacity_capped(setup):
    """The Switch f_e must be the PRE-drop routing fraction: a collapsed
    router must be penalized identically whether capacity drops tokens
    or not (post-drop f_hot would cap at capacity_factor/E exactly in
    the collapsed regime the loss exists to correct)."""
    params = dict(setup[0]["blocks"][1])
    # bias the router so every token argmaxes expert 0
    params["router_w"] = jnp.zeros_like(
        params["router_w"]).at[:, 0].set(5.0)
    h = jnp.asarray(np.abs(
        np.random.default_rng(3).standard_normal((1, 8, 64))),
        jnp.float32) * 0.01
    loose = moe.MoEViTConfig("l", img_size=32, patch=16, width=64,
                             depth=2, heads=4, n_experts=4,
                             capacity_factor=8.0)
    tight = moe.MoEViTConfig("t", img_size=32, patch=16, width=64,
                             depth=2, heads=4, n_experts=4,
                             capacity_factor=0.5)
    aux_loose = float(moe.moe_mlp(h, params, loose)[2])
    aux_tight = float(moe.moe_mlp(h, params, tight)[2])
    np.testing.assert_allclose(aux_tight, aux_loose, rtol=1e-6)
    assert aux_loose > 3.0  # collapsed routing: aux ~ E * 1 * P_hot


def test_moe_block_respects_attn_heads_param(setup):
    """The UI's 'tap heads' control must subset the MoE family's maps
    exactly like the vit family's."""
    _, model, reg = setup
    img = np.random.default_rng(1).random((3, 32, 32), dtype=np.float32)
    ex = Executor(reg)
    g = make_graph(model, img)
    b1 = next(n.index for n in g.nodes
              if n.name == f"{model.name}:blocks.1")
    g.nodes[b1].params["attn_heads"] = "[1,3]"
    out = ex.run(g, taps={(b1, "attn")})
    assert out[b1]["attn"].shape[1] == 2  # 2 of 4 heads


def test_forward_aux_and_attn(setup):
    params, _, _ = setup
    x = jnp.asarray(np.random.default_rng(0).random(
        (2, 3, 32, 32), dtype=np.float32))
    out = moe.forward(params, x, CFG, want_attn=True, want_aux=True)
    assert out["logits"].shape == (2, 10)
    assert len(out["attn"]) == CFG.depth
    assert np.isfinite(float(out["aux"]))


# -- graph surface ------------------------------------------------------------


def make_graph(model, img, experts_block=None):
    """Chain WITHOUT transform (feed pre-sized images so the head output
    is comparable to the monolithic forward, which takes raw pixels)."""
    g = Graph()
    prev, nodes = None, {}
    for ln in model.list_node_names():
        if ln.endswith(":transform"):
            continue
        n = g.add_node(ln)
        nodes[ln] = n
        if prev is not None:
            g.connect(prev, "o", n, "o")
        prev = n
    if experts_block is not None:
        viewer = g.add_node("multi_view")
        g.connect(nodes[f"{model.name}:blocks.{experts_block}"],
                  "experts", viewer, "o")
    g.add_input(img, g.nodes[0], "o")
    return g


def test_experts_channel_taps_through_executor(setup):
    params, model, reg = setup
    img = np.random.default_rng(0).random((3, 32, 32), dtype=np.float32)
    ex = Executor(reg)
    g = make_graph(model, img, experts_block=1)
    b1 = next(n.index for n in g.nodes
              if n.name == f"{model.name}:blocks.1")
    out = ex.run(g, taps="primary")
    gates = np.asarray(out[b1]["experts"], dtype=np.float32)
    # render-ready layout: per-expert heatmaps over the 2x2 patch grid
    grid = CFG.img_size // CFG.patch
    assert gates.shape == (1, CFG.n_experts, grid, grid)
    np.testing.assert_allclose(gates.sum(1), 1.0, atol=2e-2)  # bf16 tap
    # graph chain output == monolithic forward
    head = g.nodes[len(model.list_node_names()) - 2].index
    mono = moe.forward(params, jnp.asarray(img[None]), CFG)["logits"]
    np.testing.assert_allclose(np.asarray(out[head]["o"]),
                               np.asarray(mono), atol=1e-4)


def test_dense_blocks_do_not_expose_experts(setup):
    _, model, reg = setup
    # blocks.0 is dense (moe_every=2): no "experts" channel in its io
    io = reg.get_node(f"{model.name}:blocks.0").io({})
    assert "experts" not in io["outs"]
    io1 = reg.get_node(f"{model.name}:blocks.1").io({})
    assert "experts" in io1["outs"]


def test_moe_safetensors_roundtrip(setup, tmp_path):
    """MoE params (incl. rank-3 expert weights) survive the native "/"
    safetensors export -> convert('auto') load, byte-exact — the
    train -> serve checkpoint path for the family."""
    from interactive_vit_tpu.models.weights import to_native_flat
    from interactive_vit_tpu.tools.convert import convert
    from interactive_vit_tpu.utils.safetensors_io import (
        load_file, save_file,
    )

    params = setup[0]
    path = str(tmp_path / "moe.safetensors")
    save_file({k: np.asarray(v) for k, v in
               to_native_flat(params).items()}, path)
    back = convert("moe_test", "auto", load_file(path))
    flat_a = to_native_flat(params)
    flat_b = to_native_flat(back)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)
    assert np.asarray(back["blocks"][1]["exp_fc1_w"]).shape == (
        CFG.n_experts, CFG.width, CFG.mlp_dim)


# -- EP sharding (GSPMD over the virtual mesh) --------------------------------


def test_ep_sharded_forward_matches_unsharded(setup):
    params, _, _ = setup
    mesh = mesh_lib.make_mesh({"data": 2, "model": 4}, jax.devices()[:8])
    x = jnp.asarray(np.random.default_rng(3).random(
        (4, 3, 32, 32), dtype=np.float32))
    want = moe.forward(params, x, CFG)["logits"]

    with mesh:
        sp = mesh_lib.shard_params(params, mesh)
        # expert weights must actually shard over "model" (EP), 4-way
        exp_w = sp["blocks"][1]["exp_fc1_w"]
        assert exp_w.sharding.spec == P("model", None, None)
        assert len({d.id for s in exp_w.addressable_shards
                    for d in [s.device]}) == 8
        xs = jax.device_put(x, mesh_lib.batch_sharding(mesh))
        got = jax.jit(
            lambda p, i: moe.forward(p, i, CFG)["logits"])(sp, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


def test_trainer_integration_moe(setup):
    """setup_sharded routes MoE configs through moe.forward + aux loss,
    with remat and the head-major TP repack, end to end."""
    from interactive_vit_tpu.parallel import train as train_lib

    mesh = mesh_lib.make_mesh({"data": 4, "model": 2}, jax.devices()[:8])
    with mesh:
        params, opt_state, step, infer = train_lib.setup_sharded(
            CFG, mesh, seed=0, lr=1e-3)
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.random((8, 3, 32, 32), dtype=np.float32))
        labels = jnp.asarray(rng.integers(0, 10, size=(8,)))
        losses = []
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, images,
                                           labels)
            losses.append(float(loss))
        assert losses[-1] < losses[0], losses
        logits = np.asarray(infer(params, images))
        assert logits.shape == (8, 10) and np.isfinite(logits).all()
    # expert weights decay (rank-3 matmuls); expert BIASES (rank-2
    # [E,d], still biases) and pos_emb do not
    mask = train_lib._decay_mask(moe.init_params(jax.random.key(0), CFG))
    assert mask["blocks"][1]["exp_fc1_w"] is True
    assert mask["blocks"][1]["exp_fc1_b"] is False
    assert mask["blocks"][1]["exp_fc2_b"] is False
    assert mask["pos_emb"] is False


def test_ep_train_step_decreases_loss(setup):
    """DP x EP training with the Switch aux loss in the objective."""
    import optax

    params, _, _ = setup
    mesh = mesh_lib.make_mesh({"data": 2, "model": 4}, jax.devices()[:8])
    opt = optax.adamw(1e-3)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((8, 3, 32, 32), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 10, size=(8,)))

    def loss_fn(p, imgs, labs):
        out = moe.forward(p, imgs, CFG, want_aux=True)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            out["logits"], labs).mean()
        return ce + 0.01 * out["aux"]

    @jax.jit
    def step(p, o, imgs, labs):
        loss, grads = jax.value_and_grad(loss_fn)(p, imgs, labs)
        upd, o = opt.update(grads, o, p)
        return optax.apply_updates(p, upd), o, loss

    with mesh:
        p = mesh_lib.shard_params(params, mesh)
        imgs = jax.device_put(images, mesh_lib.batch_sharding(mesh))
        o = opt.init(p)
        losses = []
        for _ in range(5):
            p, o, loss = step(p, o, imgs, labels)
            losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))
