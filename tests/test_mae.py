"""MAE pretraining subsystem: masking invariants, encoder parity with the
plain-ViT trunk, loss behavior, sharded steps, encoder export, and the
reconstruct graph node (dynamic seed) through the executor.

The reference has no training at all (``/root/reference/main/context.py:80``
runs under ``torch.no_grad``); MAE is the zero-egress replacement for its
pretrained-weight story (``static/models/vgg16.py:11-14``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from interactive_vit_tpu.models import mae, vit


CFG = mae.resolve_variant("mae_t16@64")  # 4x4 grid: fast CPU tests


def imgs(rng, n=4, img=None):
    return jnp.asarray(rng.standard_normal(
        (n, 3, img or CFG.enc_cfg.img_size,
         img or CFG.enc_cfg.img_size)).astype(np.float32))


def test_masking_invariants(rng):
    b, length, keep = 8, 16, 5
    ids_keep, mask, ids_restore = mae.random_masking(
        jax.random.key(3), b, length, keep)
    assert ids_keep.shape == (b, keep)
    assert mask.shape == (b, length)
    np.testing.assert_allclose(np.asarray(mask.sum(axis=1)),
                               length - keep)
    for i in range(b):
        kept = set(np.asarray(ids_keep[i]).tolist())
        assert len(kept) == keep  # distinct positions
        assert all(float(mask[i, j]) == 0.0 for j in kept)
        # ids_restore inverts the shuffle
        shuf = np.asarray(jnp.argsort(
            jax.random.uniform(jax.random.key(3), (b, length)), axis=1))[i]
        assert (shuf[np.asarray(ids_restore[i])] == np.arange(length)).all()


def test_mask_ratio_statics():
    assert CFG.num_patches == 16
    assert CFG.len_keep() == 4            # 0.75 default
    assert CFG.len_keep(0.5) == 8
    assert CFG.len_keep(0.99) == 1        # clamped to at least one visible
    with pytest.raises(ValueError):
        CFG.len_keep(1.0)
    with pytest.raises(ValueError):
        # nothing masked -> no objective
        mae.forward_pretrain(
            mae.init_params(jax.random.key(0), CFG), jnp.zeros((1, 3, 64, 64)),
            CFG, jax.random.key(0), mask_ratio=0.0)


def test_unpatchify_inverts_patchify(rng):
    from interactive_vit_tpu.ops import layers as L

    x = imgs(rng, 2)
    p = L.patchify(x, CFG.enc_cfg.patch)
    y = mae.unpatchify(p, CFG.enc_cfg.patch, CFG.grid)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_encoder_full_tokens_is_the_vit_trunk(rng):
    """mask_ratio -> 0 (all tokens visible) IS the plain ViT feature
    forward — the export contract."""
    params = mae.init_params(jax.random.key(0), CFG)
    x = imgs(rng)
    z = mae.encode(params, x, CFG, None)
    feats = vit.forward(params["enc"], x, CFG.enc_cfg)["logits"]
    np.testing.assert_array_equal(np.asarray(z[:, 0]), np.asarray(feats))


def test_forward_pretrain_shapes_and_loss(rng):
    params = mae.init_params(jax.random.key(0), CFG)
    out = mae.forward_pretrain(params, imgs(rng), CFG, jax.random.key(1))
    assert out["pred"].shape == (4, 16, 3 * 16 * 16)
    assert out["mask"].shape == (4, 16)
    assert np.isfinite(float(out["loss"]))
    # norm_pix off changes the objective but stays finite
    raw_cfg = dataclasses.replace(CFG, norm_pix=False)
    out2 = mae.forward_pretrain(params, imgs(rng), raw_cfg,
                                jax.random.key(1))
    assert np.isfinite(float(out2["loss"]))
    assert float(out2["loss"]) != float(out["loss"])


def test_loss_only_scores_masked_patches(rng):
    """Perturbing a VISIBLE patch's prediction target must not move the
    loss: replace the image's visible patches with zeros post-hoc."""
    params = mae.init_params(jax.random.key(0), CFG)
    x = imgs(rng, 2)
    key = jax.random.key(7)
    out = mae.forward_pretrain(params, x, CFG, key)
    # recompute loss by hand from pred/mask and check an unmasked-patch
    # perturbation of the target is invisible
    target, _, _ = mae.patch_targets(x, CFG)
    per = jnp.square(out["pred"].astype(jnp.float32) - target).mean(-1)
    manual = float((per * out["mask"]).sum() / out["mask"].sum())
    assert abs(manual - float(out["loss"])) < 1e-6


def test_reconstruct_pastes_visible_patches(rng):
    """Channel "o" must equal the input EXACTLY on visible patches and
    the masked view must be zero on masked patches."""
    from interactive_vit_tpu.ops import layers as L

    params = mae.init_params(jax.random.key(0), CFG)
    x = imgs(rng, 2)
    out = mae.reconstruct(params, x, CFG, jax.random.key(5))
    p = CFG.enc_cfg.patch
    raw = np.asarray(L.patchify(x, p))
    pasted = np.asarray(L.patchify(out["o"], p))
    masked = np.asarray(L.patchify(out["masked"], p))
    m = np.asarray(out["mask"]).reshape(2, -1)
    for b in range(2):
        vis = m[b] == 0
        np.testing.assert_allclose(pasted[b][vis], raw[b][vis], atol=1e-5)
        np.testing.assert_allclose(masked[b][~vis], 0.0)
        np.testing.assert_allclose(masked[b][vis], raw[b][vis], atol=1e-5)
    assert out["err"].shape == (2, 4, 4)
    # err is zero exactly on visible patches
    err = np.asarray(out["err"]).reshape(2, -1)
    assert (err[m == 0] == 0).all() and (err[m == 1] > 0).any()


def test_pretrain_step_learns_and_accum_matches():
    from interactive_vit_tpu.parallel import mesh as mesh_lib
    from interactive_vit_tpu.parallel import train as train_lib

    mesh = mesh_lib.make_mesh(None)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 3, 64, 64)).astype(np.float32))
    with mesh:
        params, opt, step = train_lib.setup_sharded_mae(CFG, mesh, seed=0)
        first = last = None
        for i in range(8):
            params, opt, loss = step(params, opt, x, jax.random.key(i))
            first = first if first is not None else float(loss)
            last = float(loss)
        assert last < first  # reconstruction improves

        # grad accumulation: equivalent objective class, runs sharded.
        # (NOT bit-identical to the full batch: microbatches draw
        # independent masks by design.)
        p2, o2, step2 = train_lib.setup_sharded_mae(
            CFG, mesh, seed=0, accum_steps=2)
        p2, o2, l2 = step2(p2, o2, x, jax.random.key(0))
        assert np.isfinite(float(l2))


def test_pretrain_step_sharded_tp():
    """DP x TP mesh: the enc/dec block leaf names reuse param_spec's
    Megatron rules; one step must run and stay finite."""
    import jax

    from interactive_vit_tpu.parallel import mesh as mesh_lib
    from interactive_vit_tpu.parallel import train as train_lib

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = mesh_lib.make_mesh({"data": 2, "model": 2})
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 3, 64, 64)).astype(np.float32))
    with mesh:
        params, opt, step = train_lib.setup_sharded_mae(CFG, mesh, seed=0)
        params, opt, loss = step(params, opt, x, jax.random.key(0))
        assert np.isfinite(float(loss))


def test_encoder_export_roundtrip(tmp_path, rng):
    """encoder_params -> native safetensors -> convert loads it as a
    plain ViT; features match the MAE encoder exactly."""
    from interactive_vit_tpu.models.weights import to_native_flat
    from interactive_vit_tpu.tools.convert import convert
    from interactive_vit_tpu.utils.safetensors_io import load_file, save_file

    params = mae.init_params(jax.random.key(0), CFG)
    path = str(tmp_path / "enc.safetensors")
    save_file(to_native_flat(jax.device_get(mae.encoder_params(params))),
              path)
    loaded = convert(CFG.enc_cfg.name, "auto", load_file(path))
    x = imgs(rng, 2)
    ours = mae.encode(params, x, CFG, None)[:, 0]
    theirs = vit.forward(loaded, x, CFG.enc_cfg)["logits"]
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               atol=1e-6)


def test_load_encoder_into_classifier(rng):
    """Finetune init: pretrained trunk + fresh head classifies shapes."""
    enc_cls_cfg = dataclasses.replace(CFG.enc_cfg, num_classes=10)
    params = mae.init_params(jax.random.key(0), CFG)
    clf = vit.init_params(jax.random.key(1), enc_cls_cfg)
    clf = mae.load_encoder_into(clf, mae.encoder_params(params),
                                enc_cls_cfg)
    x = imgs(rng, 2)
    logits = vit.forward(clf, x, enc_cls_cfg)["logits"]
    assert logits.shape == (2, 10)
    # trunk actually transferred: CLS features before the head match
    feat_cfg = dataclasses.replace(enc_cls_cfg, num_classes=0)
    feats = vit.forward({**clf, "head": {}}, x, feat_cfg)
    z = mae.encode(params, x, CFG, None)[:, 0]
    np.testing.assert_array_equal(np.asarray(feats["logits"]),
                                  np.asarray(z))


def test_reconstruct_node_through_executor(rng):
    """The mae plugin's graph surface end-to-end: img -> transform ->
    reconstruct, with the dynamic seed param redrawing the mask on a
    cache hit."""
    from interactive_vit_tpu.graph.executor import Executor
    from interactive_vit_tpu.graph.ir import Graph
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models.mae_plugin import make_mae_model
    from interactive_vit_tpu.ops.node_ops import register_builtin

    reg = Registry()
    register_builtin(reg)
    make_mae_model("mae_t16@64", seed=0).register(reg)
    ex = Executor(reg)

    def build(seed):
        g = Graph()
        t = g.add_node("mae_t16@64:transform", {})
        r = g.add_node("mae_t16@64:reconstruct", {"seed": seed})
        g.connect(t, "o", r, "o")
        g.add_input(np.asarray(imgs(rng, 1, img=96)), t, "o")
        return g, r

    g, r = build("1")
    taps = {(r.index, ch) for ch in ("o", "masked", "err", "mask")}
    out = ex.run(g, taps=taps)
    assert out[r.index]["o"].shape == (1, 3, 64, 64)
    assert out[r.index]["masked"].shape == (1, 3, 64, 64)
    assert out[r.index]["err"].shape == (1, 4, 4)
    m1 = np.asarray(out[r.index]["mask"])
    assert m1.shape == (1, 4, 4)
    # seed is DYNAMIC: a different value reuses the cached program and
    # redraws the mask
    g2, r2 = build("2")
    out2 = ex.run(g2, taps={(r2.index, "mask")})
    m2 = np.asarray(out2[r2.index]["mask"])
    assert m1.shape == m2.shape and (m1 != m2).any()
    assert np.allclose(m1.sum(), m2.sum())  # same ratio -> same mask count


def test_reconstruct_node_bad_params_error():
    from interactive_vit_tpu.graph.executor import Executor, NodeError
    from interactive_vit_tpu.graph.ir import Graph, GraphError
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models.mae_plugin import make_mae_model

    reg = Registry()
    make_mae_model("mae_t16@64", seed=0).register(reg)
    ex = Executor(reg)
    g = Graph()
    n_r = g.add_node("mae_t16@64:reconstruct", {"mask_ratio": "1.5"})
    g.add_input(np.zeros((1, 3, 64, 64), np.float32), n_r, "o")
    with pytest.raises((GraphError, NodeError)):
        ex.run(g)


def test_pretrain_cli_and_probe(tmp_path):
    """Tiny end-to-end CLI run: pretrain, export both artifacts, resume."""
    from interactive_vit_tpu.tools.pretrain import main

    out = str(tmp_path / "ckpt")
    enc = str(tmp_path / "enc.safetensors")
    full = str(tmp_path / "full.safetensors")
    main(["--variant", "mae_t16@64", "--steps", "6", "--batch", "8",
          "--memorize", "16", "--distinct-classes", "4",
          "--output", out, "--export-encoder", enc,
          "--export-safetensors", full, "--log-every", "5"])
    import os

    assert os.path.exists(enc) and os.path.exists(full)
    # the full tree serves through the mae plugin (native-flat load)
    from interactive_vit_tpu.models.mae_plugin import make_mae_model
    from interactive_vit_tpu.models.weights import from_native_flat
    from interactive_vit_tpu.utils.safetensors_io import load_file

    tree = from_native_flat(load_file(full))
    m = make_mae_model("mae_t16@64", params=tree)
    assert m.list_node_names() == ["mae_t16@64:transform",
                                   "mae_t16@64:reconstruct"]
    # resume continues from the saved step without error
    main(["--variant", "mae_t16@64", "--steps", "8", "--batch", "8",
          "--memorize", "16", "--distinct-classes", "4",
          "--output", out, "--resume", "--log-every", "5"])


def test_linear_probe_separates_separable_features():
    from interactive_vit_tpu.tools.pretrain import linear_probe

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 4, size=200)
    feats = np.eye(4)[labels] * 3.0 + rng.standard_normal((200, 4)) * 0.1
    assert linear_probe(feats, labels, 4) > 0.95
