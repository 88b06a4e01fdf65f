"""Checkpoint round-trips (incl. sharded restore) + tracing utilities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.parallel import mesh as mesh_lib
from interactive_vit_tpu.utils import checkpoint, tracing

CFG = vit.ViTConfig("vit_ckpt", img_size=32, patch=16, width=64,
                    depth=2, heads=4, num_classes=10)


def test_checkpoint_roundtrip(tmp_path):
    params = vit.init_params(jax.random.key(0), CFG)
    path = str(tmp_path / "ckpt")
    checkpoint.save_params(path, params)
    back = checkpoint.load_params(path)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_sharded_restore(tmp_path):
    params = vit.init_params(jax.random.key(1), CFG)
    path = str(tmp_path / "ckpt_sharded")
    checkpoint.save_params(path, params)

    mesh = mesh_lib.make_mesh({"data": 4, "model": 2}, jax.devices()[:8])
    target = mesh_lib.shard_params(params, mesh)
    back = checkpoint.load_params(path, like=target)
    qkv = back["blocks"][0]["qkv_w"]
    assert qkv.sharding.spec == mesh_lib.param_spec("qkv_w")
    np.testing.assert_allclose(
        np.asarray(qkv), np.asarray(params["blocks"][0]["qkv_w"])
    )


def test_node_timings():
    from interactive_vit_tpu.graph.executor import Executor
    from interactive_vit_tpu.graph.ir import Graph
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.ops.node_ops import register_builtin

    reg = Registry()
    register_builtin(reg)
    ex = Executor(reg)
    g = Graph()
    a = g.add_node("cos")
    b = g.add_node("cos")
    g.connect(a, "o", b, "o")
    g.add_input(np.ones((64,), np.float32), a, "o")
    t = tracing.node_timings(ex, g)
    assert set(t) == {0, 1}
    assert all(v >= 0 for v in t.values())


def test_debug_nans_toggles():
    tracing.debug_nans(True)
    with pytest.raises((FloatingPointError, Exception)):
        jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0)).block_until_ready()
    tracing.debug_nans(False)
    jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0)).block_until_ready()


def test_safetensors_roundtrip(tmp_path):
    """Dependency-free safetensors writer/reader: exact f32/int round-trip,
    bf16 upcast to f32, truncation rejected."""
    from interactive_vit_tpu.utils.safetensors_io import (
        SafetensorsError, load_file, save_file,
    )

    rng = np.random.default_rng(0)
    tensors = {
        "w": rng.standard_normal((4, 8)).astype(np.float32),
        "b": rng.integers(-5, 5, size=(8,)).astype(np.int32),
        "scalar": np.float32(2.5).reshape(()),
        "bf": jnp.asarray(rng.standard_normal((3, 3)), dtype=jnp.bfloat16),
    }
    path = str(tmp_path / "x.safetensors")
    save_file(tensors, path, metadata={"who": "test"})
    back = load_file(path)
    np.testing.assert_array_equal(back["w"], tensors["w"])
    np.testing.assert_array_equal(back["b"], tensors["b"])
    assert back["scalar"].shape == () and back["scalar"] == np.float32(2.5)
    # bf16 -> f32 upcast is exact
    assert back["bf"].dtype == np.float32
    np.testing.assert_array_equal(
        back["bf"], np.asarray(tensors["bf"], dtype=np.float32))

    raw = open(path, "rb").read()
    open(path, "wb").write(raw[:-4])
    with pytest.raises(SafetensorsError):
        load_file(path)


def test_load_params_accepts_scalar_leaves(tmp_path):
    """The 'any pytree' contract: train states carry plain-int steps."""
    import numpy as np

    from interactive_vit_tpu.utils.checkpoint import load_params, save_params

    tree = {"w": np.arange(4, dtype=np.float32), "step": 7}
    save_params(str(tmp_path / "ck"), tree)
    like = {"w": np.zeros(4, np.float32), "step": 0}
    back = load_params(str(tmp_path / "ck"), like=like)
    assert int(back["step"]) == 7
    np.testing.assert_array_equal(np.asarray(back["w"]), tree["w"])


def test_class_names_returns_fresh_list():
    """Mutating a returned label list must not corrupt the process-wide
    cache (it feeds every model's category sink)."""
    from interactive_vit_tpu.models.labels import class_names

    a = class_names(1000)
    original = a[0]
    a[0] = "MUTATED"
    assert class_names(1000)[0] == original


def test_ckpt_layout_auto_sniffs_timm_vs_torchvision():
    """'auto' must route timm-named state dicts (DINO releases) to the timm
    converter instead of crashing in the torchvision one (ADVICE r2)."""
    from interactive_vit_tpu.tools.convert import _sniff_vit_layout

    timm_sd = {"cls_token": None, "blocks.0.attn.qkv.weight": None,
               "patch_embed.proj.weight": None}
    tv_sd = {"class_token": None, "conv_proj.weight": None,
             "encoder.layers.encoder_layer_0.self_attention.in_proj_weight":
                 None}
    assert _sniff_vit_layout(timm_sd) == "timm"
    assert _sniff_vit_layout(tv_sd) == "torchvision"


def test_native_flat_roundtrip():
    """to_native_flat/from_native_flat invert each other on a ViT tree
    (lists resurface as lists, nesting preserved)."""
    import jax

    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.models.weights import (
        from_native_flat, to_native_flat,
    )

    cfg = vit.ViTConfig("t", img_size=32, patch=16, width=32, depth=2,
                        heads=2, num_classes=5)
    params = jax.device_get(vit.init_params(jax.random.key(0), cfg))
    flat = to_native_flat(params)
    assert "blocks/0/qkv_w" in flat and "patch_embed/w" in flat
    back = from_native_flat(flat)
    assert isinstance(back["blocks"], list) and len(back["blocks"]) == 2
    jax.tree.map(np.testing.assert_array_equal, params, back)


def test_qkv_head_major_unpermute_inverts():
    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.parallel.mesh import (
        permute_qkv_head_major, unpermute_qkv_head_major,
    )
    import jax

    cfg = vit.ViTConfig("t", img_size=32, patch=16, width=32, depth=2,
                        heads=4, num_classes=5)
    params = vit.init_params(jax.random.key(1), cfg)
    back = unpermute_qkv_head_major(
        permute_qkv_head_major(params, cfg.heads), cfg.heads)
    for orig, rt in zip(params["blocks"], back["blocks"]):
        np.testing.assert_array_equal(np.asarray(orig["qkv_w"]),
                                      np.asarray(rt["qkv_w"]))
        np.testing.assert_array_equal(np.asarray(orig["qkv_b"]),
                                      np.asarray(rt["qkv_b"]))


def test_jitted_init_values_match_eager():
    """Model initializers run as ONE jitted program (utils/jit_init —
    a recycled serving generation's boot cost). Values must match the
    eager path: exact tree structure, and leaves within a few ULP of
    the target dtype (XLA fuses the random-bits -> normal-transform ->
    scale/convert chain, and fused transcendentals may round a few ULP
    differently than the eager kernels; random-init weights are
    insensitive, but the drift must stay at ULP scale). On the CPU
    backend the wrapper is eager by default (suite stability — see
    utils/jit_init.py); IVT_JIT_INIT=1 forces the jitted path so this
    parity check exercises it."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from interactive_vit_tpu.models import resnet, swin, vit

    os.environ["IVT_JIT_INIT"] = "1"
    try:
        _run_jit_init_cases(jax, jnp, np, resnet, swin, vit)
    finally:
        os.environ.pop("IVT_JIT_INIT", None)


def _run_jit_init_cases(jax, jnp, np, resnet, swin, vit):
    cases = [
        ("vit_t16/f32", vit.init_params,
         (vit.VARIANTS["vit_t16"], jnp.float32)),
        ("vit_t16/bf16", vit.init_params,
         (vit.VARIANTS["vit_t16"], jnp.bfloat16)),
        ("resnet50", resnet.init_params, (10, jnp.bfloat16)),
        ("swin_t", swin.init_params, (swin.VARIANTS["swin_t"],)),
    ]
    for name, fn, args in cases:
        got = fn(jax.random.key(3), *args)
        ref = fn.__wrapped_eager__(jax.random.key(3), *args)
        lg, tg = jax.tree.flatten(got)
        lr, tr = jax.tree.flatten(ref)
        assert tg == tr, name
        for a, b in zip(lg, lr):
            af = np.asarray(a, np.float32)
            bf = np.asarray(b, np.float32)
            # 1 ULP of the leaf dtype at the leaf's scale (explicit
            # mantissa bits: bf16 = 7, f32 = 23)
            ulp = (2.0 ** -7 if np.asarray(a).dtype == jnp.bfloat16
                   else 2.0 ** -23)
            tol = np.maximum(np.abs(bf), 1e-6) * ulp * 4
            bad = np.abs(af - bf) > tol
            assert not bad.any(), (
                f"{name}: {int(bad.sum())} leaves beyond 4 ULP "
                f"(max {np.abs(af - bf).max():.3e})")
