"""ivt-eval: batched top-k evaluation CLI (tools/evaluate.py).

The reference has no evaluation tier at all (accuracy = trusting the
torchvision download, ``/root/reference/static/models/vgg16.py:11-14``);
these pin the chunking/padding math, the family dispatch, and the two
data paths end-to-end through ``main()``.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import vit
from interactive_vit_tpu.tools import evaluate as E


def test_run_eval_padding_and_topk():
    """A short final chunk pads by repetition and must not count the
    padded rows; top-k counts a hit anywhere in the first k."""
    batch, classes = 4, 6

    def infer(params, x):
        # true class lands at rank 1 for even ids, rank 2 for odd ids
        n = x.shape[0]
        ids = jnp.asarray(x[:, 0, 0, 0], jnp.int32)  # label smuggled in
        base = jnp.linspace(1.0, 0.0, classes)[None, :].repeat(n, axis=0)
        tgt = jnp.where(ids % 2 == 0, 10.0, 0.9)  # 0.9: between top two
        onehot = jax.nn.one_hot(ids, classes)
        return base * (1 - onehot) + onehot * tgt[:, None]

    labels = np.array([0, 1, 2, 3, 4, 5, 0], np.int64)  # 7 = 4 + short 3
    images = np.zeros((7, 1, 1, 1), np.float32)
    images[:, 0, 0, 0] = labels

    def chunks():
        for lo in range(0, 7, batch):
            yield images[lo:lo + batch], labels[lo:lo + batch]

    n, h1, hk = E.run_eval(infer, None, chunks(), batch, top_k=3)
    assert n == 7
    # even ids (0,2,4,0) dominate -> top-1 hits; odd ids rank second
    assert h1 == 4
    assert hk == 7


def test_dispatch_rejects_headless_and_unknown():
    with pytest.raises(ValueError, match="feature extractor"):
        E.make_logits_fn("dino_s16")
    with pytest.raises(ValueError, match="no evaluation path"):
        E.make_logits_fn("clip_b32")
    # @ suffixes on non-ViT families get the clean contract error, not
    # a VARIANTS KeyError (review finding)
    with pytest.raises(ValueError, match="plain-ViT family"):
        E.make_logits_fn("swin_t@256")
    with pytest.raises(ValueError, match="plain-ViT family"):
        E.make_logits_fn("convnext_t@256")


def test_data_evaluates_every_sample_including_tail(tmp_path, capsys):
    """n % batch != 0: the tail must still be evaluated (the training
    loader's full-batch epochs would drop it; review finding)."""
    from unittest import mock

    micro = vit.ViTConfig("vit_nano", img_size=16, patch=8, width=32,
                          depth=1, heads=2, num_classes=8)
    n = 19  # 2 full batches of 8 + a 3-sample tail
    images = np.random.default_rng(3).random((n, 3, 16, 16)).astype(
        np.float32)
    labels = np.random.default_rng(4).integers(0, 8, n).astype(np.int64)
    np.save(tmp_path / "val_images.npy", images)
    np.save(tmp_path / "val_labels.npy", labels)
    with mock.patch.dict(vit.VARIANTS, {"vit_nano": micro}):
        E.main(["--variant", "vit_nano", "--data", str(tmp_path / "val"),
                "--batch", "8", "--platform", "cpu"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n"] == 19


def test_ckpt_adapts_to_derived_geometry(tmp_path, capsys):
    """An orbax-dir checkpoint at native geometry evaluates under an
    @res variant (adapt_checkpoint on the eval path; review finding)."""
    from unittest import mock

    from interactive_vit_tpu.utils.checkpoint import save_params

    micro = vit.ViTConfig("vit_nano", img_size=16, patch=8, width=32,
                          depth=1, heads=2, num_classes=8)
    params = vit.init_params(jax.random.key(0), micro)
    ck = tmp_path / "nano_ckpt"
    save_params(str(ck), params)
    with mock.patch.dict(vit.VARIANTS, {"vit_nano": micro}):
        E.main(["--variant", "vit_nano@32", "--ckpt", str(ck),
                "--memorize", "8", "--distinct-classes", "8",
                "--batch", "8", "--platform", "cpu"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["variant"] == "vit_nano@32" and out["n"] == 8


def test_main_memorize_smoke(capsys):
    from unittest import mock

    micro = vit.ViTConfig("vit_nano", img_size=16, patch=8, width=32,
                          depth=1, heads=2, num_classes=8)
    with mock.patch.dict(vit.VARIANTS, {"vit_nano": micro}):
        E.main(["--variant", "vit_nano", "--memorize", "10",
                "--distinct-classes", "8", "--batch", "8",
                "--platform", "cpu"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["variant"] == "vit_nano" and out["n"] == 10
    assert 0.0 <= out["top1"] <= out["top5"] <= 1.0
    assert out["imgs_per_s"] > 0


def test_main_data_shards(tmp_path, capsys):
    from unittest import mock

    micro = vit.ViTConfig("vit_nano", img_size=16, patch=8, width=32,
                          depth=1, heads=2, num_classes=8)
    n = 20  # full-batch loader: epoch 0 = 2 batches of 8, limit cuts at 9
    images = np.random.default_rng(0).random((n, 3, 16, 16)).astype(
        np.float32)
    labels = np.random.default_rng(1).integers(0, 8, n).astype(np.int64)
    np.save(tmp_path / "val_images.npy", images)
    np.save(tmp_path / "val_labels.npy", labels)
    with mock.patch.dict(vit.VARIANTS, {"vit_nano": micro}):
        E.main(["--variant", "vit_nano", "--data", str(tmp_path / "val"),
                "--batch", "8", "--limit", "9", "--platform", "cpu"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n"] == 9  # --limit respected across chunks


def test_trained_oracle_reaches_full_accuracy(tmp_path):
    """train (memorize) -> export safetensors -> ivt-eval reads ~1.0:
    the eval tool agrees with the training-loop metric end-to-end."""
    import json as _json

    from interactive_vit_tpu.tools import train as T

    from unittest import mock

    micro = vit.ViTConfig("vit_nano", img_size=16, patch=8, width=48,
                          depth=2, heads=2, num_classes=4)
    st = tmp_path / "nano.safetensors"
    with mock.patch.dict(vit.VARIANTS, {"vit_nano": micro}):
        T.main(["--variant", "vit_nano", "--steps", "120", "--batch", "16",
                "--memorize", "8", "--distinct-classes", "4",
                "--lr", "3e-3", "--platform", "cpu", "--remat", "off",
                "--export-safetensors", str(st), "--log-every", "100"])
        import subprocess
        import sys

        # fresh process: proves the artifact + CLI path, not the session
        r = subprocess.run(
            [sys.executable, "-c",
             "from unittest import mock\n"
             "from interactive_vit_tpu.models import vit\n"
             f"micro = vit.ViTConfig('vit_nano', img_size=16, patch=8, "
             f"width=48, depth=2, heads=2, num_classes=4)\n"
             "with mock.patch.dict(vit.VARIANTS, {'vit_nano': micro}):\n"
             "    from interactive_vit_tpu.tools import evaluate\n"
             f"    evaluate.main(['--variant', 'vit_nano', '--ckpt', "
             f"{str(st)!r}, '--memorize', '8', '--distinct-classes', "
             f"'4', '--batch', '8', '--platform', 'cpu'])\n"],
            capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stderr[-2000:]
        out = _json.loads(r.stdout.strip().splitlines()[-1])
    assert out["top1"] >= 0.9, out
