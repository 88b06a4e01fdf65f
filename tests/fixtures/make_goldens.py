"""Generate the committed golden fixtures in this directory.

Run manually (``python tests/fixtures/make_goldens.py``) when the fixture
format changes; the outputs are committed so the regression tests
(``tests/test_goldens.py``) never need torch or egress at test time.

What gets generated (the real-weights pipeline contract, VERDICT r1 #5):

* ``vit_golden_tv.safetensors`` — an ACTUAL checkpoint file in torchvision
  state-dict naming for a tiny ViT, written by our torch-free safetensors
  writer. The test exercises the whole file-to-logits path:
  safetensors read -> weights.from_torchvision -> vit.forward.
* ``vit_golden.npz`` — input images + the torch reference model's logits
  and per-layer attention maps for that checkpoint (the 1e-4 contract
  oracle, computed by tests/torch_vit_ref.py which matches torchvision
  vit_b_16 layer-for-layer).
* ``vgg16_golden.npz`` — input + torch-reference logits for the seeded
  deterministic VGG16 init (weights are NOT stored — 138M params — they
  regenerate from jax.random.key(11); if jax's RNG ever changes the test
  fails loudly and this script regenerates the fixture).
"""

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))  # tests/ for torch_vit_ref

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from interactive_vit_tpu.models import vgg, vit, weights  # noqa: E402
from interactive_vit_tpu.utils.safetensors_io import save_file  # noqa: E402
from torch_vit_ref import TorchViTRef  # noqa: E402

VIT_CFG = vit.ViTConfig("vit_golden", img_size=32, patch=16, width=64,
                        depth=2, heads=4, num_classes=10)


def gen_vit():
    params = vit.init_params(jax.random.key(7), VIT_CFG)
    sd = weights.to_torchvision(params, VIT_CFG)
    save_file(sd, os.path.join(HERE, "vit_golden_tv.safetensors"),
              metadata={"model": "vit_golden", "layout": "torchvision"})

    tm = TorchViTRef(VIT_CFG)
    tm.load_state_dict({k: torch.from_numpy(v.copy()) for k, v in sd.items()})
    tm.eval()
    x = np.random.default_rng(3).random((2, 3, 32, 32)).astype(np.float32)
    logits, attn = tm(torch.from_numpy(x), need_weights=True)
    np.savez_compressed(
        os.path.join(HERE, "vit_golden.npz"),
        input=x, logits=logits.numpy(), attn=attn.numpy(),
    )
    print("vit golden:", logits.shape, attn.shape)


def gen_vgg():
    from test_vgg import torch_vgg16

    params = vgg.init_params(jax.random.key(11))
    tm = torch_vgg16()
    sd = {}
    for idx in [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]:
        sd[f"features.{idx}.weight"] = np.asarray(params["features"][str(idx)]["w"])
        sd[f"features.{idx}.bias"] = np.asarray(params["features"][str(idx)]["b"])
    for idx in [0, 3, 6]:
        sd[f"classifier.{idx}.weight"] = np.asarray(
            params["classifier"][str(idx)]["w"]).T
        sd[f"classifier.{idx}.bias"] = np.asarray(params["classifier"][str(idx)]["b"])
    tm.load_state_dict(
        {k: torch.from_numpy(v.copy()) for k, v in sd.items()}, strict=False)
    tm.eval()
    x = np.random.default_rng(5).random((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        logits = tm.forward(torch.from_numpy(x)).numpy()
    np.savez_compressed(
        os.path.join(HERE, "vgg16_golden.npz"), input=x, logits=logits)
    print("vgg golden:", logits.shape)


if __name__ == "__main__":
    gen_vit()
    gen_vgg()
