"""ResNet-50: torch parity + the tappable node surface.

The torch oracle is built here layer-for-layer against the torchvision
``resnet50`` structure and STATE-DICT NAMING (torchvision itself is not
in this image), so ``resnet.from_torchvision`` and the forward semantics
(folded eval-mode BN, stride placement, 7x7 stem padding, global pool)
are pinned to the real checkpoint format.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from interactive_vit_tpu.models import resnet

# a narrow resnet50-SHAPED config would diverge from the converter's
# hardcoded torchvision stage table, so the oracle runs the real
# geometry at a small spatial size (64px) to stay fast on CPU
IMG = 64
N_CLASSES = 1000


class TorchBottleneck(nn.Module):
    def __init__(self, cin, width, stride):
        super().__init__()
        cout = width * 4
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class TorchResNet50(nn.Module):
    """torchvision-identical structure and state-dict key names."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        cin = 64
        for si, (blocks, width) in enumerate(resnet.STAGES):
            seq = []
            for bi in range(blocks):
                stride = 2 if (si > 0 and bi == 0) else 1
                seq.append(TorchBottleneck(cin, width, stride))
                cin = width * 4
            setattr(self, f"layer{si + 1}", nn.Sequential(*seq))
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(cin, N_CLASSES)

    @torch.no_grad()
    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(0)
    tm = TorchResNet50()
    # randomized running stats so BN folding is actually exercised
    # (fresh BatchNorm has mean=0 var=1 — the fold would be identity)
    for m in tm.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.3, 0.3)
    tm.eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    x = np.random.default_rng(0).random((2, 3, IMG, IMG)).astype(np.float32)
    logits = tm(torch.from_numpy(x)).numpy()
    return sd, x, logits


def test_forward_parity_vs_torch(oracle):
    sd, x, ref = oracle
    params = resnet.from_torchvision(sd)
    got = np.asarray(resnet.forward(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)


def test_node_chain_matches_forward(oracle):
    """The 21-node tappable decomposition composes to the monolithic
    forward (conv1 through fc; transform skipped — the oracle feeds raw
    tensors)."""
    sd, x, ref = oracle
    params = resnet.from_torchvision(sd)
    cur = {"o": jnp.asarray(x)}
    for name, _extra, fn in resnet.layer_fns():
        if name == "transform":
            continue
        cur = fn(resnet.layer_params(params, name), cur)
    np.testing.assert_allclose(np.asarray(cur["o"]), ref,
                               atol=1e-3, rtol=1e-3)


def test_served_over_the_wire(oracle):
    """resnet50 registers as a model plugin and serves its chain through
    the real executor + wire codec, logits matching torch."""
    from interactive_vit_tpu.graph.executor import Executor
    from interactive_vit_tpu.graph.ir import Graph
    from interactive_vit_tpu.graph.registry import Registry
    from interactive_vit_tpu.models.resnet_plugin import make_resnet50_model
    from interactive_vit_tpu.wire.schema import GraphLibrary

    import tempfile

    sd, x, ref = oracle
    params = resnet.from_torchvision(sd)
    reg = Registry()
    lib = GraphLibrary(tempfile.mkdtemp())
    model = make_resnet50_model(params=params)
    model.register(reg, lib)
    # the auto-generated graph JSON exists in the library
    assert lib.exists("resnet50.json")

    ex = Executor(reg)
    g = Graph()
    chain = (["resnet50:conv1", "resnet50:maxpool"]
             + [f"resnet50:layer{s + 1}.{b}"
                for s, (n, _w) in enumerate(resnet.STAGES)
                for b in range(n)]
             + ["resnet50:avgpool", "resnet50:fc"])
    nodes = [g.add_node(nm) for nm in chain]
    for a, b in zip(nodes, nodes[1:]):
        g.connect(a, "o", b, "o")
    g.add_input(x[0], nodes[0], "o")
    outs = ex.run(g, taps=[(len(nodes) - 1, "o")])
    got = np.asarray(outs[len(nodes) - 1]["o"])
    np.testing.assert_allclose(got, ref[0], atol=1e-3, rtol=1e-3)


def test_native_safetensors_roundtrip(oracle, tmp_path):
    """resnet50 round-trips through the native flat layout (nested
    list-of-list stages) and the auto-detecting converter."""
    from interactive_vit_tpu.models.weights import to_native_flat
    from interactive_vit_tpu.tools.convert import convert
    from interactive_vit_tpu.utils.safetensors_io import load_file, save_file

    sd, x, ref = oracle
    params = jax.device_get(resnet.from_torchvision(sd))
    path = str(tmp_path / "resnet50.safetensors")
    save_file(to_native_flat(params), path)
    back = convert("resnet50", "auto", load_file(path))
    got = np.asarray(resnet.forward(back, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-3)
