"""Headless graph-runner CLI (tools/run_graph.py): saved graph -> taps on
disk, no browser in the loop (the reference required one: load.js:4-66)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def img(tmp_path):
    from PIL import Image

    p = str(tmp_path / "in.png")
    a = (np.random.default_rng(0).random((64, 48, 3)) * 255).astype("uint8")
    Image.fromarray(a).save(p)
    return p


def test_demo_graph_to_taps(tmp_path, img):
    from interactive_vit_tpu.tools.run_graph import main

    out = str(tmp_path / "taps")
    rc = main(["demo_noise", "--taps", "all", "--out", out])
    assert rc == 0
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert man  # every tap has an .npy
    for stem, meta in man.items():
        a = np.load(os.path.join(out, stem + ".npy"))
        assert list(a.shape) == meta["shape"]


def test_dino_graph_renders_feature_views(tmp_path, img):
    from interactive_vit_tpu.tools.run_graph import main

    out = str(tmp_path / "taps")
    rc = main(["dino_s16", "--image", img, "--out", out,
               "--dtype", "float32"])
    assert rc == 0
    man = json.load(open(os.path.join(out, "manifest.json")))
    pca = [m for m in man.values() if m["name"] == "pca_view"]
    sim = [m for m in man.values() if m["name"] == "patch_sim"]
    assert pca and pca[0]["png"] and pca[0]["shape"] == [1, 3, 14, 14]
    assert sim and sim[0]["png"]
    # the rollout map rendered as a square heatmap png
    rmaps = [s for s, m in man.items() if m["channel"] == "r"]
    assert rmaps and os.path.exists(os.path.join(out, rmaps[0] + ".png"))


def test_missing_image_is_a_clear_error(tmp_path):
    from interactive_vit_tpu.tools.run_graph import main

    assert main(["dino_s16", "--out", str(tmp_path)]) == 2
    assert main(["no_such_graph", "--out", str(tmp_path)]) == 2


def test_dangling_sink_does_not_demand_image(tmp_path, img):
    """A disconnected viewer node (routine leftover from UI editing) must
    neither hard-fail the headless run without --image nor get the raw
    image bound to it when --image IS given — image binding targets roots
    something downstream consumes (plus explicit img_src)."""
    from interactive_vit_tpu.tools.run_graph import main

    obj = json.load(open("static/graphs/demo_slice.json"))
    obj["nodes"].append({"instance": {"kind": "img_view"},
                         "pos": {"x": 0, "y": 0}})
    gp = str(tmp_path / "g.json")
    json.dump(obj, open(gp, "w"))
    sink_idx = len(obj["nodes"]) - 1

    out = str(tmp_path / "taps")
    rc = main([gp, "--image", img, "--out", out])
    assert rc == 0
    man = json.load(open(os.path.join(out, "manifest.json")))
    assert not [m for m in man.values() if m["node"] == sink_idx]
