"""Client render-math contract (VERDICT r4 weak #7).

``frontend/js/render.js`` turns taps into pixels for every viewer;
``interactive_vit_tpu/wire/render.py`` is its Python transliteration.
Two layers of defense here:

1. Fixture replay: the committed ``render_fixtures.json`` buffers must
   be byte-reproduced by the mirror — any drift in either side (or a
   regeneration that silently changes semantics) fails CI.
   ``frontend/js/render.test.mjs`` replays the SAME file in JS when a
   runtime exists.
2. Independent semantic probes: hand-computed expectations (not derived
   from the mirror) for normalization, channel packing, head/query
   indexing, and overlay compositing — so the fixtures can't be
   circularly wrong.

Reference semantic: ``/root/reference/main/static/main/nodes/
img_view_node.js:6-33`` (merge kernel; per-channel accumulate + clamp).
"""

import base64
import json
import os

import numpy as np
import pytest

from interactive_vit_tpu.wire import render

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURES = os.path.join(HERE, "fixtures", "render_fixtures.json")


def u8(b):
    return np.frombuffer(base64.b64decode(b), np.uint8)


def f32(b):
    return np.frombuffer(base64.b64decode(b), np.float32)


@pytest.fixture(scope="module")
def cases():
    with open(FIXTURES) as f:
        return json.load(f)["cases"]


def by_fn(cases, fn):
    return [c for c in cases if c["fn"] == fn]


# ---- fixture replay -------------------------------------------------------


def test_norm_to_u8_replay(cases):
    for c in by_fn(cases, "normToU8"):
        got = render.norm_to_u8(f32(c["data"]), c["lo"], c["hi"])
        np.testing.assert_array_equal(got, u8(c["expected"]), c["name"])


def test_tensor_rgba_replay(cases):
    for c in by_fn(cases, "tensorRGBA"):
        got = render.tensor_rgba(c["dims"], f32(c["data"]))
        if c["expected"] is None:
            assert got is None, c["name"]
            continue
        w, h, rgba = got
        assert (w, h) == (c["expected"]["w"], c["expected"]["h"])
        np.testing.assert_array_equal(
            rgba, u8(c["expected"]["rgba"]), c["name"])


def test_channels_rgba_replay(cases):
    for c in by_fn(cases, "channelsRGBA"):
        chans = [None if t is None else (t["dims"], f32(t["data"]))
                 for t in c["chans"]]
        got = render.channels_rgba(chans)
        if c["expected"] is None:
            assert got is None, c["name"]
            continue
        w, h, rgba = got
        assert (w, h) == (c["expected"]["w"], c["expected"]["h"])
        np.testing.assert_array_equal(
            rgba, u8(c["expected"]["rgba"]), c["name"])


def test_attn_pipeline_replay(cases):
    for c in by_fn(cases, "attnPipeline"):
        exp = c["expected"]
        m = render.attn_maps(c["dims"], f32(c["data"]))
        assert m[0] == exp["maps_dims"], c["name"]
        H = m[0][0]
        assert render.head_grid_cols(H) == exp["grid_cols"]
        for hi, texp in enumerate(exp["thumbs"]):
            hm = render.head_map(m[0], m[1], hi)
            w, h, rgba = render.tensor_rgba(*hm)
            np.testing.assert_array_equal(rgba, u8(texp["rgba"]),
                                          f"{c['name']} thumb {hi}")
        hm = render.head_map(m[0], m[1], c["head"])
        w, h, rgba = render.tensor_rgba(*hm)
        np.testing.assert_array_equal(rgba, u8(exp["full"]["rgba"]))
        grid = render.query_row_grid(hm[1], m[0][1], c["query"])
        assert grid[0] == exp["query_grid_dims"]
        _, _, grgba = render.tensor_rgba(*grid)
        np.testing.assert_array_equal(
            grgba, u8(exp["query_grid"]["rgba"]), c["name"])


def test_overlay_replay(cases):
    for c in by_fn(cases, "overlayRGBA"):
        got = render.overlay_rgba(
            c["img"]["dims"], f32(c["img"]["data"]),
            c["map"]["dims"], f32(c["map"]["data"]),
            c["query"], c["alpha"])
        if c["expected"] is None:
            assert got is None, c["name"]
            continue
        w, h, rgba = got
        assert (w, h) == (c["expected"]["w"], c["expected"]["h"])
        np.testing.assert_array_equal(
            rgba, u8(c["expected"]["rgba"]), c["name"])


# ---- independent semantic probes (hand-computed, not mirror-derived) ------


def test_norm_semantics_hand_computed():
    # [0, 1, 2, 4] -> min 0 span 4 -> [0, 63.75, 127.5, 255]
    # ToUint8Clamp rounds half-to-even: 63.75->64, 127.5->128 (even)
    got = render.norm_to_u8(np.array([0, 1, 2, 4], np.float32))
    np.testing.assert_array_equal(got, [0, 64, 128, 255])
    # 0.5-steps tie to even: 0.5->0, 1.5->2, 2.5->2
    got = render.norm_to_u8(
        np.array([0.5, 1.5, 2.5], np.float32), 0.0, 255.0)
    np.testing.assert_array_equal(got, [0, 2, 2])
    # constant input: span falls back to 1, everything maps to 0
    got = render.norm_to_u8(np.full(4, 3.0, np.float32))
    np.testing.assert_array_equal(got, [0, 0, 0, 0])
    # explicit lo/hi clamps out-of-range values
    got = render.norm_to_u8(
        np.array([-2.0, 0.0, 0.5, 3.0], np.float32), 0.0, 1.0)
    np.testing.assert_array_equal(got, [0, 0, 128, 255])


def test_tensor_rgba_channel_packing_hand_computed():
    # 3x1x2 CHW with per-channel distinct values; joint normalization
    data = np.array([0, 6, 1, 2, 3, 5], np.float32)  # min 0 max 6
    w, h, rgba = render.tensor_rgba([3, 1, 2], data)
    assert (w, h) == (2, 1)
    px0 = rgba[0:4]   # r=0, g=1/6, b=3/6
    px1 = rgba[4:8]   # r=6/6, g=2/6, b=5/6
    np.testing.assert_array_equal(px0, [0, 42, 128, 255])
    np.testing.assert_array_equal(px1, [255, 85, 212, 255])
    # grayscale replicates channel 0
    w, h, rgba = render.tensor_rgba([2, 2], np.array(
        [0, 1, 2, 3], np.float32))
    assert rgba[0] == rgba[1] == rgba[2] == 0
    assert rgba[12] == rgba[13] == rgba[14] == 255


def test_channels_rgba_independent_normalization():
    # R spans [0,10], B spans [0,1]: each channel normalizes alone
    r = ([1, 2], np.array([0.0, 10.0], np.float32))
    b = ([1, 2], np.array([0.0, 1.0], np.float32))
    w, h, rgba = render.channels_rgba([r, None, b])
    assert (w, h) == (2, 1)
    np.testing.assert_array_equal(rgba[0:4], [0, 0, 0, 255])
    np.testing.assert_array_equal(rgba[4:8], [255, 0, 255, 255])


def test_attn_indexing_hand_computed():
    # head h, row q of an identifiable tensor: value = h*100 + i*10 + j
    H, N = 2, 5
    t = np.zeros((1, H, N, N), np.float32)
    for hh in range(H):
        for i in range(N):
            for j in range(N):
                t[0, hh, i, j] = hh * 100 + i * 10 + j
    m = render.attn_maps([1, H, N, N], t)
    dims, data = render.head_map(m[0], m[1], 1)
    assert dims == [N, N]
    assert data[0] == 100.0 and data[N * N - 1] == 144.0
    # query row 2 = [120..124], CLS col skipped -> [121, 122, 123, 124]
    grid = render.query_row_grid(data, N, 2)
    assert grid[0] == [2, 2]
    np.testing.assert_array_equal(grid[1], [121, 122, 123, 124])
    # query clamp: q >= N uses the last row
    grid = render.query_row_grid(data, N, 99)
    np.testing.assert_array_equal(grid[1], [141, 142, 143, 144])


def test_overlay_alpha_extremes_hand_computed():
    # alpha=0: output IS the normalized image (heat invisible)
    img = np.arange(3 * 3, dtype=np.float32)
    img_dims = [1, 3, 3]
    n = 5  # row length 4 -> side 2
    mp = np.random.default_rng(0).random((n, n)).astype(np.float32)
    w, h, rgba = render.overlay_rgba(img_dims, img, [n, n], mp, 0, 0.0)
    base = render.norm_to_u8(img)
    np.testing.assert_array_equal(rgba[0::4], base)
    np.testing.assert_array_equal(rgba[1::4], base)
    np.testing.assert_array_equal(rgba[2::4], base)
    # alpha=1 at the hottest heat cell: pure ramp color (255, 255, 0)
    mp2 = np.zeros((n, n), np.float32)
    mp2[0, 1] = 1.0  # row 0 minus CLS -> heat[0] hottest
    w, h, rgba = render.overlay_rgba(
        img_dims, img, [n, n], mp2, 0, 1.0)
    # pixel (0,0) maps to heat corner (0,0) = 255 -> hv=1, a=1
    np.testing.assert_array_equal(rgba[0:4], [255, 255, 0, 255])


def test_overlay_rejects_bad_shapes():
    img = np.zeros(12, np.float32)
    assert render.overlay_rgba([12], img, [3, 3],
                               np.zeros(9, np.float32), 0, 0.5) is None
    assert render.overlay_rgba([3, 2, 2], img, [2, 3],
                               np.zeros(6, np.float32), 0, 0.5) is None
    # N too small for a >=2x2 grid
    assert render.overlay_rgba([3, 2, 2], img, [3, 3],
                               np.zeros(9, np.float32), 0, 0.5) is None
