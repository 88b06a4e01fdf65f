"""Client render-math contract fixtures (VERDICT r4 weak #7).

The tap->pixels transforms — min-max normalization, CHW->RGBA packing,
R/G/B channel compositing, attention head-grid indexing, query-row
spatial grids, and the overlay's bilinear-upsample + red->yellow alpha
composite — live in ``frontend/js/render.js`` (used by every viewer in
``nodes.js``) with a line-by-line Python mirror in
``interactive_vit_tpu/wire/render.py``. No JS runtime exists in this
image, so these committed {input tensor, expected u8 buffer} pairs are
the only executable pin on that math: the Python replay
(``tests/test_render_fixtures.py``) runs in CI always, and
``frontend/js/render.test.mjs`` replays the SAME file whenever a JS
runtime appears — byte equality across languages is the contract
(ECMA ToUint8Clamp rounds half-to-even; so does np.rint).

Reference semantic being preserved: the viewer merge kernel
``/root/reference/main/static/main/nodes/img_view_node.js:6-33``.

Regenerate: ``python tests/fixtures/make_render_fixtures.py``.
"""

import base64
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))  # repo root

from interactive_vit_tpu.wire import render  # noqa: E402


def b64f(a):
    return base64.b64encode(
        np.ascontiguousarray(a, np.float32).tobytes()).decode()


def b64u(a):
    return base64.b64encode(
        np.ascontiguousarray(a, np.uint8).tobytes()).decode()


def main():
    rng = np.random.default_rng(7)
    cases = []

    # -- normToU8: plain, constant-span (span||1), explicit lo/hi,
    #    half-to-even rounding probes
    for name, data, lo, hi in [
        ("norm_basic", (rng.standard_normal(37) * 3).astype(np.float32),
         None, None),
        ("norm_constant", np.full(9, 2.5, np.float32), None, None),
        ("norm_lohi", rng.random(16).astype(np.float32) * 4 - 2,
         -1.0, 1.0),
        # values landing exactly on x.5 u8 steps: 255/2 = 127.5 -> 128?
        # no: ties-to-even -> 128 is even so .5 rounds there; the point
        # is both languages agree bit-for-bit
        ("norm_ties", np.linspace(0, 1, 511).astype(np.float32),
         0.0, 1.0),
    ]:
        out = render.norm_to_u8(data, lo, hi)
        cases.append({"fn": "normToU8", "name": name,
                      "data": b64f(data),
                      "lo": lo, "hi": hi, "expected": b64u(out)})

    # -- tensorRGBA: [3,H,W], [1,H,W], [2,H,W], [H,W], bad rank
    for name, dims in [("rgb", [3, 5, 7]), ("gray3", [1, 6, 4]),
                       ("two_chan", [2, 4, 5]), ("gray2", [5, 3]),
                       ("bad_rank", [2, 2, 2, 2])]:
        data = (rng.standard_normal(int(np.prod(dims)))
                .astype(np.float32))
        r = render.tensor_rgba(dims, data)
        cases.append({
            "fn": "tensorRGBA", "name": name, "dims": dims,
            "data": b64f(data),
            "expected": None if r is None else
            {"w": r[0], "h": r[1], "rgba": b64u(r[2])}})

    # -- channelsRGBA: R+B present / only G / none
    h, w = 4, 6
    rch = rng.random((h, w)).astype(np.float32) * 2 - 1
    bch = rng.random((h, w)).astype(np.float32) * 5
    gch = rng.random((h, w)).astype(np.float32)
    for name, chans in [
        ("rb", [([h, w], rch), None, ([h, w], bch)]),
        ("g_only", [None, ([h, w], gch), None]),
        ("none", [None, None, None]),
    ]:
        r = render.channels_rgba(chans)
        cases.append({
            "fn": "channelsRGBA", "name": name,
            "chans": [None if t is None else
                      {"dims": t[0], "data": b64f(t[1])}
                      for t in chans],
            "expected": None if r is None else
            {"w": r[0], "h": r[1], "rgba": b64u(r[2])}})

    # -- attention pipeline: [B,H,N,N] tap -> maps -> thumbs -> full map
    #    -> query-row grid. N=10 -> row length 9 -> 3x3 grid.
    B, H, N = 2, 3, 10
    tap = rng.standard_normal((B, H, N, N)).astype(np.float32)
    m = render.attn_maps([B, H, N, N], tap)
    thumbs = []
    for hi in range(H):
        hm = render.head_map(m[0], m[1], hi)
        t = render.tensor_rgba(*hm)
        thumbs.append({"w": t[0], "h": t[1], "rgba": b64u(t[2])})
    head = 1
    hm = render.head_map(m[0], m[1], head)
    full = render.tensor_rgba(*hm)
    grid = render.query_row_grid(hm[1], N, 4)
    grid_rgba = render.tensor_rgba(*grid)
    cases.append({
        "fn": "attnPipeline", "name": "b2h3n10",
        "dims": [B, H, N, N], "data": b64f(tap),
        "head": head, "query": 4,
        "expected": {
            "maps_dims": m[0],
            "grid_cols": render.head_grid_cols(H),
            "thumbs": thumbs,
            "full": {"w": full[0], "h": full[1], "rgba": b64u(full[2])},
            "query_grid_dims": grid[0],
            "query_grid": {"w": grid_rgba[0], "h": grid_rgba[1],
                           "rgba": b64u(grid_rgba[2])},
        }})
    # rollout 2D map [N,N] handed to the viewer as [1,N,N] (nodes.js
    # wraps r 2D -> dims [1,...]); head clamp beyond H
    roll = rng.random((N, N)).astype(np.float32)
    m2 = render.attn_maps([1, N, N], roll)
    hm2 = render.head_map(m2[0], m2[1], 5)  # clamps to head 0
    full2 = render.tensor_rgba(*hm2)
    cases.append({
        "fn": "attnPipeline", "name": "rollout_clamp",
        "dims": [1, N, N], "data": b64f(roll),
        "head": 5, "query": 0,
        "expected": {
            "maps_dims": m2[0],
            "grid_cols": render.head_grid_cols(1),
            "thumbs": [{"w": full2[0], "h": full2[1],
                        "rgba": b64u(full2[2])}],
            "full": {"w": full2[0], "h": full2[1],
                     "rgba": b64u(full2[2])},
            "query_grid_dims":
                render.query_row_grid(hm2[1], N, 0)[0],
            "query_grid": (lambda g: {"w": g[0], "h": g[1],
                                      "rgba": b64u(g[2])})(
                render.tensor_rgba(
                    *render.query_row_grid(hm2[1], N, 0))),
        }})

    # -- overlayRGBA: RGB image + [B,H,N,N] tap; gray image + [N,N];
    #    non-square image exercises the separate sy/sx scales
    n = 17  # row length 16 -> 4x4 heat grid
    img_rgb = rng.random((3, 8, 9)).astype(np.float32) * 2 - 0.5
    tap4 = rng.standard_normal((2, 2, n, n)).astype(np.float32)
    img_gray = rng.random((1, 6, 6)).astype(np.float32)
    map2 = rng.random((n, n)).astype(np.float32)
    for name, (idims, idata), (mdims, mdata), q, al in [
        ("rgb_4d", ([3, 8, 9], img_rgb), ([2, 2, n, n], tap4), 0, 0.6),
        ("gray_2d", ([1, 6, 6], img_gray), ([n, n], map2), 3, 0.35),
        ("alpha_one", ([3, 8, 9], img_rgb), ([n, n], map2), 99, 1.0),
    ]:
        r = render.overlay_rgba(idims, idata, mdims, mdata, q, al)
        cases.append({
            "fn": "overlayRGBA", "name": name,
            "img": {"dims": idims, "data": b64f(idata)},
            "map": {"dims": mdims, "data": b64f(mdata)},
            "query": q, "alpha": al,
            "expected": None if r is None else
            {"w": r[0], "h": r[1], "rgba": b64u(r[2])}})

    out = os.path.join(HERE, "render_fixtures.json")
    with open(out, "w") as f:
        json.dump({"cases": cases}, f, indent=1)
    print(f"wrote {out}: {len(cases)} cases")


if __name__ == "__main__":
    main()
