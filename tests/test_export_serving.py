"""Serve-from-artifact mode (VERDICT r3 #7).

``ivt-server --from-export <dir>`` boots the reference HTTP surface from
an AOT artifact with NO registry/model/plugin code. These tests pin the
contract: byte-level /compute parity with the live stack for both
request shapes (the exported saved-graph shape and the client's
stripped-sources-and-viewers shape), race-free dynamic-param edits,
rejection of anything needing a recompile, and the metadata endpoints.
Reference surface: ``/root/reference/main/urls.py:7-14``.
"""

import base64
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from interactive_vit_tpu.graph.executor import Executor
from interactive_vit_tpu.graph.ir import Graph
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.graph.export import export_graph
from interactive_vit_tpu.ops.node_ops import register_builtin
from interactive_vit_tpu.serving.export_app import ExportApp, MatchError
from interactive_vit_tpu.wire.codec import (
    REQUEST_MAGIC, Response, encode_message,
)
from interactive_vit_tpu.wire.schema import graph_from_json

X = np.linspace(0.0, 1.0, 8, dtype=np.float32)

SAVED = {
    # img_src -> cos -> slice -> img_view: a source, a dynamic-param
    # node, a static-param node and a viewer — every matching case
    "nodes": [
        {"instance": {"kind": "img_src"}, "pos": {"x": 0, "y": 0}},
        {"instance": {"kind": "net_node", "endpoint": "cos",
                      "params": {"A": "2.0", "b": "0.5"}},
         "pos": {"x": 200, "y": 0}},
        {"instance": {"kind": "slice",
                      "fixed": [{"dim": 0, "val": 1}],
                      "free": [{"in_dim": 1, "out_dim": 0}]},
         "pos": {"x": 400, "y": 0}},
        {"instance": {"kind": "img_view"}, "pos": {"x": 600, "y": 0}},
    ],
    "edges": [
        {"in_port": {"node": 0, "channel": "o"},
         "out_port": {"node": 1, "channel": "o"}},
        {"in_port": {"node": 1, "channel": "o"},
         "out_port": {"node": 2, "channel": "o"}},
        {"in_port": {"node": 2, "channel": "o"},
         "out_port": {"node": 3, "channel": "o"}},
    ],
}


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    reg = Registry()
    register_builtin(reg)
    g = graph_from_json(SAVED)
    g.add_input(np.zeros((2, 4), np.float32), g.nodes[0], "o")
    out_dir = str(tmp_path_factory.mktemp("artifact"))
    export_graph(g, out_dir, taps="primary",
                 executor=Executor(reg), client_graph=SAVED)
    app = ExportApp(out_dir, frontend_dir=None)
    httpd = app.serve("127.0.0.1", 0, background=True)
    yield app, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(base, req_json, tensors):
    body = bytes(encode_message(REQUEST_MAGIC, req_json, tensors))
    r = urllib.request.Request(base + "/compute", data=body,
                               method="POST")
    return Response.decode(urllib.request.urlopen(r).read())


def client_request(a="2.0", fixed=None, taps=((0, "o"), (1, "o"))):
    """The request the browser ships for SAVED: sources/viewers
    stripped, tensor ref on cos, viewer edge as a tap."""
    return {
        "nodes": [
            {"endpoint": "cos", "params": {"A": a, "b": "0.5"}},
            {"endpoint": "slice", "params": {
                "fixed": json.dumps(
                    fixed or [{"dim": 0, "val": 1}],
                    separators=(",", ":")),
                "free": json.dumps([{"in_dim": 1, "out_dim": 0}],
                                   separators=(",", ":"))}},
        ],
        "edges": [
            {"out_port": {"node": 0, "channel": "o"}, "tensor": 0},
            {"out_port": {"node": 1, "channel": "o"},
             "in_port": {"node": 0, "channel": "o"}},
        ],
        "taps": [{"node": n, "channel": c} for n, c in taps],
    }


def test_client_shape_computes(served):
    _, base = served
    img = np.arange(8, dtype=np.float32).reshape(2, 4) / 8
    outs = _post(base, client_request(), [img])
    np.testing.assert_allclose(
        outs[0]["o"], np.cos(2.0 * img + 0.5), rtol=1e-6)
    np.testing.assert_allclose(
        outs[1]["o"], np.cos(2.0 * img + 0.5)[1, :], rtol=1e-6)


def test_dynamic_param_edit_no_recompile(served):
    """Editing cos A serves new values from the SAME program (captures
    are runtime args — the live executor's interactivity contract)."""
    _, base = served
    img = np.arange(8, dtype=np.float32).reshape(2, 4) / 8
    outs = _post(base, client_request(a="5.0"), [img])
    np.testing.assert_allclose(
        outs[0]["o"], np.cos(5.0 * img + 0.5), rtol=1e-6)


def test_static_param_change_is_rejected(served):
    _, base = served
    img = np.zeros((2, 4), np.float32)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, client_request(fixed=[{"dim": 0, "val": 0}]), [img])
    assert ei.value.code == 400
    msg = ei.value.read().decode()
    assert "static param" in msg and "node 1" in msg


def test_exported_shape_also_computes(served):
    """ivt-run-exported style callers ship the saved-graph shape
    (sources and viewers included) — the identity view serves it."""
    _, base = served
    img = np.arange(8, dtype=np.float32).reshape(2, 4) / 8
    req = {
        "nodes": [
            {"endpoint": "img_src", "params": {}},
            {"endpoint": "cos", "params": {"A": "2.0", "b": "0.5"}},
            {"endpoint": "slice", "params": {
                "fixed": json.dumps([{"dim": 0, "val": 1}],
                                    separators=(",", ":")),
                "free": json.dumps([{"in_dim": 1, "out_dim": 0}],
                                   separators=(",", ":"))}},
            {"endpoint": "img_view", "params": {}},
        ],
        "edges": [
            {"out_port": {"node": 0, "channel": "o"}, "tensor": 0},
            {"out_port": {"node": 1, "channel": "o"},
             "in_port": {"node": 0, "channel": "o"}},
            {"out_port": {"node": 2, "channel": "o"},
             "in_port": {"node": 1, "channel": "o"}},
            {"out_port": {"node": 3, "channel": "o"},
             "in_port": {"node": 2, "channel": "o"}},
        ],
        "taps": [{"node": 1, "channel": "o"}],
    }
    outs = _post(base, req, [img])
    np.testing.assert_allclose(
        outs[1]["o"], np.cos(2.0 * img + 0.5), rtol=1e-6)


def test_wrong_topology_rejected(served):
    _, base = served
    req = client_request()
    req["nodes"].append({"endpoint": "cos", "params": {}})
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, req, [np.zeros((2, 4), np.float32)])
    assert ei.value.code == 400
    assert "fixed program" in ei.value.read().decode()


def test_unexported_tap_rejected(served):
    _, base = served
    req = client_request(taps=((0, "nope"),))
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, req, [np.zeros((2, 4), np.float32)])
    assert ei.value.code == 400
    assert "not exported" in ei.value.read().decode()


def test_metadata_endpoints(served):
    _, base = served
    d = json.load(urllib.request.urlopen(base + "/description/cos"))
    assert d == {"ins": ["o"], "outs": ["o"]}
    html = urllib.request.urlopen(base + "/contents/cos").read().decode()
    assert "cos" in html
    graphs = json.load(urllib.request.urlopen(base + "/list_graphs"))
    assert graphs
    obj = json.load(urllib.request.urlopen(
        base + "/load_graph/" + graphs[0]))
    assert obj == SAVED
    h = json.load(urllib.request.urlopen(base + "/health"))
    assert h["ok"] and h["mode"] == "from-export"


def test_parity_with_live_executor(served):
    """The artifact's /compute numerically matches the live stack on
    the same request (the deployment gate)."""
    app, base = served
    img = np.random.default_rng(3).random((2, 4)).astype(np.float32)
    outs = _post(base, client_request(a="3.25"), [img])
    reg = Registry()
    register_builtin(reg)
    g = Graph()
    n = g.add_node("cos", {"A": "3.25", "b": "0.5"})
    g.add_input(img, n, "o")
    live = Executor(reg).run(g, taps="all")
    np.testing.assert_allclose(outs[0]["o"], live[0]["o"], rtol=1e-6)


def test_concurrent_edits_do_not_race(served):
    """Two concurrent requests with different A values each get their
    own answer (per-request capture overlays, no shared-state edit)."""
    import concurrent.futures

    _, base = served
    img = np.arange(8, dtype=np.float32).reshape(2, 4) / 8

    def one(a):
        outs = _post(base, client_request(a=str(a)), [img])
        return outs[0]["o"]

    with concurrent.futures.ThreadPoolExecutor(8) as pool:
        futs = {pool.submit(one, a): a for a in
                [1.0, 2.0, 3.0, 4.0] * 4}
        for f, a in futs.items():
            np.testing.assert_allclose(
                f.result(), np.cos(a * img + 0.5), rtol=1e-6)


NOISE_SAVED = {
    "nodes": [
        {"instance": {"kind": "noise", "dims": [2, 5, 5], "seed": 7},
         "pos": {"x": 0, "y": 0}},
        {"instance": {"kind": "multi_view"}, "pos": {"x": 200, "y": 0}},
    ],
    "edges": [
        {"in_port": {"node": 0, "channel": "o"},
         "out_port": {"node": 1, "channel": "o"}},
    ],
}


@pytest.fixture(scope="module")
def multi_served(tmp_path_factory):
    """Two artifacts (the cos-slice workflow + a nullary noise demo)
    behind ONE MultiExportApp server."""
    from interactive_vit_tpu.serving.export_app import MultiExportApp

    reg = Registry()
    register_builtin(reg)
    d1 = str(tmp_path_factory.mktemp("art_cos"))
    g = graph_from_json(SAVED)
    g.add_input(np.zeros((2, 4), np.float32), g.nodes[0], "o")
    export_graph(g, d1, taps="primary", executor=Executor(reg),
                 client_graph=SAVED,
                 provenance={"graph": "cos_slice.json"})
    d2 = str(tmp_path_factory.mktemp("art_noise"))
    g2 = graph_from_json(NOISE_SAVED)
    export_graph(g2, d2, taps="primary", executor=Executor(reg),
                 client_graph=NOISE_SAVED,
                 provenance={"graph": "noise_demo.json"})
    app = MultiExportApp([d1, d2], frontend_dir=None)
    httpd = app.serve("127.0.0.1", 0, background=True)
    yield app, f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_multi_artifact_routes_by_shape(multi_served):
    _, base = multi_served
    img = np.arange(8, dtype=np.float32).reshape(2, 4) / 8
    outs = _post(base, client_request(a="1.5"), [img])
    np.testing.assert_allclose(
        outs[0]["o"], np.cos(1.5 * img + 0.5), rtol=1e-6)
    # the nullary noise workflow routes to the second artifact
    req = {"nodes": [{"endpoint": "noise",
                      "params": {"dims": "[2,5,5]", "seed": "7"}}],
           "edges": [], "taps": [{"node": 0, "channel": "o"}]}
    outs = _post(base, req, [])
    assert outs[0]["o"].shape == (2, 5, 5)
    assert np.isfinite(outs[0]["o"]).all()


def test_multi_artifact_metadata_union(multi_served):
    _, base = multi_served
    graphs = json.load(urllib.request.urlopen(base + "/list_graphs"))
    assert len(graphs) == 2
    for g in graphs:
        obj = json.load(urllib.request.urlopen(
            base + "/load_graph/" + g))
        assert "nodes" in obj
    d = json.load(urllib.request.urlopen(base + "/description/noise"))
    assert d["outs"] == ["o"]
    d = json.load(urllib.request.urlopen(base + "/description/cos"))
    assert d == {"ins": ["o"], "outs": ["o"]}
    h = json.load(urllib.request.urlopen(base + "/health"))
    assert h["ok"] and len(h["artifacts"]) == 2


def test_multi_artifact_no_match_is_400(multi_served):
    _, base = multi_served
    req = {"nodes": [{"endpoint": "resize", "params": {}}],
           "edges": [{"out_port": {"node": 0, "channel": "o"},
                      "tensor": 0}],
           "taps": [{"node": 0, "channel": "o"}]}
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, req, [np.zeros((3, 4, 4), np.float32)])
    assert ei.value.code == 400
    assert "no artifact matches" in ei.value.read().decode()


def test_multi_artifact_same_names_different_shapes(tmp_path):
    """Routing is by FULL match, not node names: the same workflow
    exported at two input shapes both stay reachable (review r4)."""
    from interactive_vit_tpu.serving.export_app import MultiExportApp
    from interactive_vit_tpu.wire.codec import Request

    reg = Registry()
    register_builtin(reg)
    dirs = []
    for i, n in enumerate((4, 8)):
        g = Graph()
        node = g.add_node("cos", {"A": "2.0", "b": "0.0"})
        g.add_input(np.zeros((n,), np.float32), node, "o")
        d = str(tmp_path / f"a{i}")
        export_graph(g, d, taps="primary", executor=Executor(reg))
        dirs.append(d)
    app = MultiExportApp(dirs, frontend_dir=None)

    for n in (4, 8):
        x = np.linspace(0, 1, n, dtype=np.float32)
        req = {"nodes": [{"endpoint": "cos",
                          "params": {"A": "2.0", "b": "0.0"}}],
               "edges": [{"out_port": {"node": 0, "channel": "o"},
                          "tensor": 0}],
               "taps": [{"node": 0, "channel": "o"}]}
        body = bytes(encode_message(REQUEST_MAGIC, req, [x]))
        outs = Response.decode(app.compute(body))
        np.testing.assert_allclose(outs[0]["o"], np.cos(2.0 * x),
                                   rtol=1e-6)


def test_params_aware_contents(tmp_path):
    """Two same-kind nodes with different params render their OWN
    contents through /contents?params (review r4 — the live surface is
    params-aware, serving/app.py)."""
    from interactive_vit_tpu.serving.export_app import ExportApp

    reg = Registry()
    register_builtin(reg)
    g = Graph()
    a = g.add_node("cos", {"A": "2.0", "b": "0.5"})
    bnode = g.add_node("cos", {"A": "7.0", "b": "0.25"})
    g.connect(a, "o", bnode, "o")
    g.add_input(np.zeros((4,), np.float32), a, "o")
    d = str(tmp_path / "art")
    export_graph(g, d, taps="primary", executor=Executor(reg))
    app = ExportApp(d, frontend_dir=None)
    c1 = app.contents("cos", {"A": "2.0", "b": "0.5"})
    c2 = app.contents("cos", {"A": "7.0", "b": "0.25"})
    assert "2.0" in c1 and "7.0" in c2 and c1 != c2
    # unknown params fall back to the first same-name node
    assert app.contents("cos", {"A": "99"}) == c1
    assert app.description("cos", None) == {"ins": ["o"], "outs": ["o"]}


def test_save_graph_rejected_read_only(served):
    _, base = served
    with pytest.raises(urllib.error.HTTPError) as ei:
        req = urllib.request.Request(
            base + "/save_graph/x.json", data=b"{}", method="POST")
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    assert "read-only" in ei.value.read().decode()


def test_preview_only_source_boots_identity_view(tmp_path):
    """A saved graph whose source feeds ONLY viewer nodes (an img_src ->
    img_view preview branch beside the model chain) has no client view —
    the artifact must still BOOT and serve the identity view instead of
    refusing with ExportError (advisor r4)."""
    reg = Registry()
    register_builtin(reg)
    saved = {
        "nodes": [
            {"instance": {"kind": "img_src"}, "pos": {"x": 0, "y": 0}},
            {"instance": {"kind": "img_view"}, "pos": {"x": 1, "y": 0}},
            {"instance": {"kind": "img_src"}, "pos": {"x": 0, "y": 1}},
            {"instance": {"kind": "net_node", "endpoint": "cos",
                          "params": {"A": "2.0", "b": "0.5"}},
             "pos": {"x": 1, "y": 1}},
            {"instance": {"kind": "img_view"}, "pos": {"x": 2, "y": 1}},
        ],
        "edges": [
            {"in_port": {"node": 0, "channel": "o"},
             "out_port": {"node": 1, "channel": "o"}},
            {"in_port": {"node": 2, "channel": "o"},
             "out_port": {"node": 3, "channel": "o"}},
            {"in_port": {"node": 3, "channel": "o"},
             "out_port": {"node": 4, "channel": "o"}},
        ],
    }
    x = X.reshape(2, 4)
    g = graph_from_json(saved)
    g.add_input(x, g.nodes[0], "o")
    g.add_input(x, g.nodes[2], "o")
    out_dir = str(tmp_path / "preview_artifact")
    export_graph(g, out_dir, taps="primary", executor=Executor(reg),
                 client_graph=saved)
    app = ExportApp(out_dir, frontend_dir=None)  # must not raise
    assert len(app.views) == 1  # identity only
    req = {"nodes": [{"endpoint": "img_src"}, {"endpoint": "img_view"},
                     {"endpoint": "img_src"},
                     {"endpoint": "cos",
                      "params": {"A": "2.0", "b": "0.5"}},
                     {"endpoint": "img_view"}],
           "edges": [
               {"out_port": {"node": 0, "channel": "o"}, "tensor": 0},
               {"out_port": {"node": 2, "channel": "o"}, "tensor": 1},
               {"in_port": {"node": 0, "channel": "o"},
                "out_port": {"node": 1, "channel": "o"}},
               {"in_port": {"node": 2, "channel": "o"},
                "out_port": {"node": 3, "channel": "o"}},
               {"in_port": {"node": 3, "channel": "o"},
                "out_port": {"node": 4, "channel": "o"}}],
           "taps": [{"node": 3, "channel": "o"}]}
    raw = app.compute(bytes(encode_message(REQUEST_MAGIC, req, [x, x])))
    outs = Response.decode(raw)
    np.testing.assert_allclose(np.asarray(outs[3]["o"]),
                               np.cos(2.0 * x + 0.5), atol=1e-5)


def test_export_timing_header(served):
    """from-export /compute responses carry X-IVT-Timing (same phase-
    attribution contract as the live app; no batcher -> no queue)."""
    import urllib.request as _u

    _, base = served
    img = np.arange(8, dtype=np.float32).reshape(2, 4) / 8
    body = bytes(encode_message(REQUEST_MAGIC, client_request(), [img]))
    r = _u.urlopen(_u.Request(base + "/compute", data=body,
                              method="POST"), timeout=60)
    r.read()
    timing = r.headers.get("X-IVT-Timing")
    assert timing
    parts = dict(kv.split("=") for kv in timing.split(";"))
    assert {"decode", "compute", "encode", "wall"} <= set(parts)
    r2 = _u.urlopen(base + "/metrics", timeout=30)
    r2.read()
    assert r2.headers.get("X-IVT-Timing") is None
