"""Per-node-kind contract fixture replay (VERDICT r2 #1).

Every client node kind has a committed fixture tuple (saved instance
JSON, client-layout request bytes, expected routed outputs, response
bytes in both wire dtypes). This replay asserts the SERVER side of each
contract: the client-sim request builder reproduces the committed bytes,
the server stack decodes + evaluates them to the pinned outputs, and the
response codec reproduces the committed response bytes byte-for-byte.
``frontend/js/wire.test.mjs`` replays the same file from the JS side
when a runtime exists.
"""

import base64
import json
import os

import numpy as np
import pytest

from interactive_vit_tpu.graph.executor import Executor
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.ops.node_ops import register_builtin
from interactive_vit_tpu.wire.codec import Request, Response

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURES = os.path.join(HERE, "fixtures")

with open(os.path.join(FIXTURES, "node_fixtures.json")) as f:
    NODE_FIXTURES = json.load(f)

ALL_KINDS = sorted(NODE_FIXTURES)


@pytest.fixture(scope="module")
def ex():
    reg = Registry()
    register_builtin(reg)
    return Executor(reg)


def test_every_client_kind_has_a_fixture():
    """The coverage contract itself: every kind the client registers
    (frontend/js/nodes.js registerAll + app.js dense-feature endpoints)
    appears in the fixture file."""
    client_kinds = {
        "img_src", "img_view", "multi_view", "attn_view", "overlay",
        "category", "cos", "binop", "slice", "shuffle", "const", "noise",
        "conv2d", "resize", "net_node", "pca_view", "patch_sim",
    }
    covered = set(ALL_KINDS) | {"img_view"}  # img_view_compositing
    missing = {k for k in client_kinds if not any(
        c == k or c.startswith(k + "_") for c in covered)}
    assert not missing, f"kinds without a contract fixture: {missing}"


@pytest.mark.parametrize("name", ALL_KINDS)
def test_client_sim_reproduces_request_bytes(name):
    """The documented client request layout is stable: rebuilding the
    request from the saved graph yields the committed bytes."""
    import sys

    sys.path.insert(0, FIXTURES)
    try:
        from make_node_fixtures import client_request_bytes, scenarios
    finally:
        sys.path.pop(0)

    fx = NODE_FIXTURES[name]
    sc = scenarios()[name]
    raw, req_json, _tensors = client_request_bytes(
        sc["saved"], sc["sources"])
    if fx.get("no_request"):
        assert not req_json["nodes"]
        return
    assert raw == base64.b64decode(fx["request_b64"]), name
    assert req_json == fx["request_json"]


def test_error_contract_attribution_and_propagation(ex):
    """The failing-node contract the client UI parses (VERDICT r2 #8):
    the server error names the failing node's WIRE index and kind in the
    exact "node <i> (<name>): ..." form (frontend/js/graph.js matches
    /node (\\d+)/ to pin the full text on that node's hover), and the
    eager path labels only DOWNSTREAM nodes "eval error upstream"."""
    from interactive_vit_tpu.graph.executor import NodeError

    fx = NODE_FIXTURES["error_contract"]
    req = Request()
    req.decode(base64.b64decode(fx["request_b64"]))
    with pytest.raises(NodeError) as exc:
        ex.run(req.graph, taps=req.taps or "primary")
    err = exc.value
    assert err.node_index == fx["error"]["node_index"]
    assert err.node_name == fx["error"]["node_name"]
    assert str(err) == fx["error"]["text"]
    assert str(err).startswith(f"node {err.node_index} ({err.node_name}):")

    # downstream-only propagation (the client mirrors run_eager semantics)
    outputs, errors = ex.run_eager(req.graph)
    bad = fx["error"]["node_index"]
    assert bad in errors and errors[bad] != "eval error upstream"
    downstream = [i for i, msg in errors.items()
                  if msg == "eval error upstream"]
    assert downstream == [bad + 1]  # cos is downstream of conv2d


@pytest.mark.parametrize("name", ALL_KINDS)
def test_server_evaluates_fixture_request(ex, name):
    """Decode committed client bytes -> executor -> pinned outputs."""
    fx = NODE_FIXTURES[name]
    if fx.get("no_request") or fx.get("error"):
        pytest.skip("no-request / error-contract scenario")
    req = Request()
    req.decode(base64.b64decode(fx["request_b64"]))
    taps = req.taps if req.taps else "primary"
    outs = ex.run(req.graph, taps=taps)
    flat = {f"{i}/{ch}": np.asarray(v)
            for i, sub in outs.items() for ch, v in sub.items()}
    assert sorted(flat) == sorted(fx["expected"]), name
    for key, exp in fx["expected"].items():
        got = flat[key]
        assert list(got.shape) == exp["dims"], (name, key)
        np.testing.assert_allclose(
            got.ravel(), np.asarray(exp["values"], np.float32),
            atol=5e-5, err_msg=f"{name}:{key}")


@pytest.mark.parametrize("name", ALL_KINDS)
def test_response_codec_reproduces_fixture_bytes(name):
    """Response.encode of the pinned outputs is byte-stable, f32 + bf16
    (what the JS decoder will be pointed at)."""
    fx = NODE_FIXTURES[name]
    if fx.get("no_request") or fx.get("error"):
        pytest.skip("no-request / error-contract scenario")
    # decode the committed response, re-encode: must be identity
    for key, dtype in [("response_b64", "f32"), ("response_bf16_b64", "bf16")]:
        committed = base64.b64decode(fx[key])
        outs = Response.decode(committed)
        outs = {i: {ch: np.asarray(v) for ch, v in sub.items()}
                for i, sub in outs.items()}
        again = bytes(Response(outs).encode(dtype=dtype))
        assert again == committed, (name, dtype)
        # and the decoded arrays match the pinned expected values
        flat = {f"{i}/{ch}": v for i, sub in outs.items()
                for ch, v in sub.items()}
        for okey, exp in fx["expected"].items():
            tol = 5e-2 if dtype == "bf16" else 5e-5
            np.testing.assert_allclose(
                flat[okey].ravel(), np.asarray(exp["values"], np.float32),
                atol=tol, rtol=2e-2 if dtype == "bf16" else 0,
                err_msg=f"{name}:{okey}:{dtype}")
