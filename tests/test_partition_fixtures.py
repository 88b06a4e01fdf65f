"""Client/server partition-decision fixture replay (VERDICT r3 #2).

``frontend/js/partition.js`` decides which nodes evaluate client-side
and what exact request the server receives; no JS runtime exists in this
image, so CI pins the decision through the Python mirror
(``interactive_vit_tpu/wire/partition.py``) against committed fixtures
with HAND-AUTHORED expected local sets and byte-exact requests.
``frontend/js/wire.test.mjs`` replays the same file through the real JS
rule whenever a runtime exists.

Reference behavior being preserved: client-side eval of cheap ops
(``/root/reference/main/static/main/gpu.js:144-283``) + one batched
server round trip (``net_node.js:346-369``).
"""

import base64
import json
import os
import sys

import numpy as np
import pytest

from interactive_vit_tpu.graph.executor import Executor, NodeError
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.ops.node_ops import register_builtin
from interactive_vit_tpu.wire import partition as P
from interactive_vit_tpu.wire.codec import Request

HERE = os.path.dirname(os.path.abspath(__file__))
FIXTURES = os.path.join(HERE, "fixtures")

with open(os.path.join(FIXTURES, "partition_fixtures.json")) as f:
    PARTITION_FIXTURES = json.load(f)

ALL = sorted(PARTITION_FIXTURES)


def _sources(fx):
    return {int(i): np.frombuffer(
        base64.b64decode(s["b64"]), "<f4").reshape(s["shape"])
        for i, s in fx["sources_b64"].items()}


@pytest.fixture(scope="module")
def ex():
    reg = Registry()
    register_builtin(reg)
    return Executor(reg)


@pytest.mark.parametrize("name", ALL)
def test_partition_decision_matches_fixture(name):
    """The mirror re-derives {ready, local set, request plan} from the
    committed graph description and must reproduce the hand-authored
    expectations exactly."""
    fx = PARTITION_FIXTURES[name]
    g = fx["graph"]
    ready, local, plan = P.partition(g["nodes"], g["edges"])
    assert ready == fx["expected_ready"], name
    assert sorted(local) == fx["expected_local"], name
    assert plan == fx["plan"], name


@pytest.mark.parametrize("name", ALL)
def test_request_bytes_match_fixture(name):
    """Rebuilding the server request from the plan reproduces the
    committed bytes (compact JSON + tensor blocks) — the exact message
    graph.js ships after partitioning."""
    fx = PARTITION_FIXTURES[name]
    sys.path.insert(0, FIXTURES)
    try:
        from make_partition_fixtures import build_request
    finally:
        sys.path.pop(0)
    if fx.get("no_request") and not fx.get("fallback_request_b64"):
        return
    srcs = _sources(fx)
    if "request_b64" in fx:
        req_json, raw = build_request(fx["instances"], fx["plan"], srcs)
        assert req_json == fx["request_json"], name
        assert raw == base64.b64decode(fx["request_b64"]), name
    if "fallback_request_b64" in fx:
        # LocalFallback clears the local set; the re-planned request is
        # what the server receives for the whole pass
        g = fx["graph"]
        fplan = P.plan_request(g["nodes"], g["edges"],
                               fx["expected_ready"], set())
        assert fplan == fx["fallback_plan"], name
        req_json, raw = build_request(fx["instances"], fplan, srcs)
        assert req_json == fx["fallback_request_json"], name
        assert raw == base64.b64decode(fx["fallback_request_b64"]), name


def test_graph_description_derivable_from_instances():
    """The committed pure-graph descriptions (kind/source/viewer/ins)
    stay in sync with the role tables and the server IO registry —
    catches a nodes.js channel change that fixtures would otherwise
    hide."""
    sys.path.insert(0, FIXTURES)
    try:
        from make_partition_fixtures import _registry, describe
    finally:
        sys.path.pop(0)
    reg = _registry()
    for name, fx in PARTITION_FIXTURES.items():
        srcs = _sources(fx)
        nodes, edges = describe(
            fx["instances"],
            [{"src": e["src"], "dst": e["dst"]}
             for e in fx["graph"]["edges"]],
            srcs, reg)
        assert nodes == fx["graph"]["nodes"], name


@pytest.mark.parametrize("name", [n for n in ALL
                                  if PARTITION_FIXTURES[n].get("eval")])
def test_server_accepts_partitioned_request(ex, name):
    """The pinned request bytes decode and evaluate server-side; the
    failing-server scenario errors with the wire-index attribution the
    client UI parses."""
    fx = PARTITION_FIXTURES[name]
    req = Request()
    req.decode(base64.b64decode(fx["request_b64"]))
    taps = req.taps if req.taps else "primary"
    if "expect_error_req_node" in fx:
        with pytest.raises(NodeError) as exc:
            ex.run(req.graph, taps=taps)
        assert exc.value.node_index == fx["expect_error_req_node"]
        return
    outs = ex.run(req.graph, taps=taps)
    for tap in fx["plan"]["taps"]:
        assert tap["node"] in outs
        assert tap["channel"] in outs[tap["node"]]


def test_fallback_request_evaluates_broadcast_binop(ex):
    """The server-side binop handles the broadcast the client local impl
    refuses — the LocalFallback path lands on a working server."""
    fx = PARTITION_FIXTURES["broadcast_binop_fallback"]
    req = Request()
    req.decode(base64.b64decode(fx["fallback_request_b64"]))
    outs = ex.run(req.graph, taps=req.taps if req.taps else "primary")
    binop_wire = fx["fallback_plan"]["req"].index(2)
    got = np.asarray(outs[binop_wire]["c"])
    np.testing.assert_allclose(got, np.full((4, 6), 6.0), rtol=1e-6)
