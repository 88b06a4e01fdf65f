"""Graph JSON schema + graph library unit coverage."""

import json

import numpy as np
import pytest

from interactive_vit_tpu.graph.ir import Graph
from interactive_vit_tpu.wire.schema import (
    GraphLibrary,
    generate_model_graph_json,
    graph_from_json,
)


def test_generate_model_graph_layout():
    names = [f"m:layer.{i}" for i in range(10)]
    obj = generate_model_graph_json(names)
    assert len(obj["nodes"]) == 10
    assert len(obj["edges"]) == 9
    # sqrt grid: w = 3 for 10 nodes, 200px pitch (reference layout contract)
    assert obj["nodes"][0]["pos"] == {"x": 0, "y": 0}
    assert obj["nodes"][3]["pos"] == {"x": 0, "y": 200}
    # chain: edge i connects node i-1 -> node i on channel "o"
    assert obj["edges"][0] == {
        "in_port": {"node": 0, "channel": "o"},
        "out_port": {"node": 1, "channel": "o"},
    }


def test_graph_from_json_net_nodes_and_instance_kinds():
    obj = {
        "nodes": [
            {"instance": {"kind": "net_node", "endpoint": "m:a",
                          "params": {"k": "v"}}, "pos": {"x": 0, "y": 0}},
            {"instance": {"kind": "binop", "op": "+"}, "pos": {"x": 0, "y": 0}},
            {"instance": {"kind": "slice",
                          "fixed": [{"dim": 0, "val": 1}], "free": []},
             "pos": {"x": 0, "y": 0}},
        ],
        "edges": [
            {"in_port": {"node": 0, "channel": "o"},
             "out_port": {"node": 1, "channel": "a"}},
        ],
    }
    g = graph_from_json(obj)
    assert g.nodes[0].name == "m:a"
    assert g.nodes[0].params == {"k": "v"}
    # non-net kinds: kind becomes the node name, json-valued params encoded
    assert g.nodes[1].name == "binop"
    assert g.nodes[1].params["op"] == "+"
    assert json.loads(g.nodes[2].params["fixed"]) == [{"dim": 0, "val": 1}]
    # edge direction: in_port (producer) -> out_port (consumer)
    assert g.nodes[1].inputs["a"].src.node.index == 0


def test_graph_library_roundtrip_and_traversal(tmp_path):
    lib = GraphLibrary(str(tmp_path))
    lib.save("x.json", {"nodes": [], "edges": []})
    assert lib.list() == ["x.json"]
    assert lib.exists("x.json")
    assert lib.load("x.json") == {"nodes": [], "edges": []}
    assert json.loads(lib.load_bytes("x.json")) == {"nodes": [], "edges": []}

    with pytest.raises(ValueError):
        lib.load("../x.json")
    assert not lib.exists("../../etc/passwd")


def test_request_encode_input_edge_order():
    """Graph-level inputs serialize deterministically (sorted channels)."""
    from interactive_vit_tpu.wire.codec import Request

    g = Graph()
    n = g.add_node("binop", {"op": "+"})
    g.add_input(np.ones((2,), np.float32) * 2, n, "b")
    g.add_input(np.ones((2,), np.float32), n, "a")
    raw = Request.encode(g)
    r2 = Request()
    r2.decode(bytes(raw))
    np.testing.assert_array_equal(
        r2.graph.nodes[0].inputs["a"].tensor, np.ones((2,), np.float32)
    )
    np.testing.assert_array_equal(
        r2.graph.nodes[0].inputs["b"].tensor, 2 * np.ones((2,), np.float32)
    )


def test_negative_edge_index_rejected():
    """A corrupt saved graph with node -1 must raise a structured error,
    not wrap via Python list indexing into a silently mis-wired graph."""
    from interactive_vit_tpu.graph.ir import GraphError
    from interactive_vit_tpu.wire.schema import graph_from_json

    obj = {
        "nodes": [{"instance": {"kind": "noise", "dims": [4]}},
                  {"instance": {"kind": "cos"}}],
        "edges": [{"in_port": {"node": -1, "channel": "o"},
                   "out_port": {"node": 1, "channel": "o"}}],
    }
    with pytest.raises(GraphError):
        graph_from_json(obj)


def test_save_is_atomic_no_tmp_left(tmp_path):
    from interactive_vit_tpu.wire.schema import GraphLibrary

    lib = GraphLibrary(str(tmp_path))
    lib.save("a.json", {"nodes": [], "edges": []})
    assert lib.load("a.json") == {"nodes": [], "edges": []}
    import os

    assert not [f for f in os.listdir(str(tmp_path)) if f.endswith(".tmp")]
