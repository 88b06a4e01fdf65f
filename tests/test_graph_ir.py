"""Graph IR tests: topology, ordering, cycle detection, signatures."""

import numpy as np
import pytest

from interactive_vit_tpu.graph.ir import Graph, GraphError


def chain(n):
    g = Graph()
    nodes = [g.add_node(f"n{i}") for i in range(n)]
    for a, b in zip(nodes, nodes[1:]):
        g.connect(a, "o", b, "o")
    return g, nodes


def test_order_chain():
    g, nodes = chain(5)
    order = [n.index for n in g.order()]
    assert order == sorted(order)


def test_order_diamond():
    g = Graph()
    a, b, c, d = (g.add_node(x) for x in "abcd")
    g.connect(a, "o", b, "o")
    g.connect(a, "o", c, "o")
    g.connect(b, "o", d, "x")
    g.connect(c, "o", d, "y")
    order = [n.name for n in g.order()]
    assert order.index("a") < order.index("b")
    assert order.index("a") < order.index("c")
    assert order.index("d") == 3


def test_cycle_detected():
    g = Graph()
    a = g.add_node("a")
    b = g.add_node("b")
    g.connect(a, "o", b, "o")
    g.connect(b, "o", a, "o")
    with pytest.raises(GraphError):
        g.order()


def test_input_edges_deterministic():
    g = Graph()
    a = g.add_node("a")
    g.add_input(np.zeros((2, 2), np.float32), a, "y")
    g.add_input(np.ones((3,), np.float32), a, "x")
    edges = g.input_edges()
    assert [(n.index, ch) for n, ch, _ in edges] == [(0, "x"), (0, "y")]


def test_signature_stability_and_sensitivity():
    g1, _ = chain(3)
    g2, _ = chain(3)
    assert g1.signature() == g2.signature()

    g3, nodes = chain(3)
    nodes[1].params["A"] = "2.0"
    assert g3.signature() != g1.signature()

    # input shape changes the signature (shape-keyed compile cache)
    g4, n4 = chain(2)
    g5, n5 = chain(2)
    g4.add_input(np.zeros((4,), np.float32), n4[0], "o")
    g5.add_input(np.zeros((8,), np.float32), n5[0], "o")
    assert g4.signature() != g5.signature()


def test_pinout_roundtrip():
    g = Graph()
    a = g.add_node("a")
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    g.add_input(x, a, "o")
    assert np.array_equal(a.get_pinin().get("o"), x)
