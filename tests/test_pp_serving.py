"""Pipeline-parallel serving: executor folds untapped block chains.

With a mesh carrying a "stage" axis, the staging executor replaces a chain
of same-fold-group layer nodes (vit blocks) with ONE GPipe schedule
(``parallel/pipeline.py``) — stage s holds blocks [s*L/S, (s+1)*L/S) and
activations hop stages over ``ppermute``. The reference's topo-stages
(``/root/reference/main/graph.py:79-99``) are the natural stage
decomposition SURVEY.md §2.3 maps onto TPU PP; folding is an execution
strategy only, so results must match the sequential executor bit-for-class.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from interactive_vit_tpu.graph.executor import Executor
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.models import vit
from interactive_vit_tpu.models.vit_plugin import make_vit_model
from interactive_vit_tpu.ops.node_ops import register_builtin
from interactive_vit_tpu.parallel.mesh import make_mesh
from interactive_vit_tpu.wire.schema import GraphLibrary, graph_from_json


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    cfg = vit.ViTConfig("vit_pp", img_size=32, patch=16, width=64,
                        depth=8, heads=4, num_classes=10)
    vit.VARIANTS["vit_pp"] = cfg
    reg = Registry()
    register_builtin(reg)
    lib = GraphLibrary(str(tmp_path_factory.mktemp("graphs")))
    model = make_vit_model("vit_pp", with_categories=False)
    model.register(reg, lib)
    yield reg, lib, cfg
    del vit.VARIANTS["vit_pp"]


def _graph(lib):
    g = graph_from_json(lib.load("vit_pp.json"))
    img = np.random.default_rng(0).random((3, 32, 32)).astype(np.float32)
    g.add_input(img, g.nodes[0], "o")
    return g


def _head_index(g):
    return len(g.nodes) - 1


def test_pp_fold_matches_sequential(setup):
    reg, lib, cfg = setup
    mesh = make_mesh({"stage": 4})
    assert "stage" in mesh.axis_names

    g = _graph(lib)
    head = _head_index(g)
    ref = Executor(reg=reg).run(_graph(lib), taps={(head, "o")})

    ex = Executor(reg=reg, mesh=mesh)
    got = ex.run(g, taps={(head, "o")})
    # the 8-block chain folded into one 4-stage pipeline
    assert len(ex.last_pp_segments) == 1
    assert len(ex.last_pp_segments[0]) == 8
    np.testing.assert_allclose(
        np.asarray(got[head]["o"]), np.asarray(ref[head]["o"]),
        rtol=2e-4, atol=2e-4,
    )


def test_pp_fold_skips_tapped_interior(setup):
    """A mid-chain tap (interactive viewer on block 3's maps) forbids
    folding across it; results still match and the tap is delivered."""
    reg, lib, cfg = setup
    mesh = make_mesh({"stage": 4})
    g = _graph(lib)
    head = _head_index(g)
    # block nodes start at index 2 (transform, embed, blocks.0..7, ...)
    mid = 5  # blocks.3
    taps = {(head, "o"), (mid, "attn")}

    ref = Executor(reg=reg).run(_graph(lib), taps=taps)
    ex = Executor(reg=reg, mesh=mesh)
    got = ex.run(g, taps=taps)

    # the chain is split around the tapped block: only the 4-node run
    # after it can fold (blocks.4..7); blocks.0..2 (3 nodes < 4 stages)
    # run sequentially
    assert all(mid not in seg for seg in ex.last_pp_segments)
    np.testing.assert_allclose(
        np.asarray(got[head]["o"]), np.asarray(ref[head]["o"]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got[mid]["attn"]), np.asarray(ref[mid]["attn"]),
        rtol=2e-4, atol=2e-4,
    )


def test_pp_fold_excludes_wired_extra_channel(setup):
    """A block whose extra output channel (r) is WIRED into a consumer may
    not fold even as a chain tail: the fold emits only the last node's "o",
    so folding it would drop the consumed channel (regression: raw
    ``KeyError (idx, 'r')`` bypassing TargettedError attribution)."""
    reg, lib, cfg = setup
    mesh = make_mesh({"stage": 2})

    def build():
        g = _graph(lib)
        # rollout chain: blocks.3 r -> blocks.4 r (the interactive
        # rollout-accumulator wiring)
        g.connect(g.nodes[5], "r", g.nodes[6], "r")
        return g

    head = _head_index(build())
    taps = {(head, "o"), (6, "r")}
    ref = Executor(reg=reg).run(build(), taps=taps)

    ex = Executor(reg=reg, mesh=mesh)
    got = ex.run(build(), taps=taps)
    # neither endpoint of the r-edge may appear in any folded segment
    assert all(5 not in seg and 6 not in seg for seg in ex.last_pp_segments)
    np.testing.assert_allclose(
        np.asarray(got[6]["r"]), np.asarray(ref[6]["r"]),
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(got[head]["o"]), np.asarray(ref[head]["o"]),
        rtol=2e-4, atol=2e-4,
    )


def test_pp_fold_inactive_without_stage_axis(setup):
    reg, lib, cfg = setup
    mesh = make_mesh({"data": 4, "model": 2})
    g = _graph(lib)
    head = _head_index(g)
    ex = Executor(reg=reg, mesh=mesh)
    ex.run(g, taps={(head, "o")})
    assert ex.last_pp_segments == []


def test_pp_fold_composes_with_batched_serving(setup):
    """run_stacked (micro-batched serving) over a PP mesh."""
    reg, lib, cfg = setup
    mesh = make_mesh({"stage": 4})
    head_ref = None
    graphs = []
    for seed in range(4):
        g = graph_from_json(lib.load("vit_pp.json"))
        img = np.random.default_rng(seed).random((3, 32, 32)) \
            .astype(np.float32)
        g.add_input(img, g.nodes[0], "o")
        graphs.append(g)
    head = _head_index(graphs[0])
    ex = Executor(reg=reg, mesh=mesh)
    outs = ex.run_stacked(graphs, taps={(head, "o")})
    ref = Executor(reg=reg).run(graphs[0], taps={(head, "o")})
    assert len(outs) == 4
    np.testing.assert_allclose(
        np.asarray(outs[0][head]["o"]), np.asarray(ref[head]["o"]),
        rtol=2e-4, atol=2e-4,
    )


def test_pp_fold_keeps_interior_primary_tap(setup):
    """An interior block tapped on "o" (viewer spliced onto a mid-chain
    activation) must NOT disengage the fold: the pipe emits the tapped
    layer's activation alongside the chain output (VERDICT r2 weak #7)."""
    reg, lib, cfg = setup
    mesh = make_mesh({"stage": 4})
    g = _graph(lib)
    head = _head_index(g)
    mids = (4, 7)  # blocks.2 and blocks.5 (chain starts at node 2)
    taps = {(head, "o")} | {(m, "o") for m in mids}

    ref = Executor(reg=reg).run(_graph(lib), taps=taps)
    ex = Executor(reg=reg, mesh=mesh)
    got = ex.run(g, taps=taps)

    # the full 8-block chain still folds into one 4-stage pipeline
    assert len(ex.last_pp_segments) == 1
    assert len(ex.last_pp_segments[0]) == 8
    assert all(m in ex.last_pp_segments[0] for m in mids)
    for m in mids:
        np.testing.assert_allclose(
            np.asarray(got[m]["o"]), np.asarray(ref[m]["o"]),
            rtol=2e-4, atol=2e-4,
        )
    np.testing.assert_allclose(
        np.asarray(got[head]["o"]), np.asarray(ref[head]["o"]),
        rtol=2e-4, atol=2e-4,
    )


def test_pp_fold_every_interior_primary_tap(setup):
    """EVERY chain node tapped on "o" (dense debug view) — the fold must
    deliver every interior activation, not just the sparse case. (taps
    "all" would also request extra channels, which rightly unfolds.)"""
    reg, lib, cfg = setup
    mesh = make_mesh({"stage": 2})
    g = _graph(lib)
    blocks = list(range(2, 10))  # blocks.0..7
    taps = {(i, "o") for i in blocks} | {(_head_index(g), "o")}
    ref = Executor(reg=reg).run(_graph(lib), taps=taps)
    ex = Executor(reg=reg, mesh=mesh)
    got = ex.run(g, taps=taps)
    assert len(ex.last_pp_segments) == 1
    assert ex.last_pp_segments[0] == blocks
    for idx in blocks:
        np.testing.assert_allclose(
            np.asarray(got[idx]["o"]), np.asarray(ref[idx]["o"]),
            rtol=2e-4, atol=2e-4,
        )


def test_pp_fold_interior_tap_composes_with_batched_serving(setup):
    """run_stacked (micro-batched serving) over a PP mesh WITH an interior
    "o" tap: the stacked program vmaps over the tap-emitting pipeline."""
    reg, lib, cfg = setup
    mesh = make_mesh({"stage": 4})
    graphs = []
    for seed in range(4):
        g = graph_from_json(lib.load("vit_pp.json"))
        img = np.random.default_rng(seed).random((3, 32, 32)) \
            .astype(np.float32)
        g.add_input(img, g.nodes[0], "o")
        graphs.append(g)
    head = _head_index(graphs[0])
    mid = 5  # blocks.3
    taps = {(head, "o"), (mid, "o")}
    ex = Executor(reg=reg, mesh=mesh)
    outs = ex.run_stacked(graphs, taps=taps)
    assert len(ex.last_pp_segments) == 1 and mid in ex.last_pp_segments[0]
    for i in (0, 3):
        ref = Executor(reg=reg).run(graphs[i], taps=taps)
        np.testing.assert_allclose(
            np.asarray(outs[i][mid]["o"]), np.asarray(ref[mid]["o"]),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(outs[i][head]["o"]), np.asarray(ref[head]["o"]),
            rtol=2e-4, atol=2e-4,
        )
