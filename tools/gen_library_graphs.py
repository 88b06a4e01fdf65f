"""Generate the missing committed library graphs (VERDICT r3 #6).

The graph library (``static/graphs/*.json``) is the framework's
persistence surface — parity with the reference's saved-graph dir
(``/root/reference/static/graphs``, served by ``views.py:44-59``). The
server auto-generates ``<variant>.json`` (+ ``<variant>_saliency.json``
for classifier chains) on first registration, but only for variants it
is booted with; the committed library lagged the model zoo. This script
generates the gap entries deterministically (seed-0 init weights — the
same params every test registration uses) so the library covers every
family: deit_s16, dinov2_s14(+_reg), vit_b16_tome, vit_s16_tome,
mae_t16 (custom reconstruct demo), swin_t_saliency.

Run: ``python tools/gen_library_graphs.py`` (CPU; writes only missing
files unless --force).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # CLAUDE.md trap #3

from interactive_vit_tpu.graph.registry import Registry  # noqa: E402
from interactive_vit_tpu.models.autoregister import make_model  # noqa: E402
from interactive_vit_tpu.ops.node_ops import register_builtin  # noqa: E402
from interactive_vit_tpu.wire.schema import GraphLibrary  # noqa: E402

GRAPHS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "static", "graphs")

# chained-layer graphs (+ saliency for classifier chains) the server
# would generate if booted with these variants
CHAIN_VARIANTS = ["deit_s16", "dinov2_s14", "dinov2_s14_reg",
                  "vit_b16_tome", "vit_s16_tome", "swin_t", "mae_t16"]


def mae_reconstruct_demo(model) -> dict:
    """MAE's interactive demo: the masked-reconstruction workflow.

    transform -> reconstruct with all three viewable channels wired to
    img_views — "o" (compose: visible patches + reconstructed masked
    ones), "masked" (the corrupted input) and "err" (per-patch squared
    error heatmap). The generic chain graph would expose only "o"."""
    obj = model.generate_graph_json()
    rec = next(i for i, n in enumerate(obj["nodes"])
               if n["instance"].get("endpoint", "").endswith(":reconstruct"))
    rx = obj["nodes"][rec]["pos"]["x"]
    ry = obj["nodes"][rec]["pos"]["y"]
    # "o"/"masked" are [B,3,H,W] -> img_view; "err" is a [B,gh,gw]
    # per-patch heatmap (C=1) -> multi_view's grayscale grid
    for k, (ch, viewer) in enumerate([("o", "img_view"),
                                      ("masked", "img_view"),
                                      ("err", "multi_view")]):
        obj["nodes"].append({"instance": {"kind": viewer},
                             "pos": {"x": rx + 220,
                                     "y": ry + 160 * k}})
        obj["edges"].append(
            {"in_port": {"node": rec, "channel": ch},
             "out_port": {"node": len(obj["nodes"]) - 1, "channel": "o"}})
    return obj


def main(force: bool = False) -> None:
    lib = GraphLibrary(GRAPHS_DIR)
    reg = Registry()
    register_builtin(reg)
    for variant in CHAIN_VARIANTS:
        model = make_model(variant)
        base = f"{variant}.json"
        if force or not lib.exists(base):
            if variant.startswith("mae_"):
                lib.save(base, mae_reconstruct_demo(model))
            else:
                lib.save(base, model.generate_graph_json())
            print("wrote", base)
        sal = f"{variant}_saliency.json"
        has_head = any(ln.endswith(":head")
                       for ln in model.list_node_names())
        if has_head and (force or not lib.exists(sal)):
            model.register(reg)  # saliency gen needs the extra kinds
            lib.save(sal, model.generate_saliency_graph_json())
            print("wrote", sal)


if __name__ == "__main__":
    main(force="--force" in sys.argv)
