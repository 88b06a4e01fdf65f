"""CLIP text-tower plugin + zero-shot demo graph.

Extends the model-plugin tier (``models/model_plugin.py``, the analog of the
reference's ``Model``/``ModelNode`` pair, ``/root/reference/main/context.py:38-129``)
to a model whose ENTRY node has no tensor input: the ``clip_text_b32:embed``
node carries a ``prompts`` param (JSON list of strings), tokenizes host-side
(``models/clip_bpe``), and delivers the token ids as device captures. Each
prompt's end-of-text index leaves on an ``eot`` extra channel wired directly
to the pooling node, so the block chain itself is a plain activation chain
with per-block causal attention taps — the same tappable surface as the
vision towers.

``prompts`` is DYNAMIC in wording, static in COUNT: the token array's shape
[P, 77] depends only on how many prompts there are, so the node declares
``dynamic_params={"prompts"}`` with ``dynamic_sig = prompt count`` — REWORDING
a prompt hits the cached program (tokens/eot ride as runtime captures;
``dynamic_capture_keys`` keeps the embed table broadcast in batched serving),
while ADDING/REMOVING a prompt recompiles (the text tower is 12 blocks at
N=77, so that retrace is cheap; weights ride as resident captures either
way).
"""

from __future__ import annotations

import json
import logging
from typing import Any, Dict, List, Optional

import numpy as np

from interactive_vit_tpu.models import clip_text
from interactive_vit_tpu.models.clip_bpe import default_tokenizer
from interactive_vit_tpu.models.model_plugin import JaxModel, LayerNodeKind

logger = logging.getLogger(__name__)

DEFAULT_PROMPTS = ["a photo of a cat", "a photo of a dog",
                   "a diagram", "a photo of a person"]


def _parse_prompts(params: Dict[str, str]) -> List[str]:
    raw = params.get("prompts", "")
    try:
        v = json.loads(raw) if isinstance(raw, str) and raw else raw
    except json.JSONDecodeError:
        # a bare unquoted string typed into the UI: treat as one prompt
        v = raw
    if isinstance(v, str):
        v = [v] if v else []
    if not isinstance(v, list) or not all(isinstance(s, str) for s in v):
        from interactive_vit_tpu.graph.ir import GraphError

        raise GraphError("prompts must be a JSON list of strings")
    return [str(s) for s in v] or list(DEFAULT_PROMPTS)


class _PromptNode(LayerNodeKind):
    """Text entry node: prompts param -> embedded token sequence + eot."""

    def io(self, params):
        return {"ins": [], "outs": ["o"] + self._extra}

    def contents(self, params):
        import html as _html

        prompts = params.get("prompts", "") or json.dumps(DEFAULT_PROMPTS)
        return (f"<p>{self.get_name()}</p>"
                f"<p>{self.model.describe(self.layer_name)}</p>"
                f"<label>prompts <textarea data-param=\"prompts\" rows=\"3\" "
                f"cols=\"24\">{_html.escape(prompts)}</textarea></label>")

    def dynamic_params(self):
        # prompt WORDING rides as runtime captures: editing text is the
        # interaction and must hit the cached program. The token array's
        # SHAPE is [n_prompts, 77], so the COUNT contributes a shape
        # class to the signature via dynamic_sig — changing how many
        # prompts there are recompiles (5-8 s on-chip), rewording one
        # does not (was: every keystroke's apply recompiled)
        return frozenset({"prompts"})

    def dynamic_sig(self, params):
        return str(len(_parse_prompts(params)))

    def dynamic_capture_keys(self):
        # the embed weights are NOT prompt-dependent: the batcher must
        # broadcast them across a stacked group, not stack k copies of
        # the [vocab, width] table
        return frozenset({"tokens", "eot"})

    def param_variants(self, params):
        # the only signature-changing prompt edit left is add/remove
        # (wording is dynamic): warm count+1 and count-1 so the apply
        # after the edit runs against a precompiled program. Wording in
        # the variant is irrelevant — only the COUNT keys the signature
        # (dynamic_sig), so any placeholder compiles the right program.
        prompts = _parse_prompts(params)
        out = [{**params, "prompts": json.dumps(prompts + ["a photo"])}]
        if len(prompts) > 1:
            out.append({**params, "prompts": json.dumps(prompts[:-1])})
        return out

    def captures(self, params):
        cfg: clip_text.CLIPTextConfig = self.model.text_cfg
        tok = default_tokenizer()
        tokens = tok.batch(_parse_prompts(params), cfg.context)
        return {
            "weights": self.model.layer_params(self.layer_name),
            "tokens": tokens,
            # host-computed eot positions (argmax over ids: eot is the
            # largest id in the vocab and padding is zeros — clip_bpe)
            "eot": np.argmax(tokens, axis=-1).astype(np.int32),
        }


class _PoolNode(LayerNodeKind):
    """Pooling/projection node: consumes the chain AND the eot channel."""

    def io(self, params):
        return {"ins": ["o", "eot"], "outs": ["o"]}


class TextJaxModel(JaxModel):
    """JaxModel whose entry/pool layers use the text-specific node kinds
    and whose generated graph wires ``embed:eot -> embedding:eot``."""

    def __init__(self, *args, text_cfg: clip_text.CLIPTextConfig, **kw):
        super().__init__(*args, **kw)
        self.text_cfg = text_cfg

    def _kind_cls(self, layer_name: str) -> type:
        if layer_name == "embed":
            return _PromptNode
        if layer_name == "embedding":
            return _PoolNode
        return LayerNodeKind

    def generate_graph_json(self) -> Dict:
        obj = super().generate_graph_json()
        names = self.list_node_names()
        obj["edges"].append(
            {
                "in_port": {"node": 0, "channel": "eot"},
                "out_port": {"node": len(names) - 1, "channel": "eot"},
            }
        )
        return obj


def make_clip_text_model(params: Optional[Any] = None, seed: int = 0,
                         dtype=None, cfg=None) -> TextJaxModel:
    import jax
    import jax.numpy as jnp

    cfg = cfg or clip_text.CLIPTextConfig()
    if params is None:
        params = clip_text.init_params(jax.random.key(seed), cfg,
                                       dtype=dtype or jnp.float32)
    descriptions = {
        "embed": f"BPE tokenize + token/pos embed (ctx {cfg.context})",
        "embedding": f"ln_final + eot pool + proj -> L2-normed [{cfg.embed_dim}]",
        **{
            f"blocks.{i}": (f"CLIPTextBlock d={cfg.width} h={cfg.heads} "
                            f"(causal, QuickGELU)")
            for i in range(cfg.depth)
        },
    }
    return TextJaxModel(
        name=cfg.name,
        layers=clip_text.layer_fns(cfg),
        params=params,
        layer_params_fn=clip_text.layer_params,
        descriptions=descriptions,
        category_names=None,
        text_cfg=cfg,
    )


def generate_zeroshot_graph_json(prompts: Optional[List[str]] = None) -> Dict:
    """Demo graph: image tower + text tower -> similarity -> category.

    Mirrors the reference's auto-generated model graphs
    (``/root/reference/main/context.py:55-73``) but joins TWO chains at the
    ``similarity`` node — the zero-shot classification workflow CLIP exists
    for. The category sink's labels are the prompts themselves.
    """
    prompts = prompts or list(DEFAULT_PROMPTS)
    from interactive_vit_tpu.models.clip import CLIPVisionConfig

    vcfg = CLIPVisionConfig()
    tcfg = clip_text.CLIPTextConfig()

    nodes: List[Dict] = []
    edges: List[Dict] = []

    def add(inst: Dict, x: int, y: int) -> int:
        nodes.append({"instance": inst, "pos": {"x": x, "y": y}})
        return len(nodes) - 1

    def net(endpoint: str, x: int, y: int, **params) -> int:
        return add({"kind": "net_node", "endpoint": endpoint,
                    "params": params}, x, y)

    # schema quirk kept from the reference frontend: "in_port" is the
    # SOURCE end of an edge, "out_port" the destination (graph_from_json)
    def chain(src: int, dst: int, ch_out="o", ch_in="o") -> None:
        edges.append({"in_port": {"node": src, "channel": ch_out},
                      "out_port": {"node": dst, "channel": ch_in}})

    # derive both chains from the models' own layer lists (layer_fns is
    # the single source of the node-name sequence; a renamed/added layer
    # shows up here without a silent skip)
    from interactive_vit_tpu.models import clip as clip_vision

    vnames = [lname for lname, _, _ in clip_vision.layer_fns(vcfg)]
    tnames = [lname for lname, _, _ in clip_text.layer_fns(tcfg)]

    img = add({"kind": "img_src"}, 0, 0)
    prev = img
    for i, lname in enumerate(vnames):
        n = net(f"{vcfg.name}:{lname}", 200 + (i % 6) * 200, (i // 6) * 160)
        chain(prev, n)
        prev = n
    img_emb = prev

    t_embed = None
    prev = None
    for i, lname in enumerate(tnames):
        params = ({"prompts": json.dumps(prompts)} if lname == "embed"
                  else {})
        n = net(f"{tcfg.name}:{lname}", (i % 6) * 200,
                700 + (i // 6) * 160, **params)
        if prev is not None:
            chain(prev, n)
        if lname == "embed":
            t_embed = n
        prev = n
    txt_emb = prev
    chain(t_embed, txt_emb, ch_out="eot", ch_in="eot")

    # server-only kinds ride as net_node instances in saved graphs (the
    # frontend has no dedicated class for them — same as pca_view/patch_sim)
    sim = net("similarity", 1500, 450)
    chain(img_emb, sim, ch_in="a")
    chain(txt_emb, sim, ch_in="b")
    cat = add({"kind": "category", "cats": prompts}, 1700, 450)
    chain(sim, cat)
    return {"nodes": nodes, "edges": edges}


def instances():
    return [make_clip_text_model()]
