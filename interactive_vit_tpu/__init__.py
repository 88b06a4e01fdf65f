"""interactive_vit_tpu — a TPU-native interactive tappable-graph framework.

A ground-up rebuild of the capabilities of the reference app
``0Marble/interactive-vit`` (an interactive dataflow-graph visualizer whose
compute core ran torch CPU submodules one at a time,
``/root/reference/main/context.py:143-147``), re-designed TPU-first:

* the graph executor stages an entire graph into ONE jitted XLA program with
  the *tapped* edges as explicit outputs (``graph/executor.py``) instead of an
  eager per-node loop;
* hot ops (flash attention with attention-map taps, fused LayerNorm+GELU MLP,
  fused preprocessing/patchify) are Pallas TPU kernels (``ops/``);
* models (ViT family, CLIP image encoder) are functional pytree programs whose
  every block is a tappable graph node (``models/``);
* scaling is expressed as ``jax.sharding.Mesh`` + sharding constraints so XLA
  lowers collectives onto ICI (``parallel/``);
* the serving layer micro-batches concurrent interactive requests into TPU
  batches (``serving/``), speaking the reference's binary wire protocol
  (``wire/``, magics 0x69babe69 / 0xdeadbeef preserved byte-for-byte).
"""

__version__ = "0.1.0"

from interactive_vit_tpu.graph.ir import Graph, Node, Port, Edge, Pinout  # noqa: F401
from interactive_vit_tpu.graph.registry import NodeKind, Registry, registry  # noqa: F401
from interactive_vit_tpu.graph.executor import Executor, NodeError  # noqa: F401
