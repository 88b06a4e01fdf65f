"""Parameter checkpointing (orbax) + the graph-JSON checkpoint contract.

The reference's only checkpoint story was graph-topology JSON download /
upload plus torchvision's pretrained download (SURVEY.md §5). Here:

* graph topology: the JSON schema in ``wire/schema.py`` (unchanged public
  contract, served by the graph library);
* model weights: orbax checkpoints of the functional pytrees, working for
  any model in ``models/`` (they are all plain pytrees), sharding-aware on
  restore (pass a target pytree laid out on a mesh and orbax places shards
  directly).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_params(path: str, params: Any) -> None:
    """Save a param pytree to ``path`` (an orbax checkpoint directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(path, params, force=True)


def load_params(path: str, like: Optional[Any] = None) -> Any:
    """Restore a param pytree.

    ``like``: an abstract/concrete pytree giving dtypes, shapes, and —
    crucially for multi-chip — shardings; restored arrays land directly on
    the right devices. Without it the checkpoint's stored structure is used.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckpt:
        if like is None:
            return ckpt.restore(path)
        def to_abstract(x):
            # non-array leaves (Python scalars in train states) pass
            # through as arrays — the contract is "any pytree"
            if not hasattr(x, "shape"):
                import numpy as np

                x = np.asarray(x)
            return jax.ShapeDtypeStruct(
                x.shape, x.dtype, sharding=getattr(x, "sharding", None))

        return ckpt.restore(path, jax.tree.map(to_abstract, like))


def state_keys(path: str) -> set:
    """Top-level keys of a saved pytree WITHOUT reading array data
    (orbax metadata only). Lets train-state loaders build the exact
    ``like`` structure the checkpoint actually has — optional subtrees
    (EMA weights, the qkv-layout marker) come and go with flags."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckpt:
        md = ckpt.metadata(os.path.abspath(path))
    return set(md.item_metadata.tree.keys())


class AsyncSaver:
    """Non-blocking checkpointing for training loops.

    ``save()`` snapshots the pytree's device buffers and writes in a
    background thread via orbax's AsyncCheckpointer, so the train step
    for the NEXT interval overlaps the disk write (a blocking
    ViT-B-class state save costs hundreds of ms of step time every
    --save-every interval). At most one save is in flight: a new save
    first waits out the previous one (orbax requires it, and it bounds
    dirty state to one interval on a slow disk)."""

    def __init__(self) -> None:
        import orbax.checkpoint as ocp

        self._ckpt = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())

    def save(self, path: str, tree: Any) -> None:
        self._ckpt.wait_until_finished()
        # D2H in THIS thread: orbax's background thread would otherwise
        # materialize the device shards itself, and cross-thread
        # device->host transfers deadlock on this backend (CLAUDE.md
        # trap #5). The host snapshot also decouples the write from
        # donated-buffer reuse by the next train step.
        tree = jax.device_get(tree)
        self._ckpt.save(os.path.abspath(path), args=_standard_args(tree),
                        force=True)

    def wait(self) -> None:
        self._ckpt.wait_until_finished()

    def close(self) -> None:
        self._ckpt.wait_until_finished()
        self._ckpt.close()


def _standard_args(tree: Any):
    import orbax.checkpoint as ocp

    return ocp.args.StandardSave(tree)
