"""Mutual nearest-neighbor descriptor matcher.

Behavioral spec from the reference
(src/models/matchers/nn/nearest_neighbour.py:5-63): cosine-similarity
mutual-NN with optional ratio test and similarity threshold; used by the
tracker for keyframe<->query matching. Static shapes + masks, jit/vmap-safe.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from onepose_tpu.models.common import NEG_INF


def mutual_nn_match(
    desc0: jnp.ndarray,
    desc1: jnp.ndarray,
    mask0: Optional[jnp.ndarray] = None,
    mask1: Optional[jnp.ndarray] = None,
    ratio_thresh: Optional[float] = None,
    distance_thresh: Optional[float] = None,
) -> dict:
    """Match [.., N0, C] vs [.., N1, C] L2-normalized descriptors.

    Returns matches0 [.., N0] (-1 = unmatched), sim0 [.., N0].
    ratio_thresh: NN2/NN1 ratio test on cosine *distance* (1 - sim).
    distance_thresh: max cosine distance of the best match.
    """
    sim = jnp.einsum("...nc,...mc->...nm", desc0, desc1)
    if mask0 is not None:
        sim = jnp.where(mask0[..., :, None], sim, NEG_INF)
    if mask1 is not None:
        sim = jnp.where(mask1[..., None, :], sim, NEG_INF)

    idx0 = jnp.argmax(sim, axis=-1)
    idx1 = jnp.argmax(sim, axis=-2)
    best0 = jnp.max(sim, axis=-1)

    n0 = sim.shape[-2]
    arange0 = jnp.arange(n0)
    mutual = arange0 == jnp.take_along_axis(idx1, idx0, axis=-1)
    valid = mutual & (best0 > NEG_INF / 2)

    if ratio_thresh is not None:
        # Ratio test on cosine distances: suppress the argmax column per
        # row to find the runner-up similarity.
        top1 = best0
        suppressed = jnp.where(
            jnp.arange(sim.shape[-1]) == idx0[..., None], NEG_INF, sim
        )
        top2 = jnp.max(suppressed, axis=-1)
        d1 = 1.0 - top1
        d2 = 1.0 - top2
        valid &= d1 / jnp.maximum(d2, 1e-9) <= ratio_thresh
    if distance_thresh is not None:
        valid &= (1.0 - best0) <= distance_thresh
    if mask0 is not None:
        valid &= mask0

    return {
        "matches0": jnp.where(valid, idx0, -1),
        "similarity0": jnp.where(valid, best0, 0.0),
        "valid0": valid,
    }


class NNMatcher2D3D:
    """2D-3D mutual-NN matcher speaking the GATsSPG pipeline protocol.

    Matches query descriptors directly against the aggregated 3D point
    descriptors — no learned transform. This is the reference NN matcher
    (src/models/matchers/nn/nearest_neighbour.py:5-63) lifted from the
    tracker to the 2D-3D serving path, and doubles as the oracle matching
    mode: when inference uses the same extractor weights that built the
    map, descriptor identity alone solves the 2D-3D association, so the
    full map -> infer product path can be accuracy-gated end-to-end
    without trained GATsSPG weights.
    """

    def __init__(self, distance_thresh: float = 0.7):
        self.distance_thresh = distance_thresh

    def init(self, *args, **kwargs) -> dict:
        return {}

    def apply(
        self,
        params: dict,
        desc2d: jnp.ndarray,
        desc3d: jnp.ndarray,
        leaf_desc: jnp.ndarray = None,
        mask2d: Optional[jnp.ndarray] = None,
        mask3d: Optional[jnp.ndarray] = None,
        leaf_mask: Optional[jnp.ndarray] = None,
    ) -> dict:
        del params, leaf_desc, leaf_mask

        def _norm(d):
            return d / jnp.maximum(
                jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12
            )

        m = mutual_nn_match(
            _norm(desc2d), _norm(desc3d), mask2d, mask3d,
            distance_thresh=self.distance_thresh,
        )
        return {
            "matches0": m["matches0"],
            "matching_scores0": m["similarity0"],
            "valid0": m["valid0"],
            "conf_matrix": None,
        }
