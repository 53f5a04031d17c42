"""Shared band-count derivation for both LSH families.

A tiny dependency-free module (imports nothing from the operator
package) so `operators/similarity.py` (cosine sign-LSH) and
`operators/dedup.py` (MinHash backstop) can share one definition
without a circular import — similarity's module-level ORACLES pulls
text_ops, which imports dedup, so dedup must not import similarity.
"""

from __future__ import annotations

import math


def derive_bands(q: float, miss_target: float, max_bands: int) -> int:
    """Band count from the per-band true-pair match probability ``q``:
    the pair is missed only if all B bands miss, so
    B = ⌈ln(miss_target)/ln(1−q)⌉, floored at 4 and capped at
    ``max_bands``. ``q`` is clamped away from {0, 1} so threshold
    endpoints (τ→±1 cosine, J-τ→{0,1} Jaccard) degrade to the cap
    instead of raising log(0)/div-zero. One definition so the
    round-12/13 clamp-and-cap lessons can never drift between the two
    geometry formulas (round-13 review)."""
    q = min(max(q, 1e-12), 1.0 - 1e-12)
    bands = max(4, math.ceil(math.log(miss_target) / math.log(1.0 - q)))
    return min(bands, max_bands)
