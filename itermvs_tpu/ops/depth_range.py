"""Inverse-depth normalization.

All depth state in the model lives in normalized inverse-depth space
`norm(d) = (1/d − 1/d_max) / (1/d_min − 1/d_max) ∈ [0, 1]`
(reference semantics: models/module.py:142-152, including the 1e-5
epsilon on the forward normalization only).
"""
from __future__ import annotations

import jax.numpy as jnp


def depth_normalization(depth, inverse_depth_min, inverse_depth_max):
    """Depth map → normalized inverse-depth index in [0, 1]."""
    inverse_depth = 1.0 / (depth + 1e-5)
    return (inverse_depth - inverse_depth_max) / (inverse_depth_min - inverse_depth_max)


def depth_unnormalization(normalized_depth, inverse_depth_min, inverse_depth_max):
    """Normalized inverse-depth index → depth map."""
    inverse_depth = inverse_depth_max + normalized_depth * (
        inverse_depth_min - inverse_depth_max
    )
    return 1.0 / inverse_depth
