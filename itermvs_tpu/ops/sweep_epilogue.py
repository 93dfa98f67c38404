"""Fused sweep epilogue: corner-sum + group-mean as one G-major pass.

The plane-sweep hot loop's per-(view, level) chain after the row gather
is, in XLA terms: relayout the gathered [P, 4C] block column-major,
corner-sum it to [P, C], multiply by the reference features, reshape to
[B, n, H, W, G, C/G] (another relayout) and group-mean-reduce to
[B, n, H, W, G]. Device traces (docs/PERFORMANCE.md) attribute ~14 ms
of the 82 ms step at 1152×864 to these relayout passes — every gathered
element crosses HBM 4-5 times.

This module replaces everything after the gather fusion with ONE pass
(reference hot path: models/module.py:118-125 `F.grid_sample` +
models/itermvs.py:49-51 group correlation). The algebraic key: the
reference-feature product is corner-independent, so it distributes into
the per-corner terms —

    corr[g] = (1/cg) Σ_j ref[gj] Σ_c w_c·tab_c[gj]
            = (1/cg) Σ_{c,j} (w_c·ref[gj]·tab_c[gj])

and therefore BOTH the bilinear tap weights and the reference features
premultiply the gathered [P, 4C] block elementwise (fusing into XLA's
gather fusion — no extra HBM pass), leaving only

    corr[G, P] = M4[G, 4C] @ premul[P, 4C]^T,   M4 = corner-tiled
                 block-diagonal group matrix / cg

which the Pallas kernel computes as a single MXU contraction per row
block with f32 accumulation — exactly the f32-accumulated mean of the
XLA path, in G-major [G, P] layout (the physical layout XLA assigns to
the correlation consumers' conv inputs).

STATUS: measured and REJECTED on v5e (round 4) — kept, with its parity
tests, for re-evaluation on future toolchains. Three formulations were
device-measured (tools/exp_epilogue.py, amortized in-jit loops): the
kernel itself hits only ~286 GB/s on the tile-hostile 64-lane level-1
blocks, and XLA refuses to fuse the tap/ref premultiply into the gather
fusion (a separate broadcast pass materializes, ~190 MB at init), so
the fused path measured 0.39-0.82x the existing XLA chain on every
in-context-representative shape. Full numbers and the two in-context
counter-experiments (G-major einsum group mean: 82.2 -> 99.0 ms/step)
in docs/PERFORMANCE.md "Measured and rejected (round 4)".
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _pick_block_rows(p: int) -> int | None:
    """Largest lane-tileable row-block size dividing P (the output's
    lane dim must be a multiple of 128); None if P has none."""
    for br in (1024, 512, 256, 128):
        if p % br == 0:
            return br
    return None


def _epilogue_kernel(w_ref, m_ref, o_ref):
    """One row-block tile.

    w_ref: [Br, 4C] gathered corners, tap- and ref-premultiplied.
    m_ref: [G, 4C] corner-tiled block-diagonal group-mean matrix.
    o_ref: [G, Br] f32 output tile (G-major).
    """
    o_ref[:] = jax.lax.dot_general(
        m_ref[:], w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("c", "groups"))
def _epilogue_call(premul, c, groups):
    p = premul.shape[0]
    br = _pick_block_rows(p)
    cg = c // groups
    m4 = np.tile(np.repeat(np.eye(groups), cg, axis=0) / cg, (4, 1))
    mean_mat = jnp.asarray(m4.T, premul.dtype)             # [G, 4C]
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl.pallas_call(
        _epilogue_kernel,
        out_shape=jax.ShapeDtypeStruct((groups, p), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(p // br,),
            in_specs=[
                pl.BlockSpec((br, 4 * c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((groups, 4 * c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((groups, br), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
        ),
    )(premul, mean_mat)


def supports(p: int) -> bool:
    """Whether the fused kernel can block a P-row sweep."""
    return _pick_block_rows(p) is not None


def premultiply(vals: jnp.ndarray, taps, ref_flat: jnp.ndarray, n: int
                ) -> jnp.ndarray:
    """Fold tap weights and reference features into the gathered block.

    Args:
      vals: [n*HW, 4C] gathered corner rows (table dtype).
      taps: 4-tuple of [n*HW] tap weights (table dtype).
      ref_flat: [HW, C] reference features.
      n: depth-sample count (rows ordered sample-major).

    Returns [n*HW, 4C]; every op is elementwise/broadcast on the gather
    output, so XLA fuses the whole thing into the gather fusion.
    """
    hw, c = ref_flat.shape
    p = n * hw
    tap_stack = jnp.stack(taps, axis=-1)                   # [P, 4]
    v = (vals.reshape(n, hw, 4, c)
         * tap_stack.reshape(n, hw, 4, 1)
         * ref_flat[None, :, None, :].astype(vals.dtype))
    return v.reshape(p, 4 * c)


def corr_epilogue(premul: jnp.ndarray, n: int, groups: int) -> jnp.ndarray:
    """Fused corner-sum + group-mean over a premultiplied block.

    Args:
      premul: [n*HW, 4C] from `premultiply`.
      n: depth-sample count.
      groups: correlation group count G (C must divide).

    Returns [G, n, HW] float32, G-major.
    """
    p, c4 = premul.shape
    out = _epilogue_call(premul, c4 // 4, groups)
    return out.reshape(groups, n, p // n)


def corr_epilogue_reference(premul, n, groups):
    """XLA reference of `corr_epilogue` (same math, test oracle)."""
    p, c4 = premul.shape
    c = c4 // 4
    s = premul.reshape(n, p // n, 4, c).astype(jnp.float32).sum(axis=2)
    corr = s.reshape(n, p // n, groups, c // groups).mean(axis=-1)
    return corr.transpose(2, 0, 1)                         # [G, n, HW]
