"""IterMVS core: plane-sweep matching + GRU probability iteration.

TPU-native re-design of the reference estimator (models/itermvs.py):

* every map is NHWC; depth-sample stacks are `[B, N, H, W]`;
* per-source-view Python loops remain *static* unrolls (V is a
  compile-time constant per dataset config) accumulating a weighted
  correlation sum, so peak memory stays one view's warp like the
  reference's sequential loop (itermvs.py:48-65);
* the GRU iteration count is static and unrolled — XLA sees one flat
  graph and schedules the 3·(V−1) warps per iteration freely;
* probability readout (windowed expectation around the argmax,
  itermvs.py:203-219) uses `take_along_axis` over the 256-bin axis with
  a stop-gradiented window.

Numerical-semantics notes (all verified in tests/test_model_parity.py
against the reference run under torch-CPU):
  - init-branch view weights are bilinearly ×2 upsampled BEFORE reuse
    (itermvs.py:56-57) and frozen with stop_gradient during iterations
    (itermvs.py:295);
  - correlation aggregation divides by (1e-5 + Σ view weights)
    (itermvs.py:37-38);
  - hidden state is initialized from the 32-channel level-3 CorrNet
    score volume, ×2 upsampled then tanh'd (itermvs.py:159-164).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from itermvs_tpu.models.blocks import Conv, ConvGRU, ConvReLU, ConvTranspose
from itermvs_tpu.ops.depth_range import depth_unnormalization
from itermvs_tpu.ops.resize import resize_bilinear, upsample_bilinear
from itermvs_tpu.ops.grid_sample import (
    FAST_GATHER_MAX_ROWS, BandedSource, PackedSource, PairSource,
    SuperpixelSource,
    gather_corners,
)
from itermvs_tpu.ops.warping import (
    fused_sweep_taps, group_corr, interleave_perm, pack_bilinear,
    warp_corr_packed,
)

NUM_BINS = 256          # output probability bins over normalized inverse depth
RADIUS = 4              # windowed-expectation half width
NUM_INIT_SAMPLES = 32   # initialization sweep samples
GROUPS = 8              # correlation groups
INTERVAL_SCALE = 1.0 / 256.0

# Per-level sampling offsets in normalized-inverse-depth units
# (reference itermvs.py:231-235), scaled by INTERVAL_SCALE at use site.
CORR_INTERVALS = {
    "level1": (-2.0, -2.0 / 3.0, 2.0 / 3.0, 2.0),
    "level2": (-8.0, -8.0 / 3.0, 8.0 / 3.0, 8.0),
    "level3": (-32.0, 32.0),
}


def initial_depth_samples(inverse_depth_min, inverse_depth_max, height, width,
                          num_sample: int = NUM_INIT_SAMPLES):
    """Uniform inverse-depth sweep `[B, num_sample, H, W]` (itermvs.py:6-19)."""
    batch = inverse_depth_min.shape[0]
    idmin = inverse_depth_min.reshape(batch, 1, 1, 1)
    idmax = inverse_depth_max.reshape(batch, 1, 1, 1)
    frac = jnp.arange(num_sample, dtype=jnp.float32).reshape(1, num_sample, 1, 1) / (
        num_sample - 1
    )
    inv = idmax + frac * (idmin - idmax)
    return jnp.broadcast_to(1.0 / inv, (batch, num_sample, height, width))


def windowed_expectation(probability: jnp.ndarray) -> jnp.ndarray:
    """Normalized depth from a [B, H, W, NUM_BINS] distribution.

    Expectation over the ±RADIUS window around the (stop-gradiented)
    argmax bin, normalized by the window's probability mass.

    Formulated as a masked reduction over the bin axis instead of a
    9-tap take_along_axis: batched gathers fall onto a scalarized XLA
    path on TPU (~7 ms per call at DTU eval size vs ~0.2 ms for the
    fused mask-multiply-reduce). Exact-math equivalent, including the
    reference's boundary behavior where `clip(argmax+k)` duplicates
    bin 0 / bin NUM_BINS-1 (duplicates become per-bin integer weights:
    `max(0, RADIUS - argmax)` extra counts at bin 0, symmetric at the
    top bin).
    """
    index = jnp.argmax(probability, axis=-1)                  # [B, H, W]
    index = jax.lax.stop_gradient(index)
    dt = probability.dtype
    bins = jnp.arange(NUM_BINS, dtype=dt)                     # [NUM_BINS]
    idx = index[..., None].astype(dt)                         # [B, H, W, 1]
    weight = (jnp.abs(bins - idx) <= RADIUS).astype(dt)
    extra_lo = jnp.maximum(RADIUS - idx, 0.0)
    extra_hi = jnp.maximum(idx + RADIUS - (NUM_BINS - 1), 0.0)
    weight = (weight
              + jnp.where(bins == 0.0, extra_lo, 0.0)
              + jnp.where(bins == float(NUM_BINS - 1), extra_hi, 0.0))
    pw = probability * weight                                 # [B,H,W,NUM_BINS]
    regress = jnp.sum(pw * bins, axis=-1) / (1e-6 + jnp.sum(pw, axis=-1))
    return (regress / (NUM_BINS - 1.0))[..., None]            # [B, H, W, 1]


def chunked_warp_corr(packed, ref, flat_idx, taps, shape, groups):
    """Gather + bilinear taps + group correlation, chunked on SAMPLE
    boundaries so each gather emits at most FAST_GATHER_MAX_ROWS rows.

    XLA:TPU fuses the tap-sum epilogue into the gather fusion only
    while the emitted block stays within the 2^15-sublane-tile budget
    that also governs table residency: above it (e.g. the 4-sample
    level-1/2 iteration gathers at 1600×1152 emit 460800 rows, the init
    sweep 921600) the raw [rows, kC] block is materialized to HBM and
    relayed through separate column-major copies + sum fusions —
    ~30 ms/step of pure relayout in the round-5 device trace. Chunking
    is exact: each sample's gather → taps → f32 group mean is
    independent, so per-chunk evaluation + concat along the sample axis
    is the same arithmetic (pinned by the parity tests).

    Args:
      flat_idx: [B, N, H·W] int32 row indices; taps: 4× same shape.
      shape: (n, h, w, c) of the warped block.
    Returns correlation [B, N, H, W, G] (float32)."""
    n, h, w, c = shape
    b = flat_idx.shape[0]
    hw = h * w
    # Budget counts EMITTED rows, so the batch dimension participates:
    # a gather over [B, chunk·H·W] indices emits B·chunk·H·W rows.
    chunk = max(1, min(n, FAST_GATHER_MAX_ROWS // (b * hw)))
    outs = []
    for s0 in range(0, n, chunk):
        s1 = min(s0 + chunk, n)
        warped = gather_corners(
            packed, flat_idx[:, s0:s1].reshape(b, -1),
            *[t[:, s0:s1].reshape(b, -1) for t in taps],
        ).reshape(b, s1 - s0, h, w, c)
        outs.append(group_corr(warped, ref, groups))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


class PixelViewWeight(nn.Module):
    """Per-pixel source-view weight (reference itermvs.py:333-350)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, corr):
        """corr: [B, N, H, W, G] → weight [B, H, W, 1]."""
        b, n, h, w, g = corr.shape
        x = corr.reshape(b * n, h, w, g)
        x = ConvReLU(16, dtype=self.dtype, name="conv0")(x)
        x = Conv(1, 1, pad=0, dtype=self.dtype, name="conv1")(x)
        x = x.reshape(b, n, h, w).astype(jnp.float32)
        x = jax.nn.softmax(x, axis=1)
        return jnp.max(x, axis=1)[..., None]


class CorrNet(nn.Module):
    """Per-depth-slice 2D encoder-decoder on correlation (itermvs.py:352-381)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, corr):
        """corr: [B, N, H, W, G] → score volume [B, N, H, W] (float32)."""
        dt = self.dtype
        b, n, h, w, g = corr.shape
        x = corr.reshape(b * n, h, w, g)
        conv0 = ConvReLU(8, dtype=dt, name="conv0")(x)
        conv1 = ConvReLU(16, stride=2, dtype=dt, name="conv1")(conv0)
        x = ConvReLU(32, stride=2, dtype=dt, name="conv2")(conv1)
        x = conv1 + ConvTranspose(16, dtype=dt, name="conv3")(x)
        x = conv0 + ConvTranspose(8, dtype=dt, name="conv4")(x)
        x = Conv(1, 3, dtype=dt, name="conv5")(x)
        return x.reshape(b, n, h, w).astype(jnp.float32)


class Evaluation(nn.Module):
    """Plane-sweep matching: warp + group corr + view-weighted aggregation.

    `interleave=True` expects features permuted by
    ops/warping.py:interleave_perm (group channels at stride G) and runs
    the group sum as contiguous lane slices instead of a reshape+reduce.
    """
    dtype: Any = jnp.float32
    interleave: bool = False

    def setup(self):
        self.pixel_view_weight = PixelViewWeight(dtype=self.dtype,
                                                 name="pixel_view_weight")
        self.corr_net1 = CorrNet(dtype=self.dtype, name="corr_net1")
        self.corr_net2 = CorrNet(dtype=self.dtype, name="corr_net2")
        self.corr_net3 = CorrNet(dtype=self.dtype, name="corr_net3")

    def _corr_net(self, level: int) -> CorrNet:
        return (self.corr_net1, self.corr_net2, self.corr_net3)[level - 1]

    def init_sweep(self, ref_feature, src_features, rel_projs, depth_samples,
                   inverse_depth_min, inverse_depth_max):
        """Initialization branch on level 3 (reference itermvs.py:36-82).

        Args:
          ref_feature: [B, H8, W8, 48] level-3 reference feature.
          src_features: list of V−1 corner-packed [B, H8, W8, 4·48]
            maps (a list, not a stacked array, so packing consumes the
            per-view slice directly — no [B, V−1, ...] slice copies).
          rel_projs: [B, V−1, 4, 4] level-3 relative projections.
          depth_samples: [B, 32, H8, W8].

        Returns:
          view_weights [B, V−1, H4, W4, 1] (×2 upsampled),
          score volume [B, H8, W8, 32] (CorrNet output, channels-last),
          initial depth [B, H4, W4, 1] (×2 upsampled expectation).
        """
        num_views = len(src_features)
        num_sample = depth_samples.shape[1]

        # Warps stay per view (separate gather tables keep the fast
        # gather path); the projective/tap math batches over the view
        # axis in one fused chain (fused_sweep_taps), like the
        # iteration branch, and the view-weight convs and weighted
        # aggregation run batched over views.
        if self.interleave:
            per_view = [
                warp_corr_packed(src_features[v], ref_feature,
                                 rel_projs[:, v], depth_samples, GROUPS,
                                 interleaved=True)
                for v in range(num_views)
            ]
        else:
            b_, n_, h_, w_ = depth_samples.shape
            c = src_features[0].src_shape[-1] // 4
            table_dtype = (src_features[0].bands[0].dtype
                           if hasattr(src_features[0], "bands")
                           else src_features[0].data.dtype)
            flat_idx, taps = fused_sweep_taps(
                rel_projs[:, :, None], depth_samples, (0,) * n_,
                (src_features[0].src_shape[1:3],), table_dtype)
            per_view = [
                chunked_warp_corr(
                    src_features[v], ref_feature,
                    flat_idx[:, v].reshape(b_, n_, h_ * w_),
                    [t[:, v].reshape(b_, n_, h_ * w_) for t in taps],
                    (n_, h_, w_, c), GROUPS)
                for v in range(num_views)
            ]
        corr = jnp.stack(per_view, axis=1)                   # [B,V,N,H,W,G]
        b, _, n, h, w, g = corr.shape
        weight = self.pixel_view_weight(
            corr.reshape(b * num_views, n, h, w, g))         # [B·V,H,W,1]
        weight = weight.reshape(b, num_views, h, w)
        correlation = jnp.einsum("bvnhwg,bvhw->bnhwg", corr, weight) / (
            1e-5 + jnp.sum(weight, axis=1)[:, None, :, :, None])

        score = self._corr_net(3)(correlation)               # [B,N,H,W]
        view_weights = upsample_bilinear(weight[..., None], 2)  # [B,V-1,H4,W4,1]

        probability = jax.nn.softmax(score, axis=1)
        index = jnp.arange(num_sample, dtype=jnp.float32).reshape(1, num_sample, 1, 1)
        expectation = jnp.sum(index * probability, axis=1)   # [B,H,W]
        normalized_depth = (expectation / (num_sample - 1.0))[..., None]
        depth = depth_unnormalization(
            normalized_depth,
            inverse_depth_min.reshape(-1, 1, 1, 1),
            inverse_depth_max.reshape(-1, 1, 1, 1),
        )
        depth = upsample_bilinear(depth, 2)                  # [B,H4,W4,1]
        score_nhwc = score.transpose(0, 2, 3, 1)             # [B,H8,W8,N]
        return view_weights, score_nhwc, depth

    def iter_sweep(self, ref_features, src_features, rel_projs, depth_samples,
                   view_weights):
        """Iteration branch over levels 1..3 (reference itermvs.py:84-126).

        Args:
          ref_features: dict level1..3, ALREADY resized to the 1/4 grid
            (iteration-invariant — the caller hoists the resize out of
            the GRU loop; reference re-interpolates per call,
            itermvs.py:95-98).
          src_features: dict level1..3 of per-view lists of
            corner-packed [B, Hl, Wl, 4·Cl] at native level resolution.
          rel_projs: dict level1..3 of [B, V−1, 4, 4].
          depth_samples: [B, 10, H4, W4] per-level sample stacks
            concatenated along axis 1 (level1 ×4, level2 ×4, level3 ×2).
          view_weights: [B, V−1, H4, W4, 1], frozen.

        Returns correlation [B, H4, W4, 10] (4+4+2 level channels).

        The projective + bilinear-tap math for all 3 levels × V−1 views
        runs as one fused [B, V, 10, H, W] chain (ops/warping.py:
        fused_sweep_taps) — only the row gathers and correlation
        reductions stay per (view, level), since each view×level has
        its own packed table. The interleave variant keeps the
        per-(view, level) path (packing follows a channel permutation).
        """
        view_weights = jax.lax.stop_gradient(view_weights)
        num_views = view_weights.shape[1]
        w_hw = view_weights[..., 0]                           # [B,V,H4,W4]
        weight_sum = 1e-5 + jnp.sum(w_hw, axis=1)[:, None, :, :, None]
        counts = {1: 4, 2: 4, 3: 2}
        aggs = {}
        if self.interleave:
            off = 0
            for level in (1, 2, 3):
                key = f"level{level}"
                n = counts[level]
                samples = depth_samples[:, off:off + n]
                off += n
                agg = None
                for v in range(num_views):
                    corr_v = warp_corr_packed(src_features[key][v],
                                              ref_features[key],
                                              rel_projs[key][:, v], samples,
                                              GROUPS, interleaved=True)
                    wv = w_hw[:, v][:, None, :, :, None]       # [B,1,H,W,1]
                    agg = corr_v * wv if agg is None else agg + corr_v * wv
                aggs[level] = agg / weight_sum
        else:
            b, n_all, h, w = depth_samples.shape
            rel_stack = jnp.stack(
                [rel_projs[f"level{l}"] for l in (1, 2, 3)], axis=2)
            src_hws = tuple(src_features[f"level{l}"][0].src_shape[1:3]
                            for l in (1, 2, 3))
            level_of_sample = (0,) * 4 + (1,) * 4 + (2,) * 2
            table_dtype = (src_features["level1"][0].bands[0].dtype
                           if hasattr(src_features["level1"][0], "bands")
                           else src_features["level1"][0].data.dtype)
            flat_idx, taps = fused_sweep_taps(
                rel_stack, depth_samples, level_of_sample, src_hws,
                table_dtype)
            off = 0
            for level in (1, 2, 3):
                key = f"level{level}"
                n = counts[level]
                ref = ref_features[key]
                c = src_features[key][0].src_shape[-1] // 4
                # Accumulate the weighted sum in the unrolled view loop
                # instead of stacking [B,V,Nl,H,W,G] and reducing —
                # keeps peak memory at one view's correlation.
                agg = None
                for v in range(num_views):
                    idx_vl = flat_idx[:, v, off:off + n].reshape(b, n, h * w)
                    t_vl = [t[:, v, off:off + n].reshape(b, n, h * w)
                            for t in taps]
                    corr_v = chunked_warp_corr(
                        src_features[key][v], ref, idx_vl, t_vl,
                        (n, h, w, c), GROUPS)
                    wv = w_hw[:, v][:, None, :, :, None]       # [B,1,H,W,1]
                    agg = corr_v * wv if agg is None else agg + corr_v * wv
                aggs[level] = agg / weight_sum
                off += n

        correlations = [self.corr_net1(aggs[1]), self.corr_net2(aggs[2]),
                        self.corr_net3(aggs[3])]
        out = jnp.concatenate(correlations, axis=1)           # [B,10,H4,W4]
        return out.transpose(0, 2, 3, 1)                      # [B,H4,W4,10]


class Update(nn.Module):
    """ConvGRU + depth/confidence heads (reference itermvs.py:129-220)."""
    hidden_dim: int = 32
    dtype: Any = jnp.float32

    def setup(self):
        dt = self.dtype
        self.gru = ConvGRU(self.hidden_dim, dtype=dt, name="gru")
        self.depth_conv0 = Conv(32, 3, pad=2, dilation=2, use_bias=False,
                                dtype=dt, name="depth_conv0")
        self.depth_conv1 = Conv(64, 1, pad=0, use_bias=False, dtype=dt,
                                name="depth_conv1")
        self.depth_conv2 = Conv(NUM_BINS, 1, pad=0, dtype=dt, name="depth_conv2")
        self.conf_conv0 = Conv(32, 3, pad=2, dilation=2, use_bias=False,
                               dtype=dt, name="conf_conv0")
        self.conf_conv1 = Conv(1, 1, pad=0, dtype=dt, name="conf_conv1")
        self.hidden_conv0 = Conv(64, 3, use_bias=False, dtype=dt,
                                 name="hidden_conv0")
        self.hidden_conv1 = Conv(self.hidden_dim, 1, pad=0, dtype=dt,
                                 name="hidden_conv1")

    def _depth_head(self, hidden):
        x = nn.relu(self.depth_conv0(hidden))
        x = nn.relu(self.depth_conv1(x))
        # float32 logits: the 256-bin softmax + windowed expectation are
        # precision-critical (depth readout granularity is 1/255).
        return self.depth_conv2(x).astype(jnp.float32)       # [B,H,W,256]

    def _confidence_head(self, hidden):
        x = nn.relu(self.conf_conv0(hidden))
        return self.conf_conv1(x).astype(jnp.float32)        # [B,H,W,1]

    def hidden_init(self, score_volume):
        """[B, H8, W8, 32] level-3 score volume → hidden [B, H4, W4, hidden]."""
        x = nn.relu(self.hidden_conv0(score_volume))
        x = self.hidden_conv1(x)
        x = upsample_bilinear(x, 2)
        return nn.tanh(x)

    def conf_init(self, hidden):
        logits = self._confidence_head(hidden)
        return nn.sigmoid(logits), logits

    def depth_init(self, hidden):
        probability = jax.nn.softmax(self._depth_head(hidden), axis=-1)
        return windowed_expectation(probability), probability

    def __call__(self, hidden, normalized_depth, corr, confidence_flag=False):
        """One GRU step. corr: [B, H, W, 10]; normalized_depth [B, H, W, 1]."""
        x = jnp.concatenate([normalized_depth, corr], axis=-1)
        hidden = self.gru(hidden, x)
        confidence = confidence_logits = None
        if confidence_flag:
            confidence_logits = self._confidence_head(hidden)
            confidence = nn.sigmoid(confidence_logits)
        probability = jax.nn.softmax(self._depth_head(hidden), axis=-1)
        normalized_depth = windowed_expectation(probability)
        return hidden, normalized_depth, probability, confidence, confidence_logits


class IterMVS(nn.Module):
    """Full estimator: init sweep → hidden/depth init → GRU iterations.

    Mirrors reference itermvs.py:223-329 control flow; `test=True`
    computes heads only where the reference does.
    """
    iteration: int = 4
    hidden_dim: int = 32
    test: bool = False
    dtype: Any = jnp.float32
    # Feature-channel interleaving for the warp/correlation path
    # (ops/warping.py:interleave_perm). Measured SLOWER end-to-end on
    # v5e (83 → 99 ms at 1152×864 bf16) despite removing the gathered
    # blocks' column-major relayout — kept available for re-evaluation,
    # off by default. See docs/PERFORMANCE.md.
    interleave: bool = False

    def setup(self):
        self.evaluation = Evaluation(dtype=self.dtype,
                                     interleave=self.interleave,
                                     name="evaluation")
        self.update = Update(self.hidden_dim, dtype=self.dtype, name="update")
        self.upsample_conv0 = Conv(64, 3, use_bias=False, dtype=self.dtype,
                                   name="upsample_conv0")
        self.upsample_conv1 = Conv(16 * 9, 1, pad=0, use_bias=False,
                                   dtype=self.dtype, name="upsample_conv1")

    def _upsample_weights(self, ref_level2):
        """Convex-upsample tap weights [B, H4, W4, 9, 4, 4] (itermvs.py:246-250)."""
        b, h, w, _ = ref_level2.shape
        x = nn.relu(self.upsample_conv0(ref_level2))
        x = self.upsample_conv1(x).astype(jnp.float32)       # [B,H,W,144]
        x = x.reshape(b, h, w, 9, 4, 4)
        return jax.nn.softmax(x, axis=3)

    def __call__(self, ref_features, src_features, rel_projs, depth_min, depth_max):
        """Args:
          ref_features: dict level1..3 NHWC maps for the reference view.
          src_features: dict level1..3 [B, V−1, Hl, Wl, Cl].
          rel_projs: dict level1..3 [B, V−1, 4, 4] (src @ inv(ref)).
          depth_min, depth_max: [B].

        Returns (train): dict with per-iteration lists; (test): final
        depth, upsampled depth, confidence, upsampled confidence.
        """
        batch, h4, w4, _ = ref_features["level2"].shape
        idmin = (1.0 / depth_min).reshape(batch)
        idmax = (1.0 / depth_max).reshape(batch)
        idmin_b = idmin.reshape(batch, 1, 1, 1)
        idmax_b = idmax.reshape(batch, 1, 1, 1)

        upsample_weights = self._upsample_weights(ref_features["level2"])

        # Optional: correlation-group channels interleaved to stride G
        # for the whole warp path (ops/warping.py:interleave_perm): the
        # group sum then runs as contiguous lane slices with no relayout
        # of any gathered block. The upsample head above consumed level2
        # in natural order; every consumer below is order-agnostic given
        # src and ref agree.
        if self.interleave:
            perms = {key: interleave_perm(ref_features[key].shape[-1], GROUPS)
                     for key in ("level1", "level2", "level3")}
            maybe_perm = lambda x, key: x[..., perms[key]]
        else:
            maybe_perm = lambda x, key: x

        # Corner-pack source features once per (view, level): the init
        # sweep and every GRU iteration re-warp the same sources.
        # Per-view python lists (not stacked arrays) so packing fuses
        # with the view slice instead of copying [B, V-1, ...] blocks.
        # src_features values may already BE per-view lists (the
        # feature-cached match path, pipeline.py:match).
        def _views(fea):
            if isinstance(fea, (list, tuple)):
                return list(fea)
            return [fea[:, v] for v in range(fea.shape[1])]

        src_views = {key: _views(src_features[key])
                     for key in ("level1", "level2", "level3")}
        num_src = len(src_views["level1"])

        # Source views may arrive already corner-packed (the eval.py
        # feature cache packs each view ONCE per scan and reuses the
        # table across every map the view serves — repacking here would
        # rebuild identical multi-MB tables per map). Interleaving
        # permutes channels before packing, so pre-packed tables are
        # only accepted in natural order.
        def _pack(view, key):
            if isinstance(view, (PackedSource, BandedSource, SuperpixelSource,
                                 PairSource)):
                if self.interleave:
                    raise ValueError(
                        "pre-packed sources are incompatible with "
                        "interleave=True (packing must follow the "
                        "channel permutation)")
                return view
            return pack_bilinear(maybe_perm(view, key))

        packed_src = {
            key: [_pack(view, key) for view in src_views[key]]
            for key in ("level1", "level2", "level3")
        }
        # Reference features on the 1/4 iteration grid, hoisted out of
        # the loop (iteration-invariant).
        ref_iter = {
            "level1": maybe_perm(
                resize_bilinear(ref_features["level1"], (h4, w4)), "level1"),
            "level2": maybe_perm(ref_features["level2"], "level2"),
            "level3": maybe_perm(
                resize_bilinear(ref_features["level3"], (h4, w4)), "level3"),
        }

        depth_samples = initial_depth_samples(idmin, idmax, h4 // 2, w4 // 2)
        view_weights, score_volume, init_depth = self.evaluation.init_sweep(
            maybe_perm(ref_features["level3"], "level3"), packed_src["level3"],
            rel_projs["level3"], depth_samples, idmin, idmax)

        hidden = self.update.hidden_init(score_volume)
        normalized_depth, probability = self.update.depth_init(hidden)

        depths: dict[str, list[Any]] = {"combine": [], "probability": [], "initial": []}
        confidences = []
        depth = depth_upsampled = confidence = confidence_upsampled = None

        if not self.test:
            depths["initial"].append(init_depth)
            confidence, confidence_logits = self.update.conf_init(hidden)
            depths["combine"].append(
                depth_unnormalization(normalized_depth, idmin_b, idmax_b))
            depths["probability"].append(probability)
            confidences.append(confidence_logits)
            normalized_depth = jax.lax.stop_gradient(normalized_depth)

        # Per-level sample offsets, fixed, concatenated along the sample
        # axis (level1 ×4, level2 ×4, level3 ×2): the whole per-iteration
        # sample construction + projective/tap math runs as one fused
        # [B, 10, H, W] chain (ops/warping.py:fused_sweep_taps).
        intervals = jnp.asarray(
            CORR_INTERVALS["level1"] + CORR_INTERVALS["level2"]
            + CORR_INTERVALS["level3"], jnp.float32
        ).reshape(1, -1, 1, 1) * INTERVAL_SCALE

        for it in range(self.iteration):
            nd = normalized_depth[..., 0][:, None]           # [B,1,H4,W4]
            s = jnp.clip(nd + intervals, 0.0, 1.0)
            samples = depth_unnormalization(s, idmin_b, idmax_b)

            corr = self.evaluation.iter_sweep(
                ref_iter, packed_src, rel_projs, samples, view_weights)

            if not self.test:
                hidden, normalized_depth, probability, confidence, confidence_logits = (
                    self.update(hidden, normalized_depth, corr, confidence_flag=True))
                depths["combine"].append(
                    depth_unnormalization(normalized_depth, idmin_b, idmax_b))
                depths["probability"].append(probability)
                confidences.append(confidence_logits)
                if it == self.iteration - 1:
                    up = convex_up(normalized_depth, upsample_weights)
                    depth_upsampled = depth_unnormalization(up, idmin_b, idmax_b)
                    confidence_upsampled = upsample_bilinear(confidence, 4)
                normalized_depth = jax.lax.stop_gradient(normalized_depth)
            else:
                if it < self.iteration - 1:
                    hidden, normalized_depth, _, _, _ = self.update(
                        hidden, normalized_depth, corr, confidence_flag=False)
                else:
                    depth = depth_unnormalization(normalized_depth, idmin_b, idmax_b)
                    hidden, normalized_depth, _, confidence, _ = self.update(
                        hidden, normalized_depth, corr, confidence_flag=True)
                    up = convex_up(normalized_depth, upsample_weights)
                    depth_upsampled = depth_unnormalization(up, idmin_b, idmax_b)
                    confidence_upsampled = upsample_bilinear(confidence, 4)

        if self.test:
            return depth, depth_upsampled, confidence, confidence_upsampled
        return depths, [depth_upsampled], confidences, confidence_upsampled


def convex_up(normalized_depth, weights):
    from itermvs_tpu.ops.upsample import convex_upsample
    return convex_upsample(normalized_depth, weights, scale=4)
