"""Flow-propagated video segmentation — the Track-Anything slot.

The reference vendors GroundingDINO (text -> box) + SAM (box -> mask on the
first frame) + XMem (mask propagation through the video)
(`preprocess/third_party/Track-Anything/track_anything_cli.py:53-263`).
Zero-egress TPU re-design:

* the SEED mask stays an input contract (external annotation, or the center
  prior as last resort) — exactly like the reference's interactive SAM click;
* PROPAGATION is in-repo: warp the previous mask forward with the learned
  RAFT flow (the shipped in-repo-trained weights), fuse with an online
  fg/bg appearance model — XMem's memory bank re-imagined as two EMA color
  histograms — and clean up with a majority filter. The whole tracker is one
  `lax.scan` over frames: static shapes, scatter-add histograms, no host
  loop.

Selected via `segment_backend="flow"` in `preprocess_video` (default
"external" keeps the r2 behavior: given masks or the static center prior).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vidu4d_tpu.preprocess.ops import warp_by_flow

# per-channel color quantization. 8^3 = 512 bins: coarse enough that a
# few-hundred-pixel object fills its bins (16^3 left the fg histogram so
# sparse that Laplace smoothing flattened the likelihood ratio to ~e^1.9
# while the motion-prior logit saturated at +-3.9 — the appearance term
# could never recover a pixel the prior lost)
_BINS = 8
_EPS = 1e-6


def _bin_ids(rgb: jax.Array) -> jax.Array:
    """(H, W, 3) in [0,1] -> (H, W) int32 histogram bin."""
    q = jnp.clip((rgb * _BINS).astype(jnp.int32), 0, _BINS - 1)
    return (q[..., 0] * _BINS + q[..., 1]) * _BINS + q[..., 2]


def _histogram(bins: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted (H, W) -> (_BINS**3,) scatter-add histogram."""
    flat = jnp.zeros((_BINS ** 3,), jnp.float32)
    return flat.at[bins.reshape(-1)].add(weights.reshape(-1))


def _majority3(mask: jax.Array) -> jax.Array:
    """3x3 box majority vote — the morphological cleanup step."""
    k = jnp.ones((3, 3), mask.dtype) / 9.0
    sm = jax.scipy.signal.convolve2d(mask, k, mode="same")
    return (sm > 0.5).astype(mask.dtype)


def _appearance_logit(bins: jax.Array, hist_fg: jax.Array,
                      hist_bg: jax.Array) -> jax.Array:
    """log p(color|fg) - log p(color|bg) with Laplace smoothing."""
    p_fg = (hist_fg + 1.0) / (jnp.sum(hist_fg) + _BINS ** 3)
    p_bg = (hist_bg + 1.0) / (jnp.sum(hist_bg) + _BINS ** 3)
    return jnp.log(p_fg)[bins] - jnp.log(p_bg)[bins]


@partial(jax.jit, static_argnames=("appearance_wt",))
def propagate_masks(
    frames: jax.Array,      # (T, H, W, 3) in [0, 1]
    seed_mask: jax.Array,   # (H, W) float/bool foreground mask for frame 0
    flows_bw: jax.Array,    # (T-1, H, W, 2) flow from frame t+1 BACK to t
    appearance_wt: float = 1.0,
    ema: float = 0.85,
) -> jax.Array:
    """Track the seed mask through the video. Returns (T, H, W) float32.

    Per frame: backward-warp the previous mask by the t+1->t flow (the
    motion prior), add the appearance log-likelihood ratio from the EMA
    fg/bg color histograms, threshold, majority-clean, then update the
    histograms with the confident pixels (XMem's memory update analog)."""
    seed = (jnp.asarray(seed_mask) > 0.5).astype(jnp.float32)
    bins0 = _bin_ids(frames[0])
    hist_fg0 = _histogram(bins0, seed)
    hist_bg0 = _histogram(bins0, 1.0 - seed)

    blur_k = jnp.ones((5, 5), jnp.float32) / 25.0

    def step(carry, xs):
        mask_prev, hist_fg, hist_bg = carry
        frame, flow_bw = xs
        prior = warp_by_flow(mask_prev[..., None], flow_bw)[..., 0]
        # box-blur the warped mask: a soft prior that tolerates a few px of
        # flow error near boundaries, and clip softly so the appearance
        # likelihood can overrule the prior where colors are decisive
        prior = jax.scipy.signal.convolve2d(prior, blur_k, mode="same")
        prior = jnp.clip(prior, 0.08, 0.92)
        bins = _bin_ids(frame)
        logit = (
            jnp.log(prior) - jnp.log1p(-prior)
            + appearance_wt * _appearance_logit(bins, hist_fg, hist_bg)
        )
        mask = _majority3((logit > 0.0).astype(jnp.float32))

        # memory update from confident pixels only (strong prior agreement)
        conf_fg = mask * (prior > 0.6)
        conf_bg = (1.0 - mask) * (prior < 0.4)
        hist_fg = ema * hist_fg + (1 - ema) * _histogram(bins, conf_fg)
        hist_bg = ema * hist_bg + (1 - ema) * _histogram(bins, conf_bg)
        return (mask, hist_fg, hist_bg), mask

    (_, _, _), masks = jax.lax.scan(
        step, (seed, hist_fg0, hist_bg0), (frames[1:], flows_bw)
    )
    return jnp.concatenate([seed[None], masks], axis=0)


def segment_video(
    frames: np.ndarray,
    seed_mask: Optional[np.ndarray] = None,
    appearance_wt: float = 1.0,
) -> np.ndarray:
    """(T, H, W, 3) frames -> (T, H, W) float32 masks.

    Seed defaults to the center prior (`pipeline.center_box_mask`) — the
    "no annotation at all" path; an external seed (the SAM contract) gives
    much tighter tracks. Flow comes from the shipped RAFT weights when
    present, else pyramidal LK (`flow.compute_flow_pairs`)."""
    from vidu4d_tpu.preprocess.flow import compute_flow_pairs

    frames_j = jnp.asarray(frames, jnp.float32)
    if seed_mask is None:
        from vidu4d_tpu.preprocess.pipeline import center_box_mask

        seed_mask = center_box_mask(frames.shape[1:3])
    _, flow_bw = compute_flow_pairs(frames_j, 1)
    return np.asarray(
        propagate_masks(
            frames_j, jnp.asarray(seed_mask), flow_bw[..., :2],
            appearance_wt=appearance_wt,
        )
    )
