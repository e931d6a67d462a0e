"""Flow-propagated segmentation (the Track-Anything slot, VERDICT r2 #6)."""

import numpy as np
import pytest

import jax.numpy as jnp


def _make_scene(t=8, h=64, w=64, r=10, seed=0):
    """Textured disc drifting over a differently-textured background.
    Returns frames (T, H, W, 3) and GT masks (T, H, W)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    bg = 0.25 + 0.15 * np.stack(
        [np.sin(xx / 5 + c) * np.cos(yy / 7 + c) for c in range(3)], -1
    )
    fg_tex = 0.75 + 0.2 * np.stack(
        [np.cos(xx / 3 + c) * np.sin(yy / 4 - c) for c in range(3)], -1
    )
    frames, masks = [], []
    cx, cy = 20.0, 32.0
    for i in range(t):
        m = ((xx - cx) ** 2 + (yy - cy) ** 2 < r * r).astype(np.float32)
        img = bg * (1 - m[..., None]) + fg_tex * m[..., None]
        img = np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1)
        frames.append(img.astype(np.float32))
        masks.append(m)
        cx += 2.5
        cy += 0.5
    return np.stack(frames), np.stack(masks)


def _iou(a, b):
    inter = float(np.sum((a > 0.5) & (b > 0.5)))
    union = float(np.sum((a > 0.5) | (b > 0.5)))
    return inter / max(union, 1.0)


def test_flow_propagation_tracks_moving_object():
    from vidu4d_tpu.preprocess.segment import segment_video

    frames, gt = _make_scene()
    out = segment_video(frames, seed_mask=gt[0])
    assert out.shape == gt.shape
    ious = [_iou(out[i], gt[i]) for i in range(1, len(gt))]
    assert min(ious) > 0.9, f"per-frame IoU dropped: {ious}"


def _make_pan_scene(t=8, h=64, w=64, r=10, pan=(1.5, 0.0), seed=3):
    """Like _make_scene but the BACKGROUND pans uniformly (camera motion):
    the dominant-motion seed must explain the pan away as affine flow and
    keep only the object's differential motion."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    frames, masks = [], []
    cx, cy = 20.0, 32.0
    for i in range(t):
        bx = xx + pan[0] * i
        by = yy + pan[1] * i
        bg = 0.25 + 0.15 * np.stack(
            [np.sin(bx / 5 + c) * np.cos(by / 7 + c) for c in range(3)], -1
        )
        fg_tex = 0.75 + 0.2 * np.stack(
            [np.cos(xx / 3 + c) * np.sin(yy / 4 - c) for c in range(3)], -1
        )
        m = ((xx - cx) ** 2 + (yy - cy) ** 2 < r * r).astype(np.float32)
        img = bg * (1 - m[..., None]) + fg_tex * m[..., None]
        img = np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1)
        frames.append(img.astype(np.float32))
        masks.append(m)
        cx += 2.5
        cy += 0.5
    return np.stack(frames), np.stack(masks)


def test_auto_seed_static_camera():
    """VERDICT r3 #6: segment_backend='auto' — no seed provided, the
    dominant-motion residual seed + flow propagation must reach IoU>0.85."""
    from vidu4d_tpu.preprocess.segment import motion_seed_mask, segment_video

    frames, gt = _make_scene()
    seed = motion_seed_mask(frames)
    assert seed is not None
    assert _iou(seed, gt[0]) > 0.85, f"seed IoU {_iou(seed, gt[0]):.3f}"
    out = segment_video(frames, auto_seed=True)
    ious = [_iou(out[i], gt[i]) for i in range(len(gt))]
    assert min(ious) > 0.85, f"per-frame IoU: {ious}"


def test_auto_seed_under_camera_pan():
    from vidu4d_tpu.preprocess.segment import motion_seed_mask

    frames, gt = _make_pan_scene()
    seed = motion_seed_mask(frames)
    assert seed is not None
    assert _iou(seed, gt[0]) > 0.8, f"pan seed IoU {_iou(seed, gt[0]):.3f}"


def _make_clutter_scene(t=8, h=64, w=64, r=10, pan=(1.2, 0.4), seed=7):
    """Adversarial variant (VERDICT r4 #5): the background is CLUTTER with
    the same contrast/frequency content as the object — a multi-octave
    noise lattice, like synthetic_e2e's ``--background textured`` — and it
    pans (camera motion), so neither appearance contrast nor raw
    differencing separates fg from bg; only camera-compensated motion
    evidence does."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    # multi-octave value noise, amplitude matched to the fg texture
    lat = {s: rng.uniform(0.1, 1.0, size=(s, s, 3)).astype(np.float32)
           for s in (4, 8, 16)}

    def noise_bg(ox, oy):
        img = np.zeros((h, w, 3), np.float32)
        for s, tex in lat.items():
            u = ((xx + ox) / w * (s - 1)) % (s - 1)
            v = ((yy + oy) / h * (s - 1)) % (s - 1)
            u0, v0 = np.floor(u).astype(int), np.floor(v).astype(int)
            fu, fv = (u - u0)[..., None], (v - v0)[..., None]
            img += ((tex[v0, u0] * (1 - fu) + tex[v0, u0 + 1] * fu) * (1 - fv)
                    + (tex[v0 + 1, u0] * (1 - fu) + tex[v0 + 1, u0 + 1] * fu)
                    * fv) / len(lat)
        return img

    fg_tex = 0.45 + 0.35 * np.stack(
        [np.cos(xx / 3 + c) * np.sin(yy / 4 - c) for c in range(3)], -1
    )
    frames, masks = [], []
    cx, cy = 20.0, 32.0
    for i in range(t):
        bg = noise_bg(pan[0] * i, pan[1] * i)
        m = ((xx - cx) ** 2 + (yy - cy) ** 2 < r * r).astype(np.float32)
        img = bg * (1 - m[..., None]) + fg_tex * m[..., None]
        img = np.clip(img + rng.normal(0, 0.01, img.shape), 0, 1)
        frames.append(img.astype(np.float32))
        masks.append(m)
        cx += 2.5
        cy += 0.5
    return np.stack(frames), np.stack(masks)


def test_auto_seed_textured_clutter():
    """The 0.987-IoU claim's hard companion (VERDICT r4 next-round #5):
    clutter background with fg-matched color statistics + camera pan.

    This scene is adversarial on BOTH of the seed's information channels:
    the background's colors match the object's (appearance refinement is
    uninformative) and the object texture is screen-static (motion evidence
    lights only the rim). What the pipeline MUST still deliver — and what
    this test pins hard — is the camera-compensated motion evidence itself:
    the photometric GN refinement (`_refine_affine_flow`) keeps the fg/bg
    evidence ratio >= 4:1 where the flow-only affine fit managed 1.5:1, and
    the seed must exist and overlap the object. Full-precision seeds under
    fg-matched clutter are a documented limitation (README known gaps)."""
    import scipy.ndimage as ndi

    from vidu4d_tpu.preprocess import segment as seg

    frames, gt = _make_clutter_scene()
    m = gt[0] > 0.5

    # (a) evidence separability with the refined affine compensation
    fj = jnp.asarray(frames, jnp.float32)
    from vidu4d_tpu.preprocess.flow import compute_flow_pairs

    ratios = []
    for d in (2, 4):
        pair = jnp.stack([fj[0], fj[d]])
        fw, _ = compute_flow_pairs(pair, 1)
        f0, fd = frames[0], frames[d]
        _, pred = seg._fit_affine_flow(np.asarray(fw[0, ..., :2]))
        fr = seg._refine_affine_flow(f0.mean(-1), fd.mean(-1), pred)
        a2 = seg._np_warp(fd, 0.5 * fr)
        b2 = seg._np_warp(f0, -0.5 * fr)
        ev = ndi.uniform_filter(np.abs(a2 - b2).mean(-1), size=3)
        ratios.append(float(ev[m].mean() / (ev[~m].mean() + 1e-9)))
    # flow-only affine compensation measured 1.5:1 here; the GN refinement
    # must hold a clear margin (per-delta noise leaves d=4 weakest)
    assert min(ratios) > 2.0 and float(np.mean(ratios)) > 4.0, (
        f"evidence fg/bg ratios under clutter: {ratios}")

    # (b) the seed must exist and overlap the object (the appearance stage
    # cannot be precise here — fg colors are a subset of the clutter's)
    seed = seg.motion_seed_mask(frames)
    assert seed is not None, "seed declined on a clearly moving object"
    iou0 = _iou(seed, gt[0])
    assert iou0 > 0.3, f"clutter seed IoU {iou0:.3f}"
    # recall matters more than precision for a seed the tracker refines:
    # most of the object must be inside it
    recall = float((seed[m] > 0.5).mean())
    assert recall > 0.8, f"clutter seed recall {recall:.3f}"


def test_auto_seed_degenerate_returns_none():
    """A static video has no motion evidence — the seed must decline (the
    pipeline then falls back to the center prior) instead of hallucinating."""
    from vidu4d_tpu.preprocess.segment import motion_seed_mask

    frames, _ = _make_scene()
    static = np.repeat(frames[:1], 6, axis=0)
    assert motion_seed_mask(static) is None


def test_flow_backend_through_pipeline(tmp_path):
    """segment_backend='flow' in preprocess_video: seed-only masks in, full
    tracked masks written to the Annotations contract."""
    import glob
    import os

    from vidu4d_tpu.preprocess.pipeline import preprocess_video

    frames, gt = _make_scene(t=4, h=48, w=48)
    seed_only = np.zeros_like(gt)
    seed_only[0] = gt[0]  # only the first frame annotated (the SAM contract)
    out_root = str(tmp_path)
    preprocess_video(
        frames, out_root, "seg-0000", masks=seed_only, crop_size=32,
        segment_backend="flow",
    )
    ann = glob.glob(
        os.path.join(out_root, "processed", "Annotations", "**", "crop-32.npy"),
        recursive=True,
    )
    assert ann, "no Annotations written"
    # the cropped mask of the LAST frame must still cover the moved disc
    a = np.load(ann[0]).astype(np.float32)  # (T, crop, crop, 2) mask+vis2d
    assert a.shape[0] == 4
    assert a[-1, ..., 0].max() > 0.5
