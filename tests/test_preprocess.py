"""Stage-1 preprocessing tests: flow, Procrustes, TSDF, crop, pipeline e2e."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidu4d_tpu.preprocess import ops as pops
from vidu4d_tpu.preprocess.flow import lk_flow, occlusion_from_cycle
from vidu4d_tpu.preprocess.registration import (
    chain_poses,
    two_frame_registration,
    weighted_procrustes,
)
from vidu4d_tpu.preprocess.tsdf import fuse_tsdf, tsdf_to_mesh


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def make_texture(rng, h=64, w=64):
    """Mildly smoothed random texture (LK needs gradients)."""
    tex = rng.uniform(size=(h + 16, w + 16, 3)).astype(np.float32)
    from vidu4d_tpu.preprocess.flow import _blur
    return np.asarray(jax.vmap(_blur, in_axes=-1, out_axes=-1)(jnp.asarray(tex)))


def test_lk_flow_recovers_translation(rng):
    tex = make_texture(rng)
    shift = 3
    img0 = tex[8:72, 8:72]
    img1 = tex[8:72, 8 - shift : 72 - shift]  # content moved +x by `shift`
    flow = np.asarray(lk_flow(jnp.asarray(img0), jnp.asarray(img1), levels=3))
    inner = flow[16:-16, 16:-16]
    assert abs(np.median(inner[..., 0]) - shift) < 0.5, np.median(inner[..., 0])
    assert abs(np.median(inner[..., 1])) < 0.5


def test_occlusion_cycle_consistent(rng):
    flow_fw = jnp.full((32, 32, 2), 1.0)
    flow_bw = -flow_fw
    occ = np.asarray(occlusion_from_cycle(flow_fw, flow_bw))
    assert occ[4:-4, 4:-4].max() == 0.0


def test_weighted_procrustes_exact(rng):
    from scipy.spatial.transform import Rotation as R

    r_gt = R.random(random_state=1).as_matrix().astype(np.float32)
    t_gt = rng.normal(size=3).astype(np.float32)
    pts0 = rng.normal(size=(200, 3)).astype(np.float32)
    pts1 = pts0 @ r_gt.T + t_gt
    r, t = weighted_procrustes(
        jnp.asarray(pts0), jnp.asarray(pts1), jnp.ones(200)
    )
    np.testing.assert_allclose(np.asarray(r), r_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t), t_gt, atol=1e-5)


def test_two_frame_registration_translation(rng):
    # camera translates +x: flow is -x * fx / z, depth constant
    h = w = 32
    fx = 32.0
    depth = np.full((h, w), 2.0, np.float32)
    tx = 0.1
    flow = np.zeros((h, w, 2), np.float32)
    flow[..., 0] = -tx * fx / 2.0
    kinv = np.linalg.inv(np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32))
    rt = np.asarray(
        two_frame_registration(
            jnp.asarray(depth), jnp.asarray(depth), jnp.asarray(flow),
            jnp.asarray(kinv), jnp.asarray(kinv), jnp.ones((h, w)),
        )
    )
    np.testing.assert_allclose(rt[:3, :3], np.eye(3), atol=1e-3)
    np.testing.assert_allclose(rt[:3, 3], [-tx, 0, 0], atol=0.02)


def test_chain_poses():
    a = np.eye(4); a[0, 3] = 1.0
    b = np.eye(4); b[1, 3] = 2.0
    chained = np.asarray(chain_poses(jnp.asarray(np.stack([a, b]), jnp.float32)))
    assert chained.shape == (3, 4, 4)
    np.testing.assert_allclose(chained[0], np.eye(4))
    np.testing.assert_allclose(chained[1], a)
    np.testing.assert_allclose(chained[2], b @ a, atol=1e-6)


def test_crop_params_and_resample(rng):
    mask = np.zeros((64, 64), np.float32)
    mask[20:40, 10:50] = 1.0
    c2r = np.asarray(pops.compute_crop_params(jnp.asarray(mask), crop_size=32))
    assert c2r.shape == (4,)
    # resampled mask should be mostly on
    mc = np.asarray(
        pops.crop_resample(jnp.asarray(mask)[..., None], jnp.asarray(c2r), 32,
                           nearest=True)
    )[..., 0]
    assert mc.mean() > 0.5
    # full-image mode is identity-ish scaling
    c2r_full = np.asarray(
        pops.compute_crop_params(jnp.asarray(mask), crop_size=32, use_full=True)
    )
    np.testing.assert_allclose(c2r_full[2:], [0, 0], atol=1e-5)


def test_tsdf_sphere(rng):
    # render depth of a fronto-parallel plane at z=2 from one camera
    h = w = 32
    fx = 32.0
    kinv = np.linalg.inv(np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32))
    depth = np.full((1, h, w), 2.0, np.float32)
    colors = np.ones((1, h, w, 3), np.float32) * 0.5
    cam2scene = np.eye(4)[None].astype(np.float32)
    vol_bnds = np.array([[-1.5, -1.5, 0.5], [1.5, 1.5, 3.0]], np.float32)
    tsdf, color, weight = fuse_tsdf(
        jnp.asarray(depth), jnp.asarray(colors), jnp.asarray(kinv)[None],
        jnp.asarray(cam2scene), jnp.asarray(vol_bnds), grid_size=48,
    )
    verts, faces = tsdf_to_mesh(np.asarray(tsdf), np.asarray(weight), vol_bnds)
    assert len(verts) > 0
    # the front crossing sits at z=2 (single-view TSDF also closes a thin
    # back shell at z ~ 2 + trunc, so check the front surface fraction)
    frac_front = (np.abs(verts[:, 2] - 2.0) < 0.1).mean()
    assert frac_front > 0.3, frac_front
    assert verts[:, 2].min() > 1.7


@pytest.mark.slow
def test_preprocess_pipeline_e2e(tmp_path, rng):
    from vidu4d_tpu.preprocess.pipeline import preprocess_video, write_config
    from vidu4d_tpu.data import data_utils

    # synthetic video: textured square moving across a textured background
    t, h, w = 10, 48, 64
    bg = make_texture(rng, h, w)[:h, :w]
    frames = np.zeros((t, h, w, 3), np.float32)
    masks = np.zeros((t, h, w), np.float32)
    patch = rng.uniform(0.3, 1.0, size=(16, 16, 3)).astype(np.float32)
    for i in range(t):
        frames[i] = bg
        x = 8 + 2 * i
        frames[i, 16:32, x : x + 16] = patch
        masks[i, 16:32, x : x + 16] = 1.0

    root = os.path.join(str(tmp_path), "database")
    preprocess_video(
        frames, root, "synth-0000", masks=masks, crop_size=32,
        delta_list=(1, 2), tsdf_grid=32,
    )
    write_config(root, "synth", crop_size=32)

    # the trainer's loader can read what we wrote
    opts = {
        "dataroot": root, "seqname": "synth", "data_prefix": "crop",
        "train_res": 32, "pixels_per_image": 8, "delta_list": [2],
    }
    datasets = data_utils.build_datasets(opts)
    assert len(datasets) == 1
    item = datasets[0][0]
    assert item["rgb"].shape == (2, 8, 3)
    info = data_utils.get_data_info(datasets)
    assert info["rtmat"].shape[1] == t
    assert np.isfinite(info["rtmat"]).all()
    # flow points roughly +x for the fg object (camera static, object moves)
    fw1 = np.load(os.path.join(
        root, "processed", "FlowFW_1", "Full-Resolution", "synth-0000",
        "crop-32.npy")).astype(np.float32)
    assert np.isfinite(fw1).all()
    # canonical cameras place the object IN FRONT at a bbox-consistent depth
    # (the reference re-derives translations from the 2D mask bbox,
    # `canonical_registration.py:130-152`; without this a bad Procrustes
    # chain can park the object behind the camera, a dead-render minimum)
    canon = np.load(os.path.join(
        root, "processed", "Cameras", "Full-Resolution", "synth-0000",
        "01-canonical.npy"))
    assert (canon[:, 2, 3] > 0).all()
    assert (canon[:, 2, 3] <= 10.0 + 1e-5).all()


def test_filter_frames_motion_gate(rng):
    """Moving texture keeps frames; a static video is rejected
    (vcnplus/frame_filter.py:84-102 semantics)."""
    from vidu4d_tpu.preprocess.pipeline import filter_frames

    t, res = 14, 64
    tex = rng.uniform(0, 1, size=(res, res, 3)).astype(np.float32)
    moving = np.stack([np.roll(tex, 4 * i, axis=1) for i in range(t)])
    keep = filter_frames(moving, flow_threshold=0.01, min_frames=4,
                         work_res=64)
    assert keep is not None and keep[0] == 0 and len(keep) > 4

    static = np.stack([tex] * t)
    assert filter_frames(static, flow_threshold=0.01, min_frames=4,
                         work_res=64) is None

    # max_frames cap honored
    capped = filter_frames(moving, flow_threshold=0.01, min_frames=4,
                           max_frames=6, work_res=64)
    assert capped is not None and len(capped) == 6


def test_two_frame_registration_np_matches_jax(rng):
    """Host-f64 Kabsch == the JAX path on CPU (the pipeline uses the numpy
    variant because TPU bf16 matmuls flatten small rotations)."""
    from vidu4d_tpu.preprocess.registration import (
        two_frame_registration,
        two_frame_registration_np,
    )

    h = w = 32
    depth0 = 0.5 + 0.05 * rng.random((h, w)).astype(np.float32)
    depth1 = depth0 + 0.01
    flow = rng.normal(0, 0.5, size=(h, w, 2)).astype(np.float32)
    kinv = np.linalg.inv(np.array([[40., 0, 16], [0, 40., 16], [0, 0, 1]],
                                  np.float32))
    mask = (rng.random((h, w)) > 0.3).astype(np.float32)
    rt_j = np.asarray(two_frame_registration(
        jnp.asarray(depth0), jnp.asarray(depth1), jnp.asarray(flow),
        jnp.asarray(kinv), jnp.asarray(kinv), jnp.asarray(mask)))
    rt_n = two_frame_registration_np(depth0, depth1, flow, kinv, kinv, mask,
                                     irls_iters=0, grad_weighting=False)
    np.testing.assert_allclose(rt_n, rt_j, atol=2e-4)


def test_registration_irls_rejects_outliers(rng):
    """The Tukey-IRLS path must recover a known small rigid motion despite
    a contaminated depth lift, where the plain Kabsch fit is pulled far
    off (the silhouette bilinear-blend failure mode)."""
    from vidu4d_tpu.preprocess.registration import two_frame_registration_np

    h = w = 32
    f = 40.0
    kinv = np.linalg.inv(
        np.array([[f, 0, 16], [0, f, 16], [0, 0, 1]], np.float32))
    k = np.linalg.inv(kinv).astype(np.float64)
    ang = 0.08
    rot = np.array([
        [np.cos(ang), 0, np.sin(ang)],
        [0, 1, 0],
        [-np.sin(ang), 0, np.cos(ang)],
    ])
    t_gt = np.array([0.01, -0.005, 0.02])

    gy, gx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    depth0 = (0.6 + 0.04 * np.sin(gx / 5.0) * np.cos(gy / 7.0)).astype(
        np.float32)
    hp0 = np.stack([gx, gy, np.ones_like(gx)], -1).reshape(-1, 3)
    p0 = (hp0 @ kinv.astype(np.float64).T) * depth0.reshape(-1, 1).astype(
        np.float64)
    p1 = p0 @ rot.T + t_gt
    uv1 = p1 @ k.T
    uv1 = uv1[:, :2] / uv1[:, 2:]
    flow = (uv1 - hp0[:, :2]).reshape(h, w, 2).astype(np.float32)

    # frame-1 depth image: interpolate the scattered (u1, z1) targets onto
    # the pixel grid (smooth field, small flow -> faithful), then
    # contaminate 8% of pixels with near-zero depth (the silhouette
    # background-blend failure mode)
    from scipy.interpolate import griddata

    d1_img = griddata(uv1, p1[:, 2], (gx, gy), method="cubic")
    d1_img = np.where(np.isnan(d1_img), p1[:, 2].reshape(h, w), d1_img)
    bad = rng.random((h, w)) < 0.08
    d1_noisy = np.where(bad, 0.05 * d1_img, d1_img).astype(np.float32)

    def run(**kw):
        return two_frame_registration_np(
            depth0, d1_noisy, flow, kinv, kinv,
            np.ones((h, w), np.float32), grad_weighting=False, **kw)

    def rot_err(rt):
        c = (np.trace(rt[:3, :3].T.astype(np.float64) @ rot) - 1.0) / 2.0
        return np.degrees(np.arccos(np.clip(c, -1.0, 1.0)))

    err_plain = rot_err(run(irls_iters=0))
    err_irls = rot_err(run(irls_iters=5))
    assert err_irls < 1.0, (err_plain, err_irls)
    assert err_irls < 0.5 * err_plain, (err_plain, err_irls)
