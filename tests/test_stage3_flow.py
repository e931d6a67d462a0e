"""Stage-3 flow + depth supervision (VERDICT r1 item 3).

Checks that `flow_surfels` (`deformable_gaussian.py:817-899` analog) produces
the analytically correct pair flow for a rigid warp, that the rasterizer
composites it faithfully into the 2 extra channels, and that the production
Stage-3 step reports flow/depth losses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vidu4d_tpu.data.frame_info import FrameInfo
from vidu4d_tpu.models.gaussian.deformable import (
    GaussianDeformer,
    render_surfels_batch,
)
from vidu4d_tpu.models.gaussian import surfels as sf
from vidu4d_tpu.ops import geometry as geom
from vidu4d_tpu.ops.quaternion import quaternion_translation_apply
from vidu4d_tpu.ops.rasterize import RasterizeConfig


def _rigid_setup(n_pts=8, res=32, seed=0):
    rng = np.random.default_rng(seed)
    fi = FrameInfo.single_video(4)
    deformer = GaussianDeformer(frame_info=fi, fg_motion="rigid")

    pts = rng.uniform(-0.5, 0.5, size=(n_pts, 3)).astype(np.float32)
    cols = rng.uniform(size=(n_pts, 3)).astype(np.float32)
    surfels = sf.init_from_points(
        jnp.asarray(pts), jnp.asarray(cols), n_pts, sh_degree=0
    )

    # explicit pair cameras: frame 1 shifted sideways vs frame 0
    field2cam = np.array(
        [[1, 0, 0, 0, 0.0, 0.0, 30.0], [1, 0, 0, 0, 2.0, -1.0, 31.0]],
        np.float32,
    )
    x0, y0 = np.meshgrid(range(res), range(res))
    hxy = np.stack([x0, y0, np.ones_like(x0)], -1).reshape(1, -1, 3)
    batch = {
        "frameid": jnp.asarray([0, 1], jnp.int32),
        "frameid_sub": jnp.asarray([0, 1], jnp.int32),
        "dataid": jnp.zeros((2,), jnp.int32),
        "crop2raw": jnp.tile(jnp.asarray([[1.0, 1.0, 0.0, 0.0]]), (2, 1)),
        "hxy": jnp.asarray(np.tile(hxy, (2, 1, 1)), jnp.float32),
        "field2cam": jnp.asarray(field2cam),
    }

    def init_fn(mdl):
        samples = mdl.get_samples(batch)
        xyz = surfels.params.xyz
        rot = sf.get_rotation(surfels.params)
        xyz_cam, rot_cam, _ = mdl.warp_surfels(xyz, rot, samples)
        mdl.flow_surfels(xyz_cam, samples)
        mdl.background()
        return xyz_cam

    params = deformer.init(jax.random.PRNGKey(0), method=init_fn)
    # realistic focal so the cloud lands inside the image
    p = dict(params["params"])
    intr = dict(p["intrinsics"])
    intr["base_logfocal"] = jnp.log(jnp.full((1, 2), 1.5 * res))
    intr["base_ppoint"] = jnp.full((1, 2), res / 2.0)
    p["intrinsics"] = intr
    params = {**params, "params": p}
    return deformer, params, surfels, batch, res


def test_flow_surfels_analytic_rigid():
    """Rigid warp: flow == projection difference under the two cameras."""
    deformer, params, surfels, batch, res = _rigid_setup()

    samples = deformer.apply(params, batch, method=deformer.get_samples)
    xyz = surfels.params.xyz
    rot = sf.get_rotation(surfels.params)
    xyz_cam, rot_cam, _ = deformer.apply(
        params, xyz, rot, samples, method=deformer.warp_surfels
    )
    flow = deformer.apply(
        params, xyz_cam, samples, method=deformer.flow_surfels
    )  # (2, P, 2)

    # analytic: project canonical points under both cameras
    q, t = samples["field2cam"]
    kmat = geom.Kmatinv(samples["Kinv"])
    cam0 = quaternion_translation_apply(q[0][None], t[0][None], xyz)
    cam1 = quaternion_translation_apply(q[1][None], t[1][None], xyz)
    xy0 = geom.pinhole_projection(kmat[0][None], cam0[None])[0, :, :2]
    xy1 = geom.pinhole_projection(kmat[1][None], cam1[None])[0, :, :2]

    np.testing.assert_allclose(
        np.asarray(flow[0]), np.asarray(xy1 - xy0), atol=1e-3, rtol=1e-4
    )
    # frame 1's pair partner is frame 0: flow is the reverse
    np.testing.assert_allclose(
        np.asarray(flow[1]), np.asarray(xy0 - xy1), atol=1e-3, rtol=1e-4
    )


def test_flow_composites_through_extra_channels():
    """Composited flow image ≈ per-surfel flow at each splat's pixel."""
    deformer, params, surfels, batch, res = _rigid_setup(n_pts=4)
    # opaque, well-separated splats
    sp = surfels.params._replace(
        opacity=jnp.full_like(surfels.params.opacity, 12.0),
        scaling=jnp.full_like(surfels.params.scaling, np.log(0.02)),
    )
    surfels = surfels._replace(params=sp)

    samples = deformer.apply(params, batch, method=deformer.get_samples)
    xyz = surfels.params.xyz
    rot = sf.get_rotation(surfels.params)
    xyz_cam, rot_cam, _ = deformer.apply(
        params, xyz, rot, samples, method=deformer.warp_surfels
    )
    flow = deformer.apply(
        params, xyz_cam, samples, method=deformer.flow_surfels
    )
    scale = jnp.max(jnp.abs(flow)) + 1e-6
    intrins = geom.mat2K(geom.Kmatinv(samples["Kinv"]))
    out = render_surfels_batch(
        surfels.params, surfels.alive, xyz_cam, rot_cam, intrins,
        res, res, 0, jnp.zeros((3,)), RasterizeConfig(impl="tiles", budget=64),
        extra_colors=flow / scale,
    )
    flow_img = np.asarray(out.color[..., 3:5]) * float(scale)
    alpha = np.asarray(out.alpha)

    xy = np.asarray(
        geom.pinhole_projection(geom.Kmatinv(samples["Kinv"]), xyz_cam)
    )[..., :2]
    checked = 0
    for m in range(2):
        for p in range(xyz.shape[0]):
            px, py = int(round(xy[m, p, 0] - 0.5)), int(round(xy[m, p, 1] - 0.5))
            if not (2 <= px < res - 2 and 2 <= py < res - 2):
                continue
            a = alpha[m, py, px]
            if a < 0.9:  # occluded or off-splat
                continue
            got = flow_img[m, py, px] / a
            np.testing.assert_allclose(
                got, np.asarray(flow[m, p]), atol=0.15,
                err_msg=f"frame {m} splat {p}",
            )
            checked += 1
    assert checked >= 3  # the setup must actually exercise the path


@pytest.mark.slow
def test_stage3_step_reports_flow_and_depth(tmp_path):
    import os

    from tests.helpers import make_fake_db
    from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer

    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    opts = {
        "dataroot": db, "seqname": "toy", "logname": "flowtest",
        "logroot": os.path.join(str(tmp_path), "logdir"),
        "data_prefix": "crop", "train_res": 16, "pixels_per_image": -1,
        "imgs_per_gpu": 1, "num_rounds": 1, "iters_per_round": 2,
        "fg_motion": "gs-bob", "gs_capacity": 128, "gs_init_samples": 64,
        "sh_degree": 1, "raster_budget": 64, "raster_tile_chunk": 1,
        "densify_from_iter": 100, "outlier_filtering_interval": 1000,
        # wiring test: disable the flow-SNR gate so the tiny fake flows
        # still produce a nonzero loss (the gate is tested separately)
        "flow_noise_px": 0,
    }
    trainer = Stage3Trainer(opts)
    metrics = trainer.train_one_round()
    assert "flow" in metrics and np.isfinite(float(metrics["flow"]))
    assert "depth" in metrics and np.isfinite(float(metrics["depth"]))
    assert float(metrics["flow"]) > 0


def test_stage3_flow_snr_gate(tmp_path):
    """GT flow below the noise floor must contribute ZERO flow loss (the
    gate that keeps sub-noise supervision from degrading training —
    matched-schedule ablation measured 26.3 vs 21.1 dB)."""
    import os

    from tests.helpers import make_fake_db
    from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer

    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    base = {
        "dataroot": db, "seqname": "toy", "logname": "flowgate",
        "logroot": os.path.join(str(tmp_path), "logdir"),
        "data_prefix": "crop", "train_res": 16, "pixels_per_image": -1,
        "imgs_per_gpu": 1, "num_rounds": 1, "iters_per_round": 1,
        "fg_motion": "gs-bob", "gs_capacity": 128, "gs_init_samples": 64,
        "sh_degree": 1, "raster_budget": 64, "raster_tile_chunk": 1,
        "densify_from_iter": 100, "outlier_filtering_interval": 1000,
        # fake-db flows are sub-pixel; a floor far above them gates all
        "flow_noise_px": 1e4,
    }
    trainer = Stage3Trainer(base)
    metrics = trainer.train_one_round()
    assert float(metrics["flow"]) == 0.0
