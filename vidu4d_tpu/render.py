"""Novel-view / reference-view rendering CLI (mirrors `lab4d/render.py`).

Usage:
    python -m vidu4d_tpu.render --flagfile=logdir/<seq>-<log>/opts.log \
        --load_suffix latest --render_res 512 --viewpoint rot_0_360

Viewpoints (`render.py:115-266`): "ref" (training cameras), "rot_e_d"
(rotate d degrees around the object at elevation e), "bev_e" (bird's eye).
"""

from __future__ import annotations

import os

import numpy as np
from absl import app, flags

from vidu4d_tpu.config import define_flag_once, get_config

define_flag_once("integer", "inst_id", 0, "video/instance id")
define_flag_once("integer", "motion_id", 1, "video/instance id (for reanimation)")
define_flag_once("integer", "render_res", 128, "rendering resolution")
define_flag_once("string", "viewpoint", "ref", "camera viewpoint (ref, rot_e_d, bev_e)")
define_flag_once("integer", "freeze_id", -1, "freeze frame id to render, -1 disables")
define_flag_once("integer", "num_frames", -1, "frames to render when freeze_id used")
define_flag_once("float", "rot_dist", 2.0, "distance multiplier for rotating cameras")
define_flag_once("bool", "nowarp", False, "render without warping")
define_flag_once("string", "logdir", "",
                 "run directory containing opts.json (alternative to "
                 "--flagfile for programmatic runs)")


def build_trainer(opts):
    if "gs" in opts["fg_motion"]:
        from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer

        trainer = Stage3Trainer(opts)
    else:
        from vidu4d_tpu.engine.trainer import Stage2Trainer

        trainer = Stage2Trainer(opts)
    suffix = opts.get("load_suffix") or "latest"
    ckpt = os.path.join(trainer.save_dir, f"ckpt_{suffix}.pth")
    trainer.load_checkpoint(ckpt, reset_steps=False)
    return trainer


def get_field_cameras(trainer, frameid):
    """World-unit cameras at given raw frame ids (`multifields.py:505-516`)."""
    import jax
    import jax.numpy as jnp

    from vidu4d_tpu.ops.quaternion import quaternion_translation_to_se3

    if hasattr(trainer, "deformer"):  # stage 3
        deformer = trainer.deformer

        def run(mdl):
            q, t = mdl.camera_mlp(jnp.asarray(frameid))
            return q, t / jnp.exp(mdl.logscale)

        q, t = trainer.deformer.apply(trainer.params, method=run)
    else:
        model = trainer.model
        cate = list(trainer.states)[0]

        def run(mdl):
            field = mdl.fields[cate]
            q, t = field.camera_vals(jnp.asarray(frameid))
            return q, t / jnp.exp(field.logscale)

        q, t = trainer.model.apply(trainer.params, method=run)
    return np.asarray(quaternion_translation_to_se3(q, t))


def get_intrinsics(trainer, frameid):
    import jax.numpy as jnp

    if hasattr(trainer, "deformer"):
        def run(mdl):
            return mdl.intrinsics(jnp.asarray(frameid))
        out = trainer.deformer.apply(trainer.params, method=run)
    else:
        def run(mdl):
            return mdl.intrinsics(jnp.asarray(frameid))
        out = trainer.model.apply(trainer.params, method=run)
    return np.asarray(out)


def object_size(trainer):
    if hasattr(trainer, "surfels"):
        xyz = np.asarray(trainer.surfels.params.xyz)
        alive = np.asarray(trainer.surfels.alive)
        xyz = xyz[alive]
        return float((xyz.max(0) - xyz.min(0)).max()) if len(xyz) else 1.0
    aabb = np.asarray(trainer.states[list(trainer.states)[0]].aabb)
    return float((aabb[1] - aabb[0]).max())


def construct_batch_from_opts(opts, trainer):
    """(`render.py:58-266`)."""
    from vidu4d_tpu.utils.camera_trajectories import (
        construct_batch,
        get_bev_cam,
        get_object_to_camera_matrix,
        get_rotating_cam,
    )

    data_info = trainer.data_info
    video_id = opts["inst_id"]
    raw_size = data_info["raw_size"][video_id]
    offsets = np.asarray(trainer.frame_info.frame_offset_raw)
    vid_length = offsets[video_id + 1] - offsets[video_id]

    if opts["freeze_id"] == -1:
        frameid_sub = np.arange(vid_length - 1)
    else:
        n = opts["num_frames"] if opts["num_frames"] > 0 else vid_length
        frameid_sub = np.full((n,), opts["freeze_id"])
    frameid = frameid_sub + offsets[video_id]

    intrinsics_fr = get_intrinsics(trainer, frameid)
    res = opts["render_res"]

    viewpoint = opts["viewpoint"]
    if viewpoint == "ref":
        field2cam = None
        scale = np.array([raw_size[1] / res, raw_size[0] / res])
        camera_int = np.stack(
            [
                intrinsics_fr[:, 0] / scale[0],
                intrinsics_fr[:, 1] / scale[1],
                intrinsics_fr[:, 2] / scale[0],
                intrinsics_fr[:, 3] / scale[1],
            ],
            axis=-1,
        )
    elif viewpoint.startswith("rot"):
        elev, max_angle = [int(v) for v in viewpoint.split("_")[1:]]
        size = object_size(trainer)
        cam_traj = get_rotating_cam(
            len(frameid_sub), distance=size * opts["rot_dist"], max_angle=max_angle
        )
        cam_traj = cam_traj @ get_object_to_camera_matrix(elev, [1, 0, 0], 0)[None]
        field2cam = cam_traj
        focal = max(res, res)
        camera_int = np.tile([focal, focal, res / 2, res / 2], (len(frameid_sub), 1))
    elif viewpoint.startswith("bev"):
        elev = int(viewpoint.split("_")[1])
        field2cam_fr = get_field_cameras(trainer, frameid)
        field2cam = get_bev_cam(field2cam_fr, elev=elev)
        focal = max(res, res)
        camera_int = np.tile([focal, focal, res / 2, res / 2], (len(frameid_sub), 1))
    elif viewpoint.startswith("refrot"):
        # sweep the TRAINING camera trajectory across the clip while the
        # motion plays at its own time — decouples camera time from motion
        # time (`lab4d/render.py:185-218`; its elev/max_angle args are
        # parsed but unused there too)
        index_sub = np.linspace(
            0, vid_length - 1, len(frameid_sub), dtype=int
        )
        field2cam = get_field_cameras(trainer, index_sub + offsets[video_id])
        scale = np.array([raw_size[1] / res, raw_size[0] / res])
        camera_int = np.stack(
            [intrinsics_fr[:, 0] / scale[0], intrinsics_fr[:, 1] / scale[1],
             intrinsics_fr[:, 2] / scale[0], intrinsics_fr[:, 3] / scale[1]],
            axis=-1,
        )
    elif viewpoint.startswith("novel"):
        # one FIXED training camera (picked by max_angle as a fraction of
        # the clip), zoomed out 1.2x, held for the whole motion
        # (`lab4d/render.py:220-254`)
        _, max_angle = [int(v) for v in viewpoint.split("_")[1:]]
        pick = int(round((vid_length - 1) * (max_angle % 360) / 360.0))
        cam = get_field_cameras(
            trainer, np.array([pick + offsets[video_id]])
        )[0]
        cam = cam.copy()
        cam[:3, 3] *= 1.2
        field2cam = np.tile(cam[None], (len(frameid_sub), 1, 1))
        scale = np.array([raw_size[1] / res, raw_size[0] / res])
        camera_int = np.stack(
            [intrinsics_fr[:, 0] / scale[0], intrinsics_fr[:, 1] / scale[1],
             intrinsics_fr[:, 2] / scale[0], intrinsics_fr[:, 3] / scale[1]],
            axis=-1,
        )
    else:
        raise ValueError(f"unknown viewpoint {viewpoint!r}")

    batch = construct_batch(
        inst_id=video_id,
        frameid_sub=frameid_sub,
        eval_res=res,
        field2cam=field2cam,
        camera_int=camera_int,
        crop2raw=None,
    )
    return batch


def render(opts):
    trainer = build_trainer(opts)
    batch = construct_batch_from_opts(opts, trainer)
    rendered = trainer.render_batch(
        batch, res=opts["render_res"], no_warp=opts.get("nowarp", False)
    )
    save_dir = os.path.join(
        trainer.save_dir,
        "renderings_%04d" % opts["inst_id"],
        opts["viewpoint"],
    )
    from vidu4d_tpu.utils.io import save_rendered

    save_rendered(rendered, save_dir)
    print(f"saved renderings to {save_dir}")
    return rendered


def main(_):
    opts = get_config()
    # programmatic runs (examples/, tests) have no opts.log flagfile; their
    # trainers persist the exact config dict as opts.json — point --logdir
    # at the run directory to render them
    if opts.get("logdir"):
        import json

        with open(os.path.join(opts["logdir"], "opts.json")) as f:
            opts.update(json.load(f))
    render(opts)


if __name__ == "__main__":
    app.run(main)
