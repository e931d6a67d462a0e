"""Export canonical geometry + per-frame motion parameters
(mirrors `lab4d/export.py`): canonical mesh/surfels to obj/ply and
{field2cam quaternion+translation, t_articulation dual quaternions} to JSON
for reanimation.

Usage:
    python -m vidu4d_tpu.export --flagfile=logdir/<seq>-<log>/opts.log \
        --load_suffix latest --inst_id 0
"""

from __future__ import annotations

import json
import os

import numpy as np
from absl import app, flags

from vidu4d_tpu.config import define_flag_once, get_config

define_flag_once("integer", "inst_id", 0, "video/instance id")
define_flag_once("integer", "grid_size", 128, "marching cubes grid size")
define_flag_once("bool", "export_mesh_seq", True,
                 "export per-frame warped geometry OBJ sequence")
define_flag_once("integer", "export_mesh_stride", 1,
                 "frame stride for the mesh sequence")


def export_motion_params(trainer, frameid, path):
    """Per-frame motion params (`export.py:137-168` save_motion_params)."""
    import jax.numpy as jnp

    if hasattr(trainer, "deformer"):
        mdl_params, module = trainer.params, trainer.deformer
    else:
        mdl_params, module = trainer.params, trainer.model

    def run(mdl):
        if hasattr(mdl, "camera_mlp"):
            cam = mdl.camera_mlp
            warp = mdl.warp
            logscale = mdl.logscale
        else:
            field = mdl.fields[list(mdl.fields)[0]]
            cam = field.camera_mlp
            warp = field.warp
            logscale = field.logscale
        q, t = cam(jnp.asarray(frameid))
        out = {"field2cam": (q, t / jnp.exp(logscale))}
        if hasattr(warp, "articulation"):
            t_art, _ = warp.articulation.vals_and_mean(jnp.asarray(frameid))
            out["t_articulation"] = t_art
            if hasattr(warp.articulation, "so3_at"):
                # per-frame joint so(3) vectors for skeleton reanimation
                # (`export.py:161-164` saves motion_expl.so3)
                out["joint_so3"] = warp.articulation.so3_at(jnp.asarray(frameid))
        return out

    vals = module.apply(mdl_params, method=run)
    motion = {
        "field2cam": {
            "quat": np.asarray(vals["field2cam"][0]).tolist(),
            "trans": np.asarray(vals["field2cam"][1]).tolist(),
        }
    }
    if "t_articulation" in vals:
        motion["t_articulation"] = {
            "qr": np.asarray(vals["t_articulation"][0]).tolist(),
            "qd": np.asarray(vals["t_articulation"][1]).tolist(),
        }
    if "joint_so3" in vals:
        motion["joint_so3"] = np.asarray(vals["joint_so3"]).tolist()
    with open(path, "w") as f:
        json.dump(motion, f)
    return motion


def export_mesh_sequence(trainer, frameid, save_dir, stride=1):
    """Per-frame OBJ sequence of the warped geometry in field space
    (`export.py:142-146` saves `{cate}-%05d.obj` per frame)."""
    import jax
    import jax.numpy as jnp

    from vidu4d_tpu.ops.marching import save_obj
    from vidu4d_tpu.ops.quaternion import quaternion_translation_apply

    if hasattr(trainer, "surfels"):  # stage 3: warped surfel cloud
        module, mdl_params = trainer.deformer, trainer.params
        xyz = trainer.surfels.params.xyz
        alive = np.asarray(trainer.surfels.alive)
        faces = None
    else:  # stage 2: warped proxy mesh
        if not hasattr(trainer, "_proxy_mesh"):
            trainer.update_geometry_aux()
        verts, faces = trainer._proxy_mesh
        xyz = jnp.asarray(verts)
        alive = None
        module, mdl_params = trainer.model, trainer.params

    @jax.jit
    def warp_at(params, fid):
        def run(mdl):
            field = (
                mdl if hasattr(mdl, "warp") else mdl.fields[list(mdl.fields)[0]]
            )
            (q_w, t_w), _ = field.warp(
                xyz[None, :, None], fid[None], jnp.zeros((1,), jnp.int32),
                return_qt=True,
            )
            return quaternion_translation_apply(
                q_w[0, :, 0], t_w[0, :, 0], xyz
            )
        return module.apply(params, method=run)

    for fid in frameid[::stride]:
        warped = np.asarray(warp_at(mdl_params, jnp.asarray(fid)))
        if alive is not None:
            warped = warped[alive]
        save_obj(
            os.path.join(save_dir, "fg-%05d.obj" % int(fid)), warped,
            faces if faces is not None else np.zeros((0, 3), np.int32),
        )


def export(opts):
    from vidu4d_tpu.render import build_trainer

    trainer = build_trainer(opts)
    offsets = np.asarray(trainer.frame_info.frame_offset_raw)
    vid = opts["inst_id"]
    frameid = np.arange(offsets[vid], offsets[vid + 1])

    save_dir = os.path.join(trainer.save_dir, "export_%04d" % vid)
    os.makedirs(save_dir, exist_ok=True)

    # canonical geometry
    if hasattr(trainer, "surfels"):
        from vidu4d_tpu.models.gaussian.ply_io import save_ply
        import jax

        save_ply(
            os.path.join(save_dir, "canonical-surfels.ply"),
            jax.tree.map(np.asarray, trainer.surfels.params),
            np.asarray(trainer.surfels.alive),
        )
    else:
        trainer.update_geometry_aux(beta=0.0, grid_size=opts.get("grid_size", 128))
        trainer.export_proxy_mesh(os.path.join(save_dir, "canonical-mesh.obj"))

    export_motion_params(
        trainer, frameid, os.path.join(save_dir, "motion.json")
    )
    if opts.get("export_mesh_seq", True):
        export_mesh_sequence(
            trainer, frameid, save_dir,
            stride=opts.get("export_mesh_stride", 1),
        )
    print(f"exported to {save_dir}")


def main(_):
    export(get_config())


if __name__ == "__main__":
    app.run(main)
