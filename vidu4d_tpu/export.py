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
    with open(path, "w") as f:
        json.dump(motion, f)
    return motion


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
    print(f"exported to {save_dir}")


def main(_):
    export(get_config())


if __name__ == "__main__":
    app.run(main)
