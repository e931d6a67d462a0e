"""Reanimation CLI (mirrors `lab4d/reanimate.py`): re-drive a trained model
with motion exported from another run/video.

Usage:
    python -m vidu4d_tpu.export --flagfile=<motion run>/opts.log --load_suffix latest
    python -m vidu4d_tpu.reanimate --flagfile=<model run>/opts.log \
        --load_suffix latest --motion_path <motion run>/export_0000/motion.json
"""

from __future__ import annotations

import json
import os

import numpy as np
from absl import app, flags

from vidu4d_tpu.config import get_config

flags.DEFINE_string("motion_path", "", "path to exported motion.json")


def reanimate(opts):
    import jax.numpy as jnp

    from vidu4d_tpu.render import build_trainer, construct_batch_from_opts
    from vidu4d_tpu.utils.io import save_rendered

    trainer = build_trainer(opts)
    with open(opts["motion_path"]) as f:
        motion = json.load(f)

    quat = np.asarray(motion["field2cam"]["quat"], np.float32)
    trans = np.asarray(motion["field2cam"]["trans"], np.float32)
    n = len(quat)

    opts = dict(opts)
    opts["freeze_id"] = 0
    opts["num_frames"] = n
    batch = construct_batch_from_opts(opts, trainer)
    # overrides (`reanimate.py:31-60`): driven camera + articulation
    batch["field2cam"] = jnp.asarray(np.concatenate([quat, trans], -1))
    if "t_articulation" in motion:
        qr = np.asarray(motion["t_articulation"]["qr"], np.float32)
        qd = np.asarray(motion["t_articulation"]["qd"], np.float32)
        batch["t_articulation"] = jnp.asarray(np.stack([qr, qd], axis=-2))

    rendered = trainer.render_batch(batch, res=opts["render_res"])
    save_dir = os.path.join(trainer.save_dir, "reanimation")
    save_rendered(rendered, save_dir)
    print(f"saved reanimation to {save_dir}")


def main(_):
    reanimate(get_config())


if __name__ == "__main__":
    app.run(main)
