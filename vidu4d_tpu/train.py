"""Training entry point (mirrors `lab4d/train.py`).

Usage (same recipes as the reference, README.md:36-45):
    # Stage 2: neural SDF + skinning warp
    python -m vidu4d_tpu.train --seqname cheetah --logname s2 --fg_motion bob \
        --num_rounds 21 --rgb_timefree --rgb_dirfree
    # Stage 3: dynamic Gaussian surfels
    python -m vidu4d_tpu.train --seqname cheetah --logname s3 --fg_motion gs-bob \
        --num_rounds 61 --imgs_per_gpu 1 --pixels_per_image -1 \
        --load_path logdir/cheetah-s2/ckpt_latest.pth \
        --gs_init_mesh logdir/cheetah-s2/020-fg-geo.obj

Instead of the reference's one-process-per-GPU DDP bootstrap
(`train.py:20-42`), a single program drives all local devices through the
jit/mesh machinery in `vidu4d_tpu.parallel`.
"""

from __future__ import annotations

import os

from absl import app

from vidu4d_tpu.config import get_config, save_config


def main(_):
    opts = get_config()
    save_config()

    if "gs" in opts["fg_motion"]:
        from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer

        trainer = Stage3Trainer(opts)
        if opts.get("load_path"):
            trainer.load_stage2(opts["load_path"])
        if opts.get("load_suffix"):
            ckpt = os.path.join(trainer.save_dir, f"ckpt_{opts['load_suffix']}.pth")
            trainer.load_checkpoint(ckpt, reset_steps=opts["reset_steps"])
    else:
        from vidu4d_tpu.engine.trainer import Stage2Trainer

        trainer = Stage2Trainer(opts)
        if opts.get("load_suffix"):
            ckpt = os.path.join(trainer.save_dir, f"ckpt_{opts['load_suffix']}.pth")
            trainer.load_checkpoint(ckpt, reset_steps=opts["reset_steps"])
        else:
            trainer.mlp_init()

    def log_fn(step, *rest):
        if isinstance(rest[-1], dict):
            top = sorted(rest[-1].items(), key=lambda kv: -abs(float(kv[1])))[:8]
            msg = " ".join(f"{k}={float(v):.4f}" for k, v in top)
        else:
            msg = str(rest)
        print(f"step {step}: {msg}")

    trainer.train(log_fn=log_fn)


if __name__ == "__main__":
    app.run(main)
