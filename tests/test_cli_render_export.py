"""render / export / reanimate CLI surfaces on a trained toy Stage-3 model.

Exercises the `render.py:279-345` / `export.py:56-168` / `reanimate.py:31-60`
equivalents end to end: train 1 step, checkpoint, then drive the CLI
functions with plain opts dicts (the flagfile layer is just absl parsing).
"""

import json
import os

import numpy as np
import pytest

from tests.helpers import make_fake_db


@pytest.fixture(scope="module")
def trained_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("cli")
    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer

    opts = {
        "dataroot": db, "seqname": "toy", "logroot": str(tmp_path / "logdir"),
        "data_prefix": "crop", "train_res": 16, "logname": "cli",
        "pixels_per_image": -1, "imgs_per_gpu": 1,
        "num_rounds": 1, "iters_per_round": 1, "save_freq": 1,
        "fg_motion": "gs-bob", "gs_capacity": 256, "gs_init_samples": 128,
        "sh_degree": 1, "raster_budget": 64, "raster_tile_chunk": 1,
        "densify_from_iter": 1000, "outlier_filtering_interval": 1000,
    }
    s3 = Stage3Trainer(opts)
    s3.train()
    return opts


@pytest.mark.slow
def test_render_cli_viewpoints(trained_dir):
    from vidu4d_tpu.render import render

    opts = {**trained_dir, "inst_id": 0, "render_res": 16,
            "viewpoint": "rot_0_90", "freeze_id": -1, "num_frames": -1,
            "rot_dist": 2.0, "load_suffix": "latest", "nowarp": False}
    out = render(opts)
    assert out["rendered"].shape[1:] == (16, 16, 3)
    assert np.isfinite(out["rendered"]).all()
    save_dir = os.path.join(trained_dir["logroot"], "toy-cli",
                            "renderings_0000", "rot_0_90")
    assert os.path.isdir(save_dir) and os.listdir(save_dir)

    out_ref = render({**opts, "viewpoint": "ref"})
    assert np.isfinite(out_ref["rendered"]).all()


@pytest.mark.slow
def test_export_and_reanimate_cli(trained_dir):
    from vidu4d_tpu.export import export
    from vidu4d_tpu.reanimate import reanimate

    opts = {**trained_dir, "inst_id": 0, "render_res": 16,
            "viewpoint": "ref", "freeze_id": -1, "num_frames": -1,
            "rot_dist": 2.0, "load_suffix": "latest", "nowarp": False}
    export(opts)
    exp_dir = os.path.join(trained_dir["logroot"], "toy-cli", "export_0000")
    assert os.path.exists(os.path.join(exp_dir, "canonical-surfels.ply"))
    motion_path = os.path.join(exp_dir, "motion.json")
    with open(motion_path) as f:
        motion = json.load(f)
    assert "field2cam" in motion and len(motion["field2cam"]["quat"]) == 8

    # re-drive the model with its own exported motion (`reanimate.py:31-60`)
    reanimate({**opts, "motion_path": motion_path})
    re_dir = os.path.join(trained_dir["logroot"], "toy-cli", "reanimation")
    assert os.path.isdir(re_dir) and os.listdir(re_dir)


@pytest.mark.slow
def test_render_logdir_opts_json(trained_dir):
    """Programmatic runs are renderable via opts.json (`render.py --logdir`):
    the trainer persists its exact config dict, and merging it over the flag
    defaults reconstructs the model without an opts.log flagfile."""
    run_dir = os.path.join(trained_dir["logroot"], "toy-cli")
    with open(os.path.join(run_dir, "opts.json")) as f:
        saved = json.load(f)
    for k, v in trained_dir.items():
        assert saved[k] == v, k

    from vidu4d_tpu.render import render

    # what main() builds: flag defaults (incl. seed=-1) + opts.json merge
    opts = {"seed": -1, "inst_id": 0, "render_res": 16, "viewpoint": "ref",
            "freeze_id": -1, "num_frames": -1, "rot_dist": 2.0,
            "load_suffix": "latest", "nowarp": False}
    opts.update(saved)
    out = render(opts)
    assert np.isfinite(out["rendered"]).all()
