"""Stage-3 (dynamic Gaussian surfels) trainer smoke test."""

import os

import numpy as np
import pytest

from tests.helpers import make_fake_db


@pytest.mark.slow
def test_stage3_trainer_smoke(tmp_path):
    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer

    opts = {
        "dataroot": db,
        "seqname": "toy",
        "logname": "test3",
        "logroot": os.path.join(str(tmp_path), "logdir"),
        "data_prefix": "crop",
        "train_res": 16,
        "pixels_per_image": -1,
        "imgs_per_gpu": 1,
        "num_rounds": 1,
        "iters_per_round": 4,
        "save_freq": 1,
        "fg_motion": "gs-bob",
        "gs_capacity": 256,
        "gs_init_samples": 128,
        "sh_degree": 1,
        "raster_budget": 96,
        "raster_tile_chunk": 1,
        "densify_from_iter": 1,
        "densification_interval": 2,
        "opacity_reset_interval": 1000,
        "outlier_filtering_interval": 1000,
    }
    trainer = Stage3Trainer(opts)
    hist = []
    trainer.train(log_fn=lambda s, m: hist.append(m))
    assert trainer.current_steps == 4
    m = trainer
    assert int(m.surfels.num_alive()) > 0

    # checkpoint artifacts
    assert os.path.exists(os.path.join(trainer.save_dir, "ckpt_latest.pth"))
    ply = os.path.join(trainer.save_dir, "point_cloud_0001.ply")
    assert os.path.exists(ply)

    # stats accumulated at some point (densify resets them, so check adam count)
    assert int(trainer.gs_adam.count) == 4

    # reload
    trainer.load_checkpoint(
        os.path.join(trainer.save_dir, "ckpt_latest.pth"), reset_steps=False
    )
    assert trainer.current_steps == 4


def test_cadence_due_window():
    """Hook cadence under iters_per_dispatch chunking (ADVICE r2): a hook
    fires iff a multiple of its interval falls in (it - span, it], even when
    short final chunks shift current_steps off the k-grid."""
    from vidu4d_tpu.engine.gs4d_trainer import cadence_due

    # per-step (span=1): fires exactly on multiples
    assert cadence_due(100, 1, 100) == 100
    assert cadence_due(101, 1, 100) is None
    assert cadence_due(0, 1, 100) is None  # step 0 never fires
    # chunked: 150-interval hook with k=75 lands mid-window
    assert cadence_due(150, 75, 150) == 150
    assert cadence_due(225, 75, 150) is None  # fired in the prior (75,150] chunk
    assert cadence_due(300, 75, 150) == 300
    # off-grid drift from a short final chunk: steps 0->70->140->210 with
    # interval 100 must still fire 100 (win (70,140]) and 200 (win (140,210])
    assert cadence_due(140, 70, 100) == 100
    assert cadence_due(210, 70, 100) == 200
    # 2000-interval outlier filter with k=75: fires in the (1950, 2025] chunk
    assert cadence_due(2025, 75, 2000) == 2000


@pytest.mark.slow
def test_iters_per_dispatch_chunk_matches_per_step(tmp_path):
    """k-iteration lax.scan chunks == per-step dispatch (r2: the device-
    resident loop that amortizes remote-dispatch overhead)."""
    import jax
    import jax.numpy as jnp

    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    from vidu4d_tpu.engine.gs4d_trainer import Stage3Trainer

    def opts(k, name):
        return {
            "dataroot": db, "seqname": "toy", "logname": name,
            "logroot": os.path.join(str(tmp_path), "logdir"),
            "data_prefix": "crop", "train_res": 16, "pixels_per_image": -1,
            "imgs_per_gpu": 1, "num_rounds": 1, "iters_per_round": 4,
            "fg_motion": "gs-bob", "gs_capacity": 128, "gs_init_samples": 64,
            "sh_degree": 1, "raster_budget": 64, "raster_tile_chunk": 1,
            "densify_from_iter": 100, "outlier_filtering_interval": 1000,
            "densification_interval": 2, "iters_per_dispatch": k, "seed": 0,
        }

    t1 = Stage3Trainer(opts(1, "chunk1"))
    t2 = Stage3Trainer(opts(2, "chunk2"))
    m1 = t1.train_one_round()
    m2 = t2.train_one_round()
    assert t1.current_steps == t2.current_steps == 4
    # scanned vs per-step executables agree to ~1e-6/step (measured on the
    # Stage-2 twin of this test); 4 chained optimizer steps + densify
    # amplify reassociation noise to the 1e-2 band
    np.testing.assert_allclose(
        float(m1["total"]), float(m2["total"]), rtol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(t1.surfels.params.xyz), np.asarray(t2.surfels.params.xyz),
        atol=1e-3, rtol=3e-2,
    )
