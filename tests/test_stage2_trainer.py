"""Stage-2 trainer smoke test: init -> mlp_init -> one round -> checkpoint."""

import os

import numpy as np
import pytest

import jax

from tests.helpers import make_fake_db


@pytest.mark.slow
def test_stage2_trainer_smoke(tmp_path):
    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    from vidu4d_tpu.engine.trainer import Stage2Trainer

    opts = {
        "dataroot": db,
        "seqname": "toy",
        "logname": "test",
        "logroot": os.path.join(str(tmp_path), "logdir"),
        "data_prefix": "crop",
        "train_res": 16,
        "pixels_per_image": 4,
        "imgs_per_gpu": 2,
        "num_rounds": 2,
        "iters_per_round": 3,
        "save_freq": 1,
        "fg_motion": "bob",
        "field_type": "fg",
        "field_depth": 2,
        "field_width": 32,
        "train_depth_samples": 8,
        "learning_rate": 5e-4,
    }
    trainer = Stage2Trainer(opts)
    trainer.mlp_init(sdf_iters=50, verbose=False)

    # proxy geometry after sdf pretrain should approximate the 0.1-sphere
    assert hasattr(trainer, "_proxy_mesh")
    verts, faces = trainer._proxy_mesh
    r = np.linalg.norm(verts, axis=-1)
    assert 0.04 < r.mean() < 0.2, r.mean()

    losses = []
    trainer.train(log_fn=lambda s, total, d: losses.append(total))
    assert trainer.current_round == 2
    assert trainer.current_steps == 6

    ckpt = os.path.join(trainer.save_dir, "ckpt_latest.pth")
    assert os.path.exists(ckpt)
    geo = os.path.join(trainer.save_dir, "001-fg-geo.obj")
    assert os.path.exists(geo)
    feat = os.path.join(trainer.save_dir, "001-fg-feat.npy")
    assert os.path.exists(feat)
    feats = np.load(feat)
    assert feats.shape[-1] == 16
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0, atol=1e-3)

    # reload round-trips
    payload = trainer.load_checkpoint(ckpt, reset_steps=False)
    assert payload["current_round"] == 2


def test_grad_spike_rollback_logic():
    """check_grad rollback semantics (trainer.py:862-884) without a full
    trainer: cache queue shifts per round; spike restores two-rounds-ago."""
    from types import SimpleNamespace

    from vidu4d_tpu.engine.trainer import Stage2Trainer

    fake = SimpleNamespace(
        opts={"grad_spike_thresh": 5.0},
        _rollback_cache=[None, None],
        params="p0", opt_state="o0",
    )
    up = Stage2Trainer._update_rollback_cache
    mb = Stage2Trainer._maybe_rollback

    # no cache yet -> no rollback even on spike
    assert mb(fake, 100.0) is False
    up(fake)                      # cache = [None, (p0, o0)]
    assert mb(fake, 100.0) is False
    fake.params, fake.opt_state = "p1", "o1"
    up(fake)                      # cache = [(p0,o0), (p1,o1)]
    assert mb(fake, 4.9) is False  # below threshold
    assert fake.params == "p1"
    assert mb(fake, 50.0) is True  # spike -> restore two rounds ago
    assert (fake.params, fake.opt_state) == ("p0", "o0")


@pytest.mark.slow
def test_stage2_iters_per_dispatch_matches(tmp_path):
    """Stage-2 scan chunks == per-step dispatch (r2 device-resident loop)."""
    db = make_fake_db(tmp_path, num_vids=1, T=8, H=16, W=16)
    from vidu4d_tpu.engine.trainer import Stage2Trainer

    def opts(k, name):
        return {
            "dataroot": db, "seqname": "toy", "logname": name,
            "logroot": os.path.join(str(tmp_path), "logdir"),
            "data_prefix": "crop", "train_res": 16, "pixels_per_image": 8,
            "imgs_per_gpu": 4, "num_rounds": 1, "iters_per_round": 4,
            "fg_motion": "bob", "field_depth": 2, "field_width": 32,
            "train_depth_samples": 8, "iters_per_dispatch": k, "seed": 0,
        }

    t1 = Stage2Trainer(opts(1, "c1"))
    t2 = Stage2Trainer(opts(2, "c2"))
    tot1 = t1.train_one_round()
    tot2 = t2.train_one_round()
    assert t1.current_steps == t2.current_steps == 4
    # single-step totals agree to ~1e-6 relative (measured; the scanned and
    # per-step executables differ only by XLA reassociation), but 4 chained
    # optimizer steps amplify that through the nonlinear loss to ~3e-3
    np.testing.assert_allclose(tot1, tot2, rtol=2e-2)
    l1 = jax.tree.leaves(t1.params)
    l2 = jax.tree.leaves(t2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=2e-2)
