"""Training observability (replaces the reference's tensorboard wiring,
`lab4d/engine/trainer.py:66-69,528-545`): scalar logging via tensorboardX
plus the console loss dump sorted by magnitude every 100 steps."""

from __future__ import annotations

import os
from typing import Dict, Optional


class ScalarLogger:
    def __init__(self, logdir: str, console_every: int = 100):
        self.console_every = console_every
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(os.path.join(logdir, "tb"))
        except Exception:
            self.writer = None

    def scalars(self, step: int, values: Dict[str, float], prefix: str = ""):
        if self.writer is None:
            return
        for k, v in values.items():
            try:
                self.writer.add_scalar(f"{prefix}{k}", float(v), step)
            except (TypeError, ValueError):
                pass

    def log_loss_dict(self, step: int, *rest):
        """Matches the trainer log_fn signature: (step, [total,] loss_dict)."""
        loss_dict = rest[-1] if isinstance(rest[-1], dict) else {}
        self.scalars(step, loss_dict, prefix="loss/")
        if step % self.console_every == 0 and loss_dict:
            # console dump sorted by magnitude (`trainer.py:528-545`)
            top = sorted(loss_dict.items(), key=lambda kv: -abs(float(kv[1])))
            msg = " ".join(f"{k}={float(v):.5f}" for k, v in top[:10])
            print(f"step {step}: {msg}")

    def image(self, step: int, tag: str, img):
        if self.writer is None:
            return
        import numpy as np

        arr = np.clip(np.asarray(img, dtype=float), 0, 1)
        if arr.ndim == 3 and arr.shape[-1] in (1, 3):
            arr = arr.transpose(2, 0, 1)
        self.writer.add_image(tag, arr, step)


def dump_opts_json(save_dir: str, opts) -> None:
    """Persist the trainer's exact config dict as `opts.json`.

    CLI runs already get a flag-compatible `opts.log` via
    `config.save_config()` (reference contract, `lab4d/config.py:244-250`);
    programmatic runs (examples, tests) construct trainers from plain dicts
    whose keys need not all be flags, so render/export reconstruct them
    from this JSON instead (`render.py --logdir`).
    """
    import json
    import os

    clean = {}
    for k, v in dict(opts).items():
        try:
            json.dumps(v)
        except TypeError:
            continue
        clean[k] = v
    with open(os.path.join(save_dir, "opts.json"), "w") as f:
        json.dump(clean, f, indent=1, sort_keys=True)
