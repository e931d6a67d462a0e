"""Loss-weight / annealing schedules (host-side, pure python).

Mirrors `lab4d/engine/model.py:112-190` set_progress + `numpy_utils.interp_wt`.
Computed once per step on the host and passed into the jitted loss as plain
scalars (the schedule values change every step, so they must be traced
operands, not compile-time constants)."""

from __future__ import annotations

from typing import Dict

import numpy as np


def interp_wt(x, y, x2, type: str = "linear") -> float:
    """Map scalar x2 from range x=[x0,x1] to y=[y0,y1] (`numpy_utils.py:5-43`)."""
    x0, x1 = x
    y0, y1 = y
    if type == "linear":
        y2 = y0 + (x2 - x0) * (y1 - y0) / (x1 - x0)
    elif type == "log":
        log_y2 = np.log10(y0) + (x2 - x0) * (np.log10(y1) - np.log10(y0)) / (x1 - x0)
        y2 = 10 ** log_y2
    else:
        raise ValueError(type)
    return float(np.clip(y2, min(y0, y1), max(y0, y1)))


def progress_schedule(config: Dict, current_steps: int) -> Dict[str, float]:
    """All step-dependent scalars for one training step
    (`model.py:112-167` set_progress). Returns a dict with:
      alpha: PE annealing (1.0 = fully on), beta_prob: inst-code swap prob,
      and <loss>_wt entries for the annealed weights.
    """
    out = {}
    alpha = interp_wt((0, 4000), (0.6, 1.0), current_steps)
    out["alpha"] = min(alpha, 1.0)
    out["beta_prob"] = interp_wt((0, 2000), (1.0, 0.2), current_steps)

    if config["reg_cam_prior_wt"] > 1:
        cam_fac = interp_wt((0, 4000), (1.0, 0.1), current_steps)
    else:
        cam_fac = interp_wt((0, 800), (1.0, 0.0), current_steps)
    out["reg_cam_prior_wt"] = config["reg_cam_prior_wt"] * cam_fac

    out["reg_eikonal_wt"] = config["reg_eikonal_wt"] * interp_wt(
        (0, 4000), (1.0, 100.0), current_steps, type="log"
    )
    out["reg_skel_prior_wt"] = config["reg_skel_prior_wt"] * interp_wt(
        (0, 4000), (1.0, 0.0), current_steps
    )
    out["reg_gauss_mask_wt"] = config["reg_gauss_mask_wt"] * interp_wt(
        (0, 4000), (1.0, 0.0), current_steps
    )

    # 2DGS regularizers switch on after 8k steps (`model.py:803-823`)
    out["lambda_normal"] = config["lambda_normal"] if current_steps > 8000 else 0.0
    out["lambda_dist"] = config["lambda_dist"] if current_steps > 8000 else 0.0
    return out
