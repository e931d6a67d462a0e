"""Collect round-3 quality-campaign artifacts into examples/results/.

Reads the /tmp/e2e_r3* output dirs written by scripts/quality_campaign.sh
(main run, flow+depth-off ablation, raster-budget sweep, the
rasterizer-independent ray-marched-GT run) plus the depth-registration
eval, and writes examples/results/metrics.json (the main evidence file)
and examples/results/campaign.json (ablation/sweep table). Copies the
render-vs-GT gifs alongside.

    python scripts/collect_campaign.py [--src /tmp/e2e_r3] [--rm /tmp/e2e_r3_raymarch]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def load(path):
    if os.path.exists(path):
        with open(path) as fp:
            return json.load(fp)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/e2e_r3")
    ap.add_argument("--rm", default="/tmp/e2e_r3_raymarch")
    ap.add_argument("--depthreg", default="/tmp/depth_registration.json")
    ap.add_argument("--out", default="examples/results")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    main_m = load(os.path.join(args.src, "metrics.json"))
    if main_m:
        with open(os.path.join(args.out, "metrics.json"), "w") as fp:
            json.dump(main_m, fp, indent=2)
        gif = os.path.join(args.src, "render_vs_gt.gif")
        if os.path.exists(gif):
            shutil.copy(gif, os.path.join(args.out, "render_vs_gt.gif"))

    campaign = {}
    for name in ["s3_nofd", "s3_b256", "s3_b1024", "s3_b4096"]:
        m = load(os.path.join(args.src, f"metrics_{name}.json"))
        if m:
            campaign[name] = {
                "render_psnr_mean": m.get("render_psnr_mean"),
                "render_ssim_mean": m.get("render_ssim_mean"),
                "raster_budget": m["config"].get("raster_budget"),
                "s3_rounds": m["config"].get("s3_rounds"),
            }
    rm = load(os.path.join(args.rm, "metrics.json"))
    if rm:
        campaign["raymarch_gt"] = {
            "render_psnr_mean": rm.get("render_psnr_mean"),
            "render_ssim_mean": rm.get("render_ssim_mean"),
            "gt_source": "raymarch",
        }
        gif = os.path.join(args.rm, "render_vs_gt.gif")
        if os.path.exists(gif):
            shutil.copy(gif, os.path.join(args.out, "render_vs_gt_raymarch.gif"))
    dr = load(args.depthreg)
    if dr:
        campaign["depth_registration"] = dr
    with open(os.path.join(args.out, "campaign.json"), "w") as fp:
        json.dump(campaign, fp, indent=2)
    print(json.dumps(campaign, indent=2))


if __name__ == "__main__":
    main()
