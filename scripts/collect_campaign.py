"""Collect quality-campaign artifacts into examples/results/.

Reads the /tmp/e2e_r4* output dirs written by scripts/quality_campaign4.sh
(main surfel-GT run, rasterizer-independent ray-marched-GT run, the
adversarial textured/jittered/auto-masked variant, the motion_scale-2.0
flow ablation pair, the budget audit) plus the depth-registration eval,
and writes examples/results/metrics.json (the main evidence file) and
examples/results/campaign.json (variant/ablation table). Copies the
render-vs-GT gifs alongside.

    python scripts/collect_campaign.py [--src /tmp/e2e_r4] [--rm /tmp/e2e_r4_raymarch]
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


KEEP = ("render_psnr_mean", "render_psnr_fg_mean", "render_ssim_mean",
        "render_depth_rmse", "render_mask_iou", "train_mask_iou_vs_gt",
        "total_s")


def summarize(m, **extra):
    row = {k: m[k] for k in KEEP if k in m}
    for k in ("gt_source", "background", "cam_jitter", "mask_source",
              "motion_scale", "flow_wt", "depth_wt", "s3_rounds"):
        if m.get("config", {}).get(k) not in (None, ""):
            row[k] = m["config"][k]
    row.update(extra)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/e2e_r4")
    ap.add_argument("--rm", default="/tmp/e2e_r4_raymarch")
    ap.add_argument("--adv", default="/tmp/e2e_r4_adv")
    ap.add_argument("--fast", default="/tmp/e2e_r4_fast")
    ap.add_argument("--budget", default="/tmp/e2e_r4_budget.json")
    ap.add_argument("--depthreg", default="/tmp/depth_registration.json")
    ap.add_argument("--render512", default="",
                    help="dir of a 512-res render CLI output (rgb.{mp4,gif})")
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

    # Merge into the committed table: a later collect run whose /tmp dirs
    # have been cleaned (session restart) must not drop earlier entries.
    campaign = load(os.path.join(args.out, "campaign.json")) or {}
    if main_m:
        campaign["main_surfel_gt"] = summarize(main_m)
    for key, src, gifname in [
        ("raymarch_gt", args.rm, "render_vs_gt_raymarch.gif"),
        ("adversarial", args.adv, "render_vs_gt_adversarial.gif"),
    ]:
        m = load(os.path.join(src, "metrics.json"))
        if m:
            campaign[key] = summarize(m)
            gif = os.path.join(src, "render_vs_gt.gif")
            if os.path.exists(gif):
                shutil.copy(gif, os.path.join(args.out, gifname))
    # motion_scale-2.0 flow-supervision ablation pair (matched schedules)
    m_on = load(os.path.join(args.fast, "metrics.json"))
    m_off = load(os.path.join(args.fast, "metrics_s3_noflow.json"))
    if m_on:
        campaign["ms2_flow_on"] = summarize(m_on)
    if m_off:
        campaign["ms2_flow_off"] = summarize(m_off)
    bud = load(args.budget)
    if bud:
        campaign["budget_audit"] = bud
    dr = load(args.depthreg)
    if dr:
        campaign["depth_registration"] = dr
    if args.render512:
        for name, ext in (("rendered", "gif"), ("rgb", "mp4"), ("rgb", "gif")):
            vid = os.path.join(args.render512, f"{name}.{ext}")
            if os.path.exists(vid):
                shutil.copy(vid, os.path.join(args.out, f"render512_ref.{ext}"))
                campaign["render512"] = {"source": args.render512,
                                         "artifact": f"render512_ref.{ext}"}
                break
    with open(os.path.join(args.out, "campaign.json"), "w") as fp:
        json.dump(campaign, fp, indent=2)
    print(json.dumps(campaign, indent=2))


if __name__ == "__main__":
    main()
