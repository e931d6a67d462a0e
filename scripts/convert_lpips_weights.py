"""Offline converter: torchvision VGG16 + LPIPS lin weights -> the npz
schema consumed by `vidu4d_tpu.ops.lpips` (VERDICT r3 next-round #10).

This repo's LPIPS graph is exact (`ops/lpips.py` reproduces
`gs/lpipsPyTorch/modules/lpips.py`: VGG16 taps relu{1_2,2_2,3_3,4_3,5_3},
channel-unit-normalize, squared diff, learned 1x1 lin, spatial+layer mean),
but the zero-egress build environment cannot fetch the pretrained weights,
so the in-repo metric runs on pinned random filters (honestly keyed
``lpips_random``). Run THIS script once on any machine with internet access:

    python scripts/convert_lpips_weights.py --out lpips_vgg16.npz

then mount the npz and point the framework at it:

    export VIDU4D_LPIPS_NPZ=/path/to/lpips_vgg16.npz

Every metrics report switches to kind ``vgg16-pretrained`` and the numbers
become comparable to published LPIPS(vgg) (reference:
`gs/lpipsPyTorch/__init__.py:1-21`).

Weight sources, in order:
  * VGG16 conv filters: torchvision ``VGG16_Weights.IMAGENET1K_V1``
    (same as torchvision.models.vgg16(pretrained=True) that the LPIPS
    package loads underneath).
  * lin (1x1 channel weights): the ``lpips`` pip package (net='vgg',
    v0.1 weights), or --lin_pth pointing at a local
    ``lpips/weights/v0.1/vgg.pth`` checkout.

Layout written (matches ops/lpips.py `init_params`):
  conv{i}_{j}_w : (3, 3, cin, cout) float32  — torch (cout,cin,kh,kw)
                  transposed to HWIO; both frameworks use cross-correlation,
                  so no kernel flip.
  conv{i}_{j}_b : (cout,) float32
  lin{k}_w      : (C_k,) float32 nonneg, k = 0..4 over the 5 taps.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

# (torchvision features index, our layer name) for every conv in VGG16
_CONV_IDX = [
    (0, "conv1_1"), (2, "conv1_2"),
    (5, "conv2_1"), (7, "conv2_2"),
    (10, "conv3_1"), (12, "conv3_2"), (14, "conv3_3"),
    (17, "conv4_1"), (19, "conv4_2"), (21, "conv4_3"),
    (24, "conv5_1"), (26, "conv5_2"), (28, "conv5_3"),
]


def convert(out_path: str, lin_pth: str | None) -> None:
    import torch
    import torchvision

    try:
        weights = torchvision.models.VGG16_Weights.IMAGENET1K_V1
        vgg = torchvision.models.vgg16(weights=weights)
    except TypeError:  # older torchvision
        vgg = torchvision.models.vgg16(pretrained=True)
    feats = vgg.features

    out = {}
    for idx, name in _CONV_IDX:
        conv = feats[idx]
        w = conv.weight.detach().cpu().numpy()  # (cout, cin, 3, 3)
        out[f"{name}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        out[f"{name}_b"] = conv.bias.detach().cpu().numpy().astype(np.float32)

    lin_sd = None
    if lin_pth:
        lin_sd = torch.load(lin_pth, map_location="cpu")
    else:
        try:
            import lpips as lpips_pkg

            net = lpips_pkg.LPIPS(net="vgg")
            lin_sd = {
                f"lin{k}.model.1.weight": net.lins[k].model[1].weight.detach()
                for k in range(5)
            }
        except Exception as e:  # noqa: BLE001
            print(f"[warn] lpips package unavailable ({e}); writing VGG "
                  "filters only — ops/lpips.py falls back to uniform lin "
                  "weights (correlates with, but is not numerically equal "
                  "to, official LPIPS)", file=sys.stderr)

    if lin_sd is not None:
        for k in range(5):
            key = f"lin{k}.model.1.weight"
            w = lin_sd[key]
            w = w.detach().cpu().numpy() if hasattr(w, "detach") else np.asarray(w)
            out[f"lin{k}_w"] = np.clip(
                w.reshape(-1).astype(np.float32), 0.0, None
            )  # official code clamps lin weights nonneg at eval

    np.savez(out_path, **out)
    n_lin = sum(1 for k in out if k.startswith("lin"))
    print(f"wrote {out_path}: {len(out)} arrays ({n_lin} lin layers); "
          f"export VIDU4D_LPIPS_NPZ={out_path}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="lpips_vgg16.npz")
    ap.add_argument("--lin_pth", default=None,
                    help="local lpips v0.1 vgg.pth (skips the lpips pip pkg)")
    args = ap.parse_args()
    convert(args.out, args.lin_pth)


if __name__ == "__main__":
    main()
