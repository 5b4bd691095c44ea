#!/usr/bin/env python
"""Convert LPIPS(alex) torch weights to the gs_init_tpu .npz format.

The environment ships no LPIPS weights (zero egress); on a machine with
internet, produce the npz once and drop it in GS_TPU_CHECKPOINT_DIR — eval
then reports `lpips` automatically (engine/runner.py eval gates on
ops.lpips.lpips_available()). Matches the reference's torchmetrics
LPIPS(net_type="alex", normalize=True) (reference runner.py:287-300).

Accepted inputs:
  1. The official LPIPS checkpoint bundle (richzhang/PerceptualSimilarity
     `lpips` pip package): contains both the AlexNet backbone slices and the
     five linear calibration layers.
         python scripts/convert_lpips.py --lpips  # uses `import lpips`
  2. A torch state_dict file with either torchvision alexnet keys
     (features.{0,3,6,8,10}.*) and/or LPIPS lin keys (lin{i}.model.1.weight):
         python scripts/convert_lpips.py path/to/ckpt.pth
     Without lin keys the npz carries no calibration and gs_init_tpu falls
     back to unit weights (relative comparisons stay valid, absolute values
     differ from the official calibration).

Output: lpips_alex.npz with conv{i}_w [k,k,in,out] (HWIO), conv{i}_b [out],
and (when available) lin{i} [ch].

Validation: tests/test_lpips.py::test_npz_golden_calibration locks the full
npz -> lpips() pipeline against golden values, so a converted file is
guaranteed to light up correctly.
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

_TV_IDX = [0, 3, 6, 8, 10]


def from_state_dict(sd) -> dict:
    out = {}
    slice_map = {0: "slice1", 1: "slice2", 2: "slice3", 3: "slice4", 4: "slice5"}
    for i, layer in enumerate(_TV_IDX):
        for key in (
            f"features.{layer}.weight",
            f"net.{slice_map[i]}.{layer}.weight",
            f"net.features.{layer}.weight",
        ):
            if key in sd:
                out[f"conv{i}_w"] = (
                    sd[key].numpy().transpose(2, 3, 1, 0).astype(np.float32)
                )
                out[f"conv{i}_b"] = (
                    sd[key.replace("weight", "bias")].numpy().astype(np.float32)
                )
                break
        else:
            raise KeyError(f"no conv weights for slice {i} in checkpoint")
    n_lin = 0
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                out[f"lin{i}"] = sd[key].numpy()[:, :, 0, 0].reshape(-1)
                n_lin += 1
                break
    if n_lin not in (0, 5):
        raise ValueError(f"found {n_lin}/5 lin layers — corrupt checkpoint?")
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", nargs="?", help="torch state_dict (.pth)")
    ap.add_argument(
        "--lpips", action="store_true",
        help="build from the `lpips` pip package (downloads official weights)",
    )
    ap.add_argument("-o", "--out", default="lpips_alex.npz")
    args = ap.parse_args(argv)

    import torch

    if args.lpips:
        import lpips as lpips_pkg  # pip install lpips

        model = lpips_pkg.LPIPS(net="alex")
        sd = model.state_dict()
        sd = {k: v for k, v in sd.items()}
    elif args.ckpt:
        sd = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    else:
        ap.error("pass a checkpoint path or --lpips")
    out = from_state_dict(sd)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {sorted(out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
