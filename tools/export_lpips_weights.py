"""Export LPIPS-VGG weights to the npz format `utils/metrics.get_lpips` loads.

Run this in any ONLINE environment that has the `lpips` package installed
(the reference's dependency, requirements.txt:14), then copy the npz to the
offline machine and point $VF_NERF_LPIPS_WEIGHTS at it:

    python tools/export_lpips_weights.py --out lpips_vgg.npz

Format: conv{0..12}_w (OIHW float32), conv{0..12}_b, lin{0..4} (per-channel
non-negative calibration weights at taps relu1_2/relu2_2/relu3_3/relu4_3/
relu5_3) — exactly the tensors `metrics._lpips_forward` consumes.
"""

from __future__ import annotations

import argparse


def export(out_path: str) -> None:
    import lpips  # type: ignore
    import numpy as np
    import torch

    model = lpips.LPIPS(net="vgg")
    arrays = {}
    convs = [m for m in model.net.slice1 if isinstance(m, torch.nn.Conv2d)]
    for slc in (model.net.slice2, model.net.slice3,
                model.net.slice4, model.net.slice5):
        convs += [m for m in slc if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 13, f"expected 13 VGG16 convs, got {len(convs)}"
    for i, conv in enumerate(convs):
        arrays[f"conv{i}_w"] = conv.weight.detach().numpy().astype(np.float32)
        arrays[f"conv{i}_b"] = conv.bias.detach().numpy().astype(np.float32)
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        arrays[f"lin{i}"] = w.reshape(-1).astype(np.float32)
    np.savez(out_path, **arrays)
    print(f"wrote {out_path}: {len(arrays)} arrays")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="lpips_vgg.npz")
    export(parser.parse_args().out)
