"""Export torchvision ImageNet weights for `pretrained: True` backbones.

Run OFFLINE on a machine with torchvision + internet access (the TPU host is
zero-egress), then copy the exports to ``checkpoint/imagenet/`` (or point
``model.backbone.rgb.weights_path`` at them):

    python tools/export_torchvision.py --arch resnet18 --out checkpoint/imagenet

The export is a plain ``torch.save(model.state_dict(), ...)`` (readable by
``pmoe_tpu.utils.torch_compat.load_state_dict_file``); pass ``--npz`` to save
as numpy archives instead, removing the torch dependency at load time.
"""

from __future__ import annotations

import argparse
from pathlib import Path

ARCHS = ("resnet18", "resnet34", "resnet50")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet18", choices=ARCHS + ("all",))
    ap.add_argument("--out", default="checkpoint/imagenet")
    ap.add_argument("--npz", action="store_true",
                    help="save .npz (no torch needed to load)")
    args = ap.parse_args()

    import torch
    import torchvision

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    archs = ARCHS if args.arch == "all" else (args.arch,)
    for arch in archs:
        model = getattr(torchvision.models, arch)(weights="IMAGENET1K_V1")
        sd = model.state_dict()
        if args.npz:
            import numpy as np

            np.savez(out / f"{arch}.npz",
                     **{k: v.detach().numpy() for k, v in sd.items()})
            print(f"wrote {out / (arch + '.npz')}")
        else:
            torch.save(sd, out / f"{arch}.pth")
            print(f"wrote {out / (arch + '.pth')}")


if __name__ == "__main__":
    main()
