#!/usr/bin/env python
"""Convert RTMV HDR .exr frames to LDR PNGs (reference misc/prepare_rtmv.py).

Usage: python misc/prepare_rtmv.py <root_dir containing */*.exr>
"""
import glob
import os
import sys

import numpy as np

from ngp_pl_tpu.datasets.color_utils import linear_to_srgb


def main(root_dir):
    import imageio.v2 as imageio

    for scene in sorted(glob.glob(os.path.join(root_dir, "*/"))):
        out_dir = os.path.join(scene, "images")
        os.makedirs(out_dir, exist_ok=True)
        for exr in sorted(glob.glob(os.path.join(scene, "*.exr"))):
            img = imageio.imread(exr)[..., :3]
            img = linear_to_srgb(np.clip(img, 0, 1))
            name = os.path.splitext(os.path.basename(exr))[0] + ".png"
            imageio.imwrite(os.path.join(out_dir, name),
                            (img * 255).astype(np.uint8))
        print(f"done {scene}")


if __name__ == "__main__":
    main(sys.argv[1])
