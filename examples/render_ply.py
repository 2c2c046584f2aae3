"""Render frames from a pretrained INRIA-format 3DGS PLY.

The reference analogue is `examples/main.jl:9-45` (load `train_30000.ply`,
render one hardcoded 512x512 view, imshow). Here:

    python examples/render_ply.py --ply scene.ply --frames 8 --out renders/
"""

import sys

from gaussiansplat_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["render", *sys.argv[1:]]))
