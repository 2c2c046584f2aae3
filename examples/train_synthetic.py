"""Train on the procedural synthetic scene and export a PLY.

Equivalent in spirit to what the reference's `examples/main.jl` + `train.jl`
*intended* (the reference's loop is a non-running sketch, SURVEY §2.3), as a
two-liner over the CLI:

    python examples/train_synthetic.py --iterations 500 --out runs/demo
"""

import sys

from gaussiansplat_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main(["train", "--scene", "synthetic", *sys.argv[1:]]))
