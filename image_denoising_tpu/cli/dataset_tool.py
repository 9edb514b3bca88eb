"""ImageNet prep CLI — reference-compatible ``dataset_tool.py``."""
from __future__ import annotations

import argparse

from ..data.prep import filter_imagenet


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input_dir", type=str, default="./ILSVRC2012_img_val")
    parser.add_argument("--save_dir", type=str, default="./Imagenet_val")
    parser.add_argument("--min_side", type=int, default=256)
    parser.add_argument("--max_side", type=int, default=512)
    opt = parser.parse_args(argv)
    return filter_imagenet(opt.input_dir, opt.save_dir, opt.min_side, opt.max_side)


if __name__ == "__main__":
    main()
