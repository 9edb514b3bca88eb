"""SIDD raw prep CLI — reference-compatible ``dataset_tool_raw.py``."""
from __future__ import annotations

import argparse

from ..data.prep import crop_sidd_raw


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str,
                        default="./datasets/SIDD/SIDD_Medium_Raw/Data")
    parser.add_argument("--save_folder", type=str,
                        default="./datasets/SIDD/SIDD_Medium_Raw_noisy_sub512")
    parser.add_argument("--crop_size", type=int, default=512)
    parser.add_argument("--step", type=int, default=256)
    opt = parser.parse_args(argv)
    return crop_sidd_raw(opt.data_dir, opt.save_folder, opt.crop_size, opt.step)


if __name__ == "__main__":
    main()
