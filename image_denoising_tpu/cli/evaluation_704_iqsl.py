"""Tiled eval + IQ-IoU CLI — reference-compatible ``evaluation_704_iqsl.py``.

Identical engine to evaluation_704 with the 3-class intensity-quantized IoU
enabled by ``--compute_iq_iou`` (thresholds from GT quantiles). Implemented as
a thin default-flipping wrapper over the shared tiled evaluator.
"""
from __future__ import annotations

from .evaluation_704 import evaluate, parse_args


def main(argv=None):
    opt = parse_args(argv)
    return evaluate(opt)


if __name__ == "__main__":
    main()
