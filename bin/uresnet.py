#!/usr/bin/env python
"""CLI entry point (reference: bin/uresnet.py, SURVEY.md §2.1).

    bin/uresnet.py train -io synthetic -mn uresnet_dense -ss 64 -it 100 ...
    bin/uresnet.py inference -mp 'weights/snapshot-*.ckpt' -of out.h5 ...
    bin/uresnet.py iotest -io h5 -if events.h5 ...
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from uresnet_pytorch_tpu import main_funcs
from uresnet_pytorch_tpu.flags import parse_args


def main(argv=None):
    mode, cfg = parse_args(argv)
    if mode == "train":
        main_funcs.train(cfg)
    elif mode == "inference":
        main_funcs.inference(cfg)
    elif mode == "iotest":
        main_funcs.iotest(cfg)
    else:
        raise ValueError(mode)


if __name__ == "__main__":
    main()
