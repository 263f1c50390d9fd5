"""Checkpoint conversion utility.

    python -m tortoise_tpu.convert --models /path/to/models --out cache/

Converts the reference's GGML weight files into npz pytree caches that the
pipeline loads directly (the runtime equivalent of the reference's
per-run record-by-record loaders, main.cpp:482-2021).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tortoise_tpu.convert")
    p.add_argument("--models", required=True,
                   help="directory with ggml-*.bin files")
    p.add_argument("--out", required=True, help="output cache directory")
    args = p.parse_args(argv)

    from tortoise_tpu.io.checkpoint import (
        convert_ar_checkpoint,
        convert_diffusion_checkpoint,
        convert_vocoder_checkpoint,
    )

    os.makedirs(args.out, exist_ok=True)
    jobs = [
        ("ggml-model.bin", "ar.npz", convert_ar_checkpoint),
        ("ggml-diffusion-model.bin", "diffusion.npz",
         convert_diffusion_checkpoint),
        ("ggml-vocoder-model.bin", "vocoder.npz",
         convert_vocoder_checkpoint),
    ]
    rc = 0
    for src, dst, fn in jobs:
        path = os.path.join(args.models, src)
        if not os.path.exists(path):
            print(f"skip {src}: not found", file=sys.stderr)
            rc = 1
            continue
        t0 = time.monotonic()
        fn(path, os.path.join(args.out, dst))
        print(f"{src} -> {dst} ({time.monotonic() - t0:.1f}s)")
    return rc


if __name__ == "__main__":
    sys.exit(main())
