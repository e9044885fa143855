#!/usr/bin/env python
"""Copy a rd_sweep_depth per-point checkpoint the first time its step
counter reaches a target.

The sweep overwrites <out_root>/ckpt_<tag>.npz every checkpoint interval
(tools/rd_sweep_depth.py --point_ckpt_every), so a mid-schedule state is
gone 500 steps later.  Polling the 'step' entry of the npz is cheap (one
zip member); the copy gives the round an encode-only RD point at an
intermediate depth of a longer run (VERDICT r4 next #3: lambda separation
at 10k+ steps) without a second training run.

Usage: snapshot_ckpt_at.py <ckpt.npz> <target_step> <dest.npz>
"""
import shutil
import sys
import time
import zipfile

import numpy as np


def ckpt_step(path: str) -> int:
    # read only the 'step' member; tolerate a mid-write file
    try:
        with zipfile.ZipFile(path) as z:
            with z.open("step.npy") as f:
                return int(np.lib.format.read_array(f))
    except Exception:
        return -1


def main():
    src, target, dst = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    while True:
        s = ckpt_step(src)
        if s >= target:
            # the writer replaces the file atomically (os.replace) but wait a
            # beat and re-verify so a half-copied source can't slip through
            time.sleep(5)
            if ckpt_step(src) >= target:
                shutil.copyfile(src, dst)
                got = ckpt_step(dst)
                print(f"snapshotted step {got} -> {dst}", flush=True)
                return
        time.sleep(60)


if __name__ == "__main__":
    main()
