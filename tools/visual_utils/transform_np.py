"""Normalize point-cloud `.npy` dumps in place: materialize every value
as a plain numpy array (device arrays / JAX arrays -> np.ndarray) so the
dumps load anywhere without the framework installed.

TPU rebuild of `/root/reference/tools/visual_utils/transform_np.py`
(which converted lingering torch CUDA tensors inside dumps to numpy).

Usage: python tools/visual_utils/transform_np.py --dir out/cloud
"""

import argparse
import glob

import numpy as np


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--dir", type=str, required=True, help="dump dir with *.npy files")
    return parser.parse_args()


def main():
    args = parse_config()
    for file in glob.glob(args.dir + "/*.npy"):
        d = np.load(file, allow_pickle=True)
        if isinstance(d, np.ndarray) and d.dtype == object:
            d = d.item()
        if isinstance(d, dict):
            new_dict = {k: np.asarray(v) for k, v in d.items()}
        else:
            new_dict = np.asarray(d)
        np.save(file, new_dict)
        print("normalized", file)


if __name__ == "__main__":
    main()
