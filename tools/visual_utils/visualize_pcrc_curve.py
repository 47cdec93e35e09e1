"""Plot precision/recall curves from the `pc_rc.pkl` detail export
written by eval (btcdet_tpu/train/eval_utils.py).

TPU rebuild of the reference PR-curve tool
(`/root/reference/tools/visual_utils/visualize_pcrc_curve.py`): same
--dir1/--dir2 interface (compare two runs), reads the
{metric: {class: {difficulty: {R11_pc, R11_rc, R40_pc, R40_rc}}}} dict
produced by `kitti_eval.create_details` and saves one PNG per
(metric, class) with a curve per difficulty (and per run when two dirs
are given).

Usage:
  python tools/visual_utils/visualize_pcrc_curve.py --dir1 out/run_a \
      [--dir2 out/run_b] [--metric 3d] [--recall R40] [--out curves]
"""

import argparse
import os
import pickle

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--dir1", type=str, required=True,
                        help="result dir containing pc_rc.pkl")
    parser.add_argument("--dir2", type=str, default=None,
                        help="optional second result dir to overlay")
    parser.add_argument("--metric", type=str, default=None,
                        help="bev | 3d (default: both)")
    parser.add_argument("--recall", type=str, default="R40",
                        help="R11 | R40 sample grid")
    parser.add_argument("--out", type=str, default=None,
                        help="output dir for PNGs (default: dir1)")
    return parser.parse_args()


def load_details(d):
    with open(os.path.join(d, "pc_rc.pkl"), "rb") as f:
        return pickle.load(f)


def plot_metric(ax, details, metric, cls_name, recall_key, style, label_prefix=""):
    per_diff = details[metric][cls_name]
    for diff_name, curves in per_diff.items():
        rc = curves[f"{recall_key}_rc"]
        pc = curves[f"{recall_key}_pc"]
        ax.plot(rc, pc, style, label=f"{label_prefix}{diff_name}", linewidth=1.2)


def main():
    args = parse_config()
    out_dir = args.out or args.dir1
    os.makedirs(out_dir, exist_ok=True)
    d1 = load_details(args.dir1)
    d2 = load_details(args.dir2) if args.dir2 else None
    metrics = [args.metric] if args.metric else sorted(d1.keys())
    for metric in metrics:
        for cls_name in d1[metric]:
            fig, ax = plt.subplots(figsize=(6, 5))
            plot_metric(ax, d1, metric, cls_name, args.recall, "-",
                        label_prefix="" if d2 is None else "run1 ")
            if d2 is not None and cls_name in d2.get(metric, {}):
                plot_metric(ax, d2, metric, cls_name, args.recall, "--",
                            label_prefix="run2 ")
            ax.set_xlabel("recall")
            ax.set_ylabel("precision")
            ax.set_xlim(0, 1)
            ax.set_ylim(0, 1.05)
            ax.grid(alpha=0.3)
            ax.legend(fontsize=8)
            ax.set_title(f"{cls_name} {metric} PR ({args.recall})")
            path = os.path.join(out_dir, f"pr_{metric}_{cls_name}_{args.recall}.png")
            fig.tight_layout()
            fig.savefig(path, dpi=150)
            plt.close(fig)
            print("wrote", path)


if __name__ == "__main__":
    main()
