"""Bisect the batch-slot bug: at eval batch B=2 the second slot's
detections vanish (tools/debug_overfit_eval.py). Runs the overfit
checkpoint on [f0,f1] and [f1,f0] and compares per-slot outputs at
several pipeline stages to find where slot 1 degrades.
"""

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
os.chdir(REPO)
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from btcdet_tpu.config import cfg, cfg_from_yaml_file
    from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
    from btcdet_tpu.models import build_network
    from btcdet_tpu.train import checkpoint as ckpt_mod
    from btcdet_tpu.train import trainer as trainer_mod
    from btcdet_tpu.utils.common import create_logger

    run = Path("output/btcdet_overfit/overfit")
    cfg_from_yaml_file(str(run / "btcdet_overfit.yaml"), cfg)
    logger = create_logger(None)
    dataset = KittiDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                           root_path=cfg.DATA_CONFIG.DATA_PATH, logger=logger)
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)

    d0, d1 = dataset[0], dataset[1]
    batch_01 = dataset.collate_batch([d0, d1])
    batch_10 = dataset.collate_batch([d1, d0])

    jb01 = {k: jnp.asarray(v) for k, v in batch_01.items() if k != "frame_id"}
    jb10 = {k: jnp.asarray(v) for k, v in batch_10.items() if k != "frame_id"}

    state, _ = trainer_mod.create_train_state(
        net, jb01, jax.random.PRNGKey(0),
        det_opt_cfg=cfg.OPTIMIZATION,
        occ_opt_cfg=cfg.get("OCC_OPTIMIZATION", None), total_steps=1)
    mgr = ckpt_mod.CheckpointManager(run / "ckpt")
    state, step = mgr.restore(state, None)
    print(f"restored step {step}")
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def fwd(b):
        return net.apply(variables, b, train=False)

    out01 = jax.device_get(fwd(jb01))
    out10 = jax.device_get(fwd(jb10))

    def describe(tag, out, slot):
        print(f"--- {tag} slot {slot}")
        for k in sorted(out):
            v = out[k]
            if not hasattr(v, "shape") or v.ndim == 0:
                continue
            if v.shape[0] == 2:  # batch-leading
                x = np.asarray(v[slot], np.float64)
                print(f"  {k}: shape={v.shape[1:]} absmax={np.abs(x).max():.4g}"
                      f" mean={x.mean():.4g}")
        cls = out.get("batch_cls_preds")
        if cls is not None:
            import scipy.special as sp  # noqa
        sc = 1 / (1 + np.exp(-np.asarray(out["batch_cls_preds"][slot]).max(-1)))
        print(f"  top scores: {np.sort(sc.ravel())[-8:]}")
        rv = out.get("roi_valid")
        if rv is not None:
            print(f"  roi_valid: {np.asarray(rv[slot]).sum()}")

    # frame0 as slot0 vs slot1
    describe("batch[f0,f1]", out01, 0)
    describe("batch[f1,f0]", out10, 1)
    print("==== frame1 both ways")
    describe("batch[f0,f1]", out01, 1)
    describe("batch[f1,f0]", out10, 0)


if __name__ == "__main__":
    main()
