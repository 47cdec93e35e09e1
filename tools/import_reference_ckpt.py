"""Import a reference BtcDet torch checkpoint (.pth) into an orbax
checkpoint loadable by tools/train.py / tools/test.py.

    python tools/import_reference_ckpt.py --ckpt btcdet.pth \
        --cfg_file tools/cfgs/model_configs/btcdet_kitti_car.yaml \
        --out output/imported_ckpt

Reference semantics being replaced: `load_params_from_file`
(`detector3d_template.py:594-678`) -- but instead of loading into a
torch module, the state dict is transposed into the flax tree (see
btcdet_tpu/train/ref_import.py for the layout conventions).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="reference .pth file")
    ap.add_argument("--cfg_file",
                    default="tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    ap.add_argument("--out", required=True, help="orbax checkpoint dir")
    ap.add_argument("--strict", action="store_true",
                    help="fail on any unmapped/uncovered tensor")
    args = ap.parse_args()

    import jax
    if os.environ.get("BTCDET_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BTCDET_PLATFORM"])
    import jax.numpy as jnp
    import numpy as np
    import torch

    from btcdet_tpu.config import cfg_from_yaml_file
    from btcdet_tpu.datasets import make_synthetic_batch
    from btcdet_tpu.models import build_network
    from btcdet_tpu.train import checkpoint as ckpt_mod
    from btcdet_tpu.train import ref_import, trainer, optim as optim_mod
    from btcdet_tpu.datasets.mini_config import mini_opt_cfg

    cfg = cfg_from_yaml_file(args.cfg_file)
    net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)
    batch = {k: jnp.asarray(v) for k, v in make_synthetic_batch(
        cfg.DATA_CONFIG, batch_size=1, num_points=4096, num_gt=3,
        mode="train").items()}
    state, tx = trainer.create_train_state(
        net, batch, jax.random.PRNGKey(0),
        det_opt_cfg=cfg.OPTIMIZATION,
        occ_opt_cfg=cfg.get("OCC_OPTIMIZATION", None), total_steps=1,
    )

    loaded = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = loaded.get("model_state", loaded)
    step = int(loaded.get("it", sd.get("global_step", [0])[0]
                           if "global_step" in sd else 0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    n_per_block = tuple(int(n) for n in cfg.MODEL.BACKBONE_2D.LAYER_NUMS)
    new_vars, report = ref_import.map_reference_state(
        sd, variables, n_per_block=n_per_block)

    print(f"mapped {report['mapped']} tensors; dropped {len(report['dropped'])}")
    for k in ("unmapped_ref", "uncovered_flax", "shape_mismatch"):
        if report[k]:
            print(f"{k} ({len(report[k])}):")
            for item in report[k][:40]:
                print("  ", item)
            if args.strict:
                raise SystemExit(f"strict import failed on {k}")

    new_state = trainer.TrainState(
        jnp.asarray(step, jnp.int32),
        new_vars["params"], new_vars.get("batch_stats", {}), state.opt_state,
    )
    mgr = ckpt_mod.CheckpointManager(args.out, max_to_keep=1)
    mgr.save(step, new_state)
    print(f"saved imported checkpoint (step {step}) -> {args.out}")


if __name__ == "__main__":
    main()
