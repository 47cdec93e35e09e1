"""AOS pi-flip bisect (VERDICT r3 next #2): which train/eval semantic
difference makes the RPN direction bins flip on the fully memorized
overfit set?  Three forwards over the overfit checkpoint:

  eval_base     flagship eval semantics (occ thresh 0.3 + cap 40000 --
                the reference's half-applied EVAL_OCC_THRESH quirk,
                `add_occ_template.py:100-104`)
  eval_cap2048  eval semantics but occ cap forced to the TRAIN cap
  train_mode    train forward (batch-stats BN, train cap)

Measured result (docs/runs/r4/aos_bisect.log): eval_base flips 12/24
headings by pi; BOTH matched-cap variants flip 0/24.  The dir-bin math
is golden-pinned (tests/test_golden_reference.py); the flips come from
the reference-faithful eval-time occ-point population shift (~2.6-3.5k
thresh-passing points vs the top-2048 seen at every train step), which
restores 180-degree symmetry via the occ net's mirrored shape
completions.  Protocol artifact of memorization-scale data, not a
dir-path bug: at matched populations AOS saturates (overfit eval with
EVAL_MAX_NUM_OCC_PNTS=2048 scores ~100, docs/runs/r4/).

Run AFTER tools/overfit_proof.py on the same run dir; one TPU job at a
time."""
import os, sys
os.chdir('/root/repo'); sys.path.insert(0, '/root/repo')
import jax
import jax.numpy as jnp
import numpy as np
from pathlib import Path
from btcdet_tpu.config import cfg, cfg_from_yaml_file
from btcdet_tpu.datasets.kitti.kitti_dataset import KittiDataset
from btcdet_tpu.datasets.loader import make_loader
from btcdet_tpu.models import build_network
from btcdet_tpu.train import checkpoint as ckpt_mod, trainer as trainer_mod
from btcdet_tpu.utils.common import create_logger

run = Path("output/btcdet_overfit/overfit")
cfg_from_yaml_file(str(run / "btcdet_overfit.yaml"), cfg)
logger = create_logger(None)
dataset = KittiDataset(cfg.DATA_CONFIG, cfg.CLASS_NAMES, training=False,
                       root_path=cfg.DATA_CONFIG.DATA_PATH, logger=logger)
dl = make_loader(dataset, 1, shuffle=False, num_workers=0,
                 collate_fn=dataset.collate_batch)
net = build_network(cfg.MODEL, cfg.DATA_CONFIG, cfg.CLASS_NAMES)

cfg2 = cfg.copy()
import copy
cfg2 = copy.deepcopy(cfg)
cfg2.MODEL.OCC.PARAMS.EVAL_MAX_NUM_OCC_PNTS = 2048
net_cap = build_network(cfg2.MODEL, cfg2.DATA_CONFIG, cfg2.CLASS_NAMES)

example = next(iter(dl))
jex = {k: jnp.asarray(v) for k, v in example.items() if k != "frame_id"}
state, _ = trainer_mod.create_train_state(
    net, jex, jax.random.PRNGKey(0), det_opt_cfg=cfg.OPTIMIZATION,
    occ_opt_cfg=cfg.get("OCC_OPTIMIZATION", None), total_steps=1)
mgr = ckpt_mod.CheckpointManager(run / "ckpt")
state, step = mgr.restore(state, None)
print("restored", step, flush=True)
variables = {"params": state.params, "batch_stats": state.batch_stats}

def rpn_fn(network, train):
    @jax.jit
    def f(v, b, rng):
        if train:
            out, _ = network.apply(
                v, b, train=True, mutable=["batch_stats"],
                rngs={"sampling": rng, "dropout": rng})
        else:
            out = network.apply(v, b, train=False)
        occ_valid = out.get("occ_points_mask")
        nocc = occ_valid.sum() if occ_valid is not None else -1
        return out["rpn_box_preds"], out["rpn_cls_preds"], nocc
    return f

def wrap(d):
    return (d + np.pi) % (2 * np.pi) - np.pi

fns = {"eval_base": rpn_fn(net, False),
       "eval_cap2048": rpn_fn(net_cap, False),
       "train_mode": rpn_fn(net, True)}
stats = {k: [0, 0] for k in fns}
noccs = {k: [] for k in fns}
rng = jax.random.PRNGKey(7)
for bi, batch in enumerate(dl):
    if bi >= 6: break
    jb = {k: jnp.asarray(v) for k, v in batch.items() if k != "frame_id"}
    gt = np.asarray(batch["gt_boxes"][0]); gt = gt[gt[:, 7] > 0][:, :7]
    for name, f in fns.items():
        rpn, sco, nocc = jax.device_get(f(variables, jb, rng))
        noccs[name].append(int(nocc))
        rpn = rpn[0]; s = sco[0].max(-1)
        for g in gt:
            d2 = np.sum((rpn[:, :2] - g[:2]) ** 2, 1)
            near = d2 < 1.0
            if near.sum():
                i = np.argmax(np.where(near, s, -1e9))
                flip = abs(abs(wrap(rpn[i, 6] - g[6])) - np.pi) < 0.5
                stats[name][int(flip)] += 1
    print(bi, {k: f"{v[1]}/{v[0]+v[1]}" for k, v in stats.items()},
          {k: v[-1] for k, v in noccs.items()}, flush=True)
print("TOTAL flips:", {k: f"{v[1]}/{v[0]+v[1]}" for k, v in stats.items()})
print("occ point counts:", {k: v for k, v in noccs.items()})
