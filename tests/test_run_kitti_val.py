"""End-to-end smoke of the one-command KITTI-val parity runbook
(tools/run_kitti_val.sh): synthetic on-disk KITTI tree + a fabricated
reference-format .pth -> import -> eval -> official AP report. The day a
real KITTI root and reference checkpoint are available, parity is the
same single command (reference flow: tools/test.py:55-83)."""

import json
import os
import subprocess
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full flagship import + CPU eval compile

REPO = Path(__file__).resolve().parent.parent
MANIFEST = Path(__file__).parent / "fixtures" / "reference_state_dict_manifest.json"


def test_run_kitti_val_runbook(tmp_path):
    torch = pytest.importorskip("torch")
    from btcdet_tpu.datasets.kitti import kitti_infos
    from btcdet_tpu.datasets.synthetic_kitti import make_raw_kitti

    root = tmp_path / "kitti"
    make_raw_kitti(root, n_frames=4, n_train=4, seed=3, cars_per_frame=2)
    (root / "ImageSets" / "val.txt").write_text(
        (root / "ImageSets" / "train.txt").read_text())
    kitti_infos.create_kitti_infos(root, workers=2)

    # fabricated reference checkpoint: every tensor from the real
    # reference manifest, reference format {model_state, epoch, it}
    manifest = json.load(open(MANIFEST))
    sd = {k: torch.from_numpy(
        np.random.RandomState(abs(hash(k)) % 2**31).randn(*s).astype(np.float32))
        if s else torch.zeros(()) for k, s in manifest.items()}
    pth = tmp_path / "reference.pth"
    torch.save({"model_state": sd, "epoch": 7, "it": 123}, pth)

    # reduced-capacity flagship config: same model tree (so the manifest
    # maps 1:1 -- capacities change activations, not parameters), small
    # enough that the CPU eval compile stays tractable
    import yaml
    from btcdet_tpu.config import cfg_from_yaml_file
    cfg = cfg_from_yaml_file("tools/cfgs/model_configs/btcdet_kitti_car.yaml")
    d = json.loads(json.dumps(cfg))
    d["DATA_CONFIG"].pop("_BASE_CONFIG_", None)
    for proc in d["DATA_CONFIG"]["DATA_PROCESSOR"]:
        if "MAX_NUMBER_OF_VOXELS" in proc:
            proc["MAX_NUMBER_OF_VOXELS"] = {"train": 4000, "test": 4000}
    d["MODEL"]["BACKBONE_3D"]["LEVEL_CAPACITIES"] = {
        "train": [8000, 5000, 2500, 2000], "test": [8000, 5000, 2500, 2000]}
    d["MODEL"]["OCC"]["PARAMS"]["MAX_NUM_OCC_PNTS"] = 1024
    d["MODEL"]["OCC"]["PARAMS"]["EVAL_MAX_NUM_OCC_PNTS"] = 1024
    cfg_path = tmp_path / "runbook_cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(d, sort_keys=False))

    env = dict(os.environ, BTCDET_PLATFORM="cpu")
    r = subprocess.run(
        ["bash", "tools/run_kitti_val.sh", str(root), str(pth),
         str(cfg_path), "2"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=3600,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    assert "saved imported checkpoint (step 123)" in r.stdout
    # the official eval ran and reported AP lines (random weights -> any
    # value; the report existing end-to-end is the contract)
    eval_dir = REPO / "output" / cfg_path.stem / "kitti_val_parity" / "eval"
    logs = sorted(eval_dir.glob("eval_*.log"))
    assert logs, f"no eval log under {eval_dir}"
    txt = logs[-1].read_text()
    assert "Car_3d" in txt or "3d   AP" in txt or "AP_R40" in txt, txt[-2000:]
