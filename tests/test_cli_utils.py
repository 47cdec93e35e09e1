"""CLI-support utilities: torch-free loader fallback and the eval
watcher's best-mAP incumbent tracker."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from btcdet_tpu.datasets.loader import PyLoader, make_loader


class _DS:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), float(i))}


def _collate(items):
    return {"x": np.stack([it["x"] for it in items])}


def test_pyloader_batching_and_drop_last():
    dl = PyLoader(_DS(10), batch_size=3, collate_fn=_collate, drop_last=True)
    batches = list(dl)
    assert len(batches) == 3 == len(dl)
    assert all(b["x"].shape == (3, 2) for b in batches)
    dl2 = PyLoader(_DS(10), batch_size=3, collate_fn=_collate, drop_last=False)
    assert len(list(dl2)) == 4 == len(dl2)


def test_pyloader_shuffle_is_per_epoch_deterministic():
    dl = PyLoader(_DS(20), batch_size=5, shuffle=True, collate_fn=_collate)
    dl.set_epoch(0)
    a = np.concatenate([b["x"][:, 0] for b in dl])
    dl.set_epoch(0)
    b = np.concatenate([b["x"][:, 0] for b in dl])
    np.testing.assert_array_equal(a, b)
    dl.set_epoch(1)
    c = np.concatenate([b["x"][:, 0] for b in dl])
    assert not np.array_equal(a, c)
    assert sorted(a) == sorted(c)  # same index set, different order


def test_make_loader_matches_pyloader_semantics():
    # whichever backend is picked, iteration yields the same batch count
    dl = make_loader(_DS(7), 2, shuffle=False, collate_fn=_collate)
    assert len(list(dl)) == 4


def test_best_map_tracker():
    from test import BestMapTracker  # tools/test.py

    t = BestMapTracker(["Car", "Pedestrian"])
    improved = t.update({"Car_3d/moderate_R40": 70.0,
                         "Car_3d/11R_moderate": 68.0,
                         "Pedestrian_bev/easy_R40": 50.0,
                         "ignored_key": 1.0}, step=3)
    assert set(improved) == {"Car_3d/moderate_R40", "Car_3d/11R_moderate",
                             "Pedestrian_bev/easy_R40"}
    # lower value does not displace; higher does and records the step
    assert t.update({"Car_3d/moderate_R40": 69.0}, step=4) == []
    assert t.update({"Car_3d/moderate_R40": 71.5}, step=5) == ["Car_3d/moderate_R40"]
    assert t.best["Car_3d/moderate_R40"] == (71.5, 5)
    s = t.summary()
    assert "Car_3d" in s and "@5" in s
