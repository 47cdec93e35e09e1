"""Dataset registry + dataloader factory (reference
`btcdet/datasets/__init__.py:39` build_dataloader).

Distributed semantics are TPU-native: instead of a torch
DistributedSampler, each JAX process takes a contiguous shard of the
(optionally shuffled) index set -- the per-process data sharding that
feeds `shard_map`/pjit data parallelism. On one process this is a plain
DataLoader.
"""

from __future__ import annotations

from .synthetic import make_synthetic_batch  # noqa: F401

__all_datasets__ = {}


def _registry():
    if not __all_datasets__:
        from .kitti.kitti_dataset import KittiDataset

        __all_datasets__["KittiDataset"] = KittiDataset
    return __all_datasets__


class ShardSampler:
    """Deterministic per-process contiguous shard of a (shuffled) index
    set; the TPU-native stand-in for the reference's DistributedSampler
    (`btcdet/datasets/__init__.py:16` -- note the reference's custom
    test-time sampler also avoids shuffling)."""

    def __init__(self, n: int, num_shards: int, shard_id: int,
                 shuffle: bool, seed: int = 0):
        self.n, self.num_shards, self.shard_id = n, num_shards, shard_id
        self.shuffle, self.seed, self.epoch = shuffle, seed, 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self):
        import numpy as np

        idx = np.arange(self.n)
        if self.shuffle:
            idx = np.random.RandomState(self.seed + self.epoch).permutation(self.n)
        per = -(-self.n // self.num_shards)
        shard = idx[self.shard_id * per: (self.shard_id + 1) * per]
        # pad the last shard so every process sees the same step count
        if len(shard) < per and len(idx):
            shard = list(shard) + list(idx[: per - len(shard)])
        return iter(list(shard))

    def __len__(self):
        return -(-self.n // self.num_shards)


def build_dataloader(
    dataset_cfg, class_names, batch_size, dist=False, root_path=None,
    workers=4, logger=None, training=True, seed=0,
):
    """Returns (dataset, dataloader, sampler); mirrors the reference
    signature. `dist=True` shards across JAX processes."""
    from .loader import make_loader

    cls = _registry()[dataset_cfg.DATASET]
    dataset = cls(
        dataset_cfg, class_names, training=training,
        root_path=root_path or dataset_cfg.DATA_PATH, logger=logger,
    )
    sampler = None
    if dist:
        import jax

        sampler = ShardSampler(
            len(dataset), jax.process_count(), jax.process_index(),
            shuffle=training, seed=seed,
        )
    dataloader = make_loader(
        dataset, batch_size, shuffle=(sampler is None and training),
        num_workers=workers, collate_fn=dataset.collate_batch,
        drop_last=training, sampler=sampler, seed=seed,
    )
    return dataset, dataloader, sampler
