"""Dataset registry + dataloaders.

Reference: ``openpoints/dataset/build.py`` (torch DataLoader with worker
processes + DistributedSampler).  The rebuild uses a thread-pool prefetch
loader feeding numpy batches: the heavy per-sample work (OBJ parse, numpy
subsample, augmentation) releases the GIL in numpy; device transfer happens in
the engine.  Per-host sharding replaces ``DistributedSampler`` — each host
takes a strided slice of the epoch's index permutation
(reference ``build.py:107`` -> ``process_index``-strided here).
"""
from __future__ import annotations

import concurrent.futures as _fut
import itertools
from typing import Any, Dict, Iterator, List

import numpy as np

from ..core.registry import Registry
from .transforms import build_transforms_from_cfg

DATASETS = Registry("dataset")


def build_dataset_from_cfg(cfg, default_args=None):
    return DATASETS.build(cfg, **(default_args or {}))


def default_collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack fixed-shape numpy entries; keep ragged entries (full-resolution
    ``points``/``labels`` for eval) as lists — the behaviour of
    ``collate_fn_val`` (reference ``build.py:30-50``)."""
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = np.asarray(vals[0])
        if all(np.asarray(v).shape == first.shape for v in vals) and first.dtype != object:
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = vals
    return out


# reference-name aliases (``openpoints/dataset/build.py:13,30``): one collate
# covers both — fixed-shape entries stack, ragged full-res eval entries stay
# as lists
concat_collate_fn = default_collate
collate_fn_val = default_collate


class DataLoader:
    """Minimal epoch-based loader: shuffling, per-host sharding, thread-pool
    prefetch, drop_last for static batch shapes under jit."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, num_workers: int = 4, seed: int = 0,
                 collate_fn=None, num_shards: int = 1, shard_index: int = 0,
                 batch_mixers=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.collate = collate_fn or default_collate
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0
        # batch-level transforms (Cutmix) applied after collation
        self.batch_mixers = batch_mixers or []

    def set_epoch(self, epoch: int):
        """Reference ``DistributedSampler.set_epoch`` (``train.py:278-279``);
        also forwarded to the dataset for per-epoch sample RNG
        (reference ``train.py:281-282``)."""
        self.epoch = epoch
        if hasattr(self.dataset, "epoch"):
            self.dataset.epoch = epoch

    # expose the reference's ``loader.sampler.set_epoch`` call-site shape
    @property
    def sampler(self):
        return self

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + self.epoch).permutation(n)
        if self.num_shards > 1:
            # BLOCK-shard each global batch: host h takes rows
            # [h*B_local, (h+1)*B_local) of every global-batch-sized chunk,
            # so the cross-process assembled global batch
            # (``parallel.shard_batch(host_local=True)`` concatenates host
            # blocks in process order) reproduces the single-process batch
            # row-for-row — multi-host trajectories equal single-process
            # ones bit-for-bit (tests/test_multiprocess_dist.py).  torch's
            # DistributedSampler uses strided sharding (``build.py:107``),
            # but its global batch order is irrelevant under DDP averaging;
            # here the order IS the global array layout.
            gb = self.batch_size * self.num_shards
            if self.drop_last:
                # same batches as a single-process loader with drop_last:
                # the ragged tail is dropped
                idx = idx[:len(idx) - len(idx) % gb]
            elif len(idx) % gb:
                # wrap-pad to a full global batch so every shard sees the
                # same count (unequal per-host batch counts would deadlock
                # a multi-host sharded step on the last batch)
                pad = gb - len(idx) % gb
                idx = np.concatenate([idx, idx[:pad]])
            chunks = idx.reshape(-1, self.num_shards, self.batch_size)
            return chunks[:, self.shard_index, :].reshape(-1)
        return idx

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        idx = self._epoch_indices()
        nb = len(self)
        with _fut.ThreadPoolExecutor(self.num_workers) as pool:
            batches = [idx[i * self.batch_size:(i + 1) * self.batch_size]
                       for i in range(nb)]

            def fetch(batch_idx):
                batch = self.collate([self.dataset[int(j)] for j in batch_idx])
                if self.batch_mixers:
                    rng = np.random.default_rng(
                        (self.seed, self.epoch, int(batch_idx[0])))
                    for mixer in self.batch_mixers:
                        batch = mixer.mix_batch(batch, rng)
                return batch

            # prefetch depth = num_workers
            futures = []
            it = iter(batches)
            for b in itertools.islice(it, self.num_workers):
                futures.append(pool.submit(fetch, b))
            for b in it:
                done = futures.pop(0)
                futures.append(pool.submit(fetch, b))
                yield done.result()
            for fut in futures:
                yield fut.result()


def _shard_info(distributed: bool):
    if not distributed:
        return 1, 0
    import jax

    return jax.process_count(), jax.process_index()


def _host_batch_size(batch_size: int, shards: int) -> int:
    """Config batch sizes are GLOBAL (the single-process GSPMD semantics);
    with per-host loader shards each host loads its 1/shards slice of every
    global batch (reference ``DistributedSampler``: per-rank batches concat
    to the global batch)."""
    if shards <= 1:
        return batch_size
    if batch_size % shards:
        raise ValueError(
            f"global batch_size={batch_size} not divisible by "
            f"{shards} processes")
    return batch_size // shards


def build_dataloader_from_cfg(batch_size: int, dataset_cfg,
                              dataloader_cfg=None, datatransforms_cfg=None,
                              split: str = "train", distributed: bool = False,
                              pretrain: bool = False, seed: int = 0,
                              is_train: bool | None = None):
    """Reference ``openpoints/dataset/build.py:67-126``: select the transform
    pipeline for the split, build the dataset with it, wrap in a loader.

    ``is_train`` controls shuffle/drop_last/transform selection explicitly;
    when None it is inferred from the split name (``trainval`` counts as a
    training split — ShapeNetPart's standard training split)."""
    if is_train is None:
        is_train = split in ("train", "training", "trainval")
    if datatransforms_cfg is not None:
        trans_split = "train" if is_train else "val"
        transform = build_transforms_from_cfg(
            split if split in datatransforms_cfg else trans_split,
            datatransforms_cfg)
    else:
        transform = None

    split_cfg = dict(dataset_cfg.get(split, {}))
    cfg = dict(dataset_cfg.get("common", {}))
    cfg.update(split_cfg)
    cfg.setdefault("split", split)
    dataset = build_dataset_from_cfg(cfg, {"transform": transform})

    shards, shard_idx = _shard_info(distributed)
    batch_size = _host_batch_size(batch_size, shards)
    num_workers = (dataloader_cfg or {}).get("num_workers", 4)
    shuffle = bool(is_train)
    mixers = [t for t in (transform.transforms if transform else [])
              if hasattr(t, "mix_batch")]
    return DataLoader(dataset, batch_size, shuffle=shuffle, drop_last=shuffle,
                      num_workers=num_workers, seed=seed,
                      num_shards=shards, shard_index=shard_idx,
                      batch_mixers=mixers)


def build_semi_dataloader_from_cfg(batch_size: int, dataset_cfg,
                                   dataloader_cfg=None, datatransforms_cfg=None,
                                   split: str = "train", distributed: bool = False,
                                   pretrain: bool = False, seed: int = 0):
    """Reference ``build.py:128-189``: the unlabeled dataset receives BOTH the
    weak (``train_w``) and strong (``train_s``) pipelines."""
    transform_w = build_transforms_from_cfg("train_w", datatransforms_cfg)
    transform_s = build_transforms_from_cfg("train_s", datatransforms_cfg)

    split_cfg = dict(dataset_cfg.get(split, {}))
    cfg = dict(dataset_cfg.get("common", {}))
    cfg.update(split_cfg)
    cfg.setdefault("split", split)
    dataset = build_dataset_from_cfg(
        cfg, {"transform_w": transform_w, "transform_s": transform_s})

    shards, shard_idx = _shard_info(distributed)
    batch_size = _host_batch_size(batch_size, shards)
    num_workers = (dataloader_cfg or {}).get("num_workers", 4)
    return DataLoader(dataset, batch_size, shuffle=True, drop_last=True,
                      num_workers=num_workers, seed=seed + 1,
                      num_shards=shards, shard_index=shard_idx)
