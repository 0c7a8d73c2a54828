"""Dataset utilities (reference: ``openpoints/dataset/data_util.py``)."""
from __future__ import annotations

import numpy as np


class EpochSeededRNG:
    """Per-``(seed, epoch, idx)`` item RNG shared by every dataset family.

    The loader's ``set_epoch`` forwarding (``build.py:65-70``) bumps
    ``self.epoch`` so augmentations are epoch-varying while staying
    deterministic — the rebuild's replacement for the reference's torch
    DataLoader worker seeding (ADVICE r2: a fixed per-idx seed replayed
    identical augmentations every epoch)."""

    seed = 0
    epoch = 0

    def _rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng((self.seed, self.epoch, idx))


def get_features_by_keys(data, keys: str = "pos,x"):
    """Concatenate feature keys channels-last (reference ``data_util.py:177``
    returns channels-first; this rebuild is channels-last everywhere).
    Works for both numpy (host pipeline) and jax arrays."""
    key_list = keys.split(",")
    if len(key_list) == 1:
        return data[keys]
    arrays = [data[k] for k in key_list]
    if isinstance(arrays[0], np.ndarray):
        return np.concatenate(arrays, axis=-1)
    import jax.numpy as jnp

    return jnp.concatenate(arrays, axis=-1)


def get_class_weights(num_per_class, normalize: bool = False) -> np.ndarray:
    """Inverse-frequency class weights (reference ``data_util.py:185``)."""
    num_per_class = np.asarray(num_per_class, dtype=np.float64)
    weight = num_per_class / num_per_class.sum()
    w = 1.0 / (weight + 0.02)
    if normalize:
        w = w * len(w) / w.sum()
    return w.astype(np.float32)


def rotate_angle_vector(theta: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Rodrigues rotation matrices about axes ``v`` by angles ``theta``
    (reference ``data_util.py:195``): theta (B, 1), v (B, 3) -> (B, 3, 3)."""
    cos_a = np.cos(theta)
    sin_a = np.sin(theta)
    x, y, z = v[:, 0:1], v[:, 1:2], v[:, 2:3]
    rows = [
        np.concatenate([cos_a + (1 - cos_a) * x * x,
                        (1 - cos_a) * x * y - sin_a * z,
                        (1 - cos_a) * x * z + sin_a * y], axis=-1),
        np.concatenate([(1 - cos_a) * y * x + sin_a * z,
                        cos_a + (1 - cos_a) * y * y,
                        (1 - cos_a) * y * z - sin_a * x], axis=-1),
        np.concatenate([(1 - cos_a) * z * x - sin_a * y,
                        (1 - cos_a) * z * y + sin_a * x,
                        cos_a + (1 - cos_a) * z * z], axis=-1),
    ]
    return np.stack(rows, axis=1).astype(np.float32)


def rotate_theta_phi(angles: np.ndarray) -> np.ndarray:
    """View rotation matrices for the multi-view pretraining datasets —
    exact port of the reference math (``data_util.py:213``): angles (B, 2)
    in radians -> (B, 3, 3) inverse view rotations."""
    angles = np.asarray(angles, dtype=np.float64)
    assert angles.ndim == 2 and angles.shape[1] == 2
    B = angles.shape[0]
    theta, phi = angles[:, 0:1], angles[:, 1:2]
    v1 = np.broadcast_to(np.array([[0.0, 0.0, 1.0]]), (B, 3))
    v2 = np.concatenate([np.sin(theta), -np.cos(theta),
                         np.zeros_like(theta)], axis=-1)
    r1_inv = rotate_angle_vector(-theta, v1)
    r2_inv = rotate_angle_vector(-phi, v2)
    return (r1_inv @ r2_inv).astype(np.float32)


# --------------------------------------------------------------------------
# openpoints heritage utilities (reference ``data_util.py:13-176,231-258``) —
# voxel-grid sampling + hashing + IO used by the S3DIS/ScanNet-style
# pipelines.  Not on the GeoT tooth path; ported for surface parity.
# --------------------------------------------------------------------------


from .io import IO  # extension-dispatch reader (reference ``data_util.py:13``)


def download_url(url: str, folder: str, log: bool = True, filename=None):
    """Download ``url`` into ``folder`` (reference ``data_util.py:52-90``);
    returns the existing path without re-downloading."""
    import os
    import ssl
    import sys
    import urllib.request

    if filename is None:
        filename = url.rpartition("/")[2]
        filename = filename if filename[0] == "?" else filename.split("?")[0]
    path = os.path.join(folder, filename)
    if os.path.exists(path):
        if log:
            print(f"Using existing file {filename}", file=sys.stderr)
        return path
    if log:
        print(f"Downloading {url}", file=sys.stderr)
    os.makedirs(folder, exist_ok=True)
    context = ssl._create_unverified_context()
    data = urllib.request.urlopen(url, context=context)
    with open(path, "wb") as f:
        while True:
            chunk = data.read(10 * 1024 * 1024)
            if not chunk:
                break
            f.write(chunk)
    return path


def fnv_hash_vec(arr: np.ndarray) -> np.ndarray:
    """FNV64-1A over integer coordinate rows (reference ``data_util.py:93``),
    vectorised over the column loop exactly as upstream."""
    assert arr.ndim == 2
    arr = arr.copy().astype(np.uint64, copy=False)
    hashed = np.uint64(14695981039346656037) * np.ones(arr.shape[0],
                                                       dtype=np.uint64)
    for j in range(arr.shape[1]):
        hashed *= np.uint64(1099511628211)
        hashed = np.bitwise_xor(hashed, arr[:, j])
    return hashed


def ravel_hash_vec(arr: np.ndarray) -> np.ndarray:
    """Fortran-order ravel of min-shifted coordinates
    (reference ``data_util.py:106``)."""
    assert arr.ndim == 2
    arr = arr.copy()
    arr -= arr.min(0)
    arr = arr.astype(np.uint64, copy=False)
    arr_max = arr.max(0).astype(np.uint64) + 1
    keys = np.zeros(arr.shape[0], dtype=np.uint64)
    for j in range(arr.shape[1] - 1):
        keys += arr[:, j]
        keys *= arr_max[j + 1]
    keys += arr[:, -1]
    return keys


def voxelize(coord: np.ndarray, voxel_size=0.05, hash_type: str = "fnv",
             mode: int = 0, rng: np.random.Generator | None = None):
    """Voxel-grid subsampling (reference ``data_util.py:124-141``).

    mode 0 (train): one random point per voxel -> index array.
    mode 1 (val): ``(idx_sort, voxel_idx, count)`` for round-robin covers.
    ``rng`` replaces the reference's global ``np.random`` (deterministic
    loaders are the repo convention)."""
    rng = rng or np.random.default_rng()
    discrete = np.floor(coord / np.array(voxel_size))
    key = ravel_hash_vec(discrete) if hash_type == "ravel" \
        else fnv_hash_vec(discrete)
    idx_sort = np.argsort(key)
    key_sort = key[idx_sort]
    _, voxel_idx, count = np.unique(key_sort, return_counts=True,
                                    return_inverse=True)
    if mode == 0:
        starts = np.cumsum(np.insert(count, 0, 0)[:-1])
        idx_select = starts + rng.integers(0, count.max(), count.size) % count
        return idx_sort[idx_select]
    return idx_sort, voxel_idx, count


def crop_pc(coord, feat, label, split: str = "train", voxel_size=0.04,
            voxel_max=None, downsample: bool = True, variable: bool = True,
            shuffle: bool = True, rng: np.random.Generator | None = None):
    """Voxel-downsample then crop/pad to ``voxel_max`` points around a random
    (train) or central (eval) anchor (reference ``data_util.py:144-172``)."""
    rng = rng or np.random.default_rng()
    if voxel_size and downsample:
        coord = coord - coord.min(0)
        uniq = voxelize(coord, voxel_size, rng=rng)
        coord = coord[uniq]
        feat = feat[uniq] if feat is not None else None
        label = label[uniq] if label is not None else None
    if voxel_max is not None:
        N = len(coord)
        crop_idx = None
        if N >= voxel_max:
            init_idx = rng.integers(N) if "train" in split else N // 2
            crop_idx = np.argsort(
                np.square(coord - coord[init_idx]).sum(1))[:voxel_max]
        elif not variable:
            pad = rng.choice(N, voxel_max - N)
            crop_idx = np.hstack([np.arange(N), pad])
        if crop_idx is None:
            crop_idx = np.arange(len(coord))
        if shuffle:
            crop_idx = crop_idx[rng.permutation(len(crop_idx))]
        coord = coord[crop_idx]
        feat = feat[crop_idx] if feat is not None else None
        label = label[crop_idx] if label is not None else None
    coord = coord - coord.min(0)
    return (coord.astype(np.float32),
            feat.astype(np.float32) if feat is not None else None,
            label.astype(np.int64) if label is not None else None)


def rotate_point_clouds_batch(pc, rotation_matrix, use_normals: bool = False):
    """Batched view rotation ``einsum('bnc,bdc->bnd')`` on pos (+normals)
    (reference ``data_util.py:231-247``); numpy or jax arrays."""
    if isinstance(pc, np.ndarray):
        einsum = np.einsum
        cat = np.concatenate
    else:
        import jax.numpy as jnp

        einsum = jnp.einsum
        cat = jnp.concatenate
    R = rotation_matrix.astype(pc.dtype)
    if not use_normals:
        return einsum("bnc,bdc->bnd", pc, R)
    new_pc = einsum("bnc,bdc->bnd", pc[:, :, :3], R)
    new_nrm = einsum("bnc,bdc->bnd", pc[:, :, 3:], R)
    return cat([new_pc, new_nrm], axis=-1)
