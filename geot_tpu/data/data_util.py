"""Dataset utilities (reference: ``openpoints/dataset/data_util.py``)."""
from __future__ import annotations

import numpy as np


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


def rotate_theta_phi(theta: float, phi: float) -> np.ndarray:
    """View rotation matrix for the multi-view pretraining datasets
    (reference ``data_util.py:213``): rotate by theta about z then phi about x."""
    ct, st = np.cos(theta), np.sin(theta)
    cp, sp = np.cos(phi), np.sin(phi)
    rz = np.array([[ct, -st, 0], [st, ct, 0], [0, 0, 1]], dtype=np.float32)
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]], dtype=np.float32)
    return rx @ rz
