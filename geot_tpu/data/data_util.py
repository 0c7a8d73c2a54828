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
