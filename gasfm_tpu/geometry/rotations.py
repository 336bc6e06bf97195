"""Rotation parametrizations — JAX (device, differentiable) and NumPy (host).

Behavioral parity targets:
- quaternion decode: pytorch3d ``quaternion_to_matrix`` semantics
  (reference: code/models/baseNet.py:48).
- 6d decode: pytorch3d ``rotation_6d_to_matrix`` (Zhou et al.) semantics
  (reference: code/models/baseNet.py:43).
- SVD projection to SO(3) (reference: code/utils/geo_utils.py:25-31).
- Rodrigues packing for bundle adjustment (reference:
  code/utils/ceres_utils.py:25,43 via cv2.Rodrigues).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax


# ---------------------------------------------------------------------------
# JAX (device) — used by model heads and losses
# ---------------------------------------------------------------------------


def quaternion_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternions -> (..., 3, 3) rotations.

    Matches pytorch3d: normalizes implicitly via 2/||q||^2; real part first.
    """
    r, i, j, k = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    two_s = 2.0 / jnp.sum(q * q, axis=-1)
    o = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return o.reshape(q.shape[:-1] + (3, 3))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) -> (..., 3, 3); rows are the orthonormalized basis (pytorch3d)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    dot = jnp.sum(b1 * a2, axis=-1, keepdims=True)
    b2 = a2 - dot * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def project_to_rot(m: jnp.ndarray) -> jnp.ndarray:
    """Project (..., 3, 3) matrices to SO(3) via SVD with det fix-up.

    Parity: reference code/utils/geo_utils.py:25-31.
    """
    u, _, vt = jnp.linalg.svd(m, full_matrices=False)
    det = jnp.linalg.det(jnp.matmul(u, vt))
    vt_fixed = jnp.concatenate([vt[..., :2, :], vt[..., 2:, :] * det[..., None, None]], axis=-2)
    return jnp.matmul(u, vt_fixed)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz unit quaternions, w >= 0.

    Largest-component pivot (the pytorch3d/Shepperd scheme, selected
    branch-free by argmax): the earlier copysign-against-(m21-m12) variant
    recovered the x/y/z signs from terms proportional to w, which vanish as
    the rotation angle approaches pi — two nearly identical ~180-degree
    rotations could then differ in component signs by rounding noise,
    spiking the GTLoss orientation term. Each pivot row is exact wherever
    its diagonal combination is largest, so the selected candidate is
    always well-conditioned.

    NOTE: the reference's GTLoss calls a ``geo_utils.rot_to_quat`` that does
    not exist anywhere in the reference tree (dead code); this is a working
    implementation so the GTLoss oracle actually runs here.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tw = 1.0 + m00 + m11 + m22  # = 4w^2
    tx = 1.0 + m00 - m11 - m22  # = 4x^2
    ty = 1.0 - m00 + m11 - m22  # = 4y^2
    tz = 1.0 - m00 - m11 + m22  # = 4z^2

    def cand(t, a, b, c, order):
        s = jnp.sqrt(jnp.maximum(t, 1e-12))
        comps = {"t": 0.5 * s}
        inv = 0.5 / s
        comps[order[1]] = a * inv
        comps[order[2]] = b * inv
        comps[order[3]] = c * inv
        comps[order[0]] = comps.pop("t")
        return jnp.stack([comps["w"], comps["x"], comps["y"], comps["z"]], axis=-1)

    q_w = cand(tw, m21 - m12, m02 - m20, m10 - m01, "wxyz")
    q_x = cand(tx, m21 - m12, m01 + m10, m02 + m20, "xwyz")
    q_y = cand(ty, m02 - m20, m01 + m10, m12 + m21, "ywxz")
    q_z = cand(tz, m10 - m01, m02 + m20, m12 + m21, "zwxy")

    cands = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # (..., 4 cand, 4)
    best = jnp.argmax(jnp.stack([tw, tx, ty, tz], axis=-1), axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    # Canonical sign: w >= 0 (matches the previous convention; sign(0) -> +).
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis-angle (radians) -> (..., 3, 3) via Rodrigues' formula."""
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    small = theta < 1e-8
    axis = aa / jnp.where(small, jnp.ones_like(theta), theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [zero, -z, y, z, zero, -x, -y, x, zero], axis=-1
    ).reshape(aa.shape[:-1] + (3, 3))
    t = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    R = eye + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * jnp.matmul(K, K)
    return jnp.where(small[..., None], eye + K, R)


# ---------------------------------------------------------------------------
# NumPy (host) — used by augmentation, BA packing, evaluation
# ---------------------------------------------------------------------------


def axis_angle_to_matrix_np(aa: np.ndarray) -> np.ndarray:
    aa = np.asarray(aa, dtype=np.float64)
    theta = np.linalg.norm(aa, axis=-1, keepdims=True)
    small = (theta < 1e-12)[..., 0]
    axis = aa / np.where(theta < 1e-12, 1.0, theta)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = np.zeros_like(x)
    K = np.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1).reshape(aa.shape[:-1] + (3, 3))
    t = theta[..., None]
    eye = np.broadcast_to(np.eye(3), K.shape).copy()
    R = eye + np.sin(t) * K + (1.0 - np.cos(t)) * (K @ K)
    R[small] = eye[small]
    return R


def _matrix_to_quaternion_np(R: np.ndarray) -> np.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz unit quaternions (branch-free, robust
    at all angles including theta ~ pi)."""
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    qw = np.sqrt(np.maximum(1.0 + m00 + m11 + m22, 0.0)) / 2.0
    qx = np.sqrt(np.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    qy = np.sqrt(np.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    qz = np.sqrt(np.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    q = np.stack([qw, qx, qy, qz], axis=-1)
    # Refine signs/values using the component of largest magnitude (stable).
    # Candidate reconstructions from each pivot:
    out = np.empty_like(q)
    pivot = np.argmax(q, axis=-1)
    it = np.ndindex(*q.shape[:-1])
    for idx in it:
        p = pivot[idx]
        Ri = R[idx]
        if p == 0:
            w = q[idx][0]
            out[idx] = [w, (Ri[2, 1] - Ri[1, 2]) / (4 * w), (Ri[0, 2] - Ri[2, 0]) / (4 * w),
                        (Ri[1, 0] - Ri[0, 1]) / (4 * w)]
        elif p == 1:
            x = q[idx][1]
            out[idx] = [(Ri[2, 1] - Ri[1, 2]) / (4 * x), x, (Ri[0, 1] + Ri[1, 0]) / (4 * x),
                        (Ri[0, 2] + Ri[2, 0]) / (4 * x)]
        elif p == 2:
            y = q[idx][2]
            out[idx] = [(Ri[0, 2] - Ri[2, 0]) / (4 * y), (Ri[0, 1] + Ri[1, 0]) / (4 * y), y,
                        (Ri[1, 2] + Ri[2, 1]) / (4 * y)]
        else:
            z = q[idx][3]
            out[idx] = [(Ri[1, 0] - Ri[0, 1]) / (4 * z), (Ri[0, 2] + Ri[2, 0]) / (4 * z),
                        (Ri[1, 2] + Ri[2, 1]) / (4 * z), z]
    out /= np.linalg.norm(out, axis=-1, keepdims=True)
    return out


def matrix_to_axis_angle_np(R: np.ndarray) -> np.ndarray:
    """(..., 3, 3) rotations -> (..., 3) axis-angle (Rodrigues vectors).

    Equivalent to cv2.Rodrigues applied batchwise (reference:
    code/utils/ceres_utils.py:25). Goes through the quaternion
    representation, which is uniformly accurate — including theta ~ pi,
    where the classic sin-based formula degrades (look-at cameras on a ring
    commonly have such rotations).
    """
    R = np.asarray(R, dtype=np.float64)
    q = _matrix_to_quaternion_np(R)
    q = np.where(q[..., :1] < 0, -q, q)  # hemisphere with w >= 0
    w = np.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    norm = np.linalg.norm(xyz, axis=-1)
    theta = 2.0 * np.arctan2(norm, w)
    small = norm < 1e-12
    axis = xyz / np.where(small, 1.0, norm)[..., None]
    return axis * theta[..., None]


def compare_rotations_np(R1: np.ndarray, R2: np.ndarray) -> np.ndarray:
    """Geodesic angle in degrees between rotation batches.

    Parity: reference code/utils/geo_utils.py:14-22.
    """
    cos_err = (R1 @ np.transpose(R2, (0, 2, 1)))[:, np.arange(3), np.arange(3)]
    cos_err = (cos_err.sum(axis=-1) - 1.0) / 2.0
    cos_err = np.clip(cos_err, -1.0, 1.0)
    return np.arccos(cos_err) * 180.0 / np.pi
