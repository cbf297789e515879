"""BAL-format problem loading.

Parses the reference's sequence files (reference: ba/dataio.cpp:17-57,
include/dataio.h:11-69): header ``n_keyframes n_points n_edges``, shared
pinhole intrinsics ``fx fy cx cy``, one ``camID lmkID u v`` line per edge,
then ``6*n_keyframes + 3*n_points`` initial parameters.

A native C++ fast path (gbp_poplar_tpu/native/balio.cpp, loaded via ctypes)
is used when available; the NumPy path below is the always-available
fallback and the correctness oracle for the native loader.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

# Candidate directories for the TUM sequences shipped with the reference.
_SEQUENCE_DIRS = [
    os.environ.get("GBP_SEQUENCES_DIR", ""),
    os.path.join(os.path.dirname(__file__), "..", "..", "data", "sequences"),
    "/root/reference/sequences",
]


@dataclasses.dataclass
class BAProblem:
    """A bundle-adjustment problem instance (host-side, NumPy)."""

    n_keyframes: int
    n_points: int
    n_edges: int
    k: np.ndarray            # [3, 3] intrinsics
    cam_idx: np.ndarray      # [E] uint32
    lmk_idx: np.ndarray      # [E] uint32
    measurements: np.ndarray  # [E, 2] float
    cam_means: np.ndarray    # [C, 6] float — initial pose parameters
    lmk_means: np.ndarray    # [L, 3] float — initial landmark positions

    @property
    def n_edges_per_kf(self) -> np.ndarray:
        return np.bincount(self.cam_idx, minlength=self.n_keyframes)

    @property
    def n_edges_per_lmk(self) -> np.ndarray:
        return np.bincount(self.lmk_idx, minlength=self.n_points)


def find_sequence(name: str) -> str:
    """Resolve a sequence name (e.g. 'fr1xyz') to a file path."""
    if os.path.exists(name):
        return name
    fname = name if name.endswith(".txt") else name + ".txt"
    for d in _SEQUENCE_DIRS:
        if d and os.path.exists(os.path.join(d, fname)):
            return os.path.join(d, fname)
    raise FileNotFoundError(
        f"sequence '{name}' not found in {_SEQUENCE_DIRS}; "
        "set GBP_SEQUENCES_DIR"
    )


def _load_native(path: str) -> BAProblem | None:
    try:
        from ..native import balio_native
    except Exception:
        return None
    return balio_native.load(path)


def load_bal(path_or_name: str, use_native: bool = True) -> BAProblem:
    """Load a BAL-format file into a BAProblem."""
    path = find_sequence(path_or_name)
    if use_native:
        problem = _load_native(path)
        if problem is not None:
            return problem
    # np.fromfile with sep=' ' tokenises on any whitespace — one pass, no
    # Python-level line loop.
    tokens = np.fromfile(path, dtype=np.float64, sep=" ")
    return _from_tokens(tokens, path)


def _from_tokens(tokens: np.ndarray, path: str) -> BAProblem:
    n_kf, n_pts, n_edges = (int(tokens[i]) for i in range(3))
    fx, fy, cx, cy = tokens[3:7]
    k = np.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], np.float64)

    edge_block = tokens[7 : 7 + 4 * n_edges].reshape(n_edges, 4)
    cam_idx = edge_block[:, 0].astype(np.uint32)
    lmk_idx = edge_block[:, 1].astype(np.uint32)
    measurements = edge_block[:, 2:4].astype(np.float64)

    params = tokens[7 + 4 * n_edges :]
    n_params = 6 * n_kf + 3 * n_pts
    if params.size < n_params:
        raise ValueError(f"{path}: expected {n_params} parameters, got {params.size}")
    cam_means = params[: 6 * n_kf].reshape(n_kf, 6)
    lmk_means = params[6 * n_kf : n_params].reshape(n_pts, 3)

    return BAProblem(
        n_keyframes=n_kf,
        n_points=n_pts,
        n_edges=n_edges,
        k=k,
        cam_idx=cam_idx,
        lmk_idx=lmk_idx,
        measurements=measurements,
        cam_means=cam_means.copy(),
        lmk_means=lmk_means.copy(),
    )


def save_bal(path: str, problem: BAProblem) -> None:
    """Write a BAProblem back out in BAL format."""
    with open(path, "w") as f:
        f.write(f"{problem.n_keyframes} {problem.n_points} {problem.n_edges}\n")
        k = problem.k
        f.write(f"{k[0, 0]:.9f} {k[1, 1]:.9f} {k[0, 2]:.9f} {k[1, 2]:.9f}\n")
        for c, l, (u, v) in zip(problem.cam_idx, problem.lmk_idx, problem.measurements):
            f.write(f"{c} {l}\t{u:.6e} {v:.6e}\n")
        for row in problem.cam_means:
            f.write("\n".join(f"{x:.16e}" for x in row) + "\n")
        for row in problem.lmk_means:
            f.write("\n".join(f"{x:.16e}" for x in row) + "\n")


def synthetic_problem(
    n_keyframes: int = 6,
    n_points: int = 60,
    seed: int = 0,
    obs_per_lmk: int = 3,
    image_size: tuple[int, int] = (640, 480),
    pixel_noise: float = 0.0,
) -> BAProblem:
    """Generate a consistent synthetic BA problem for tests.

    Cameras on an arc looking at a cloud of points in front of them;
    measurements are exact projections plus optional pixel noise.
    """
    rng = np.random.default_rng(seed)
    fx = fy = 500.0
    cx, cy = image_size[0] / 2, image_size[1] / 2
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    # Points in a box in front of the cameras (world frame).
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n_points, 3))

    # Cameras: small lateral offsets, looking down +z with tiny rotations.
    cams = np.zeros((n_keyframes, 6))
    cams[:, 0] = np.linspace(-1.0, 1.0, n_keyframes)          # x translation
    cams[:, 1] = rng.normal(0, 0.05, n_keyframes)
    cams[:, 2] = rng.normal(0, 0.05, n_keyframes)
    cams[:, 3:] = rng.normal(0, 0.03, (n_keyframes, 3))       # small rotations

    # Project with a local numpy implementation of the measurement model.
    def so3exp_np(w):
        theta = np.linalg.norm(w)
        if theta < 1e-9:
            return np.eye(3)
        w_hat = np.array(
            [[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]]
        )
        return (
            np.eye(3)
            + np.sin(theta) / theta * w_hat
            + (1 - np.cos(theta)) / theta**2 * (w_hat @ w_hat)
        )

    cam_idx, lmk_idx, meas = [], [], []
    for l in range(n_points):
        # observed by `obs_per_lmk` nearest cameras (by index ring)
        start = l % n_keyframes
        for j in range(min(obs_per_lmk, n_keyframes)):
            c = (start + j) % n_keyframes
            r = so3exp_np(cams[c, 3:])
            p = r @ pts[l] + cams[c, :3]
            if p[2] <= 0.1:
                continue
            u = fx * p[0] / p[2] + cx
            v = fy * p[1] / p[2] + cy
            cam_idx.append(c)
            lmk_idx.append(l)
            meas.append([u, v])
    meas = np.asarray(meas)
    if pixel_noise > 0:
        meas = meas + rng.normal(0, pixel_noise, meas.shape)

    order = np.argsort(np.asarray(cam_idx), kind="stable")
    return BAProblem(
        n_keyframes=n_keyframes,
        n_points=n_points,
        n_edges=len(cam_idx),
        k=k,
        cam_idx=np.asarray(cam_idx, np.uint32)[order],
        lmk_idx=np.asarray(lmk_idx, np.uint32)[order],
        measurements=meas[order],
        cam_means=cams,
        lmk_means=pts,
    )


def synthetic_problem_large(
    n_keyframes: int = 1723,
    n_points: int = 156_000,
    obs_per_lmk: int = 7,
    seed: int = 0,
    pixel_noise: float = 0.5,
) -> BAProblem:
    """Fully-vectorised generator for Ladybug-scale problems (~1M edges).

    Cameras along a line looking down +z at a deep point cloud; each
    landmark observed by `obs_per_lmk` consecutive keyframes (a trajectory
    visibility pattern, like the BAL Ladybug sequences). Unlike
    :func:`synthetic_problem` there is no per-edge Python loop, so building
    a million-edge problem takes ~1 s.
    """
    rng = np.random.default_rng(seed)
    fx = fy = 500.0
    cx, cy = 320.0, 240.0
    k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    cams = np.zeros((n_keyframes, 6))
    cams[:, 0] = np.linspace(0.0, 0.02 * n_keyframes, n_keyframes)
    cams[:, 1] = rng.normal(0, 0.05, n_keyframes)
    cams[:, 2] = rng.normal(0, 0.05, n_keyframes)
    cams[:, 3:] = rng.normal(0, 0.02, (n_keyframes, 3))

    # landmark l lives near the cameras that see it
    anchor = (np.arange(n_points) * max(1, n_keyframes - obs_per_lmk)
              // max(1, n_points - 1)).astype(np.int64)
    anchor = np.minimum(anchor, n_keyframes - obs_per_lmk)
    pts = np.empty((n_points, 3))
    pts[:, 0] = cams[anchor, 0] + rng.uniform(-2, 2, n_points)
    pts[:, 1] = rng.uniform(-2, 2, n_points)
    pts[:, 2] = rng.uniform(4, 8, n_points)

    # edges: landmark l observed by keyframes anchor..anchor+obs-1
    lmk_idx = np.repeat(np.arange(n_points, dtype=np.uint32), obs_per_lmk)
    cam_idx = (np.repeat(anchor, obs_per_lmk)
               + np.tile(np.arange(obs_per_lmk), n_points)).astype(np.uint32)

    # vectorised projection (batched Rodrigues via the JAX ops would pull in
    # a device; keep it NumPy)
    w = cams[cam_idx, 3:]
    theta = np.linalg.norm(w, axis=1, keepdims=True)
    theta = np.where(theta < 1e-12, 1e-12, theta)
    axis = w / theta
    ct, st = np.cos(theta), np.sin(theta)
    y = pts[lmk_idx]
    # Rodrigues: R y = y ct + (axis x y) st + axis (axis.y)(1-ct)
    cross = np.cross(axis, y)
    dot = np.sum(axis * y, axis=1, keepdims=True)
    y_rot = y * ct + cross * st + axis * dot * (1 - ct)
    y_cf = y_rot + cams[cam_idx, :3]
    z = np.maximum(y_cf[:, 2], 1e-3)
    meas = np.stack([fx * y_cf[:, 0] / z + cx, fy * y_cf[:, 1] / z + cy], 1)
    if pixel_noise > 0:
        meas = meas + rng.normal(0, pixel_noise, meas.shape)

    return BAProblem(
        n_keyframes=n_keyframes, n_points=n_points, n_edges=len(cam_idx),
        k=k, cam_idx=cam_idx, lmk_idx=lmk_idx, measurements=meas,
        cam_means=cams, lmk_means=pts,
    )
