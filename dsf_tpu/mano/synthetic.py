"""Deterministic synthetic MANO-like asset for tests and benchmarks.

The real MANO_RIGHT.pkl is license-gated and not shipped; this builds a
structurally-valid substitute (same shapes/topology constraints as the
real model: 778 verts, 1538 faces, 16 kinematic joints, 45-D PCA pose,
10-D shape) with a plausible hand-like skeleton so LBS output looks like
a hand at the right scale (~0.1 units before the x1000 mm conversion,
matching real MANO's meter scale).
"""

from __future__ import annotations

import numpy as np

# Standard MANO kinematic tree (wrist, index x3, middle x3, pinky x3,
# ring x3, thumb x3) — matches kintree_table[0] of the real model.
PARENTS = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14], dtype=np.int32)

N_VERTS = 778
N_FACES = 1538
N_JOINTS = 16


def _skeleton():
    """A plausible right-hand rest skeleton in meters (y-up-ish, palm ~9cm)."""
    J = np.zeros((N_JOINTS, 3))
    # fingers: index, middle, pinky, ring, thumb root directions
    roots = {
        1: (0.025, 0.09), 4: (0.0, 0.095), 7: (-0.045, 0.08),
        10: (-0.022, 0.09), 13: (0.045, 0.03),
    }
    seg = {1: 0.032, 4: 0.034, 7: 0.024, 10: 0.030, 13: 0.030}
    for root, (x, y) in roots.items():
        d = np.array([x, y, 0.0])
        d = d / np.linalg.norm(d)
        base = np.array([x, y, 0.0])
        J[root] = base
        J[root + 1] = base + d * seg[root]
        J[root + 2] = base + d * seg[root] * 1.8
    return J


def build_synthetic_mano(seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)
    J = _skeleton()

    # scatter vertices as blobs around bones
    verts = []
    counts = np.full(N_JOINTS, N_VERTS // N_JOINTS)
    counts[0] += N_VERTS - counts.sum()
    for j in range(N_JOINTS):
        c = J[j]
        radius = 0.035 if j == 0 else 0.012
        verts.append(c + rng.randn(counts[j], 3) * radius)
    v_template = np.concatenate(verts, axis=0).astype(np.float32)

    # skinning weights: softmax of negative distance to joints
    d = np.linalg.norm(v_template[:, None, :] - J[None, :, :], axis=-1)
    w = np.exp(-d / 0.01)
    weights = (w / w.sum(axis=1, keepdims=True)).astype(np.float32)

    # joint regressor: uniform over the 20 nearest verts of each joint
    J_regressor = np.zeros((N_JOINTS, N_VERTS), dtype=np.float32)
    for j in range(N_JOINTS):
        idx = np.argsort(d[:, j])[:20]
        J_regressor[j, idx] = 1.0 / 20.0

    shapedirs = (rng.randn(N_VERTS, 3, 10) * 0.001).astype(np.float32)
    posedirs = (rng.randn(N_VERTS, 3, 135) * 0.0005).astype(np.float32)
    hands_components = (rng.randn(45, 45) * 0.1).astype(np.float32)
    hands_mean = (rng.randn(45) * 0.05).astype(np.float32)

    # LOCAL triangles over nearest neighbors: the real MANO mesh's faces
    # span a few mm each, and spatial culling (the binned rasterizer's
    # per-tile face lists) depends on that locality — random vertex
    # triples would make every face cover the whole hand and defeat it.
    # Distinct indices per face (kNN excludes self), non-degenerate with
    # probability 1 (random blob positions are never exactly collinear),
    # matching the Pallas distance kernel's documented precondition.
    from scipy.spatial import cKDTree
    nb = cKDTree(v_template).query(v_template, k=6)[1]
    faces = np.concatenate([
        np.stack([np.arange(N_VERTS), nb[:, 1], nb[:, 2]], axis=1),
        np.stack([np.arange(N_VERTS), nb[:, 3], nb[:, 4]], axis=1),
    ], axis=0)[:N_FACES].astype(np.int32)
    kintree_table = np.stack(
        [PARENTS.astype(np.int64) % (1 << 32), np.arange(N_JOINTS)], axis=0
    ).astype(np.int64)
    kintree_table[0, 0] = 4294967295  # root marker as in the real pkl

    return {
        "v_template": v_template,
        "shapedirs": shapedirs,
        "J_regressor": J_regressor,  # raw (16, 778) layout, as in the real pkl
        "hands_components": hands_components,
        "hands_mean": hands_mean,
        "posedirs": posedirs,
        "kintree_table": kintree_table.astype(np.int32),
        "weights": weights,
        "f": faces,
    }


def save_synthetic_mano(npz_path: str, seed: int = 0):
    np.savez(npz_path, **build_synthetic_mano(seed))
    return npz_path


def save_synthetic_mano_pkl(pkl_path: str, seed: int = 0):
    """Write the same synthetic asset in the ORIGINAL MANO pickle layout
    (J_regressor as a scipy sparse (16, 778) matrix, float64 fields,
    kintree_table (2, 16) with the uint32 root marker) so the reference
    implementation (render_model/mano_layer.py:97-148 loads it with
    pickle(encoding='latin1')) can consume it for A/B parity tests."""
    import pickle

    from scipy import sparse

    d = build_synthetic_mano(seed)
    model = {
        "v_template": d["v_template"].astype(np.float64),
        "shapedirs": d["shapedirs"].astype(np.float64),
        "J_regressor": sparse.csc_matrix(d["J_regressor"].astype(np.float64)),
        "hands_components": d["hands_components"].astype(np.float64),
        "hands_mean": d["hands_mean"].astype(np.float64),
        "posedirs": d["posedirs"].astype(np.float64),
        "kintree_table": d["kintree_table"].astype(np.int64),
        "weights": d["weights"].astype(np.float64),
        "f": d["f"].astype(np.int64),
    }
    model["kintree_table"][0, 0] = 4294967295
    with open(pkl_path, "wb") as f:
        pickle.dump(model, f, protocol=2)
    return pkl_path
