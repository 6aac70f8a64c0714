"""Import machinery for A/B parity tests against the ACTUAL reference code.

The reference at /root/reference depends on CUDA-only packages absent
here (pytorch3d, torchvision) and pre-2.0 numpy aliases; this injects
minimal stubs so its pure-torch modules (MANO_SMPL, GFM, SmoothL1Loss,
the crop pipeline, MANO_OCR) import and execute on CPU.  The stubs are
never exercised by the tested code paths.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference"


def _mk_module(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


class _StubClass:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):  # pragma: no cover - never exercised
        raise NotImplementedError("pytorch3d stub")


def install_stubs():
    # numpy 2.0 removed the builtin aliases the reference uses
    for name, val in (("float", float), ("int", int), ("bool", bool),
                      ("object", object), ("long", int), ("str", str)):
        if not hasattr(np, name):
            setattr(np, name, val)

    if "prefetch_generator" not in sys.modules:
        pg = _mk_module("prefetch_generator")
        pg.BackgroundGenerator = _StubClass

    if "torchvision" not in sys.modules:
        tv = _mk_module("torchvision")
        ops = _mk_module("torchvision.ops")
        ops.RoIAlign = _StubClass
        tv.ops = ops

    if "pytorch3d" not in sys.modules:
        p3d = _mk_module("pytorch3d")
        renderer = _mk_module("pytorch3d.renderer")
        for cls in ("PerspectiveCameras", "RasterizationSettings",
                    "MeshRasterizer", "Textures", "TexturesVertex",
                    "MeshRenderer", "BlendParams"):
            setattr(renderer, cls, type(cls, (_StubClass,), {}))
        renderer.softmax_rgb_blend = _StubClass()
        structures = _mk_module("pytorch3d.structures")
        meshes = _mk_module("pytorch3d.structures.meshes")
        meshes.Meshes = type("Meshes", (_StubClass,), {})
        structures.meshes = meshes
        structures.Pointclouds = type("Pointclouds", (_StubClass,), {})
        structures.Meshes = meshes.Meshes
        loss = _mk_module("pytorch3d.loss")
        loss.chamfer_distance = _StubClass()
        loss.point_mesh_distance = _mk_module("pytorch3d.loss.point_mesh_distance")
        p3d_ops = _mk_module("pytorch3d.ops")
        p3d_ops.sample_points_from_meshes = _StubClass()
        _c = _mk_module("pytorch3d._C")
        for fn in ("point_face_dist_forward", "point_face_dist_backward",
                   "face_point_dist_forward", "face_point_dist_backward",
                   "point_edge_dist_forward", "point_edge_dist_backward",
                   "edge_point_dist_forward", "edge_point_dist_backward"):
            setattr(_c, fn, _StubClass())
        p3d.renderer = renderer
        p3d.structures = structures
        p3d.loss = loss
        p3d.ops = p3d_ops
        p3d._C = _c


def load_reference_module(relpath: str, name: str):
    """Import a reference source file by path (package-style imports
    inside it resolve against /root/reference on sys.path)."""
    install_stubs()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if name in sys.modules:
        return sys.modules[name]
    # matplotlib without a display
    import matplotlib
    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
