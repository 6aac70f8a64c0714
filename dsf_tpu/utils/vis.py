"""Visualization utilities: per-dataset skeleton/color tables, 2D pose
overlays, segmentation colormaps, point-cloud projections, image-grid
stacking, mesh obj export.

Covers the used surface of the reference's util/vis_tool.py:
get_sketch_setting (:238) / get_joint_color (:535) / get_sketch_color
(:490), draw_pose (:604) and its variants (:583-671), draw_pcl (:672),
draw_2d_pose (:914), stack/muti-pic grids (:922-976), Matr/rotate_pcl
(:978-1009), segmentation colormaps (:1230-1355), debug_mesh (:721).

Color values and topology tables are semantic constants and match the
reference exactly (asserted against the live reference module in
tests/test_vis_tables.py); the drawing code around them is rewritten
numpy/cv2-first with no torch dependency.
"""

from __future__ import annotations

import numpy as np

# BGR palettes (ref: Color / Finger_color enums, vis_tool.py:470-487)
COLOR = {
    "RED": (0, 0, 255), "GREEN": (75, 255, 66), "BLUE": (255, 0, 0),
    "YELLOW": (204, 153, 17), "PURPLE": (255, 255, 0),
    "CYAN": (255, 0, 255), "BROWN": (204, 153, 17),
}
FINGER_COLOR = {
    "THUMB": (0, 0, 255), "INDEX": (75, 255, 66), "MIDDLE": (255, 0, 0),
    "RING": (17, 240, 244), "LITTLE": (255, 255, 0),
    "WRIST": (255, 0, 255), "ROOT": (255, 0, 255),
}

# skeleton edges per dataset joint ordering (ref: get_sketch_setting,
# vis_tool.py:238-278; MANO = the reference's fall-through branch,
# thumb chain first)
SKETCH = {
    "MANO": [(0, 13), (13, 14), (14, 15), (15, 20),
             (0, 1), (1, 2), (2, 3), (3, 16),
             (0, 4), (4, 5), (5, 6), (6, 17),
             (0, 10), (10, 11), (11, 12), (12, 19),
             (0, 7), (7, 8), (8, 9), (9, 18)],
    "hands": [(0, 1), (0, 2), (0, 3), (0, 4), (0, 5),
              (1, 6), (6, 7), (7, 8),
              (2, 9), (9, 10), (10, 11),
              (3, 12), (12, 13), (13, 14),
              (4, 15), (15, 16), (16, 17),
              (5, 18), (18, 19), (19, 20)],
    "nyu": [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9), (9, 10),
            (1, 13), (3, 13), (5, 13), (7, 13), (10, 13), (11, 13), (12, 13)],
    "icvl": [(0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6),
             (0, 7), (7, 8), (8, 9), (0, 10), (10, 11), (11, 12),
             (0, 13), (13, 14), (14, 15)],
    "msra": [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 6), (6, 7), (7, 8),
             (0, 9), (9, 10), (10, 11), (11, 12),
             (0, 13), (13, 14), (14, 15), (15, 16),
             (0, 17), (17, 18), (18, 19), (19, 20)],
    "itop": [(0, 1), (1, 2), (2, 4), (4, 6), (1, 3), (3, 5), (5, 7),
             (1, 8), (8, 9), (9, 11), (11, 13), (8, 10), (10, 12), (12, 14)],
    "shrec": [(0, 1),
              (0, 2), (2, 3), (3, 4), (4, 5),
              (0, 6), (6, 7), (7, 8), (8, 9),
              (0, 10), (10, 11), (11, 12), (12, 13),
              (0, 14), (14, 15), (15, 16), (16, 17),
              (0, 18), (18, 19), (19, 20), (20, 21)],
}
SKETCH["dhg"] = SKETCH["shrec"]
SKETCH["FHAD"] = SKETCH["hands"]


def get_sketch_setting(dataset):
    """Edge list for a dataset's joint order (ref: vis_tool.py:238)."""
    return SKETCH.get(dataset, SKETCH["MANO"])


def _expand(spec):
    """"THUMB*3 INDEX" -> [THUMB, THUMB, THUMB, INDEX]."""
    out = []
    for tok in spec.split():
        name, _, rep = tok.partition("*")
        out.extend([name] * (int(rep) if rep else 1))
    return out


# per-joint finger assignment per dataset (ref: get_joint_color,
# vis_tool.py:535-583; MANO = the fall-through branch)
_JOINT_FINGER = {
    "MANO": _expand("ROOT INDEX*3 MIDDLE*3 LITTLE*3 RING*3 THUMB*3 "
                    "INDEX MIDDLE LITTLE RING THUMB"),
    "hands": _expand("ROOT THUMB INDEX MIDDLE RING LITTLE "
                     "THUMB*3 INDEX*3 MIDDLE*3 RING*3 LITTLE*3"),
    "nyu": _expand("LITTLE*2 RING*2 MIDDLE*2 INDEX*2 THUMB*3 WRIST*3"),
    "icvl": _expand("ROOT THUMB*3 INDEX*3 MIDDLE*3 RING*3 LITTLE*3"),
    "msra": _expand("WRIST INDEX*4 MIDDLE*4 RING*4 LITTLE*4 THUMB*4"),
    "shrec": _expand("ROOT*2 THUMB*4 INDEX*4 MIDDLE*4 RING*4 LITTLE*4"),
}
_JOINT_FINGER["dhg"] = _JOINT_FINGER["shrec"]
_JOINT_FINGER["FHAD"] = _JOINT_FINGER["hands"]

# per-EDGE finger assignment (ref: get_sketch_color, vis_tool.py:490-533
# — given explicitly per dataset, not derived from the edges)
_SKETCH_FINGER = {
    "MANO": _expand("THUMB*4 INDEX*4 MIDDLE*4 RING*4 LITTLE*4"),
    "hands": _expand("THUMB INDEX MIDDLE RING LITTLE "
                     "THUMB*3 INDEX*3 MIDDLE*3 RING*3 LITTLE*3"),
    "nyu": _expand("LITTLE RING MIDDLE INDEX THUMB*2 "
                   "LITTLE RING MIDDLE INDEX THUMB*2 WRIST*2"),
    "icvl": _expand("THUMB*3 INDEX*3 MIDDLE*3 RING*3 LITTLE*3"),
    "msra": _expand("INDEX*4 MIDDLE*4 RING*4 LITTLE*4 THUMB*4"),
    "shrec": _expand("ROOT THUMB*4 INDEX*4 MIDDLE*4 RING*4 LITTLE*4"),
}
_SKETCH_FINGER["dhg"] = _SKETCH_FINGER["shrec"]
_SKETCH_FINGER["FHAD"] = _SKETCH_FINGER["hands"]


def get_joint_color(dataset):
    """Per-joint BGR colors (ref: get_joint_color, vis_tool.py:535)."""
    names = _JOINT_FINGER.get(dataset, _JOINT_FINGER["MANO"])
    return [FINGER_COLOR[n] for n in names]


def get_sketch_color(dataset):
    """Per-edge BGR colors (ref: get_sketch_color, vis_tool.py:490)."""
    names = _SKETCH_FINGER.get(dataset, _SKETCH_FINGER["MANO"])
    return [FINGER_COLOR[n] for n in names]


# ---------------------------------------------------------------------------
# segmentation colormaps (ref: vis_tool.py:1230-1355).  Each table ends
# with the reference's appended [0, 0, 0] row.
# ---------------------------------------------------------------------------

def _colormap(rows):
    return np.array(list(rows) + [(0, 0, 0)])


def get_segment_finger_color():
    """7-class per-finger colormap: palm, index, middle, ring(id 4),
    little(id 3), thumb, background (ref: get_segmentFingerColor,
    vis_tool.py:1230)."""
    return _colormap([
        (255, 255, 255), FINGER_COLOR["INDEX"], FINGER_COLOR["MIDDLE"],
        FINGER_COLOR["RING"], FINGER_COLOR["LITTLE"], FINGER_COLOR["THUMB"],
        (255, 255, 255)])


def get_segment_joint_color():
    """22-class per-bone colormap in MANO part order: palm, 15 finger
    segments (index/middle/little/ring/thumb x root/pip/dip), 5 tips,
    background (ref: get_segmentJointColor, vis_tool.py:1247)."""
    return _colormap([
        (255, 255, 255),
        (0, 255, 0), (0, 205, 0), (0, 155, 0),          # index
        (0, 0, 255), (0, 0, 205), (0, 0, 155),          # middle
        (0, 104, 139), (0, 154, 205), (0, 178, 238),    # little
        (255, 255, 0), (205, 205, 0), (155, 155, 0),    # ring
        (105, 0, 0), (155, 0, 0), (205, 0, 0),          # thumb
        (0, 105, 0), (0, 0, 105), (0, 191, 255),        # tips: index/middle/
        (105, 105, 0), (255, 0, 0),                     #   little/ring/thumb
        (255, 255, 255)])                               # background


def get_nyu_segment_joint_color():
    """13-class NYU-order colormap (ref: get_nyu_segmentJointColor,
    vis_tool.py:1284)."""
    return _colormap([
        (0, 104, 139), (0, 178, 238),                   # little root/dip
        (255, 255, 0), (155, 155, 0),                   # ring
        (0, 0, 255), (0, 0, 155),                       # middle
        (0, 255, 0), (0, 155, 0),                       # index
        (255, 0, 0), (205, 0, 0), (155, 0, 0),          # thumb root/pip/dip
        (0, 0, 0),                                      # palm
        (255, 255, 255)])                               # background


def get_segment_bk_color():
    """hand/background colormap (ref: get_segmentBKColor, :1344)."""
    return _colormap([(0, 0, 0), (255, 255, 255)])


_SEGMENT_TABLES = {
    "bk": get_segment_bk_color,
    "finger": get_segment_finger_color,
    "joint": get_segment_joint_color,
    "nyu": get_nyu_segment_joint_color,
}


def vis_segment(segment, type="joint", batch_index=0, data_dir=None,
                name="pred", batch_size=None):
    """(B, H, W) integer part maps -> (B, H, W, 3) uint8 color renders,
    optionally written as segment_<name>_<i>.png (ref: vis_segment,
    vis_tool.py:1356)."""
    seg = np.asarray(segment).astype(np.int64)
    table = _SEGMENT_TABLES[type]()
    imgs = table[np.clip(seg, 0, len(table) - 1)].astype(np.uint8)
    if data_dir is not None:
        import cv2
        bs = batch_size or imgs.shape[0]
        for i in range(imgs.shape[0]):
            cv2.imwrite(f"{data_dir}/segment_{name}_{bs * batch_index + i}.png",
                        imgs[i])
    return imgs


def segmentation_overlay(seg_img, type="joint"):
    """(H, W) part ids -> BGR uint8 via the reference colormap."""
    table = _SEGMENT_TABLES[type]()
    return table[np.clip(np.asarray(seg_img), 0, len(table) - 1)].astype(
        np.uint8)


# ---------------------------------------------------------------------------
# 2D drawing
# ---------------------------------------------------------------------------

def depth_to_u8(img):
    """Normalized depth [-1, 1] -> grayscale uint8 (background white)."""
    img = np.asarray(img).squeeze()
    return ((img + 1.0) / 2.0 * 255.0).clip(0, 255).astype(np.uint8)


def draw_2d_pose(img, joint_uvd, dataset="MANO"):
    """Overlay a normalized-uvd skeleton on a depth crop; returns an RGB
    uint8 image (ref: draw_2d_pose, vis_tool.py:914)."""
    try:
        import cv2  # noqa: F401
    except Exception:                                # pragma: no cover
        return np.stack([depth_to_u8(img)] * 3, -1)
    canvas = np.stack([depth_to_u8(img)] * 3, -1).copy()
    h, w = canvas.shape[:2]
    uv = ((np.asarray(joint_uvd)[:, :2] + 1) / 2 * np.array([w, h])).astype(int)
    return draw_pose(dataset, canvas, uv)


def draw_pose(dataset, img, pose, scale=1):
    """Pixel-coordinate pose overlay with per-finger joint/bone colors
    (ref: draw_pose, vis_tool.py:604-621).  Mutates and returns img."""
    import cv2
    pose = np.asarray(pose)
    colors_joint = get_joint_color(dataset)
    for idx, pt in enumerate(pose[:len(colors_joint)]):
        cv2.circle(img, (int(pt[0]), int(pt[1])), 2 * scale,
                   colors_joint[idx], -1)
    colors = get_sketch_color(dataset)
    for idx, (a, b) in enumerate(get_sketch_setting(dataset)):
        if a >= pose.shape[0] or b >= pose.shape[0]:
            break
        cv2.line(img, (int(pose[a, 0]), int(pose[a, 1])),
                 (int(pose[b, 0]), int(pose[b, 1])), colors[idx], scale)
    return img


def draw_point(dataset, img, pose, radius=3):
    """Plain dots, root color, no skeleton (ref: draw_point, :583)."""
    import cv2
    c = get_joint_color(dataset)[0]
    for pt in np.asarray(pose):
        cv2.circle(img, (int(pt[0]), int(pt[1])), radius, c, -1)
    return img


def draw_coll_pose(dataset, img, pose):
    """Skeleton with sphere sites at each bone's 0, 1/3, 2/3 fractions —
    the collision-sphere layout view (ref: draw_coll_pose, :592)."""
    import cv2
    pose = np.asarray(pose, np.float64)
    for a, b in get_sketch_setting(dataset):
        s, e = pose[a], pose[b]
        cv2.line(img, (int(s[0]), int(s[1])), (int(e[0]), int(e[1])),
                 (0, 0, 0), 3)
        for t in (0.0, 1.0, 1 / 3, 2 / 3):
            p = s + (e - s) * t
            cv2.circle(img, (int(p[0]), int(p[1])), 6, (255, 0, 0), -1)
    return img


def draw_conf(dataset, img, pose, confi):
    """Joint dots sized by per-joint confidence (ref: draw_conf, :624)."""
    import cv2
    pose = np.asarray(pose)
    colors_joint = get_joint_color(dataset)
    for idx, pt in enumerate(pose[:len(colors_joint)]):
        cv2.circle(img, (int(pt[0]), int(pt[1])),
                   1 + int(float(confi[idx]) * 5), colors_joint[idx], -1)
    colors = get_sketch_color(dataset)
    for idx, (a, b) in enumerate(get_sketch_setting(dataset)):
        if a >= pose.shape[0] or b >= pose.shape[0]:
            break
        cv2.line(img, (int(pose[a, 0]), int(pose[a, 1])),
                 (int(pose[b, 0]), int(pose[b, 1])), colors[idx], 2)
    return img


def draw_visible(dataset, img, pose, visible):
    """Red = occluded, blue = visible joints over a brown skeleton
    (ref: draw_visible, :658)."""
    import cv2
    pose = np.asarray(pose)
    vis_color = [COLOR["RED"], COLOR["BLUE"]]
    for idx, pt in enumerate(pose):
        cv2.circle(img, (int(pt[0]), int(pt[1])), 3,
                   vis_color[int(visible[idx])], -1)
    for a, b in get_sketch_setting(dataset):
        cv2.line(img, (int(pose[a, 0]), int(pose[a, 1])),
                 (int(pose[b, 0]), int(pose[b, 1])), COLOR["BROWN"], 1)
    return img


def draw_pcl(pcl, img_size, background_value=1.0):
    """Project normalized clouds (B, P, 3) in [-1, 1] onto (B, 1, S, S)
    silhouette images: occupied pixels -1, background +1 (ref: draw_pcl,
    vis_tool.py:672)."""
    pcl = np.asarray(pcl)
    B = pcl.shape[0]
    imgs = np.full((B, img_size, img_size), background_value, np.float32)
    ix = np.clip(np.floor((pcl[..., 0] + 1) / 2 * img_size), 0,
                 img_size - 1).astype(np.int64)
    iy = np.clip(np.floor((pcl[..., 1] + 1) / 2 * img_size), 0,
                 img_size - 1).astype(np.int64)
    for b in range(B):
        imgs[b, iy[b], ix[b]] = -1.0
    return imgs[:, None]


def rot_matrix(axis, theta):
    """4x4 homogeneous rotation about x/y/z (axis 0/1/2) or translation
    along axis-3 (ref: Matr, vis_tool.py:978 — note the reference's
    y-rotation uses the same sign layout as x/z)."""
    m = np.eye(4, dtype=np.float32)
    c, s = np.cos(theta), np.sin(theta)
    if axis == 0:
        m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
    elif axis == 1:
        m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, -s, s, c
    elif axis == 2:
        m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
    else:
        m[axis - 3, 3] = theta
    return m


def rotate_pcl(pcl, rot):
    """Rotate homogeneous clouds by per-axis angles, z then x then y —
    the reference's composition order (ref: rotate_pcl, :1000)."""
    pcl = np.asarray(pcl)
    B, P, _ = pcl.shape
    h = np.concatenate([pcl, np.ones((B, P, 1), pcl.dtype)], -1)
    for axis in (2, 0, 1):
        h = h @ rot_matrix(axis, rot[axis]).T
    return h


# ---------------------------------------------------------------------------
# image-grid stacking (ref: vis_tool.py:922-976)
# ---------------------------------------------------------------------------

def stack_row_pic(batch_img_list):
    """(L, B, H, W[, C]) -> (B, H, L*W[, C]) horizontal strips."""
    arr = np.asarray(batch_img_list)
    return np.stack([np.hstack(list(arr[:, b])) for b in
                     range(arr.shape[1])], 0)


def stack_col_pic(batch_img_list):
    """(L, B, H, W[, C]) -> (B, L*H, W[, C]) vertical strips."""
    arr = np.asarray(batch_img_list)
    return np.stack([np.concatenate(list(arr[:, b]), 0) for b in
                     range(arr.shape[1])], 0)


def draw_muti_pic(batch_img_list, index=0, data_dir=None, name="grid",
                  text=None, save=False, max_col=7):
    """Tile a list of per-batch images into a row-major grid, wrapping
    every max_col; optionally annotate + write per sample (ref:
    draw_muti_pic, vis_tool.py:948).  Returns the last sample's grid."""
    batch_size = batch_img_list[0].shape[0]
    imgs = None
    for b in range(batch_size):
        rows, cur = [], []
        for i, im in enumerate(batch_img_list):
            cur.append(np.asarray(im[b]).squeeze())
            if (i + 1) % max_col == 0:
                rows.append(np.hstack(cur))
                cur = []
        if cur and not rows:
            imgs = np.hstack(cur)
        else:
            if cur:
                pad = [np.ones_like(cur[0])] * (max_col - len(cur))
                rows.append(np.hstack(cur + pad))
            imgs = np.concatenate(rows, 0)
        if text is not None or data_dir is not None:
            import cv2
            if text is not None:
                imgs = np.ascontiguousarray(imgs)
                cv2.putText(imgs, text[b], (15, 15),
                            cv2.FONT_HERSHEY_COMPLEX, 0.5,
                            (100, 200, 200), 1)
            if save and data_dir is not None:
                cv2.imwrite(f"{data_dir}/{name}_{batch_size * index + b}.png",
                            imgs)
    return imgs


def draw_batch_img(batch_img, index, data_dir, name):
    """Write each sample of a (B, H, W[, C]) batch as its own png
    (ref: draw_batch_img, vis_tool.py:972)."""
    import cv2
    batch_img = np.asarray(batch_img)
    B = batch_img.shape[0]
    for b in range(B):
        cv2.imwrite(f"{data_dir}/{B * index + b}_{name}.png", batch_img[b])


def save_result_img(index, root_dir, pic_dir, pose, dataset="MANO"):
    """Overlay a result pose on <root>/convert/<i>.jpg and save (ref:
    save_result_img, vis_tool.py:82)."""
    import cv2
    img = cv2.imread(f"{root_dir}/convert/{index}.jpg", 0)
    img = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
    draw_pose(dataset, img, pose)
    cv2.imwrite(f"{pic_dir}/{index}.png", img)


def save_obj(path, verts, faces):
    """Dump a mesh as .obj (ref: debug_mesh, vis_tool.py:721)."""
    with open(path, "w") as f:
        for v in np.asarray(verts):
            f.write(f"v {v[0]:.4f} {v[1]:.4f} {v[2]:.4f}\n")
        for tri in np.asarray(faces).astype(int) + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")
