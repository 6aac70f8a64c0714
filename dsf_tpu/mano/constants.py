"""MANO-related static tables: joint-order transfer maps and topology.

Joint order transfer maps between MANO's 21-joint skeleton (16 kinematic
joints + 5 fingertip vertices) and each dataset's native ordering
(ref: render_model/mano_layer.py:36-81).
"""

import numpy as np

# MANO joint index -> BigHand(hands20) ordering (21 joints)
MANO2HANDS = [0, 13, 1, 4, 10, 7, 14, 15, 20, 2, 3, 16, 5, 6, 17, 11, 12, 19, 8, 9, 18]

# MANO -> MSRA (21 joints: wrist, index, middle, ring, pinky, thumb chains)
MANO2MSRA = [
    0,
    1, 2, 3, 16,
    4, 5, 6, 17,
    10, 11, 12, 19,
    7, 8, 9, 18,
    13, 14, 15, 20,
]

# MANO -> ICVL (16 joints)
MANO2ICVL = [
    0,
    13, 14, 15,
    1, 2, 3,
    4, 5, 6,
    10, 11, 12,
    7, 8, 9,
]

# MANO -> NYU's 12 evaluated joints (of the 14 NYU eval joints)
MANO2NYU = [
    18, 8,
    19, 11,
    17, 5,
    16, 2,
    20, 15, 14,
    0,
]

HANDS2MANO = [0, 2, 9, 10, 3, 12, 13, 5, 18, 19, 4, 15, 16, 1, 6, 7, 11, 14, 20, 17, 8]

# NYU joint_data.mat selection maps (ref: render_loader.py:27-42)
NYU_JOINT_SELECT = np.array(
    [0, 1, 3, 5, 6, 7, 9, 11, 12, 13, 15, 17, 18, 19, 21, 23, 24, 25, 27, 28, 32, 30, 31]
)
NYU_CALCULATE = [0, 2, 4, 6, 8, 10, 12, 14, 16, 17, 18, 21, 22, 20]
NYU2MANO = [22, 15, 14, 13, 11, 10, 9, 3, 2, 1, 7, 6, 5, 19, 18, 17, 12, 8, 0, 4, 16]

# Fingertip vertex indices appended to the 16-joint MANO regressor
# (ref: mano_layer.py:122-130).
FINGERTIP_VERTS = [333, 444, 672, 555, 744]

# Wrist-capping ring (vertex indices) and the 16 capping faces that close
# the MANO mesh with an appended centroid vertex #778
# (ref: mano_layer.py:103-106, 636).
WRIST_RING = [121, 214, 215, 279, 239, 234, 92, 38, 122, 118, 117, 119, 120, 108, 79, 78]
WRIST_FACES = np.array(
    [
        [121, 214, 778], [214, 215, 778], [215, 279, 778], [279, 239, 778],
        [239, 234, 778], [234, 92, 778], [92, 38, 778], [38, 122, 778],
        [122, 118, 778], [118, 117, 778], [117, 119, 778], [119, 120, 778],
        [120, 108, 778], [108, 79, 778], [79, 78, 778], [78, 121, 778],
    ],
    dtype=np.int32,
)

# Child joint of each of the 15 finger bones, in bone order
# (ref: mano_layer.py:229).
BONE_CHILD = [2, 3, 16, 5, 6, 17, 8, 9, 18, 11, 12, 19, 14, 15, 20]

# 16 kinematic joints -> finger id (0 = palm/wrist) (ref: mano_layer.py:177)
JOINT2FINGER = np.array([0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 5])

# ICVL per-joint z bias applied at eval (ref: train_render.py:841-843)
ICVL_Z_BIAS = np.array(
    [20, 22, 13.5, 7.5, 12.5, 12.5, 3, 12.5, 12.5, 8, 16, 12.5, 3, 13, 7.3, 6],
    dtype=np.float32,
)


def transfer_for_dataset(dataset: str):
    """Dataset name -> MANO joint reorder list (ref: mano_layer.py:85-94)."""
    if "msra" in dataset:
        return MANO2MSRA
    if "icvl" in dataset:
        return MANO2ICVL
    if "hands" in dataset:
        return MANO2HANDS
    if "nyu" in dataset:
        return MANO2NYU
    return list(range(21))
