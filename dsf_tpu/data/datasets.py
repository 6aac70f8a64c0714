"""Dataset loaders: NYU / ICVL / MSRA / SHREC-DHG.

Host-side classes replicating the reference's Dataset subclasses
(render_loader.py:1803-3185): per-sample __getitem__ returning the same
(img, joint_xyz, joint_uvd, center, M, cube) tuple, plus threaded
batch iterators that feed fixed-shape NumPy batches to the device loop.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Iterator

import numpy as np

from dsf_tpu.data import crop as C
from dsf_tpu.data import readers
from dsf_tpu.mano.constants import (
    NYU_JOINT_SELECT, NYU_CALCULATE, NYU2MANO)


class BaseDataset:
    paras: tuple
    ori_img_size: tuple
    flip: float = 1.0
    # item-fetch worker threads (the reference feeds its GPU from 4
    # dataloader worker PROCESSES + a prefetch thread,
    # train_render.py:33-35; cv2 decode/warp and most numpy ops release
    # the GIL, so threads scale the same work here).  Capped at the
    # host's core count — on single-core hosts the pool is bypassed
    # entirely (threads only add overhead there).
    NUM_WORKERS = max(1, min(8, os.cpu_count() or 1))

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, i):
        raise NotImplementedError

    def _worker_pool(self):
        pool = getattr(self, "_pool", None)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=self.NUM_WORKERS)
            self._pool = pool
        return pool

    def _thread_rng(self):
        """Per-thread augmentation RNG: RandomState is not thread-safe,
        so each worker gets its own stream seeded from the dataset seed
        + a monotonically assigned thread ordinal (epoch-varying, like
        the reference's per-worker loader RNGs)."""
        tl = getattr(self, "_tlocal", None)
        if tl is None:
            tl = self._tlocal = threading.local()
            self._rng_next = 0
            self._rng_lock = threading.Lock()
        rng = getattr(tl, "rng", None)
        if rng is None:
            with self._rng_lock:
                # seed each worker stream from the dataset's master RNG
                # (serialized by the lock; happens once per thread)
                seed = int(self.rng.randint(0, 2 ** 31 - 1))
            rng = tl.rng = np.random.RandomState(seed)
        return rng

    # ------------------------------------------------------------ caching

    def enable_depth_cache(self, max_bytes=None):
        """Cache decoded full-frame depths in RAM (uint16 when lossless,
        else float32).  PNG decode measures ~4.2 ms/frame on this box —
        88% of the augmented item cost — so epochs after the first run
        at crop+augment speed.  The reference re-decodes every epoch
        (its Dataset __getitem__ reads the PNG each time,
        render_loader.py:1850-1860); TPU hosts carry enough RAM that
        decode-once is the right production default (NYU train: ~45 GB
        as uint16).  ``max_bytes`` bounds the cache; entries past the
        bound fall through to decode."""
        self._depth_cache = {}
        self._depth_cache_bytes = 0
        self._depth_cache_max = max_bytes

    def _read_depth_cached(self, index):
        cache = getattr(self, "_depth_cache", None)
        if cache is None:
            return self._read_depth(index)
        hit = cache.get(index)
        if hit is not None:
            return hit.astype(np.float32)
        d = self._read_depth(index)
        if (self._depth_cache_max is None
                or self._depth_cache_bytes < self._depth_cache_max):
            u16 = d.astype(np.uint16)
            store = u16 if np.array_equal(u16, d) else d
            cache[index] = store
            self._depth_cache_bytes += store.nbytes
        return d

    # ------------------------------------------------------------ batching

    def _aug_fast_batch(self, idx, depths, joints_xyz, centers, cubes64):
        """Augmented-batch fast path shared by the dataset loaders: raw
        crop in native C++, the exact cv2 warps of augment_crop, fused
        threshold+normalize in C++, vectorized label math
        (data/aug_batch.py; parity vs the per-sample path pinned in
        tests/test_aug_batch_parity.py)."""
        from dsf_tpu.data import aug_batch
        draws = aug_batch.draw_params(self.rng, len(idx), self.aug_para)
        return aug_batch.augment_fast_batch(
            depths, joints_xyz[idx], centers, cubes64.astype(np.float64),
            self.paras, self.flip, self.img_size, draws,
            nthreads=self.NUM_WORKERS)

    def _eval_fast_batch(self, idx, depths, joints_xyz, centers, cubes):
        """Unaugmented batch fast path shared by the dataset loaders:
        crop+normalize runs in the threaded C++ library
        (native/dsf_host.cpp:batch_crop_normalize, parity-tested in
        tests/test_misc_parity.py) and the label math — the same
        com/M/cube chain every __getitem__ computes — is vectorized
        numpy.  Callers guarantee ``not augment`` and native
        availability."""
        from dsf_tpu.data import crop as C
        from dsf_tpu.data import native

        coms = C.joint_3d_to_img(centers, self.paras, self.flip)
        imgs, Ms = native.batch_crop_normalize(
            depths, coms.astype(np.float32), cubes.astype(np.float32),
            np.asarray(self.paras, np.float32), self.img_size,
            nthreads=self.NUM_WORKERS)
        gt3Dcrop = joints_xyz[idx] - centers[:, None]
        curLabel = gt3Dcrop / (cubes[:, None, 2:3] / 2.0)
        com3D = C.joint_img_to_3d(coms, self.paras, self.flip)
        world = curLabel * (cubes[:, None, 0:1] / 2.0) + com3D[:, None]
        uvd = C.joint_3d_to_img(world, self.paras, self.flip)
        ones = np.ones(uvd.shape[:-1] + (1,), uvd.dtype)
        h = np.concatenate([uvd[..., :2], ones], axis=-1) @ \
            Ms.transpose(0, 2, 1)
        joint_img = uvd.copy()
        joint_img[..., :2] = (h[..., :2] / h[..., 2:3]) \
            / (self.img_size / 2) - 1
        joint_img[..., 2] = (uvd[..., 2] - com3D[:, None, 2]) \
            / (cubes[:, None, 0] / 2.0)
        return {
            "img": imgs[:, None].astype(np.float32),
            "xyz_gt": curLabel.astype(np.float32),
            "uvd_gt": joint_img.astype(np.float32),
            "center": com3D.astype(np.float32),
            "M": Ms.astype(np.float32),
            "cube": cubes.astype(np.float32),
        }

    def _fetch_batch(self, idx):
        """One stacked batch; item fetch fans out over the worker pool."""
        if len(idx) > 1 and self.NUM_WORKERS > 1:
            items = list(self._worker_pool().map(self.__getitem__, idx))
        else:
            items = [self[i] for i in idx]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def batches(self, batch_size: int, shuffle=False, seed=0,
                drop_last=True, loop=False) -> Iterator[dict]:
        rng = np.random.RandomState(seed)
        n = len(self)
        while True:
            order = rng.permutation(n) if shuffle else np.arange(n)
            end = n - batch_size + 1 if drop_last else n
            for s in range(0, end, batch_size):
                yield self._fetch_batch(order[s:s + batch_size])
            if not loop:
                return

    def prefetch_batches(self, batch_size: int, prefetch=4, transform=None,
                         **kw):
        """Background-thread prefetcher (replaces the reference's
        BackgroundGenerator + 4 dataloader workers,
        train_render.py:33-35).  ``transform`` (e.g. a device_put) runs
        on the prefetch thread so host->device transfer overlaps the
        device step."""
        q: "queue.Queue" = queue.Queue(maxsize=prefetch)
        stop = object()

        def worker():
            # A worker exception must reach the consumer: without this,
            # the generator blocks forever on q.get() while the dead
            # thread's traceback goes to stderr only (observed hang on a
            # missing test image mid-eval).
            try:
                for b in self.batches(batch_size, **kw):
                    q.put(transform(b) if transform is not None else b)
                q.put(stop)
            except BaseException as e:  # noqa: BLE001 - re-raised below
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is stop:
                return
            if isinstance(b, BaseException):
                raise b
            yield b


class NYUDataset(BaseDataset):
    """NYU hand dataset (ref: nyu_loader, render_loader.py:1803-1947).

    Needs: {root}/[train|test]/depth_{view+1}_XXXXXXX.png,
    joint_data.mat, center_{phase}_{view}_refined.txt, and (optionally)
    per-frame MANO params in posePara_lm_collosion/.
    """

    def __init__(self, root_dir, phase, view=0, img_size=128,
                 cube_size=(250, 250, 250), center_type="refine",
                 aug_para=(10, 0.2, 180), joint_num=14, type="real",
                 seed=0):
        import scipy.io as sio
        self.paras = (588.03, 587.07, 320.0, 240.0)
        self.ori_img_size = (640, 480)
        self.flip = 1.0
        self.phase = phase
        self.view = view
        self.img_size = img_size
        self.cube_size = np.asarray(cube_size, np.float32)
        self.aug_para = aug_para
        self.joint_num = joint_num
        self.rng = np.random.RandomState(seed)
        # augmentation is decoupled from the split name so subclasses can
        # augment the test split without relabeling the phase (the path/
        # phase coupling bit round 1; ref nyu_loader_test :1483)
        self.augment = phase == "train"

        data_path = os.path.join(root_dir, phase)
        self.data_path = data_path
        labels = sio.loadmat(os.path.join(data_path, "joint_data.mat"))
        uvd = labels["joint_uvd"][view][:, NYU_JOINT_SELECT][:, NYU_CALCULATE]
        xyz = labels["joint_xyz"][view][:, NYU_JOINT_SELECT][:, NYU_CALCULATE]
        # y-negation roundtrip the reference applies (render_loader.py:1830)
        self.all_joints_uvd = uvd.astype(np.float32)
        self.all_joints_xyz = C.joint_img_to_3d(
            C.joint_3d_to_img(xyz, self.paras, flip=-1), self.paras,
            flip=1).astype(np.float32)
        xyz_mano = labels["joint_xyz"][view][:, NYU_JOINT_SELECT][:, NYU2MANO]
        self.all_joints_xyz_mano = C.joint_img_to_3d(
            C.joint_3d_to_img(xyz_mano, self.paras, flip=-1), self.paras,
            flip=1).astype(np.float32)

        center_path = os.path.join(
            data_path, f"center_{phase}_{view}_refined.txt")
        if center_type == "refine" and os.path.exists(center_path):
            self.center_xyz = np.loadtxt(center_path).astype(np.float32)
        else:
            self.center_xyz = self.all_joints_xyz.mean(1)

        n_test = len(self.all_joints_uvd)
        self.test_cubesize = np.ones((n_test, 3), np.float32) * self.cube_size
        if phase == "test":
            # test cubes shrink x5/6 after frame 2440 (ref :1852-1853)
            self.test_cubesize[2440:] *= 5.0 / 6.0

    def __len__(self):
        return len(self.all_joints_uvd)

    def _read_depth(self, index):
        img_path = os.path.join(
            self.data_path, f"depth_{self.view + 1}_{index + 1:07d}.png")
        return readers.nyu_reader(img_path)

    def _fetch_batch(self, idx):
        """Batch fast path: PNG decode fans out over the worker pool
        (RAM-cached after first touch when enable_depth_cache is on),
        crop+normalize runs in the threaded C++ library
        (native/dsf_host.cpp, parity-tested in tests/test_misc_parity.py
        and tests/test_aug_batch_parity.py), label math is vectorized
        numpy.  Augmented (train) fetches route through the batched
        augment pipeline (data/aug_batch.py)."""
        from dsf_tpu.data import aug_batch, native
        # subclasses that extend __getitem__ (CCSSL weights, ST model
        # params) must go through it — the fast path only serves classes
        # whose items are exactly the base batch dict
        if (not native.available()
                or type(self).__getitem__ is not NYUDataset.__getitem__
                or (self.augment and not aug_batch.available())):
            return super()._fetch_batch(idx)
        idx = np.asarray(idx)
        depths = np.stack(list(self._worker_pool().map(
            self._read_depth_cached, idx)))
        cubes = (self.test_cubesize[idx] if self.phase == "test"
                 else np.tile(self.cube_size, (len(idx), 1))).astype(
                     np.float32)
        if self.augment:
            return self._aug_fast_batch(idx, depths, self.all_joints_xyz,
                                        self.center_xyz[idx], cubes)
        return self._eval_fast_batch(idx, depths, self.all_joints_xyz,
                                     self.center_xyz[idx], cubes)

    def __getitem__(self, index):
        depth = self._read_depth(index)

        joint_xyz = self.all_joints_xyz[index].copy()
        cube_size = (self.test_cubesize[index] if self.phase == "test"
                     else self.cube_size).astype(np.float64)
        center_xyz = self.center_xyz[index]
        center_uvd = C.joint_3d_to_img(center_xyz, self.paras, self.flip)

        gt3Dcrop = joint_xyz - center_xyz.reshape(1, 3)
        depth_crop, trans = C.crop_image_deep_pp(
            depth, center_uvd, cube_size, (self.img_size, self.img_size),
            self.paras)
        if self.augment:
            mode, off, rot, sc = C.rand_augment(
                self._thread_rng(), self.aug_para[0], self.aug_para[1],
                self.aug_para[2])
            imgD, curLabel, cube, com2D, M, _ = C.augment_crop(
                depth_crop, gt3Dcrop, center_uvd, cube_size, trans, mode,
                off, rot, sc, self.paras, self.flip)
            curLabel = curLabel / (cube[2] / 2.0)
        else:
            imgD = C.normalize_img(depth_crop.max(), depth_crop, center_xyz,
                                   cube_size)
            curLabel = gt3Dcrop / (cube_size[2] / 2.0)
            cube = np.array(cube_size)
            com2D = center_uvd
            M = trans

        com3D = C.joint_img_to_3d(com2D, self.paras, self.flip)
        joint_img = C.transform_points_2d(
            C.joint_3d_to_img(curLabel * (cube[0] / 2.0) + com3D,
                              self.paras, self.flip), M)
        joint_img[:, 0:2] = joint_img[:, 0:2] / (self.img_size / 2) - 1
        joint_img[:, 2] = (joint_img[:, 2] - com3D[2]) / (cube[0] / 2.0)

        return {
            "img": imgD[None].astype(np.float32),
            "xyz_gt": curLabel.astype(np.float32),
            "uvd_gt": joint_img.astype(np.float32),
            "center": com3D.astype(np.float32),
            "M": M.astype(np.float32),
            "cube": cube.astype(np.float32),
        }


class ICVLDataset(BaseDataset):
    """ICVL with the left->right flip (ref: flip_icvl_loader,
    render_loader.py:2305-2455).

    Primary layout is the reference's: {root}/train.txt or
    {root}/test_seq_1.txt + test_seq_2.txt, {root}/center_{phase}_refined.txt,
    images under {root}/Depth/.  The TEST list is filtered to the
    protocol subsequences exactly as the reference does
    (render_loader.py:2421-2433, subSeq=['0'] unless full_img): frames
    whose first path component is a long (>6 char) sequence name pass,
    short-named subsequence dirs pass only when listed in subSeq; frames
    with 'invalid' refined centers or missing image files are skipped.
    Falls back to a {root}/[Training|Testing]/labels.txt layout.
    """

    def __init__(self, root_dir, phase, img_size=128,
                 cube_size=(200, 200, 200), center_type="refine",
                 aug_para=(10, 0.2, 180), seed=0, full_img=False,
                 sub_seq=("0",)):
        self.paras = (240.99, 240.96, 160.0, 120.0)
        self.ori_img_size = (320, 240)
        self.flip = 1.0
        self.phase = phase
        self.img_size = img_size
        self.cube_size = np.asarray(cube_size, np.float32)
        self.aug_para = aug_para
        self.rng = np.random.RandomState(seed)
        self.root_dir = root_dir

        if os.path.exists(os.path.join(root_dir, "train.txt")) or \
                os.path.exists(os.path.join(root_dir, "test_seq_1.txt")):
            names, uvds, centers = self._read_reference_layout(
                root_dir, phase, full_img, sub_seq)
        else:
            names, uvds, centers = self._read_flat_layout(root_dir, phase)
        self.img_names = names
        self.all_joints_uvd = (np.stack(uvds).astype(np.float32)
                               if uvds else np.zeros((0, 16, 3), np.float32))
        # LR flip of u (image flipped at read time)
        self.all_joints_uvd[:, :, 0] = \
            self.ori_img_size[0] - self.all_joints_uvd[:, :, 0]
        self.all_joints_xyz = C.joint_img_to_3d(
            self.all_joints_uvd, self.paras, self.flip)
        if center_type == "refine" and centers is not None:
            self.center_xyz = np.asarray(centers, np.float32).reshape(-1, 3)
            # the reference re-projects the center and flips u around
            # cx=160 (render_loader.py:2338-2341) == negating x
            self.center_xyz[:, 0] = -self.center_xyz[:, 0]
        else:
            self.center_xyz = self.all_joints_xyz.mean(1)

    def _read_reference_layout(self, root_dir, phase, full_img, sub_seq):
        """ref: flip_icvl_loader.read_joints (render_loader.py:2399-2453)."""
        if phase == "train":
            with open(os.path.join(root_dir, "train.txt")) as f:
                lines = f.read().splitlines()
            center_path = os.path.join(root_dir, "center_train_refined.txt")
        else:
            lines = []
            for seq in ("test_seq_1.txt", "test_seq_2.txt"):
                with open(os.path.join(root_dir, seq)) as f:
                    lines += f.read().splitlines()
            lines = [ln for ln in lines if ln]
            center_path = os.path.join(root_dir, "center_test_refined.txt")
        center_lines = None
        if os.path.exists(center_path):
            with open(center_path) as f:
                center_lines = f.readlines()

        names, uvds, centers = [], [], []
        sub_seq = list(sub_seq)
        for index, line in enumerate(lines):
            strs = line.split()
            p = strs[0].split("/")
            if not full_img:
                # subsequence protocol filter (ref :2425-2433)
                if ("0" in sub_seq) and len(p[0]) > 6:
                    pass
                elif (p[0] in sub_seq) and len(p[0]) <= 6:
                    pass
                else:
                    continue
            img_path = os.path.join(root_dir, "Depth", strs[0])
            if not os.path.isfile(img_path):
                continue
            if center_lines is not None:
                cstr = center_lines[index].split()
                if cstr[0] == "invalid":
                    continue
                centers.append([float(v) for v in cstr])
            names.append(img_path)
            uvds.append(np.asarray(strs[1:1 + 48], np.float32).reshape(16, 3))
        return names, uvds, (centers if center_lines is not None else None)

    def _read_flat_layout(self, root_dir, phase):
        phase_dir = "Training" if phase == "train" else "Testing"
        label_path = os.path.join(root_dir, phase_dir, "labels.txt")
        center_path = os.path.join(root_dir, phase_dir,
                                   f"center_{phase}_refined.txt")
        names, uvds = [], []
        with open(label_path) as f:
            for line in f:
                parts = line.strip().split()
                if len(parts) < 1 + 16 * 3:
                    continue
                names.append(os.path.join(root_dir, phase_dir, "Depth",
                                          parts[0]))
                uvds.append(np.asarray(parts[1:1 + 48],
                                       np.float32).reshape(16, 3))
        centers = None
        if os.path.exists(center_path):
            centers = np.loadtxt(center_path).astype(np.float32)
        return names, uvds, centers

    def __len__(self):
        return len(self.img_names)

    def _read_depth(self, index):
        depth = readers.icvl_reader(self.img_names[index])
        return depth[:, ::-1].copy()                # LR flip (ref :2331-2341)

    def _fetch_batch(self, idx):
        """Batch fast path (same contract as NYUDataset's): decode fans
        out over the worker pool, crop/augment/normalize/labels run in
        the shared vectorized/native paths."""
        from dsf_tpu.data import aug_batch, native
        train = self.phase == "train"
        if (not native.available()
                or type(self).__getitem__ is not ICVLDataset.__getitem__
                or (train and not aug_batch.available())):
            return super()._fetch_batch(idx)
        idx = np.asarray(idx)
        depths = np.stack(list(self._worker_pool().map(
            self._read_depth_cached, idx)))
        cubes = np.tile(self.cube_size.astype(np.float32), (len(idx), 1))
        if train:
            return self._aug_fast_batch(idx, depths, self.all_joints_xyz,
                                        self.center_xyz[idx], cubes)
        return self._eval_fast_batch(idx, depths, self.all_joints_xyz,
                                     self.center_xyz[idx], cubes)

    def __getitem__(self, index):
        depth = self._read_depth(index)

        joint_xyz = self.all_joints_xyz[index].copy()
        cube_size = self.cube_size.astype(np.float64)
        center_xyz = self.center_xyz[index]
        center_uvd = C.joint_3d_to_img(center_xyz, self.paras, self.flip)

        gt3Dcrop = joint_xyz - center_xyz.reshape(1, 3)
        depth_crop, trans = C.crop_image_deep_pp(
            depth, center_uvd, cube_size, (self.img_size, self.img_size),
            self.paras)
        if self.phase == "train":
            mode, off, rot, sc = C.rand_augment(
                self._thread_rng(), self.aug_para[0], self.aug_para[1],
                self.aug_para[2])
            imgD, curLabel, cube, com2D, M, _ = C.augment_crop(
                depth_crop, gt3Dcrop, center_uvd, cube_size, trans, mode,
                off, rot, sc, self.paras, self.flip)
            curLabel = curLabel / (cube[2] / 2.0)
        else:
            imgD = C.normalize_img(depth_crop.max(), depth_crop, center_xyz,
                                   cube_size)
            curLabel = gt3Dcrop / (cube_size[2] / 2.0)
            cube = np.array(cube_size)
            com2D = center_uvd
            M = trans

        com3D = C.joint_img_to_3d(com2D, self.paras, self.flip)
        joint_img = C.transform_points_2d(
            C.joint_3d_to_img(curLabel * (cube[0] / 2.0) + com3D,
                              self.paras, self.flip), M)
        joint_img[:, 0:2] = joint_img[:, 0:2] / (self.img_size / 2) - 1
        joint_img[:, 2] = (joint_img[:, 2] - com3D[2]) / (cube[0] / 2.0)
        return {
            "img": imgD[None].astype(np.float32),
            "xyz_gt": curLabel.astype(np.float32),
            "uvd_gt": joint_img.astype(np.float32),
            "center": com3D.astype(np.float32),
            "M": M.astype(np.float32),
            "cube": cube.astype(np.float32),
        }


class MSRADataset(BaseDataset):
    """MSRA 9-subject leave-one-out (ref: msra_loader,
    render_loader.py:2458-2620)."""

    PERSON_CUBES = [200, 200, 200, 180, 180, 180, 170, 160, 150]
    GESTURES = ["1", "2", "3", "4", "5", "6", "7", "8", "9", "I", "IP", "L",
                "MP", "RP", "T", "TIP", "Y"]

    def __init__(self, root_dir, phase, test_persons=0, img_size=128,
                 center_type="refine", aug_para=(10, 0.2, 180), seed=0,
                 write_record=False):
        self.paras = (241.42, 241.42, 160.0, 120.0)
        self.ori_img_size = (320, 240)
        self.flip = 1.0
        self.phase = phase
        self.img_size = img_size
        self.aug_para = aug_para
        self.rng = np.random.RandomState(seed)
        self.root_dir = root_dir

        persons = ([test_persons] if phase == "test"
                   else [p for p in range(9) if p != test_persons])
        self.files = []
        self.rel_files = []
        self.cubes = []
        self.joints_xyz = []
        for p in persons:
            cube = float(self.PERSON_CUBES[p])
            pdir = os.path.join(root_dir, f"P{p}")
            if not os.path.isdir(pdir):
                continue
            for g in self.GESTURES:
                gdir = os.path.join(pdir, g)
                jfile = os.path.join(gdir, "joint.txt")
                if not os.path.exists(jfile):
                    continue
                with open(jfile) as f:
                    n = int(f.readline())
                    data = np.loadtxt(f).reshape(n, 21, 3)
                # world->our convention: y and z negated in the raw file
                # (ref negates z then runs the flip=-1/flip=1 uvd roundtrip
                # which negates y, render_loader.py:2507-2512)
                data[:, :, 1] = -data[:, :, 1]
                data[:, :, 2] = -data[:, :, 2]
                for i in range(n):
                    self.files.append(os.path.join(gdir, f"{i:06d}_depth.bin"))
                    self.rel_files.append(f"P{p}/{g}/{i:06d}_depth.bin")
                    self.cubes.append(cube)
                    self.joints_xyz.append(data[i])
        self.joints_xyz = (np.stack(self.joints_xyz).astype(np.float32)
                           if self.joints_xyz else np.zeros((0, 21, 3), np.float32))
        self.cubes = np.asarray(self.cubes, np.float32)
        if write_record:
            # ref writes ./msra_record_list.txt + ./msra_label.txt at init
            # (render_loader.py:2467,2492-2495); opt-in, into root_dir
            with open(os.path.join(root_dir, "msra_record_list.txt"),
                      "w") as f:
                f.write("".join(r + "\r\n" for r in self.rel_files))
            uvd = C.joint_3d_to_img(self.joints_xyz, self.paras, self.flip)
            np.savetxt(os.path.join(root_dir, "msra_label.txt"),
                       uvd.reshape(len(uvd), -1), fmt="%.3f")

        # refined centers (ref: render_loader.py:2495-2500): a per-split
        # center file with the NYU-style y-negation roundtrip; fall back
        # to joint-mean when absent or center_type != 'refine'
        self.center_xyz = (self.joints_xyz.mean(1)
                           if len(self.joints_xyz) else np.zeros((0, 3)))
        center_path = os.path.join(
            root_dir, f"center_{phase}_{int(test_persons)}_refined.txt")
        if center_type == "refine" and os.path.exists(center_path):
            raw = np.loadtxt(center_path).astype(np.float32).reshape(-1, 3)
            uvd = C.joint_3d_to_img(raw, self.paras, -1.0)
            self.center_xyz = C.joint_img_to_3d(
                uvd, self.paras, self.flip).astype(np.float32)
            if len(self.center_xyz) != len(self.files):
                raise ValueError(
                    f"center file rows {len(self.center_xyz)} != frames "
                    f"{len(self.files)} ({center_path})")

    def __len__(self):
        return len(self.files)

    def _read_depth(self, index):
        return readers.msra_reader(self.files[index], self.paras)[0]

    def _fetch_batch(self, idx):
        """Batch fast path (same contract as NYUDataset's), with the
        per-person cube table applied per frame."""
        from dsf_tpu.data import aug_batch, native
        train = self.phase == "train"
        if (not native.available()
                or type(self).__getitem__ is not MSRADataset.__getitem__
                or (train and not aug_batch.available())):
            return super()._fetch_batch(idx)
        idx = np.asarray(idx)
        depths = np.stack(list(self._worker_pool().map(
            self._read_depth_cached, idx)))
        cubes = np.repeat(self.cubes[idx][:, None], 3, axis=1)
        if train:
            return self._aug_fast_batch(idx, depths, self.joints_xyz,
                                        self.center_xyz[idx], cubes)
        return self._eval_fast_batch(idx, depths, self.joints_xyz,
                                     self.center_xyz[idx], cubes)

    def __getitem__(self, index):
        depth, _ = readers.msra_reader(self.files[index], self.paras)
        cube = float(self.cubes[index])
        cube_size = np.asarray([cube, cube, cube], np.float64)
        joint_xyz = self.joints_xyz[index].copy()
        center_xyz = self.center_xyz[index]
        center_uvd = C.joint_3d_to_img(center_xyz, self.paras, self.flip)

        gt3Dcrop = joint_xyz - center_xyz.reshape(1, 3)
        depth_crop, trans = C.crop_image_deep_pp(
            depth, center_uvd, cube_size, (self.img_size, self.img_size),
            self.paras)
        if self.phase == "train":
            mode, off, rot, sc = C.rand_augment(
                self._thread_rng(), self.aug_para[0], self.aug_para[1],
                self.aug_para[2])
            imgD, curLabel, cube_a, com2D, M, _ = C.augment_crop(
                depth_crop, gt3Dcrop, center_uvd, cube_size, trans, mode,
                off, rot, sc, self.paras, self.flip)
            curLabel = curLabel / (cube_a[2] / 2.0)
            cube_size = cube_a
        else:
            imgD = C.normalize_img(depth_crop.max(), depth_crop, center_xyz,
                                   cube_size)
            curLabel = gt3Dcrop / (cube_size[2] / 2.0)
            com2D = center_uvd
            M = trans

        com3D = C.joint_img_to_3d(com2D, self.paras, self.flip)
        joint_img = C.transform_points_2d(
            C.joint_3d_to_img(curLabel * (cube_size[0] / 2.0) + com3D,
                              self.paras, self.flip), M)
        joint_img[:, 0:2] = joint_img[:, 0:2] / (self.img_size / 2) - 1
        joint_img[:, 2] = (joint_img[:, 2] - com3D[2]) / (cube_size[0] / 2.0)
        return {
            "img": imgD[None].astype(np.float32),
            "xyz_gt": curLabel.astype(np.float32),
            "uvd_gt": joint_img.astype(np.float32),
            "center": com3D.astype(np.float32),
            "M": M.astype(np.float32),
            "cube": np.asarray(cube_size, np.float32),
        }


class SHRECDataset(BaseDataset):
    """SHREC'17 gesture sequences for skeleton export (ref: shrec_loader,
    render_loader.py:3078-3185).  Joints come from previously exported
    predictions; centers are their uv-mean + depth mean."""

    def __init__(self, root_dir, img_size=128, cube_size=(200, 200, 200),
                 aug_para=(0, 0, 0), seed=0, pred_file="skeletons_world_pred.txt"):
        self.paras = (463.889, 463.889, 320.0, 240.0)
        self.ori_img_size = (640, 480)
        self.flip = 1.0
        self.phase = "train"
        self.img_size = img_size
        self.cube_size = np.asarray(cube_size, np.float32)
        self.aug_para = aug_para
        self.rng = np.random.RandomState(seed)
        self.root_dir = root_dir
        self.samples = []     # (depth_path, joints_xyz or None, seq_id, frame)
        for dirpath, _, files in os.walk(root_dir):
            depths = sorted(f for f in files if f.endswith("_depth.png"))
            if not depths:
                continue
            pred = os.path.join(dirpath, pred_file)
            joints = None
            if os.path.exists(pred):
                joints = np.loadtxt(pred).reshape(-1, 21, 3)
            for i, fname in enumerate(depths):
                j = joints[i] if joints is not None and i < len(joints) else None
                self.samples.append((os.path.join(dirpath, fname), j,
                                     dirpath, i))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        path, joints, seq, frame = self.samples[index]
        depth = readers.shrec_reader(path)
        if joints is None:
            # bootstrap center from the depth blob
            fg = (depth > 100) & (depth < 1000)
            vs, us = np.nonzero(fg)
            center_uvd = np.asarray([us.mean(), vs.mean(),
                                     depth[fg].mean()], np.float32)
            center_xyz = C.joint_img_to_3d(center_uvd, self.paras, self.flip)
            joint_xyz = np.tile(center_xyz, (21, 1))
        else:
            joint_xyz = joints.astype(np.float32)
            uvd = C.joint_3d_to_img(joint_xyz, self.paras, self.flip)
            center_uvd = np.asarray(
                [uvd[:, 0].mean(), uvd[:, 1].mean(), uvd[:, 2].mean()],
                np.float32)
            center_xyz = C.joint_img_to_3d(center_uvd, self.paras, self.flip)

        cube_size = self.cube_size.astype(np.float64)
        gt3Dcrop = joint_xyz - center_xyz.reshape(1, 3)
        depth_crop, trans = C.crop_image_deep_pp(
            depth, center_uvd, cube_size, (self.img_size, self.img_size),
            self.paras)
        imgD = C.normalize_img(depth_crop.max(), depth_crop, center_xyz,
                               cube_size)
        curLabel = gt3Dcrop / (cube_size[2] / 2.0)
        com3D = C.joint_img_to_3d(center_uvd, self.paras, self.flip)
        joint_img = C.transform_points_2d(
            C.joint_3d_to_img(curLabel * (cube_size[0] / 2.0) + com3D,
                              self.paras, self.flip), trans)
        joint_img[:, 0:2] = joint_img[:, 0:2] / (self.img_size / 2) - 1
        joint_img[:, 2] = (joint_img[:, 2] - com3D[2]) / (cube_size[0] / 2.0)
        return {
            "img": imgD[None].astype(np.float32),
            "xyz_gt": curLabel.astype(np.float32),
            "uvd_gt": joint_img.astype(np.float32),
            "center": com3D.astype(np.float32),
            "M": trans.astype(np.float32),
            "cube": np.asarray(cube_size, np.float32),
        }


class NYUCCSSLDataset(NYUDataset):
    """NYU with CCSSL pseudo labels + per-joint confidence weights
    (ref: nyu_CCSSL_loader, render_loader.py:1700-1800): joints come from
    an exported `joint_uvd.txt` and each sample carries a `weight.txt`
    row used by the weighted losses."""

    def __init__(self, root_dir, phase, pseudo_dir, **kw):
        super().__init__(root_dir, phase, **kw)
        uvd = np.loadtxt(os.path.join(pseudo_dir, "joint_uvd.txt"))
        self.pseudo_uvd = uvd.reshape(len(uvd), -1, 3).astype(np.float32)
        wpath = os.path.join(pseudo_dir, "weight.txt")
        if os.path.exists(wpath):
            self.weights = np.loadtxt(wpath).astype(np.float32)
        else:
            self.weights = np.ones(self.pseudo_uvd.shape[:2], np.float32)
        # pseudo labels replace GT joints
        self.all_joints_uvd = self.pseudo_uvd
        self.all_joints_xyz = C.joint_img_to_3d(
            self.pseudo_uvd, self.paras, self.flip)

    def __getitem__(self, index):
        out = super().__getitem__(index)
        out["weight"] = self.weights[index]
        return out


def read_dhg_sequences(root_dir):
    """Parse the DHG 14/28 layout (ref: DHG_loader.read_joints,
    render_loader.py:3026-3051): `informations_troncage_sequences.txt`
    rows `gesture finger subject essai start end` index into
    gesture_{g}/finger_{f}/subject_{s}/essai_{e}/ sequence dirs.  The
    gesture id (1..14) and finger id (1..2) together give the 14- and
    28-class labels used by the downstream DG-STA benchmark.

    Returns a list of dicts: {dir, gesture, finger, subject, essai,
    start, end}."""
    import re as _re
    info = os.path.join(root_dir, "informations_troncage_sequences.txt")
    seqs = []
    splitter = _re.compile(r"[ \t\n\r]+")
    with open(info) as f:
        for line in f:
            parts = [p for p in splitter.split(line) if p]
            if len(parts) < 6:
                continue
            g, fi, s, e, start, end = parts[:6]
            seqs.append({
                "dir": os.path.join(
                    root_dir, f"gesture_{g}", f"finger_{fi}",
                    f"subject_{s}", f"essai_{e}"),
                "gesture": int(g), "finger": int(fi), "subject": int(s),
                "essai": int(e), "start": int(start), "end": int(end),
            })
    return seqs


class DHGDataset(BaseDataset):
    """DHG 14/28 gesture sequences (ref: DHG_loader,
    render_loader.py:2964-3075).

    Unlike SHREC's os.walk layout, DHG is indexed by
    `informations_troncage_sequences.txt` (gesture/finger/subject/essai +
    start/end frame truncation); joints come from previously exported
    predictions (`skeletons_world_pred*.txt`, one row per truncated
    frame), centers are the uv-mean of `skeleton_image.txt` + the
    xyz-mean depth x1000, and both the depth image and the center u are
    LEFT-RIGHT FLIPPED (ref :2979, 2988)."""

    def __init__(self, root_dir, img_size=128, cube_size=(250, 250, 250),
                 aug_para=(10, 0.1, 180), seed=0,
                 pred_file="skeletons_world_pred_normal_DSSF.txt",
                 augment=False):
        self.paras = (463.889, 463.889, 320.0, 240.0)
        self.ori_img_size = (640, 480)
        self.flip = 1.0
        self.phase = "train"
        self.img_size = img_size
        self.cube_size = np.asarray(cube_size, np.float32)
        self.aug_para = aug_para
        self.augment = augment
        self.rng = np.random.RandomState(seed)
        self.root_dir = root_dir
        self.sequences = read_dhg_sequences(root_dir)

        self.samples = []          # (depth_path, xyz (21,3), center_uvd)
        for seq in self.sequences:
            d = seq["dir"]
            xyz = np.loadtxt(os.path.join(d, pred_file), ndmin=2)
            uvd = np.loadtxt(os.path.join(d, "skeleton_image.txt"), ndmin=2)
            for k, frame in enumerate(range(seq["start"], seq["end"] + 1)):
                jx = xyz[k].reshape(-1, 3)
                ju = uvd[frame].reshape(-1, 2)
                center_uv = ju.mean(0)
                center_d = jx.mean(0)[2:3] * 1000.0
                center_uvd = np.concatenate([center_uv, center_d])
                center_uvd[0] = 640 - center_uvd[0]    # u-flip (ref :2979)
                self.samples.append(
                    (os.path.join(d, f"depth_{frame + 1}.png"),
                     jx.astype(np.float32), center_uvd.astype(np.float32),
                     seq))

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        path, joint_xyz, center_uvd, seq = self.samples[index]
        depth = readers.shrec_reader(path)
        depth = depth[:, ::-1].copy()                  # LR flip (ref :2988)

        center_xyz = C.joint_img_to_3d(center_uvd, self.paras, self.flip)
        cube_size = self.cube_size.astype(np.float64)
        gt3Dcrop = joint_xyz - center_xyz.reshape(1, 3)
        depth_crop, trans = C.crop_image_deep_pp(
            depth, center_uvd, cube_size, (self.img_size, self.img_size),
            self.paras)
        if self.augment:
            mode, off, rot, sc = C.rand_augment(
                self._thread_rng(), self.aug_para[0], self.aug_para[1],
                self.aug_para[2])
            imgD, curLabel, cube, com2D, M, _ = C.augment_crop(
                depth_crop, gt3Dcrop, center_uvd, cube_size, trans, mode,
                off, rot, sc, self.paras, self.flip)
            curLabel = curLabel / (cube[2] / 2.0)
        else:
            imgD = C.normalize_img(depth_crop.max(), depth_crop, center_xyz,
                                   cube_size)
            curLabel = gt3Dcrop / (cube_size[2] / 2.0)
            cube, com2D, M = np.array(cube_size), center_uvd, trans

        com3D = C.joint_img_to_3d(com2D, self.paras, self.flip)
        joint_img = C.transform_points_2d(
            C.joint_3d_to_img(curLabel * (cube[0] / 2.0) + com3D,
                              self.paras, self.flip), M)
        joint_img[:, 0:2] = joint_img[:, 0:2] / (self.img_size / 2) - 1
        joint_img[:, 2] = (joint_img[:, 2] - com3D[2]) / (cube[0] / 2.0)
        return {
            "img": imgD[None].astype(np.float32),
            "xyz_gt": curLabel.astype(np.float32),
            "uvd_gt": joint_img.astype(np.float32),
            "center": com3D.astype(np.float32),
            "M": M.astype(np.float32),
            "cube": np.asarray(cube, np.float32),
            "gesture": np.int32(seq["gesture"]),
            # 28-class label = (gesture-1)*2 + (finger-1) per DHG protocol
            "label28": np.int32((seq["gesture"] - 1) * 2
                                + (seq["finger"] - 1)),
        }

    def write_joints(self, predict_xyz, out_name="skeletons_world_pred.txt"):
        """Export per-sequence predicted skeletons in truncated-frame
        order (ref: DHG_loader.write_joints, render_loader.py:3058-3075)."""
        i = 0
        for seq in self.sequences:
            n = seq["end"] - seq["start"] + 1
            np.savetxt(os.path.join(seq["dir"], out_name),
                       np.asarray(predict_xyz[i:i + n]).reshape(n, -1),
                       fmt="%.8f")
            i += n
        return i


class NYUSTDataset(NYUDataset):
    """NYU self-training variant (ref: nyu_ST_loader,
    render_loader.py:1949-2052): view-0 GT joints + per-frame MANO params
    + a per-sample pseudo-label mask the self-training loop updates.
    Returns the standard batch dict plus `model_para`."""

    def __init__(self, root_dir, phase, **kw):
        super().__init__(root_dir, phase, view=0, **kw)
        self.all_model_para = ModelParaOnlyDataset(
            root_dir, "nyu", phase, view=0).params
        self.mask = np.zeros(len(self), np.float32)   # ref :1985

    def __getitem__(self, index):
        out = super().__getitem__(index)
        out["model_para"] = self.all_model_para[index].astype(np.float32)
        return out


class ModelParaOnlyDataset:
    """Per-frame MANO parameters for an existing dataset (ref:
    nyu_modelPara_loader / msra_modelPara_loader,
    render_loader.py:2054-2117, 2622-2703): 62-D rows read from the
    posePara_lm_collosion bank for a dataset/phase/view."""

    def __init__(self, root_dir, dataset_name, phase, view=0,
                 cube_size=(250, 250, 250)):
        d = os.path.join(root_dir, "posePara_lm_collosion")
        load = lambda sfx, c: np.loadtxt(
            os.path.join(d, f"{dataset_name}-{phase}-{view}-{sfx}.txt")
        ).reshape(-1, c)
        self.params = np.concatenate(
            [load("glb", 3), load("pose", 45), load("shape", 10),
             load("scale", 1), load("trans", 3)], axis=-1).astype(np.float32)
        self.cube_size = np.asarray(cube_size, np.float32)

    def __len__(self):
        return len(self.params)

    def __getitem__(self, i):
        return self.params[i], self.cube_size


class ConcatDataset(BaseDataset):
    """Concatenation of datasets sharing one sample schema (ref:
    nyu_loader_train_test concat of 72757 train + 8252 test frames,
    render_loader.py:1584-1698)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self.paras = self.datasets[0].paras
        self.ori_img_size = self.datasets[0].ori_img_size
        self.flip = self.datasets[0].flip
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, i):
        k = int(np.searchsorted(self._offsets, i, side="right") - 1)
        return self.datasets[k][i - int(self._offsets[k])]


class NYUTestAugDataset(NYUDataset):
    """NYU test split WITH train-time augmentation (ref: nyu_loader_test,
    render_loader.py:1483-1583): used for self-training experiments on
    the test distribution.  Keeps the train-sized cubes (no 5/6 shrink)."""

    def __init__(self, root_dir, **kw):
        super().__init__(root_dir, "test", **kw)
        self.test_cubesize[:] = self.cube_size   # no test-cube shrink
        self.augment = True    # phase stays "test": paths + cube table
                               # remain test-split, only aug turns on
