"""FreiHAND dataset model: annotations, versions, splits, host batch feed.

Capability equivalent of data/FreiHand/FreiHand.py:16-485 (annotation loading,
version handling, split membership, labelled/unlabelled marking, biased batch
sampling) with the per-sample cv2 work moved on-device (data/pipeline.py).
The host side only decodes JPEGs and stacks fixed-shape numpy batches.

Split contract preserved exactly (quirks included):
  * 4 image versions gs/hom/sample/auto x 32 560 unique samples
    (FreiHand.py:16-19,376);
  * train = idx [0, 26050); test = idx [26051, 26051+3254) — note the
    reference's off-by-one start at `db_size+1` and span of `testing_size-1`
    (FreiHand.py:417-419);
  * labelled = idx < 3256, all versions (config.py:51-56);
  * biased sampling: labelled with prob 0.5 (dataset.py:89-105).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterator, Optional

import numpy as np

from hand_integral_pose_estimation_tpu.config import Config, FreiHandJoints

VERSIONS = ("gs", "hom", "sample", "auto")
DB_SIZE = 32560  # unique training samples (FreiHand.py:173)


def version_map_id(idx: int, version: str) -> int:
    """Sample index -> image file id (FreiHand.py:164-166)."""
    return idx + DB_SIZE * VERSIONS.index(version)


@dataclasses.dataclass
class SampleRecord:
    img_path: str
    K: np.ndarray                 # (3, 3)
    joint_cam: np.ndarray         # (21, 3)
    ref_bone_len: float
    labelled: bool
    version: str
    idx: int
    detector_bbox: Optional[np.ndarray] = None       # (4,) cx,cy,w,h
    teacher_cam_normalized: Optional[np.ndarray] = None
    teacher_tprime: Optional[float] = None
    mano: Optional[np.ndarray] = None    # (1, 61) pose+shape+trans row —
    # stored-but-unconsumed parity with FreiHand.py:196-211


class FreiHandDataset:
    """Annotation-backed dataset (requires the FreiHAND download on disk)."""

    def __init__(self, data_dir: str, data_split: str = "training",
                 cfg: Config = Config()):
        self.data_dir = data_dir
        self.data_split = data_split
        self.cfg = cfg
        self.joint_num = FreiHandJoints.num_joints
        self.records: list[SampleRecord] = []
        self._load()

    # -- annotation loading (FreiHand.py:214-239) --------------------------
    def _load_annotations(self):
        base = self.data_dir
        with open(os.path.join(base, "training_K.json")) as f:
            K_list = json.load(f)
        with open(os.path.join(base, "training_xyz.json")) as f:
            xyz_list = json.load(f)
        with open(os.path.join(base, "training_scale.json")) as f:
            scale_list = json.load(f)
        assert len(K_list) == len(xyz_list) == len(scale_list)
        # mano is loaded into the db like the reference does
        # (FreiHand.py:196-211, 'Size mismatch.' assert) but consumed by
        # nothing downstream — storage parity only.
        mano_path = os.path.join(base, "training_mano.json")
        mano_list = None
        if os.path.exists(mano_path):
            with open(mano_path) as f:
                mano_list = json.load(f)
            assert len(K_list) == len(mano_list), "Size mismatch."
        return K_list, xyz_list, scale_list, mano_list

    def _split_range(self):
        t = self.cfg.train
        if self.data_split == "training":
            return 0, t.training_size
        if self.data_split == "testing":
            # reference quirk: start at training_size + 1, span size - 1
            start = t.training_size + 1
            return start, start + t.testing_size - 1
        raise ValueError(self.data_split)

    def _load_evaluation(self):
        """Label-free challenge split (FreiHand.py:286-341
        `load_evaluation_data`): evaluation_K.json + evaluation_scale.json,
        images under evaluation/rgb, no joints (zeros placeholder)."""
        base = self.data_dir
        with open(os.path.join(base, "evaluation_K.json")) as f:
            K_list = json.load(f)
        with open(os.path.join(base, "evaluation_scale.json")) as f:
            scale_list = json.load(f)
        for idx in range(len(K_list)):
            img_path = os.path.join(base, "evaluation", "rgb",
                                    f"{idx:08d}.jpg")
            self.records.append(SampleRecord(
                img_path=img_path,
                K=np.asarray(K_list[idx], np.float64),
                joint_cam=np.zeros((self.joint_num, 3)),
                ref_bone_len=float(scale_list[idx]),
                labelled=False,
                version="gs",
                idx=idx,
            ))
        self.num_labelled = 0
        self.num_unlabelled = len(self.records)

    def _load(self):
        if self.data_split == "evaluation":
            return self._load_evaluation()
        K_list, xyz_list, scale_list, mano_list = self._load_annotations()
        start, end = self._split_range()
        lab_range = self.cfg.train.labelled_data_range
        for version in VERSIONS:
            for idx in range(start, end):
                file_id = version_map_id(idx, version)
                img_path = os.path.join(self.data_dir, "training", "rgb",
                                        f"{file_id:08d}.jpg")
                self.records.append(SampleRecord(
                    img_path=img_path,
                    K=np.asarray(K_list[idx], np.float64),
                    joint_cam=np.asarray(xyz_list[idx], np.float64),
                    ref_bone_len=float(scale_list[idx]),
                    labelled=(idx < lab_range),
                    version=version,
                    idx=idx,
                    mano=(None if mano_list is None
                          else np.asarray(mano_list[idx], np.float64)),
                ))
        # labelled records first (FreiHand.py:472)
        self.records.sort(key=lambda r: r.labelled, reverse=True)
        self.num_labelled = sum(r.labelled for r in self.records)
        self.num_unlabelled = len(self.records) - self.num_labelled

    def __len__(self):
        return len(self.records)

    def read_image(self, rec: SampleRecord) -> np.ndarray:
        from hand_integral_pose_estimation_tpu.data.native_loader import (
            decode_jpeg,
        )
        return decode_jpeg(rec.img_path)  # RGB; native C++ decode w/ cv2 fallback

    def host_batch_native(self, loader, indices: np.ndarray) -> dict:
        """Batch via the C++ prefetch loader (data/native_loader.py):
        submit/wait double buffering happens in the caller's loop."""
        recs = [self.records[i] for i in indices]
        loader.submit([r.img_path for r in recs])
        return stack_host_batch(recs, list(loader.wait()))

    # -- biased batch sampling (dataset.py:89-105) --------------------------
    def sample_indices(self, rng: np.random.RandomState, batch_size: int,
                       labelled_prob: Optional[float] = None) -> np.ndarray:
        p = (self.cfg.train.labelled_selection_prob
             if labelled_prob is None else labelled_prob)
        pick_lab = rng.random_sample(batch_size) < p
        # degenerate pools: all-labelled / all-unlabelled datasets sample
        # from whichever side exists
        if self.num_unlabelled == 0:
            pick_lab[:] = True
        elif self.num_labelled == 0:
            pick_lab[:] = False
        idx = np.where(
            pick_lab,
            rng.randint(0, max(self.num_labelled, 1), batch_size),
            self.num_labelled + rng.randint(
                0, max(self.num_unlabelled, 1), batch_size),
        )
        return idx

    def host_batch(self, indices: np.ndarray) -> dict:
        recs = [self.records[i] for i in indices]
        return stack_host_batch(recs, [self.read_image(r) for r in recs])


def stack_host_batch(recs: list[SampleRecord],
                     images: list[np.ndarray]) -> dict:
    """Fixed-shape numpy arrays ready for device_put + pipeline."""
    B = len(recs)
    has_det = all(r.detector_bbox is not None for r in recs)
    has_teacher = all(r.teacher_cam_normalized is not None for r in recs)
    return {
        "image": np.stack(images).astype(np.uint8),
        "joint_cam": np.stack([r.joint_cam for r in recs]).astype(np.float32),
        "K": np.stack([r.K for r in recs]).astype(np.float32),
        "ref_bone_len": np.asarray([r.ref_bone_len for r in recs],
                                   np.float32),
        "labelled": np.asarray([r.labelled for r in recs], bool),
        "bbox_detector": (np.stack([r.detector_bbox for r in recs])
                          .astype(np.float32) if has_det else None),
        "teacher_cam_normalized": (
            np.stack([r.teacher_cam_normalized for r in recs])
            .astype(np.float32) if has_teacher else None),
    }


class SyntheticFreiHand:
    """Synthetic stand-in with the same host-batch contract — used for smoke
    tests and benchmarking when the FreiHAND download is absent."""

    def __init__(self, n: int = 256, image_hw=(224, 224), seed: int = 0,
                 labelled_fraction: float = 0.5,
                 render_joints: bool = False, num_joints: int = 21):
        rng = np.random.RandomState(seed)
        self.n = n
        H, W = image_hw
        self.images = rng.randint(0, 255, (n, H, W, 3)).astype(np.uint8)
        self.K = np.tile(
            np.array([[531.9, 0, W / 2], [0, 532.2, H / 2], [0, 0, 1.0]],
                     np.float32), (n, 1, 1))
        center = np.array([0.0, 0.0, 0.45])
        # num_joints: 21 matches FreiHAND; other values (>= 11, so root 9 /
        # ref bone 9-10 stay valid) exercise model-axis-divisible heads
        self.joint_cam = (center
                          + rng.uniform(-0.035, 0.035, (n, num_joints, 3))
                          ).astype(np.float32)
        if render_joints:
            # paint a distinct blob at each joint's projection so the task
            # has learnable visual structure (used by end-to-end learning
            # validations; depth is encoded in blob brightness)
            self.images //= 4
            for i in range(n):
                uvw = self.joint_cam[i] @ self.K[i].T
                uv = uvw[:, :2] / uvw[:, 2:3]
                zrel = self.joint_cam[i, :, 2]
                zn = (zrel - zrel.min()) / max(float(np.ptp(zrel)), 1e-6)
                for j in range(num_joints):
                    x, y = int(round(uv[j, 0])), int(round(uv[j, 1]))
                    if 1 <= x < W - 1 and 1 <= y < H - 1:
                        col = np.array([
                            255 * (j % 3 == 0), 255 * (j % 3 == 1),
                            255 * (j % 3 == 2)]) * (0.4 + 0.6 * zn[j])
                        self.images[i, y-1:y+2, x-1:x+2] = col.astype(np.uint8)
        self.ref_bone_len = np.linalg.norm(
            self.joint_cam[:, 9] - self.joint_cam[:, 10], axis=-1)
        self.labelled = rng.random_sample(n) < labelled_fraction
        self.num_labelled = int(self.labelled.sum())
        self.num_unlabelled = n - self.num_labelled
        #: optional (n, 4) detector crop boxes (data/detector_db.py attach)
        self.detector_bbox = None

    def __len__(self):
        return self.n

    def record_names(self) -> np.ndarray:
        """Content-derived per-sample identities for the bbox-db integrity
        check (data/detector_db.py): a different seed/size/rendering yields
        different names, so a cache built for another synthetic dataset is
        rejected instead of silently attached."""
        import zlib
        return np.asarray([f"synthetic-{zlib.crc32(im.tobytes()):08x}-{i}"
                           for i, im in enumerate(self.images)])

    def sample_indices(self, rng: np.random.RandomState, batch_size: int,
                       labelled_prob: Optional[float] = None) -> np.ndarray:
        return rng.randint(0, self.n, batch_size)

    def host_batch(self, indices: np.ndarray) -> dict:
        i = np.asarray(indices)
        return {
            "image": self.images[i],
            "joint_cam": self.joint_cam[i],
            "K": self.K[i],
            "ref_bone_len": self.ref_bone_len[i],
            "labelled": self.labelled[i],
            "bbox_detector": (None if self.detector_bbox is None
                              else self.detector_bbox[i]),
            "teacher_cam_normalized": None,
        }


def padded_batches(n: int, batch_size: int) -> Iterator[np.ndarray]:
    """Index arrays covering [0, n) in fixed-size batches; the tail batch is
    padded by repeating its final index (device shapes stay static — callers
    concatenate results and trim with `[:n]`). The shared sweep helper for
    Tester.run, the evaluate CLI, detector-db generation and teacher-label
    generation — the reference DataLoader's drop_last=False equivalent."""
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        if len(idx) < batch_size:
            idx = np.concatenate(
                [idx, np.full(batch_size - len(idx), idx[-1], idx.dtype)])
        yield idx


def batch_iterator(dataset, batch_size: int, steps: int,
                   seed: int = 0) -> Iterator[dict]:
    rng = np.random.RandomState(seed)
    for _ in range(steps):
        yield dataset.host_batch(dataset.sample_indices(rng, batch_size))


def apply_filtered_labels(dataset: FreiHandDataset, npz_path: str
                          ) -> FreiHandDataset:
    """Attach a filtered pseudo-label db (written by
    cli/generate_teacher_labels.py) to a dataset, dropping rejected samples —
    the equivalent of FreiHand.load_filtered_data (FreiHand.py:343-371).
    Records gain `teacher_cam_normalized`/`teacher_tprime`; kept order
    matches the generation sweep (sequential over the sorted records).
    """
    db = np.load(npz_path)
    keep = db["keep"]
    jcn = db["joint_cam_normalized"]
    tprime = db["tprime"]
    if "name" in db:
        # rows are positional — reject dbs generated for a different record
        # set (e.g. a --training-size mismatch between the generation sweep
        # and this run would silently attach wrong pseudo-labels)
        from hand_integral_pose_estimation_tpu.data.detector_db import (
            _record_names,
        )
        names = _record_names(dataset)
        db_names = np.asarray(db["name"])
        m = min(len(names), len(db_names))
        if len(names) != len(db_names) or not (names[:m]
                                               == db_names[:m]).all():
            raise ValueError(
                f"filtered db {npz_path} was generated for a different "
                f"record set ({len(db_names)} rows vs {len(names)} records);"
                " regenerate with matching --training-size")
    n = min(len(keep), len(dataset.records))
    new_records = []
    for i in range(n):
        if not keep[i]:
            continue
        r = dataset.records[i]
        r.teacher_cam_normalized = jcn[i]
        r.teacher_tprime = float(tprime[i])
        new_records.append(r)
    dataset.records = new_records
    dataset.num_labelled = sum(r.labelled for r in new_records)
    dataset.num_unlabelled = len(new_records) - dataset.num_labelled
    return dataset
