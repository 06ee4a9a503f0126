"""Vertex-map pair batches for PoseResNet training.

Replaces the reference's window-dataset path for PoseNet training
(``DatasetLoader.get_sequence_dataset`` → ``DatasetOfSequences`` with
``sequence_len=2`` over vertex maps, ``slam/dataset/sequence_dataset.py:9-169``
+ ``train.py:104-120``): consecutive-frame vertex-map pairs with the relative
GT pose, built from any ``SequenceSource``-style scan iterator.

Projection runs on device in chunks (one jitted z-buffer scatter per chunk),
then pairs are served from a host-side cache — vertex maps are small
(64·720·3 floats ≈ 0.5 MB) so whole KITTI sequences fit comfortably in RAM.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from pwclonet_pylidarslam_tpu.core.projection import SphericalProjector


def project_scans(
    scans: Sequence[np.ndarray],
    projector: SphericalProjector,
    num_points: int = 65536,
    chunk: int = 8,
) -> np.ndarray:
    """Project a list of variable-size scans into ``(T, H, W, 3)`` vertex maps.

    Scans are padded/cropped to ``num_points`` (zero padding is ignored by the
    z-buffer, matching the reference's nan-scrub + in-place scatter).
    """
    import jax

    fixed = np.zeros((len(scans), num_points, 3), np.float32)
    for i, s in enumerate(scans):
        s = np.asarray(s, np.float32)[:, :3]
        s = s[np.linalg.norm(s, axis=-1) > 1e-6]
        n = min(len(s), num_points)
        if len(s) > num_points:  # deterministic stride-crop keeps angular coverage
            idx = np.linspace(0, len(s) - 1, num_points).astype(np.int64)
            fixed[i] = s[idx]
        else:
            fixed[i, :n] = s[:n]

    project = jax.jit(projector.build_projection_map)
    out: List[np.ndarray] = []
    for start in range(0, len(scans), chunk):
        block = fixed[start : start + chunk]
        if len(block) < chunk:  # pad the tail so the jit sees ONE shape
            pad = np.zeros((chunk - len(block), num_points, 3), np.float32)
            vm = np.asarray(project(jnp.asarray(np.concatenate([block, pad]))))
            out.append(vm[: len(block)])
        else:
            out.append(np.asarray(project(jnp.asarray(block))))
    return np.concatenate(out) if out else np.zeros((0,) + (projector.height, projector.width, 3))


@dataclasses.dataclass
class VertexMapPairDataset:
    """Consecutive-frame ``(vm1=current, vm2=previous, gt_pose)`` pairs.

    ``gt_pose`` maps current-frame coordinates into previous-frame
    coordinates (``inv(abs[i-1]) @ abs[i]``) — the contract of
    ``posenet_state.posenet_train_step`` and ``PoseNetOdometry``.
    """

    vertex_maps: np.ndarray  # (T, H, W, 3)
    gt_absolute: Optional[np.ndarray] = None  # (T, 4, 4)

    @classmethod
    def from_scans(
        cls,
        scans: Sequence[np.ndarray],
        gt_absolute: Optional[np.ndarray],
        projector: SphericalProjector = SphericalProjector(),
        num_points: int = 65536,
    ) -> "VertexMapPairDataset":
        return cls(project_scans(scans, projector, num_points), gt_absolute)

    def __len__(self) -> int:
        return max(len(self.vertex_maps) - 1, 0)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        item = {"vm1": self.vertex_maps[i + 1], "vm2": self.vertex_maps[i]}
        if self.gt_absolute is not None:
            rel = np.linalg.inv(self.gt_absolute[i]) @ self.gt_absolute[i + 1]
            item["gt_pose"] = rel.astype(np.float32)
        return item

    def batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(j)] for j in order[start : start + batch_size]]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}


def concat_pair_datasets(
    datasets: Sequence[VertexMapPairDataset],
) -> "MultiSequencePairDataset":
    return MultiSequencePairDataset(list(datasets))


@dataclasses.dataclass
class VertexMapWindowDataset:
    """Sliding windows of ``sequence_len`` consecutive frames — the
    len>2 generalization of :class:`VertexMapPairDataset`, mirroring the
    reference's ``DatasetOfSequences`` (``sequence_dataset.py:9-169``:
    window count ``T − S·stride + 1``, per-window frame indices
    ``start + k·stride``).

    Item contract (newest-first, consistent with the pair dataset's
    ``vm1=current / vm2=previous`` and ``PoseNetOdometry``'s input layout):

    - ``frames (S, H, W, 3)``: ``frames[k] = vm[start + (S-1-k)·stride]``;
    - ``gt_poses (S-1, 4, 4)``: ``gt_poses[k]`` maps ``frames[k]``
      coordinates into ``frames[k+1]`` coordinates (each a current→previous
      relative, like the pair dataset's ``gt_pose``).

    The reference's random crop/pad to ``num_points`` happens upstream at
    projection time (``project_scans``) — vertex maps are already fixed-shape.
    """

    vertex_maps: np.ndarray  # (T, H, W, 3)
    gt_absolute: Optional[np.ndarray] = None  # (T, 4, 4)
    sequence_len: int = 3
    stride: int = 1

    @classmethod
    def from_scans(
        cls,
        scans: Sequence[np.ndarray],
        gt_absolute: Optional[np.ndarray],
        projector: SphericalProjector = SphericalProjector(),
        num_points: int = 65536,
        sequence_len: int = 3,
        stride: int = 1,
    ) -> "VertexMapWindowDataset":
        vms = project_scans(scans, projector, num_points)
        gt = None if gt_absolute is None else np.asarray(gt_absolute, np.float64)
        return cls(vms, gt, sequence_len, stride)

    def __len__(self) -> int:
        # ref sequence_dataset.py:50 window count
        return max(len(self.vertex_maps) - self.sequence_len * self.stride + 1, 0)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        s = self.sequence_len
        idx = [i + k * self.stride for k in range(s)]  # oldest → newest
        frames = np.stack([self.vertex_maps[j] for j in reversed(idx)])
        item = {"frames": frames}
        if self.gt_absolute is not None:
            rels = []
            for k in range(s - 1):
                newer, older = idx[s - 1 - k], idx[s - 2 - k]
                rels.append(
                    np.linalg.inv(self.gt_absolute[older]) @ self.gt_absolute[newer]
                )
            item["gt_poses"] = np.stack(rels).astype(np.float32)
        return item

    def batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(j)] for j in order[start : start + batch_size]]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}


@dataclasses.dataclass
class MultiSequenceWindowDataset:
    """Windows pooled across sequences (never windowing across a boundary —
    ``sequence_dataset.py:46-53`` concatenation semantics)."""

    datasets: List[VertexMapWindowDataset]

    def __len__(self) -> int:
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        for d in self.datasets:
            if i < len(d):
                return d[i]
            i -= len(d)
        raise IndexError(i)

    def batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(j)] for j in order[start : start + batch_size]]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}


@dataclasses.dataclass
class MultiSequencePairDataset:
    """Pairs pooled across sequences (never pairing across a boundary —
    the window dataset's concatenation semantics, ``sequence_dataset.py:46-53``)."""

    datasets: List[VertexMapPairDataset]

    def __len__(self) -> int:
        return sum(len(d) for d in self.datasets)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        for d in self.datasets:
            if i < len(d):
                return d[i]
            i -= len(d)
        raise IndexError(i)

    def batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        for start in range(0, len(order) - batch_size + 1, batch_size):
            items = [self[int(j)] for j in order[start : start + batch_size]]
            yield {k: np.stack([it[k] for it in items]) for k in items[0]}
