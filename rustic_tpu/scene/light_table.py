"""Alias-method ("robin hood") light-pick table.

Capability parity with the reference's host-side builder (reference:
src/light_pick.rs:24-122): O(1) light selection on device by indexing a
uniform bin and choosing between its two resident triangles by a stored
ratio. Power = luminance-ish sum(emissive) * area, area via Heron's
formula. A single sentinel entry (ratio = -1) marks "no lights"
(reference: src/light_pick.rs:53-59, shared_structs/src/lib.rs:115-119).

The table is stored SoA for TPU-friendly gathers.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class LightTable:
    idx_a: np.ndarray  # [L] int32 triangle index (post-BVH-reorder)
    area_a: np.ndarray  # [L] float32
    pdf_a: np.ndarray  # [L] float32 (probability of picking this triangle)
    idx_b: np.ndarray  # [L] int32
    area_b: np.ndarray  # [L] float32
    pdf_b: np.ndarray  # [L] float32
    ratio: np.ndarray  # [L] float32; < 0 => sentinel (no lights)

    def __len__(self) -> int:
        return len(self.ratio)

    @property
    def is_sentinel(self) -> bool:
        return bool(self.ratio[0] < 0.0)


def triangle_areas(va: np.ndarray, vb: np.ndarray, vc: np.ndarray) -> np.ndarray:
    """Heron's-formula triangle areas (reference: src/light_pick.rs:5-11)."""
    la = np.linalg.norm(vb - va, axis=-1)
    lb = np.linalg.norm(vc - vb, axis=-1)
    lc = np.linalg.norm(va - vc, axis=-1)
    s = (la + lb + lc) / 2.0
    return np.sqrt(np.maximum(s * (s - la) * (s - lb) * (s - lc), 0.0))


def compute_emissive_mask(
    triangles: np.ndarray, emissive: np.ndarray
) -> np.ndarray:
    """Mask of triangles whose material has nonzero emission
    (reference: src/light_pick.rs:13-21).

    Args:
      triangles: [T, 4] (i0, i1, i2, material).
      emissive: [M, >=3] per-material emissive color.
    """
    return np.any(emissive[triangles[:, 3], :3] != 0.0, axis=-1)


def _sentinel() -> LightTable:
    z32 = np.zeros(1, np.int32)
    zf = np.zeros(1, np.float32)
    return LightTable(
        idx_a=z32,
        area_a=zf,
        pdf_a=zf,
        idx_b=z32.copy(),
        area_b=zf.copy(),
        pdf_b=zf.copy(),
        ratio=np.full(1, -1.0, np.float32),
    )


def build_light_table(
    vertices: np.ndarray,
    triangles: np.ndarray,
    mask: np.ndarray,
    emissive: np.ndarray,
) -> LightTable:
    verts = np.asarray(vertices, np.float64)[:, :3]
    tris = np.asarray(triangles, np.int64)

    areas = np.zeros(len(tris))
    powers = np.zeros(len(tris))
    lit = np.nonzero(mask)[0]
    if len(lit) == 0:
        return _sentinel()

    va = verts[tris[lit, 0]]
    vb = verts[tris[lit, 1]]
    vc = verts[tris[lit, 2]]
    areas[lit] = triangle_areas(va, vb, vc)
    # Power = (r+g+b of emission) * area (reference: src/light_pick.rs:49)
    powers[lit] = emissive[tris[lit, 3], :3].sum(axis=-1) * areas[lit]
    total_power = powers.sum()
    if total_power <= 0.0:
        return _sentinel()

    probs = powers / total_power
    # One bin per emitting triangle, sorted ascending by probability
    # (reference: src/light_pick.rs:73-88). Zero-power lights are dropped.
    order = lit[np.argsort(probs[lit], kind="stable")]
    order = order[probs[order] > 0.0]
    if len(order) == 0:
        return _sentinel()

    n_bins = len(order)
    avg = probs[order].sum() / n_bins
    prob_a = probs[order].copy()
    index_a = order.copy()
    index_b = np.zeros(n_bins, np.int64)
    prob_b = np.zeros(n_bins)

    # Robin hood: top up each underfull bin from the most probable one
    # (reference: src/light_pick.rs:90-105).
    most_probable = n_bins - 1
    for i in range(n_bins):
        needed = avg - prob_a[i]
        if needed <= 0.0:
            break
        index_b[i] = index_a[most_probable]
        prob_b[i] = needed
        prob_a[most_probable] -= needed
        if prob_a[most_probable] <= avg:
            most_probable -= 1

    return LightTable(
        idx_a=index_a.astype(np.int32),
        area_a=areas[index_a].astype(np.float32),
        pdf_a=probs[index_a].astype(np.float32),
        idx_b=index_b.astype(np.int32),
        area_b=areas[index_b].astype(np.float32),
        pdf_b=probs[index_b].astype(np.float32),
        ratio=(prob_a / np.maximum(prob_a + prob_b, 1e-30)).astype(np.float32),
    )
