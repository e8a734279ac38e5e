"""Quadtree texture atlas packer.

Capability parity with the reference packer (reference: src/atlas.rs:26-90):
the atlas square is quadtree-subdivided until there are at least as many
leaves as textures, leaves are sorted by size (descending) and assigned
to textures in load order, each texture is Lanczos-resized into its cell
and pasted vertically flipped. Returns the atlas plus one `uvst` vector
per texture: (offset_u, offset_v, scale_u, scale_v) such that
atlas_uv = uvst.xy + uv * uvst.zw (reference: src/atlas.rs:16-24 — note
the reference divides the y offset by atlas *width*; kept verbatim, it
is identical for the square atlases both frameworks use).
"""

from __future__ import annotations

from collections import deque
from typing import List, Tuple

import numpy as np


def pack_textures(
    textures: List[np.ndarray],
    atlas_width: int = 4096,
    atlas_height: int = 4096,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Pack float [H, W, 4] textures into one atlas.

    Returns (atlas [atlas_height, atlas_width, 4] float32, uvst list).
    """
    atlas = np.zeros((atlas_height, atlas_width, 4), np.float32)
    if not textures:
        return atlas, []

    queue = deque([(0, 0, atlas_width, atlas_height)])
    while len(queue) <= len(textures):
        x, y, w, h = queue.popleft()
        hw, hh = w // 2, h // 2
        queue.extend(
            [
                (x, y, hw, hh),
                (x + hw, y, hw, hh),
                (x, y + hh, hw, hh),
                (x + hw, y + hh, hw, hh),
            ]
        )

    leafs = sorted(queue, key=lambda r: -r[2])[: len(textures)]

    sts = []
    for tex, (x, y, w, h) in zip(textures, leafs):
        resized = _resize_lanczos(tex, w, h)
        # vertical flip on paste (reference: src/atlas.rs:85)
        atlas[y : y + h, x : x + w] = resized[::-1]
        sts.append(
            np.array(
                [
                    x / atlas_width,
                    y / atlas_width,  # reference quirk: y offset over width
                    w / atlas_width,
                    h / atlas_height,
                ],
                np.float32,
            )
        )
    return atlas, sts


def _resize_lanczos(tex: np.ndarray, w: int, h: int) -> np.ndarray:
    """Lanczos3 resize via PIL (the reference uses fast_image_resize
    with the same filter, src/atlas.rs:71-84)."""
    from PIL import Image

    u8 = (np.clip(tex, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    img = Image.fromarray(u8, "RGBA").resize((w, h), Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0
