"""Generate coverage scenes the reference strips from its public mirror.

The reference's benchmark/correctness suite references GlassTest.glb and
BreakTime.glb, both removed by .MISSING_LARGE_BLOBS; this regenerates
equivalent-coverage scenes with rustic_tpu's own GLB writer:

- GlassTest.glb — BASELINE config #3 (dielectric refraction, long
  specular chains): two glass spheres (smooth ior 1.5 and rough ior
  1.45) and a metal sphere on a diffuse floor, lit by an emissive panel
  and the procedural sky.

Run: python tools/make_scenes.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rustic_tpu.scene.glb_write import (  # noqa: E402
    MaterialSpec,
    MeshSpec,
    icosphere,
    quad,
    write_glb,
)


def make_glass_test(path: str):
    materials = [
        MaterialSpec(
            base_color=(0.75, 0.75, 0.75, 1.0), roughness=0.9, name="floor"
        ),
        MaterialSpec(
            base_color=(1.0, 1.0, 1.0, 1.0),
            roughness=0.02,
            transmission=1.0,
            ior=1.5,
            name="glass_smooth",
        ),
        MaterialSpec(
            base_color=(0.9, 0.95, 1.0, 1.0),
            roughness=0.25,
            transmission=1.0,
            ior=1.45,
            name="glass_rough",
        ),
        MaterialSpec(
            base_color=(0.95, 0.64, 0.54, 1.0),
            metallic=1.0,
            roughness=0.15,
            name="copper",
        ),
        MaterialSpec(
            base_color=(0.0, 0.0, 0.0, 1.0),
            emissive=(1.0, 0.95, 0.85),  # loader multiplies by 15
            name="panel_light",
        ),
    ]

    # Authored glTF *z-up*: the loader's Y/Z swizzle (src/asset.rs:102
    # semantics) turns gltf (x, y, z) into renderer (x, z, y), so gltf
    # +z becomes the renderer's +y (the default camera's screen-up).
    meshes = []
    p, i, n = quad((-8.0, -8.0, 0.0), (16.0, 0.0, 0.0), (0.0, 16.0, 0.0))
    meshes.append(MeshSpec(p, i, 0, normals=n, name="floor"))

    # spheres resting on the floor (renderer: x lateral, z depth)
    p, i, n = icosphere(3, 1.0, (-2.2, 0.0, 1.0))
    meshes.append(MeshSpec(p, i, 1, normals=n, name="glass_smooth"))
    p, i, n = icosphere(3, 1.0, (0.0, 1.8, 1.0))
    meshes.append(MeshSpec(p, i, 2, normals=n, name="glass_rough"))
    p, i, n = icosphere(3, 1.0, (2.2, 0.0, 1.0))
    meshes.append(MeshSpec(p, i, 3, normals=n, name="copper"))

    # emissive panel overhead, front face down toward the spheres
    p, i, n = quad((-1.5, -1.5, 5.0), (0.0, 3.0, 0.0), (3.0, 0.0, 0.0))
    meshes.append(MeshSpec(p, i, 4, normals=n, name="panel"))

    write_glb(path, meshes, materials)
    print(f"wrote {path}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets",
        "scenes",
    )
    make_glass_test(os.path.join(outdir, "GlassTest.glb"))
