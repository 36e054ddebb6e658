"""Mesh extraction (utils/mesh.py): marching tetrahedra on an analytic
density + OBJ/PLY export (reference test.ipynb mesh cell via pymcubes)."""
import numpy as np

from ngp_pl_tpu.utils.mesh import (
    extract_mesh,
    marching_tetrahedra,
    save_mesh_obj,
    save_mesh_ply,
)


def sphere_density(pts, r=0.3, sharp=200.0):
    d = np.linalg.norm(pts, axis=-1)
    return sharp * (r - d)          # positive inside radius r


def test_marching_tetrahedra_sphere_radius():
    R = 48
    lin = np.linspace(-0.5, 0.5, R, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    vals = sphere_density(np.stack([x, y, z], -1).reshape(-1, 3)).reshape(
        R, R, R)
    verts, faces = marching_tetrahedra(vals, level=0.0)
    assert len(verts) > 100 and len(faces) > 100
    assert faces.min() >= 0 and faces.max() < len(verts)
    # vertices lie on the iso-surface: |x| in index units ~ sphere of r=0.3
    world = verts / (R - 1) - 0.5
    rad = np.linalg.norm(world, axis=-1)
    assert abs(rad.mean() - 0.3) < 0.02
    assert rad.std() < 0.02


def test_extract_mesh_and_export(tmp_path):
    verts, faces = extract_mesh(sphere_density, resolution=32, scale=0.5,
                                level=0.0)
    assert len(verts) and len(faces)
    # world coordinates span ~[-0.3, 0.3]
    assert np.abs(verts).max() < 0.35
    obj = tmp_path / "m.obj"
    ply = tmp_path / "m.ply"
    save_mesh_obj(str(obj), verts, faces)
    save_mesh_ply(str(ply), verts, faces)
    lines = obj.read_text().splitlines()
    nv = sum(1 for l in lines if l.startswith("v "))
    nf = sum(1 for l in lines if l.startswith("f "))
    assert nv == len(verts) and nf == len(faces)
    head = ply.read_text().splitlines()[:20]
    assert head[0] == "ply"
    assert any(f"element vertex {len(verts)}" in l for l in head)
