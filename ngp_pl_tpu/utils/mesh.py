"""Mesh extraction from the trained density field.

The reference extracts meshes in test.ipynb via a dense `model.density` grid +
pymcubes marching cubes + trimesh export.  This environment has neither
package, so isosurfacing is implemented here directly with **marching
tetrahedra** (each cube split into 6 tets; every tet crossing the iso level
emits 1-2 triangles with linear-interpolated vertices) — compact,
dependency-free, and watertight on shared cube faces.  Export is plain
OBJ/PLY text.
"""
from __future__ import annotations

import numpy as np

# 6-tetrahedra decomposition of a cube, vertex indices into the cube corner
# numbering c = (dx, dy, dz) -> dx*4 + dy*2 + dz
_TETS = np.array([
    [0, 5, 1, 3],
    [0, 5, 3, 2],
    [0, 5, 2, 4],
    [5, 2, 4, 6],
    [5, 3, 2, 7],
    [5, 2, 6, 7],
])
_CORNERS = np.array([(x, y, z) for x in range(2) for y in range(2)
                     for z in range(2)])


def density_grid_query(density_fn, resolution: int, scale: float,
                       chunk: int = 2 ** 17) -> np.ndarray:
    """Evaluate sigma on a dense (R, R, R) grid spanning [-scale, scale]^3."""
    lin = np.linspace(-scale, scale, resolution, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    pts = np.stack([x, y, z], axis=-1).reshape(-1, 3)
    out = np.empty(pts.shape[0], np.float32)
    for i in range(0, pts.shape[0], chunk):
        out[i:i + chunk] = np.asarray(density_fn(pts[i:i + chunk]))
    return out.reshape(resolution, resolution, resolution)


def marching_tetrahedra(values: np.ndarray, level: float):
    """values: (R, R, R) scalar field. Returns (verts (V, 3) in index space,
    faces (F, 3) int)."""
    R = values.shape[0]
    inside = values > level

    verts = []
    faces = []
    edge_cache = {}

    def edge_vertex(ia, ib):
        key = (ia, ib) if ia < ib else (ib, ia)
        v = edge_cache.get(key)
        if v is not None:
            return v
        pa = np.array(np.unravel_index(ia, values.shape), np.float32)
        pb = np.array(np.unravel_index(ib, values.shape), np.float32)
        va, vb = flat[ia], flat[ib]
        t = (level - va) / (vb - va) if vb != va else 0.5
        verts.append(pa + t * (pb - pa))
        idx = len(verts) - 1
        edge_cache[key] = idx
        return idx

    flat = values.reshape(-1)
    inside_flat = inside.reshape(-1)
    stride = np.array([R * R, R, 1])

    # only visit cubes whose 8 corners straddle the level (fast prefilter)
    occ = inside[:-1, :-1, :-1]
    any_in = occ.copy()
    all_in = occ.copy()
    for dx, dy, dz in _CORNERS[1:]:
        c = inside[dx:R - 1 + dx, dy:R - 1 + dy, dz:R - 1 + dz]
        any_in |= c
        all_in &= c
    active = np.argwhere(any_in & ~all_in)

    corner_off = _CORNERS @ stride
    for cx, cy, cz in active:
        base = cx * R * R + cy * R + cz
        cidx = base + corner_off                      # 8 flat corner indices
        for tet in _TETS:
            t = cidx[tet]
            ins = inside_flat[t]
            n_in = int(ins.sum())
            if n_in == 0 or n_in == 4:
                continue
            in_v = t[ins]
            out_v = t[~ins]
            if n_in == 1:
                a = in_v[0]
                e = [edge_vertex(a, b) for b in out_v]
                faces.append(e)
            elif n_in == 3:
                a = out_v[0]
                e = [edge_vertex(b, a) for b in in_v]
                faces.append([e[0], e[2], e[1]])
            else:  # 2 in, 2 out -> quad -> 2 triangles
                a0, a1 = in_v
                b0, b1 = out_v
                e00 = edge_vertex(a0, b0)
                e01 = edge_vertex(a0, b1)
                e10 = edge_vertex(a1, b0)
                e11 = edge_vertex(a1, b1)
                faces.append([e00, e01, e11])
                faces.append([e00, e11, e10])

    if not verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return np.stack(verts), np.asarray(faces, np.int32)


def extract_mesh(density_fn, resolution: int = 128, scale: float = 0.5,
                 level: float = 20.0):
    """density_fn: (N, 3) world pts -> (N,) sigma.  Returns (verts (V, 3) in
    world coords, faces (F, 3)).  Default iso level ~20 matches the
    reference notebook's sigma threshold."""
    values = density_grid_query(density_fn, resolution, scale)
    verts, faces = marching_tetrahedra(values, level)
    if len(verts):
        verts = verts / (resolution - 1) * 2 * scale - scale
    return verts, faces


def save_mesh_obj(path: str, verts: np.ndarray, faces: np.ndarray):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces:
            f.write(f"f {tri[0] + 1} {tri[1] + 1} {tri[2] + 1}\n")


def save_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray,
                  colors: np.ndarray | None = None):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for i, v in enumerate(verts):
            line = f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}"
            if colors is not None:
                c = (np.clip(colors[i], 0, 1) * 255).astype(int)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
