"""gmsh MSH2 import/export of meshes.

Export: equivalent of the reference's ``GridOut::write_msh(mesh, "mesh.msh")``
(NSSolver.cpp:108-110): quad elements with the boundary edges tagged with
their physical ids (6 wall, 7 inlet, 8 outlet, 10 cylinder).

Import: equivalent of ``GridIn::read_msh`` used by the ``-M`` CLI path
(NSSolver.cpp:155-161); the C++ parser in ``native/`` is used when
available, with a pure-Python fallback.
"""

from __future__ import annotations

import numpy as np

from navier_stokes_solver_tpu.geometry.channel import ChannelGeometry, INTERIOR

__all__ = ["write_msh", "read_msh"]


def _read_msh_python(path: str) -> dict:
    """Minimal MSH2 parser (nodes + line/tri/quad elements, physical tags)."""
    nodes_xy = []
    node_ids = []
    tri, tri_tag, quad, quad_tag, edges, edge_tag = [], [], [], [], [], []
    with open(path) as f:
        lines = iter(f)
        for line in lines:
            if line.startswith("$Nodes"):
                n = int(next(lines))
                for _ in range(n):
                    parts = next(lines).split()
                    node_ids.append(int(parts[0]))
                    nodes_xy.append((float(parts[1]), float(parts[2])))
            elif line.startswith("$Elements"):
                id_map = {g: i for i, g in enumerate(node_ids)}
                n = int(next(lines))
                for _ in range(n):
                    parts = next(lines).split()
                    etype = int(parts[1])
                    ntags = int(parts[2])
                    tag = int(parts[3]) if ntags else 0
                    verts = [id_map[int(v)] for v in parts[3 + ntags :]]
                    if etype == 1:
                        edges.append(verts)
                        edge_tag.append(tag)
                    elif etype == 2:
                        tri.append(verts)
                        tri_tag.append(tag)
                    elif etype == 3:
                        quad.append(verts)
                        quad_tag.append(tag)
    return dict(
        nodes_xy=np.asarray(nodes_xy, dtype=np.float64).reshape(-1, 2),
        tri=np.asarray(tri, dtype=np.int32).reshape(-1, 3),
        tri_tag=np.asarray(tri_tag, dtype=np.int32),
        quad=np.asarray(quad, dtype=np.int32).reshape(-1, 4),
        quad_tag=np.asarray(quad_tag, dtype=np.int32),
        edges=np.asarray(edges, dtype=np.int32).reshape(-1, 2),
        edge_tag=np.asarray(edge_tag, dtype=np.int32),
    )


def read_msh(path: str) -> dict:
    """Parse a gmsh MSH2 file (C++ fast path, Python fallback).

    Returns dict(nodes_xy [n,2], tri [t,3], tri_tag, quad [q,4], quad_tag,
    edges [e,2], edge_tag) with 0-based connectivity.
    """
    from navier_stokes_solver_tpu.native import read_msh_native

    out = read_msh_native(path)
    return out if out is not None else _read_msh_python(path)


def write_msh(geo: ChannelGeometry, path: str) -> str:
    nx, ny = geo.nx, geo.ny
    xs = geo.x0 + np.arange(nx + 1) * geo.hx
    ys = geo.y0 + np.arange(ny + 1) * geo.hy

    def vid(iy, ix):
        return iy * (nx + 1) + ix + 1  # gmsh ids are 1-based

    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes",
             str((nx + 1) * (ny + 1))]
    for iy in range(ny + 1):
        for ix in range(nx + 1):
            lines.append(f"{vid(iy, ix)} {xs[ix]:.16g} {ys[iy]:.16g} 0")
    lines.append("$EndNodes")

    elements = []
    eid = 0
    # boundary edges first (element type 1 = 2-node line)
    # face order (W, E, S, N); edge endpoints in the corner lattice
    edge_nodes = {
        0: lambda iy, ix: (vid(iy, ix), vid(iy + 1, ix)),
        1: lambda iy, ix: (vid(iy, ix + 1), vid(iy + 1, ix + 1)),
        2: lambda iy, ix: (vid(iy, ix), vid(iy, ix + 1)),
        3: lambda iy, ix: (vid(iy + 1, ix), vid(iy + 1, ix + 1)),
    }
    for f in range(4):
        for iy in range(ny):
            for ix in range(nx):
                bid = geo.face_id[f, iy, ix]
                if bid == INTERIOR:
                    continue
                a, b = edge_nodes[f](iy, ix)
                eid += 1
                elements.append(f"{eid} 1 2 {bid} {bid} {a} {b}")
    # quads (element type 3), material id as physical tag
    for iy in range(ny):
        for ix in range(nx):
            if not geo.cell_active[iy, ix]:
                continue
            mat = 10 if geo.cell_ring[iy, ix] else 0
            eid += 1
            elements.append(
                f"{eid} 3 2 {mat} {mat} "
                f"{vid(iy, ix)} {vid(iy, ix + 1)} "
                f"{vid(iy + 1, ix + 1)} {vid(iy + 1, ix)}"
            )

    lines += ["$Elements", str(eid), *elements, "$EndElements"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path
