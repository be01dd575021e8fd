"""gmsh MSH2 export of the structured channel mesh.

Equivalent of the reference's ``GridOut::write_msh(mesh, "mesh.msh")``
(NSSolver.cpp:108-110): quad elements with the boundary edges tagged with
their physical ids (6 wall, 7 inlet, 8 outlet, 10 cylinder).
"""

from __future__ import annotations

import numpy as np

from navier_stokes_solver_tpu.geometry.channel import ChannelGeometry, INTERIOR

__all__ = ["write_msh"]


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
