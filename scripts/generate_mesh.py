#!/usr/bin/env python
"""Generate a channel-with-cylinder mesh file.

Equivalent of the reference's 3-line gmsh wrapper (generate_mesh.py, which
shells out to ``gmsh -2 -format msh2 2dMeshFine.geo``): emits an MSH2 file
with the benchmark physical ids (7 inlet, 8 outlet, 6 wall, 10 cylinder)
that the ``-M`` path can read back.  ``--tri`` writes the triangulated
variant consumed by the P2/P1 simplex backend.

Usage: python scripts/generate_mesh.py [-m 100,100] [--tri] [-o new_mesh.msh]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--mesh-size", default="100,100", metavar="X,Y")
    ap.add_argument("-o", "--output", default="new_mesh.msh")
    ap.add_argument("--tri", action="store_true", help="triangulated mesh")
    ap.add_argument(
        "--curved",
        action="store_true",
        help="curved-cylinder triangulation (ring vertices exactly on "
        "the r=0.05 circle -- the gmsh/OpenCASCADE 2dMeshFine.geo mesh "
        "class; implies --tri)",
    )
    args = ap.parse_args(argv)

    from navier_stokes_solver_tpu.geometry import make_channel_geometry
    from navier_stokes_solver_tpu.io import write_msh

    nx, ny = (int(v) for v in args.mesh_size.split(","))
    geo = make_channel_geometry(nx, ny)
    if not (args.tri or args.curved):
        write_msh(geo, args.output)
    else:
        import numpy as np

        from navier_stokes_solver_tpu.unstructured import (
            triangulate_channel,
            triangulate_channel_curved,
        )

        if args.curved:
            nodes, tri, edges, tags = triangulate_channel_curved(nx, ny)
        else:
            nodes, tri, edges, tags = triangulate_channel(geo)
        lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes",
                 str(len(nodes))]
        for i, (x, y) in enumerate(nodes):
            lines.append(f"{i + 1} {x:.16g} {y:.16g} 0")
        lines.append("$EndNodes")
        elements = []
        eid = 0
        for (a, b), t in zip(edges, tags):
            eid += 1
            elements.append(f"{eid} 1 2 {t} {t} {a + 1} {b + 1}")
        for (a, b, c) in tri:
            eid += 1
            elements.append(f"{eid} 2 2 0 0 {a + 1} {b + 1} {c + 1}")
        lines += ["$Elements", str(eid), *elements, "$EndElements"]
        with open(args.output, "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
