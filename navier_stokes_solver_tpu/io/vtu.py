"""VTU / PVTU output of (velocity, pressure) fields.

Equivalent of the reference's ``DataOut::write_vtu_with_pvtu_record``
(NSSolver.cpp:761-797): one quad patch per active cell with fields sampled at
cell corner vertices (deal.II ``build_patches()`` with the default single
subdivision), a per-cell ``partitioning`` field, and a ``.pvtu`` master
record grouping per-counter files with a 3-digit counter (NSSolver.cpp:789).

Pure NumPy, binary appended-data encoding.  A C++ fast path (for very large
meshes) can slot in behind the same signature.
"""

from __future__ import annotations

import base64
import os
import struct

import numpy as np

from navier_stokes_solver_tpu.geometry.space import FESpace

__all__ = ["write_vtu", "write_vtu_record"]


def _b64_block(arr: np.ndarray) -> str:
    raw = arr.tobytes()
    header = struct.pack("<I", len(raw))
    return base64.b64encode(header + raw).decode("ascii")


def _corner_fields(space: FESpace, u: np.ndarray, p: np.ndarray):
    """Sample velocity and pressure at the cell-corner vertex lattice."""
    kv, kp = space.deg_v, space.deg_p
    u_c = u[:, ::kv, ::kv]  # [2, ny+1, nx+1]
    p_c = p[::kp, ::kp]  # [ny+1, nx+1]
    return u_c, p_c


def write_vtu(
    space: FESpace,
    u: np.ndarray,
    p: np.ndarray,
    path: str,
    *,
    partitioning: np.ndarray | None = None,
    cell_range: tuple[int, int, int, int] | None = None,
) -> str:
    """Write one VTU piece.

    ``cell_range = (y0, y1, x0, x1)``: restrict to that cell sub-rectangle
    (a decomposition tile); vertex lattices of adjacent pieces share their
    seam row/column, matching deal.II's per-rank pieces without ghost
    cells.  Default: the whole grid as one piece.
    """
    geo = space.geo
    y0c, y1c, x0c, x1c = cell_range or (0, geo.ny, 0, geo.nx)
    ny, nx = y1c - y0c, x1c - x0c
    act = geo.cell_active[y0c:y1c, x0c:x1c]

    # vertex lattice (corners) of the sub-rectangle
    xs = geo.x0 + (x0c + np.arange(nx + 1)) * geo.hx
    ys = geo.y0 + (y0c + np.arange(ny + 1)) * geo.hy
    X, Y = np.meshgrid(xs, ys)
    n_pts = (nx + 1) * (ny + 1)
    points = np.zeros((n_pts, 3))
    points[:, 0] = X.ravel()
    points[:, 1] = Y.ravel()

    def vid(iy, ix):
        return iy * (nx + 1) + ix

    iy, ix = np.nonzero(act)
    conn = np.stack(
        [vid(iy, ix), vid(iy, ix + 1), vid(iy + 1, ix + 1), vid(iy + 1, ix)],
        axis=1,
    ).astype(np.int32)
    n_cells = conn.shape[0]
    offsets = (np.arange(n_cells, dtype=np.int32) + 1) * 4
    types = np.full(n_cells, 9, dtype=np.uint8)  # VTK_QUAD

    u_c, p_c = _corner_fields(space, np.asarray(u), np.asarray(p))
    u_c = u_c[:, y0c : y1c + 1, x0c : x1c + 1]
    p_c = p_c[y0c : y1c + 1, x0c : x1c + 1]
    vel = np.zeros((n_pts, 3))
    vel[:, 0] = u_c[0].ravel()
    vel[:, 1] = u_c[1].ravel()
    pres = p_c.ravel()
    if partitioning is None:
        partitioning = np.zeros(n_cells)
    elif np.ndim(partitioning) == 0:
        partitioning = np.full(n_cells, float(partitioning))
    else:
        partitioning = np.asarray(partitioning, dtype=np.float64)[
            y0c:y1c, x0c:x1c
        ][act]

    # C++ fast path (native/), same file layout; fall back to pure Python.
    from navier_stokes_solver_tpu.native import write_vtu_native

    if write_vtu_native(path, points, conn, vel, pres, partitioning):
        return path

    parts = []
    parts.append('<?xml version="1.0"?>')
    parts.append(
        '<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">'
    )
    parts.append("<UnstructuredGrid>")
    parts.append(f'<Piece NumberOfPoints="{n_pts}" NumberOfCells="{n_cells}">')
    parts.append("<Points>")
    parts.append(
        '<DataArray type="Float64" NumberOfComponents="3" format="binary">'
        + _b64_block(points.astype("<f8"))
        + "</DataArray>"
    )
    parts.append("</Points>")
    parts.append("<Cells>")
    parts.append(
        '<DataArray type="Int32" Name="connectivity" format="binary">'
        + _b64_block(conn.astype("<i4"))
        + "</DataArray>"
    )
    parts.append(
        '<DataArray type="Int32" Name="offsets" format="binary">'
        + _b64_block(offsets.astype("<i4"))
        + "</DataArray>"
    )
    parts.append(
        '<DataArray type="UInt8" Name="types" format="binary">'
        + _b64_block(types)
        + "</DataArray>"
    )
    parts.append("</Cells>")
    parts.append('<PointData Vectors="velocity">')
    parts.append(
        '<DataArray type="Float64" Name="velocity" NumberOfComponents="3" '
        'format="binary">' + _b64_block(vel.astype("<f8")) + "</DataArray>"
    )
    parts.append(
        '<DataArray type="Float64" Name="pressure" format="binary">'
        + _b64_block(pres.astype("<f8"))
        + "</DataArray>"
    )
    parts.append("</PointData>")
    parts.append("<CellData>")
    parts.append(
        '<DataArray type="Float64" Name="partitioning" format="binary">'
        + _b64_block(partitioning.astype("<f8"))
        + "</DataArray>"
    )
    parts.append("</CellData>")
    parts.append("</Piece>")
    parts.append("</UnstructuredGrid>")
    parts.append("</VTKFile>")
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path


def write_vtu_tri(
    disc,
    u: np.ndarray,
    p: np.ndarray,
    path: str,
    *,
    partitioning: np.ndarray | None = None,
) -> str:
    """VTU output for the unstructured P2/P1 backend (triangle cells,
    fields sampled at vertices)."""
    coords = np.asarray(disc.coords_p)
    tri = np.asarray(disc.dofs_p, dtype=np.int32)
    n_pts = coords.shape[0]
    n_cells = tri.shape[0]
    points = np.zeros((n_pts, 3))
    points[:, :2] = coords
    vel = np.zeros((n_pts, 3))
    vel[:, 0] = np.asarray(u)[0, :n_pts]
    vel[:, 1] = np.asarray(u)[1, :n_pts]
    pres = np.asarray(p)
    if partitioning is None:
        partitioning = np.zeros(n_cells)

    # (the native writer emits quad cells; triangles use the Python path)
    parts = []
    parts.append('<?xml version="1.0"?>')
    parts.append(
        '<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">'
    )
    parts.append("<UnstructuredGrid>")
    parts.append(f'<Piece NumberOfPoints="{n_pts}" NumberOfCells="{n_cells}">')
    parts.append("<Points>")
    parts.append(
        '<DataArray type="Float64" NumberOfComponents="3" format="binary">'
        + _b64_block(points.astype("<f8"))
        + "</DataArray>"
    )
    parts.append("</Points>")
    parts.append("<Cells>")
    offsets = (np.arange(n_cells, dtype=np.int32) + 1) * 3
    types = np.full(n_cells, 5, dtype=np.uint8)  # VTK_TRIANGLE
    parts.append(
        '<DataArray type="Int32" Name="connectivity" format="binary">'
        + _b64_block(tri.astype("<i4"))
        + "</DataArray>"
    )
    parts.append(
        '<DataArray type="Int32" Name="offsets" format="binary">'
        + _b64_block(offsets)
        + "</DataArray>"
    )
    parts.append(
        '<DataArray type="UInt8" Name="types" format="binary">'
        + _b64_block(types)
        + "</DataArray>"
    )
    parts.append("</Cells>")
    parts.append('<PointData Vectors="velocity">')
    parts.append(
        '<DataArray type="Float64" Name="velocity" NumberOfComponents="3" '
        'format="binary">' + _b64_block(vel.astype("<f8")) + "</DataArray>"
    )
    parts.append(
        '<DataArray type="Float64" Name="pressure" format="binary">'
        + _b64_block(pres.astype("<f8"))
        + "</DataArray>"
    )
    parts.append("</PointData>")
    parts.append("<CellData>")
    parts.append(
        '<DataArray type="Float64" Name="partitioning" format="binary">'
        + _b64_block(np.asarray(partitioning, dtype=np.float64))
        + "</DataArray>"
    )
    parts.append("</CellData>")
    parts.append("</Piece>")
    parts.append("</UnstructuredGrid>")
    parts.append("</VTKFile>")
    with open(path, "w") as f:
        f.write("\n".join(parts))
    return path


def write_vtu_record(
    space: FESpace,
    u: np.ndarray,
    p: np.ndarray,
    *,
    directory: str = ".",
    basename: str = "output",
    counter: int = 0,
    partitioning: np.ndarray | None = None,
    tiles: tuple[int, int] | None = None,
) -> str:
    """Write per-piece ``output_NNN.R.vtu`` files + the ``.pvtu`` master
    record (3-digit grouping, NSSolver.cpp:789-793).

    ``tiles = (x_tiles, y_tiles)``: one piece per decomposition tile (the
    reference writes one piece per MPI rank) with ``partitioning`` = tile
    id (DataOut partitioning field, NSSolver.cpp:781-784).  Default: one
    piece, partitioning zero (a single-rank run).
    """
    os.makedirs(directory, exist_ok=True)
    geo = space.geo
    n_x, n_y = tiles or (1, 1)
    if geo.nx % n_x or geo.ny % n_y:
        raise ValueError(
            f"tiles {n_x}x{n_y} must divide the {geo.nx}x{geo.ny} grid "
            "(pieces would silently drop trailing cell rows/columns)"
        )
    nxl, nyl = geo.nx // n_x, geo.ny // n_y
    pieces = []
    for iy in range(n_y):
        for ix in range(n_x):
            rank = iy * n_x + ix
            piece = f"{basename}_{counter:03d}.{rank}.vtu"
            pieces.append(piece)
            write_vtu(
                space,
                u,
                p,
                os.path.join(directory, piece),
                partitioning=(
                    float(rank) if tiles is not None else partitioning
                ),
                cell_range=(
                    None
                    if tiles is None
                    else (iy * nyl, (iy + 1) * nyl, ix * nxl, (ix + 1) * nxl)
                ),
            )
    pvtu = os.path.join(directory, f"{basename}_{counter:03d}.pvtu")
    _write_pvtu(pvtu, pieces)
    return pvtu


def _write_pvtu(path: str, pieces: list[str]):
    with open(path, "w") as f:
        f.write(
            "\n".join(
                [
                    '<?xml version="1.0"?>',
                    '<VTKFile type="PUnstructuredGrid" version="0.1" '
                    'byte_order="LittleEndian">',
                    '<PUnstructuredGrid GhostLevel="0">',
                    "<PPoints>",
                    '<PDataArray type="Float64" NumberOfComponents="3"/>',
                    "</PPoints>",
                    '<PPointData Vectors="velocity">',
                    '<PDataArray type="Float64" Name="velocity" '
                    'NumberOfComponents="3"/>',
                    '<PDataArray type="Float64" Name="pressure"/>',
                    "</PPointData>",
                    "<PCellData>",
                    '<PDataArray type="Float64" Name="partitioning"/>',
                    "</PCellData>",
                ]
                + [f'<Piece Source="{pc}"/>' for pc in pieces]
                + [
                    "</PUnstructuredGrid>",
                    "</VTKFile>",
                ]
            )
        )


def write_vtu_tri_record(
    dd,
    u: np.ndarray,
    p: np.ndarray,
    *,
    directory: str = ".",
    basename: str = "output",
    counter: int = 0,
) -> str:
    """Per-strip pieces + ``.pvtu`` master for a decomposed simplex mesh
    (``dist.simplex.DecomposedSimplex``), partitioning = strip id -- the
    -M analog of ``write_vtu_record``'s per-tile pieces (one piece per
    MPI rank, NSSolver.cpp:789-793).  ``u``/``p`` are GLOBAL fields.
    """
    import types

    os.makedirs(directory, exist_ok=True)
    n_dev = dd.v_global.shape[0]
    detJ = np.asarray(dd.disc.detJ)
    dofs_p = np.asarray(dd.disc.dofs_p)
    coords_p = np.asarray(dd.disc.coords_p)
    u = np.asarray(u)
    p = np.asarray(p)
    pieces = []
    for t in range(n_dev):
        real = detJ[t] > 0  # padding elements have zero measure
        n_loc = int((dd.p_global[t] >= 0).sum())
        gid = dd.p_global[t][:n_loc]
        local = types.SimpleNamespace(
            coords_p=coords_p[t][:n_loc], dofs_p=dofs_p[t][real]
        )
        piece = f"{basename}_{counter:03d}.{t}.vtu"
        pieces.append(piece)
        write_vtu_tri(
            local,
            u[:, gid],
            p[gid],
            os.path.join(directory, piece),
            partitioning=np.full(int(real.sum()), float(t)),
        )
    pvtu = os.path.join(directory, f"{basename}_{counter:03d}.pvtu")
    _write_pvtu(pvtu, pieces)
    return pvtu
