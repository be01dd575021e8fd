"""Unstructured P2/P1 triangle discretization (the ``-M`` file-mesh path).

The reference's ``-M`` flag reads a gmsh mesh into a triangulation and
switches to simplex elements (NSSolver.cpp:144-209, test.cpp:66-70).  Here
a triangle mesh (from ``io.read_msh`` or by triangulating the internal
channel grid) lowers to a ``SimplexDisc``: flat DoF vectors, per-element
affine maps, and index arrays driving gather / ``segment_sum`` matrix-free
kernels (``unstructured.ops``).

DoF layout (component-wise block renumbering analog, NSSolver.cpp:212-247):
velocity ``[2, n_nodes_v]`` with P2 nodes = vertices then edge midpoints;
pressure ``[n_nodes_p]`` at vertices.  Boundary ids follow the reference:
6 wall, 7 inlet, 8 outlet, 10 cylinder (Dirichlet on {6,7,10}, Neumann on 8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from navier_stokes_solver_tpu.geometry.channel import (
    BOUNDARY_CYLINDER,
    BOUNDARY_INLET,
    BOUNDARY_OUTLET,
    ChannelGeometry,
)
from navier_stokes_solver_tpu.unstructured.elements import (
    EDGE_VERTICES,
    make_simplex_tables,
)

__all__ = [
    "SeamTables",
    "SimplexDisc",
    "invert_scatter",
    "make_simplex_disc",
    "triangulate_channel",
    "triangulate_channel_curved",
]

_DIRICHLET_IDS = (6, 7, 10)


@struct.dataclass
class SeamTables:
    """1-D strip-decomposition seam-exchange tables for one DoF space.

    Local node vectors are padded to a uniform ``n_loc`` across tiles;
    nodes shared with the left/right neighbor strip are listed in
    ``send_l``/``send_r`` (local indices, sentinel ``n_loc`` = unused
    buffer slot), both sides ordered by global node id so the buffers
    align.  ``add_l``/``add_r`` map each local node to its position in
    the buffer received from that neighbor (sentinel ``B`` = nothing to
    add).  ``weight`` is 1/multiplicity per node (0 on padding) -- the
    seam-weighted inner product (the Trilinos owned-DoF dot analog).
    """

    send_l: jax.Array  # [B] int32
    send_r: jax.Array  # [B] int32
    add_l: jax.Array  # [n_loc] int32
    add_r: jax.Array  # [n_loc] int32
    weight: jax.Array  # [n_loc]


@struct.dataclass
class SimplexDisc:
    """Device-side unstructured discretization (pytree)."""

    n_nodes_v: int = struct.field(pytree_node=False)
    n_nodes_p: int = struct.field(pytree_node=False)
    n_tri: int = struct.field(pytree_node=False)

    dofs_v: jax.Array  # [n_tri, 6] int32
    dofs_p: jax.Array  # [n_tri, 3] int32
    coords_v: jax.Array  # [n_nodes_v, 2] P2 node coordinates
    coords_p: jax.Array  # [n_nodes_p, 2] vertex coordinates
    invJ: jax.Array  # [n_tri, 2, 2]  (d xi / d x)
    detJ: jax.Array  # [n_tri]
    u_dirichlet: jax.Array  # [n_nodes_v] bool
    u_inlet: jax.Array  # [n_nodes_v] bool
    inlet_profile1: jax.Array  # [n_nodes_v] parabola at u_max = 1 (x-comp)
    neumann_rhs1: jax.Array  # [2, n_nodes_v] outlet Neumann rhs at p_out = 1
    # cylinder boundary edges (lift/drag): element, local edge, length, normal
    cyl_tri: jax.Array  # [n_ce] int32
    cyl_edge: jax.Array  # [n_ce] int32 (0..2)
    cyl_len: jax.Array  # [n_ce]
    cyl_normal: jax.Array  # [n_ce, 2] outward (into the cylinder)
    # unique-edge endpoint vertices ([n_edges, 2] int32; midpoint node
    # n_verts + i sits on edge i) -- drives the P2 -> P1 p-multigrid
    # transfers (unstructured/pmg.py)
    edge_verts: jax.Array | None = None
    # scatter-inverse tables: for node n, ``gather_v[n, k]`` indexes the
    # flattened [n_tri * 6] element-contribution array (sentinel = its
    # length, pointing at an appended zero).  Turning every scatter-add
    # into a padded gather + small-axis sum keeps the hot programs free
    # of scatter/sort HLO -- the construct behind the simplex backend's
    # pathological TPU compile times (docs/ROADMAP.md round-2 finding).
    gather_v: jax.Array | None = None  # [n_nodes_v, Kv] int32
    gather_p: jax.Array | None = None  # [n_nodes_p, Kp] int32
    gather_ev: jax.Array | None = None  # [n_verts, Ke] into [2*n_edges]
    # pressure nodes on the outlet boundary (id 8): Dirichlet rows of the
    # pressure Laplacian / convection-diffusion Schur legs
    # (ops.matfree.p_outlet_mask analog)
    p_outlet: jax.Array | None = None  # [n_nodes_p] bool
    # P2 -> P1 p-multigrid transfer tables in LOCAL indices (valid on the
    # global disc AND on decomposed tiles -- unstructured/pmg.py):
    #   pmg_vert:   v-slot -> its P1 (vertex) slot, sentinel n_nodes_p
    #   pmg_edge:   midpoint v-slot -> its edge's endpoint P1 slots,
    #               sentinel n_nodes_p on vertex/padding slots
    #   pmg_vert_v: P1 slot -> its v-slot, sentinel n_nodes_v
    #   pmg_mid:    P1 slot -> adjacent midpoint v-slots (padded),
    #               sentinel n_nodes_v
    pmg_vert: jax.Array | None = None  # [n_nodes_v] int32
    pmg_edge: jax.Array | None = None  # [n_nodes_v, 2] int32
    pmg_vert_v: jax.Array | None = None  # [n_nodes_p] int32
    pmg_mid: jax.Array | None = None  # [n_nodes_p, K] int32
    # dense f32 inverses of the (constant per-mesh) pressure mass and
    # pressure Laplacian -- the Schur legs as single MXU matmuls instead
    # of nested Jacobi-CG/FGMRES solves (unstructured/dense.py; None =
    # iterative legs).  Attached by ``attach_dense_schur``.
    dense_mp_raw_inv: jax.Array | None = None
    dense_lp_inv: jax.Array | None = None
    # enable the P1-coarse velocity preconditioner (the simplex analog of
    # the structured geometric-MG ILU/AMG equivalence layer)
    p_mg: bool = struct.field(pytree_node=False, default=False)
    # 1-D strip domain decomposition (dist/simplex.py): device-mesh axis
    # name + tile count, and the velocity/pressure seam-exchange tables
    # (None = single tile)
    halo_axis: str | None = struct.field(pytree_node=False, default=None)
    halo_n: int = struct.field(pytree_node=False, default=1)
    seam_v: SeamTables | None = None
    seam_p: SeamTables | None = None

    @property
    def dtype(self):
        return self.detJ.dtype

    @property
    def tables(self):
        return make_simplex_tables()

    # --- interface shared with the structured Disc (duck-typed) ---
    @property
    def halo_axis_y(self):
        return None

    @property
    def halo_ny(self):
        return 1

    @property
    def mg(self):
        return None

    def zeros_u(self):
        return jnp.zeros((2, self.n_nodes_v), self.dtype)

    def zeros_p(self):
        return jnp.zeros((self.n_nodes_p,), self.dtype)


def triangulate_channel(geo: ChannelGeometry):
    """Split each active quad of the internal channel grid into two
    triangles; returns (nodes_xy, tri, edges, edge_tag) in read_msh layout.

    Plays the role of the repo's gmsh geometry (2dMeshFine.geo) for tests
    and for ``-M`` runs without a mesh file.
    """
    nx, ny = geo.nx, geo.ny
    xs = geo.x0 + np.arange(nx + 1) * geo.hx
    ys = geo.y0 + np.arange(ny + 1) * geo.hy
    X, Y = np.meshgrid(xs, ys)
    nodes_xy = np.stack([X.ravel(), Y.ravel()], axis=1)

    def vid(iy, ix):
        return iy * (nx + 1) + ix

    iy, ix = np.nonzero(geo.cell_active)
    v00, v10 = vid(iy, ix), vid(iy, ix + 1)
    v11, v01 = vid(iy + 1, ix + 1), vid(iy + 1, ix)
    tri = np.concatenate(
        [
            np.stack([v00, v10, v11], axis=1),
            np.stack([v00, v11, v01], axis=1),
        ]
    ).astype(np.int32)

    edges, edge_tag = [], []
    edge_nodes = {
        0: (v00, v01),
        1: (v10, v11),
        2: (v00, v10),
        3: (v01, v11),
    }
    for f in range(4):
        bid = geo.face_id[f][iy, ix]
        sel = bid >= 0
        a, b = edge_nodes[f]
        for aa, bb, t in zip(a[sel], b[sel], bid[sel]):
            edges.append((aa, bb))
            edge_tag.append(t)
    return (
        nodes_xy,
        tri,
        np.asarray(edges, dtype=np.int32).reshape(-1, 2),
        np.asarray(edge_tag, dtype=np.int32),
    )


def triangulate_channel_curved(
    nx: int,
    ny: int,
    *,
    cx: float = 0.2,
    cy: float = 0.2,
    r: float = 0.05,
    L: float = 2.2,
    H: float = 0.41,
):
    """Curved-cylinder channel triangulation (the gmsh-geometry analog).

    The reference generates its ``-M`` meshes from an OpenCASCADE
    rectangle-minus-circle geometry (2dMeshFine.geo:1-55: 2.2 x 0.41
    channel, circle r=0.05 at (0.2, 0.2), physical ids 7 inlet / 8
    outlet / 6 wall / 10 cylinder) via ``gmsh -2 -format msh2``
    (generate_mesh.py).  gmsh's linear triangles approximate the circle
    by a polygon whose vertices lie exactly on it; this function builds
    the same class of mesh without gmsh: background grid points (those
    within ~0.7 h of the circle removed), ring points exactly on the
    circle at ~h spacing, Delaunay triangulation, triangles whose
    centroid falls inside the circle dropped.  Returns
    (nodes_xy, tri, edges, edge_tag) in ``io.read_msh`` layout.
    """
    from scipy.spatial import Delaunay

    xs = np.linspace(0.0, L, nx + 1)
    ys = np.linspace(0.0, H, ny + 1)
    X, Y = np.meshgrid(xs, ys)
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    h = min(L / nx, H / ny)
    d = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
    pts = pts[d > r + 0.7 * h]
    n_ring = max(12, int(np.ceil(2.0 * np.pi * r / h)))
    th = 2.0 * np.pi * np.arange(n_ring) / n_ring
    ring = np.stack([cx + r * np.cos(th), cy + r * np.sin(th)], axis=1)
    nodes = np.concatenate([pts, ring])
    tri = Delaunay(nodes).simplices.astype(np.int32)
    cent = nodes[tri].mean(axis=1)
    tri = tri[np.hypot(cent[:, 0] - cx, cent[:, 1] - cy) >= r]

    # boundary edges = edges referenced by exactly one remaining triangle
    pairs = np.sort(
        np.concatenate([tri[:, [0, 1]], tri[:, [1, 2]], tri[:, [2, 0]]]),
        axis=1,
    )
    uniq, counts = np.unique(pairs, axis=0, return_counts=True)
    bedges = uniq[counts == 1]

    def _tag(e):
        a, b = nodes[e[0]], nodes[e[1]]
        tol = 1e-9
        if abs(a[0]) < tol and abs(b[0]) < tol:
            return BOUNDARY_INLET
        if abs(a[0] - L) < tol and abs(b[0] - L) < tol:
            return BOUNDARY_OUTLET
        on_circle = (
            abs(np.hypot(*(a - [cx, cy])) - r) < 1e-9
            and abs(np.hypot(*(b - [cx, cy])) - r) < 1e-9
        )
        if on_circle:
            return BOUNDARY_CYLINDER
        return 6  # walls (y = 0 / y = H)

    btags = np.asarray([_tag(e) for e in bedges], dtype=np.int32)
    return nodes, tri, bedges.astype(np.int32), btags


def invert_scatter(idx: np.ndarray, n_nodes: int) -> np.ndarray:
    """Invert a scatter-add index map into a padded gather table.

    ``idx`` (any shape, values in [0, n_nodes)) assigns each flat source
    slot to a destination node.  Returns ``[n_nodes, K]`` int32 where row
    ``n`` lists the flat source positions contributing to node ``n``,
    padded with the sentinel ``idx.size`` (callers append one zero to the
    flattened source so the sentinel gathers 0.0).
    """
    flat = np.asarray(idx).reshape(-1)
    order = np.argsort(flat, kind="stable")
    sorted_nodes = flat[order]
    counts = np.bincount(sorted_nodes, minlength=n_nodes)
    k_max = int(counts.max()) if counts.size else 0
    out = np.full((n_nodes, max(k_max, 1)), flat.size, dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    pos = np.arange(flat.size) - starts[sorted_nodes]
    out[sorted_nodes, pos] = order
    return out


def make_simplex_disc(
    nodes_xy: np.ndarray,
    tri: np.ndarray,
    bedges: np.ndarray,
    bedge_tag: np.ndarray,
    dtype=None,
    H: float = 0.41,
) -> SimplexDisc:
    """Lower a triangle mesh to device data.

    ``bedges``/``bedge_tag``: boundary line elements with physical ids.
    """
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    nodes_xy = np.asarray(nodes_xy, dtype=np.float64)
    tri = np.asarray(tri, dtype=np.int64)
    n_verts = nodes_xy.shape[0]
    n_tri = tri.shape[0]

    # ---- unique edges -> P2 midpoint numbering ----
    pairs = np.concatenate(
        [np.sort(tri[:, list(e)], axis=1) for e in EDGE_VERTICES]
    )  # [3*n_tri, 2]
    uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
    n_edges = uniq.shape[0]
    dofs_v = np.empty((n_tri, 6), dtype=np.int32)
    dofs_v[:, :3] = tri
    for k in range(3):
        dofs_v[:, 3 + k] = n_verts + inv[k * n_tri : (k + 1) * n_tri]
    mid_xy = 0.5 * (nodes_xy[uniq[:, 0]] + nodes_xy[uniq[:, 1]])
    coords_v = np.concatenate([nodes_xy, mid_xy])
    n_nodes_v = n_verts + n_edges

    # ---- affine maps ----
    v0 = nodes_xy[tri[:, 0]]
    e1 = nodes_xy[tri[:, 1]] - v0
    e2 = nodes_xy[tri[:, 2]] - v0
    detJ = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    if np.any(detJ <= 0):
        # flip inverted triangles to positive orientation
        flip = detJ <= 0
        tri[flip, 1], tri[flip, 2] = tri[flip, 2].copy(), tri[flip, 1].copy()
        dofs_v[flip, :3] = tri[flip]
        # recompute edge dofs for flipped elements
        pairs = np.concatenate(
            [np.sort(tri[:, list(e)], axis=1) for e in EDGE_VERTICES]
        )
        uniq2, inv2 = np.unique(pairs, axis=0, return_inverse=True)
        assert np.array_equal(uniq2, uniq)
        for k in range(3):
            dofs_v[:, 3 + k] = n_verts + inv2[k * n_tri : (k + 1) * n_tri]
        v0 = nodes_xy[tri[:, 0]]
        e1 = nodes_xy[tri[:, 1]] - v0
        e2 = nodes_xy[tri[:, 2]] - v0
        detJ = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    J = np.stack([e1, e2], axis=-1)  # [n_tri, 2, 2], columns e1, e2
    invJ = np.linalg.inv(J)  # d xi / d x

    # ---- boundary node masks ----
    bedges_s = np.sort(np.asarray(bedges, dtype=np.int64), axis=1)
    u_dir = np.zeros(n_nodes_v, dtype=bool)
    u_inl = np.zeros(n_nodes_v, dtype=bool)
    edge_lookup = {tuple(e): i for i, e in enumerate(map(tuple, uniq))}
    for (a, b), tag in zip(map(tuple, bedges_s), bedge_tag):
        mid = edge_lookup.get((a, b))
        ids = [a, b] + ([n_verts + mid] if mid is not None else [])
        if tag in _DIRICHLET_IDS:
            u_dir[ids] = True
        if tag == BOUNDARY_INLET:
            u_inl[ids] = True

    y_v = coords_v[:, 1]
    inlet_profile1 = 4.0 * y_v * (H - y_v) / (H * H)

    p_out_mask = np.zeros(n_verts, dtype=bool)
    for (a, b), tag in zip(map(tuple, bedges_s), bedge_tag):
        if tag == BOUNDARY_OUTLET:
            p_out_mask[[a, b]] = True

    # ---- boundary edge -> (tri, local edge) map ----
    tri_edge_lookup: dict[tuple[int, int], tuple[int, int]] = {}
    for k, e in enumerate(EDGE_VERTICES):
        for t in range(n_tri):
            key = tuple(np.sort(tri[t, list(e)]))
            tri_edge_lookup.setdefault(key, (t, k))

    def boundary_edge_data(tag_sel):
        tris, ledges, lens, normals = [], [], [], []
        for (a, b), tag in zip(map(tuple, bedges_s), bedge_tag):
            if tag != tag_sel:
                continue
            hit = tri_edge_lookup.get((a, b))
            if hit is None:
                continue
            t, k = hit
            va, vb = EDGE_VERTICES[k]
            pa, pb = nodes_xy[tri[t, va]], nodes_xy[tri[t, vb]]
            d = pb - pa
            length = float(np.hypot(*d))
            n = np.array([d[1], -d[0]]) / max(length, 1e-300)
            centroid = nodes_xy[tri[t]].mean(axis=0)
            if np.dot(n, centroid - 0.5 * (pa + pb)) > 0:
                n = -n
            tris.append(t)
            ledges.append(k)
            lens.append(length)
            normals.append(n)
        return (
            np.asarray(tris, dtype=np.int32),
            np.asarray(ledges, dtype=np.int32),
            np.asarray(lens, dtype=np.float64),
            np.asarray(normals, dtype=np.float64).reshape(-1, 2),
        )

    cyl_tri, cyl_edge, cyl_len, cyl_normal = boundary_edge_data(BOUNDARY_CYLINDER)

    # ---- outlet Neumann rhs at p_out = 1 (NSSolver.cpp:528-551) ----
    t_tabs = make_simplex_tables()
    out = np.zeros((2, n_nodes_v))
    o_tri, o_edge, o_len, o_normal = boundary_edge_data(BOUNDARY_OUTLET)
    for t, k, L, n in zip(o_tri, o_edge, o_len, o_normal):
        phis = t_tabs.phi_v_edge[k]  # [n_qe, 6]
        loc = -np.einsum("q,qm->m", t_tabs.w_e * L, phis)  # rhs contribution
        for c in range(2):
            if n[c] == 0.0:
                continue
            np.add.at(out[c], dofs_v[t], loc * n[c])

    # ---- P2 -> P1 p-multigrid transfer tables (local = global here) ----
    pmg_vert = np.full(n_nodes_v, n_verts, dtype=np.int32)
    pmg_vert[:n_verts] = np.arange(n_verts)
    pmg_edge = np.full((n_nodes_v, 2), n_verts, dtype=np.int32)
    pmg_edge[n_verts:] = uniq
    pmg_vert_v = np.arange(n_verts, dtype=np.int32)
    ge = invert_scatter(np.concatenate([uniq[:, 0], uniq[:, 1]]), n_verts)
    pmg_mid = np.where(
        ge == 2 * n_edges, n_nodes_v, n_verts + (ge % max(n_edges, 1))
    ).astype(np.int32)

    return SimplexDisc(
        n_nodes_v=n_nodes_v,
        n_nodes_p=n_verts,
        n_tri=n_tri,
        dofs_v=jnp.asarray(dofs_v),
        dofs_p=jnp.asarray(tri.astype(np.int32)),
        coords_v=jnp.asarray(coords_v, dtype),
        coords_p=jnp.asarray(nodes_xy, dtype),
        invJ=jnp.asarray(invJ, dtype),
        detJ=jnp.asarray(detJ, dtype),
        u_dirichlet=jnp.asarray(u_dir),
        u_inlet=jnp.asarray(u_inl),
        inlet_profile1=jnp.asarray(inlet_profile1, dtype),
        neumann_rhs1=jnp.asarray(out, dtype),
        cyl_tri=jnp.asarray(cyl_tri),
        cyl_edge=jnp.asarray(cyl_edge),
        cyl_len=jnp.asarray(cyl_len, dtype),
        cyl_normal=jnp.asarray(cyl_normal, dtype),
        edge_verts=jnp.asarray(uniq.astype(np.int32)),
        gather_v=jnp.asarray(invert_scatter(dofs_v, n_nodes_v)),
        gather_p=jnp.asarray(invert_scatter(tri, n_verts)),
        gather_ev=jnp.asarray(
            invert_scatter(uniq.T, n_verts)  # [2*n_edges] = [ep0..., ep1...]
        ),
        p_outlet=jnp.asarray(p_out_mask),
        pmg_vert=jnp.asarray(pmg_vert),
        pmg_edge=jnp.asarray(pmg_edge),
        pmg_vert_v=jnp.asarray(pmg_vert_v),
        pmg_mid=jnp.asarray(pmg_mid),
    )
