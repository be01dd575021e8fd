"""1-D strip domain decomposition of the unstructured simplex backend.

TPU-native analog of the reference's MPI-distributed triangulation on the
``-M`` mesh-file path (deal.II ``parallel::fullydistributed``, Trilinos
ghost exchange -- NSSolver.cpp:98-102, :560-562), mirroring the structured
lattice decomposition (dist/halo.py) on arbitrary triangle meshes:

  * elements are split into ``n_dev`` contiguous strips by centroid x
    (equal element counts -- the load-balance analog of deal.II's
    partitioning); each strip keeps a local copy of every node its
    elements touch, so strip-boundary nodes are duplicated (ghost DoFs);
  * all tile-local arrays are padded to uniform shapes and stacked on a
    leading tile axis, sharded over the device mesh's ``'x'`` axis;
  * operator scatters complete their seam partial sums with
    ``lax.ppermute`` ring exchanges (``unstructured.ops._seam_sum``);
    inner products weight duplicated nodes by 1/multiplicity and ``psum``;
    lift/drag reduces with ``psum`` (Utilities::MPI::sum analog).

The fused time loop (``timeloop.fused`` via ``dist.make_dist_time_step``)
runs unchanged on the decomposed disc: the backend dispatch plus the
seam-aware scatters/dots make the tile-local program SPMD-correct.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from navier_stokes_solver_tpu.ops.blocks import Blocks
from navier_stokes_solver_tpu.unstructured.tri import (
    SeamTables,
    SimplexDisc,
    invert_scatter,
    make_simplex_disc,
)

__all__ = [
    "DecomposedSimplex",
    "decompose_simplex_disc",
    "scatter_simplex_blocks",
    "gather_simplex_blocks",
]


class DecomposedSimplex(NamedTuple):
    """A tile-stacked SimplexDisc plus the host-side local<->global maps."""

    disc: SimplexDisc
    # [n_dev, n_loc_max] global node id per local slot, -1 on padding
    v_global: np.ndarray
    p_global: np.ndarray
    n_nodes_v_global: int
    n_nodes_p_global: int


def _local_numbering(global_ids_per_tile, n_global):
    """Per-tile sorted-by-global-id local numbering.

    Returns (padded [n_dev, n_loc_max] global ids with -1 padding,
    list of {global id -> local id} dicts, n_loc_max).
    """
    n_loc_max = max(len(g) for g in global_ids_per_tile)
    out = np.full((len(global_ids_per_tile), n_loc_max), -1, dtype=np.int64)
    lut = []
    for t, g in enumerate(global_ids_per_tile):
        out[t, : len(g)] = g
        lut.append({int(gi): li for li, gi in enumerate(g)})
    return out, lut, n_loc_max


def _seam_tables(globals_pad, lut, n_loc, n_dev, dtype):
    """Build the stacked SeamTables for one DoF space.

    Validates that node sharing is strictly between adjacent strips
    (non-adjacent sharing would need a general neighbor graph, not the
    2-exchange ring).
    """
    sets = [set(g[g >= 0].tolist()) for g in globals_pad]
    for t in range(n_dev):
        for u in range(t + 2, n_dev):
            both = sets[t] & sets[u]
            if both:
                raise ValueError(
                    f"strips {t} and {u} share {len(both)} nodes; "
                    "non-adjacent sharing is unsupported -- use fewer, "
                    "wider strips"
                )
    shared_r = [
        sorted(sets[t] & sets[t + 1]) if t + 1 < n_dev else []
        for t in range(n_dev)
    ]
    B = max(1, max(len(s) for s in shared_r))
    send_l = np.full((n_dev, B), n_loc, dtype=np.int32)
    send_r = np.full((n_dev, B), n_loc, dtype=np.int32)
    add_l = np.full((n_dev, n_loc), B, dtype=np.int32)
    add_r = np.full((n_dev, n_loc), B, dtype=np.int32)
    weight = np.zeros((n_dev, n_loc))
    for t in range(n_dev):
        for k, g in enumerate(shared_r[t]):  # shared with right neighbor
            send_r[t, k] = lut[t][g]
            add_r[t, lut[t][g]] = k
            # the right neighbor receives this buffer "from left"
            send_l[t + 1, k] = lut[t + 1][g]
            add_l[t + 1, lut[t + 1][g]] = k
        mult = np.zeros(n_loc)
        for li, g in enumerate(globals_pad[t]):
            if g < 0:
                continue
            mult[li] = sum(1 for s in sets if int(g) in s)
        with np.errstate(divide="ignore"):
            w = np.where(mult > 0, 1.0 / np.maximum(mult, 1), 0.0)
        weight[t] = w
    return SeamTables(
        send_l=jnp.asarray(send_l),
        send_r=jnp.asarray(send_r),
        add_l=jnp.asarray(add_l),
        add_r=jnp.asarray(add_r),
        weight=jnp.asarray(weight, dtype),
    )


def decompose_simplex_disc(
    nodes_xy: np.ndarray,
    tri: np.ndarray,
    bedges: np.ndarray,
    bedge_tag: np.ndarray,
    n_dev: int,
    dtype=None,
    axis: str = "x",
    global_disc: SimplexDisc | None = None,
) -> DecomposedSimplex:
    """Split a triangle mesh into ``n_dev`` x-strips of elements and lower
    each to tile-local device data, stacked on a leading tile axis.

    Builds the *global* disc first so boundary masks / inlet profile /
    Neumann rhs / cylinder edges are globally consistent, then slices
    every nodal quantity to the tile's local node set (global nodal
    values replicate onto seam copies -- no double counting; partial-sum
    quantities are produced tile-locally and seam-exchanged at runtime).
    """
    g = (
        global_disc
        if global_disc is not None
        else make_simplex_disc(nodes_xy, tri, bedges, bedge_tag, dtype)
    )
    dtype = g.dtype
    gdofs_v = np.asarray(g.dofs_v)
    gdofs_p = np.asarray(g.dofs_p)
    n_tri = gdofs_v.shape[0]

    # ---- strip partition by element centroid x (equal counts) ----
    cx = np.asarray(nodes_xy, dtype=np.float64)[
        np.asarray(tri, dtype=np.int64)
    ][:, :, 0].mean(axis=1)
    order = np.argsort(cx, kind="stable")
    parts = np.array_split(order, n_dev)
    if min(len(p) for p in parts) == 0:
        raise ValueError(f"mesh has too few elements for {n_dev} strips")
    n_tri_max = max(len(p) for p in parts)

    # ---- per-tile local numbering (sorted by global id) ----
    v_ids = [np.unique(gdofs_v[p]) for p in parts]
    p_ids = [np.unique(gdofs_p[p]) for p in parts]
    v_pad, v_lut, n_v = _local_numbering(v_ids, g.n_nodes_v)
    p_pad, p_lut, n_p = _local_numbering(p_ids, g.n_nodes_p)
    if n_p == n_v:
        # the seam-weighted dot distinguishes the u/p weight vectors by
        # their length (unstructured.ops.make_dot); disambiguate by
        # padding the pressure space one extra dead slot
        p_pad = np.concatenate(
            [p_pad, np.full((n_dev, 1), -1, dtype=p_pad.dtype)], axis=1
        )
        n_p += 1

    seam_v = _seam_tables(v_pad, v_lut, n_v, n_dev, dtype)
    seam_p = _seam_tables(p_pad, p_lut, n_p, n_dev, dtype)

    # ---- per-tile element tables (padded with zero-measure elements) ----
    def remap(dofs, lut):
        return np.vectorize(lambda gid: lut[int(gid)])(dofs).astype(np.int32)

    dofs_v_t = np.zeros((n_dev, n_tri_max, 6), dtype=np.int32)
    dofs_p_t = np.zeros((n_dev, n_tri_max, 3), dtype=np.int32)
    invJ_t = np.zeros((n_dev, n_tri_max, 2, 2))
    detJ_t = np.zeros((n_dev, n_tri_max))
    ginvJ = np.asarray(g.invJ)
    gdetJ = np.asarray(g.detJ)
    for t, p in enumerate(parts):
        k = len(p)
        dofs_v_t[t, :k] = remap(gdofs_v[p], v_lut[t])
        dofs_p_t[t, :k] = remap(gdofs_p[p], p_lut[t])
        invJ_t[t, :k] = ginvJ[p]
        detJ_t[t, :k] = gdetJ[p]

    def stacked_inverse(dofs_t, n_nodes):
        # invert_scatter pads rows to each tile's own max degree K; unify
        # the widths across tiles (sentinel = dofs_t[t].size, identical
        # for all tiles since the element arrays are padded to n_tri_max)
        per = [invert_scatter(dofs_t[t], n_nodes) for t in range(n_dev)]
        k = max(a.shape[1] for a in per)
        sent = dofs_t[0].size
        return np.stack(
            [
                np.pad(a, ((0, 0), (0, k - a.shape[1])), constant_values=sent)
                for a in per
            ]
        )

    gather_v_t = stacked_inverse(dofs_v_t, n_v)
    gather_p_t = stacked_inverse(dofs_p_t, n_p)

    # ---- per-tile P2 -> P1 transfer tables (pmg_*; sentinels as in
    # make_simplex_disc).  Every midpoint's edge endpoints are vertices of
    # a local element, so the p_lut lookups below cannot miss. ----
    n_vg = g.n_nodes_p  # global vertex count: v-ids below it are vertices
    guniq = np.asarray(g.edge_verts)
    pmg_vert_t = np.full((n_dev, n_v), n_p, dtype=np.int32)
    pmg_edge_t = np.full((n_dev, n_v, 2), n_p, dtype=np.int32)
    pmg_vertv_t = np.full((n_dev, n_p), n_v, dtype=np.int32)
    mids_per_tile = []
    for t in range(n_dev):
        mids: list[list[int]] = [[] for _ in range(n_p)]
        for li, gid in enumerate(v_pad[t]):
            if gid < 0:
                continue
            if gid < n_vg:
                pl = p_lut[t][int(gid)]
                pmg_vert_t[t, li] = pl
                pmg_vertv_t[t, pl] = li
            else:
                a, b = guniq[int(gid) - n_vg]
                pa, pb = p_lut[t][int(a)], p_lut[t][int(b)]
                pmg_edge_t[t, li] = (pa, pb)
                mids[pa].append(li)
                mids[pb].append(li)
        mids_per_tile.append(mids)
    k_mid = max(
        1, max(len(m) for mids in mids_per_tile for m in mids)
    )
    pmg_mid_t = np.full((n_dev, n_p, k_mid), n_v, dtype=np.int32)
    for t, mids in enumerate(mids_per_tile):
        for pl, m in enumerate(mids):
            pmg_mid_t[t, pl, : len(m)] = m

    # ---- nodal quantities: slice global vectors (pad slots read 0) ----
    def slice_nodal(vec, ids_pad, fill=0.0):
        vec = np.asarray(vec)
        out = np.full(vec.shape[:-1] + ids_pad.shape, fill, dtype=vec.dtype)
        for t in range(n_dev):
            sel = ids_pad[t] >= 0
            out[..., t, sel] = vec[..., ids_pad[t][sel]]
        return np.moveaxis(out, -2, 0)

    # ---- cylinder boundary edges -> owning tile ----
    gcyl_tri = np.asarray(g.cyl_tri)
    owner = np.empty(n_tri, dtype=np.int64)
    local_pos = np.empty(n_tri, dtype=np.int64)
    for t, p in enumerate(parts):
        owner[p] = t
        local_pos[p] = np.arange(len(p))
    n_ce_max = max(
        1,
        max(
            (int(np.sum(owner[gcyl_tri] == t)) for t in range(n_dev)),
            default=1,
        )
        if gcyl_tri.size
        else 1,
    )
    cyl_tri_t = np.zeros((n_dev, n_ce_max), dtype=np.int32)
    cyl_edge_t = np.zeros((n_dev, n_ce_max), dtype=np.int32)
    cyl_len_t = np.zeros((n_dev, n_ce_max))
    cyl_nrm_t = np.zeros((n_dev, n_ce_max, 2))
    if gcyl_tri.size:
        gce = np.asarray(g.cyl_edge)
        gcl = np.asarray(g.cyl_len)
        gcn = np.asarray(g.cyl_normal)
        for t in range(n_dev):
            sel = owner[gcyl_tri] == t
            k = int(sel.sum())
            cyl_tri_t[t, :k] = local_pos[gcyl_tri[sel]]
            cyl_edge_t[t, :k] = gce[sel]
            cyl_len_t[t, :k] = gcl[sel]
            cyl_nrm_t[t, :k] = gcn[sel]

    disc = SimplexDisc(
        n_nodes_v=n_v,
        n_nodes_p=n_p,
        n_tri=n_tri_max,
        dofs_v=jnp.asarray(dofs_v_t),
        dofs_p=jnp.asarray(dofs_p_t),
        coords_v=jnp.asarray(slice_nodal(np.asarray(g.coords_v).T, v_pad), dtype).swapaxes(-1, -2),
        coords_p=jnp.asarray(slice_nodal(np.asarray(g.coords_p).T, p_pad), dtype).swapaxes(-1, -2),
        invJ=jnp.asarray(invJ_t, dtype),
        detJ=jnp.asarray(detJ_t, dtype),
        u_dirichlet=jnp.asarray(
            slice_nodal(np.asarray(g.u_dirichlet), v_pad, fill=False)
        ),
        u_inlet=jnp.asarray(
            slice_nodal(np.asarray(g.u_inlet), v_pad, fill=False)
        ),
        inlet_profile1=jnp.asarray(
            slice_nodal(np.asarray(g.inlet_profile1), v_pad), dtype
        ),
        neumann_rhs1=jnp.asarray(
            slice_nodal(np.asarray(g.neumann_rhs1), v_pad), dtype
        ),
        cyl_tri=jnp.asarray(cyl_tri_t),
        cyl_edge=jnp.asarray(cyl_edge_t),
        cyl_len=jnp.asarray(cyl_len_t, dtype),
        cyl_normal=jnp.asarray(cyl_nrm_t, dtype),
        edge_verts=None,  # superseded by the local pmg_* tables
        gather_v=jnp.asarray(gather_v_t.astype(np.int32)),
        gather_p=jnp.asarray(gather_p_t.astype(np.int32)),
        gather_ev=None,
        pmg_vert=jnp.asarray(pmg_vert_t),
        pmg_edge=jnp.asarray(pmg_edge_t),
        pmg_vert_v=jnp.asarray(pmg_vertv_t),
        pmg_mid=jnp.asarray(pmg_mid_t),
        p_mg=g.p_mg,
        # padding slots read True: they must stay identity rows of the
        # pressure-Laplacian Schur legs (unstructured.ops._p_free)
        p_outlet=jnp.asarray(
            slice_nodal(np.asarray(g.p_outlet), p_pad, fill=True)
        ),
        halo_axis=axis,
        halo_n=n_dev,
        seam_v=seam_v,
        seam_p=seam_p,
    )
    return DecomposedSimplex(
        disc=disc,
        v_global=v_pad,
        p_global=p_pad,
        n_nodes_v_global=g.n_nodes_v,
        n_nodes_p_global=g.n_nodes_p,
    )


def scatter_simplex_blocks(x: Blocks, dd: DecomposedSimplex) -> Blocks:
    """Global (u, p) -> stacked tile-local vectors (seam nodes duplicated)."""
    u = np.asarray(x.u)
    p = np.asarray(x.p)
    n_dev, n_v = dd.v_global.shape
    _, n_p = dd.p_global.shape
    us = np.zeros((n_dev, 2, n_v), dtype=u.dtype)
    ps = np.zeros((n_dev, n_p), dtype=p.dtype)
    for t in range(n_dev):
        sv = dd.v_global[t] >= 0
        sp = dd.p_global[t] >= 0
        us[t][:, sv] = u[:, dd.v_global[t][sv]]
        ps[t][sp] = p[dd.p_global[t][sp]]
    return Blocks(u=jnp.asarray(us), p=jnp.asarray(ps))


def gather_simplex_blocks(xs: Blocks, dd: DecomposedSimplex) -> Blocks:
    """Stacked tile-local vectors -> global (u, p) (seam copies agree by
    construction; the last writer wins)."""
    us = np.asarray(xs.u)
    ps = np.asarray(xs.p)
    n_dev = dd.v_global.shape[0]
    u = np.zeros((2, dd.n_nodes_v_global), dtype=us.dtype)
    p = np.zeros((dd.n_nodes_p_global,), dtype=ps.dtype)
    for t in range(n_dev):
        sv = dd.v_global[t] >= 0
        sp = dd.p_global[t] >= 0
        u[:, dd.v_global[t][sv]] = us[t][:, sv]
        p[dd.p_global[t][sp]] = ps[t][sp]
    return Blocks(u=jnp.asarray(u), p=jnp.asarray(p))
