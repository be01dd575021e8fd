"""Geometric multigrid on the velocity block (ILU/SSOR/AMG equivalence layer).

The reference preconditions its velocity-block inner solves with Trilinos
``PreconditionILU`` / ``PreconditionSSOR`` (unsteady / stationary
blockDiagonal, NSSolver.hpp:183-189, NSSolverStationary.hpp:160-166) and
``PreconditionAMG`` (stationary blockTriangular,
NSSolverStationary.hpp:225-231).  Sequential sparse sweeps have no efficient
TPU analog (SURVEY.md N10); the TPU-native equivalent built here is a
rediscretization geometric multigrid V-cycle:

  * hierarchy: the channel geometry regenerated at ceil-halved cell counts
    (same voxelized-cylinder rule, NSSolver.cpp:40-63) down to a few cells;
  * transfers: dense 1-D tensor factors evaluating the piecewise-Lagrange
    (Gauss-Lobatto) velocity function of one level at the other's nodes --
    two einsum contractions per transfer, mapping onto the MXU;
  * smoother: Chebyshev-accelerated point Jacobi with the spectral radius
    of ``D^-1 F`` estimated by on-device power iteration (matrix-free);
  * coarse solve: Jacobi-preconditioned CG to a loose tolerance.

Everything runs inside ``jit``; the hierarchy is a static pytree chain
hanging off ``Disc.mg``.  Dirichlet rows (post ``apply_boundary_values``
elimination) and non-existent lattice lanes are identity/diagonal rows that
point smoothing solves exactly; transfers zero them so coarse corrections
stay in the interior subspace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from navier_stokes_solver_tpu.elements import make_taylor_hood
from navier_stokes_solver_tpu.elements.taylor_hood import lagrange_values
from navier_stokes_solver_tpu.geometry import make_channel_geometry, make_fe_space
from navier_stokes_solver_tpu.krylov import cg, gmres
from navier_stokes_solver_tpu.ops.disc import Disc, MGEdge, make_disc
from navier_stokes_solver_tpu.ops.matfree import (
    _eval_v,
    _seam_sum,
    apply_F,
    diag_F,
    make_dot,
    seam_weights,
)
from navier_stokes_solver_tpu.ops import LinearizationQ

__all__ = ["attach_mg", "make_mg_vcycle", "make_lp_vcycle", "mg_level_shapes"]


# ---------------------------------------------------------------------------
# Host-side hierarchy construction
# ---------------------------------------------------------------------------


def _interp_1d(n_src: int, n_dst: int, deg: int, nodes: np.ndarray) -> np.ndarray:
    """[N_dst, N_src] evaluation of a degree-``deg`` piecewise-Lagrange
    function on an ``n_src``-cell unit grid at the nodes of an ``n_dst``-cell
    grid (grids need not be nested)."""
    N_dst = deg * n_dst + 1
    N_src = deg * n_src + 1
    P = np.zeros((N_dst, N_src))
    for g in range(N_dst):
        c = min(g // deg, n_dst - 1)
        a = g - c * deg
        x = (c + nodes[a]) / n_dst
        j = int(np.clip(np.floor(x * n_src - 1e-12), 0, n_src - 1))
        t = x * n_src - j
        P[g, j * deg : (j + 1) * deg + 1] = lagrange_values(nodes, np.array([t]))[0]
    return P


def _coarse_shape(nx: int, ny: int, hx: float, hy: float) -> tuple[int, int]:
    """Aspect-aware (semi-)coarsening: halve only the direction with the
    smaller cell size while the anisotropy exceeds 1.5x, both otherwise.

    Point-smoothed MG degrades on anisotropic cells (the bench channel has
    hx/hy = 3.76 at 100x70): errors are smooth only along the
    strongly-coupled (small-h) direction, so that is the direction safe to
    coarsen until the grid is roughly isotropic -- the classic
    semi-coarsening cure."""
    if hy < hx / 1.5:
        return nx, -(-ny // 2)
    if hx < hy / 1.5:
        return -(-nx // 2), ny
    return -(-nx // 2), -(-ny // 2)


def attach_mg(
    disc: Disc,
    *,
    min_cells: int = 48,
    max_levels: int = 8,
    geo_kwargs: dict | None = None,
) -> Disc:
    """Attach a multigrid chain to ``disc`` (single-tile only).

    ``geo_kwargs`` forwards the channel-geometry parameters of the fine grid
    (defaults describe the reference benchmark channel).
    """
    if disc.halo_axis is not None:
        raise ValueError("attach_mg: hierarchy on decomposed tiles not supported")
    geo_kwargs = geo_kwargs or {}
    tables = make_taylor_hood(disc.deg_v, disc.deg_p, disc.n_q1d)
    nodes = tables.nodes_v
    deg = disc.deg_v
    dtype = disc.dtype
    W, H = disc.hx * disc.nx, disc.hy * disc.ny

    def build(nx: int, ny: int, level: int) -> MGEdge | None:
        nxc, nyc = _coarse_shape(nx, ny, W / nx, H / ny)
        if level >= max_levels or nxc * nyc < min_cells or nyc < 2:
            return None
        geo_c = make_channel_geometry(nxc, nyc, **geo_kwargs)
        space_c = make_fe_space(geo_c, disc.deg_v, disc.deg_p)
        disc_c = make_disc(space_c, dtype)
        edge_down = build(nxc, nyc, level + 1)
        if edge_down is not None:
            disc_c = disc_c.replace(mg=edge_down)
        return MGEdge(
            coarse=disc_c,
            Pvx=jnp.asarray(_interp_1d(nxc, nx, deg, nodes), dtype),
            Pvy=jnp.asarray(_interp_1d(nyc, ny, deg, nodes), dtype),
            Evx=jnp.asarray(_interp_1d(nx, nxc, deg, nodes), dtype),
            Evy=jnp.asarray(_interp_1d(ny, nyc, deg, nodes), dtype),
            Ppx=jnp.asarray(
                _interp_1d(nxc, nx, disc.deg_p, tables.nodes_p), dtype
            ),
            Ppy=jnp.asarray(
                _interp_1d(nyc, ny, disc.deg_p, tables.nodes_p), dtype
            ),
        )

    edge = build(disc.nx, disc.ny, 0)
    return disc.replace(mg=edge) if edge is not None else disc


def mg_level_shapes(disc: Disc) -> list[tuple[int, int]]:
    out = [(disc.nx, disc.ny)]
    while disc.mg is not None:
        disc = disc.mg.coarse
        out.append((disc.nx, disc.ny))
    return out


# ---------------------------------------------------------------------------
# Device-side V-cycle
# ---------------------------------------------------------------------------


def _interior_mask(disc: Disc):
    return disc.u_active & ~disc.u_dirichlet


def _zero_constrained(disc: Disc, x):
    return jnp.where(_interior_mask(disc), x, 0.0)


def _as_prec(dinv_or_fn):
    """Accept either a diagonal-inverse array or a callable ``r -> d``."""
    if callable(dinv_or_fn):
        return dinv_or_fn
    return lambda r: dinv_or_fn * r


def _estimate_lmax(A, prec, shape, dtype, iters: int = 8, dot=None):
    """Power iteration for the spectral radius of ``M^-1 A`` (matrix-free,
    on device; the analog of Ifpack's eigenvalue estimate for Chebyshev).

    Under decomposition ``dot`` must be the seam-weighted psum dot.  (The
    start vector is per-tile random with inconsistent seams -- harmless:
    the estimate only sets the Chebyshev window, and the production gmres
    smoother does not use it at all.)"""
    P = _as_prec(prec)
    dot = dot or (lambda a, b: jnp.vdot(a, b).real)
    v = jax.random.normal(jax.random.PRNGKey(7), shape, dtype)

    def body(_, carry):
        v, lam = carry
        w = P(A(v))
        lam = jnp.sqrt(dot(w, w))
        return w / jnp.maximum(lam, 1e-30), lam

    _, lam = jax.lax.fori_loop(0, iters, body, (v, jnp.ones((), dtype)))
    return lam


def _gmres_smooth(A, prec, b, x, k: int, dot=None):
    """``k`` fixed steps of Jacobi-preconditioned GMRES as a smoother.

    Chebyshev assumes a real positive spectrum; the Jacobi-normalized
    *convection-dominated* velocity block (NS regime at nu = 1/90) has
    eigenvalues far off the real axis and Chebyshev smoothing diverges on it
    (measured: V(3,3)-cheb tail rate > 1 at 32x12, vs 0.27 with this
    smoother).  A fixed-k minimal-residual polynomial adapts to the actual
    spectrum per application and cannot increase the residual.  The smoother
    is (mildly) nonlinear; every consumer is a flexible method (FGMRES
    inner solves / outer FGMRES), so that is safe.

    Unrolled Arnoldi (k is 2-4): k matvecs + k preconditioner applications
    + a (k+1) x k host-shaped least squares -- comparable FLOPs to a
    degree-k Chebyshev sweep.
    """
    P = _as_prec(prec)
    dot = dot or (lambda a, b: jnp.vdot(a, b).real)
    r0 = b - A(x)
    tiny = jnp.finfo(r0.dtype).tiny
    beta = jnp.sqrt(dot(r0, r0))
    scale = 1.0 / jnp.maximum(beta, tiny)
    V = [r0 * scale]
    Z = []
    H = jnp.zeros((k + 1, k), r0.dtype)
    for j in range(k):
        z = P(V[j])
        Z.append(z)
        w = A(z)
        for i in range(j + 1):
            hij = dot(V[i], w)
            w = w - hij * V[i]
            H = H.at[i, j].set(hij)
        hj1 = jnp.sqrt(dot(w, w))
        H = H.at[j + 1, j].set(hj1)
        V.append(w / jnp.maximum(hj1, tiny))
    # least squares min || beta e1 - H y ||  via normal equations on the
    # tiny (k+1) x k Hessenberg (well-conditioned for a smoother; k <= 4)
    e1 = jnp.zeros((k + 1,), r0.dtype).at[0].set(beta)
    G = H.T @ H + tiny * jnp.eye(k, dtype=r0.dtype)
    y = jnp.linalg.solve(G, H.T @ e1)
    y = jnp.where(jnp.isfinite(y), y, 0.0)
    dx = sum(y[j] * Z[j] for j in range(k))
    return x + dx


def _chebyshev(A, prec, lmax, b, x, degree: int, lmin_ratio: float = 4.0):
    """``degree`` steps of Chebyshev-accelerated preconditioned smoothing on
    [lmax/lmin_ratio, 1.1 lmax].  ``prec`` is a diagonal-inverse array
    (Jacobi) or a callable (e.g. cell-block Schwarz).  ``lmin_ratio = 4``
    is the classic smoothing window (only the high end must be damped);
    larger ratios approximate a solver over the full spectrum of
    well-conditioned operators (e.g. the pressure mass matrix)."""
    P = _as_prec(prec)
    lmin = lmax / lmin_ratio
    lmax = 1.1 * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    r = b - A(x)
    d = P(r) / theta
    for _ in range(degree):
        x = x + d
        r = b - A(x)
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * P(r)
        rho = rho_new
    return x


def make_mg_vcycle(
    disc: Disc,
    nu,
    inv_dt,
    state_u: jax.Array | None,
    *,
    stokes: bool,
    smooth_degree: int = 2,
    coarse_iters: int = 48,
    coarse_rtol: float = 5e-2,
    dtype=None,
    smoother: str = "gmres",
):
    """Build ``M(b) -> x`` : one V(smooth_degree, smooth_degree) cycle for the
    velocity block F at the current linearization.

    ``state_u`` is the fine-level velocity field (None in the Stokes
    regime); it is restricted through the chain to rediscretize the
    linearized convection on every level.

    ``dtype``: compute precision of the cycle.  The preconditioner only
    steers the (full-precision) outer Krylov iteration, so f32 is safe and
    avoids the TPU's emulated-f64 cost; the result is cast back to the
    input dtype.

    ``smoother``: "gmres" (fixed-``smooth_degree``-step Jacobi-preconditioned
    minimal-residual smoothing -- robust on the nonsymmetric NS-regime
    block, the production default), "jacobi" (Chebyshev-Jacobi; SPD/Stokes
    only -- diverges on convection-dominated operators), or "schwarz"
    (cell-block additive Schwarz -- strong but costlier per sweep).
    """
    out_dtype = disc.dtype
    if dtype is not None and dtype != disc.dtype:
        cast = lambda a: (
            a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a
        )
        disc = jax.tree_util.tree_map(cast, disc)
        if state_u is not None:
            state_u = state_u.astype(dtype)
        nu = jnp.asarray(nu, dtype)
        inv_dt = jnp.asarray(inv_dt, dtype)

    # ---- walk the chain, building per-level operators ----
    levels = []  # (disc, A, dinv, lmax, edge)
    d = disc
    u = state_u
    lmax = None
    while True:
        if stokes or u is None:
            linq = None
        else:
            vals, grads = _eval_v(d, u)
            linq = LinearizationQ(u=vals, gradu=grads, p=None)
        diag = diag_F(d, nu, inv_dt, linq, stokes=stokes)
        dloc = d
        linq_loc = linq
        diag_loc = diag

        def A(x, _d=dloc, _l=linq_loc, _dg=diag_loc):
            return apply_F(_d, nu, inv_dt, _l, x, stokes=stokes, bc_diag=_dg)

        if smoother == "schwarz":
            from navier_stokes_solver_tpu.precond.schwarz import (
                make_schwarz_smoother,
            )

            prec = make_schwarz_smoother(
                d, nu, inv_dt, linq, diag, stokes=stokes
            )
        else:
            prec = 1.0 / diag
        dotd = make_dot(d)
        if lmax is None and smoother != "gmres":
            # Jacobi-normalized FEM spectra are essentially mesh-size
            # independent: estimate once on the finest level, reuse below
            # (with headroom from the 1.1x window in _chebyshev).  The
            # gmres smoother needs no spectral window.
            lmax = _estimate_lmax(A, prec, (2,) + d.NV, d.dtype, dot=dotd)
        levels.append((d, A, prec, lmax, d.mg, dotd))
        if d.mg is None:
            break
        edge = d.mg
        if u is not None and not stokes:
            # state restriction is nodal evaluation of the (continuous)
            # fine function at coarse nodes: tile-local exact, no comm
            u = jnp.einsum("Yy,cyx,Xx->cYX", edge.Evy, u, edge.Evx)
        d = edge.coarse

    def restrict(edge: MGEdge, d_fine: Disc, r):
        # Transpose-interpolation restriction.  Under decomposition the
        # seam rows/columns are duplicated in both tiles: weight them 1/2
        # so per-tile partial sums add to the global value, then complete
        # coarse seam entries with the standard ppermute seam exchange
        # (the Trilinos compress(add) analog).
        w = seam_weights(d_fine, d_fine.deg_v)
        if w is not None:
            r = r * w
        rc = jnp.einsum("yY,cyx,xX->cYX", edge.Pvy, r, edge.Pvx)
        return _seam_sum(edge.coarse, rc)

    def prolong(edge: MGEdge, x):
        # nodal interpolation of a continuous coarse function: tile-local
        return jnp.einsum("Yy,cyx,Xx->cYX", edge.Pvy, x, edge.Pvx)

    if smoother == "gmres":
        smooth = lambda A, prec, lmax, b, x, dot: _gmres_smooth(
            A, prec, b, x, smooth_degree, dot=dot
        )
    else:
        smooth = lambda A, prec, lmax, b, x, dot: _chebyshev(
            A, prec, lmax, b, x, smooth_degree
        )

    def vcycle(li: int, b):
        d, A, prec, lmax, edge, dot = levels[li]
        if li == len(levels) - 1:
            # CG is only valid on the SPD Stokes block; the NS-regime F is
            # nonsymmetric (convection), so the coarse solve must be GMRES.
            solver = cg if (stokes or state_u is None) else gmres
            x, _ = solver(
                A,
                b,
                jnp.zeros_like(b),
                tol=coarse_rtol * jnp.sqrt(dot(b, b)),
                maxiter=coarse_iters,
                M=_as_prec(prec),
                dot=dot,
            )
            return x
        x = smooth(A, prec, lmax, b, jnp.zeros_like(b), dot)
        r = _zero_constrained(d, b - A(x))
        bc = _zero_constrained(edge.coarse, restrict(edge, d, r))
        xc = vcycle(li + 1, bc)
        x = x + _zero_constrained(d, prolong(edge, xc))
        return smooth(A, prec, lmax, b, x, dot)

    def M(b):
        x = vcycle(0, b.astype(disc.dtype))
        return x.astype(out_dtype)

    return M


def make_lp_vcycle(
    disc: Disc,
    *,
    smooth_degree: int = 2,
    coarse_iters: int = 48,
    coarse_rtol: float = 5e-2,
    dtype=None,
):
    """One V-cycle on the pressure Laplacian (the (1/dt) Lp^-1 leg of the
    Cahouet-Chabard Schur approximation; ``ops.matfree.apply_Lp``).

    The hierarchy reuses the velocity MG chain's coarse discretizations
    (``Disc.mg``) with the pressure-lattice transfer factors
    (``MGEdge.Ppx/Ppy``).  Lp is SPD, so Chebyshev-Jacobi smoothing (with
    one finest-level spectral estimate, reused below) is the right
    smoother; the coarse solve is Jacobi-CG.

    Coarse levels drop the voxelized cylinder (full-rectangle Laplacian,
    all pressure lanes active).  Each level re-voxelizes the hole on its
    own lattice, so the coarse hole SHAPE differs from the fine one; with
    no pressure Dirichlet ring to decouple the mismatch (unlike the
    velocity block's no-slip rows), corrections interpolated across a
    differently-shaped hole amplify ring-local modes -- measured divergence
    rate ~5x/cycle at 48x24.  The un-cut coarse operator errs stiff near
    the hole (corrections undershoot, which smoothing recovers) and is the
    standard voxel-MG cure.
    """
    from navier_stokes_solver_tpu.ops.matfree import (
        apply_Lp,
        diag_Lp,
        p_outlet_mask,
    )

    out_dtype = disc.dtype
    if dtype is not None and dtype != disc.dtype:
        cast = lambda a: (
            a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a
        )
        disc = jax.tree_util.tree_map(cast, disc)

    levels = []
    d = disc
    lmax = None
    while True:
        dloc = d
        if levels:  # coarse level: full rectangle, no hole
            dloc = dloc.replace(
                cell_mask=jnp.ones_like(dloc.cell_mask),
                p_active=jnp.ones_like(dloc.p_active),
            )
        A = lambda x, _d=dloc: apply_Lp(_d, x)
        dinv = 1.0 / diag_Lp(dloc)
        dotd = make_dot(dloc)
        if lmax is None:
            # the Jacobi-normalized Laplacian spectrum is essentially
            # mesh-size independent: estimate once on the finest level
            lmax = _estimate_lmax(A, dinv, dloc.NP, dloc.dtype, dot=dotd)
        levels.append((dloc, A, dinv, dotd, dloc.mg))
        if d.mg is None or d.mg.Ppx is None:
            break
        d = d.mg.coarse

    def interior(d, x):
        return jnp.where(d.p_active & ~p_outlet_mask(d), x, 0.0)

    def restrict(edge: MGEdge, d_fine: Disc, r):
        w = seam_weights(d_fine, d_fine.deg_p)
        if w is not None:
            r = r * w
        rc = jnp.einsum("yY,yx,xX->YX", edge.Ppy, r, edge.Ppx)
        return _seam_sum(edge.coarse, rc)

    def prolong(edge: MGEdge, x):
        return jnp.einsum("Yy,yx,Xx->YX", edge.Ppy, x, edge.Ppx)

    def vcycle(li: int, b):
        d, A, dinv, dot, edge = levels[li]
        if li == len(levels) - 1:
            x, _ = cg(
                A, b, jnp.zeros_like(b),
                tol=coarse_rtol * jnp.sqrt(dot(b, b)),
                maxiter=coarse_iters, M=lambda r: dinv * r, dot=dot,
            )
            return x
        x = _chebyshev(A, dinv, lmax, b, jnp.zeros_like(b), smooth_degree)
        r = interior(d, b - A(x))
        bc = interior(edge.coarse, restrict(edge, d, r))
        xc = vcycle(li + 1, bc)
        x = x + interior(d, prolong(edge, xc))
        return _chebyshev(A, dinv, lmax, b, x, smooth_degree)

    def M(b):
        x = vcycle(0, b.astype(disc.dtype))
        return x.astype(out_dtype)

    return M
