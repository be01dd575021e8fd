"""Block preconditioner implementations.

Each ``make_*`` builder returns a ``vmult: Blocks -> Blocks`` callable that is
pure and jit-compatible (inner Krylov solves are ``lax.while_loop``s).  The
unsteady and stationary variants differ deliberately in the reference
(different inner tolerances and smoother choices -- SURVEY.md section 2a.7-9);
both are reproduced.

Smoother equivalence layer (N10 in SURVEY.md section 2b): the reference's
Trilinos ``PreconditionILU`` / ``PreconditionSSOR`` / ``PreconditionAMG`` are
sequential sparse sweeps with no efficient TPU analog.  Here they map to
point-Jacobi (diagonal) applications; iteration counts of *inner* solves
therefore differ from the reference while outer Krylov counts stay
comparable (the inner solves converge to the same tolerances).  This is the
documented preconditioner-equivalence layer; a geometric-multigrid upgrade
slots in behind the same interface.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from navier_stokes_solver_tpu.krylov import cg, fgmres
from navier_stokes_solver_tpu.ops import matfree
from navier_stokes_solver_tpu.ops.matfree import make_dot
from navier_stokes_solver_tpu.ops import Blocks, LinearizationQ
from navier_stokes_solver_tpu.ops.disc import Disc

__all__ = ["LinearContext", "PrecondConfig", "make_preconditioner", "make_krylov_lo"]


@dataclasses.dataclass(frozen=True)
class PrecondConfig:
    """Equivalence-layer tunables (documented deviations from Trilinos)."""

    # Substitute for a single ILU/SSOR application on the Schur complement in
    # the unsteady aSIMPLE (NSSolver.hpp:338): a loose matrix-free CG solve.
    asimple_s_rel_tol: float = 1e-1
    asimple_s_maxiter: int = 200
    # Iteration caps for inner solves (the reference uses 1e5..2e6; those
    # are effectively "unbounded" -- we bound them so one preconditioner
    # application cannot blow the TPU runtime's per-call execution budget;
    # with the MG smoother the inner solves converge in well under 100).
    inner_maxiter: int = 100
    # Compute precision of the multigrid V-cycle (None = operator dtype).
    # f32 halves HBM traffic and avoids emulated-f64 compute on TPU; the
    # preconditioner only steers the full-precision outer Krylov iteration.
    mg_dtype: Any = "float32"
    # Compute precision of the whole preconditioner application (inner
    # solves included).  The outer Krylov iteration stays in the operator
    # dtype (f64), so this is the classic mixed-precision flexible-GMRES
    # setup; None = operator dtype.
    vmult_dtype: Any = "float32"
    # Inner-solve strategy for the velocity / pressure-mass blocks:
    #   "krylov": nested FGMRES/CG to the reference's tolerances
    #             (NSSolver.hpp:159-176 semantics);
    #   "fixed":  a fixed number of MG V-cycles (velocity) and Chebyshev
    #             sweeps (pressure mass) -- no nested iteration, much
    #             smaller XLA programs, linear preconditioner;
    #   "auto":   currently "krylov" (the nested solves converge where a
    #             2-cycle fixed sweep stagnates at scale; outer chunking
    #             bounds per-call device time, so the nested programs are
    #             safe on the TPU runtime).
    inner_mode: str = "auto"
    fixed_f_cycles: int = 2
    fixed_mp_degree: int = 6
    mg_smooth_degree: int = 3
    # V-cycle smoother: "gmres" (fixed-step minimal-residual smoothing,
    # robust on the nonsymmetric convection-dominated block -- the
    # production default), "jacobi" (Chebyshev-Jacobi; diverges on the
    # NS-regime block, Stokes/SPD only) or "schwarz" (cell-block additive
    # Schwarz -- stronger per sweep, costlier)
    mg_smoother: str = "gmres"
    # Working precision of the *outer* GMRES/FGMRES restart cycles
    # (GMRES-IR / iterative refinement, krylov.LowCycle): the Arnoldi
    # basis, orthogonalization, matvec and preconditioner of each restart
    # cycle run in this dtype while the restart residual b - A x and the
    # solution accumulation stay in the operator dtype (f64) -- so the
    # converged residual still reaches f64 tolerances.  On TPU f64 is
    # emulated; "float32" cuts the per-outer-iteration cost by the
    # emulation factor.  "mixed" runs only the matvec + preconditioner of
    # each cycle in f32 and keeps the Arnoldi basis / orthogonalization /
    # Givens in f64 -- fewer extra outer iterations than full-f32 cycles
    # (inexact-Krylov regime) at intermediate per-iteration cost.
    # None = full-precision outer (reference parity).  The host driver
    # falls back to full precision automatically when the low-precision
    # cycles stall above the tolerance.
    krylov_cycle_dtype: Any = None
    # Schur-complement treatment for the pressure block of blockDiagonal /
    # blockTriangular:
    #   "mass":    the reference's 1/nu-scaled pressure-mass solve
    #              (NSSolver.hpp:228-236) -- parity default;
    #   "cahouet": Cahouet-Chabard, S^-1 ~ nu Mp^-1 + (1/dt) Lp^-1.  With
    #              the implicit-Euler time term the Schur complement is
    #              dt-Laplacian dominated and the pure mass preconditioner
    #              loses h/dt robustness (outer counts grow ~1/(h sqrt(dt)));
    #              the added Laplacian leg restores it.  Newton regime only
    #              (reduces to "mass" in the Stokes regime and, numerically,
    #              whenever inv_dt == 0).  Both backends: structured lattice
    #              and the -M simplex path (unstructured.ops.apply_Lp).
    #   "pcd":     pressure convection-diffusion (Elman/Silvester/Wathen),
    #              S^-1 ~ Mp_raw^-1 Fp Ap^-1 with Fp = Mp_raw/dt + nu Lp
    #              + N_p(u_k).  Subsumes "cahouet" and additionally tracks
    #              the convection, giving Re-robustness of the stationary
    #              outer iteration.  Newton regime only, both backends.
    schur_mode: str = "mass"
    # Relative tolerance of the Cahouet-Chabard pressure-Laplacian CG leg
    # (V-cycle preconditioned; a loose solve suffices for a Schur approx).
    cc_lp_rel: float = 1e-2
    # When set, replace the nested Lp Krylov solve with this many
    # residual-corrected V-cycles (structured backend; requires the MG
    # chain's pressure transfers).  The Schur leg only needs an
    # approximate Lp^-1, so 1-2 cycles usually hold the outer count while
    # removing the nested solve entirely -- the Lp leg was ~5x the
    # mass-only per-iteration cost at the 300x100 north-star config
    # (docs/PERF.md).  None = nested FGMRES to ``cc_lp_rel``.  Ignored
    # (nested solve kept) on backends whose Lp preconditioner is point
    # Jacobi (-M simplex): N Jacobi sweeps scaled by 1/dt poison the
    # Schur leg (measured 25-30 -> 500-2000 outers/solve).
    cc_lp_cycles: int | None = None
    # Inner-solve tolerance overrides for blockTriangular (None = the
    # reference's values: velocity rel 1e-4 unsteady / 1e-2 stationary,
    # pressure rel 1e-5 / 1e-2 -- NSSolver.hpp:219/228,
    # NSSolverStationary.hpp:196/211).  Part of the documented equivalence
    # layer: with the MG-preconditioned inner solves a different
    # inner/outer work split can be much cheaper at identical outer
    # tolerance (measured in docs/PERF.md).
    tri_rel_u: float | None = None
    tri_rel_p: float | None = None
    # Stokes-regime-only overrides (take precedence over tri_rel_u/p when
    # the linearization is a Stokes operator, a static trace-time fact).
    # The mass-Schur Stokes outer count is only h-independent when the
    # inner solves are accurate enough: at 100x70 Q3/Q2 basis 60 the first
    # Stokes tangent solve costs 110 outers at the reference's rel 1e-2
    # inners but 59 at rel 1e-4 (and the wall DROPS ~25%), while the
    # Newton-regime solves see no such win (docs/PERF.md).  None = use
    # tri_rel_u/p semantics unchanged.  Also applied to the *stationary
    # aSIMPLE* inner FGMRES(F)/CG(S) solves (reference rel 1e-1,
    # NSSolverStationary.hpp:290-305) on Stokes-regime systems, same
    # rationale.
    tri_rel_u_stokes: float | None = None
    tri_rel_p_stokes: float | None = None
    # Stokes-regime Schur surrogate for the *stationary aSIMPLE* sweep:
    #   "shat": reference parity (NSSolverStationary.hpp:282-311) -- the
    #           CG/FGMRES solve with S-hat = B diag(F)^-1 B^T.  S-hat is
    #           spectrally a pressure *Laplacian*, but the Stokes Schur
    #           complement is the pressure *mass*: outer counts grow ~1/h
    #           (measured 169 @ 32x12 -> 398 @ 64x24 -> 2,050 @ 100x70;
    #           docs/PERF.md config-2 analysis).  The reference has the
    #           same wall -- its own benchmark CSVs contain no aSIMPLE rows.
    #   "mass": the Stokes-correct 1/nu-scaled pressure-mass solve (the
    #           same solve blockDiagonal/blockTriangular use,
    #           NSSolver.hpp:228-236) -- h-flat Stokes outer counts.  The
    #           rest of the SIMPLE sweep (alpha scaling, D^-1 B^T velocity
    #           correction) is untouched, and Newton-regime applications
    #           keep the true S-hat solve (reference semantics).
    asimple_stokes_schur: str = "shat"
    # GMRES-IR in-cycle residual-reduction floor (krylov.LowCycle.eta;
    # None = LowCycle's default 1e-6).  A single f32 cycle cannot reduce
    # the residual much below ~eps_f32 relative to its restart residual;
    # larger eta returns to the f64 restart earlier (cheaper cycles, more
    # restarts), smaller eta lets long cycles run into the f32
    # orthogonality noise floor.
    ir_eta: float | None = None
    # Direct dense-LU preconditioner (TPU-idiomatic, opt-in): build the
    # full saddle Jacobian as a dense f32 matrix (chunked vmap of the
    # matrix-free apply over basis vectors -- exact by construction, no
    # element-matrix code and no scatter HLO), ``lu_factor`` it once per
    # tangent solve, and apply the exact f32 solve as the preconditioner.
    # The f64 outer Krylov then converges in a handful of iterations
    # (each polishes ~eps_f32 of residual), replacing hundreds of nested
    # MG-preconditioned inner iterations with one O(n^3) MXU-saturating
    # factorization.  Worth it exactly where the simplex ``-M`` backend
    # lives (n <= ~30k DoFs: LU ~ 5e12 f32 FLOPs, factors ~2x n^2 * 4 B
    # HBM); ignored above NSTPU_DIRECT_LU_MAX total DoFs or under domain
    # decomposition (the per-tile operators are seam-partial).  The
    # requested -p kind still selects the parity preconditioner wherever
    # this is ineligible.  Strictly stronger than the reference's
    # ILU-smoothed inner solves -- a documented equivalence-layer upgrade
    # (docs/PARITY.md), default off = reference parity.
    direct_lu: bool = False


@dataclasses.dataclass(frozen=True)
class LinearContext:
    """Everything the preconditioners need about the current linearization.

    Plays the role of the assembled Trilinos blocks handed to
    ``preconditioner.initialize(...)`` (NSSolver.cpp:607-651), matrix-free.
    """

    disc: Disc | Any  # structured Disc or unstructured SimplexDisc
    nu: jax.Array | float
    inv_dt: jax.Array | float
    stokes: bool  # static regime flag
    linq: LinearizationQ | None  # Newton linearization state at q-points
    diag_f: jax.Array  # diag of the (post-BC) velocity block
    state_u: jax.Array | None = None  # nodal velocity (MG rediscretization)
    ops: Any = matfree  # backend kernel module (matfree | unstructured.ops)

    # ---- block applies (post boundary elimination, NSSolver.cpp:596) ----
    def F(self, x_u):
        return self.ops.apply_F(
            self.disc,
            self.nu,
            self.inv_dt,
            self.linq,
            x_u,
            stokes=self.stokes,
            bc_diag=self.diag_f,
        )

    def B(self, x_u):
        return self.ops.apply_B(self.disc, x_u, stokes=self.stokes)

    def Bt(self, x_p):
        return self.ops.apply_Bt(self.disc, x_p, zero_dirichlet_rows=True)

    def Mp(self, x_p):
        return self.ops.apply_Mp(self.disc, self.nu, x_p)

    def Lp(self, x_p):
        """Pressure Laplacian (the Cahouet-Chabard leg; structured only)."""
        return self.ops.apply_Lp(self.disc, x_p)

    def S(self, x_p):
        """Approximate Schur complement S = B diag(F)^-1 B^T, composed
        matrix-free (replaces the Trilinos ``mmult`` triple product,
        NSSolver.hpp:286)."""
        y = self.B(self.Bt(x_p) / self.diag_f)
        p_active = getattr(self.disc, "p_active", None)
        if p_active is None:
            return y
        return jnp.where(p_active, y, x_p)

    # ---- seam-weighted inner product (distributed-safe) ----
    def dot(self):
        return make_dot(self.disc)

    def norm(self):
        dot = self.dot()
        return lambda x: jnp.sqrt(dot(x, x))

    # ---- smoother equivalence layer ----
    def jacobi_F(self):
        dinv = 1.0 / self.diag_f
        return lambda x: dinv * x

    def smoother_F(self, cfg: "PrecondConfig | None" = None):
        """Velocity-block smoother: geometric-multigrid V-cycle when a
        hierarchy is attached (the ILU/SSOR/AMG equivalence layer,
        SURVEY.md N10), the P2->P1 p-multigrid on the simplex backend,
        point Jacobi otherwise."""
        import jax.numpy as _jnp

        mg_dtype = getattr(cfg, "mg_dtype", "float32")
        if self.disc.mg is not None:
            from navier_stokes_solver_tpu.precond.mg import make_mg_vcycle

            return make_mg_vcycle(
                self.disc, self.nu, self.inv_dt, self.state_u,
                stokes=self.stokes,
                smooth_degree=getattr(cfg, "mg_smooth_degree", 3),
                smoother=getattr(cfg, "mg_smoother", "gmres"),
                dtype=_jnp.dtype(mg_dtype) if mg_dtype else None,
            )
        if getattr(self.disc, "p_mg", False):
            from navier_stokes_solver_tpu.unstructured.pmg import (
                make_p_vcycle,
            )

            return make_p_vcycle(
                self.disc, self.nu, self.inv_dt, self.state_u,
                stokes=self.stokes,
                diag_f=self.diag_f,
                smooth_degree=getattr(cfg, "mg_smooth_degree", 3),
                dtype=_jnp.dtype(mg_dtype) if mg_dtype else None,
            )
        return self.jacobi_F()

    def jacobi_Mp(self):
        dinv = 1.0 / self.ops.diag_Mp(self.disc, self.nu)
        return lambda x: dinv * x


def _zeros_u(ctx: LinearContext):
    return ctx.disc.zeros_u()


def _zeros_p(ctx: LinearContext):
    return ctx.disc.zeros_p()


def _resolve_inner_mode(ctx: LinearContext, cfg: PrecondConfig) -> str:
    if cfg.inner_mode == "auto":
        return "krylov"
    return cfg.inner_mode


def _fixed_F_solver(ctx: LinearContext, cfg: PrecondConfig, mf):
    """Fixed-cycle velocity solve: V-cycle + residual-corrected repeats
    (the AMG-preconditioned-inner-solve equivalence when no nested Krylov
    iteration is affordable in one XLA program)."""

    def solve(rhs):
        du = mf(rhs)
        for _ in range(cfg.fixed_f_cycles - 1):
            du = du + mf(rhs - ctx.F(du))
        return du

    return solve


def _fixed_Mp_solver(ctx: LinearContext, cfg: PrecondConfig):
    """Chebyshev-Jacobi sweeps on the (well-conditioned) pressure mass,
    or the exact dense inverse when attached (simplex backend)."""
    dense_mp = getattr(ctx.disc, "dense_mp_raw_inv", None)
    if dense_mp is not None:
        raw_inv = _dense_matvec(dense_mp)
        return lambda rhs: ctx.nu * raw_inv(rhs)
    from navier_stokes_solver_tpu.precond.mg import _chebyshev, _estimate_lmax

    dinv = 1.0 / ctx.ops.diag_Mp(ctx.disc, ctx.nu)
    zp = _zeros_p(ctx)
    lmax = _estimate_lmax(ctx.Mp, dinv, zp.shape, zp.dtype, iters=5)

    def solve(rhs):
        return _chebyshev(
            ctx.Mp, dinv, lmax, rhs, jnp.zeros_like(rhs),
            cfg.fixed_mp_degree, lmin_ratio=30.0,
        )

    return solve


def _schur_mode(ctx: LinearContext, cfg: PrecondConfig) -> str:
    """Resolved Schur treatment.  The upgraded modes apply in the Newton
    regime of backends exposing a pressure Laplacian (both the structured
    lattice and the -M simplex path); in the Stokes regime (no time term
    in the operator regardless of ``inv_dt``, and no convection) the mass
    solve alone IS the right Schur approximation."""
    mode = getattr(cfg, "schur_mode", "mass")
    if mode == "mass" or ctx.stokes or not hasattr(ctx.ops, "apply_Lp"):
        return "mass"
    return mode


def _use_cahouet(ctx: LinearContext, cfg: PrecondConfig) -> bool:
    return _schur_mode(ctx, cfg) == "cahouet"


def _lp_has_vcycle(ctx: LinearContext) -> bool:
    """True when the MG chain carries pressure transfers, i.e. the Lp leg
    is backed by a real V-cycle rather than a point-Jacobi stand-in."""
    disc = ctx.disc
    return getattr(disc, "mg", None) is not None and disc.mg.Ppx is not None


def _dense_matvec(mat):
    """Apply a stored f32 dense inverse: the matmul runs f32 on the MXU
    regardless of the context dtype (the leg is a preconditioner; f32
    "exactness" is ample to steer the outer iteration)."""

    def apply(r):
        return (mat @ r.astype(mat.dtype)).astype(r.dtype)

    return apply


def _lp_is_exact(ctx: LinearContext) -> bool:
    """True when the disc carries the dense Lp inverse (the -M simplex
    backend below DENSE_SCHUR_MAX_NP, unstructured/dense.py): one
    application of the Lp preconditioner IS the solve."""
    return getattr(ctx.disc, "dense_lp_inv", None) is not None


def _lp_preconditioner(ctx: LinearContext, cfg: PrecondConfig):
    """Dense inverse matmul when attached (simplex backend), else a
    V-cycle on the pressure Laplacian when the MG chain carries pressure
    transfers, Jacobi otherwise.  ``ctx`` is already in the vmult dtype."""
    disc = ctx.disc
    if _lp_is_exact(ctx):
        return _dense_matvec(disc.dense_lp_inv)
    if _lp_has_vcycle(ctx):
        from navier_stokes_solver_tpu.precond.mg import make_lp_vcycle

        return make_lp_vcycle(disc)
    dinv = 1.0 / ctx.ops.diag_Lp(disc)
    return lambda r: dinv * r


def _make_p_solver(ctx: LinearContext, cfg: PrecondConfig):
    """Pressure-block inner solver ``solve(rhs, tol) -> dp`` for
    blockDiagonal / blockTriangular.

    "mass": Jacobi-CG on the 1/nu-scaled pressure mass to the caller's
    (reference) tolerance -- dp = nu Mp^-1 rhs.
    "cahouet": adds the dt leg, dp += inv_dt * Lp^-1 rhs (V-cycle
    preconditioned CG to ``cc_lp_rel``); with inv_dt == 0 this reduces to
    the mass solve exactly.
    """
    mp = ctx.jacobi_Mp()
    dot = ctx.dot()

    dense_mp = getattr(ctx.disc, "dense_mp_raw_inv", None)
    if dense_mp is not None:
        # exact mass solve as one MXU matmul: apply_Mp = Mp_raw / nu, so
        # Mp^-1 rhs = nu * Mp_raw^-1 rhs (unstructured/dense.py)
        mp_raw_inv = _dense_matvec(dense_mp)

        def solve_mass(rhs, tol):
            return ctx.nu * mp_raw_inv(rhs)

    else:

        def solve_mass(rhs, tol):
            dp, _ = cg(
                ctx.Mp, rhs, jnp.zeros_like(rhs), tol=tol,
                maxiter=cfg.inner_maxiter, M=mp, dot=dot,
            )
            return dp

    mode = _schur_mode(ctx, cfg)
    if mode == "mass":
        return solve_mass

    mlp = _lp_preconditioner(ctx, cfg)
    nrm = ctx.norm()
    rel = getattr(cfg, "cc_lp_rel", 1e-2)
    cycles = getattr(cfg, "cc_lp_cycles", None)
    # ``cc_lp_cycles`` replaces the nested Lp solve with N applications of
    # the Lp *preconditioner* -- a near-free trade when that preconditioner
    # is a V-cycle (docs/PERF.md) or the dense exact inverse, but
    # catastrophic when it is point Jacobi (the pre-dense -M simplex
    # backend): one Jacobi sweep scaled by inv_dt makes the Schur leg
    # worse than no leg at all (measured: 25-30 -> 500-2000 outers/solve
    # on the 60x40 Re-ramp).  Honor it only with a V-cycle/exact inverse.
    if _lp_is_exact(ctx):
        # one application of the exact inverse IS the solve: skip the
        # nested FGMRES wrapper entirely
        cycles = 1
    elif cycles is not None and not _lp_has_vcycle(ctx):
        cycles = None

    if cycles is not None:

        def solve_lp(rhs):
            dl = mlp(rhs)
            for _ in range(cycles - 1):
                dl = dl + mlp(rhs - ctx.Lp(dl))
            return dl

    else:

        def solve_lp(rhs):
            # FGMRES, not CG: the V-cycle's inexact coarse solve makes the
            # preconditioner (mildly) nonlinear, which stalls CG; a flexible
            # method reaches the loose Schur-leg tolerance in a few iterations
            dl, _ = fgmres(
                ctx.Lp, rhs, jnp.zeros_like(rhs), tol=rel * nrm(rhs),
                maxiter=cfg.inner_maxiter, M=mlp, dot=dot,
            )
            return dl

    if mode == "cahouet":

        def solve_cc(rhs, tol):
            return solve_mass(rhs, tol) + ctx.inv_dt * solve_lp(rhs)

        return solve_cc

    # "pcd": dp = Mp_raw^-1 Fp Ap^-1 rhs
    dinv_raw = 1.0 / ctx.ops.diag_Mp(ctx.disc, 1.0)
    mp_raw = lambda r: dinv_raw * r

    def solve_pcd(rhs, tol):
        z = solve_lp(rhs)
        wv = ctx.ops.apply_Fp(ctx.disc, ctx.nu, ctx.inv_dt, ctx.linq, z)
        dp, _ = cg(
            lambda x: ctx.ops.apply_Mp_raw(ctx.disc, x),
            wv, jnp.zeros_like(wv), tol=rel * nrm(wv),
            maxiter=cfg.inner_maxiter, M=mp_raw, dot=dot,
        )
        return dp

    return solve_pcd


def _fixed_p_solver(ctx: LinearContext, cfg: PrecondConfig):
    """Fixed-sweep pressure solve (no nested iteration): Chebyshev mass
    sweeps, plus one Lp V-cycle per application under Cahouet-Chabard,
    or the V-cycle/Fp/Jacobi-mass sandwich under PCD."""
    base = _fixed_Mp_solver(ctx, cfg)
    mode = _schur_mode(ctx, cfg)
    if mode == "mass":
        return base
    mlp = _lp_preconditioner(ctx, cfg)
    if not (_lp_has_vcycle(ctx) or _lp_is_exact(ctx)):
        # No pressure V-cycle (the -M simplex backend): a single Jacobi
        # application is far too weak for the inv_dt-scaled Lp leg (see
        # _make_p_solver).  Chebyshev-Jacobi sweeps are the best fixed-cost
        # stand-in available inside one XLA program.
        from navier_stokes_solver_tpu.precond.mg import (
            _chebyshev, _estimate_lmax,
        )

        dinv_lp = 1.0 / ctx.ops.diag_Lp(ctx.disc)
        zp = _zeros_p(ctx)
        lmax_lp = _estimate_lmax(ctx.Lp, dinv_lp, zp.shape, zp.dtype, iters=5)

        def mlp(rhs):  # noqa: F811 -- intentional upgrade of the Jacobi leg
            return _chebyshev(
                ctx.Lp, dinv_lp, lmax_lp, rhs, jnp.zeros_like(rhs),
                max(cfg.fixed_mp_degree, 6), lmin_ratio=30.0,
            )
    if mode == "cahouet":

        def solve(rhs):
            return base(rhs) + ctx.inv_dt * mlp(rhs)

        return solve

    dinv_raw = 1.0 / ctx.ops.diag_Mp(ctx.disc, 1.0)

    def solve_pcd(rhs):
        return dinv_raw * ctx.ops.apply_Fp(
            ctx.disc, ctx.nu, ctx.inv_dt, ctx.linq, mlp(rhs)
        )

    return solve_pcd


# ---------------------------------------------------------------------------
# direct dense-LU (PrecondConfig.direct_lu)
# ---------------------------------------------------------------------------

import os as _os

# Above this total DoF count the dense Jacobian stops being "small"
# (n^2 * 4 B for the matrix + the same for its LU factors; 30k -> 3.6 GB
# transient) and the O(n^3) factorization stops being a per-tangent-solve
# triviality -- fall back to the requested block preconditioner.
DIRECT_LU_MAX_N = int(_os.environ.get("NSTPU_DIRECT_LU_MAX", "30000"))


def _direct_lu_eligible(ctx: LinearContext) -> bool:
    disc = ctx.disc
    if getattr(disc, "halo_axis", None) is not None:
        return False  # dd tiles: operators are seam-partial, not global
    n = disc.zeros_u().size + disc.zeros_p().size
    return n <= DIRECT_LU_MAX_N


def make_direct_lu(ctx: LinearContext):
    """Exact f32 solve with the dense LU of the full saddle Jacobian.

    The matrix is materialized column-block-wise by applying the
    matrix-free Jacobian to one-hot basis vectors under ``vmap`` (so the
    dense operator agrees with ``apply_jacobian`` bitwise by
    construction), then factored with partial pivoting.  Rows that the
    matrix-free apply leaves exactly zero (orphan lattice nodes inside
    the voxelized cylinder hole; cf. unstructured/dense.py) get an
    identity diagonal -- Krylov residuals are identically zero there.

    Built once per ``make_preconditioner`` call = once per tangent solve
    (the reference re-``initialize``s its preconditioner at the same
    cadence, NSSolver.cpp:607-651); XLA hoists the build out of the
    Krylov ``while_loop`` since it is loop-invariant.
    """
    from jax.flatten_util import ravel_pytree

    disc = ctx.disc
    zero = Blocks(u=disc.zeros_u(), p=disc.zeros_p())
    flat0, unravel = ravel_pytree(zero)
    n = flat0.shape[0]

    def matvec_flat(xf):
        y = ctx.ops.apply_jacobian(
            disc, ctx.nu, ctx.inv_dt, ctx.linq, ctx.diag_f, unravel(xf),
            stokes=ctx.stokes,
        )
        return ravel_pytree(y)[0]

    chunk = 512  # bounds the vmapped intermediates to a few hundred MB
    n_chunks = -(-n // chunk)

    def build_chunk(c0):
        idx = c0 * chunk + jnp.arange(chunk)
        basis = jax.nn.one_hot(idx, n, dtype=flat0.dtype)  # rows e_j
        return jax.vmap(matvec_flat)(basis)  # rows = (A e_j)^T

    cols = jax.lax.map(build_chunk, jnp.arange(n_chunks))
    A = cols.reshape(n_chunks * chunk, n)[:n].T  # [n, n]
    # Exactly-zero rows (orphan lattice nodes, e.g. inside the voxelized
    # cylinder hole) get an identity diagonal; Krylov residuals are
    # identically zero there.  NOTE: zero *diagonals* alone do not
    # qualify -- every pressure row of the saddle system has one.
    row_max = jnp.max(jnp.abs(A), axis=1)
    zero_row = row_max == 0.0
    A = A + jnp.diag(zero_row.astype(A.dtype))
    # Row/column equilibration: the saddle system is badly scaled
    # (momentum rows ~nu, continuity rows ~1), which inflates cond(A)
    # and with it the f32 LU's backward error (the per-outer-iteration
    # residual contraction of the preconditioned Krylov solve).
    # Scaling both sides to unit max-norm recovers the intrinsic FEM
    # conditioning.
    r = 1.0 / jnp.where(zero_row, 1.0, row_max)
    As = A * r[:, None]
    c = 1.0 / jnp.maximum(jnp.max(jnp.abs(As), axis=0), 1e-30)
    As = As * c[None, :]
    lu_piv = jax.scipy.linalg.lu_factor(As)

    def vmult(src: Blocks) -> Blocks:
        b, unr = ravel_pytree(src)
        return unr(c * jax.scipy.linalg.lu_solve(lu_piv, r * b))

    return vmult


# ---------------------------------------------------------------------------
# blockDiagonal
# ---------------------------------------------------------------------------


def make_block_diagonal(ctx: LinearContext, cfg: PrecondConfig, variant: str):
    """[A 0; 0 Mp]^-1 approximation via inner solves.

    Unsteady (NSSolver.hpp:154-176): FGMRES(F) and CG(Mp) to *absolute*
    tolerance 1e-1, ILU-preconditioned.
    Stationary (NSSolverStationary.hpp:131-153): same solves to *relative*
    tolerance 1e-1, SSOR-preconditioned.
    """
    mf = ctx.smoother_F(cfg)
    dot, nrm = ctx.dot(), ctx.norm()

    if _resolve_inner_mode(ctx, cfg) == "fixed":
        solve_f = _fixed_F_solver(ctx, cfg, mf)
        solve_p = _fixed_p_solver(ctx, cfg)

        def vmult(src: Blocks) -> Blocks:
            return Blocks(u=solve_f(src.u), p=solve_p(src.p))

        return vmult

    solve_p = _make_p_solver(ctx, cfg)

    def vmult(src: Blocks) -> Blocks:
        if variant == "unsteady":
            tol_u = jnp.asarray(1e-1, ctx.disc.dtype)
            tol_p = jnp.asarray(1e-1, ctx.disc.dtype)
        else:
            tol_u = 1e-1 * nrm(src.u)
            tol_p = 1e-1 * nrm(src.p)
        du, _ = fgmres(
            ctx.F, src.u, _zeros_u(ctx), tol=tol_u, maxiter=cfg.inner_maxiter,
            M=mf, dot=dot,
        )
        return Blocks(u=du, p=solve_p(src.p, tol_p))

    return vmult


# ---------------------------------------------------------------------------
# blockTriangular
# ---------------------------------------------------------------------------


def make_block_triangular(ctx: LinearContext, cfg: PrecondConfig, variant: str):
    """Triangular sweep: velocity solve, pressure correction, mass solve.

    Unsteady (NSSolver.hpp:211-237): FGMRES(F) to rel 1e-4, then
    tmp = src_p - B u, then CG(Mp) to 1e-5 * ||src_p||; ILU smoothers.
    Stationary (NSSolverStationary.hpp:188-218): rel 1e-2 / 1e-2 with AMG on
    the velocity block and ILU on the pressure mass.
    """
    mf = ctx.smoother_F(cfg)
    dot, nrm = ctx.dot(), ctx.norm()
    for name, v in (
        ("tri_rel_u", cfg.tri_rel_u),
        ("tri_rel_p", cfg.tri_rel_p),
        ("tri_rel_u_stokes", cfg.tri_rel_u_stokes),
        ("tri_rel_p_stokes", cfg.tri_rel_p_stokes),
    ):
        if v is not None and not v > 0.0:
            raise ValueError(f"PrecondConfig.{name} must be > 0, got {v!r}")
    rel_u = cfg.tri_rel_u if cfg.tri_rel_u is not None else (
        1e-4 if variant == "unsteady" else 1e-2
    )
    rel_p = cfg.tri_rel_p if cfg.tri_rel_p is not None else (
        1e-5 if variant == "unsteady" else 1e-2
    )
    if ctx.stokes:  # static at trace time
        if cfg.tri_rel_u_stokes is not None:
            rel_u = cfg.tri_rel_u_stokes
        if cfg.tri_rel_p_stokes is not None:
            rel_p = cfg.tri_rel_p_stokes

    if _resolve_inner_mode(ctx, cfg) == "fixed":
        solve_f = _fixed_F_solver(ctx, cfg, mf)
        solve_p = _fixed_p_solver(ctx, cfg)

        def vmult(src: Blocks) -> Blocks:
            du = solve_f(src.u)
            tmp = src.p - ctx.B(du)
            return Blocks(u=du, p=solve_p(tmp))

        return vmult

    solve_p = _make_p_solver(ctx, cfg)

    def vmult(src: Blocks) -> Blocks:
        du, _ = fgmres(
            ctx.F,
            src.u,
            _zeros_u(ctx),
            tol=rel_u * nrm(src.u),
            maxiter=cfg.inner_maxiter,
            M=mf,
            dot=dot,
        )
        tmp = src.p - ctx.B(du)
        # The reference keys this tolerance off ||src.p|| (NSSolver.hpp:228)
        # while solving with rhs ``tmp``; when src.p == 0 that is tol = 0 on
        # a nonzero system -- floor it at machine precision of the rhs.
        eps = jnp.finfo(ctx.disc.dtype).eps
        dp = solve_p(
            tmp, jnp.maximum(rel_p * nrm(src.p), 100.0 * eps * nrm(tmp))
        )
        return Blocks(u=du, p=dp)

    return vmult


# ---------------------------------------------------------------------------
# aSIMPLE
# ---------------------------------------------------------------------------


def _S_preconditioner(ctx: LinearContext, cfg: PrecondConfig):
    """The ILU(S-hat) analog (reference initializes ILU on the assembled
    S-hat, NSSolver.hpp:289-292 / NSSolverStationary.hpp:265-269): a
    pressure-Laplacian V-cycle (Jacobi where the MG chain carries no
    pressure transfers).  S-hat = B diag(F)^-1 B^T is spectrally
    equivalent to Lp uniformly in h, so the unpreconditioned CG's
    ~1/h-growing inner counts (which stall the 300x100 Stokes solves once
    they exceed ``asimple_s_maxiter``) become h-independent.  ``None``
    when the backend exposes no pressure-Laplacian surface."""
    if not hasattr(ctx.ops, "apply_Lp"):
        return None
    return _lp_preconditioner(ctx, cfg)


def _solve_S(ctx: LinearContext, cfg: PrecondConfig, rhs, tol, M=None):
    """Inner solve with the approximate Schur complement.

    In the Newton regime S = B diag(F)^-1 B^T is (nearly) SPD; in the Stokes
    regime the continuity sign flip makes it negative definite, so the solve
    runs on -S (a documented deviation: the reference's Trilinos CG/ILU
    operate on the same sign-indefinite operator and rely on loose
    tolerances).  With an ``_S_preconditioner`` the method is FGMRES --
    the V-cycle's inexact coarse solve makes the preconditioner mildly
    nonlinear, which stalls CG (same trade as ``_make_p_solver``).
    """
    if ctx.stokes:
        op = lambda p: -ctx.S(p)
        rhs = -rhs
    else:
        op = ctx.S
    if M is not None:
        dp, info = fgmres(
            op, rhs, jnp.zeros_like(rhs), tol=tol,
            maxiter=cfg.asimple_s_maxiter, M=M, dot=make_dot(ctx.disc),
        )
        return dp
    dp, info = cg(
        op, rhs, jnp.zeros_like(rhs), tol=tol, maxiter=cfg.asimple_s_maxiter,
        dot=make_dot(ctx.disc),
    )
    return dp


def make_asimple(ctx: LinearContext, cfg: PrecondConfig, variant: str, alpha: float):
    """SIMPLE-type factorized preconditioner.

    Unsteady (NSSolver.hpp:293-350): pure smoother applications --
    dst_u = ILU_F(src_u); tmp_p = src_p + B dst_u; dst_p = ILU_S(tmp_p);
    dst_u *= D; dst_p /= alpha; dst_u -= B^T dst_p; dst_u *= D^-1.
    (alpha = 0.5 hardcoded at the call site, NSSolver.cpp:645.)

    Stationary (NSSolverStationary.hpp:282-311): inner FGMRES(F) and CG(S)
    to rel 1e-1, then delta_p *= alpha and the velocity correction
    u -= D^-1 B^T delta_p; dst_p = delta_p.
    """
    mf = ctx.smoother_F(cfg)
    dot, nrm = ctx.dot(), ctx.norm()
    D = ctx.diag_f
    Dinv = 1.0 / D
    ms = _S_preconditioner(ctx, cfg)  # built once (outside the Krylov body)

    if variant == "unsteady":

        def vmult(src: Blocks) -> Blocks:
            du = mf(src.u)  # ILU(F) substitute
            tmp_p = src.p + ctx.B(du)  # vmult_add (NSSolver.hpp:324)
            dp = _solve_S(
                ctx, cfg, tmp_p, tol=cfg.asimple_s_rel_tol * nrm(tmp_p), M=ms
            )
            du = du * D
            dp = dp / alpha
            du = du - ctx.Bt(dp)
            du = du * Dinv
            return Blocks(u=du, p=dp)

    else:

        fixed = _resolve_inner_mode(ctx, cfg) == "fixed"
        solve_f = _fixed_F_solver(ctx, cfg, mf) if fixed else None
        # Reference inners are rel 1e-1 (NSSolverStationary.hpp:290-305).
        # The Stokes-regime-only tight override (see make_block_triangular)
        # applies here for the same reason: the Schur-preconditioned Stokes
        # outer count is h-flat only with accurate enough inner solves.
        rel_f = rel_s = 1e-1
        if ctx.stokes:  # static at trace time
            if cfg.tri_rel_u_stokes is not None:
                rel_f = cfg.tri_rel_u_stokes
            if cfg.tri_rel_p_stokes is not None:
                rel_s = cfg.tri_rel_p_stokes
        # Stokes-regime mass-Schur swap (PrecondConfig.asimple_stokes_schur)
        stokes_mass = (
            ctx.stokes
            and getattr(cfg, "asimple_stokes_schur", "shat") == "mass"
        )
        if stokes_mass:
            mp = ctx.jacobi_Mp()

            def solve_mass(rhs, tol):
                dp, _ = cg(
                    ctx.Mp, rhs, jnp.zeros_like(rhs), tol=tol,
                    maxiter=cfg.inner_maxiter, M=mp, dot=make_dot(ctx.disc),
                )
                return dp

        def vmult(src: Blocks) -> Blocks:
            if fixed:
                du = solve_f(src.u)
            else:
                du, _ = fgmres(
                    ctx.F,
                    src.u,
                    _zeros_u(ctx),
                    tol=rel_f * nrm(src.u),
                    maxiter=cfg.inner_maxiter,
                    M=mf,
                    dot=dot,
                )
            tmp_p = src.p - ctx.B(du)
            if stokes_mass:
                # the Stokes-correct pressure-mass solve, exactly the
                # blockTriangular pressure leg (NSSolver.hpp:228-236)
                dp = solve_mass(tmp_p, rel_s * nrm(tmp_p))
            else:
                dp = _solve_S(ctx, cfg, tmp_p, tol=rel_s * nrm(tmp_p), M=ms)
            dp = dp * alpha
            du = du - Dinv * ctx.Bt(dp)
            return Blocks(u=du, p=dp)

    return vmult


def _cast_floating(tree, dtype):
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )


def _cast_ctx(ctx: LinearContext, dtype) -> LinearContext:
    """Re-land the whole linearization in ``dtype`` (for mixed-precision
    preconditioning: f32 inner solves inside the f64 outer Krylov)."""
    return dataclasses.replace(
        ctx,
        disc=_cast_floating(ctx.disc, dtype),
        linq=None if ctx.linq is None else _cast_floating(ctx.linq, dtype),
        diag_f=ctx.diag_f.astype(dtype),
        state_u=None if ctx.state_u is None else ctx.state_u.astype(dtype),
        nu=jnp.asarray(ctx.nu, dtype),
        inv_dt=jnp.asarray(ctx.inv_dt, dtype),
    )


def make_krylov_lo(kind: int, ctx: LinearContext, *, variant: str, cfg):
    """Low-precision restart-cycle configuration for the outer Krylov solve
    (GMRES-IR; see ``krylov.LowCycle`` and ``PrecondConfig
    .krylov_cycle_dtype``).  Returns ``None`` when disabled.

    The cycle operator/preconditioner/dot are the same Jacobian apply,
    block preconditioner and (seam-weighted) inner product as the
    full-precision outer solve, re-landed in the cycle dtype.
    """
    lo_dt = getattr(cfg, "krylov_cycle_dtype", None) if cfg else None
    if lo_dt is None:
        return None
    if getattr(cfg, "direct_lu", False) and _direct_lu_eligible(ctx):
        # the exact-LU preconditioner converges the f64 outer in a
        # handful of iterations; f32 IR cycles would only re-build the
        # (large) factorization a second time for no win
        return None
    # "mixed": matvec + preconditioner in f32, Arnoldi basis /
    # orthogonalization / Givens in the operator dtype.  Sits between
    # full-f32 cycles (cheapest per iteration, weakest subspace) and f64
    # cycles: the f32 operator perturbation costs far fewer extra outer
    # iterations than an f32-orthogonalized basis (inexact-Krylov
    # regime), while the matvec -- the emulated-f64 heavy leg -- still
    # runs native f32.
    mixed = isinstance(lo_dt, str) and lo_dt == "mixed"
    wd = jnp.dtype("float32") if mixed else jnp.dtype(lo_dt)
    hi = jnp.dtype(ctx.disc.dtype)
    if wd == hi:
        # cycles would run at the operator precision anyway; a no-op
        # LowCycle would still arm the IR stall/fallback machinery
        return None
    from navier_stokes_solver_tpu.krylov import LowCycle

    ctx_lo = _cast_ctx(ctx, wd)
    M_lo = make_preconditioner(kind, ctx_lo, variant=variant, cfg=cfg)

    def A_lo(x):
        return ctx_lo.ops.apply_jacobian(
            ctx_lo.disc, ctx_lo.nu, ctx_lo.inv_dt, ctx_lo.linq,
            ctx_lo.diag_f, x, stokes=ctx_lo.stokes,
        )

    eta = getattr(cfg, "ir_eta", None)
    kw = {} if eta is None else {"eta": eta}
    if mixed:
        cast = lambda t, dt: jax.tree_util.tree_map(
            lambda a: a.astype(dt), t
        )
        return LowCycle(
            matvec=lambda x: cast(A_lo(cast(x, wd)), hi),
            M=lambda x: cast(M_lo(cast(x, wd)), hi),
            dot=make_dot(ctx.disc),
            dtype=hi,
            **kw,
        )

    return LowCycle(
        matvec=A_lo, M=M_lo, dot=make_dot(ctx_lo.disc), dtype=wd, **kw
    )


# ---------------------------------------------------------------------------
# dispatch (mirrors NSSolver.cpp:607-668)
# ---------------------------------------------------------------------------

PRECONDITIONER_NAMES = {0: "blockDiagonal", 1: "blockTriangular", 2: "aSIMPLE"}


def make_preconditioner(
    kind: int,
    ctx: LinearContext,
    *,
    variant: str,
    cfg: PrecondConfig | None = None,
    alpha: float = 0.5,
) -> Callable[[Blocks], Blocks]:
    cfg = cfg or PrecondConfig()
    if variant not in ("unsteady", "stationary"):
        raise ValueError(f"unknown variant {variant!r}")

    out_dtype = ctx.disc.dtype
    vd = jnp.dtype(cfg.vmult_dtype) if cfg.vmult_dtype else None
    if vd is not None and vd != out_dtype:
        ctx = _cast_ctx(ctx, vd)

    if getattr(cfg, "direct_lu", False) and _direct_lu_eligible(ctx):
        vmult = make_direct_lu(ctx)
    elif kind == 0:
        vmult = make_block_diagonal(ctx, cfg, variant)
    elif kind == 1:
        vmult = make_block_triangular(ctx, cfg, variant)
    elif kind == 2:
        vmult = make_asimple(ctx, cfg, variant, alpha)
    else:
        raise ValueError(
            "Invalid preconditioner type. Use 0: blockDiagonal, "
            "1: blockTriangular, 2: aSIMPLE."
        )  # NSSolver.cpp:667

    if vd is None or vd == out_dtype:
        return vmult

    def vmult_mixed(src: Blocks) -> Blocks:
        out = vmult(_cast_floating(src, vd))
        return _cast_floating(out, out_dtype)

    return vmult_mixed
