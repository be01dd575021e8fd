"""Shared solver machinery: options, setup, tangent solves, lift/drag."""

from __future__ import annotations

import dataclasses
import os
import time as _time
from typing import Any

import numpy as np

from navier_stokes_solver_tpu.api import kernels
from navier_stokes_solver_tpu.geometry import make_channel_geometry, make_fe_space
from navier_stokes_solver_tpu.ops import Blocks, make_disc

__all__ = ["SolverOptions", "NSSolverBase", "SOLVER_NAMES", "PRECONDITIONER_NAMES"]

SOLVER_NAMES = {0: "GMRES", 1: "FGMRES", 2: "Bicgstab"}
PRECONDITIONER_NAMES = {0: "blockDiagonal", 1: "blockTriangular", 2: "aSIMPLE"}


@dataclasses.dataclass
class SolverOptions:
    """CLI-equivalent configuration (defaults from test.cpp:25-34)."""

    mesh_size: tuple[int, int] = (100, 100)  # -m X,Y
    degree_velocity: int = 3  # generated-mesh path default (test.cpp:26)
    degree_pressure: int = 2
    Re: float = 100.0  # -r
    solver_type: int = 1  # -s (FGMRES)
    tolerance: float = 1e-6  # -t (absolute)
    preconditioner_type: int = 0  # -p (blockDiagonal)
    time_span: float = 1.0  # -T span,step (unsteady only)
    time_step: float = 0.01
    # Outer GMRES/FGMRES restart basis (deal.II default 30).  The
    # mass-Schur-preconditioned saddle system converges in a Krylov space
    # whose useful dimension exceeds 30 (inf-sup-limited spectrum):
    # measured at 32x12/tol 1e-12 a basis of 100 cuts outer iterations
    # from 140 to 65 at identical fields.  30 keeps reference iteration
    # trajectories; larger is a perf knob.
    krylov_basis: int = 30
    read_mesh_from_file: bool = False  # -M (switches degrees to 2,1)
    mesh_file_name: str = ""
    # Domain: "channel" = the reference's Schaefer-Turek channel+cylinder
    # (the only geometry the reference supports); "cavity" = lid-driven
    # cavity extension (geometry/cavity.py, Ghia et al. benchmark) --
    # structured path only.
    geometry: str = "channel"
    alpha: float = 0.5  # aSIMPLE damping (hardcoded, NSSolver.cpp:645)
    multigrid: bool = True  # geometric-MG velocity smoother (AMG/ILU analog)
    dtype: Any = None  # default: f64 when x64 enabled
    verbose: bool = True
    write_output: bool = False  # VTU snapshots (reference writes always)
    output_dir: str = "."
    profile_dir: str = ""  # capture a jax.profiler trace of solves here
    fused: bool = False  # unsteady: fully on-device lax.scan time loop
    write_mesh: bool = False  # write mesh.msh at setup (NSSolver.cpp:108)
    # Optional body force f(x, y) -> (fx, fy) (the reference's ForcingTerm
    # placeholder, NSSolver.hpp:93-122; zero when None)
    forcing: Any = None
    # Preconditioner equivalence-layer tunables (precond.PrecondConfig):
    # inner_mode krylov/fixed, mg smoother/degree, vmult precision, caps
    precond_config: Any = None
    # Domain decomposition (x_tiles, y_tiles): run every tangent solve
    # distributed over a jax device mesh inside shard_map -- the analog of
    # the reference's `mpiexec -n` rank count (run_sim_steady.sh:24).
    # None = single device.  The -M simplex backend decomposes into 1-D
    # x-strips (dist/simplex.py); host-driven and fused paths both run
    # decomposed on either backend.
    dd: Any = None
    # Stationary continuation: skip the reference's repeat Stokes-regime
    # tangent solves.  The Stokes-regime rhs is state-independent
    # (NSSolverStationary.cpp:472-475 skips the i-loop), so from Newton
    # iteration 1 on, the solved update CANNOT change ||r|| and the
    # strict-< line search (NSSolverStationary.cpp:733) always rejects it
    # -- the reference performs a full-size futile solve (~30-35% of the
    # bench's outer iterations) whose only state effect is a 1e-12-scaled
    # leftover from the rejected line search's last trial.  True breaks
    # out of the Newton loop instead.  Final fields agree to ~1e-12 of
    # the rejected direction; iteration counts drop accordingly.
    skip_futile_stokes: bool = False
    # -M simplex backend: attach dense f32 inverses of the pressure mass
    # and pressure Laplacian so the blockDiagonal/blockTriangular Schur
    # legs run as single MXU matmuls instead of nested Jacobi-CG/FGMRES
    # solves (unstructured/dense.py; auto-skipped above
    # NSTPU_DENSE_SCHUR_MAX pressure nodes or under dd).  Equivalence
    # layer: the exact solve is strictly stronger than the reference's
    # ILU-CG inners (NSSolver.hpp:228-236).  NSTPU_DENSE_SCHUR=0/1
    # overrides.
    dense_schur: bool = True
    # Newton continuity-rhs sign.  False = reference parity, INCLUDING the
    # reference's sign inconsistency between its Jacobian's +(q, div du)
    # row (NSSolver.cpp:461-463) and its rhs's +(q, div u_k) term
    # (NSSolver.cpp:517-519) that makes the iterate's divergence double on
    # every accepted full Newton step (the exactly-x2-per-step unsteady
    # blowup; docs/PERF.md round 4).  True = Jacobian-consistent
    # -(q, div u_k): Newton contracts the continuity residual and long
    # unsteady trajectories are stable.
    consistent_continuity: bool = False


class NSSolverBase:
    """Common lifecycle for the stationary and unsteady solvers."""

    VARIANT: str = ""  # "stationary" | "unsteady"
    KRYLOV_MAXITER: int = 0  # SolverControl maxit

    def __init__(self, options: SolverOptions | None = None, **kwargs):
        if options is None:
            options = SolverOptions(**kwargs)
        elif kwargs:
            options = dataclasses.replace(options, **kwargs)
        if options.read_mesh_from_file:
            # -M flips the FE degrees (test.cpp:66-70) and selects the
            # unstructured P2/P1 simplex backend (NSSolver.cpp:144-209).
            options = dataclasses.replace(
                options, degree_velocity=2, degree_pressure=1
            )
        self.options = options
        self.Re = options.Re
        self.nu: float = 0.01 if self.VARIANT == "unsteady" else 0.001
        self.history: list[dict] = []
        self.lift_force = 0.0
        self.drag_force = 0.0
        self.lift_coeff = 0.0
        self.drag_coeff = 0.0
        self._is_setup = False
        self.K = kernels  # kernel backend; swapped for DistKernels under dd
        self.dist_mesh = None
        self._dd_simplex = None  # DecomposedSimplex under -M + dd
        from navier_stokes_solver_tpu.obs import PhaseTimer

        self.timer = PhaseTimer()

    # ------------------------------------------------------------------
    def log(self, *msg):
        if self.options.verbose:
            print(*msg, flush=True)

    def setup(self):
        """Build mesh, FE space and device data (NSSolver::setup,
        NSSolver.cpp:3-311).  The ``-M`` path builds the unstructured
        P2/P1 simplex backend (NSSolver.cpp:144-209) from a gmsh file, or
        from a triangulated internal channel when no file is given."""
        o = self.options
        t0 = _time.perf_counter()
        if o.geometry == "cavity":
            if o.read_mesh_from_file:
                raise ValueError(
                    "geometry='cavity' is structured-path only (no -M)"
                )
            from navier_stokes_solver_tpu.geometry import make_cavity_geometry

            self.geo = make_cavity_geometry(*o.mesh_size)
        elif o.geometry == "channel":
            self.geo = make_channel_geometry(*o.mesh_size)
        else:
            raise ValueError(f"unknown geometry {o.geometry!r}")
        if o.read_mesh_from_file:
            from navier_stokes_solver_tpu.unstructured import (
                make_simplex_disc,
                triangulate_channel,
            )

            if o.mesh_file_name:
                from navier_stokes_solver_tpu.io import read_msh

                data = read_msh(o.mesh_file_name)
                if data["tri"].shape[0] == 0:
                    raise ValueError(
                        f"{o.mesh_file_name!r} contains no triangles"
                    )
                nodes, tri = data["nodes_xy"], data["tri"]
                bedges, btags = data["edges"], data["edge_tag"]
            else:
                nodes, tri, bedges, btags = triangulate_channel(self.geo)
            self.space = None
            self.disc = make_simplex_disc(nodes, tri, bedges, btags, o.dtype)
            if o.multigrid:
                # P2 -> P1 p-multigrid on the velocity block (the simplex
                # analog of the structured geometric-MG equivalence layer)
                self.disc = self.disc.replace(p_mg=True)
            env_ds = os.environ.get("NSTPU_DENSE_SCHUR")
            if (o.dense_schur if env_ds is None else env_ds != "0") and (
                o.dd is None
            ):
                # pressure-Schur legs as dense-inverse matmuls (the small
                # P1 pressure space makes the exact solve one MXU pass;
                # unstructured/dense.py)
                from navier_stokes_solver_tpu.unstructured.dense import (
                    attach_dense_schur,
                )

                self.disc = attach_dense_schur(self.disc)
            n_el = self.disc.n_tri
            n_dofs_v = 2 * self.disc.n_nodes_v
            n_dofs_p = self.disc.n_nodes_p
            if o.dd is not None:
                self._setup_dist_simplex(nodes, tri, bedges, btags)
        else:
            self.space = make_fe_space(
                self.geo, o.degree_velocity, o.degree_pressure
            )
            self.disc = make_disc(self.space, o.dtype, forcing=o.forcing)
            if o.multigrid:
                from navier_stokes_solver_tpu.precond.mg import attach_mg

                self.disc = attach_mg(self.disc)
            n_el = self.geo.n_active_cells
            n_dofs_v = self.space.n_dofs_velocity
            n_dofs_p = self.space.n_dofs_pressure
            if o.write_mesh:
                # the reference always writes the generated mesh
                # (GridOut::write_msh, NSSolver.cpp:108-110); opt-in here
                from navier_stokes_solver_tpu.io import write_msh

                write_msh(self.geo, "mesh.msh")
            if o.dd is not None:
                self._setup_dist()
        self.log(f"  Number of elements = {n_el}")
        self.log("-----------------------------------------------")
        self.log("Initializing the finite element space")
        self.log(f"  Velocity degree:           = {o.degree_velocity}")
        self.log(f"  Pressure degree:           = {o.degree_pressure}")
        self.log("-----------------------------------------------")
        self.log("  Number of DoFs: ")
        self.log(f"    velocity = {n_dofs_v}")
        self.log(f"    pressure = {n_dofs_p}")
        self.log(f"    total    = {n_dofs_v + n_dofs_p}")
        self.n_dofs = n_dofs_v + n_dofs_p

        zero = Blocks(u=self.disc.zeros_u(), p=self.disc.zeros_p())
        if self.dist_mesh is not None:
            import jax
            import jax.numpy as jnp

            n_tiles = self.disc.halo_n * self.disc.halo_ny
            stack = lambda a: jnp.zeros((n_tiles,) + a.shape, a.dtype)
            zero = jax.tree_util.tree_map(stack, zero)
            from navier_stokes_solver_tpu.dist import device_put_dist

            zero = device_put_dist(zero, self.dist_mesh)
        self.solution = zero
        self.solution_old = zero
        self.delta = zero  # persistent delta_owned (warm start semantics)
        # assembly / lift-drag do not touch the MG chain: strip it from
        # their kernel inputs (less per-call marshalling, and their
        # compiled programs stay valid when the chain layout changes)
        from navier_stokes_solver_tpu.ops.disc import Disc as _StructDisc

        if isinstance(self.disc, _StructDisc):
            self.disc_nomg = (
                self.disc.replace(mg=None)
                if self.disc.mg is not None
                else self.disc
            )
        elif getattr(self.disc, "dense_lp_inv", None) is not None:
            # assembly / lift-drag never touch the dense Schur inverses:
            # keep the (large) matrices out of their kernel inputs
            self.disc_nomg = self.disc.replace(
                dense_mp_raw_inv=None, dense_lp_inv=None
            )
        else:
            self.disc_nomg = self.disc
        self._is_setup = True
        self.setup_seconds = _time.perf_counter() - t0
        return self

    def _setup_dist_simplex(self, nodes, tri, bedges, btags):
        """Strip-decompose the simplex disc over the device mesh
        (dist/simplex.py) and swap in the shard_map kernel backend, so
        host-driven solves (solve_newton / solve) and the fused time loop
        both run decomposed on -M meshes -- matching the reference's fully
        rank-parallel -M path (NSSolver.cpp:144-209)."""
        o = self.options
        import jax

        from navier_stokes_solver_tpu.dist import (
            decompose_simplex_disc,
            device_put_dist,
            make_dd_mesh,
        )
        from navier_stokes_solver_tpu.dist.kernels import DistKernels

        n_x, n_y = (o.dd, 1) if isinstance(o.dd, int) else tuple(o.dd)
        if n_y != 1:
            raise NotImplementedError(
                "simplex decomposition is 1-D (x-strips); use dd=(n, 1)"
            )
        if n_x > len(jax.devices()):
            raise ValueError(
                f"dd={o.dd} needs {n_x} devices but only "
                f"{len(jax.devices())} are available"
            )
        self.dist_mesh = make_dd_mesh(n_x, 1)
        self._dd_simplex = decompose_simplex_disc(
            nodes, tri, bedges, btags, n_x, o.dtype,
            global_disc=self.disc,  # reuse setup()'s disc (no rebuild)
        )
        # the decomposed disc carries per-tile pmg_* transfer tables, so
        # fused dd runs keep the P2->P1 p-MG inners (p_mg flag copied from
        # the global disc)
        self.disc = device_put_dist(self._dd_simplex.disc, self.dist_mesh)
        self.K = DistKernels(self.disc, self.dist_mesh)
        self.log(f"  Domain decomposition: {n_x} x-strips")

    def _setup_dist(self):
        """Decompose the structured disc over a device mesh and swap the
        kernel backend for the shard_map one (the reference's MPI domain
        decomposition analog; see dist/kernels.py)."""
        o = self.options
        if self.space is None:
            raise NotImplementedError(
                "domain decomposition requires the structured backend"
            )
        import jax

        from navier_stokes_solver_tpu.dist import (
            decompose_disc,
            device_put_dist,
            make_dd_mesh,
        )
        from navier_stokes_solver_tpu.dist.kernels import DistKernels

        n_x, n_y = (o.dd, 1) if isinstance(o.dd, int) else tuple(o.dd)
        if n_x * n_y > len(jax.devices()):
            raise ValueError(
                f"dd={o.dd} needs {n_x * n_y} devices but only "
                f"{len(jax.devices())} are available"
            )
        self.dist_mesh = make_dd_mesh(n_x, n_y)
        self.disc = decompose_disc(self.disc, n_x, n_y)
        self.disc = device_put_dist(self.disc, self.dist_mesh)
        self.K = DistKernels(self.disc, self.dist_mesh)
        self.log(f"  Domain decomposition: {n_x} x {n_y} tiles")

    # ------------------------------------------------------------------
    @property
    def inv_dt(self) -> float:
        return 0.0

    def _inlet_amp(self, lifting: bool) -> float:
        raise NotImplementedError

    def assemble_system(self, stokes: bool, lifting: bool) -> float:
        """Assemble rhs = -R with BC; returns its l2 norm."""
        with self.timer.phase("assemble"):
            self.rhs, rn = self.K.assemble_kernel(
                self.disc_nomg,
                self.nu,
                self.inv_dt,
                self.solution,
                self.solution_old.u,
                self._inlet_amp(lifting),
                stokes=stokes,
                consistent=self.options.consistent_continuity,
            )
            rn = float(rn)
        return rn

    # Krylov iterations executed per device call.  One XLA program running
    # for many minutes gets killed by the TPU runtime; chunking bounds the
    # per-call device time.  For GMRES/FGMRES the chunks are mathematically
    # identical to one long restarted solve (chunk = a multiple of the
    # restart basis 30, and restarts recompute the true residual).  For
    # BiCGStab (solver_type 2) each chunk resets the shadow residual
    # rbar = r, which changes the iteration *trajectory* (not the fixed
    # point) vs one continuous run -- a documented deviation kept for the
    # per-call execution budget.  Host overhead is one dispatch per chunk;
    # since ``maxiter`` is traced (api/kernels.py::solve_kernel), any chunk
    # length reuses the same compiled program, so this is a pure
    # dispatch-overhead / per-call-budget tradeoff.
    #
    # The chunk length is ADAPTIVE: the per-iteration wall measured on each
    # chunk sizes the next one to fill KRYLOV_CALL_BUDGET_S seconds of
    # device time (never exceeding KRYLOV_CHUNK_MAX iterations, never below
    # one restart cycle).  On the remote axon worker each dispatch costs
    # seconds (queueing + executable load), so small fixed chunks dominated
    # the bench wall: 100x70 warm bench 111.3 s at fixed chunk 60 vs
    # 45.7 s at 240 (identical programs; docs/PERF.md round 3).  At
    # 300x100 an outer iteration costs ~1 s, so a fixed 240 would blow the
    # few-minute per-call kill budget -- adaptivity reconciles the two.
    # NSTPU_KRYLOV_CHUNK forces a fixed chunk length (A/Bs).
    KRYLOV_CHUNK: int = 30
    KRYLOV_CHUNK_MAX: int = 960
    KRYLOV_CALL_BUDGET_S: float = float(
        os.environ.get("NSTPU_KRYLOV_CALL_BUDGET", "75")
    )

    _chunk_iter_wall_s: float | None = None  # EMA of per-iteration wall

    def _adaptive_chunk_len(self, basis: int) -> int:
        """Chunk length (a basis multiple) sized to KRYLOV_CALL_BUDGET_S
        seconds of device time from the measured per-iteration wall; one
        conservative restart cycle before any measurement exists."""
        w = self._chunk_iter_wall_s
        if w is None or w <= 0:
            cycles = max(1, self.KRYLOV_CHUNK // basis)
        else:
            cycles = int(self.KRYLOV_CALL_BUDGET_S / (w * basis))
            cycles = max(1, min(cycles, max(1, self.KRYLOV_CHUNK_MAX // basis)))
        return basis * cycles

    def solve_system(self, stokes: bool, lifting: bool) -> int:
        """Tangent solve; prints and returns the Krylov iteration count
        (NSSolver.cpp:601-672)."""
        o = self.options
        self.log(f"Solver tolerance: {o.tolerance}")
        timer_ctx = self.timer.phase("krylov_solve")
        timer_ctx.__enter__()
        total = 0
        first = True
        # chunk = a multiple of the restart basis so chunking stays
        # mathematically identical to one long restarted solve
        basis = max(1, int(o.krylov_basis))
        forced = os.environ.get("NSTPU_KRYLOV_CHUNK")
        if forced:
            chunk_len = basis * max(1, int(forced) // basis)
        else:
            chunk_len = self._adaptive_chunk_len(basis)
        cfg = o.precond_config
        # direct_lu programs need the TPU scoped-VMEM headroom jit variant
        # (api/kernels.py::solve_kernel_lu; DistKernels has no LU variant
        # and direct_lu is ineligible under dd anyway)
        solve_fn = self.K.solve_kernel
        if getattr(cfg, "direct_lu", False):
            solve_fn = getattr(self.K, "solve_kernel_lu", solve_fn)
        prev_res = None
        while True:
            chunk = min(chunk_len, self.KRYLOV_MAXITER - total)
            t_chunk = _time.perf_counter()
            self.delta, info = solve_fn(
                self.disc,
                self.nu,
                self.inv_dt,
                self.solution,
                self.rhs,
                self.delta,
                self._inlet_amp(lifting),
                o.tolerance,
                stokes=stokes,
                solver_type=o.solver_type,
                prec_type=o.preconditioner_type,
                variant=self.VARIANT,
                maxiter=chunk,
                project_x0=first,
                precond_cfg=cfg,
                basis=basis,
            )
            first = False
            it = int(info.iters)  # blocks until this chunk finishes
            if not forced and it > 0:
                # EMA of per-iteration wall (dispatch overhead amortizes
                # into it); sizes the NEXT chunk.  A chunk that stopped
                # early (convergence) still measures true per-iter cost.
                w = (_time.perf_counter() - t_chunk) / it
                e = self._chunk_iter_wall_s
                self._chunk_iter_wall_s = w if e is None else 0.5 * (e + w)
                chunk_len = self._adaptive_chunk_len(basis)
            total += it
            self.log(
                f"   [chunk] {total} iterations, residual "
                f"{float(info.resnorm):.3e}"
            )
            if bool(info.failed):
                # deal.II SolverControl::check_failure would throw
                # NoConvergence here (non-finite residual / breakdown);
                # surface it instead of letting Newton continue on a
                # corrupted update (silent-wrong-result path).
                raise RuntimeError(
                    f"Krylov breakdown after {total} iterations "
                    f"(residual {float(info.resnorm)!r}); the reference "
                    "aborts with deal.II NoConvergence on the same run"
                )
            if bool(info.converged) or total >= self.KRYLOV_MAXITER:
                break
            if getattr(cfg, "krylov_cycle_dtype", None) is not None:
                # GMRES-IR stall detection: in-device (a chunk of >= 2
                # cycles exits below its iteration budget) or across
                # chunks (the true restart residual stopped improving --
                # a one-cycle chunk can never see its own stall).  Either
                # way, retire the remaining iterations with full-precision
                # cycles; the restart structure makes the switch exact.
                res = float(info.resnorm)
                if it < chunk or (prev_res is not None and res >= 0.99 * prev_res):
                    cfg = dataclasses.replace(cfg, krylov_cycle_dtype=None)
                    self.log(
                        f"   [gmres-ir] f32 cycles stalled at residual "
                        f"{res:.3e} after {total} iterations; falling back"
                        " to f64 cycles"
                    )
                    prev_res = None
                    continue
                prev_res = res
            elif it < chunk:
                break
        timer_ctx.__exit__(None, None, None)
        self.log(f"   {total} iterations")
        return total

    # ------------------------------------------------------------------
    # Lift / drag (NSSolver.cpp:839-974)
    # ------------------------------------------------------------------
    def compute_lift_drag(self):
        self.log("===============================================")
        self.log("Computing lift and drag forces")
        with self.timer.phase("lift_drag"):
            drag, lift = self.K.lift_drag_kernel(
                self.disc_nomg, self.nu, self.solution
            )
        self.drag_force = float(drag)
        self.lift_force = float(lift)
        self.log(f"Lift force: {self.lift_force}")
        self.log(f"Drag force: {self.drag_force}")

    def get_avg_inlet_velocity(self) -> float:
        """U_avg = 2 * U(0, H/2) / 3 (NSSolver.cpp:940-944)."""
        u_max = self._inlet_u_max()
        return 2.0 * u_max / 3.0  # parabola value at mid-channel equals u_max

    def _inlet_u_max(self) -> float:
        raise NotImplementedError

    def get_reynolds(self) -> float:
        return self.get_avg_inlet_velocity() * 0.1 / self.nu

    def compute_lift_coeff(self):
        ua = self.get_avg_inlet_velocity()
        self.lift_coeff = 2.0 * self.lift_force / (ua * ua * 0.1)

    def compute_drag_coeff(self):
        ua = self.get_avg_inlet_velocity()
        self.drag_coeff = 2.0 * self.drag_force / (ua * ua * 0.1)

    def print_lift_coeff(self):
        self.log("===============================================")
        self.compute_lift_coeff()
        self.log(f"Lift coefficient: {self.lift_coeff}")

    def print_drag_coeff(self):
        self.log("===============================================")
        self.compute_drag_coeff()
        self.log(f"Drag coefficient: {self.drag_coeff}")

    def write_lift_drag_to_file(self, directory: str | None = None):
        """Append coefficients to per-Re files (NSSolver.cpp:976-1018)."""
        import os

        directory = directory or self.options.output_dir
        re = self.get_reynolds()
        for name, value in (
            ("drag_coefficient", self.drag_coeff),
            ("lift_coefficient", self.lift_coeff),
        ):
            path = os.path.join(directory, f"{name}_{re:.2f}.txt")
            with open(path, "a") as f:
                f.write(f"{value}\n")

    # ------------------------------------------------------------------
    def output(self, time_step: int | None = None):
        """Parallel VTU output (NSSolver.cpp:761-797)."""
        if not self.options.write_output:
            return
        if self.space is None:
            import os

            from navier_stokes_solver_tpu.io.vtu import (
                write_vtu_tri,
                write_vtu_tri_record,
            )

            os.makedirs(self.options.output_dir, exist_ok=True)
            sol = self._gathered_solution()
            if self.dist_mesh is not None:
                # one piece per strip + .pvtu, partitioning = strip id
                # (per-rank pieces, NSSolver.cpp:789-793)
                write_vtu_tri_record(
                    self._dd_simplex,
                    np.asarray(sol.u),
                    np.asarray(sol.p),
                    directory=self.options.output_dir,
                    counter=time_step or 0,
                )
                return
            write_vtu_tri(
                self.disc,
                np.asarray(sol.u),
                np.asarray(sol.p),
                os.path.join(
                    self.options.output_dir,
                    f"output_{time_step or 0:03d}.0.vtu",
                ),
            )
            return
        from navier_stokes_solver_tpu.io import write_vtu_record

        sol = self._gathered_solution()
        tiles = None
        if self.dist_mesh is not None:
            # one piece per tile + partitioning = tile id, matching the
            # reference's per-rank pieces (NSSolver.cpp:781-793)
            tiles = (self.disc.halo_n, self.disc.halo_ny)
        write_vtu_record(
            self.space,
            np.asarray(sol.u),
            np.asarray(sol.p),
            directory=self.options.output_dir,
            counter=time_step or 0,
            tiles=tiles,
        )

    def fields(self) -> tuple[np.ndarray, np.ndarray]:
        """Host copies of (velocity, pressure); tile slabs are stitched
        back to the global lattice under domain decomposition."""
        sol = self._gathered_solution()
        return np.asarray(sol.u), np.asarray(sol.p)

    def _gathered_solution(self) -> Blocks:
        if self.dist_mesh is None:
            return self.solution
        if self.space is None:
            from navier_stokes_solver_tpu.dist import gather_simplex_blocks

            return gather_simplex_blocks(self.solution, self._dd_simplex)
        from navier_stokes_solver_tpu.dist import gather_blocks

        return gather_blocks(self.solution, self.disc)
