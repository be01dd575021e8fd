"""Time-dependent Navier-Stokes solver (NSSolver, reference parity).

Implicit-Euler time loop (NSSolver.cpp:799-837) with a Newton solve per step
(NSSolver.cpp:674-754) including the per-step Reynolds continuation ramp
1 -> target by +10 (so a target of 100 stops at nu = 1/91) and the
``apply_first`` inlet-lifting flag (the inlet profile is lifted only on the
very first assembly of the run; afterwards the increment formulation keeps
boundary updates at zero).
"""

from __future__ import annotations

from navier_stokes_solver_tpu.api import kernels
from navier_stokes_solver_tpu.api.base import NSSolverBase

__all__ = ["NSSolver"]


class NSSolver(NSSolverBase):
    VARIANT = "unsteady"
    KRYLOV_MAXITER = 100_000  # SolverControl (NSSolver.cpp:604)
    NEWTON_MAX_ITERS = 10  # NSSolver.cpp:678
    NEWTON_TOL = 1e-9  # NSSolver.cpp:679
    U_M = 0.3  # inlet amplitude (NSSolver.hpp:88)

    def __init__(self, options=None, **kwargs):
        super().__init__(options, **kwargs)
        self.apply_first = True  # NSSolver.hpp:387
        self.time = 0.0
        self.time_step_index = 0

    @property
    def inv_dt(self) -> float:
        return 1.0 / self.options.time_step

    def _inlet_amp(self, lifting: bool) -> float:
        return self.U_M if lifting else 0.0

    def _inlet_u_max(self) -> float:
        return self.U_M

    # ------------------------------------------------------------------
    def solve_newton(self, *, ramp: bool = True):
        """NSSolver::solve_newton (NSSolver.cpp:674-754).

        ``ramp=False`` skips the per-step Reynolds continuation and Newtons
        once at the ramp's final level 1 + 10*floor((Re-1)/10) -- the same
        effective viscosity ``solve_fused`` uses (warm starts from the
        previous time step make the lower-Re solves redundant); see
        ``solve(direct=True)``.
        """
        self.log("===============================================")
        target_Re = self.Re
        first_iter = True
        self.log(f"Target Re = {target_Re}")

        if ramp:
            # IEEE-identical stepping to the reference loop
            # (NSSolver.cpp:684: current_Re = 1; current_Re <= Re; += 10)
            levels = []
            current_Re = 1.0
            while current_Re <= target_Re:
                levels.append(current_Re)
                current_Re += 10.0
        else:
            levels = [
                1.0 + 10.0 * ((target_Re - 1.0) // 10.0)
                if target_Re >= 1.0
                else target_Re
            ]
        for current_Re in levels:
            self.log("===============================================")
            self.nu = 1.0 / current_Re
            self.log(f"Solving for Re = {self.get_reynolds()}")

            n_iter = 0
            residual_norm = self.NEWTON_TOL + 1
            prev_residual = 0.0

            while n_iter < self.NEWTON_MAX_ITERS and residual_norm > self.NEWTON_TOL:
                if first_iter:
                    first_iter = False
                    stokes_now = n_iter == 0
                    # the inlet profile is lifted only while apply_first
                    # (first time step), NSSolver.cpp:573-580
                    residual_norm = self.assemble_system(
                        stokes_now, lifting=stokes_now and self.apply_first
                    )
                else:
                    stokes_now = False
                    residual_norm = self.assemble_system(False, lifting=False)

                prev_residual = residual_norm + 1 if n_iter == 0 else prev_residual
                self.log(
                    f"Newton iteration {n_iter}/{self.NEWTON_MAX_ITERS}"
                    f" - ||r|| = {residual_norm:.6e}"
                )

                if residual_norm > self.NEWTON_TOL:
                    krylov_iter = self.solve_system(
                        stokes_now, lifting=stokes_now and self.apply_first
                    )
                    self.history.append(
                        dict(
                            phase="stokes" if stokes_now else "ns",
                            time=self.time,
                            nu=self.nu,
                            n_iter=n_iter,
                            residual=residual_norm,
                            krylov_iters=krylov_iter,
                        )
                    )
                    if krylov_iter == 0:
                        break

                    evaluation_point = self.solution
                    alpha = 1.0
                    while alpha > 1e-12:
                        self.solution = self.K.update_solution(
                            evaluation_point, self.delta, alpha
                        )
                        residual_norm = self.assemble_system(False, lifting=False)
                        self.log(
                            f"  Evaluating alpha={alpha}, ||r||={residual_norm}"
                        )
                        # NSSolver.cpp:738 uses <=
                        if residual_norm <= prev_residual:
                            break
                        alpha *= 0.1
                    prev_residual = residual_norm
                else:
                    self.log(" < tolerance")
                    break
                n_iter += 1

        self.log("===============================================")

    # ------------------------------------------------------------------
    def solve(self, *, direct: bool = False):
        """Implicit-Euler time loop (NSSolver.cpp:799-837).

        ``direct=True`` (extension beyond the reference; the stationary
        solver's ``solve_direct`` cousin): each step runs ONE Newton solve
        at the ramp's final viscosity, warm-started from the previous
        step, instead of replaying the full Re continuation.  Numerically
        the host-driven twin of ``solve_fused`` -- but every device call
        is bounded by the adaptive Krylov chunking in ``solve_system``,
        so arbitrarily large meshes respect the TPU per-call execution
        budget (the fused step's worst-case single-dispatch time grows
        with DoF count)."""
        self.log("===============================================")
        self.time = 0.0
        self.output(0)
        self.log("-----------------------------------------------")

        o = self.options
        T, delta_t = o.time_span, o.time_step
        self.time_step_index = 0
        while self.time < T - 0.5 * delta_t:
            self.time += delta_t
            self.time_step_index += 1
            self.solution_old = self.solution
            self.log(
                f"n = {self.time_step_index:3d}, t = {self.time:5.2f}"
            )
            self.solve_newton(ramp=not direct)
            self.apply_first = False
            self.output(self.time_step_index)
            self.compute_lift_drag()
            self.print_lift_coeff()
            self.print_drag_coeff()
            if o.write_output:
                # per-Re coefficient files (unsteady only, NSSolver.cpp:976)
                self.write_lift_drag_to_file()
            self.history.append(
                dict(
                    phase="step",
                    time=self.time,
                    step=self.time_step_index,
                    drag_force=self.drag_force,
                    lift_force=self.lift_force,
                    drag_coeff=self.drag_coeff,
                    lift_coeff=self.lift_coeff,
                )
            )
            self.log("")

    # ------------------------------------------------------------------
    def solve_fused(self, *, newton_max: int | None = None,
                    newton_tol: float | None = None,
                    krylov_maxiter: int = 2000,
                    chunk_steps: int | None = None,
                    checkpoint_dir: str | None = None,
                    max_steps_this_call: int | None = None):
        """Fully on-device time loop (performance path).

        The whole run -- every implicit-Euler step with its Newton loop,
        line search, Krylov solve, preconditioner and lift/drag integral --
        executes as ONE compiled ``lax.scan``; per-step coefficients stream
        out as scan outputs.  This removes the reference's per-step host
        round trips (NSSolver.cpp:814-836).  Numerics note: the fused step
        solves at the target viscosity directly (warm-started), instead of
        re-running the Re-continuation ramp inside every step.

        ``checkpoint_dir``: persist the ``TimeState`` plus the per-step
        (drag, lift, iters) history after every retired chunk, and resume
        from that checkpoint on entry if one exists -- elastic restart for
        long runs on a preemptible/fault-prone device (the reference loses
        everything on an MPI abort, SURVEY.md section 5).  Under domain
        decomposition the checkpoint stores the gathered tile-stacked
        slabs; resume requires the same dd layout (validated).
        ``max_steps_this_call``: stop (with a checkpoint
        written) after this many steps, letting a driver split one long
        trajectory across several short-lived processes; callers detect a
        partial run via ``self.time_step_index < round(T/dt)``.
        """
        from navier_stokes_solver_tpu.timeloop import (
            initial_state,
            make_time_step,
            run_time_loop,
        )

        if self.Re < 1.0:
            # the host/reference ramp (current_Re = 1.0; current_Re <= target)
            # never executes a solve for targets below 1 (NSSolver.cpp:684)
            # -- refuse rather than silently diverge from the host path
            raise ValueError(
                "solve_fused requires Re >= 1: the reference's per-step "
                "continuation never solves for targets below 1, so there "
                "is no host trajectory to reproduce"
            )
        o = self.options
        n_steps = int(round(o.time_span / o.time_step))
        kw = dict(
            solver_type=o.solver_type,
            prec_type=o.preconditioner_type,
            tol=o.tolerance,
            newton_max=newton_max or self.NEWTON_MAX_ITERS,
            newton_tol=newton_tol or self.NEWTON_TOL,
            krylov_maxiter=krylov_maxiter,
            basis=max(1, int(o.krylov_basis)),
            precond_cfg=o.precond_config,
            consistent=o.consistent_continuity,
        )
        if self.dist_mesh is not None:
            # whole fused step inside shard_map over the device mesh
            from navier_stokes_solver_tpu.dist import (
                init_dist_state,
                make_dist_time_step,
            )

            step = make_dist_time_step(self.disc, self.dist_mesh, **kw)
            ts0 = init_dist_state(self.disc)._replace(solution=self.solution)
        else:
            step = make_time_step(self.disc, **kw)
            ts0 = initial_state(self.disc)._replace(solution=self.solution)

        # elastic resume: pick up the TimeState + per-step history written
        # by a previous (crashed or step-budgeted) invocation
        import os

        start, prior = 0, []
        if checkpoint_dir is not None and os.path.exists(
            os.path.join(checkpoint_dir, "time_state.npz")
        ):
            import json

            import numpy as np

            from navier_stokes_solver_tpu.io.checkpoint import load_time_state

            # under dd, ts0 (init_dist_state) provides the tile-stacked
            # template; re-shard the loaded stacked slabs over the mesh
            ts0 = load_time_state(self.disc, checkpoint_dir, template=ts0)
            if self.dist_mesh is not None:
                from navier_stokes_solver_tpu.dist import device_put_dist

                ts0 = device_put_dist(ts0, self.dist_mesh)
            start = int(np.ravel(np.asarray(ts0.step))[0])
            hist_path = os.path.join(checkpoint_dir, "history.json")
            if os.path.exists(hist_path):
                with open(hist_path) as f:
                    prior = json.load(f)
            if len(prior) != start:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir} is inconsistent: "
                    f"TimeState.step={start} but history has {len(prior)} "
                    "entries"
                )
            if start >= n_steps:
                raise ValueError(
                    f"checkpoint at {checkpoint_dir} already covers all "
                    f"{n_steps} steps"
                )
            self.log(
                f"  fused: resuming from checkpoint at step {start}/{n_steps}"
            )
        # the reference's per-step ramp current_Re = 1, 11, 21, ... never
        # exceeds the target, so its final (effective) viscosity is
        # 1 / (1 + 10 k) (NSSolver.cpp:684-687); reproduce that here
        eff_re = (
            1.0 + 10.0 * ((self.Re - 1.0) // 10.0) if self.Re >= 1.0 else self.Re
        )
        self.nu = 1.0 / eff_re
        # Per-dispatch execution budget: a single XLA execution running
        # longer than a few minutes gets the remote worker killed.  The
        # chunk boundary is bitwise-neutral (run_time_loop docstring), so
        # on accelerators default to one step per dispatch; the worst-case
        # per-dispatch iteration count is chunk x newton_max x maxiter --
        # the round-3 60x40 fused-simplex "worker faults" were exactly
        # this product left unbounded (docs/PERF.md round-4 isolation).
        import jax

        if chunk_steps is None and jax.default_backend() != "cpu":
            chunk_steps = 1
        if checkpoint_dir is not None and chunk_steps is None:
            chunk_steps = 1  # the checkpoint hook fires per retired chunk
        worst = (chunk_steps or n_steps) * kw["newton_max"] * krylov_maxiter
        if worst > 5000 and jax.default_backend() != "cpu":
            self.log(
                f"WARNING: worst-case {worst} Krylov iterations per device "
                "dispatch (chunk_steps x newton_max x krylov_maxiter); the "
                "TPU worker kills executions over a few minutes -- lower "
                "krylov_maxiter/newton_max or chunk_steps if steps stall"
            )

        todo = n_steps - start
        if max_steps_this_call is not None:
            todo = min(todo, max(1, int(max_steps_this_call)))

        import numpy as np

        acc = list(prior)
        on_chunk = None
        if checkpoint_dir is not None:
            import json

            from navier_stokes_solver_tpu.io.checkpoint import save_time_state

            def on_chunk(ts, out_host):
                d, l, ni_, ki_ = (
                    np.atleast_1d(np.asarray(o)).reshape(
                        np.atleast_1d(np.asarray(o)).shape[0], -1
                    )[:, 0]
                    for o in out_host
                )
                for j in range(d.shape[0]):
                    acc.append(
                        [float(d[j]), float(l[j]), int(ni_[j]), int(ki_[j])]
                    )
                save_time_state(ts, checkpoint_dir)
                tmp = os.path.join(checkpoint_dir, "history.json.tmp")
                with open(tmp, "w") as f:
                    json.dump(acc, f)
                os.replace(
                    tmp, os.path.join(checkpoint_dir, "history.json")
                )

        # direct_lu programs need the TPU scoped-VMEM headroom
        # (api/kernels.py::LU_COMPILER_OPTIONS)
        copts = None
        if getattr(o.precond_config, "direct_lu", False):
            from navier_stokes_solver_tpu.api.kernels import (
                lu_compiler_options,
            )

            copts = lu_compiler_options()

        final, hist = run_time_loop(
            step, ts0, self.nu, o.time_step, todo, chunk=chunk_steps,
            progress=lambda done, total, w: self.log(
                f"  fused: step {start + done}/{n_steps} retired "
                f"({w:.1f} s/dispatch)"
            ),
            on_chunk=on_chunk,
            compiler_options=copts,
        )

        # under dd every scalar is tile-stacked with identical (psum'd)
        # values; read entry 0
        scal = lambda a: float(np.ravel(np.asarray(a))[0])
        col = lambda a, n: np.asarray(a).reshape(n, -1)[:, 0]
        self.solution = final.solution
        self.time = scal(final.time)
        self.time_step_index = int(np.ravel(np.asarray(final.step))[0])
        self.drag_force = scal(final.drag)
        self.lift_force = scal(final.lift)
        self.compute_drag_coeff()
        self.compute_lift_coeff()
        pr = np.asarray(prior, dtype=float).reshape(len(prior), 4)
        drag = np.concatenate([pr[:, 0], col(hist["drag"], todo)])
        lift = np.concatenate([pr[:, 1], col(hist["lift"], todo)])
        ni = np.concatenate([pr[:, 2], col(hist["newton_iters"], todo)])
        ki = np.concatenate([pr[:, 3], col(hist["krylov_iters"], todo)])
        for i in range(start + todo):
            self.history.append(
                dict(
                    phase="step",
                    time=(i + 1) * o.time_step,
                    step=i + 1,
                    drag_force=float(drag[i]),
                    lift_force=float(lift[i]),
                    newton_iters=int(ni[i]),
                    krylov_iters=int(ki[i]),
                )
            )
        if start + todo < n_steps:
            self.log(
                f"  fused: stopped after {start + todo}/{n_steps} steps "
                "(max_steps_this_call); resume from the checkpoint"
            )
        return hist
