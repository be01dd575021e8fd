"""Observability: phase timers, lift/drag file appenders."""

import json
import os

from navier_stokes_solver_tpu.obs import PhaseTimer


def test_phase_timer_accumulates(tmp_path):
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    s = t.summary()
    assert s["a"]["calls"] == 2 and s["b"]["calls"] == 1
    path = str(tmp_path / "timings.json")
    t.dump(path)
    assert json.load(open(path))["a"]["calls"] == 2


def test_lift_drag_file_appender(tmp_path):
    from navier_stokes_solver_tpu.api import NSSolver, SolverOptions

    s = NSSolver(SolverOptions(mesh_size=(8, 4), degree_velocity=2,
                               degree_pressure=1, verbose=False,
                               multigrid=False))
    s.setup()
    s.drag_coeff, s.lift_coeff = 1.25, -0.5
    s.nu = 0.1  # reynolds = 0.02 / 0.1 = 0.2 (the reference's file key)
    s.write_lift_drag_to_file(str(tmp_path))
    s.write_lift_drag_to_file(str(tmp_path))
    drag = open(tmp_path / "drag_coefficient_0.20.txt").read().split()
    lift = open(tmp_path / "lift_coefficient_0.20.txt").read().split()
    assert drag == ["1.25", "1.25"]
    assert lift == ["-0.5", "-0.5"]
