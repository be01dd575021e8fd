"""CLI flag parity with the reference drivers (test.cpp:25-34 defaults)."""

import numpy as np
import pytest

from navier_stokes_solver_tpu.cli.common import parse_options


def test_defaults_match_reference():
    o = parse_options([], unsteady=True)
    assert o.mesh_size == (100, 100)
    assert o.Re == 100.0
    assert o.solver_type == 1  # FGMRES
    assert o.tolerance == 1e-6
    assert o.preconditioner_type == 0  # blockDiagonal
    assert o.time_span == 1.0 and o.time_step == 0.01
    assert o.degree_velocity == 3 and o.degree_pressure == 2


def test_M_flag_switches_degrees():
    from navier_stokes_solver_tpu.api import NSSolverStationary

    o = parse_options(["-M"], unsteady=False)
    assert o.read_mesh_from_file and o.mesh_file_name == ""
    # the degree switch (test.cpp:66-70) happens at solver construction
    s = NSSolverStationary(o)
    assert s.options.degree_velocity == 2 and s.options.degree_pressure == 1


def test_mesh_and_T_parsing():
    o = parse_options(["-m", "60,40", "-T", "0.03,0.01", "-r", "1.0",
                       "-s", "1", "-p", "1", "-t", "1e-9"], unsteady=True)
    assert o.mesh_size == (60, 40)
    assert o.time_span == 0.03 and o.time_step == 0.01
    assert o.Re == 1.0 and o.solver_type == 1
    assert o.preconditioner_type == 1 and o.tolerance == 1e-9


def test_invalid_solver_rejected():
    with pytest.raises(SystemExit):
        parse_options(["-s", "5"], unsteady=False)


def test_stationary_cli_with_mesh_file(tmp_path, capsys, monkeypatch):
    """End-to-end -M run through the CLI reading a generated MSH2 file."""
    from navier_stokes_solver_tpu.geometry import make_channel_geometry
    from navier_stokes_solver_tpu.unstructured import triangulate_channel

    # write a triangle mesh file
    geo = make_channel_geometry(10, 5)
    nodes, tri, edges, tags = triangulate_channel(geo)
    path = tmp_path / "m.msh"
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes", str(len(nodes))]
    for i, (x, y) in enumerate(nodes):
        lines.append(f"{i+1} {x} {y} 0")
    lines.append("$EndNodes")
    els = []
    eid = 0
    for (a, b), t in zip(edges, tags):
        eid += 1
        els.append(f"{eid} 1 2 {t} {t} {a+1} {b+1}")
    for (a, b, c) in tri:
        eid += 1
        els.append(f"{eid} 2 2 0 0 {a+1} {b+1} {c+1}")
    lines += ["$Elements", str(eid), *els, "$EndElements"]
    path.write_text("\n".join(lines) + "\n")

    from navier_stokes_solver_tpu.api import NSSolverStationary
    from navier_stokes_solver_tpu.cli.common import parse_options

    opts = parse_options(
        ["-M", str(path), "-r", "5", "-t", "1e-6", "-p", "2", "--quiet"],
        unsteady=False,
    )
    assert opts.read_mesh_from_file and opts.mesh_file_name == str(path)
    s = NSSolverStationary(opts)
    s.setup()
    assert s.space is None  # simplex backend selected
    assert s.disc.n_tri == tri.shape[0]
    s.solve_newton()
    s.compute_lift_drag()
    assert np.isfinite(s.drag_force)


def test_perf_flags_parse():
    """--basis / --ir / --schur map onto SolverOptions / PrecondConfig."""
    o = parse_options([], unsteady=False)
    assert o.krylov_basis == 30 and o.precond_config is None
    o = parse_options(["--basis", "60", "--ir"], unsteady=False)
    assert o.krylov_basis == 60
    assert o.precond_config.krylov_cycle_dtype == "float32"
    assert o.precond_config.schur_mode == "mass"
    o = parse_options(["--schur", "cahouet"], unsteady=True)
    assert o.precond_config.krylov_cycle_dtype is None
    assert o.precond_config.schur_mode == "cahouet"
    o = parse_options(["--schur", "pcd", "--ir"], unsteady=True)
    assert o.precond_config.schur_mode == "pcd"
    assert o.precond_config.krylov_cycle_dtype == "float32"


def test_stokes_schur_flag_parses():
    """--stokes-schur maps onto PrecondConfig.asimple_stokes_schur (the
    BASELINE config-2 lever; default 'shat' = reference parity)."""
    o = parse_options([], unsteady=False)
    assert o.precond_config is None  # default shat builds no config
    o = parse_options(["--stokes-schur", "mass"], unsteady=False)
    assert o.precond_config.asimple_stokes_schur == "mass"
    assert o.precond_config.schur_mode == "mass"
    o = parse_options(["--stokes-schur", "mass", "--ir"], unsteady=True)
    assert o.precond_config.asimple_stokes_schur == "mass"
    assert o.precond_config.krylov_cycle_dtype == "float32"
