"""IO: VTU output, gmsh MSH2 write/read roundtrip, checkpoint/resume."""

import os

import numpy as np
import pytest

from navier_stokes_solver_tpu.geometry import make_channel_geometry, make_fe_space
from navier_stokes_solver_tpu.io import (
    read_msh,
    write_msh,
    write_vtu_record,
)
from navier_stokes_solver_tpu.io.msh import _read_msh_python
from navier_stokes_solver_tpu.native import native_available


def _space(nx=20, ny=8):
    return make_fe_space(make_channel_geometry(nx, ny), 2, 1)


def test_vtu_record(tmp_path):
    space = _space()
    u = np.random.default_rng(0).standard_normal((2, space.NVy, space.NVx))
    p = np.zeros((space.NPy, space.NPx))
    pvtu = write_vtu_record(space, u, p, directory=str(tmp_path), counter=7)
    assert os.path.exists(pvtu)
    piece = os.path.join(str(tmp_path), "output_007.0.vtu")
    assert os.path.exists(piece)
    content = open(piece).read()
    assert "velocity" in content and "pressure" in content
    assert "partitioning" in content


def test_vtu_per_tile_pieces(tmp_path):
    """One piece per decomposition tile + pvtu master + tile-id
    partitioning (parity with DataOut::write_vtu_with_pvtu_record one
    piece per rank, NSSolver.cpp:781-793)."""
    space = _space()
    u = np.random.default_rng(0).standard_normal((2, space.NVy, space.NVx))
    p = np.random.default_rng(1).standard_normal((space.NPy, space.NPx))
    pvtu = write_vtu_record(
        space, u, p, directory=str(tmp_path), counter=3, tiles=(4, 2)
    )
    content = open(pvtu).read()
    for rank in range(8):
        piece = os.path.join(str(tmp_path), f"output_003.{rank}.vtu")
        assert os.path.exists(piece)
        assert f"output_003.{rank}.vtu" in content
    # cell counts across pieces sum to the active-cell total
    import re

    total = 0
    for rank in range(8):
        piece = open(
            os.path.join(str(tmp_path), f"output_003.{rank}.vtu")
        ).read()
        total += int(re.search(r'NumberOfCells="(\d+)"', piece).group(1))
    assert total == int(space.geo.n_active_cells)


def test_msh_roundtrip(tmp_path):
    geo = make_channel_geometry(16, 8)
    path = str(tmp_path / "mesh.msh")
    write_msh(geo, path)
    data = read_msh(path)
    assert data["nodes_xy"].shape == ((16 + 1) * (8 + 1), 2)
    assert data["quad"].shape[0] == geo.n_active_cells
    # boundary edges carry the reference's physical ids
    ids = set(data["edge_tag"].tolist())
    assert {6, 7, 8}.issubset(ids)
    # connectivity indices are valid
    assert data["quad"].max() < data["nodes_xy"].shape[0]


def test_msh_native_matches_python(tmp_path):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    geo = make_channel_geometry(12, 6)
    path = str(tmp_path / "mesh.msh")
    write_msh(geo, path)
    a = read_msh(path)  # native
    b = _read_msh_python(path)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])


def test_native_vtu_used_when_available(tmp_path):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    space = _space(8, 4)
    u = np.zeros((2, space.NVy, space.NVx))
    p = np.ones((space.NPy, space.NPx))
    pvtu = write_vtu_record(space, u, p, directory=str(tmp_path))
    piece = pvtu.replace(".pvtu", ".0.vtu")
    content = open(piece, "rb").read()
    assert b"UnstructuredGrid" in content


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions
    from navier_stokes_solver_tpu.io import load_checkpoint, save_checkpoint

    opts = SolverOptions(mesh_size=(12, 6), degree_velocity=2,
                         degree_pressure=1, verbose=False, multigrid=False)
    s1 = NSSolverStationary(opts).setup()
    s1.solution = s1.solution._replace(u=s1.solution.u + 1.5)
    s1.nu = 0.025
    save_checkpoint(s1, str(tmp_path / "ckpt"))

    s2 = NSSolverStationary(opts).setup()
    manifest = load_checkpoint(s2, str(tmp_path / "ckpt"))
    assert manifest["nu"] == 0.025
    assert s2.nu == 0.025
    np.testing.assert_array_equal(
        np.asarray(s2.solution.u), np.asarray(s1.solution.u)
    )


def test_vtu_tri_output(tmp_path):
    from navier_stokes_solver_tpu.geometry import make_channel_geometry
    from navier_stokes_solver_tpu.io.vtu import write_vtu_tri
    from navier_stokes_solver_tpu.unstructured import (
        make_simplex_disc,
        triangulate_channel,
    )

    disc = make_simplex_disc(*triangulate_channel(make_channel_geometry(10, 5)))
    u = np.zeros((2, disc.n_nodes_v))
    p = np.ones(disc.n_nodes_p)
    path = str(tmp_path / "tri.vtu")
    write_vtu_tri(disc, u, p, path)
    content = open(path).read()
    assert "UnstructuredGrid" in content and "velocity" in content


def test_time_state_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from navier_stokes_solver_tpu.geometry import make_fe_space
    from navier_stokes_solver_tpu.io import load_time_state, save_time_state
    from navier_stokes_solver_tpu.ops import make_disc
    from navier_stokes_solver_tpu.timeloop import initial_state, make_time_step

    disc = make_disc(make_fe_space(make_channel_geometry(16, 8), 2, 1))
    step = make_time_step(disc, solver_type=1, prec_type=2, tol=1e-8,
                          newton_max=2, krylov_maxiter=100)
    ts1 = jax.jit(step)(initial_state(disc), 0.01, 0.01)
    save_time_state(ts1, str(tmp_path / "ts"))
    ts_back = load_time_state(disc, str(tmp_path / "ts"))
    assert int(ts_back.step) == 1
    np.testing.assert_array_equal(
        np.asarray(ts_back.solution.u), np.asarray(ts1.solution.u)
    )
    # resumes cleanly
    ts2 = jax.jit(step)(ts_back, 0.01, 0.01)
    assert int(ts2.step) == 2
    assert np.isfinite(float(ts2.drag))


def test_vtu_tri_per_strip_pieces(tmp_path):
    """One piece per simplex strip + pvtu master + strip-id partitioning
    (the -M analog of test_vtu_per_tile_pieces)."""
    import re

    from navier_stokes_solver_tpu.dist import decompose_simplex_disc
    from navier_stokes_solver_tpu.geometry import make_channel_geometry
    from navier_stokes_solver_tpu.io.vtu import write_vtu_tri_record
    from navier_stokes_solver_tpu.unstructured import triangulate_channel

    data = triangulate_channel(make_channel_geometry(10, 5))
    dd = decompose_simplex_disc(*data, n_dev=4)
    u = np.random.default_rng(0).standard_normal(
        (2, dd.n_nodes_v_global)
    )
    p = np.random.default_rng(1).standard_normal(dd.n_nodes_p_global)
    pvtu = write_vtu_tri_record(dd, u, p, directory=str(tmp_path), counter=3)
    content = open(pvtu).read()
    total = 0
    for rank in range(4):
        piece = os.path.join(str(tmp_path), f"output_003.{rank}.vtu")
        assert os.path.exists(piece)
        assert f"output_003.{rank}.vtu" in content
        total += int(
            re.search(r'NumberOfCells="(\d+)"', open(piece).read()).group(1)
        )
    assert total == data[1].shape[0]  # pieces partition the element set
