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


_REF_MESH_DIR = "/root/reference/lab_new/mesh"


def test_msh41_and_msh1_parse():
    """GridIn::read_msh accepts gmsh formats 1/2.x/4.1 (NSSolver.cpp:155-161);
    every mesh shipped with the reference must parse (VERDICT r3 item 6)."""
    if not os.path.isdir(_REF_MESH_DIR):
        pytest.skip("reference meshes not mounted")
    import glob

    paths = sorted(glob.glob(os.path.join(_REF_MESH_DIR, "*.msh")))
    assert len(paths) >= 13
    if os.path.exists("/root/reference/mesh.msh"):
        paths.append("/root/reference/mesh.msh")  # MSH1 (GridOut output)
    for path in paths:
        data = read_msh(path)
        n = data["nodes_xy"].shape[0]
        assert n > 0
        total = sum(
            data[k].shape[0] for k in ("tri", "quad", "edges", "tet")
        )
        assert total > 0, path
        for k in ("tri", "quad", "edges", "tet"):
            if data[k].size:
                assert 0 <= data[k].min() and data[k].max() < n, path
    # format-specific spot checks
    coarse = read_msh(os.path.join(_REF_MESH_DIR, "2dMeshCoarse.msh"))
    assert coarse["tri"].shape[0] == 271 and coarse["nodes_xy"].shape[0] == 170
    # physical tags resolved through $Entities: inlet 7 / outlet 8 / walls 6
    assert {6, 7, 8} == set(coarse["edge_tag"].tolist())
    fine = read_msh(os.path.join(_REF_MESH_DIR, "2dMeshFine.msh"))
    new = read_msh(os.path.join(_REF_MESH_DIR, "new_mesh.msh"))
    # 2dMeshFine.msh (4.1) is the same mesh new_mesh.msh (2.2) was
    # generated from (generate_mesh.py) — same counts, same tag set
    assert fine["tri"].shape[0] == new["tri"].shape[0] == 25619
    assert set(fine["edge_tag"]) == set(new["edge_tag"]) == {6, 7, 8, 10}
    cube = read_msh(os.path.join(_REF_MESH_DIR, "mesh-cube-5.msh"))
    assert cube["tet"].shape[0] == 735  # 3D meshes parse (tets kept)


def test_msh41_native_matches_python():
    if not os.path.isdir(_REF_MESH_DIR):
        pytest.skip("reference meshes not mounted")
    if not native_available():
        pytest.skip("native toolchain unavailable")
    for name in ("2dMeshCoarse.msh", "new_mesh.msh", "mesh-cube-5.msh"):
        path = os.path.join(_REF_MESH_DIR, name)
        a = read_msh(path)  # native fast path
        b = _read_msh_python(path)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=f"{name}:{k}")


def test_msh1_parse(tmp_path):
    """$NOD/$ELM (gmsh format 1) with reg-phys element tags."""
    path = str(tmp_path / "m1.msh")
    with open(path, "w") as f:
        f.write(
            "$NOD\n4\n1 0 0 0\n2 1 0 0\n3 1 1 0\n4 0 1 0\n$ENDNOD\n"
            "$ELM\n3\n"
            "1 2 5 1 3 1 2 3\n"   # tri, reg-phys 5
            "2 2 5 1 3 1 3 4\n"
            "3 1 7 2 2 1 2\n"     # boundary line, reg-phys 7
            "$ENDELM\n"
        )
    data = read_msh(path)
    assert data["tri"].shape == (2, 3)
    assert data["tri_tag"].tolist() == [5, 5]
    assert data["edges"].tolist() == [[0, 1]]
    assert data["edge_tag"].tolist() == [7]


def test_solve_on_reference_41_mesh():
    """A small stationary solve runs end-to-end on the reference's
    MSH4.1 2dMeshCoarse.msh through the -M simplex path."""
    if not os.path.isdir(_REF_MESH_DIR):
        pytest.skip("reference meshes not mounted")
    from navier_stokes_solver_tpu.api import NSSolverStationary, SolverOptions

    opts = SolverOptions(
        read_mesh_from_file=True,
        mesh_file_name=os.path.join(_REF_MESH_DIR, "2dMeshCoarse.msh"),
        degree_velocity=2, degree_pressure=1,
        Re=30.0, tolerance=1e-7, solver_type=1, preconditioner_type=1,
        verbose=False,
    )
    s = NSSolverStationary(opts).setup()
    s.solve_newton()
    ns = [h for h in s.history if h["phase"] == "ns"]
    assert ns and ns[-1]["residual"] < 1e-5  # Newton converged
    u = np.asarray(s.solution.u)
    assert np.isfinite(u).all() and np.abs(u).max() > 0.1
    # the cylinder curve is tagged "borders"=6 on this mesh (no id 10):
    # the boundary-id-10 lift/drag integral is empty, like the reference's
    s.compute_lift_drag()
    s.compute_drag_coeff()
    assert s.drag_coeff == 0.0


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
