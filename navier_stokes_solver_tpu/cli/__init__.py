"""Command-line drivers mirroring the reference binaries.

``python -m navier_stokes_solver_tpu.cli.unsteady``    ~ ``./NSSolver``
(test.cpp:21-155) and
``python -m navier_stokes_solver_tpu.cli.stationary``  ~ ``./StationaryNSSolver``
(testStationary.cpp:19-139), with identical flags, defaults and config echo.
"""
