#!/usr/bin/env python
"""Micro-benchmark of the per-outer-iteration cost components at the
bench shape (100x70 Q3/Q2, 154,244 DoFs): jacobian matvec (f64 and f32),
one velocity MG V-cycle (f32), a CGS2 two-pass orthogonalization against
a basis-60 block, and one full blockTriangular vmult.

Locates where the measured ~138 ms/outer-iteration (docs/PERF.md) goes
so kernel work targets the real hot spot.  Prints one JSON line.

Usage: python scripts/microbench_ops.py [--mesh 100,70] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    import jax
    import jax.numpy as jnp

    def drain(o):
        # jax.block_until_ready does NOT synchronize under the remote
        # axon runtime (docs/PERF.md round-4 isolation); a real
        # device->host VALUE fetch is the only reliable barrier.  The n
        # timed calls may queue asynchronously -- the final fetch drains
        # the queue, so total/n remains a sound per-call throughput.
        leaf = jax.tree_util.tree_leaves(o)[0]
        jax.device_get(jnp.ravel(leaf)[0])

    for _ in range(warmup):
        out = fn(*args)
    drain(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    drain(out)
    return (time.perf_counter() - t0) / n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default="100,70")
    ap.add_argument("--basis", type=int, default=60)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-pallas", action="store_true",
                    help="skip the Pallas A/B legs")
    args = ap.parse_args(argv)

    os.environ.setdefault("NSTPU_CACHE_DIR", "/tmp/nstpu_jax_cache")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.environ["NSTPU_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from navier_stokes_solver_tpu.geometry import (
        make_channel_geometry,
        make_fe_space,
    )
    from navier_stokes_solver_tpu.ops import Blocks, make_disc
    from navier_stokes_solver_tpu.ops.matfree import apply_jacobian
    from navier_stokes_solver_tpu.precond import PrecondConfig
    from navier_stokes_solver_tpu.ops import matfree
    from navier_stokes_solver_tpu.precond.blocks import (
        LinearContext,
        make_preconditioner,
    )
    from navier_stokes_solver_tpu.precond.mg import attach_mg, make_mg_vcycle

    # baseline legs measure the pure-XLA pipeline (the TPU default is the
    # Pallas kernel since round 4); the A/B section flips this to "1"
    prev_pallas = os.environ.get("NSTPU_PALLAS")
    os.environ["NSTPU_PALLAS"] = "0"

    mx, my = (int(v) for v in args.mesh.split(","))
    disc = attach_mg(make_disc(make_fe_space(make_channel_geometry(mx, my), 3, 2)))
    key = jax.random.PRNGKey(0)
    xu = jax.random.normal(key, (2,) + tuple(disc.NV), disc.dtype)
    xp = jax.random.normal(key, tuple(disc.NP), disc.dtype)
    x = Blocks(u=xu, p=xp)
    nu = 1.0 / 90.0
    dF = matfree.diag_F(disc, nu, 0.0, None, stokes=True)

    res = {}

    mv64 = jax.jit(
        lambda b: apply_jacobian(disc, nu, 0.0, None, dF, b, stokes=True)
    )
    res["matvec_f64_ms"] = timeit(mv64, x) * 1e3

    disc32 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        disc,
    )
    x32 = Blocks(u=xu.astype(jnp.float32), p=xp.astype(jnp.float32))
    dF32 = dF.astype(jnp.float32)
    mv32 = jax.jit(
        lambda b: apply_jacobian(disc32, nu, 0.0, None, dF32, b, stokes=True)
    )
    res["matvec_f32_ms"] = timeit(mv32, x32) * 1e3

    # production config: the V-cycle always runs in f32 inside the f64
    # outer (PrecondConfig.mg_dtype default); the f64 variant would also
    # hit TPU's unimplemented f64 LuDecomposition in the GMRES smoother.
    vc = make_mg_vcycle(disc, nu, 0.0, None, stokes=True,
                        dtype=jnp.float32)
    vc_j = jax.jit(vc)
    res["mg_vcycle_f32_ms"] = timeit(vc_j, xu.astype(jnp.float32)) * 1e3

    # CGS2: two stacked (j x N) contractions + basis updates at full depth
    j = args.basis
    Vu = jax.random.normal(key, (j, 2) + tuple(disc.NV), disc.dtype)
    Vp = jax.random.normal(key, (j,) + tuple(disc.NP), disc.dtype)

    @jax.jit
    def cgs2(w_u, w_p):
        for _ in range(2):
            hu = jnp.einsum("jabc,abc->j", Vu, w_u)
            hp = jnp.einsum("jab,ab->j", Vp, w_p)
            h = hu + hp
            w_u = w_u - jnp.einsum("j,jabc->abc", h, Vu)
            w_p = w_p - jnp.einsum("j,jab->ab", h, Vp)
        return w_u, w_p

    res["cgs2_basis%d_f64_ms" % j] = timeit(cgs2, xu, xp) * 1e3

    # the GMRES-IR production config runs the whole cycle (basis, CGS2,
    # Givens) in f32 (krylov.LowCycle); this is the cycle's actual
    # orthogonalization cost
    Vu32, Vp32 = Vu.astype(jnp.float32), Vp.astype(jnp.float32)

    @jax.jit
    def cgs2_f32(w_u, w_p):
        for _ in range(2):
            hu = jnp.einsum("jabc,abc->j", Vu32, w_u)
            hp = jnp.einsum("jab,ab->j", Vp32, w_p)
            h = hu + hp
            w_u = w_u - jnp.einsum("j,jabc->abc", h, Vu32)
            w_p = w_p - jnp.einsum("j,jab->ab", h, Vp32)
        return w_u, w_p

    res["cgs2_basis%d_f32_ms" % j] = (
        timeit(cgs2_f32, xu.astype(jnp.float32), xp.astype(jnp.float32)) * 1e3
    )

    # full blockTriangular vmult at the bench's tuned config (f32 inside)
    cfg = PrecondConfig(tri_rel_u_stokes=1e-4, tri_rel_p_stokes=1e-4)
    ctx = LinearContext(
        disc=disc, nu=nu, inv_dt=0.0, stokes=True, linq=None, diag_f=dF,
        state_u=None, ops=matfree,
    )
    vm = jax.jit(
        make_preconditioner(1, ctx, variant="stationary", cfg=cfg)
    )
    res["blocktri_vmult_ms"] = timeit(vm, x) * 1e3

    # ---- Pallas A/B (VERDICT r3 item 4): same f32 legs with the fused
    # per-cell kernel (ops/pallas_cell.py) swapped in for the XLA
    # gather/einsum/scatter pipeline.  The env flag is read at trace
    # time, so fresh jit wrappers after flipping it retrace cleanly.
    if not args.no_pallas:
        os.environ["NSTPU_PALLAS"] = "1"
        try:
            mv32_pl = jax.jit(
                lambda b: apply_jacobian(
                    disc32, nu, 0.0, None, dF32, b, stokes=True
                )
            )
            res["matvec_f32_pallas_ms"] = timeit(mv32_pl, x32) * 1e3
            vc_pl = jax.jit(
                make_mg_vcycle(disc, nu, 0.0, None, stokes=True,
                               dtype=jnp.float32)
            )
            res["mg_vcycle_f32_pallas_ms"] = (
                timeit(vc_pl, xu.astype(jnp.float32)) * 1e3
            )
            vm_pl = jax.jit(
                make_preconditioner(1, ctx, variant="stationary", cfg=cfg)
            )
            res["blocktri_vmult_pallas_ms"] = timeit(vm_pl, x) * 1e3
        except Exception as e:  # record instead of dying mid-campaign
            res["pallas_error"] = f"{type(e).__name__}: {e}"
    if prev_pallas is None:
        os.environ.pop("NSTPU_PALLAS", None)
    else:
        os.environ["NSTPU_PALLAS"] = prev_pallas

    res["device"] = str(jax.devices()[0])
    print(json.dumps({"metric": f"microbench_{mx}x{my}", "extra": res}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
