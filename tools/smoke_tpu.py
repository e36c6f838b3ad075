#!/usr/bin/env python
"""2-minute on-chip smoke gate: run every Pallas/Mosaic kernel once on the
real TPU at one representative size each and write a JSON artifact.

Why this exists (VERDICT r1 Weak #5): CI runs the kernels in interpret
mode on the CPU mesh, which cannot catch Mosaic-specific failure modes —
the compiler SIGABRTs catalogued in CLAUDE.md rule 3 (dynamic lane slices,
big-iota slices, int64 lowering recursion, ...). Without this gate those
regressions are first seen by a 10-minute sweep. The reference's
equivalent discipline is one standalone binary per kernel that exits
nonzero (reference test/Makefile:17-33).

Usage:  python tools/smoke_tpu.py [--out bench_results/smoke_tpu.json]
Exit 0 = all kernels compiled AND produced numerically sane output.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_smoke_cache")


def _force(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    float(jnp.sum(leaf).real)
    return x


def probes():
    """(name, fn) pairs; each fn returns (ok: bool, detail: str)."""
    from cholesky_tpu.ops.pallas import leaf, gemm, syrk, mega
    from cholesky_tpu.ops import ozaki
    from cholesky_tpu.rng import generators, pallas_prng

    key = jax.random.PRNGKey(0)
    A = generators.latmc(key, 256, 50.0, jnp.float32)
    An = np.asarray(A, np.float64)
    Afull = np.tril(An) + np.tril(An, -1).T
    ref_chol = np.linalg.cholesky(Afull)

    def p_potf2():
        L, info = _force(jax.jit(leaf.potf2_f32)(A))
        err = np.max(np.abs(np.tril(np.asarray(L, np.float64)) - ref_chol))
        return err < 1e-4 and int(info) == 0, f"err={err:.2e}"

    def p_trti2():
        F = jnp.asarray(ref_chol.astype(np.float32))
        W, info = _force(jax.jit(leaf.trti2_f32)(F))
        resid = np.max(np.abs(np.tril(np.asarray(W, np.float64)) @ ref_chol
                              - np.eye(256)))
        return resid < 1e-3 and int(info) == 0, f"resid={resid:.2e}"

    def p_lauu2():
        F = jnp.asarray(ref_chol.astype(np.float32))
        P = _force(jax.jit(leaf.lauu2_f32)(F))
        ref = np.tril(ref_chol.T @ ref_chol)
        err = np.max(np.abs(np.tril(np.asarray(P, np.float64)) - ref))
        return err < 1e-3, f"err={err:.2e}"

    def p_mega_potrf():
        L, info = _force(jax.jit(mega.potrf_vmem_f32)(A))
        err = np.max(np.abs(np.asarray(L, np.float64) - ref_chol))
        return err < 1e-4 and int(info) == 0, f"err={err:.2e}"

    def p_mega_trtri():
        F = jnp.asarray(ref_chol.astype(np.float32))
        W, info = _force(jax.jit(mega.trtri_vmem_f32)(F))
        resid = np.max(np.abs(np.asarray(W, np.float64) @ ref_chol
                              - np.eye(256)))
        return resid < 1e-3 and int(info) == 0, f"resid={resid:.2e}"

    def p_mega_potrf_hbm():
        # the r4 fori-k-loop HBM kernel: the gate size 1280 (10 panels)
        # exercises the double-buffered DMA loop the VMEM kernel lacks
        Ah = generators.latmc(jax.random.PRNGKey(2), 1280, 50.0,
                              jnp.float32)
        L, info = _force(jax.jit(mega.potrf_hbm_f32)(Ah))
        Ahn = np.asarray(Ah, np.float64)
        refh = np.linalg.cholesky(np.tril(Ahn) + np.tril(Ahn, -1).T)
        err = np.max(np.abs(np.asarray(L, np.float64) - refh))
        return err < 1e-2 and int(info) == 0, f"err={err:.2e}"

    def p_mega_trtri_hbm():
        Ah = generators.latmc(jax.random.PRNGKey(2), 1280, 50.0,
                              jnp.float32)
        Ahn = np.asarray(Ah, np.float64)
        refh = np.linalg.cholesky(np.tril(Ahn) + np.tril(Ahn, -1).T)
        F = jnp.asarray(refh.astype(np.float32))
        W, info = _force(jax.jit(mega.trtri_hbm_f32)(F))
        resid = np.max(np.abs(np.asarray(W, np.float64) @ refh
                              - np.eye(1280)))
        return resid < 1e-2 and int(info) == 0, f"resid={resid:.2e}"

    def p_mega_lauum_hbm():
        F = jnp.asarray(ref_chol.astype(np.float32))
        P = _force(jax.jit(mega.lauum_hbm_f32)(F))
        ref = np.tril(ref_chol.T @ ref_chol)
        err = np.max(np.abs(np.asarray(P, np.float64) - ref))
        return err < 1e-2 * np.max(np.abs(ref)), f"err={err:.2e}"

    def p_trmm():
        from cholesky_tpu.ops.pallas import trmm as ptrmm
        B = jax.random.normal(jax.random.PRNGKey(3), (256, 256), jnp.float32)
        F = jnp.asarray(ref_chol.astype(np.float32))
        D = _force(jax.jit(ptrmm.trmm_lln_f32)(F, B))
        ref = ref_chol @ np.asarray(B, np.float64)
        err = np.max(np.abs(np.asarray(D, np.float64) - ref))
        return err < 1e-2 * np.max(np.abs(ref)), f"err={err:.2e}"

    def p_gemm():
        B = jax.random.normal(jax.random.PRNGKey(1), (256, 256), jnp.float32)
        D = _force(jax.jit(gemm.matmul_f32)(A, B))
        ref = An @ np.asarray(B, np.float64)
        err = np.max(np.abs(np.asarray(D, np.float64) - ref))
        return err < 1e-2 * np.max(np.abs(ref)), f"err={err:.2e}"

    def p_syrk():
        C = jnp.zeros((256, 256), jnp.float32)
        D = _force(jax.jit(lambda a: syrk.syrk_f32(a, C, alpha=1.0,
                                                   beta=0.0))(A))
        ref = np.tril(An @ An.T)
        err = np.max(np.abs(np.tril(np.asarray(D, np.float64)) - ref))
        return err < 1e-2 * np.max(np.abs(ref)), f"err={err:.2e}"

    def p_ozaki():
        x64 = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
        try:
            Ad = jnp.asarray(Afull)
            # slices=6 is what the _OzakiTiles tier runs (ops/blocked.py)
            D = _force(jax.jit(lambda a: ozaki.matmul_f64(a, a,
                                                          slices=6))(Ad))
            ref = Afull @ Afull
            err = np.max(np.abs(np.asarray(D) - ref)) / np.max(np.abs(ref))
            # slices=6 = 42 mantissa bits/operand -> ~1e-11 rel (the
            # LAPACK tier recovers full f64 via refinement on top of this)
            return err < 1e-9, f"rel={err:.2e}"
        finally:
            jax.config.update("jax_enable_x64", x64)

    def p_prng():
        u = _force(pallas_prng.uniform_device(7, (1024, 1024)))
        un = np.asarray(u)
        ok = (un >= 0).all() and (un < 1).all() and 0.45 < un.mean() < 0.55
        return bool(ok), f"mean={un.mean():.3f}"

    def p_prng64():
        x64 = jax.config.jax_enable_x64
        jax.config.update("jax_enable_x64", True)
        try:
            u = _force(pallas_prng.uniform_device64(7, (512, 512)))
            un = np.asarray(u)
            fine = np.max(np.abs(un - un.astype(np.float32)
                                 .astype(np.float64)))   # >24-bit content
            ok = ((un >= 0).all() and (un < 1).all()
                  and 0.45 < un.mean() < 0.55 and fine > 0)
            return bool(ok), f"mean={un.mean():.3f} sub-f32-res={fine:.1e}"
        finally:
            jax.config.update("jax_enable_x64", x64)

    def p_trsm_wide():
        # regression gate for the donated-alias corruption (f626f39): a
        # 3072-size trsm recursion with a WIDE rhs corrupted rows
        # 2688-2943 value-independently when the aliased trti2-leaf input
        # arrived from a fusion. Must run through blocked.trsm (the bug
        # only manifests inside large compiled programs).
        from cholesky_tpu.ops import blocked
        n = 3072
        G = jax.random.uniform(jax.random.PRNGKey(7), (n, n), jnp.float32) - 0.5
        L = jnp.tril(G) + 48.0 * jnp.eye(n, dtype=jnp.float32)
        B = jax.random.uniform(jax.random.PRNGKey(8), (n, n), jnp.float32) - 0.5
        X = _force(jax.jit(lambda l, b: blocked.trsm(
            "L", "L", "N", "N", 1.0, l, b, backend="auto"))(L, B))
        Xn = np.asarray(X, np.float64)
        Ln = np.tril(np.asarray(L, np.float64))
        r = np.max(np.abs(Ln @ Xn - np.asarray(B, np.float64)))
        r /= np.max(np.abs(Xn)) * np.max(np.abs(Ln))
        return r < 1e-5, f"scaled_resid={r:.2e}"

    return [("leaf.potf2_f32", p_potf2), ("leaf.trti2_f32", p_trti2),
            ("blocked.trsm_wide_3072", p_trsm_wide),
            ("leaf.lauu2_f32", p_lauu2), ("mega.potrf_vmem_f32", p_mega_potrf),
            ("mega.trtri_vmem_f32", p_mega_trtri),
            ("mega.potrf_hbm_f32", p_mega_potrf_hbm),
            ("mega.trtri_hbm_f32", p_mega_trtri_hbm),
            ("mega.lauum_hbm_f32", p_mega_lauum_hbm),
            ("trmm.trmm_lln_f32", p_trmm), ("gemm.matmul_f32", p_gemm),
            ("syrk.syrk_f32", p_syrk), ("ozaki.matmul_f64", p_ozaki),
            ("pallas_prng.uniform_device", p_prng),
            ("pallas_prng.uniform_device64", p_prng64)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results/smoke_tpu.json")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the host-CPU platform (interpret-mode script "
                         "check on a dead tunnel; CLAUDE.md rule 5)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    results = {"backend": backend, "ts": time.time(), "kernels": {}}
    failed = []
    for name, fn in probes():
        t0 = time.perf_counter()
        try:
            ok, detail = fn()
        except Exception as e:  # Mosaic SIGABRTs kill the process; this
            ok, detail = False, f"{type(e).__name__}: {str(e)[:200]}"
        wall = time.perf_counter() - t0
        ok = bool(ok)
        results["kernels"][name] = {"ok": ok, "detail": detail,
                                    "wall_s": round(wall, 2)}
        print(f"  {'PASS' if ok else 'FAIL'} {name:30s} {detail} "
              f"({wall:.1f}s)", flush=True)
        if not ok:
            failed.append(name)

    results["ok"] = not failed
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(("SMOKE PASS" if not failed else f"SMOKE FAIL: {failed}"),
          f"-> {out}", flush=True)
    sys.exit(0 if not failed else 1)


if __name__ == "__main__":
    main()
