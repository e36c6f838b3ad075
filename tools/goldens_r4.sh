#!/bin/bash
# Round-4 chip-work queue, VERDICT-r3 priority order.  Every chunk is
# bounded and --resume-safe; rerunning the script continues where the
# tunnel (or a kill) stopped it.  ONE chip client at a time (CLAUDE.md
# rule 7) — do not run anything else against the chip while this runs.
#
#   P0  gates: smoke kernels, mega-4096 compile probe, autotune crossover
#   P1  c potrf 768/1024/2048 (the r3 outage-lost rows; small chunks)
#   P2  d regen on live-block TRMM code + missing d ops + big-n extension
#       (VERDICT Missing #2 / Weak #4: committed trmm rows measure the
#       deleted full-matmul path — the stale file is preserved as
#       golden_tpu_v5_lite_d_r3_stale.jsonl for the >=1.5x comparison)
#   P3  s headline ladder 6144/8192/16384 (VERDICT Missing #1)
#   P4  z extension to 1024 + z trmm/trsm rows
#   P5  s gemm/syrk/logdet to 4096
#   P6  variant-config grid rows (VERDICT Missing #3 / Next #4)
#   P7  s densify + logdet_diag bandwidth ladder to 2^20
#   P8  lookahead probe + bench validation
set -u
cd "$(dirname "$0")/.."
OUT=bench_results
mkdir -p "$OUT"

if [ -n "${WAIT_PID:-}" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 5; done
fi

run() { # dtype ops sizes outfile [extra args...]
  local d="$1" o="$2" s="$3" f="$4"; shift 4
  echo "=== $(date +%H:%M:%S) sweep dtype=$d ops=$o sizes=$s $* ==="
  timeout 2400 python tools/sweep.py --dtype "$d" --ops "$o" --sizes "$s" \
      --resume --out "$OUT/$f" "$@" || echo "(chunk exited $?)"
}

# --- P0: gates -------------------------------------------------------------
# SKIP_P0=1 skips the gates on a restart (they re-measure ~15 min of
# smoke/probe/autotune chip time that a mid-queue resume doesn't need).
if [ -z "${SKIP_P0:-}" ]; then
echo "=== P0 gates ==="
timeout 600 python tools/smoke_tpu.py || echo "(smoke exited $?)"
# mega mono-kernel compile + correctness probe at the new caps (4096 route
# ships enabled; 8192 is the autotune candidate): catch a Mosaic compile
# failure early, before anything depends on these routes
timeout 1800 python - <<'EOF' || echo "(mega4096 probe exited $?)"
import sys; sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_autotune_cache")
from cholesky_tpu.ops.pallas import mega
from cholesky_tpu.rng import latmc
hp = jax.lax.Precision.HIGHEST
for n in (3072, 4096, 8192):
    A = latmc(jax.random.PRNGKey(0), n, 50.0, jnp.float32)
    L, info = mega.potrf_hbm_f32(A)
    assert int(info) == 0, int(info)
    v = jax.random.normal(jax.random.PRNGKey(1), (n, 8), jnp.float32)
    Lm = jnp.tril(L)

    @jax.jit
    def resid(Lm, A, v):
        Av = jnp.matmul(A, v, precision=hp)
        num = jnp.matmul(Lm, jnp.matmul(Lm.T, v, precision=hp),
                         precision=hp) - Av
        return jnp.linalg.norm(num) / jnp.linalg.norm(Av)

    r = float(resid(Lm, A, v))
    print(f"mega potrf_hbm n={n}: proj resid {r:.2e}", flush=True)
    assert r < 1e-5, r
    if n <= mega.HBM_MAX_N:
        W, info2 = mega.trtri_hbm_f32(Lm)
        assert int(info2) == 0

        @jax.jit
        def tresid(W, Lm, v):
            Wv = jnp.matmul(jnp.tril(W),
                            jnp.matmul(Lm, v, precision=hp), precision=hp)
            return jnp.linalg.norm(Wv - v) / jnp.linalg.norm(v)

        rt = float(tresid(W, Lm, v))
        print(f"mega trtri_hbm n={n}: proj resid {rt:.2e}", flush=True)
        assert rt < 1e-4, rt
    if n <= mega.LAUUM_HBM_MAX_N:
        P = mega.lauum_hbm_f32(Lm)

        @jax.jit
        def lresid(P, Lm, v):
            ref = jnp.matmul(Lm.T, jnp.matmul(Lm, v, precision=hp),
                             precision=hp)
            Pf = jnp.tril(P) + jnp.tril(P, -1).T
            return jnp.linalg.norm(
                jnp.matmul(Pf, v, precision=hp) - ref) / jnp.linalg.norm(ref)

        rl = float(lresid(P, Lm, v))
        print(f"mega lauum_hbm n={n}: proj resid {rl:.2e}", flush=True)
        assert rl < 1e-4, rl
print("mega probe OK")
EOF
timeout 2400 python tools/autotune.py --quick || echo "(autotune exited $?)"
fi  # SKIP_P0

# --- P1: c potrf large points (lost to the r3 outage; isolated chunks) ----
run c potrf 768 golden_tpu_v5_lite_c.jsonl
run c potrf 1024 golden_tpu_v5_lite_c.jsonl
run c potrf 2048 golden_tpu_v5_lite_c.jsonl
run c trmm 1024 golden_tpu_v5_lite_c.jsonl
run c trsm 1024 golden_tpu_v5_lite_c.jsonl

# --- P2: d-precision regen on live-block trmm code ------------------------
if [ ! -f "$OUT/golden_tpu_v5_lite_d_r3_stale.jsonl" ]; then
  cp "$OUT/golden_tpu_v5_lite_d.jsonl" \
     "$OUT/golden_tpu_v5_lite_d_r3_stale.jsonl"
  # drop the stale trmm rows (measured the pre-r3 full-matmul path) so
  # --resume re-records them on the live-block code
  python - <<'EOF'
import json
p = "bench_results/golden_tpu_v5_lite_d.jsonl"
rows = [json.loads(l) for l in open(p)]
keep = [r for r in rows if r["op"] != "trmm"]
with open(p, "w") as f:
    for r in keep:
        f.write(json.dumps(r) + "\n")
print(f"dropped {len(rows)-len(keep)} stale d-trmm rows")
EOF
fi
run d trmm 256:1536:256 golden_tpu_v5_lite_d.jsonl
run d trmm 1792,2048 golden_tpu_v5_lite_d.jsonl
# the >=1.5x demonstration artifact (live-block vs stale full-matmul rows)
python - <<'EOF' || true
import json
stale = {r["n"]: r for r in map(json.loads,
         open("bench_results/golden_tpu_v5_lite_d_r3_stale.jsonl"))
         if r["op"] == "trmm" and "gflops" in r}
fresh = {r["n"]: r for r in map(json.loads,
         open("bench_results/golden_tpu_v5_lite_d.jsonl"))
         if r["op"] == "trmm" and "gflops" in r}
cmp = {n: {"stale_gflops": stale[n]["gflops"],
           "live_gflops": fresh[n]["gflops"],
           "speedup": round(fresh[n]["gflops"] / stale[n]["gflops"], 2)}
       for n in sorted(set(stale) & set(fresh))}
out = {"probe": "d_trmm_liveblock_vs_fullmatmul", "points": cmp}
print(json.dumps(out))
with open("bench_results/d_trmm_liveblock_demo.json", "w") as f:
    json.dump(out, f, indent=2)
EOF
for op in lauum trsm gemm syrk logdet; do
  run d "$op" 256:1536:256 golden_tpu_v5_lite_d.jsonl
done
for op in potrf trmm potri trtri lauum trsm gemm syrk logdet; do
  run d "$op" 2048,3072 golden_tpu_v5_lite_d.jsonl
done
for op in potrf trmm potri trtri lauum trsm gemm syrk logdet; do
  run d "$op" 4096 golden_tpu_v5_lite_d.jsonl
done

# --- P3: s headline ladder (README numbers must cite these rows) ----------
run s potrf 6144 golden_tpu_v5_lite_s.jsonl
run s potrf 8192 golden_tpu_v5_lite_s.jsonl
run s potrf 16384 golden_tpu_v5_lite_s.jsonl
run s trtri 8192 golden_tpu_v5_lite_s.jsonl

# --- P4: z extension + trmm/trsm rows -------------------------------------
for op in potrf potri trtri lauum logdet; do
  run z "$op" 640:1024:128 golden_tpu_v5_lite_z.jsonl
done
for op in trmm trsm; do
  run z "$op" 128,256,512,1024 golden_tpu_v5_lite_z.jsonl
done

# --- P5: s blas/logdet extension ------------------------------------------
for op in gemm syrk logdet; do
  run s "$op" 2560:4096:512 golden_tpu_v5_lite_s.jsonl
done
# rectangular GEMM k-sweep, m=n=1024 fixed (reference test_gpublas.sh:5-25)
run s gemm_k 128:1024:128 golden_tpu_v5_lite_s.jsonl
run s gemm_k 1536,2048,3072,4096 golden_tpu_v5_lite_s.jsonl

# --- P6: variant-config grid (config != auto rows for every driver) -------
run s potrf,potri,trtri,lauum,logdet 512,1024 golden_tpu_v5_lite_s.jsonl \
    --config grid
run s trmm,trsm 512,1024 golden_tpu_v5_lite_s.jsonl --config grid
run s gemm,syrk 1024 golden_tpu_v5_lite_s.jsonl --config grid
run d potrf,trmm,trsm 512 golden_tpu_v5_lite_d.jsonl --config grid
run c potrf,trmm,trsm 256 golden_tpu_v5_lite_c.jsonl --config grid
run z potrf 256 golden_tpu_v5_lite_z.jsonl --config grid

# --- P7: s densify + logdet_diag bandwidth ladder -------------------------
run s logdet_diag 4096,16384,65536,131072,262144,524288,1048576 \
    golden_tpu_v5_lite_s.jsonl
for op in potrf potri trtri lauum trmm trsm gemm syrk logdet; do
  run s "$op" 384:1920:128 golden_tpu_v5_lite_s.jsonl
done
for op in potrf potri trtri lauum trmm trsm gemm syrk logdet; do
  run s "$op" 64:192:64 golden_tpu_v5_lite_s.jsonl
done

# --- P8: probes + validation ----------------------------------------------
timeout 1800 python tools/probe_r3.py lookahead || echo "(lookahead exited $?)"
timeout 700 python bench.py || echo "(bench exited $?)"
timeout 1500 python __graft_entry__.py || echo "(graft exited $?)"

# regenerate the perf ledger from the committed artifacts
python tools/report.py --md > "$OUT/perf_ledger.md" 2>/dev/null || true

echo "=== goldens_r4 done $(date +%H:%M:%S) ==="
