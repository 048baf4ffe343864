"""Round-2 feature tour: precision tiers, quantized X, out-of-core,
strict replication, sparse X, live metrics, checkpoint/resume.

Runs end-to-end on any backend (CPU included); sizes are kept small so the
whole script finishes in seconds off-TPU.

    python examples/advanced_features.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nmf_tpu as nt

# NMF_TPU_EXAMPLE_QUICK=1 shrinks sizes so the test suite can execute this
# example as a smoke test (tests/test_examples.py); code paths identical
QUICK = bool(os.environ.get("NMF_TPU_EXAMPLE_QUICK"))

rng = np.random.RandomState(0)
m, k, n = (128, 8, 200) if QUICK else (256, 16, 400)
x = rng.rand(m, n).astype(np.float32)
w0 = rng.rand(m, k).astype(np.float32)
h0 = rng.rand(k, n).astype(np.float32)
_work_ctx = tempfile.TemporaryDirectory()  # cleaned up at interpreter exit
import atexit

atexit.register(_work_ctx.cleanup)
work = _work_ctx.name


# --- precision tiers -------------------------------------------------------
# float32        : exact f32 GEMMs (reference parity)
# float32_fast   : 3-pass bf16 split-float, ~1e-7-grade accuracy, ~1.9x f32
# bfloat16       : full-rate MXU
for tier in ("float32", "float32_fast", "bfloat16"):
    res = nt.solve(
        x, w0, h0,
        nt.SolveConfig(max_iter=50, precision=nt.Precision(tier)),
    )
    print(f"{tier:14s} cost {float(res.cost):.4f}")

# --- quantized X storage (4x denser; opt-in, lossy) ------------------------
res8 = nt.solve(
    x, w0, h0,
    nt.SolveConfig(max_iter=50, precision=nt.Precision(x_dtype="int8")),
)
print(f"{'int8 X':14s} cost {float(res8.cost):.4f}  (quantization-grade)")

# --- live per-check metrics ------------------------------------------------
nt.solve(
    x, w0, h0,
    nt.SolveConfig(max_iter=30, check_every=10, live_metrics=True),
)  # prints "[nmf] iter ... (live)" lines to stderr during the solve

# --- out-of-core: X streamed from its .bin file ----------------------------
xpath = os.path.join(work, "X.bin")
nt.write_matrix(x, xpath)
res_ooc = nt.solve_out_of_core(
    xpath, w0, h0,
    nt.SolveConfig(max_iter=30, check_every=10),
    block_n=128,
    checkpoint_dir=os.path.join(work, "ck"),  # resumable
)
ref = nt.solve(x, w0, h0, nt.SolveConfig(max_iter=30, check_every=10))
print(
    f"{'out-of-core':14s} cost {float(res_ooc.cost):.4f}  "
    f"(in-memory: {float(ref.cost):.4f})"
)

# accelerate=True composes: on this link-bound path ~4x fewer iterations
# to a target cost means ~4x fewer streamed bytes
res_ooa = nt.solve_out_of_core(
    xpath, w0, h0,
    nt.SolveConfig(max_iter=30, check_every=10, accelerate=True),
    block_n=128,
)
print(
    f"{'ooc+accel':14s} cost {float(res_ooa.cost):.4f}  "
    f"(<= plain streamed by the monotone safeguard)"
)

# --- strict reference replication (padded-EPS numerics) --------------------
res_strict = nt.solve_strict(x, w0, h0, nt.SolveConfig(max_iter=30))
print(f"{'strict-compat':14s} cost {float(res_strict.cost):.4f}")

# --- sparse X (memory ~ nnz) ------------------------------------------------
xs = x.copy()
xs[rng.rand(m, n) < 0.95] = 0.0
res_sp = nt.solve_sparse(xs, w0, h0, nt.SolveConfig(max_iter=30), chunk=4096)
nnz = int(nt.sparse_from_dense(xs).data.shape[0])
print(f"{'sparse (5%)':14s} cost {float(res_sp.cost):.4f}  nnz={nnz}")

# --- tile-sparse X (block-sparse, MXU-driven; scales with occupied tiles) ---
xt = np.zeros((m, n), np.float32)
xt[:128, :128] = x[:128, :128]          # clustered nonzeros: 2 occupied
xt[128:256, 256:384] = x[128:256, 256:384]  # (128,128) tiles out of 8
tx = nt.tiles_from_dense(xt, tile=(128, 128))
res_t = nt.solve_sparse_tiled(tx, w0, h0, nt.SolveConfig(max_iter=30))
print(
    f"{'tile-sparse':14s} cost {float(res_t.cost):.4f}  "
    f"occupancy={tx.occupancy():.2f} ({tx.tiles.shape[0]} tiles)"
)

# --- HALS everywhere: a second solver family, orthogonal to parallelism ----
cfg_h = nt.SolveConfig(max_iter=30, beta=2.0, algorithm="hals")
res_h = nt.solve(x, w0, h0, cfg_h)
res_ho = nt.solve_out_of_core(x, w0, h0, cfg_h, block_n=128)
print(
    f"{'hals':14s} cost {float(res_h.cost):.4f}  "
    f"(out-of-core: {float(res_ho.cost):.4f}; also mesh-shardable)"
)

# --- model selection: restarts + rank sweep in one compiled batch ----------
sel = nt.solve_restarts(x, rank=8, n_restarts=4, config=nt.SolveConfig(max_iter=30))
print(
    f"{'restarts':14s} costs {[round(float(c), 2) for c in sel.costs]}  "
    f"kept #{sel.best_index}"
)
sweep = nt.solve_rank_sweep(x, [4, 8, 16], config=nt.SolveConfig(max_iter=30))
print(
    f"{'rank sweep':14s} " +
    "  ".join(f"K={k}:{c:.2f}" for k, c in zip(sweep.ranks, sweep.costs))
)

# --- out-of-core transform: stream-once H-only inference -------------------
# reuse the dictionary already learned above (`ref`): re-solving the same
# problem would pay another compile + 30 iterations for bitwise-equal W
w_learned = np.asarray(ref.w)
tr = nt.transform_out_of_core(
    x, w_learned, config=nt.SolveConfig(max_iter=30), block_n=128
)
print(
    f"{'ooc transform':14s} cost {tr.cost:.4f}  "
    f"({len(tr.blocks)} blocks, one X stream total)"
)

# --- AOT serving artifact: export once, serve anywhere ----------------------
# one .nmfz packages the H-only solve program (jax.export StableHLO, lowered
# for TPU and CPU), the dictionary W, and the SolveConfig; a serving process
# needs only the file — no retracing, no model code
with tempfile.TemporaryDirectory() as td:
    art = os.path.join(td, "model.nmfz")
    nt.save_transform(
        art, w_learned, n_block=64,
        config=nt.SolveConfig(max_iter=30, backend="jnp"),
        platforms=("cpu",) if QUICK else ("tpu", "cpu"),
    )
    served = nt.load_transform(art)(x[:, :100])  # 100 cols -> 2 blocks
    print(
        f"{'serving':14s} cost {served.cost:.4f}  "
        f"({os.path.getsize(art)} byte artifact, "
        f"{len(served.block_iterations)} blocks)"
    )

# --- consensus-clustering rank selection (Brunet et al. 2004) --------------
stab = nt.rank_stability(
    x, ranks=[4, 8], n_restarts=2 if QUICK else 6,
    config=nt.SolveConfig(max_iter=20 if QUICK else 60), seed=1,
)
print(
    f"{'stability':14s} " +
    "  ".join(f"K={k}:coph={c:.3f}" for k, c in zip(stab.ranks, stab.cophenetic))
)

# --- online NMF: one-pass streaming dictionary learning --------------------
onl = nt.solve_online(x, w0, nt.SolveConfig(), block_n=128, inner_iters=15,
                      passes=2)
print(
    f"{'online':14s} pass costs {[round(sum(p), 1) for p in onl.block_costs]}"
    f"  (W learned in one stream/pass; rho<1 tracks drift)"
)

# --- semi-adaptive NMF: frozen template columns (paper's drum workflow) ----
semi = nt.solve_semi(x, w0, h0, nt.SolveConfig(max_iter=30), n_frozen=4)
frozen_ok = bool(np.all(np.asarray(semi.w)[:, :4] == np.maximum(w0[:, :4], 2.2204e-16)))
print(f"{'semi-adaptive':14s} cost {float(semi.cost):.4f}  (4 frozen template cols intact: {frozen_ok})")
