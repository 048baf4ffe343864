"""Production serving pipeline: train once, export a `.nmfz` artifact,
score new data forever — in memory, streamed off disk, with missing-data
masks, and with host-quantized int8 inputs for link-bound deployments.

The reference's one application refits both factors per run; a production
deployment instead learns the dictionary W once and scores a stream of new
columns against it.  This example walks that whole lifecycle:

  1. learn W on training data (NNDSVD init, accelerated solver);
  2. `save_transform` -> a self-contained `.nmfz` (StableHLO program +
     W + config; zero retracing at serve time, runs on TPU and CPU);
  3. serve new columns in memory and out-of-core (`stream_bin`);
  4. the quantized-input variant: the HOST quantizes each block, so the
     wire carries uint8 codes (~4x less — the lever when serving across a
     slow host<->device link), bit-identical results;
  5. masked serving for missing-data scoring, streamed mask included.

Runs end-to-end on any backend (CPU included).

    python examples/serving_pipeline.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nmf_tpu as nt
from nmf_tpu.serving import load_transform, save_transform

QUICK = bool(os.environ.get("NMF_TPU_EXAMPLE_QUICK"))

rng = np.random.RandomState(0)
m, k = (96, 6) if QUICK else (256, 16)
n_train, n_serve = (160, 200) if QUICK else (400, 1000)
block = 64 if QUICK else 200

# ground-truth parts + noise so the learned dictionary means something
w_true = rng.rand(m, k).astype(np.float32)
x_train = (w_true @ rng.rand(k, n_train) + 0.01 * rng.rand(m, n_train)).astype(
    np.float32
)

# --- 1. train the dictionary once ------------------------------------------
w0, h0 = nt.nndsvd_init(x_train, k, variant="nndsvda")
fit = nt.solve(
    x_train, w0, h0,
    nt.SolveConfig(max_iter=60 if QUICK else 200, check_every=20,
                   accelerate=True),
)
w = np.asarray(fit.w)
print(f"trained: {m}x{k} dictionary, cost {float(fit.cost):.4f}, "
      f"{int(fit.iterations)} iterations")

work = tempfile.TemporaryDirectory()
import atexit

atexit.register(work.cleanup)
d = work.name

# --- 2. export the serving artifact ----------------------------------------
art = os.path.join(d, "model.nmfz")
save_transform(
    art, w, n_block=block,
    config=nt.SolveConfig(max_iter=30, check_every=30),
    platforms=("cpu",) if QUICK else ("tpu", "cpu"),
)
print(f"exported {os.path.getsize(art)} bytes "
      f"(program + W + config, self-contained)")

# --- 3. serve new data: in memory and streamed off disk --------------------
x_new = (w_true @ rng.rand(k, n_serve) + 0.01 * rng.rand(m, n_serve)).astype(
    np.float32
)
t = load_transform(art)
res = t(x_new)  # any column count; blocks of `block`, tail padded
print(f"served {n_serve} columns in {len(res.block_iterations)} blocks, "
      f"total cost {float(res.cost):.4f}")

xp = os.path.join(d, "X_new.bin")
nt.write_matrix(x_new, xp)
hp = os.path.join(d, "H_new.bin")
streamed = t.stream_bin(xp, out_path=hp)  # constant host memory at any N
assert np.array_equal(nt.read_matrix(hp), res.h)
print("streamed serve (disk -> disk) matches the in-memory call bitwise")

# --- 4. quantized-input serving (int8 wire) --------------------------------
qart = os.path.join(d, "model_q.nmfz")
save_transform(
    qart, w, n_block=block,
    config=nt.SolveConfig(max_iter=30, check_every=30,
                          precision=nt.Precision(x_dtype="int8")),
    platforms=("cpu",) if QUICK else ("tpu", "cpu"),
    quantized_input=True,
)
tq = load_transform(qart)
resq = tq(x_new)  # each block host-quantizes; uint8 codes ride the link
print(f"quantized-input serve: total cost {float(resq.cost):.4f} "
      f"(wire payload ~4x smaller; bit-identical to the in-program-"
      f"quantization artifact)")

# --- 5. masked serving: score only the observed entries --------------------
mask = (rng.rand(m, n_serve) > 0.3).astype(np.float32)
x_holes = x_new.copy()
x_holes[mask == 0] = np.nan  # unobserved entries may be garbage, incl. NaN
mart = os.path.join(d, "model_masked.nmfz")
save_transform(
    mart, w, n_block=block,
    config=nt.SolveConfig(max_iter=30, check_every=30),
    platforms=("cpu",) if QUICK else ("tpu", "cpu"),
    masked=True,
)
tm = load_transform(mart)
resm = tm(x_holes, mask=mask)
print(f"masked serve (30% missing, garbage holes): "
      f"cost {float(resm.cost):.4f}, finite={np.isfinite(resm.h).all()}")

# ...and streamed: the mask .bin's column blocks ride alongside X's
mp = os.path.join(d, "mask.bin")
xh = os.path.join(d, "X_holes.bin")
nt.write_matrix(np.nan_to_num(x_holes), xh)  # zeroed holes; the program
# zeroes everything under mask==0 anyway, so the two encodings agree
nt.write_matrix(mask, mp)
hm = os.path.join(d, "H_masked.bin")
tm.stream_bin(xh, out_path=hm, mask_path=mp)
print("masked streamed serve wrote", os.path.basename(hm))

print("serving pipeline complete")
