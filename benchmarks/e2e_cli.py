"""On-hardware CLI end-to-end check: the reference's own test flow
(test_output.sh:1-21 — run the BINARY over FILES on the DEVICE), generalized.

Drives the user-facing pipeline through subprocesses on whatever device the
environment provides (the real TPU under the driver):

  gen -> run (fixed-iteration determinism contract)
      -> run --thresh (early convergence)
      -> run --checkpoint-dir, killed after the first segment, resumed
      -> run --accelerate
      -> transform (H-only inference against the learned dictionary)
      -> export -> serve / serve --out-of-core (the .nmfz serving artifact;
         both must be bit-identical to the live transform at equal shapes)

Asserts output .bin headers/shapes, cost parity between the resumed and
straight runs, and writes ONE JSON artifact (default E2E_r03.json at the
repo root) recording commands, costs, timings and the md5 of every output.

    python benchmarks/e2e_cli.py [--out E2E_r03.json] [--quick]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import struct
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


PLATFORM = None  # set from --platform; exported to CLI subprocesses


def _env():
    env = dict(os.environ)
    if PLATFORM:
        env["NMF_TPU_PLATFORM"] = PLATFORM
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    pp = env.get("PYTHONPATH", "")
    parts = [REPO] + ([pp] if pp else [])
    if os.path.isdir("/root/.axon_site") and "/root/.axon_site" not in pp:
        parts.append("/root/.axon_site")  # keep the TPU plugin importable
    env["PYTHONPATH"] = ":".join(parts)
    return env


def _run(args, cwd, timeout=1800):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "nmf_tpu", *args],
        cwd=cwd, env=_env(), capture_output=True, text=True, timeout=timeout,
    )
    dt = time.time() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f"nmf_tpu {' '.join(args)} failed ({proc.returncode}):\n"
            f"{proc.stdout}\n{proc.stderr}"
        )
    return proc.stdout + proc.stderr, dt


def _bin_header(path):
    with open(path, "rb") as f:
        rows, cols = struct.unpack("ii", f.read(8))
    return rows, cols, os.path.getsize(path)


def _md5(path):
    return hashlib.md5(open(path, "rb").read()).hexdigest()


def _final_cost(stdout):
    # the run logger prints per-check lines ending with the final cost
    m = re.findall(r"cost[= ]([0-9.eE+-]+)", stdout)
    return float(m[-1]) if m else None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(REPO, "E2E_r03.json"))
    ap.add_argument(
        "--quick", action="store_true",
        help="50 iterations instead of the reference 200 (smoke runs)",
    )
    ap.add_argument(
        "--platform",
        help="pin the CLI subprocesses to a backend (e.g. cpu) via "
        "NMF_TPU_PLATFORM; default: the environment's device (real TPU "
        "under the driver)",
    )
    args = ap.parse_args(argv)
    global PLATFORM
    PLATFORM = args.platform
    iters = 50 if args.quick else 200

    art = {"artifact": "e2e_cli", "steps": [], "ok": True,
           "platform_forced": args.platform, "iters": iters}
    try:
        import jax

        if args.platform == "cpu":
            # keep the parent off the TPU plugin: with the tunnel down,
            # backend init HANGS (measured 2026-08-17), and a cpu-forced
            # smoke must not touch the chip at all
            jax.config.update("jax_platforms", "cpu")
        art["device"] = str(jax.devices()[0])
        art["device_kind"] = jax.devices()[0].device_kind
    except Exception:
        art["device"] = "unknown"

    with tempfile.TemporaryDirectory() as d:
        def step(name, cli_args, outputs=(), extra=None):
            out, dt = _run(cli_args, d)
            rec = {"step": name, "args": cli_args, "seconds": round(dt, 2)}
            cost = _final_cost(out)
            if cost is not None:
                rec["final_cost"] = cost
            for path in outputs:
                full = os.path.join(d, path)
                rows, cols, size = _bin_header(full)
                assert size == 8 + rows * cols * 4, (path, rows, cols, size)
                rec[path] = {
                    "shape": [rows, cols], "md5": _md5(full), "bytes": size,
                }
            if extra:
                rec.update(extra)
            art["steps"].append(rec)
            return rec

        # 1. fixture generation (matrix_export.py semantics, seed 0)
        step("gen", ["gen", "."], outputs=["X.bin", "W.bin", "H.bin"])

        # 2. the reference flow: fixed iterations, file-in/file-out
        r_run = step(
            "run",
            ["run", "X.bin", "W.bin", "H.bin", "-o", "Wout.bin", "Hout.bin",
             "--max-iter", str(iters), "--thresh", "0",
             "--check-every", "25"],
            outputs=["Wout.bin", "Hout.bin"],
        )
        # determinism contract: re-run must be byte-identical
        r_rep = step(
            "run-repeat",
            ["run", "X.bin", "W.bin", "H.bin", "-o", "Wout2.bin", "Hout2.bin",
             "--max-iter", str(iters), "--thresh", "0",
             "--check-every", "25"],
            outputs=["Wout2.bin", "Hout2.bin"],
        )
        det = (
            r_run["Wout.bin"]["md5"] == r_rep["Wout2.bin"]["md5"]
            and r_run["Hout.bin"]["md5"] == r_rep["Hout2.bin"]["md5"]
        )
        art["deterministic_rerun"] = det
        art["ok"] &= det

        # 3. thresholded convergence stops early
        step(
            "run-thresh",
            ["run", "X.bin", "W.bin", "H.bin", "-o", "Wt.bin", "Ht.bin",
             "--max-iter", "2000", "--thresh", "1e-3", "--check-every", "25"],
            outputs=["Wt.bin"],
        )

        # 4. checkpoint -> "kill" (stop after segment) -> resume == straight
        ck = os.path.join(d, "ck")
        step(
            "run-ckpt-first-segment",
            ["run", "X.bin", "W.bin", "H.bin", "-o", "Wc0.bin", "Hc0.bin",
             "--max-iter", str(iters // 2), "--thresh", "0",
             "--checkpoint-dir", ck, "--checkpoint-every", str(iters // 2)],
        )
        r_res = step(
            "run-ckpt-resume",
            ["run", "X.bin", "W.bin", "H.bin", "-o", "Wc.bin", "Hc.bin",
             "--max-iter", str(iters), "--thresh", "0",
             "--checkpoint-dir", ck, "--checkpoint-every", str(iters // 2)],
            outputs=["Wc.bin", "Hc.bin"],
        )
        resume_match = r_res["Wc.bin"]["md5"] == r_run["Wout.bin"]["md5"]
        art["resume_equals_straight_run"] = resume_match
        # bit-identity of resume vs straight holds on a fixed stack
        art["ok"] &= resume_match

        # 5. accelerated solver through the CLI
        step(
            "run-accelerate",
            ["run", "X.bin", "W.bin", "H.bin", "-o", "Wa.bin", "Ha.bin",
             "--max-iter", str(iters), "--thresh", "0", "--accelerate"],
            outputs=["Wa.bin"],
        )

        # 5b. accelerated out-of-core streaming (round-3 late addition):
        # X streamed from its .bin with the safeguarded accelerated loop
        step(
            "run-oocore-accelerate",
            ["run", "X.bin", "W.bin", "H.bin", "-o", "Wsa.bin", "Hsa.bin",
             "--max-iter", str(iters // 2), "--thresh", "0",
             "--out-of-core", "--accelerate"],
            outputs=["Wsa.bin"],
        )

        # 6. H-only inference against the learned dictionary (jnp backend:
        # the serving artifact below exports the portable XLA path, and the
        # serve-vs-transform bit-parity check needs both on the same path)
        r_tr = step(
            "transform",
            ["transform", "X.bin", "Wout.bin", "-o", "Hnew.bin",
             "--max-iter", "30", "--thresh", "0", "--backend", "jnp"],
            outputs=["Hnew.bin"],
        )

        # 7. serving artifact: export the learned dictionary + program, then
        # serve the same data — block width = N so no padding is involved and
        # the result must be bit-identical to the live transform
        r_exp_out, r_exp_dt = _run(
            ["export", "Wout.bin", "-o", "model.nmfz", "--block-cols", "350",
             "--max-iter", "30", "--thresh", "0", "--backend", "jnp"], d,
        )
        art["steps"].append({
            "step": "export", "seconds": round(r_exp_dt, 2),
            "model.nmfz": {"bytes": os.path.getsize(os.path.join(d, "model.nmfz"))},
        })
        r_srv = step(
            "serve",
            ["serve", "model.nmfz", "X.bin", "-o", "Hserve.bin"],
            outputs=["Hserve.bin"],
        )
        serve_match = r_srv["Hserve.bin"]["md5"] == r_tr["Hnew.bin"]["md5"]
        art["serve_equals_transform"] = serve_match
        art["ok"] &= serve_match
        # streamed serving (X read off disk block by block, H appended) must
        # match the in-memory call bit for bit
        r_ss = step(
            "serve-stream",
            ["serve", "model.nmfz", "X.bin", "-o", "Hss.bin", "--out-of-core"],
            outputs=["Hss.bin"],
        )
        stream_match = r_ss["Hss.bin"]["md5"] == r_srv["Hserve.bin"]["md5"]
        art["serve_stream_equals_in_memory"] = stream_match
        art["ok"] &= stream_match

        # 7b. quantized-input serving (format v3): host int8 quantization,
        # (codes, scales) over the link — must serve bit-identically to the
        # same config's in-program-quantization artifact
        _run(
            ["export", "Wout.bin", "-o", "q_in.nmfz", "--block-cols", "350",
             "--max-iter", "30", "--thresh", "0", "--backend", "jnp",
             "--x-dtype", "int8"], d,
        )
        _run(
            ["export", "Wout.bin", "-o", "q_host.nmfz", "--block-cols", "350",
             "--max-iter", "30", "--thresh", "0", "--backend", "jnp",
             "--x-dtype", "int8", "--quantized-input"], d,
        )
        r_qi = step(
            "serve-int8-inprogram",
            ["serve", "q_in.nmfz", "X.bin", "-o", "Hqi.bin"],
            outputs=["Hqi.bin"],
        )
        r_qh = step(
            "serve-int8-quantized-input",
            ["serve", "q_host.nmfz", "X.bin", "-o", "Hqh.bin"],
            outputs=["Hqh.bin"],
        )
        quant_match = r_qh["Hqh.bin"]["md5"] == r_qi["Hqi.bin"]["md5"]
        art["serve_quantized_input_equals_in_program"] = quant_match
        art["ok"] &= quant_match

        # 7c. masked x quantized-input serving (format v4): the host
        # reproduces the in-program clamp -> zero-unobserved -> quantize
        # order bit-for-bit, and the streamed serve reads the mask .bin's
        # column blocks alongside X's — so the streamed host-quantized
        # serve must be md5-identical to the in-memory in-program one
        import numpy as _np

        rows, cols, _ = _bin_header(os.path.join(d, "X.bin"))
        mask = (
            _np.random.RandomState(5).rand(rows, cols) > 0.25
        ).astype(_np.float32)
        with open(os.path.join(d, "mask.bin"), "wb") as f:
            f.write(struct.pack("ii", rows, cols))
            f.write(mask.tobytes(order="F"))
        _run(
            ["export", "Wout.bin", "-o", "mq_in.nmfz", "--block-cols", "350",
             "--max-iter", "30", "--thresh", "0", "--backend", "jnp",
             "--x-dtype", "int8", "--masked"], d,
        )
        _run(
            ["export", "Wout.bin", "-o", "mq_host.nmfz", "--block-cols",
             "350", "--max-iter", "30", "--thresh", "0", "--backend", "jnp",
             "--x-dtype", "int8", "--masked", "--quantized-input"], d,
        )
        r_mi = step(
            "serve-masked-int8-inprogram",
            ["serve", "mq_in.nmfz", "X.bin", "-o", "Hmi.bin",
             "--mask", "mask.bin"],
            outputs=["Hmi.bin"],
        )
        r_mh = step(
            "serve-masked-int8-quantized-stream",
            ["serve", "mq_host.nmfz", "X.bin", "-o", "Hmh.bin",
             "--mask", "mask.bin", "--out-of-core"],
            outputs=["Hmh.bin"],
        )
        masked_match = r_mh["Hmh.bin"]["md5"] == r_mi["Hmi.bin"]["md5"]
        art["serve_masked_quantized_stream_equals_in_program"] = masked_match
        art["ok"] &= masked_match

        # 7d. row-block scale table (x_quant_rows, format v4 with a 2-D
        # scales input — the round-4 composition closing the serving
        # matrix): the streamed host-quantized masked serve must be
        # md5-identical to the in-memory in-program one, and must DIFFER
        # from the per-column-scales result of 7c (block peaks != column
        # peaks on random data — proof the 2-D table was actually read,
        # same discipline as tests/test_quant_rowblocks.py::test_mesh_*)
        _run(
            ["export", "Wout.bin", "-o", "rb_in.nmfz", "--block-cols", "350",
             "--max-iter", "30", "--thresh", "0", "--backend", "jnp",
             "--x-dtype", "int8", "--x-quant-rows", "64", "--masked"], d,
        )
        _run(
            ["export", "Wout.bin", "-o", "rb_host.nmfz", "--block-cols",
             "350", "--max-iter", "30", "--thresh", "0", "--backend", "jnp",
             "--x-dtype", "int8", "--x-quant-rows", "64", "--masked",
             "--quantized-input"], d,
        )
        r_ri = step(
            "serve-rowblock-int8-inprogram",
            ["serve", "rb_in.nmfz", "X.bin", "-o", "Hri.bin",
             "--mask", "mask.bin"],
            outputs=["Hri.bin"],
        )
        r_rh = step(
            "serve-rowblock-int8-quantized-stream",
            ["serve", "rb_host.nmfz", "X.bin", "-o", "Hrh.bin",
             "--mask", "mask.bin", "--out-of-core"],
            outputs=["Hrh.bin"],
        )
        rb_match = r_rh["Hrh.bin"]["md5"] == r_ri["Hri.bin"]["md5"]
        art["serve_rowblock_scales_stream_equals_in_program"] = rb_match
        rb_read = r_ri["Hri.bin"]["md5"] != r_mi["Hmi.bin"]["md5"]
        art["rowblock_scales_differ_from_per_column"] = rb_read
        art["ok"] &= rb_match and rb_read

        # 8. rank selection: consensus-stability study picks a rank and
        # writes its best factors (one batched sweep on the device)
        r_sel = step(
            "select-stability",
            ["select", "X.bin", "--ranks", "4,8", "--stability",
             "--restarts", "3", "--max-iter", str(max(10, iters // 5)),
             "-o", "Wsel.bin", "Hsel.bin"],
            outputs=["Wsel.bin", "Hsel.bin"],
        )
        sel_rank = r_sel["Wsel.bin"]["shape"][1]
        sel_ok = sel_rank in (4, 8) and r_sel["Hsel.bin"]["shape"][0] == sel_rank
        art["select_recommended_rank"] = sel_rank
        art["ok"] &= sel_ok

    with open(args.out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({"artifact": "e2e_cli", "ok": art["ok"],
                      "out": args.out, "device": art.get("device")}))
    return 0 if art["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
