"""Command-line interface.

The reference binary hard-codes everything: paths ``../X.bin ../H.bin
../W.bin`` -> ``../Wout.bin ../Hout.bin`` and compile-time iteration macros
(nmf.cu:9-11, 37-45).  This CLI exposes the same pipeline with real flags,
the reference values as defaults, plus the subsystems the reference lacked
(convergence, checkpointing, metrics, mesh sharding, init strategies).

    python -m nmf_tpu run X.bin W.bin H.bin -o Wout.bin Hout.bin
    python -m nmf_tpu run X.bin --rank 128 --init nndsvda --thresh 1e-4
    python -m nmf_tpu gen ./fixtures          # seed-0 reference fixtures
    python -m nmf_tpu info X.bin              # header/stats of a .bin file
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from .io import binio, fixtures
from .models import init as init_mod
from .utils.config import Precision, SolveConfig
from .utils.metrics import MetricsLogger


def _add_solver_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--max-iter", type=int, default=200, help="MAX_ITER (nmf.cu:10)")
    p.add_argument(
        "--thresh",
        type=float,
        default=0.0,
        help="relative cost-change convergence threshold; 0 = exactly max-iter "
        "iterations (CONVERGE_THRESH, nmf.cu:11)",
    )
    p.add_argument(
        "--check-every", type=int, default=25, help="ITER_CHECK (nmf.cu:9)"
    )
    p.add_argument("--beta", type=float, default=1.0, help="beta-divergence (1=KL)")
    p.add_argument(
        "--algorithm",
        choices=["mu", "hals"],
        default="mu",
        help="mu = multiplicative updates (reference); hals = Frobenius "
        "coordinate descent (requires --beta 2)",
    )
    p.add_argument(
        "--accelerate",
        action="store_true",
        help="safeguarded Nesterov-extrapolated updates: 4-6x fewer "
        "iterations to the same converged cost; every check block is "
        "accepted only if the cost did not increase (monotone by "
        "construction), else redone with plain updates",
    )
    p.add_argument("--l1-w", type=float, default=0.0, help="L1 penalty on W")
    p.add_argument("--l1-h", type=float, default=0.0, help="L1 penalty on H")
    p.add_argument("--l2-w", type=float, default=0.0, help="L2 penalty on W")
    p.add_argument("--l2-h", type=float, default=0.0, help="L2 penalty on H")
    p.add_argument(
        "--dtype",
        choices=["float32", "float32_fast", "bfloat16"],
        default="float32",
        help="update-GEMM precision: float32 = exact (reference parity), "
        "float32_fast = 3-pass bf16 split-float (~1e-7 accuracy, ~2-3x "
        "faster on TPU), bfloat16 = full-rate MXU (accumulation is always "
        "float32)",
    )
    p.add_argument(
        "--x-dtype",
        choices=["float32", "bfloat16", "int8"],
        default="float32",
        help="storage dtype of X: bfloat16 halves its HBM stream; int8 "
        "quarters it (uint8 codes + per-column scales, dequantized "
        "in-register; opt-in, lossy for entries far below their column peak)",
    )
    p.add_argument(
        "--x-quant-rows",
        type=int,
        default=0,
        help="int8-X scale granularity: one scale per (N-row block, column) "
        "instead of per column — bounds each entry's error by its BLOCK's "
        "column peak/510; for data whose magnitude varies along the rows. "
        "Composes with --mesh and --out-of-core (jnp backend; "
        "--backend pallas keeps per-column scales)",
    )
    p.add_argument(
        "--backend",
        choices=["auto", "jnp", "pallas", "autotune"],
        default="auto",
    )
    p.add_argument("--no-cost", action="store_true", help="skip cost tracking")
    p.add_argument(
        "--live",
        action="store_true",
        help="stream per-check cost lines DURING the solve (async callback; "
        "restores the reference-era ITER_CHECK reporting)",
    )
    p.add_argument("--quiet", "-q", action="store_true")
    p.add_argument(
        "--validate",
        action="store_true",
        help="check inputs (finite, non-negative) and results (finite)",
    )
    p.add_argument("--jsonl", help="append run metrics to this JSONL file")
    p.add_argument(
        "--mesh",
        help="shard over a ROWSxCOLS device mesh, e.g. --mesh 4x2",
    )
    p.add_argument("--checkpoint-dir", help="checkpoint/resume directory")
    p.add_argument(
        "--checkpoint-every", type=int, default=100, help="iterations per checkpoint"
    )
    p.add_argument(
        "--out-of-core",
        action="store_true",
        help="stream X from its .bin file in column blocks (X may exceed "
        "device AND host memory); composes with --mesh and "
        "--checkpoint-dir; KL MU family only",
    )
    p.add_argument(
        "--block-n",
        type=int,
        help="columns per streamed block (default: ~256 MiB of f32)",
    )
    p.add_argument(
        "--strict-compat",
        action="store_true",
        help="replicate the reference's exact padded-EPS numerics (PAD_MULT "
        "32 buffers, clamps and sums over padded extents) for md5-grade "
        "algorithm replication; forces f32 jnp path",
    )


def _config_from(args) -> SolveConfig:
    return SolveConfig(
        max_iter=args.max_iter,
        thresh=args.thresh,
        check_every=args.check_every,
        precision=Precision(
            matmul_dtype=args.dtype,
            x_dtype=args.x_dtype,
            x_quant_rows=getattr(args, "x_quant_rows", 0),
        ),
        backend=args.backend,
        track_cost=not args.no_cost,
        live_metrics=args.live,
        beta=args.beta,
        algorithm=args.algorithm,
        l1_w=args.l1_w,
        l1_h=args.l1_h,
        l2_w=args.l2_w,
        l2_h=args.l2_h,
        accelerate=getattr(args, "accelerate", False),
    )


def _parse_mesh_shape(spec: str):
    """ROWSxCOLS (e.g. '4x2') -> (rows, cols), with a clean error for
    anything else (main() turns the ValueError into a one-line message)."""
    parts = spec.lower().split("x")
    try:
        r, c = (int(v) for v in parts)
    except ValueError:
        r = c = 0
    if len(parts) != 2 or r < 1 or c < 1:
        raise ValueError(
            f"--mesh must be ROWSxCOLS with positive factors (e.g. 4x2), "
            f"got {spec!r}"
        )
    return r, c


def _mesh_from(args):
    """The RxC device mesh named by --mesh, or None (shared by every
    command so the parse/build logic cannot drift per subcommand)."""
    if not getattr(args, "mesh", None):
        return None
    from .parallel.mesh import make_mesh

    return make_mesh(shape=_parse_mesh_shape(args.mesh))


def _x_wire_bytes_per_element(precision: Precision) -> float:
    """Bytes each X element occupies on the host->device wire (the streamed
    summary must not overstate int8/bf16 storage by quoting f32)."""
    return {"int8": 1.0, "bfloat16": 2.0}.get(precision.x_dtype, 4.0)


def _state_as_result(state, w_out, h_out):
    """Adapt a CheckpointState to the SolveResult shape that the metrics
    logger and result guards consume (the checkpointed path's stitched cost
    history plays the role of the solver's on-device history)."""
    from .models.solver import SolveResult

    hist = np.asarray(state.cost_history, dtype=np.float32)
    return SolveResult(
        w=w_out,
        h=h_out,
        iterations=np.int32(state.iteration),
        cost=hist[-1] if hist.size else np.float32("nan"),
        cost_history=hist,
        num_checks=np.int32(hist.size),
        converged=np.bool_(state.converged),
        momentum=np.float32(state.momentum),
    )


def _cmd_run_online(args) -> int:
    """run with --online: one-pass streaming dictionary learning, then an
    out-of-core transform for the activations (X streamed, never loaded)."""
    from .models.init import random_init
    from .models.online import solve_online
    from .models.streaming import BinColumnSource, transform_out_of_core

    if args.strict_compat or args.checkpoint_dir or args.mask or args.freeze:
        print(
            "error: --online composes with --mesh only (no --strict-compat "
            "/ --checkpoint-dir / --mask / --freeze)",
            file=sys.stderr,
        )
        return 2
    mesh = _mesh_from(args)
    if not (0.0 < args.online_rho <= 1.0):
        print(
            f"error: --online-rho must be in (0, 1], got {args.online_rho}",
            file=sys.stderr,
        )
        return 2
    if args.online_passes < 1 or args.online_inner_iters < 1:
        print(
            "error: --online-passes and --online-inner-iters must be >= 1",
            file=sys.stderr,
        )
        return 2
    if args.rank and args.init != "random" and not (args.W or args.H):
        print(
            "error: --online streams X (global statistics for "
            f"--init {args.init} are unavailable); use --init random or "
            "provide a W init file",
            file=sys.stderr,
        )
        return 2
    if args.W or args.H:
        w0 = binio.read_matrix(args.W) if args.W else None
        if w0 is None or args.H:
            print(
                "error: --online takes an optional W init only (H is "
                "produced by the post-pass transform)",
                file=sys.stderr,
            )
            return 2
    elif args.rank:
        src = BinColumnSource(args.X)
        m, _ = src.shape
        w0, _ = random_init(m, args.rank, 1, seed=args.seed)
    else:
        print("error: provide a W init or --rank", file=sys.stderr)
        return 2
    config = _config_from(args)
    logger = MetricsLogger(verbose=not args.quiet, jsonl_path=args.jsonl)
    with logger.timed() as t:
        res = solve_online(
            args.X, w0, config, block_n=args.block_n,
            inner_iters=args.online_inner_iters, rho=args.online_rho,
            passes=args.online_passes, seed=args.seed, mesh=mesh,
        )
        tr = transform_out_of_core(
            args.X, res.w, config=config, block_n=args.block_n,
            seed=args.seed, mesh=mesh,
        )
    if args.validate:
        from .utils.guards import validate_input

        validate_input("W", res.w)
        validate_input("H", tr.h)
    logger.report_raw(
        {
            "mode": "online",
            "shape": list(BinColumnSource(args.X).shape),
            "rank": int(res.w.shape[1]),
            "passes": res.passes,
            "blocks": len(res.blocks),
            "pass_cost_sums": [round(sum(p), 6) for p in res.block_costs],
            "transform_cost": float(tr.cost),
            "seconds": t.seconds,
        }
    )
    w_path, h_path = args.output
    binio.write_matrix(res.w, w_path)
    binio.write_matrix(tr.h, h_path)
    if not args.quiet:
        print(
            f"[nmf] online: wrote {w_path}, {h_path}",
            file=sys.stderr,
        )
    return 0


def _cmd_run_out_of_core(args) -> int:
    """run with --out-of-core: X streamed from its .bin, never fully loaded."""
    from .models.streaming import BinColumnSource, solve_out_of_core

    if args.strict_compat:
        print(
            "error: --strict-compat (padded-EPS replication) requires the "
            "in-memory solver; drop --out-of-core",
            file=sys.stderr,
        )
        return 2
    source = BinColumnSource(args.X)
    m, n = source.shape
    if bool(args.W) != bool(args.H):
        print(
            "error: provide BOTH initial W and H files, or neither plus "
            "--rank (a lone init file would otherwise be silently ignored)",
            file=sys.stderr,
        )
        return 2
    if args.W and args.H:
        w0 = binio.read_matrix(args.W)
        h0 = binio.read_matrix(args.H)
    elif args.rank:
        if args.init != "random":
            print(
                "error: --out-of-core init must be 'random' or explicit W/H "
                "files (other inits read all of X)",
                file=sys.stderr,
            )
            return 2
        w0, h0 = init_mod.random_init(m, args.rank, n, seed=args.seed)
    else:
        print("error: provide W and H files, or --rank", file=sys.stderr)
        return 2
    mesh = _mesh_from(args)
    config = _config_from(args)
    mask_source = None
    if args.mask:
        mask_source = BinColumnSource(args.mask)
    logger = MetricsLogger(verbose=not args.quiet, jsonl_path=args.jsonl)
    with logger.timed() as t:
        res = solve_out_of_core(
            source, w0, h0, config, block_n=args.block_n,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every,
            mesh=mesh,
            mask=mask_source,
            n_frozen=args.freeze,
        )
    logger.report(res, (m, n), t.seconds, check_every=config.check_every)
    if args.validate:
        from .utils.guards import validate_result

        validate_result(res)
    w_path, h_path = args.output
    binio.write_matrix(np.asarray(res.w), w_path)
    binio.write_matrix(np.asarray(res.h), h_path)
    if not args.quiet:
        gb = m * n * _x_wire_bytes_per_element(config.precision) / 1e9
        print(
            f"[nmf] out-of-core: streamed {m}x{n} X "
            f"({gb:.2f} GB as {config.precision.x_dtype}) per iteration; "
            f"wrote {w_path}, {h_path}",
            file=sys.stderr,
        )
    return 0


def cmd_run(args) -> int:
    if args.restarts > 1 and (args.out_of_core or args.online):
        print(
            "error: --restarts batches whole in-memory solves "
            "(no --out-of-core / --online)",
            file=sys.stderr,
        )
        return 2
    if args.online and args.out_of_core:
        print(
            "error: pick one streaming mode — --out-of-core (full "
            "alternating solve, one X stream per iteration) or --online "
            "(one-pass dictionary learning)",
            file=sys.stderr,
        )
        return 2
    if args.online:
        return _cmd_run_online(args)
    if args.out_of_core:
        return _cmd_run_out_of_core(args)
    x = binio.read_matrix(args.X)
    if bool(args.W) != bool(args.H):
        print(
            "error: provide BOTH initial W and H files, or neither plus "
            "--rank (a lone init file would otherwise be silently ignored)",
            file=sys.stderr,
        )
        return 2
    if args.W and args.H:
        w0 = binio.read_matrix(args.W)
        h0 = binio.read_matrix(args.H)
    elif args.rank:
        if args.restarts > 1:
            # solve_restarts generates its own per-member seeded inits; an
            # up-front init here (nndsvd = a full SVD of X) is discarded work
            w0 = h0 = None
        else:
            m, n = x.shape
            if args.init == "random":
                w0, h0 = init_mod.random_init(m, args.rank, n, seed=args.seed)
            elif args.init == "scaled":
                w0, h0 = init_mod.scaled_random_init(x, args.rank, seed=args.seed)
            else:
                w0, h0 = init_mod.nndsvd_init(
                    x, args.rank, variant=args.init, seed=args.seed
                )
    else:
        print("error: provide W and H files, or --rank for generated init", file=sys.stderr)
        return 2

    config = _config_from(args)
    logger = MetricsLogger(verbose=not args.quiet, jsonl_path=args.jsonl)

    mask = None
    if args.mask:
        mask = binio.read_matrix(args.mask)
        if mask.shape != x.shape:
            print(
                f"error: mask shape {mask.shape} != X shape {x.shape}",
                file=sys.stderr,
            )
            return 2
        if args.strict_compat or args.checkpoint_dir:
            print(
                "error: --mask runs the masked solver (no --strict-compat / "
                "--checkpoint-dir; use --out-of-core for resumable masked runs)",
                file=sys.stderr,
            )
            return 2

    if args.validate:
        from .utils.guards import validate_input

        validate_input("X", x)
        if w0 is not None:  # --restarts generates inits later
            validate_input("W0", w0)
            validate_input("H0", h0)

    mesh = _mesh_from(args)

    if args.freeze and (args.strict_compat or args.checkpoint_dir):
        print(
            "error: --freeze composes with the plain / --mesh / "
            "--out-of-core solvers only",
            file=sys.stderr,
        )
        return 2
    if args.restarts > 1:
        if not args.rank or args.W or args.H:
            print(
                "error: --restarts generates its own seeded inits; use "
                "--rank (not W/H files)",
                file=sys.stderr,
            )
            return 2
        if args.strict_compat or args.checkpoint_dir or mask is not None or args.freeze:
            print(
                "error: --restarts composes with --mesh only (no "
                "--strict-compat / --checkpoint-dir / --mask / --freeze)",
                file=sys.stderr,
            )
            return 2
        from .models.selection import solve_restarts
        from .models.solver import SolveResult

        if mesh is not None:
            # restarts are pure data parallelism over members: flatten the
            # RxC mesh into one batch axis so every device holds members
            from jax.sharding import Mesh

            n_dev = int(np.prod(list(mesh.shape.values())))
            # flatten the devices of the ACTUAL mesh (not jax.devices()[:n]):
            # the two only coincide while make_mesh slices jax.devices()
            mesh = Mesh(np.asarray(list(mesh.devices.flat)), ("b",))
            if args.restarts % n_dev:
                print(
                    f"error: --restarts {args.restarts} must be a multiple "
                    f"of the mesh device count {n_dev}",
                    file=sys.stderr,
                )
                return 2
        # deterministic nndsvd variants would make identical members
        init = args.init if args.init in ("random", "scaled", "nndsvdar") else "scaled"
        if init != args.init and not args.quiet:
            print(
                f"[nmf] --init {args.init} is deterministic (identical "
                f"restart members); using 'scaled' with per-member seeds",
                file=sys.stderr,
            )
        with logger.timed() as t:
            sel = solve_restarts(
                x, rank=args.rank, n_restarts=args.restarts, config=config,
                seed=args.seed, init=init, mesh=mesh,
            )
        b = sel.best_index
        w_b, h_b = sel.best
        import dataclasses as _dc

        res = _dc.replace(sel.best_solve_result(), w=w_b, h=h_b)
        logger.report(res, x.shape, t.seconds, check_every=config.check_every)
        if args.validate:
            from .utils.guards import validate_result

            validate_result(res)
        if not args.quiet:
            costs = ", ".join(f"{c:.6g}" for c in sel.costs)
            print(
                f"[nmf] {args.restarts} restarts (seeds {args.seed}.."
                f"{args.seed + args.restarts - 1}): costs [{costs}]; "
                f"kept #{b}",
                file=sys.stderr,
            )
        w_out, h_out = np.asarray(res.w), np.asarray(res.h)
    elif args.strict_compat:
        if mesh is not None or args.checkpoint_dir:
            print(
                "error: --strict-compat is a single-device exact-replication "
                "mode (no --mesh / --checkpoint-dir)",
                file=sys.stderr,
            )
            return 2
        from .models.strict import solve_strict

        try:
            with logger.timed() as t:
                res = solve_strict(x, w0, h0, config)
        except ValueError as e:
            # e.g. --accelerate / --algorithm hals / --beta / penalties:
            # strict mode replicates exactly one algorithm
            print(f"error: {e}", file=sys.stderr)
            return 2
        logger.report(res, x.shape, t.seconds, check_every=config.check_every)
        if args.validate:
            from .utils.guards import validate_result

            validate_result(res)
        w_out, h_out = np.asarray(res.w), np.asarray(res.h)
    elif args.checkpoint_dir:
        from .utils.checkpoint import solve_with_checkpoints

        with logger.timed() as t:
            state = solve_with_checkpoints(
                x, w0, h0, config, args.checkpoint_dir,
                every=args.checkpoint_every, mesh=mesh,
            )
        w_out, h_out = np.asarray(state.w), np.asarray(state.h)
        # mirror the non-checkpointed branch: metrics/JSONL report + guards
        res_like = _state_as_result(state, w_out, h_out)
        logger.report(
            res_like, x.shape, t.seconds,
            check_every=config.check_every,
            check_iterations=state.check_iterations,
        )
        if args.validate:
            from .utils.guards import validate_result

            validate_result(res_like)
        if not args.quiet:
            print(
                f"[nmf] checkpointed run: {state.iteration} iters, "
                f"converged={state.converged}, {t.seconds:.2f}s",
                file=sys.stderr,
            )
    else:
        if mask is not None:
            if args.freeze:
                print(
                    "error: --freeze is not implemented for masked solves",
                    file=sys.stderr,
                )
                return 2
            from .models.masked import solve_masked

            with logger.timed() as t:
                res = solve_masked(x, w0, h0, mask, config, mesh=mesh)
        elif args.freeze:
            from .models.semi import solve_semi

            with logger.timed() as t:
                res = solve_semi(
                    x, w0, h0, config, n_frozen=args.freeze, mesh=mesh
                )
        elif mesh is not None:
            from .parallel.sharded import solve_sharded

            with logger.timed() as t:
                res = solve_sharded(x, w0, h0, config, mesh=mesh)
        else:
            from .models.solver import solve

            with logger.timed() as t:
                res = solve(x, w0, h0, config)
        logger.report(res, x.shape, t.seconds, check_every=config.check_every)
        if args.validate:
            from .utils.guards import validate_result

            validate_result(res)
        w_out, h_out = np.asarray(res.w), np.asarray(res.h)

    w_path, h_path = args.output
    binio.write_matrix(w_out, w_path)
    binio.write_matrix(h_out, h_path)
    if not args.quiet:
        print(f"[nmf] wrote {w_path} {w_out.shape}, {h_path} {h_out.shape}", file=sys.stderr)
    return 0


def cmd_transform(args) -> int:
    """H-only inference: solve H for X against a FIXED (learned) W."""
    # reject accepted-but-unimplemented solver flags instead of silently
    # ignoring them (a checkpoint-less multi-day run is a data-loss trap)
    if getattr(args, "checkpoint_dir", None):
        print(
            "error: transform does not checkpoint (each streamed block is "
            "solved in one visit; re-running re-does only unfinished work)",
            file=sys.stderr,
        )
        return 2
    if getattr(args, "strict_compat", False):
        print(
            "error: --strict-compat is a full-solve replication mode "
            "(use 'run')",
            file=sys.stderr,
        )
        return 2
    config = _config_from(args)
    w = binio.read_matrix(args.W)
    h0 = binio.read_matrix(args.h0) if args.h0 else None
    mesh = _mesh_from(args)
    logger = MetricsLogger(verbose=not args.quiet, jsonl_path=args.jsonl)
    if args.mask and args.out_of_core:
        print(
            "error: masked transforms are in-memory (load the observed "
            "columns; drop --out-of-core)",
            file=sys.stderr,
        )
        return 2
    if args.out_of_core:
        from .models.streaming import transform_out_of_core

        with logger.timed() as t:
            res = transform_out_of_core(
                args.X, w, h0=h0, config=config, block_n=args.block_n,
                mesh=mesh, seed=args.seed,
            )
        h_out = res.h
        if args.validate:
            from .utils.guards import validate_input

            validate_input("H", h_out)
            if config.track_cost and not np.isfinite(res.cost):
                print("error: non-finite transform cost", file=sys.stderr)
                return 1
        if not args.quiet:
            print(
                f"[nmf] transform (out-of-core): {len(res.blocks)} blocks, "
                f"iters/block min {res.iterations.min()} max "
                f"{res.iterations.max()}, cost {res.cost:.6g}, "
                f"{t.seconds:.2f}s",
                file=sys.stderr,
            )
    else:
        # one shared in-memory scaffold; only the solve call differs by mask
        x = binio.read_matrix(args.X)
        if h0 is None:
            rng = np.random.RandomState(args.seed)
            h0 = rng.rand(w.shape[1], x.shape[1]).astype(np.float32)
        with logger.timed() as t:
            if args.mask:
                from .models.masked import solve_masked_h_only

                mask = binio.read_matrix(args.mask)
                res = solve_masked_h_only(x, w, h0, mask, config, mesh=mesh)
            else:
                from .models.nmf import solve_h_only

                res = solve_h_only(x, w, h0, config, mesh=mesh)
        logger.report(res, x.shape, t.seconds, check_every=config.check_every)
        if args.validate:
            from .utils.guards import validate_result

            validate_result(res)
        h_out = np.asarray(res.h)
    binio.write_matrix(h_out, args.output)
    if not args.quiet:
        print(f"[nmf] wrote {args.output} {h_out.shape}", file=sys.stderr)
    return 0


def cmd_export(args) -> int:
    """Package W + the transform program into a .nmfz serving artifact."""
    for flag, name in (
        (getattr(args, "out_of_core", False), "--out-of-core"),
        (getattr(args, "checkpoint_dir", None), "--checkpoint-dir"),
        (getattr(args, "live", False), "--live"),
        (getattr(args, "strict_compat", False), "--strict-compat"),
        # --block-n is the STREAMING block flag; the artifact's width is
        # --block-cols — accepting both silently would let the near-identical
        # name set nothing
        (getattr(args, "block_n", None), "--block-n"),
        (getattr(args, "jsonl", None), "--jsonl"),
    ):
        if flag:
            print(
                f"error: {name} does not apply to an exported program "
                "(the artifact is a fixed-shape solve; stream on the "
                "serving side by calling it per block)",
                file=sys.stderr,
            )
            return 2
    config = _config_from(args)
    from .serving import save_transform

    # --mesh RxC here means: bake the DISTRIBUTED shard_map solver into the
    # artifact (traced over an AbstractMesh — no devices needed to export)
    mesh_shape = _parse_mesh_shape(args.mesh) if args.mesh else None
    w = binio.read_matrix(args.W)
    if args.validate:
        from .utils.guards import validate_input

        validate_input("W", w)
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    try:
        save_transform(
            args.output, w, args.block_cols, config, platforms,
            mesh_shape=mesh_shape, masked=args.masked,
            quantized_input=args.quantized_input,
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    if not args.quiet:
        size = os.path.getsize(args.output)
        mesh_note = f", mesh {args.mesh}" if mesh_shape else ""
        mask_note = ", masked" if args.masked else ""
        quant_note = ", quantized-input" if args.quantized_input else ""
        print(
            f"[nmf] exported {args.output}: W {w.shape[0]}x{w.shape[1]}, "
            f"block {args.block_cols} cols, platforms {','.join(platforms)}"
            f"{mesh_note}{mask_note}{quant_note}, {size} bytes",
            file=sys.stderr,
        )
    return 0


def cmd_serve(args) -> int:
    """Transform new data against an exported artifact (no retracing)."""
    from .serving import load_transform

    mesh = _mesh_from(args)
    t = load_transform(args.artifact, mesh=mesh)
    h0 = binio.read_matrix(args.h0) if args.h0 else None
    t0 = time.perf_counter()
    prefetch = not args.no_prefetch
    if args.out_of_core:
        # X (and a mask, for masked artifacts) streamed off disk block by
        # block, H appended block by block — host memory stays at one
        # block regardless of N
        res = t.stream_bin(
            args.X, out_path=args.output, h0=h0, seed=args.seed,
            prefetch=prefetch, mask_path=args.mask or None,
        )
        n_cols, shape = None, None
    else:
        x = binio.read_matrix(args.X)
        mask = binio.read_matrix(args.mask) if args.mask else None
        res = t(x, h0=h0, seed=args.seed, prefetch=prefetch, mask=mask)
        n_cols, shape = x.shape[1], res.h.shape
        binio.write_matrix(res.h, args.output)
    dt = time.perf_counter() - t0
    if not args.quiet:
        n_note = f"{n_cols} cols in " if n_cols is not None else ""
        print(
            f"[nmf] serve: {n_note}"
            f"{len(res.block_iterations)} blocks of {res.n_block}, "
            f"iters/block max {res.iterations}, cost {res.cost:.6g}, "
            f"{dt:.2f}s",
            file=sys.stderr,
        )
        shape_note = f" {shape}" if shape is not None else " (streamed)"
        print(f"[nmf] wrote {args.output}{shape_note}", file=sys.stderr)
    return 0


def cmd_separate(args) -> int:
    """The paper's application: separate audio into spectral sources."""
    # reject accepted-but-unimplemented solver flags instead of silently
    # ignoring them (same policy as transform/export)
    for flag, name in (
        (getattr(args, "checkpoint_dir", None), "--checkpoint-dir"),
        (getattr(args, "out_of_core", False), "--out-of-core"),
        (getattr(args, "strict_compat", False), "--strict-compat"),
        (getattr(args, "mesh", None), "--mesh"),
        (getattr(args, "block_n", None), "--block-n"),
    ):
        if flag:
            print(
                f"error: {name} does not apply to 'separate' (it runs an "
                "in-memory spectrogram factorization; factorize the "
                "spectrogram .bin with 'run' for those modes)",
                file=sys.stderr,
            )
            return 2
    from scipy.io import wavfile

    from .models.separation import separate

    sr, audio = wavfile.read(args.audio)
    if audio.dtype.kind == "i":
        audio = audio.astype(np.float32) / np.iinfo(audio.dtype).max
    elif audio.dtype.kind == "u":  # 8-bit WAV is unsigned with a 128 offset
        info = np.iinfo(audio.dtype)
        audio = (audio.astype(np.float32) - (info.max + 1) / 2) / ((info.max + 1) / 2)
    if audio.ndim == 2:
        audio = audio.mean(axis=1)  # downmix to mono
    audio = audio.astype(np.float32)

    config = _config_from(args)
    logger = MetricsLogger(verbose=not args.quiet, jsonl_path=args.jsonl)
    with logger.timed() as t:
        res = separate(
            audio,
            n_components=args.rank,
            n_fft=args.n_fft,
            hop=args.hop,
            config=config,
            seed=args.seed,
            n_restarts=args.restarts,
        )
    if args.validate:
        from .utils.guards import validate_result

        validate_result(res.solve_result)
        if not np.all(np.isfinite(res.sources)):
            print("error: non-finite separated sources", file=sys.stderr)
            return 1
    if args.jsonl:
        logger.report_raw(
            {
                "kind": "separate",
                "audio": args.audio,
                "rank": int(args.rank),
                "n_fft": int(args.n_fft),
                "hop": int(args.hop),
                "restarts": int(args.restarts),
                "iterations": int(res.solve_result.iterations),
                "cost": float(res.solve_result.cost),
                "seconds": t.seconds,
            }
        )
    import os

    os.makedirs(args.out_dir, exist_ok=True)
    peak = max(float(np.abs(res.sources).max()), 1e-9)
    for k_i, src in enumerate(res.sources):
        path = os.path.join(args.out_dir, f"source_{k_i:03d}.wav")
        wavfile.write(path, sr, (src / peak * 32767).astype(np.int16))
    if not args.quiet:
        print(
            f"[nmf] separated {args.audio} into {args.rank} sources in "
            f"{args.out_dir} ({int(res.solve_result.iterations)} iters, "
            f"cost {float(res.solve_result.cost):.4e}, {t.seconds:.2f}s)",
            file=sys.stderr,
        )
    return 0


def _parse_ranks(spec: str):
    """'8,16,32' or 'START:STOP:STEP' (stop inclusive) -> sorted rank list."""
    try:
        if ":" in spec:
            parts = [int(v) for v in spec.split(":")]
            if len(parts) == 2:
                parts.append(1)
            start, stop, step = parts
            ranks = list(range(start, stop + 1, step))
        else:
            ranks = [int(v) for v in spec.split(",")]
    except ValueError:
        ranks = []
    if not ranks or any(r < 1 for r in ranks):
        raise ValueError(
            f"--ranks must be a comma list ('8,16,32') or START:STOP:STEP "
            f"('4:40:4', stop inclusive) of positive ranks, got {spec!r}"
        )
    return sorted(set(ranks))


def cmd_select(args) -> int:
    """Rank selection: sweep candidate ranks in ONE compiled batch; with
    --stability, Brunet consensus clustering recommends the rank."""
    for flag, name in (
        (getattr(args, "checkpoint_dir", None), "--checkpoint-dir"),
        (getattr(args, "out_of_core", False), "--out-of-core"),
        (getattr(args, "strict_compat", False), "--strict-compat"),
        (getattr(args, "block_n", None), "--block-n"),
    ):
        if flag:
            print(
                f"error: {name} is not supported for rank selection (the "
                "sweep is one in-memory batched solve)",
                file=sys.stderr,
            )
            return 2
    from .models.selection import solve_rank_sweep

    x = binio.read_matrix(args.X)
    if args.validate:
        from .utils.guards import validate_input

        validate_input("X", x)
    config = _config_from(args)
    mesh2d = _mesh_from(args)
    mesh = None
    if mesh2d is not None:
        # the member axis is pure data parallelism: flatten RxC to use all
        # r*c devices (same policy as batch/restart runs)
        from jax.sharding import Mesh as _Mesh

        mesh = _Mesh(np.asarray(list(mesh2d.devices.flat)), ("members",))
    ranks = _parse_ranks(args.ranks)
    restarts = args.restarts
    if args.stability:
        from .models.stability import rank_stability

        restarts = 4 if restarts is None else restarts
        st = rank_stability(
            x, ranks, n_restarts=restarts, config=config,
            seed=args.seed, init=args.init, mesh=mesh,
        )
        sel, member_ranks = st.sweep, np.asarray(st.sweep.ranks)
        rec = st.best_rank()
    else:
        restarts = 1 if restarts is None else restarts
        if restarts < 1:
            raise ValueError(f"--restarts must be >= 1, got {restarts}")
        members = [r for r in ranks for _ in range(restarts)]
        sel = solve_rank_sweep(
            x, members, config, seed=args.seed, init=args.init, mesh=mesh,
        )
        member_ranks = np.asarray(sel.ranks)
        st, rec = None, None

    costs = np.asarray(sel.costs, np.float64)
    per_rank = {
        r: float(np.min(costs[member_ranks == r])) for r in ranks
    }
    if not args.quiet:
        hdr = f"{'rank':>6s} {'best cost':>14s}"
        if st is not None:
            hdr += f" {'cophenetic':>11s} {'dispersion':>11s}"
        print(hdr, file=sys.stderr)
        for i, r in enumerate(ranks):
            line = f"{r:6d} {per_rank[r]:14.6g}"
            if st is not None:
                line += f" {st.cophenetic[i]:11.4f} {st.dispersion[i]:11.4f}"
            print(line, file=sys.stderr)
        if st is not None:
            print(
                f"[nmf] recommended rank (Brunet first-drop): {rec}",
                file=sys.stderr,
            )
        else:
            print(
                "[nmf] note: the divergence decreases monotonically with "
                "rank — use --stability for a principled recommendation",
                file=sys.stderr,
            )
    if args.jsonl:
        import json as _json

        with open(args.jsonl, "a") as f:
            f.write(_json.dumps({
                "command": "select",
                "ranks": ranks,
                "restarts": restarts,
                "best_cost_per_rank": per_rank,
                "cophenetic": (
                    [float(v) for v in st.cophenetic] if st is not None else None
                ),
                "recommended_rank": rec,
            }) + "\n")
    if args.output:
        if rec is None and len(ranks) > 1:
            print(
                "error: -o needs one rank to write — pass --stability (the "
                "recommendation picks it) or a single --ranks value",
                file=sys.stderr,
            )
            return 2
        target = rec if rec is not None else ranks[0]
        at_rank = np.nonzero(member_ranks == target)[0]
        best_i = int(at_rank[np.argmin(costs[at_rank])])
        w_b, h_b = sel.factors(best_i)
        binio.write_matrix(np.asarray(w_b), args.output[0])
        binio.write_matrix(np.asarray(h_b), args.output[1])
        if not args.quiet:
            print(
                f"[nmf] wrote {args.output[0]} ({w_b.shape[0]}, "
                f"{w_b.shape[1]}), {args.output[1]} ({h_b.shape[0]}, "
                f"{h_b.shape[1]}) at rank {target}",
                file=sys.stderr,
            )
    return 0


def cmd_batch(args) -> int:
    """Factorize every .bin matrix in a directory as one batched solve."""
    import os

    from .io.dataset import BinDataset
    from .parallel.batched import solve_batched

    for flag, name in (
        (args.checkpoint_dir, "--checkpoint-dir"),
        (getattr(args, "out_of_core", False), "--out-of-core"),
        (getattr(args, "strict_compat", False), "--strict-compat"),
        (getattr(args, "block_n", None), "--block-n"),
    ):
        if flag:
            print(
                f"error: {name} is not supported for batch runs (the batch "
                "is one in-memory vmapped solve)",
                file=sys.stderr,
            )
            return 2
    ds = BinDataset(args.directory)
    xs = ds.load_batch()
    b, m, n = xs.shape
    if args.validate:
        from .utils.guards import validate_input

        validate_input("X batch", xs)
    rng = np.random.RandomState(args.seed)
    ws = rng.rand(b, m, args.rank).astype(np.float32)
    hs = rng.rand(b, args.rank, n).astype(np.float32)

    mesh = None
    if args.mesh:
        # --mesh RxC here means pure data parallelism over the batch: ALL
        # r*c devices form one flat batch axis (the product, not just R)
        from jax.sharding import Mesh as _Mesh

        base = _mesh_from(args)
        n_dev = int(base.devices.size)
        if b % n_dev:
            print(
                f"error: batch of {b} matrices must be a multiple of the "
                f"mesh device count {n_dev}",
                file=sys.stderr,
            )
            return 2
        mesh = _Mesh(np.asarray(list(base.devices.flat)), ("batch",))

    config = _config_from(args)
    logger = MetricsLogger(verbose=not args.quiet, jsonl_path=args.jsonl)
    with logger.timed() as t:
        res = solve_batched(xs, ws, hs, config, mesh=mesh)
    os.makedirs(args.out_dir, exist_ok=True)
    for i, path in enumerate(ds.paths):
        stem = os.path.splitext(os.path.basename(path))[0]
        binio.write_matrix(np.asarray(res.w[i]), os.path.join(args.out_dir, f"{stem}.W.bin"))
        binio.write_matrix(np.asarray(res.h[i]), os.path.join(args.out_dir, f"{stem}.H.bin"))
    costs = np.asarray(res.cost)
    if args.jsonl:
        logger.report_raw(
            {
                "kind": "batch",
                "batch": int(b),
                "shape": [int(m), int(n)],
                "rank": int(args.rank),
                "seconds": t.seconds,
                "median_cost": float(np.median(costs)),
                "iterations": np.asarray(res.iterations).tolist(),
            }
        )
    if not args.quiet:
        print(
            f"[nmf] batch of {b} ({m}x{n}, rank {args.rank}): "
            f"{t.seconds:.2f}s, median cost {np.median(costs):.4e}, "
            f"outputs in {args.out_dir}",
            file=sys.stderr,
        )
    return 0


def cmd_gen(args) -> int:
    paths = fixtures.write_reference_fixtures(args.directory)
    for name, path in paths.items():
        print(f"wrote {path}")
    return 0


def cmd_info(args) -> int:
    import zipfile

    for path in args.files:
        if zipfile.is_zipfile(path):
            # serving artifact: describe from meta.json without loading the
            # program (no devices / deserialization needed for 'info')
            import json as _json

            with zipfile.ZipFile(path) as zf:
                if "meta.json" not in zf.namelist():
                    # e.g. an .npz IS a zip — don't KeyError on it
                    print(f"{path}: zip, but not an nmf_tpu serving artifact")
                    continue
                meta = _json.loads(zf.read("meta.json"))
            if meta.get("magic") != "nmf_tpu-serving":
                print(f"{path}: zip, but not an nmf_tpu serving artifact")
                continue
            cfg = meta.get("config", {})
            mesh = meta.get("mesh_shape")
            mesh_s = f", mesh {mesh[0]}x{mesh[1]}" if mesh else ""
            if meta.get("masked"):
                mesh_s += ", masked (serve needs --mask)"
            if meta.get("quantized_input"):
                mesh_s += ", quantized-input (host int8 quantization)"
            print(
                f"{path}: serving artifact v{meta['format_version']} — "
                f"W {meta['m']}x{meta['k']}, block {meta['n_block']} cols, "
                f"platforms {','.join(meta['platforms'])}{mesh_s}, "
                f"max_iter {cfg.get('max_iter')} thresh {cfg.get('thresh')} "
                f"{cfg.get('algorithm')}/beta={cfg.get('beta')}, "
                f"jax {meta.get('jax_version')}"
            )
            continue
        a = binio.read_matrix(path)
        print(
            f"{path}: {a.shape[0]}x{a.shape[1]} f32, "
            f"min {a.min():.6g} max {a.max():.6g} mean {a.mean():.6g}"
        )
    return 0


def cmd_doctor(args) -> int:
    """Environment diagnosis (utils/doctor.py).  Exit 0 iff a bounded
    subprocess executed a program and fetched the verified result — the
    only definition of "usable" that holds on a tunneled accelerator
    (enumeration can succeed while dispatch hangs; docs/ROUND5.md)."""
    from .utils import doctor

    plat = args.platform or os.environ.get("NMF_TPU_PLATFORM") or None
    report = doctor.diagnose(platform=plat, timeout=args.timeout)
    if args.json:
        import json as _json

        print(_json.dumps(report))
    else:
        print(doctor.format_report(report))
    return 0 if report["up"] else 1


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="nmf_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="command", required=True)

    run = sub.add_parser("run", help="factorize X ~= W @ H")
    run.add_argument("X", help="input matrix .bin")
    run.add_argument("W", nargs="?", help="initial W .bin (optional with --rank)")
    run.add_argument("H", nargs="?", help="initial H .bin (optional with --rank)")
    run.add_argument(
        "-o",
        "--output",
        nargs=2,
        metavar=("WOUT", "HOUT"),
        default=("Wout.bin", "Hout.bin"),
        help="output paths (default: Wout.bin Hout.bin, as the reference)",
    )
    run.add_argument("--rank", "-k", type=int, help="rank for generated init")
    run.add_argument(
        "--mask",
        help="observed-data mask .bin (same shape as X): masked/weighted "
        "NMF — zero entries are excluded from the objective and both "
        "updates (missing data).  KL family; composes with --l1*/--l2*, "
        "--mesh, and --out-of-core (the mask streams alongside X)",
    )
    run.add_argument(
        "--init",
        choices=["random", "scaled", "nndsvd", "nndsvda", "nndsvdar"],
        default="nndsvda",
        help="init strategy when --rank is used",
    )
    run.add_argument("--seed", type=int, default=0)
    run.add_argument(
        "--online",
        action="store_true",
        help="one-pass streaming dictionary learning over X's columns "
        "(unbounded streams; memory independent of N), then an "
        "out-of-core transform for H; see also --online-passes/--online-"
        "rho/--online-inner-iters",
    )
    run.add_argument("--online-passes", type=int, default=1)
    run.add_argument(
        "--online-rho",
        type=float,
        default=1.0,
        help="forgetting factor in (0,1]; <1 tracks distribution drift",
    )
    run.add_argument("--online-inner-iters", type=int, default=20)
    run.add_argument(
        "--freeze",
        type=int,
        default=0,
        metavar="N",
        help="keep the FIRST N dictionary columns of W fixed while the rest "
        "train (template-based fitting; order template columns first); "
        "works in-memory, with --mesh, and with --out-of-core",
    )
    run.add_argument(
        "--restarts",
        type=int,
        default=1,
        help="with --rank: solve from N seeded inits in ONE compiled batch "
        "and keep the lowest-cost factorization (NMF is non-convex); "
        "composes with --mesh (members sharded over all devices)",
    )
    _add_solver_flags(run)
    run.set_defaults(fn=cmd_run)

    tr = sub.add_parser(
        "transform",
        help="H-only inference: factor new data against a fixed W "
        "(supports --mesh and --out-of-core column streaming)",
    )
    tr.add_argument("X", help="input matrix .bin (new columns)")
    tr.add_argument("W", help="learned dictionary W .bin")
    tr.add_argument(
        "-o", "--output", default="Hout.bin", help="output H path"
    )
    tr.add_argument("--h0", help="optional warm-start H .bin")
    tr.add_argument(
        "--mask",
        help="observed-data mask .bin (same shape as X): score partially "
        "observed columns — missing entries never drive the fit",
    )
    tr.add_argument("--seed", type=int, default=0)
    _add_solver_flags(tr)
    tr.set_defaults(fn=cmd_transform)

    sep = sub.add_parser(
        "separate", help="audio source separation via spectrogram NMF"
    )
    sep.add_argument("audio", help="input WAV file")
    sep.add_argument("--rank", "-k", type=int, default=32)
    sep.add_argument("--out-dir", default="sources")
    sep.add_argument("--n-fft", type=int, default=1024)
    sep.add_argument("--hop", type=int, default=256)
    sep.add_argument("--seed", type=int, default=0)
    sep.add_argument(
        "--restarts",
        type=int,
        default=1,
        help="factorize from N seeded inits in one compiled batch and keep "
        "the lowest-divergence decomposition",
    )
    _add_solver_flags(sep)
    sep.set_defaults(fn=cmd_separate, thresh=1e-5)

    sel = sub.add_parser(
        "select",
        help="rank selection: sweep candidate ranks in one compiled batch "
        "(every member is EXACTLY the lower-rank factorization); "
        "--stability adds Brunet consensus clustering + a recommendation",
    )
    sel.add_argument("X", help="input matrix .bin")
    sel.add_argument(
        "--ranks",
        required=True,
        help="candidate ranks: comma list ('8,16,32') or START:STOP:STEP "
        "('4:40:4', stop inclusive)",
    )
    sel.add_argument(
        "--restarts",
        type=int,
        default=None,
        help="restarts per rank (default 1; with --stability 4 — a "
        "consensus needs several seeded members)",
    )
    sel.add_argument(
        "--stability",
        action="store_true",
        help="consensus-clustering study (Brunet 2004): per-rank cophenetic "
        "correlation + first-drop rank recommendation",
    )
    sel.add_argument(
        "--init",
        choices=["random", "scaled", "nndsvdar"],
        default="scaled",
        help="seed-sensitive init families only (deterministic nndsvd/"
        "nndsvda would make identical restart members)",
    )
    sel.add_argument("--seed", type=int, default=0)
    sel.add_argument(
        "-o",
        "--output",
        nargs=2,
        metavar=("WOUT", "HOUT"),
        default=None,
        help="write the best factors at the recommended rank "
        "(--stability) or at a single --ranks value",
    )
    _add_solver_flags(sel)  # --mesh here shards the member axis (flattened)
    sel.set_defaults(fn=cmd_select)

    batch = sub.add_parser(
        "batch", help="factorize a directory of .bin matrices in one batched solve"
    )
    batch.add_argument("directory", help="directory of same-shaped .bin files")
    batch.add_argument("--rank", "-k", type=int, required=True)
    batch.add_argument("--out-dir", default="batch_out")
    batch.add_argument("--seed", type=int, default=0)
    _add_solver_flags(batch)  # --mesh here means a 1-D batch-axis mesh (Nx1)
    batch.set_defaults(fn=cmd_batch)

    exp = sub.add_parser(
        "export",
        help="package W + the H-only solve program into a portable serving "
        "artifact (jax.export StableHLO; runs on TPU and CPU)",
    )
    exp.add_argument("W", help="learned dictionary W .bin")
    exp.add_argument(
        "-o", "--output", default="model.nmfz", help="artifact output path"
    )
    exp.add_argument(
        "--block-cols",
        type=int,
        default=1024,
        help="columns per exported program invocation (the artifact's "
        "static X width; serve pads the tail block)",
    )
    exp.add_argument(
        "--platforms",
        default="tpu,cpu",
        help="comma-separated jax.export lowering platforms",
    )
    exp.add_argument(
        "--masked",
        action="store_true",
        help="export the MASKED transform program (missing-data scoring): "
        "'serve' then requires --mask with the observed-entry weights",
    )
    exp.add_argument(
        "--quantized-input",
        action="store_true",
        help="int8 configs only: the program takes host-quantized "
        "(codes, scales) instead of f32 X — ~4x less serve-time transfer, "
        "bit-identical results (composes with --mesh and --masked)",
    )
    _add_solver_flags(exp)
    exp.set_defaults(fn=cmd_export)

    srv = sub.add_parser(
        "serve",
        help="H-only inference from an exported artifact: no W file, no "
        "retracing — the program and dictionary come from the .nmfz",
    )
    srv.add_argument("artifact", help=".nmfz from 'export'")
    srv.add_argument("X", help="input matrix .bin (new columns)")
    srv.add_argument(
        "-o", "--output", default="Hout.bin", help="output H path"
    )
    srv.add_argument("--h0", help="optional warm-start H .bin")
    srv.add_argument(
        "--mask",
        help="observed-entry mask .bin (same shape as X; 0 = missing) — "
        "required by artifacts exported with --masked; with --out-of-core "
        "its column blocks stream off disk alongside X's",
    )
    srv.add_argument("--seed", type=int, default=0)
    srv.add_argument(
        "--mesh",
        help="serve a mesh artifact on a ROWSxCOLS device mesh (must match "
        "the shape it was exported for; default: built from all devices)",
    )
    srv.add_argument(
        "--out-of-core",
        action="store_true",
        help="stream X from its .bin in column blocks and append H blocks "
        "to the output as they finish (X and H never load into host memory)",
    )
    srv.add_argument(
        "--no-prefetch",
        action="store_true",
        help="serve blocks strictly serially (one block's inputs+outputs "
        "on device at a time) instead of overlapping the next block's "
        "transfer with the current solve — for artifacts whose block "
        "nearly fills device memory",
    )
    srv.add_argument("--quiet", "-q", action="store_true")
    srv.set_defaults(fn=cmd_serve)

    gen = sub.add_parser("gen", help="write the seed-0 reference fixtures")
    gen.add_argument("directory")
    gen.set_defaults(fn=cmd_gen)

    info = sub.add_parser("info", help="describe .bin files")
    info.add_argument("files", nargs="+")
    info.set_defaults(fn=cmd_info)

    doc = sub.add_parser(
        "doctor",
        help="diagnose the environment: bounded backend/execute probe, "
        "compile-cache state, link bandwidth, host-callback support",
    )
    doc.add_argument(
        "--platform",
        default=None,
        help="probe this backend instead of the default chain (e.g. cpu); "
        "defaults to NMF_TPU_PLATFORM when that is set",
    )
    doc.add_argument(
        "--timeout",
        type=float,
        default=180.0,
        help="seconds before the device probe is declared hung (the probe "
        "runs in a subprocess, so a hang cannot wedge this process)",
    )
    doc.add_argument("--json", action="store_true", help="machine-readable output")
    doc.set_defaults(fn=cmd_doctor)
    return ap


def main(argv=None) -> int:
    # NMF_TPU_PLATFORM=cpu forces a backend from the environment: on this
    # platform the JAX_PLATFORMS env var is overridden by the site module,
    # and subprocess-driven tests (benchmarks/e2e_cli.py) have no other way
    # to pin the CLI to the CPU backend.
    plat = os.environ.get("NMF_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except FileNotFoundError as e:
        # the most common user error (a typoed input path) deserves a
        # one-line message, not a traceback
        print(f"error: file not found: {e.filename or e}", file=sys.stderr)
        return 2
    except (NotImplementedError, ValueError) as e:
        # unsupported feature combination or invalid argument (e.g. a
        # shape mismatch, --freeze out of range): a clean one-line error
        # beats a traceback
        print(f"error: {e}", file=sys.stderr)
        return 2


if __name__ == "__main__":
    sys.exit(main())
