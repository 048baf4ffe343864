"""Checkpoint / resume for long factorizations.

The reference has no mid-run checkpointing — its de-facto checkpoint is the
final ``write_matrix`` (nmf.cu:44-45).  Because NMF state is exactly
``(W, H, iteration, cost_history)`` (SURVEY.md section 5), resume is just
"re-read and continue", which this module makes first-class:

  * ``save_checkpoint`` / ``load_checkpoint``: the factors in the reference's
    own ``.bin`` format (interoperable with the CUDA toolchain) plus a JSON
    sidecar for iteration count, cost history and config fingerprint.
  * ``solve_with_checkpoints``: runs the solve in host-level segments of
    ``every`` iterations, writing a checkpoint after each segment and
    resuming from the latest one on restart.  Each segment is the same
    jit-compiled on-device loop (no per-iteration host sync); the host only
    intervenes every ``every`` iterations.

Sharded arrays are gathered to the host before writing (.bin is a
single-host interchange format).  For pod-scale runs whose factors exceed
host memory, use :func:`save_checkpoint_sharded` /
:func:`load_checkpoint_sharded` (orbax/tensorstore; each host writes only its
addressable shards).
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
from typing import List, Optional

import numpy as np

from ..io import binio
from .config import SolveConfig

__all__ = [
    "CheckpointState",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "solve_with_checkpoints",
    "save_checkpoint_sharded",
    "load_checkpoint_sharded",
]

_META = "meta.json"


@dataclasses.dataclass
class CheckpointState:
    w: np.ndarray
    h: np.ndarray
    iteration: int
    cost_history: List[float]
    converged: bool = False
    # global iteration number of each cost_history entry (segments make the
    # check grid irregular: each segment checks every ``check_every`` iters
    # *within itself*, so labels cannot be reconstructed from check_every
    # alone).  None for checkpoints written before this field existed.
    check_iterations: Optional[List[int]] = None
    # accelerated loop's adapted momentum at checkpoint time, so a resumed
    # accel run continues with the coefficient it had (NaN = fresh start /
    # non-accelerated / pre-field checkpoint).
    momentum: float = float("nan")
    # accelerated loop's extrapolation carry (factor-shaped, the other half
    # of its resume state): with both stored, an accelerated checkpointed
    # run resumes EXACTLY where it left off (resume == straight-run).  None
    # for non-accelerated runs and pre-field checkpoints.
    w_ex: Optional[np.ndarray] = None
    h_ex: Optional[np.ndarray] = None


def _config_fingerprint(config: SolveConfig) -> dict:
    """Every field that changes the optimisation objective or its trajectory."""
    return {
        "eps": config.eps,
        "beta": config.beta,
        "algorithm": config.algorithm,
        "matmul_dtype": config.precision.matmul_dtype,
        "x_dtype": config.precision.x_dtype,
        # scale granularity changes the quantized objective itself; the
        # accelerated trajectory differs from plain MU's the same way a
        # different check grid would (missing keys in OLD checkpoints stay
        # compatible — see _fingerprint_mismatch)
        "x_quant_rows": config.precision.x_quant_rows,
        "accelerate": config.accelerate,
        "check_every": config.check_every,
        "l1_w": config.l1_w,
        "l1_h": config.l1_h,
        "l2_w": config.l2_w,
        "l2_h": config.l2_h,
    }


def _fingerprint_mismatch(have: dict, want: dict) -> bool:
    """True if any field PRESENT in the stored fingerprint disagrees.

    Compared key-by-key so checkpoints written before a fingerprint field
    existed still resume under the same objective (a missing key is
    compatible, a differing one is not)."""
    return any(k in have and have[k] != want[k] for k in want)


def _recover_and_sweep(directory: str, sweep_tmp: bool = True) -> None:
    """Best-effort GC of crash artifacts from earlier ``save_checkpoint``s.

    A death between the two renames of a same-step overwrite leaves the
    previous copy parked under ``.old_step_NNN_<pid>`` (dot-prefixed so it
    can never shadow a real step).  Restore the parked copy when its step
    vanished, drop it when the step exists, and — when ``sweep_tmp`` —
    clear abandoned ``.tmp_ckpt_*`` staging dirs.

    ``sweep_tmp`` must be True only from a WRITER (``save_checkpoint``),
    where the directory's single-writer contract guarantees no other save
    is staging.  Readers (``latest_checkpoint``) pass False: a monitor or
    resume probe listing the directory while a trainer is mid-save must
    never delete the trainer's live staging dir (ADVICE r04).  Sharded
    multi-process checkpoints go through orbax instead.
    """
    try:
        entries = os.listdir(directory)
    except OSError:
        return
    import shutil

    for name in entries:
        path = os.path.join(directory, name)
        try:
            if name.startswith(".old_step_"):
                step = name[len(".old_"):].rsplit("_", 1)[0]
                step_dir = os.path.join(directory, step)
                if os.path.exists(step_dir):
                    shutil.rmtree(path, ignore_errors=True)
                else:
                    os.rename(path, step_dir)
            elif sweep_tmp and name.startswith(".tmp_ckpt_"):
                shutil.rmtree(path, ignore_errors=True)
        except OSError:
            pass  # GC is best-effort; never fail a save/list over it


def save_checkpoint(
    directory: str,
    state: CheckpointState,
    config: Optional[SolveConfig] = None,
) -> str:
    """Write a checkpoint dir ``<directory>/step_<iteration>`` atomically."""
    os.makedirs(directory, exist_ok=True)
    _recover_and_sweep(directory)
    step_dir = os.path.join(directory, f"step_{state.iteration:08d}")
    tmp = tempfile.mkdtemp(dir=directory, prefix=".tmp_ckpt_")
    try:
        binio.write_matrix(np.asarray(state.w), os.path.join(tmp, "W.bin"))
        binio.write_matrix(np.asarray(state.h), os.path.join(tmp, "H.bin"))
        if state.w_ex is not None:
            binio.write_matrix(
                np.asarray(state.w_ex, np.float32), os.path.join(tmp, "Wex.bin")
            )
            binio.write_matrix(
                np.asarray(state.h_ex, np.float32), os.path.join(tmp, "Hex.bin")
            )
        meta = {
            "iteration": int(state.iteration),
            "cost_history": [float(c) for c in state.cost_history],
            "converged": bool(state.converged),
            "check_iterations": (
                [int(i) for i in state.check_iterations]
                if state.check_iterations is not None
                else None
            ),
            # None when NaN: portable JSON, and a reader distinguishes
            # "no adapted momentum" without NaN literals
            "momentum": (
                float(state.momentum)
                if state.momentum == state.momentum
                else None
            ),
            "config": _config_fingerprint(config) if config else None,
            "format": "nmf_tpu.v1",
        }
        with open(os.path.join(tmp, _META), "w") as f:
            json.dump(meta, f)
        if os.path.exists(step_dir):
            # same-step overwrite: replace via rename dance.  The parked
            # name is DOT-prefixed so a crash between the two renames can
            # never leave a directory that latest_checkpoint would pick up
            # (a trailing suffix like '.old' would sort AFTER the real step
            # and shadow it forever).
            old = os.path.join(
                directory,
                f".old_{os.path.basename(step_dir)}_{os.getpid()}",
            )
            os.rename(step_dir, old)
            try:
                os.rename(tmp, step_dir)
            except BaseException:
                # the step must never vanish: put the parked copy back
                # before the outer handler clears tmp
                if not os.path.exists(step_dir):
                    os.rename(old, step_dir)
                raise
            import shutil

            shutil.rmtree(old)
        else:
            os.rename(tmp, step_dir)
    except BaseException:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return step_dir


def load_checkpoint(step_dir: str, config: Optional[SolveConfig] = None) -> CheckpointState:
    """Load a checkpoint; with ``config`` given, verify its fingerprint.

    Resuming under a different objective (beta), epsilon, or matmul dtype
    would silently mix two optimisation problems — refuse instead.
    """
    with open(os.path.join(step_dir, _META)) as f:
        meta = json.load(f)
    if config is not None and meta.get("config") is not None:
        want = _config_fingerprint(config)
        have = meta["config"]
        if _fingerprint_mismatch(have, want):
            raise ValueError(
                f"checkpoint {step_dir} was written with config {have}, "
                f"resume requested with {want}; refusing to mix objectives"
            )
    wex_path = os.path.join(step_dir, "Wex.bin")
    has_ex = os.path.exists(wex_path)
    return CheckpointState(
        w=binio.read_matrix(os.path.join(step_dir, "W.bin")),
        h=binio.read_matrix(os.path.join(step_dir, "H.bin")),
        w_ex=binio.read_matrix(wex_path) if has_ex else None,
        h_ex=(
            binio.read_matrix(os.path.join(step_dir, "Hex.bin"))
            if has_ex else None
        ),
        iteration=int(meta["iteration"]),
        cost_history=list(meta.get("cost_history", [])),
        converged=bool(meta.get("converged", False)),
        check_iterations=meta.get("check_iterations"),
        momentum=(
            float(meta["momentum"])
            if meta.get("momentum") is not None
            else float("nan")
        ),
    )


def latest_checkpoint(directory: str) -> Optional[str]:
    """Newest complete ``step_*`` dir under ``directory`` (None if none).

    Also restores a step parked by a crash mid same-step overwrite (see
    :func:`_recover_and_sweep`), so a resume after such a crash still finds
    the previous copy instead of silently starting over.  Being a READ
    path callable from any process, it never sweeps ``.tmp_ckpt_*`` —
    that could reap a concurrent writer's live staging dir (ADVICE r04);
    abandoned staging dirs are collected by the next ``save_checkpoint``.
    """
    if not os.path.isdir(directory):
        return None
    _recover_and_sweep(directory, sweep_tmp=False)
    steps = sorted(
        d
        for d in os.listdir(directory)
        if d.startswith("step_")
        and d[len("step_"):].isdigit()  # never crash-leftover names
        and os.path.exists(os.path.join(directory, d, _META))
    )
    return os.path.join(directory, steps[-1]) if steps else None


def save_checkpoint_sharded(
    directory: str,
    state: CheckpointState,
    config: Optional[SolveConfig] = None,
) -> str:
    """Pod-scale checkpoint: factors stay sharded (orbax/tensorstore).

    Unlike :func:`save_checkpoint` this never gathers W/H to one host — each
    host writes its addressable shards, so it scales to factors larger than
    host memory (BASELINE.json config 5).  ``state.w``/``state.h`` may be
    sharded ``jax.Array``s.

    Pod safety (multi-process on a shared filesystem):
      * meta.json is written by process 0 ONLY, via fsync + atomic rename —
        no cross-process write race on the same path.
      * meta.json is written strictly AFTER the orbax array save completes,
        and :func:`latest_checkpoint` recognizes a step only once its meta
        exists — a reader can never observe a meta-complete-but-arrays-
        pending checkpoint.
      * all processes barrier before returning, so no process can start
        reading (or deleting/overwriting) a checkpoint that another process
        has not finished writing.
    """
    import jax
    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    step_dir = os.path.abspath(
        os.path.join(directory, f"step_{state.iteration:08d}")
    )
    with ocp.StandardCheckpointer() as ckptr:
        # multihost-coordinated collective save; blocks until all hosts'
        # shards are durable (the checkpointer context also waits on exit)
        arrays = {"w": state.w, "h": state.h}
        if state.w_ex is not None:
            arrays["w_ex"] = state.w_ex
            arrays["h_ex"] = state.h_ex
        ckptr.save(step_dir + ".arrays", arrays, force=True)
    try:
        if jax.process_index() == 0:
            meta = {
                "iteration": int(state.iteration),
                "cost_history": [float(c) for c in state.cost_history],
                "converged": bool(state.converged),
                "check_iterations": (
                    [int(i) for i in state.check_iterations]
                    if state.check_iterations is not None
                    else None
                ),
                # None when NaN: portable JSON, and a reader distinguishes
                # "no adapted momentum" without NaN literals
                "momentum": (
                    float(state.momentum)
                    if state.momentum == state.momentum
                    else None
                ),
                "has_extrap": state.w_ex is not None,
                "config": _config_fingerprint(config) if config else None,
                "format": "nmf_tpu.sharded.v1",
            }
            os.makedirs(step_dir, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=directory, prefix=".tmp_meta_")
            try:
                with os.fdopen(fd, "w") as f:
                    json.dump(meta, f)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, os.path.join(step_dir, _META))
            except BaseException:
                if os.path.exists(tmp):
                    os.unlink(tmp)
                raise
    finally:
        # barrier in finally: if process 0's meta write raises, the other
        # processes must still pass the sync (a missing barrier on one host
        # deadlocks the pod instead of surfacing the error).  The failed
        # step stays invisible — latest_checkpoint requires meta.json.
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(
                f"nmf_tpu_ckpt_save_{state.iteration}"
            )
    return step_dir


def load_checkpoint_sharded(
    step_dir: str, w_like, h_like, config: Optional[SolveConfig] = None
) -> CheckpointState:
    """Restore a sharded checkpoint.

    ``w_like``/``h_like`` carry the target shape/dtype/sharding — pass either
    sharded ``jax.Array``s or ``jax.ShapeDtypeStruct``s with ``.sharding``
    set (``h_like`` may be a PYTREE of them, e.g. the streaming solver's
    list of H column blocks), so each host restores only its shards.  With
    ``config`` given, the stored fingerprint is verified (same refusal
    semantics as :func:`load_checkpoint`).
    """
    import jax
    import orbax.checkpoint as ocp

    step_dir = os.path.abspath(step_dir)
    with open(os.path.join(step_dir, _META)) as f:
        meta = json.load(f)
    if config is not None and meta.get("config") is not None:
        want = _config_fingerprint(config)
        if _fingerprint_mismatch(meta["config"], want):
            raise ValueError(
                f"checkpoint {step_dir} was written with config "
                f"{meta['config']}, resume requested with {want}; refusing "
                f"to mix objectives"
            )

    def _abstract(a):
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding)

    like = {"w": w_like, "h": h_like}
    if meta.get("has_extrap"):
        # the extrapolation carry shards exactly like the factors
        like["w_ex"] = w_like
        like["h_ex"] = h_like
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            step_dir + ".arrays",
            jax.tree_util.tree_map(_abstract, like),
        )
    return CheckpointState(
        w=restored["w"],
        h=restored["h"],
        w_ex=restored.get("w_ex"),
        h_ex=restored.get("h_ex"),
        iteration=int(meta["iteration"]),
        cost_history=list(meta.get("cost_history", [])),
        converged=bool(meta.get("converged", False)),
        check_iterations=meta.get("check_iterations"),
        momentum=(
            float(meta["momentum"])
            if meta.get("momentum") is not None
            else float("nan")
        ),
    )


def solve_with_checkpoints(
    x,
    w0,
    h0,
    config: SolveConfig,
    directory: str,
    every: int = 100,
    resume: bool = True,
    mesh=None,
    sharded_checkpoints: bool = False,
):
    """Checkpointed (and resumable) solve.

    Runs ``config.max_iter`` total iterations in segments of ``every``,
    checkpointing after each segment.  If ``resume`` and a checkpoint exists
    in ``directory``, continues from it (inputs ``w0``/``h0`` are ignored for
    the factors but shapes must match).

    With ``mesh`` the segments run via :func:`solve_sharded`.  By default the
    factors are gathered to the host and written in the interoperable
    ``.bin`` format; ``sharded_checkpoints=True`` keeps them as sharded
    jax.Arrays end-to-end and writes orbax/tensorstore checkpoints instead —
    required at pod scale where W/H exceed host memory (BASELINE.json
    config 5).

    Returns the final :class:`~nmf_tpu.models.solver.SolveResult` equivalent
    (with the stitched cost history) as a CheckpointState.

    Device residency: X is placed (and clamped) on device exactly ONCE per
    process regardless of segment count, and W/H stay device-resident across
    segments — each segment donates the previous segment's factor buffers to
    the next (the reference crosses the device boundary exactly 3x for the
    whole run, nmf.cu:227-232 / SURVEY.md section 3.1; here the only extra
    crossings are the D2H factor reads that checkpoint files inherently
    need).
    """
    import jax
    import jax.numpy as jnp

    from ..models.solver import solve
    from ..parallel.sharded import solve_sharded

    config.validate()
    if every <= 0:
        raise ValueError("every must be >= 1")
    if sharded_checkpoints and mesh is None:
        raise ValueError("sharded_checkpoints=True requires a mesh")

    sd = jnp.dtype(config.precision.state_dtype)
    xd = jnp.dtype(config.precision.x_dtype)
    _f32 = jnp.float32

    start_iter = 0
    cost_history: List[float] = []
    check_iterations: List[int] = []
    last_mom = float("nan")  # accel momentum threaded across segments
    last_ex = None           # ...and its extrapolation carry (accel only)
    w, h = w0, h0
    converged = False
    if resume:
        latest = latest_checkpoint(directory)
        if latest is not None:
            if sharded_checkpoints:
                from ..parallel.mesh import nmf_shardings

                _, ws, hs, _ = nmf_shardings(mesh)
                w_like = jax.ShapeDtypeStruct(np.shape(w0), sd, sharding=ws)
                h_like = jax.ShapeDtypeStruct(np.shape(h0), sd, sharding=hs)
                state = load_checkpoint_sharded(latest, w_like, h_like, config)
            else:
                state = load_checkpoint(latest, config)
            if tuple(np.shape(state.w)) != tuple(np.shape(w0)) or tuple(
                np.shape(state.h)
            ) != tuple(np.shape(h0)):
                raise ValueError(
                    f"checkpoint shapes {np.shape(state.w)}/{np.shape(state.h)} "
                    f"do not match inputs {np.shape(w0)}/{np.shape(h0)}"
                )
            w, h, start_iter = state.w, state.h, state.iteration
            cost_history = state.cost_history
            converged = state.converged
            check_iterations = list(state.check_iterations or [])
            last_mom = float(state.momentum)
            if state.w_ex is not None:
                last_ex = (jnp.asarray(state.w_ex), jnp.asarray(state.h_ex))

    # ---- one-time placement + clamp (the single H2D of X for this run) ----
    from ..models.sparse_tiled import TileSparseX

    tiled = isinstance(x, TileSparseX)
    if tiled:
        # tile-sparse X: no dense placement/clamp (zeros are EXACT zeros by
        # that solver's contract).  The tile payload and factors are
        # prepared/placed ONCE; segments chain through the donated PADDED
        # device factors, so X never re-crosses the host link between
        # segments and W/H stay device-resident (the single-H2D discipline
        # the dense branch below keeps).  Checkpoint files store the
        # CROPPED logical factors (the D2H is inherent to writing a file);
        # resume re-pads them here.
        if sharded_checkpoints:
            raise NotImplementedError(
                "tile-sparse checkpointing stores the cropped logical "
                "factors; orbax sharded checkpoints would need padded-shape "
                "restore plumbing — use the default host checkpoints"
            )
        from ..models.sparse_tiled import (
            _CHUNK,
            _crop_tiled,
            _prepare_tiled,
            _run_tiled,
        )

        xarg, w_dev, h_dev, info = _prepare_tiled(
            x, w, h, config, chunk=_CHUNK, tile=x.tile_shape, mesh=mesh
        )
        del w, h
        if last_ex is not None:
            # checkpoint files store the CROPPED extrapolation carry (like
            # the factors); re-pad with zeros to the block-aligned shape.
            # Zero pads are exact here: the carry is only ever the next
            # accel step's EVAL point, and padded rows/cols see zero
            # numerators, so the iterate's pads return to exactly zero
            # whatever the eval point's pads hold.
            wex = jnp.zeros(w_dev.shape, w_dev.dtype).at[
                : info["m"]].set(jnp.asarray(last_ex[0], w_dev.dtype))
            hex_ = jnp.zeros(h_dev.shape, h_dev.dtype).at[
                :, : info["n"]].set(jnp.asarray(last_ex[1], h_dev.dtype))
            last_ex = (wex, hex_)
        it = start_iter
        last_cost = cost_history[-1] if cost_history else float("nan")
        state = None
        while it < config.max_iter and not converged:
            seg = min(every, config.max_iter - it)
            seg_cfg = dataclasses.replace(config, max_iter=seg)
            if config.accelerate and last_ex is None:
                # first accelerated segment: seed the carry AT the (padded)
                # iterate with fresh copies, identical to the one-jit init
                last_ex = (w_dev + 0, h_dev + 0)
            res = _run_tiled(
                xarg, w_dev, h_dev, seg_cfg, info, last_cost, last_mom,
                initial_extrap=last_ex,
            )
            w_dev, h_dev = res.w, res.h  # padded, device-resident, donated on
            seg_iters = int(res.iterations)
            n_checks = int(res.num_checks)
            seg_hist = [
                float(c) for c in np.asarray(res.cost_history)[:n_checks]
            ]
            check_iterations.extend(
                it + min((i + 1) * config.check_every, seg_iters)
                for i in range(n_checks)
            )
            it += seg_iters
            cost_history.extend(seg_hist)
            if seg_hist:
                last_cost = seg_hist[-1]
            if res.momentum is not None:
                last_mom = float(res.momentum)
            if res.w_ex is not None:
                last_ex = (res.w_ex, res.h_ex)
            converged = bool(res.converged)
            cropped = _crop_tiled(res, info)
            state = CheckpointState(
                np.asarray(cropped.w), np.asarray(cropped.h), it,
                cost_history, converged, check_iterations,
                momentum=last_mom,
                # carry cropped like the factors (re-padded on resume above)
                w_ex=(
                    np.asarray(res.w_ex)[: info["m"]]
                    if res.w_ex is not None else None
                ),
                h_ex=(
                    np.asarray(res.h_ex)[:, : info["n"]]
                    if res.h_ex is not None else None
                ),
            )
            save_checkpoint(directory, state, config)
        if state is None:
            # resumed run that was already complete: no segment executed
            state = CheckpointState(
                np.asarray(w_dev)[: info["m"]],
                np.asarray(h_dev)[:, : info["n"]],
                it, cost_history, converged, check_iterations,
                momentum=last_mom,
            )
        return state

    quant = config.precision.x_dtype == "int8"
    eps32 = jnp.asarray(config.eps, _f32)
    if mesh is not None and not quant:
        from ..parallel.mesh import shard_problem

        x_dev, w_dev, h_dev = shard_problem(x, w, h, mesh)
    else:
        # quantized X on a mesh: build the (codes, scales) pair here; the
        # first segment's solve_sharded places it with the canonical
        # shardings and later segments' device_put calls are no-ops
        x_dev, w_dev, h_dev = jnp.asarray(x), jnp.asarray(w), jnp.asarray(h)
    x_dev = jnp.maximum(x_dev.astype(_f32), eps32)
    if quant:
        # uint8 codes + per-column (or per-row-block) scales, once for the
        # whole run; solve_sharded places either layout on the mesh
        # (parallel.sharded._quant_specs)
        from ..ops.quant import quantize_policy

        x_dev = quantize_policy(
            x_dev, config.eps, config.precision.x_quant_rows
        )
    else:
        x_dev = x_dev.astype(xd)
    w_dev = jnp.maximum(w_dev.astype(sd), jnp.asarray(config.eps, sd))
    h_dev = jnp.maximum(h_dev.astype(sd), jnp.asarray(config.eps, sd))
    del w, h

    it = start_iter
    # convergence baseline carried across segment boundaries so thresh > 0
    # behaves exactly like an uninterrupted solve()
    last_cost = cost_history[-1] if cost_history else float("nan")
    state = None
    while it < config.max_iter and not converged:
        seg = min(every, config.max_iter - it)
        seg_cfg = dataclasses.replace(config, max_iter=seg)
        if config.accelerate and last_ex is None:
            # first accelerated segment: seed the carry AT the iterate with
            # fresh copies (the segment donates w_dev/h_dev) — identical to
            # the one-jit accel init, so segmenting is exact
            last_ex = (w_dev + 0, h_dev + 0)
        if mesh is not None:
            res = solve_sharded(
                w0=w_dev, h0=h_dev, x=x_dev, config=seg_cfg, mesh=mesh,
                initial_cost=last_cost, clamp_inputs=False,
                initial_momentum=last_mom, initial_extrap=last_ex,
            )
        else:
            res = solve(
                x_dev, w_dev, h_dev, seg_cfg,
                initial_cost=last_cost, clamp_inputs=False,
                initial_momentum=last_mom, initial_extrap=last_ex,
            )
        # device-resident carry: these buffers are donated to the next
        # segment (w_dev/h_dev above were consumed by this one)
        w_dev, h_dev = res.w, res.h
        seg_iters = int(res.iterations)
        n_checks = int(res.num_checks)
        seg_hist = [float(c) for c in np.asarray(res.cost_history)[:n_checks]]
        check_iterations.extend(
            it + min((i + 1) * config.check_every, seg_iters)
            for i in range(n_checks)
        )
        it += seg_iters
        cost_history.extend(seg_hist)
        if seg_hist:
            last_cost = seg_hist[-1]
        if res.momentum is not None:
            last_mom = float(res.momentum)
        if res.w_ex is not None:
            last_ex = (res.w_ex, res.h_ex)
        converged = bool(res.converged)
        if sharded_checkpoints:
            # factors stay sharded; each host writes only its shards (the
            # accel extrapolation carry shards exactly like the factors)
            state = CheckpointState(
                w_dev, h_dev, it, cost_history, converged, check_iterations,
                momentum=last_mom,
                w_ex=last_ex[0] if config.accelerate else None,
                h_ex=last_ex[1] if config.accelerate else None,
            )
            save_checkpoint_sharded(directory, state, config)
        else:
            state = CheckpointState(
                np.asarray(res.w), np.asarray(res.h), it, cost_history,
                converged, check_iterations, momentum=last_mom,
                w_ex=np.asarray(res.w_ex) if res.w_ex is not None else None,
                h_ex=np.asarray(res.h_ex) if res.h_ex is not None else None,
            )
            save_checkpoint(directory, state, config)
    if state is None:
        # resumed run that was already complete: no segment executed
        w_out = w_dev if sharded_checkpoints else np.asarray(w_dev)
        h_out = h_dev if sharded_checkpoints else np.asarray(h_dev)
        state = CheckpointState(
            w_out, h_out, it, cost_history, converged, check_iterations,
            momentum=last_mom,
        )
    return state
