"""AOT-exported transform programs: portable serving artifacts.

The reference has no serving story — its one binary refits W and H from
scratch per run (nmf.cu:37-45).  Production NMF serving is the opposite
shape: a FIXED learned dictionary W and a stream of new data blocks to score
(the paper's own application refits H for new audio against a trained W).
This module packages that inference path as a self-contained artifact:

  * the H-only solve program (``models/nmf._h_only_step_cost`` — exactly the
    update the live library runs, nmf.cu:118-146 semantics) is traced at
    fixed shapes and serialized with :mod:`jax.export` (StableHLO, versioned,
    multi-platform: one artifact runs on TPU *and* CPU);
  * the dictionary W and the full :class:`SolveConfig` ride along in the
    same file, so a serving process needs nothing but the artifact path.

Why AOT export instead of shipping Python + weights:

  * no retracing at serve time — the program is already lowered; with the
    persistent compilation cache the per-process cost is one cache hit;
  * version safety — ``jax.export`` artifacts carry StableHLO
    compatibility guarantees across jax releases, while a pickled closure
    carries none;
  * the artifact is consumable from non-Python PJRT runtimes (the StableHLO
    bytes are standard), which a jitted Python function never is.

Blocking model: the program is exported for a fixed ``(m, n_block)`` X
shape (XLA programs are static-shape).  :class:`ServingTransform` feeds any
number of columns by slicing the input into ``n_block``-column chunks and
zero-padding the tail.  The MU/HALS H half-updates are **column-separable**
(each H column depends only on its own X column — the numerator
``W^T (X/WH)`` and denominator touch nothing across columns), so the padded
tail cannot perturb real columns' values at any given iteration; padded
columns start at the epsilon clamp and decay toward it.  Two knobs couple
columns through block-GLOBAL scalars and therefore see an (eps-level)
perturbation from the padding: ``thresh > 0`` (the convergence predicate is
the block cost, so a padded tail block's stop iteration can shift by one
check) and ``accelerate=True`` (the accept/reject predicate is the block
cost).  Both are supported; exact-parity serving under either should use
block-aligned inputs.

Unsupported in an export (validated eagerly): ``backend='pallas'`` /
``'autotune'`` (Mosaic kernels are per-platform; autotune needs a live
device — the artifact must run everywhere it lowers for), and
``live_metrics`` (host callbacks cannot be serialized).  ``x_dtype`` int8 /
bfloat16 work: the cast/quantization prep runs *inside* the program, so the
serving input is always plain float32.  For int8 configs,
``quantized_input=True`` moves the quantization to the HOST instead (the
bit-identical NumPy twin, ops/quant.quantize_*_np): the program takes the
``(codes, scales)`` pair directly, so each block's H2D transfer shrinks ~4x
— the lever that matters on link-bound serving (this host's measured
0.01-0.05 GB/s).  Results are bit-identical to the in-program-quantization
artifact; composes with ``mesh_shape`` (host quantization produces the
solver's whole-column scale layout, which shards cleanly — the per-shard
exclusion only applies to quantizing *inside* the sharded program) and
with ``masked`` (the caller hands the host the mask, so it reproduces the
in-program clamp → zero-unobserved → quantize order exactly; format v4,
5 program inputs, the mask riding as uint8 — codes + mask = 2 bytes/entry
vs the f32 masked artifact's 8).

Distributed serving: ``mesh_shape=(rows, cols)`` exports the shard_map
solver (parallel.sharded) instead — traced over a ``jax.sharding
.AbstractMesh``, so a single-chip (or chipless) host can export an artifact
for a pod; loading needs rows*cols devices and the canonical ('mr','mc')
layout (X blocked, W row-sharded, H column-sharded — `load_transform`
places the blocks).  In-program int8 X is the one exclusion there
(whole-column scale layouts cannot be reproduced per shard inside the
program; ``quantized_input=True`` is the int8-on-mesh path).
"""

from __future__ import annotations

import dataclasses
import io
import json
import zipfile
from typing import Optional, Sequence, Tuple

import numpy as np

from .utils.config import Precision, SolveConfig

__all__ = [
    "export_transform",
    "save_transform",
    "load_transform",
    "ServingTransform",
    "ServingResult",
    "FORMAT_VERSION",
]

# v1: plain/mesh transform artifacts.  v2 adds masked artifacts (a 4th
# program input).  v3 adds quantized-input artifacts (program takes the
# (codes, scales) pair instead of f32 X — quarter-width serve-time
# transfers).  v4 adds masked x quantized-input (5 program inputs: codes,
# scales, w, h0, mask).  Each artifact writes the LOWEST version that can
# describe it, so older loaders — which reject versions above their own —
# keep reading everything they can actually serve.
FORMAT_VERSION = 4
_MAGIC = "nmf_tpu-serving"


def _config_to_dict(config: SolveConfig) -> dict:
    d = dataclasses.asdict(config)
    return d


def _known_fields(cls, d: dict, what: str) -> dict:
    """Keep only the fields this library version knows, warning about the
    rest: a NEWER writer may add SolveConfig knobs without changing the wire
    format, and an already-deployed reader must keep serving (the dropped
    knob's default semantics) rather than crash on the unknown keyword."""
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = sorted(set(d) - names)
    if unknown:
        import warnings

        warnings.warn(
            f"artifact {what} carries fields this nmf_tpu version does not "
            f"know and will ignore: {unknown} (written by a newer library?)",
            stacklevel=3,
        )
    return {k: v for k, v in d.items() if k in names}


def _config_from_dict(d: dict) -> SolveConfig:
    d = dict(d)
    prec = _known_fields(Precision, d.pop("precision"), "Precision")
    d = _known_fields(SolveConfig, d, "SolveConfig")
    return SolveConfig(precision=Precision(**prec), **d)


def _validate_exportable(config: SolveConfig) -> SolveConfig:
    """Reject config knobs that cannot live inside a serialized program."""
    config.validate()
    if config.backend in ("pallas", "autotune"):
        raise ValueError(
            "exported programs use the portable XLA path: Mosaic (Pallas) "
            "kernels lower per-platform and autotune needs a live device — "
            "use backend='jnp' (or 'auto', which exports the jnp path)"
        )
    if config.live_metrics:
        raise ValueError(
            "live_metrics streams through a host callback, which cannot be "
            "serialized into an exported program"
        )
    if config.backend == "auto":
        config = dataclasses.replace(config, backend="jnp")
    return config


def _build_transform_program(config: SolveConfig, mesh_shape=None,
                             masked=False, quantized=False):
    """The ONE builder for every exported transform program — the 2x2
    (masked? x quantized-input?) family, single-device or traced over an
    ``AbstractMesh`` when ``mesh_shape`` is given.

    Signatures (what jax.export sees):

      plain               ``program(x, w, h0)``
      masked              ``program(x, w, h0, mask)``            (mask f32)
      quantized           ``program(codes, scales, w, h0)``
      masked x quantized  ``program(codes, scales, w, h0, mask)`` (mask u8)

    Shared invariants live here so the six variants cannot drift: prep runs
    INSIDE the program (clamp/cast/quantize for f32-wire inputs;
    pass-through for host-quantized (codes, scales) pairs — bit-identical
    by ops/quant's NumPy twins); results return as a plain 6-tuple (custom
    pytree nodes don't survive deserialization in a process that hasn't
    registered them); mesh programs jit with the canonical shardings
    (X/codes/mask blocked ('mr','mc'), scales per
    parallel.mesh.quant_scale_spec — a 2-D row-block table keeps its block
    rows on every 'mr' shard — W row-sharded, H column-sharded, scalars
    replicated), with dequant shard-local so X sits in HBM at 1/4 width.

    Why quantized composes with ``mesh_shape``: the in-program int8 x mesh
    exclusion exists because per-shard quantization inside shard_map cannot
    reproduce the solver's whole-column scale layout — host quantization
    produces exactly that layout.  Why it composes with ``masked``: the
    caller hands the host the mask, so serve-time quantization reproduces
    the in-program clamp -> zero-unobserved -> quantize order bit-for-bit
    (models/masked._masked_prep_jit_cached); the v4 program takes the mask
    as uint8 — a BINARY observed-entry indicator (weighted masks need the
    in-program f32 artifact) — so the masked wire is codes + mask =
    2 bytes/entry vs the f32 masked artifact's 8.
    """
    import jax
    import jax.numpy as jnp

    from .models.solver import _prep_jit, run_checked_loop

    if masked and not quantized:
        from .models.masked import _masked_prep_jit_cached

        mprep = _masked_prep_jit_cached(config.precision, config.eps)
    else:
        prep = _prep_jit(config, x_is_quant_pair=quantized)

    def _prep_all(x, w, h0, mask):
        """(data, w, h0) with data = x or (x, mask) per the masked flag."""
        if masked and not quantized:
            x, w, h0, mask = mprep(x, w, h0, mask)
            return (x, mask), w, h0
        x, w, h0 = prep(x, w, h0)
        if masked:
            # the uint8 wire mask becomes the f32 multiplicand the masked
            # step expects (the host already zeroed + quantized X under it)
            return (x, mask.astype(jnp.float32)), w, h0
        return x, w, h0

    def _as_tuple(res):
        return (
            res.h,
            res.iterations,
            res.cost,
            res.cost_history,
            res.num_checks,
            res.converged,
        )

    if mesh_shape is None:
        if masked:
            from .models.masked import _masked_h_step_cost_pair

            step, cost = _masked_h_step_cost_pair(config)
        else:
            from .models.nmf import _h_only_step_cost

            step, cost = _h_only_step_cost(config)

        def solve(data, w, h0):
            return run_checked_loop(data, w, h0, config, step, cost)

        shard = {}
    else:
        from jax.sharding import AbstractMesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from .parallel.mesh import quant_scale_spec_for
        from .parallel.sharded import (
            build_sharded_h_solver,
            build_sharded_masked_h_solver,
        )

        am = AbstractMesh(tuple(mesh_shape), ("mr", "mc"))
        fn = (
            build_sharded_masked_h_solver if masked else build_sharded_h_solver
        )(config, am)

        def solve(data, w, h0):
            return fn(
                data, w, h0,
                jnp.asarray(jnp.nan, jnp.float32),
                jnp.asarray(jnp.nan, jnp.float32),
            )

        def S(spec):
            return NamedSharding(am, spec)

        x_in = (
            (S(P("mr", "mc")), S(quant_scale_spec_for(config.precision)))
            if quantized else (S(P("mr", "mc")),)
        )
        in_shardings = x_in + (S(P("mr", None)), S(P(None, "mc")))
        if masked:
            in_shardings += (S(P("mr", "mc")),)
        shard = {
            "in_shardings": in_shardings,
            "out_shardings": (
                S(P(None, "mc")), S(P()), S(P()), S(P()), S(P()), S(P()),
            ),
        }

    if quantized and masked:
        def program(codes, scales, w, h0, mask):
            return _as_tuple(solve(*_prep_all((codes, scales), w, h0, mask)))
    elif quantized:
        def program(codes, scales, w, h0):
            return _as_tuple(solve(*_prep_all((codes, scales), w, h0, None)))
    elif masked:
        def program(x, w, h0, mask):
            return _as_tuple(solve(*_prep_all(x, w, h0, mask)))
    else:
        def program(x, w, h0):
            return _as_tuple(solve(*_prep_all(x, w, h0, None)))

    return jax.jit(program, **shard)


def _validate_w_shape(w: np.ndarray, n_block: int, mesh_shape=None) -> np.ndarray:
    w = np.asarray(w, np.float32)
    if w.ndim != 2:
        raise ValueError(f"W must be 2-D, got shape {w.shape}")
    if n_block <= 0:
        raise ValueError("n_block must be >= 1")
    if mesh_shape is not None:
        r, c = (int(v) for v in mesh_shape)
        if r <= 0 or c <= 0:
            raise ValueError(f"mesh_shape must be positive, got {mesh_shape}")
        if w.shape[0] % r or n_block % c:
            raise ValueError(
                f"sharded export needs M divisible by mesh rows and n_block "
                f"by mesh cols: M={w.shape[0]} n_block={n_block} vs "
                f"mesh {r}x{c}"
            )
    return w


def _export_validated(w, n_block, config, platforms, mesh_shape=None,
                      masked=False, quantized_input=False):
    import jax
    import jax.numpy as jnp
    from jax import export as jax_export

    platforms = tuple(platforms)
    if not platforms:
        raise ValueError(
            "platforms must name at least one lowering target (jax.export "
            "would silently fall back to this host's platform, mislabeling "
            "the artifact)"
        )
    if masked and (config.beta != 1.0 or config.algorithm != "mu"):
        raise ValueError(
            "masked serving implements the KL (beta=1) MU family "
            "(models/masked.py)"
        )
    if quantized_input and config.precision.x_dtype != "int8":
        raise ValueError(
            "quantized_input exports the (codes, scales) calling "
            "convention, which only exists for int8 X storage — set "
            "Precision(x_dtype='int8') (optionally x_quant_rows)"
        )
    if (mesh_shape is not None and not quantized_input
            and config.precision.x_dtype == "int8"):
        raise ValueError(
            "sharded export does not take x_dtype='int8': the exported "
            "program would have to quantize per shard inside shard_map, "
            "which cannot reproduce the solver's whole-column scale "
            "layout — export with quantized_input=True instead (the "
            "HOST quantizes whole columns, which shards cleanly), or "
            "feed f32/bf16"
        )
    m, k = w.shape
    program = _build_transform_program(
        config, mesh_shape, masked, quantized_input
    )
    if quantized_input:
        qrows = int(config.precision.x_quant_rows or 0)
        scales_shape = (
            (-(-m // qrows), n_block) if qrows else (n_block,)
        )
        args = [
            jax.ShapeDtypeStruct((m, n_block), jnp.uint8),
            jax.ShapeDtypeStruct(scales_shape, jnp.float32),
        ]
    else:
        args = [jax.ShapeDtypeStruct((m, n_block), jnp.float32)]
    args += [
        jax.ShapeDtypeStruct((m, k), jnp.float32),
        jax.ShapeDtypeStruct((k, n_block), jnp.float32),
    ]
    if masked:
        # v4 quantized programs take the mask as uint8 (binary indicator —
        # 1 byte/entry on the wire); f32-wire masked programs keep the f32
        # mask their deployed loaders expect
        args.append(jax.ShapeDtypeStruct(
            (m, n_block), jnp.uint8 if quantized_input else jnp.float32
        ))
    return jax_export.export(program, platforms=platforms)(*args)


def export_transform(
    w: np.ndarray,
    n_block: int,
    config: SolveConfig = SolveConfig(),
    platforms: Sequence[str] = ("tpu", "cpu"),
    mesh_shape: Optional[Tuple[int, int]] = None,
    masked: bool = False,
    quantized_input: bool = False,
):
    """Trace + lower the H-only transform at fixed shapes.

    With ``mesh_shape=(rows, cols)`` the artifact contains the distributed
    shard_map solver for an ('mr','mc') device mesh of that shape (traced
    over an AbstractMesh — exporting needs no devices; serving needs
    rows*cols of them).  With ``masked=True`` the program takes a fourth
    ``mask`` input and iterates H on the observed entries only
    (missing-data scoring; composes with ``mesh_shape``).  With
    ``quantized_input=True`` (int8 configs; composes with ``mesh_shape``
    and ``masked``) the program takes host-quantized ``(codes, scales)``
    instead of f32 X — ~4x less serve-time H2D, bit-identical results.

    Returns a ``jax.export.Exported``; most callers want
    :func:`save_transform`, which wraps this in the on-disk artifact.
    """
    config = _validate_exportable(config)
    w = _validate_w_shape(w, n_block, mesh_shape)
    return _export_validated(
        w, n_block, config, platforms, mesh_shape, masked, quantized_input
    )


def save_transform(
    path: str,
    w: np.ndarray,
    n_block: int,
    config: SolveConfig = SolveConfig(),
    platforms: Sequence[str] = ("tpu", "cpu"),
    mesh_shape: Optional[Tuple[int, int]] = None,
    masked: bool = False,
    quantized_input: bool = False,
) -> None:
    """Write a self-contained serving artifact (zip: meta + program + W)."""
    import jax

    config = _validate_exportable(config)
    w = _validate_w_shape(w, n_block, mesh_shape)
    exported = _export_validated(
        w, n_block, config, platforms, mesh_shape, masked, quantized_input
    )
    meta = {
        "magic": _MAGIC,
        # v4 = any artifact a v3 loader would MIS-serve rather than serve:
        # masked x quantized (5-arg program, uint8 mask) and mesh x
        # quantized with a 2-D row-block scale table (a v3 loader places
        # scales with the 1-D ('mc',) spec).  Mesh x quantized with
        # per-column scales stays v3 — v3 loaders serve it correctly, and
        # the contract is the LOWEST version that keeps old loaders right.
        "format_version": (
            4 if quantized_input and (
                masked
                or (mesh_shape is not None
                    and int(config.precision.x_quant_rows or 0) > 0)
            )
            else 3 if quantized_input
            else 2 if masked
            else 1
        ),
        "m": int(w.shape[0]),
        "k": int(w.shape[1]),
        "n_block": int(n_block),
        "masked": bool(masked),
        "quantized_input": bool(quantized_input),
        "mesh_shape": list(mesh_shape) if mesh_shape is not None else None,
        # what the program was actually lowered for (never the raw user
        # input: the two could drift and mislabel the artifact)
        "platforms": [str(p) for p in exported.platforms],
        "config": _config_to_dict(config),
        "jax_version": jax.__version__,
    }
    wbuf = io.BytesIO()
    np.save(wbuf, w)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        zf.writestr("program.bin", exported.serialize())
        zf.writestr("w.npy", wbuf.getvalue())


@dataclasses.dataclass
class ServingResult:
    """Per-block transform results assembled back to the full H.

    Blocks are independent solves (column-separable updates), so iteration
    counts / costs / convergence are reported per block; ``cost`` is the
    sum of final block costs (== the full-X divergence when every block ran)
    and ``converged`` is their conjunction.
    """

    # (k, n), padding sliced off; None when stream_bin wrote H to disk
    h: Optional[np.ndarray]
    block_iterations: np.ndarray     # (n_blocks,) i32
    block_costs: np.ndarray          # (n_blocks,) f32 final divergence
    block_converged: np.ndarray      # (n_blocks,) bool
    n_block: int

    @property
    def cost(self) -> float:
        return float(np.sum(self.block_costs))

    @property
    def converged(self) -> bool:
        return bool(np.all(self.block_converged))

    @property
    def iterations(self) -> int:
        return int(np.max(self.block_iterations))


class ServingTransform:
    """A loaded serving artifact: ``transform = load_transform(p); h =
    transform(x).h``.

    The call pads X to a whole number of ``n_block``-column chunks (zeros,
    clamped to eps inside the program; see the module docstring for why the
    padding cannot perturb real columns) and runs the exported program once
    per chunk.
    """

    def __init__(
        self, exported, w: np.ndarray, config: SolveConfig, meta: dict,
        mesh=None,
    ):
        import jax

        self._exported = exported
        self.w = np.asarray(w, np.float32)
        self.config = config
        self.meta = dict(meta)
        self.m = int(meta["m"])
        self.k = int(meta["k"])
        self.n_block = int(meta["n_block"])
        self.masked = bool(meta.get("masked", False))
        self.quantized = bool(meta.get("quantized_input", False))
        self.platforms = tuple(meta["platforms"])
        ms = meta.get("mesh_shape")
        self.mesh_shape = tuple(int(v) for v in ms) if ms else None
        if self.mesh_shape is None:
            self.mesh = None
        else:
            if mesh is None:
                from .parallel.mesh import make_mesh

                mesh = make_mesh(shape=self.mesh_shape)
            if tuple(mesh.devices.shape) != self.mesh_shape:
                raise ValueError(
                    f"artifact was exported for a "
                    f"{self.mesh_shape[0]}x{self.mesh_shape[1]} mesh, got "
                    f"{'x'.join(str(s) for s in mesh.devices.shape)}"
                )
            self.mesh = mesh
        # one jit wrapper: repeat calls reuse the compiled executable
        self._fn = jax.jit(exported.call)
        self._w_dev = None

    def _put(self, a, spec_axes):
        """Place an array for the program: sharded over the mesh axes when
        the artifact is a mesh program, plain device_put otherwise."""
        import jax

        if self.mesh is None:
            return jax.device_put(a)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        row_ax, col_ax = self.mesh.axis_names
        names = {"mr": row_ax, "mc": col_ax}
        spec = P(*(names.get(s) for s in spec_axes))
        return jax.device_put(a, NamedSharding(self.mesh, spec))

    def __call__(
        self,
        x: np.ndarray,
        h0: Optional[np.ndarray] = None,
        seed: int = 0,
        prefetch: bool = True,
        mask: Optional[np.ndarray] = None,
    ) -> ServingResult:
        x = np.asarray(x, np.float32)
        if x.ndim != 2 or x.shape[0] != self.m:
            raise ValueError(
                f"X must be ({self.m}, n), got {x.shape} (artifact W is "
                f"{self.m}x{self.k})"
            )
        n = x.shape[1]
        if n == 0:
            raise ValueError("X has no columns")
        if self.masked != (mask is not None):
            raise ValueError(
                "this artifact's program "
                + ("requires a mask (exported with masked=True)"
                   if self.masked else "takes no mask (export with "
                   "masked=True for missing-data scoring)")
            )
        if mask is not None:
            mask = np.asarray(mask, np.float32)
            if mask.shape != x.shape:
                raise ValueError(
                    f"mask shape {mask.shape} != X shape {x.shape}"
                )
        eps = np.float32(self.config.eps)
        if h0 is not None:
            h0 = np.asarray(h0, np.float32)
            if h0.shape != (self.k, n):
                raise ValueError(
                    f"h0 must be ({self.k}, {n}), got {h0.shape}"
                )
        nb = self.n_block
        bounds = [(j0, min(j0 + nb, n)) for j0 in range(0, n, nb)]
        hs, iters, costs, convs = [], [], [], []

        def _place(idx):
            j0, j1 = bounds[idx]
            return self._place_block(
                *self._pad_block(
                    x[:, j0:j1], self._h0_block(h0, seed, idx, j0, j1, eps),
                    eps,
                    mask_blk=None if mask is None else mask[:, j0:j1],
                )
            )

        def _drain(idx, out):
            j0, j1 = bounds[idx]
            h, it, cost, conv = out
            hs.append(np.asarray(h, np.float32)[:, : j1 - j0])
            iters.append(int(it))
            costs.append(float(cost))
            convs.append(bool(conv))

        self._run_pipeline(len(bounds), _place, _drain, prefetch)
        return ServingResult(
            h=np.concatenate(hs, axis=1),
            block_iterations=np.asarray(iters, np.int32),
            block_costs=np.asarray(costs, np.float32),
            block_converged=np.asarray(convs, bool),
            n_block=nb,
        )

    def _h0_block(self, h0, seed, idx, j0, j1, eps):
        """Block ``idx``'s initial H at its REAL width (pre-padding).

        The default init is seeded PER BLOCK (``seed + idx``) so streaming
        callers never materialize a full (k, n) init — block 0 of a
        block-aligned single-block call is exactly ``RandomState(seed)
        .rand(k, n)``, the CLI transform's convention, which keeps
        ``serve`` bit-identical to ``transform`` at equal shapes."""
        if h0 is not None:
            return np.asarray(h0[:, j0:j1], np.float32)
        rng = np.random.RandomState((int(seed) + idx) % (2 ** 32))
        return np.maximum(rng.rand(self.k, j1 - j0).astype(np.float32), eps)

    def _pad_block(self, x_blk, h0_blk, eps, mask_blk=None):
        """Zero-pad X (clamped to eps inside the program) and eps-pad H to
        the exported block width; a mask's padding is ZERO (fully
        unobserved — padded columns contribute nothing to the masked
        objective at all)."""
        pad = self.n_block - x_blk.shape[1]
        if pad:
            x_blk = np.concatenate(
                [x_blk, np.zeros((self.m, pad), np.float32)], axis=1
            )
            h0_blk = np.concatenate(
                [h0_blk, np.full((self.k, pad), eps, np.float32)], axis=1
            )
            if mask_blk is not None:
                mask_blk = np.concatenate(
                    [mask_blk, np.zeros((self.m, pad), np.float32)], axis=1
                )
        if mask_blk is None:
            return x_blk, h0_blk
        return x_blk, h0_blk, mask_blk

    def _run_pipeline(self, n_blocks, place, drain, prefetch=True):
        """put -> dispatch -> drain over ``n_blocks`` blocks
        (models/streaming.py's pattern): block j+1's transfer rides the link
        while block j computes, and block j-1's H download drains at the
        same time.  Per-block inputs and programs are identical to the
        serial schedule, so results are bit-identical — only the overlap
        differs.  ``prefetch=False`` restores strictly serial scheduling
        (one block's inputs+outputs resident at a time) for artifacts whose
        block size nearly fills device memory."""
        if not prefetch:
            for idx in range(n_blocks):
                drain(idx, self._dispatch(place(idx)))
            return
        inflight = place(0)
        prev = None
        for idx in range(n_blocks):
            out = self._dispatch(inflight)  # async dispatch
            if idx + 1 < n_blocks:
                inflight = place(idx + 1)
            if prev is not None:
                drain(idx - 1, prev)
            prev = out
        drain(n_blocks - 1, prev)

    def _place_block(self, x_blk, h0_blk, mask_blk=None):
        """Start the (async) H2D of one block's inputs.

        Quantized-input artifacts quantize HERE (the bit-identical NumPy
        twins of the in-program quantization, ops/quant), so what rides the
        link is the uint8 codes + the small scale table — ~4x less than the
        f32 block the in-program-quantization artifact transfers."""
        if self.quantized:
            from .ops.quant import quantize_policy_np

            eps = self.config.eps
            xq = np.maximum(np.asarray(x_blk, np.float32), np.float32(eps))
            if mask_blk is not None:
                # mirror models.masked._masked_prep_jit_cached bit-for-bit:
                # clamp, THEN zero unobserved entries (garbage incl. NaN
                # must not reach the quantization scales), THEN quantize —
                # the host CAN reproduce the in-program masked prep because
                # the caller hands it the mask
                mask_blk = np.asarray(mask_blk, np.float32)
                if ((mask_blk != 0) & (mask_blk != 1)).any():
                    raise ValueError(
                        "quantized-input masked artifacts take a BINARY "
                        "observed-entry mask (the uint8 wire form cannot "
                        "carry weights) — serve weighted masks with the "
                        "in-program-quantization masked artifact"
                    )
                xq = np.where(mask_blk > 0, xq, np.float32(0.0))
            codes, scales = quantize_policy_np(
                xq, eps, int(self.config.precision.x_quant_rows or 0)
            )
            scales = np.asarray(scales, np.float32)
            # scale placement mirrors parallel.mesh.quant_scale_spec: 1-D
            # per-column scales shard with their columns; a 2-D row-block
            # table keeps its block rows on every row shard
            placed = (
                self._put(codes, ("mr", "mc")),
                self._put(
                    scales, ("mc",) if scales.ndim == 1 else (None, "mc")
                ),
                self._put(h0_blk, (None, "mc")),
            )
            if mask_blk is not None:
                # the v4 program's mask input is uint8 (1 byte/entry on the
                # wire; validated binary above)
                placed += (self._put(
                    (mask_blk > 0).astype(np.uint8), ("mr", "mc")
                ),)
            return placed
        placed = (
            self._put(x_blk, ("mr", "mc")),
            self._put(h0_blk, (None, "mc")),
        )
        if mask_blk is not None:
            placed += (self._put(mask_blk, ("mr", "mc")),)
        return placed

    def _dispatch(self, placed):
        """One exported-program dispatch on a placed (m, n_block) block.

        Dispatch is asynchronous: the returned arrays are futures, so the
        caller can enqueue the next block's transfer before fetching."""
        if self._w_dev is None:
            self._w_dev = self._put(self.w, ("mr", None))
        if self.quantized:
            codes, scales, h0_dev = placed[:3]
            h, it, cost, _hist, _nchecks, conv = self._fn(
                codes, scales, self._w_dev, h0_dev, *placed[3:]
            )
            return h, it, cost, conv
        x_dev, h0_dev = placed[0], placed[1]
        h, it, cost, _hist, _nchecks, conv = self._fn(
            x_dev, self._w_dev, h0_dev, *placed[2:]
        )
        return h, it, cost, conv

    def stream_bin(
        self,
        x_path: str,
        out_path: Optional[str] = None,
        h0: Optional[np.ndarray] = None,
        seed: int = 0,
        prefetch: bool = True,
        mask_path: Optional[str] = None,
    ) -> ServingResult:
        """Serve a ``.bin`` file in column blocks — neither X nor the
        default init ever loads into host memory (the format is
        column-major, so each X block is one contiguous read:
        models/streaming.BinColumnSource; the default h0 is generated per
        block, see :meth:`_h0_block`).

        Masked artifacts stream too: ``mask_path`` names a ``.bin`` of X's
        shape whose column blocks ride with X's (same contiguous reads), so
        missing-data scoring needs no in-memory mask either.

        With ``out_path`` the H columns are appended block by block to a
        temporary ``.part`` file that replaces ``out_path`` atomically on
        success (a failed stream never leaves a header-complete but
        payload-truncated .bin behind), so host memory stays at one block
        regardless of N; the returned result then has ``h=None``.
        Block-aligned results are identical to :meth:`__call__` on the
        loaded matrix (same h0 convention, same per-block program)."""
        import os

        from .io.binio import pack_header
        from .models.streaming import BinColumnSource

        if self.masked != (mask_path is not None):
            raise ValueError(
                "this artifact's program "
                + ("requires a mask: pass mask_path= (a .bin of X's shape "
                   "whose column blocks stream alongside X's)"
                   if self.masked else "takes no mask (export with "
                   "masked=True for missing-data scoring)")
            )
        src = BinColumnSource(x_path)
        m, n = src.shape
        if m != self.m:
            raise ValueError(
                f"{x_path} has {m} rows; artifact W is {self.m}x{self.k}"
            )
        if n == 0:
            raise ValueError(f"{x_path} has no columns")
        msrc = None
        if mask_path is not None:
            msrc = BinColumnSource(mask_path)
            if msrc.shape != (m, n):
                raise ValueError(
                    f"{mask_path} is {msrc.shape[0]}x{msrc.shape[1]}; the "
                    f"mask must match X ({m}x{n})"
                )
        eps = np.float32(self.config.eps)
        if h0 is not None:
            h0 = np.asarray(h0, np.float32)
            if h0.shape != (self.k, n):
                raise ValueError(f"h0 must be ({self.k}, {n}), got {h0.shape}")
        nb = self.n_block
        bounds = [(j0, min(j0 + nb, n)) for j0 in range(0, n, nb)]
        hs, iters, costs, convs = [], [], [], []
        tmp_path = (out_path + ".part") if out_path else None
        fout = open(tmp_path, "wb") if out_path else None

        def _place(idx):
            """Disk read + default init + padding + async H2D for one block."""
            j0, j1 = bounds[idx]
            return self._place_block(
                *self._pad_block(
                    src.columns(j0, j1),
                    self._h0_block(h0, seed, idx, j0, j1, eps),
                    eps,
                    mask_blk=(
                        None if msrc is None else msrc.columns(j0, j1)
                    ),
                )
            )

        def _drain(idx, out):
            j0, j1 = bounds[idx]
            h, it, cost, conv = out
            h_np = np.asarray(h, np.float32)[:, : j1 - j0]
            if fout is not None:
                # column-major payload, appended block by block — exactly
                # write_matrix's layout
                fout.write(h_np.tobytes(order="F"))
            else:
                hs.append(h_np)
            iters.append(int(it))
            costs.append(float(cost))
            convs.append(bool(conv))

        try:
            if fout is not None:
                fout.write(pack_header(self.k, n))
            self._run_pipeline(len(bounds), _place, _drain, prefetch)
            if fout is not None:
                # close + atomic publish inside the cleanup scope: a failed
                # os.replace (permissions, cross-filesystem out_path) must
                # not strand the completed .part file
                fout.close()
                fout = None
                os.replace(tmp_path, out_path)
        except BaseException:
            if fout is not None:
                fout.close()
            if tmp_path is not None and os.path.exists(tmp_path):
                try:
                    os.unlink(tmp_path)
                except OSError:
                    pass
            raise
        return ServingResult(
            h=np.concatenate(hs, axis=1) if hs else None,
            block_iterations=np.asarray(iters, np.int32),
            block_costs=np.asarray(costs, np.float32),
            block_converged=np.asarray(convs, bool),
            n_block=nb,
        )


def load_transform(path: str, mesh=None) -> ServingTransform:
    """Load a :func:`save_transform` artifact into a callable.

    For an artifact exported with ``mesh_shape``, ``mesh`` supplies the
    device mesh to serve on (shape must match); when omitted, the canonical
    mesh is built from this process's devices (``parallel.make_mesh``)."""
    from jax import export as jax_export

    with zipfile.ZipFile(path, "r") as zf:
        members = set(zf.namelist())
        if "meta.json" not in members:
            raise ValueError(f"{path}: not an nmf_tpu serving artifact")
        meta = json.loads(zf.read("meta.json"))
        if meta.get("magic") != _MAGIC:
            raise ValueError(f"{path}: not an nmf_tpu serving artifact")
        if int(meta.get("format_version", -1)) > FORMAT_VERSION:
            raise ValueError(
                f"{path}: format v{meta['format_version']} is newer than "
                f"this library (v{FORMAT_VERSION})"
            )
        missing = {"program.bin", "w.npy"} - members
        if missing:
            raise ValueError(
                f"{path}: truncated artifact (missing {sorted(missing)})"
            )
        exported = jax_export.deserialize(zf.read("program.bin"))
        w = np.load(io.BytesIO(zf.read("w.npy")))
    expect = (int(meta.get("m", -1)), int(meta.get("k", -1)))
    if w.ndim != 2 or w.shape != expect:
        # a corrupt/tampered w.npy otherwise surfaces as an opaque
        # calling-convention error deep inside the exported program
        raise ValueError(
            f"{path}: corrupt artifact — w.npy is "
            f"{getattr(w, 'shape', None)}, meta says {expect}"
        )
    # cross-check meta against the program's OWN input signature: a meta
    # whose n_block/masked/quantized_input drifted from program.bin would
    # otherwise pad blocks to the wrong width or pass the wrong arity,
    # failing at first call with the same opaque deep error the w.npy guard
    # prevents.  Signatures: (x, w, h0[, mask]) — x is in_avals[0] — or
    # (codes, scales, w, h0[, mask]) for quantized-input artifacts.
    avals = list(exported.in_avals)
    quantized = bool(meta.get("quantized_input", False))
    want_args = 3 + bool(meta.get("masked")) + quantized
    if len(avals) != want_args:
        raise ValueError(
            f"{path}: corrupt artifact — meta says masked={bool(meta.get('masked'))} "
            f"quantized_input={quantized} ({want_args} program inputs) but "
            f"program.bin takes {len(avals)}"
        )
    n_block = int(meta.get("n_block", -1))
    x_shape = tuple(avals[0].shape)
    if len(x_shape) != 2 or x_shape[1] != n_block or x_shape[0] != expect[0]:
        raise ValueError(
            f"{path}: corrupt artifact — meta says X blocks are "
            f"{(expect[0], n_block)} but program.bin takes {x_shape}"
        )
    if quantized and str(avals[0].dtype) != "uint8":
        raise ValueError(
            f"{path}: corrupt artifact — meta says quantized_input but "
            f"program.bin's first input is {avals[0].dtype}, not uint8"
        )
    config = _config_from_dict(meta["config"])
    return ServingTransform(exported, w, config, meta, mesh=mesh)
