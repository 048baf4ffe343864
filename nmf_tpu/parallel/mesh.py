"""Device-mesh construction and sharding layouts for distributed NMF.

The reference is single-process / single-GPU (SURVEY.md section 2.3: no
NCCL/MPI anywhere) — this module is where the TPU rebuild *adds* scale-out.

Layout (SURVEY.md section 7 step 7; the scaling-book recipe — pick a mesh,
annotate shardings, let collectives ride ICI):

    mesh axes:    ('mr', 'mc')  — rows/cols of the data matrix X
    X:  P('mr', 'mc')           — 2-D blocked
    W:  P('mr', None)           — row-sharded, replicated over 'mc'
    H:  P(None, 'mc')           — col-sharded, replicated over 'mr'

With K (the rank) replicated, the local W_loc @ H_loc is *exactly* the local
block of W@H — the reconstruction needs no communication at all.  The only
collectives per iteration are K-sized psums:

    W^T Z  numerator  -> psum over 'mr'   (K x N/c values)
    colsum(W)         -> psum over 'mr'   (K values)
    Z H^T  numerator  -> psum over 'mc'   (M/r x K values)
    rowsum(H)         -> psum over 'mc'   (K values)
    KL cost partial   -> psum over both   (1 value, every check_every iters)

The N (time-frames) axis sharding over 'mc' is the NMF analog of sequence/
context parallelism (SURVEY.md section 5, "long-context"): an hour of audio
at ~172 frames/s shards its ~620k-frame axis across the mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "ROW_AXIS",
    "COL_AXIS",
    "make_mesh",
    "factor_shapes",
    "nmf_shardings",
    "quant_scale_spec",
    "shard_problem",
]

ROW_AXIS = "mr"  # shards M (rows of X / rows of W)
COL_AXIS = "mc"  # shards N (cols of X / cols of H)


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D ('mr', 'mc') mesh over the given (default: all) devices.

    ``shape=None`` picks the most-square factorization of the device count,
    biased toward more row shards (M is usually the long axis in NMF; for
    spectrogram workloads where N dominates, pass an explicit shape).
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = len(devs)
    if shape is None:
        r = int(np.sqrt(n))
        while n % r != 0:
            r -= 1
        shape = (max(r, n // r), min(r, n // r))
    need = shape[0] * shape[1]
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    arr = np.asarray(devs[:need]).reshape(shape)
    return Mesh(arr, (ROW_AXIS, COL_AXIS))


def quant_scale_spec(ndim: int) -> P:
    """The ONE definition of quantized-X scale placement on the mesh:
    a 1-D per-column scale vector shards over 'mc' with its columns; a 2-D
    per-(row-block, column) table (``Precision.x_quant_rows``) keeps its
    full R block rows on every 'mr' shard (the R x N/c f32 table is tiny)
    and shards columns over 'mc'.  Used both config-keyed (the shard_map
    in_specs in parallel/sharded.py) and data-keyed (the device_put
    placement here and in models/masked._put_x) — one helper so the two
    sides cannot diverge."""
    if ndim not in (1, 2):
        raise ValueError(f"quantized scales must be 1-D or 2-D, got {ndim}-D")
    return P(COL_AXIS) if ndim == 1 else P(None, COL_AXIS)


def quant_scale_spec_for(precision) -> P:
    """Config-keyed form of :func:`quant_scale_spec`: the scale spec a
    Precision implies (2-D table iff ``x_quant_rows``).  Every config-keyed
    caller goes through this so the ndim-from-config rule cannot drift."""
    return quant_scale_spec(2 if precision.x_quant_rows else 1)


def nmf_shardings(mesh: Mesh):
    """(x, w, h, replicated) NamedShardings for the canonical layout."""
    return (
        NamedSharding(mesh, P(ROW_AXIS, COL_AXIS)),
        NamedSharding(mesh, P(ROW_AXIS, None)),
        NamedSharding(mesh, P(None, COL_AXIS)),
        NamedSharding(mesh, P()),
    )


def factor_shapes(m: int, k: int, n: int, mesh: Mesh) -> Tuple[Tuple[int, int], ...]:
    """Per-device local shapes ((m_loc, n_loc), (m_loc, k), (k, n_loc))."""
    r = mesh.shape[ROW_AXIS]
    c = mesh.shape[COL_AXIS]
    if m % r or n % c:
        raise ValueError(
            f"global dims (M={m}, N={n}) must divide the mesh {dict(mesh.shape)}; "
            f"pad the problem or choose a different mesh shape"
        )
    return ((m // r, n // c), (m // r, k), (k, n // c))


def shard_problem(x, w, h, mesh: Mesh):
    """Place (X, W, H) onto the mesh with the canonical shardings.

    ``x`` may also be a quantized ``(codes, scales)`` pair: the uint8 codes
    shard like X; a 1-D per-column scale vector shards over 'mc', and a 2-D
    per-(row-block, column) scale table (``Precision.x_quant_rows``) keeps
    its full block rows on every 'mr' shard — the R x N table is tiny, and
    replicating the row axis lets each shard gather the block rows its local
    X rows fall in regardless of shard/block alignment.
    """
    xs, ws, hs, _ = nmf_shardings(mesh)
    if isinstance(x, tuple):
        x = (
            jax.device_put(x[0], xs),
            jax.device_put(
                x[1], NamedSharding(mesh, quant_scale_spec(x[1].ndim))
            ),
        )
    else:
        x = jax.device_put(x, xs)
    return (
        x,
        jax.device_put(w, ws),
        jax.device_put(h, hs),
    )


def init_distributed(**kwargs) -> None:
    """Initialize multi-host JAX (pod slices / multi-slice DCN).

    Thin wrapper over ``jax.distributed.initialize`` so multi-host entry is
    one call before :func:`make_mesh` (which then spans all global devices).
    Safe to call when already initialized or single-host (no-op on errors
    that indicate single-process use).
    """
    import jax

    import os

    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        msg = str(e).lower()
        if "already" in msg:
            return
        # bare call outside any cluster environment: the docstring promises
        # single-host safety, and auto-detection raising about a missing
        # coordinator is exactly the single-process case.  NOTE: this must
        # key on the ENVIRONMENT, not jax.process_count() (which is always
        # 1 after a failed initialize) — on a cluster-managed job the error
        # must surface, or the run silently degrades to one host.
        cluster_env = any(
            os.environ.get(v)
            for v in (
                "JAX_COORDINATOR_ADDRESS",
                "COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS",
                "SLURM_JOB_ID",
                "OMPI_COMM_WORLD_SIZE",
            )
        )
        # TPU_WORKER_HOSTNAMES indicates a pod only when it names MORE THAN
        # ONE worker (single-host platforms — this machine included — set
        # it to 'localhost')
        hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len([h for h in hosts.split(",") if h.strip()]) > 1:
            cluster_env = True
        # schedulers the heuristic doesn't know: NMF_TPU_REQUIRE_DISTRIBUTED=1
        # forces the raise so a cluster job can never silently degrade to
        # single-host ('0'/'false'/'no'/empty explicitly opt OUT)
        if os.environ.get("NMF_TPU_REQUIRE_DISTRIBUTED", "").strip().lower() \
                not in ("", "0", "false", "no"):
            cluster_env = True
        if not kwargs and not cluster_env:
            import warnings

            warnings.warn(
                "jax.distributed.initialize failed and no cluster environment "
                "was detected; continuing single-host.  If this IS a "
                "multi-host job, set NMF_TPU_REQUIRE_DISTRIBUTED=1 to make "
                f"this fatal.  (initialize error: {e})",
                RuntimeWarning,
                stacklevel=2,
            )
            return
        raise
