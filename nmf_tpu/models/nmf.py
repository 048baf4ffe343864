"""High-level NMF model API: fit / transform / inverse_transform.

The reference exposes only the one-shot ``main`` pipeline.  Real NMF usage
(the paper's own application — drum-source separation — refits H for new
audio against a fixed learned dictionary W) needs:

  * ``fit(X)``        — learn W (and H) from data
  * ``transform(X)``  — solve for H with W FIXED (the inference path: only
                        the H half-update iterates; cf. nmf.cu:118-146)
  * ``inverse_transform(H)`` — reconstruct W @ H

API shape follows scikit-learn's ``sklearn.decomposition.NMF`` so users can
swap it in; the compute runs through this framework's jitted solvers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.divergence import beta_divergence, kl_divergence
from ..ops.mu import update_h
from ..utils.config import Precision, SolveConfig
from .init import nndsvd_init, random_init, scaled_random_init
from .solver import SolveResult, run_checked_loop, solve

__all__ = ["NMF", "solve_h_only", "solve_w_only", "normalize_factors"]


def normalize_factors(w, h, norm: str = "l1"):
    """Rescale each dictionary column of W to unit norm, compensating H.

    The standard NMF post-processing for comparable components: the product
    is INVARIANT (``w_k -> w_k / s_k``, ``h_k -> h_k * s_k``), so costs and
    reconstructions do not change — only the W/H scale split.  ``norm`` is
    'l1' (columns sum to 1 — components read as distributions), 'l2', or
    'max' (peak-normalized spectra, the audio convention).  All-zero
    columns (possible under HALS or rank-sweep embeddings) pass through
    unscaled.  Host-side NumPy: this is a one-time post-fit step.
    """
    w = np.asarray(w, np.float32)
    h = np.asarray(h, np.float32)
    if norm == "l1":
        s = w.sum(axis=0)
    elif norm == "l2":
        s = np.sqrt((w * w).sum(axis=0))
    elif norm == "max":
        s = w.max(axis=0)
    else:
        raise ValueError(f"norm must be 'l1', 'l2' or 'max', got {norm!r}")
    s = np.where(s > 0, s, np.float32(1.0)).astype(np.float32)
    return w / s[None, :], h * s[:, None]

_F32 = jnp.float32


def _h_only_step_cost(config: SolveConfig):
    """(step, cost) pair for the H-only half-update under ``config``.

    Shared by the jitted transform solver below and by the AOT export path
    (:mod:`nmf_tpu.serving`), so a serialized serving program runs the exact
    same update the live library does."""
    eps, prec = config.eps, config.precision
    step_takes_pair = False  # set True when the step consumes (codes, scales)
    if config.algorithm == "hals":
        from ..ops.hals import _update_h_hals

        def step(w, h, x):
            return w, _update_h_hals(w, h, x, eps, prec)

        cost = functools.partial(beta_divergence, beta=2.0, eps=eps)
    elif config.beta == 1.0 and config.regularized:
        from ..ops.mu import matmul as _mm

        def step(w, h, x):
            # the H half of mu_step_kl_reg: penalty gradient in the denominator
            z = x / jnp.maximum(_mm(w, h, prec), eps)
            sum_w = jnp.maximum(jnp.sum(w, axis=0, dtype=_F32), eps)
            numer = _mm(w, z, prec, transpose_a=True)
            denom = sum_w[:, None] + config.l1_h + config.l2_h * h.astype(_F32)
            return w, (h * (numer / denom)).astype(h.dtype)

        def cost(x, w, h):
            hf = h.astype(_F32)
            pen = config.l1_h * jnp.sum(jnp.abs(hf)) + 0.5 * config.l2_h * jnp.sum(hf * hf)
            return kl_divergence(x, w, h, eps) + pen

    elif config.beta == 1.0:
        if config.backend == "pallas":
            from ..ops.pallas import fused_mu

            if config.precision.x_dtype == "int8" and config.precision.x_quant_rows:
                raise NotImplementedError(
                    "per-row-block int8 scales take the jnp path (the fused "
                    "kernels' scales operand is per-column); drop "
                    "backend='pallas' or x_quant_rows"
                )

            def step(w, h, x):
                # int8 X: the fused kernel takes the (codes, scales) pair
                # and dequantizes in-register — do NOT dequant-wrap it (a
                # wrapped step would materialize full f32 X in HBM each
                # iteration, same rule as solver.resolve_step_fn)
                return w, fused_mu.update_h_fused(w, h, x, eps, prec)

            step_takes_pair = True
        else:
            def step(w, h, x):
                return w, update_h(w, h, x, eps, prec)

        cost = functools.partial(kl_divergence, eps=eps)
    else:
        from ..ops import mu

        def step(w, h, x):
            # the H half of the beta-MU step only (see ops.mu.mu_step_beta)
            num, den = mu._beta_ratios(w, h, x, config.beta, eps, prec)
            h_num = mu.matmul(w, num, prec, transpose_a=True)
            h_den = jnp.maximum(mu.matmul(w, den, prec, transpose_a=True), eps)
            return w, (h * (h_num / h_den)).astype(h.dtype)

        cost = functools.partial(beta_divergence, beta=config.beta, eps=eps)

    if config.precision.x_dtype == "int8":
        from .solver import _dequant_wrap_cost, _dequant_wrap_step

        if not step_takes_pair:
            step = _dequant_wrap_step(step)
        cost = _dequant_wrap_cost(cost)
    return step, cost


@functools.lru_cache(maxsize=16)
def _h_only_jit(config: SolveConfig, platform: Optional[str] = None):
    """Jitted H-only solve: W fixed, H iterates (transform/inference path)."""
    step, cost = _h_only_step_cost(config)

    @jax.jit
    def _solve(x, w, h, initial_cost=None, initial_momentum=None,
               initial_extrap=None):
        return run_checked_loop(
            x, w, h, config, step, cost, initial_cost=initial_cost,
            initial_momentum=initial_momentum, initial_extrap=initial_extrap,
        )

    return _solve


@functools.lru_cache(maxsize=8)
def _h_only_sharded_jit(config: SolveConfig, mesh):
    from ..parallel.sharded import build_sharded_h_solver

    return build_sharded_h_solver(config, mesh)


def solve_h_only(
    x, w, h0, config: SolveConfig = SolveConfig(), mesh=None
) -> SolveResult:
    """Iterate only the H half-update with W fixed (NMF inference).

    Same loop/convergence machinery as :func:`nmf_tpu.solve`; per iteration
    this is exactly the reference's ``update_h`` (nmf.cu:118-146) without the
    subsequent ``update_w``.

    With ``mesh`` the solve runs distributed over the canonical ('mr', 'mc')
    layout — the pod-scale inference path (W fixed/replicated over 'mc',
    only K-sized products psum per iteration, for the MU families and HALS
    alike).
    """
    config.validate()
    quant = config.precision.x_dtype == "int8"
    if isinstance(x, tuple):
        # pre-quantized (codes, scales) pair: same boundary contract as
        # solve() — the compiled dequant path is config-keyed
        if not quant:
            raise ValueError(
                "X is a pre-quantized (codes, scales) pair but "
                f"Precision(x_dtype={config.precision.x_dtype!r}) — "
                "pre-quantized input requires x_dtype='int8' (quantize with "
                "ops.quant.quantize_policy on the same Precision)"
            )
        want = 2 if config.precision.x_quant_rows else 1
        if x[1].ndim != want:
            raise ValueError(
                f"pre-quantized scales are {x[1].ndim}-D but "
                f"Precision(x_quant_rows={config.precision.x_quant_rows}) "
                f"expects {want}-D — quantize with ops.quant.quantize_policy "
                f"on the same Precision"
            )
    sx = jnp.shape(x[0]) if isinstance(x, tuple) else jnp.shape(x)
    sw, sh = jnp.shape(w), jnp.shape(h0)
    if sx != (sw[0], sh[1]) or sw[1] != sh[0]:
        raise ValueError(f"shape mismatch: X{sx} vs W{sw} @ H{sh}")
    # one program launch for clamp + casts (+ int8 quantization): repeated
    # transform() calls pay per-launch tunnel RPCs (see solver._prep_jit)
    from .solver import _prep_jit

    x, w, h0 = _prep_jit(config, isinstance(x, tuple))(x, w, h0)
    if mesh is not None:
        from ..parallel.mesh import shard_problem

        # shard_problem also places a quantized (codes, scales) X pair
        x, w, h0 = shard_problem(x, w, h0, mesh)
        from .solver import maybe_live_chunked

        fallback = maybe_live_chunked(
            lambda c: _h_only_sharded_jit(c, mesh), x, w, h0, config, mesh
        )
        if fallback is not None:
            return fallback
        return _h_only_sharded_jit(config, mesh)(
            x, w, h0, jnp.asarray(jnp.nan, _F32), jnp.asarray(jnp.nan, _F32)
        )
    import dataclasses as _dc

    from .solver import _default_platform

    platform = _default_platform(x)  # handles the (codes, scales) tuple too
    if config.beta == 1.0 and config.backend in ("auto", "autotune"):
        # same measured per-shape policy as solve() (utils/autotune.py) —
        # including its int8 exclusion (Mosaic's uint8 cast is ~1000x
        # slower than the math it feeds; a dequant-then-Pallas wrap would
        # materialize full f32 X in HBM each iteration)
        if (
            platform == "tpu"
            and not config.regularized
            and config.precision.x_dtype != "int8"
        ):
            from ..utils.autotune import rule_pick

            choice = rule_pick(
                w.shape[0], w.shape[1], h0.shape[1],
                config.precision.matmul_dtype,
            )
        else:
            choice = "jnp"
        config = _dc.replace(config, backend=choice)
    from .solver import maybe_live_chunked

    def make_fn(c):
        # bare jit fn (4 positional args): exposes .lower for the chunked
        # driver's AOT tail compile
        return _h_only_jit(c, platform)

    fallback = maybe_live_chunked(make_fn, x, w, h0, config)
    if fallback is not None:
        return fallback
    return _h_only_jit(config, platform)(x, w, h0)


def solve_w_only(
    x, w0, h, config: SolveConfig = SolveConfig(), mesh=None
) -> SolveResult:
    """Iterate only the W half-update with H fixed (dictionary adaptation).

    The exact transpose of :func:`solve_h_only`: ``D(X || W H) ==
    D(X^T || H^T W^T)``, and the reference's W update (nmf.cu:148-176) is
    the H update of the transposed problem — so this is a thin transposition
    wrapper with identical numerics, families, and convergence semantics.

    With ``mesh`` the transposed problem runs on the same canonical
    ('mr', 'mc') layout, so N must divide the mesh rows and M its columns.
    """
    if isinstance(x, tuple):
        raise NotImplementedError(
            "solve_w_only transposes the problem, and per-column int8 scales "
            "do not transpose — pass the float X (it is quantized "
            "column-wise on the transposed orientation internally)"
        )
    xt = np.asarray(x, np.float32).T if not hasattr(x, "T") else x.T
    h = np.asarray(h, np.float32) if not hasattr(h, "T") else h
    w0 = np.asarray(w0, np.float32) if not hasattr(w0, "T") else w0
    if config.regularized:
        # the W penalties become the transposed problem's H penalties
        import dataclasses

        config = dataclasses.replace(
            config,
            l1_h=config.l1_w, l2_h=config.l2_w,
            l1_w=config.l1_h, l2_w=config.l2_h,
        )
    res = solve_h_only(xt, h.T, w0.T, config, mesh=mesh)
    # transpose back: the transposed result's fixed 'w' is the (clamped) H
    return SolveResult(
        w=res.h.T,
        h=res.w.T,
        iterations=res.iterations,
        cost=res.cost,
        cost_history=res.cost_history,
        num_checks=res.num_checks,
        converged=res.converged,
        momentum=res.momentum,
    )


class NMF:
    """scikit-learn-style NMF estimator running on the TPU solver.

    Parameters mirror ``sklearn.decomposition.NMF`` where they overlap:
    ``n_components`` (the rank K), ``init`` ('random' | 'scaled' | 'nndsvd' |
    'nndsvda' | 'nndsvdar'), ``beta_loss`` (2=Frobenius, 1=KL — the reference
    algorithm — 0=Itakura-Saito, or any float), ``max_iter``, ``tol``
    (relative cost-change threshold; 0 = exactly max_iter iterations),
    ``random_state`` (seed), ``solver`` ('mu' = multiplicative updates, the
    reference algorithm; 'cd'/'hals' = HALS coordinate descent, Frobenius
    only — sklearn's default), and ``alpha_W`` / ``alpha_H`` / ``l1_ratio``
    (regularization with sklearn's exact dimension scaling; KL-MU family).

    Extra knobs: ``precision`` (fp32 / bf16 MXU policy), ``backend``,
    ``accelerate`` (safeguarded Nesterov-extrapolated updates — 4-6x fewer
    iterations to the same converged cost, monotone by construction),
    ``check_every``, ``n_restarts`` (fit from several seeded inits in one
    compiled batch — :func:`nmf_tpu.solve_restarts` — and keep the
    lowest-cost factorization), and ``mesh`` — a ('mr','mc') device mesh that routes
    fit through the sharded solver and transform through the sharded H-only
    solver (the extension matrix is orthogonal to the parallelism matrix).

    Attributes after ``fit``: ``components_`` (H, K x N in sklearn's
    convention of components-by-features when fitting X as samples x
    features... here we keep the reference's X = W @ H orientation:
    ``components_`` is H), ``reconstruction_err_`` (the RAW final
    divergence D — note sklearn reports ``sqrt(2*D)``), ``n_iter_``.
    """

    def __init__(
        self,
        n_components: int,
        init: str = "nndsvda",
        beta_loss: float = 1.0,
        max_iter: int = 200,
        tol: float = 0.0,
        check_every: int = 25,
        random_state: int = 0,
        precision: Precision = Precision(),
        backend: str = "auto",
        solver: str = "mu",
        mesh=None,
        n_restarts: int = 1,
        alpha_W: float = 0.0,
        alpha_H="same",
        l1_ratio: float = 0.0,
        accelerate: bool = False,
    ):
        self.mesh = mesh
        self.accelerate = bool(accelerate)
        self.n_restarts = int(n_restarts)
        self.alpha_W = float(alpha_W)
        self.alpha_H = alpha_H
        self.l1_ratio = float(l1_ratio)
        self.n_components = int(n_components)
        self.init = init
        self.beta_loss = float(beta_loss)
        self.max_iter = int(max_iter)
        self.tol = float(tol)
        self.check_every = int(check_every)
        self.random_state = int(random_state)
        self.precision = precision
        self.backend = backend
        self.solver = {"cd": "hals"}.get(solver, solver)  # sklearn alias
        self.components_: Optional[np.ndarray] = None
        self.w_: Optional[np.ndarray] = None
        self.reconstruction_err_: Optional[float] = None
        self.n_iter_: Optional[int] = None

    def _config(
        self,
        max_iter: Optional[int] = None,
        shape: Optional[tuple] = None,
    ) -> SolveConfig:
        # sklearn's exact regularization scaling (sklearn/decomposition/
        # _nmf.py _compute_regularization): the W penalties scale with the
        # number of features and H's with the number of samples.  In our
        # X = W @ H orientation samples are rows (M) and features columns
        # (N): l1_W = N * alpha_W * l1_ratio, l2_W = N * alpha_W *
        # (1 - l1_ratio), and symmetrically for H with M.
        l1_w = l2_w = l1_h = l2_h = 0.0
        alpha_h = self.alpha_W if self.alpha_H == "same" else float(self.alpha_H)
        if shape is not None and (self.alpha_W or alpha_h):
            m, n = shape
            l1_w = n * self.alpha_W * self.l1_ratio
            l2_w = n * self.alpha_W * (1.0 - self.l1_ratio)
            l1_h = m * alpha_h * self.l1_ratio
            l2_h = m * alpha_h * (1.0 - self.l1_ratio)
        return SolveConfig(
            max_iter=self.max_iter if max_iter is None else max_iter,
            thresh=self.tol,
            check_every=self.check_every,
            precision=self.precision,
            backend=self.backend,
            beta=self.beta_loss,
            algorithm=self.solver,
            l1_w=l1_w, l2_w=l2_w, l1_h=l1_h, l2_h=l2_h,
            accelerate=self.accelerate,
        )

    def _init_factors(self, x: np.ndarray):
        m, n = x.shape
        k = self.n_components
        if self.init == "random":
            return random_init(m, k, n, seed=self.random_state)
        if self.init == "scaled":
            return scaled_random_init(x, k, seed=self.random_state)
        return nndsvd_init(x, k, variant=self.init, seed=self.random_state)

    def fit(self, x, w0=None, h0=None) -> "NMF":
        self.fit_transform(x, w0=w0, h0=h0)
        return self

    def fit_transform(self, x, w0=None, h0=None) -> np.ndarray:
        """Learn W and H for ``x``; returns W (the sample representation)."""
        x = np.asarray(x, np.float32)
        if self.n_restarts > 1 and (w0 is not None or h0 is not None):
            raise ValueError(
                "n_restarts > 1 draws per-restart random inits — it cannot "
                "honor explicit w0/h0 templates (all restarts would be "
                "identical); pass n_restarts=1 or drop the templates"
            )
        if self.n_restarts > 1 and w0 is None and h0 is None:
            # all restarts in one compiled batch; keep the lowest-cost fit.
            # deterministic nndsvd inits would make identical members —
            # fall back to the seed-sensitive 'scaled' family for them.
            from .selection import solve_restarts

            init = self.init if self.init in ("random", "scaled", "nndsvdar") \
                else "scaled"
            if init != self.init:
                import warnings

                warnings.warn(
                    f"init={self.init!r} is deterministic and would make "
                    f"identical restart members; using 'scaled' with seeds "
                    f"{self.random_state}..{self.random_state + self.n_restarts - 1}",
                    stacklevel=2,
                )
            mesh = self.mesh
            if mesh is not None:
                # restarts are pure data parallelism over members: flatten
                # the ('mr','mc') mesh into one member axis
                from jax.sharding import Mesh

                mesh = Mesh(
                    np.asarray(list(mesh.devices.flat)), ("members",)
                )
            sel = solve_restarts(
                x,
                rank=self.n_components,
                n_restarts=self.n_restarts,
                config=self._config(shape=x.shape),
                seed=self.random_state,
                init=init,
                mesh=mesh,
            )
            best = sel.best_index
            w_b, h_b = sel.factors(best)
            self.w_ = np.asarray(w_b)
            self.components_ = np.asarray(h_b)
            self.reconstruction_err_ = self._pure_err(x, sel.best_cost)
            self.n_iter_ = int(sel.iterations[best])
            return self.w_
        if w0 is None or h0 is None:
            wi, hi = self._init_factors(x)
            w0 = wi if w0 is None else w0
            h0 = hi if h0 is None else h0
        if self.mesh is not None:
            from ..parallel.sharded import solve_sharded

            res = solve_sharded(x, w0, h0, self._config(shape=x.shape), mesh=self.mesh)
        else:
            res = solve(x, w0, h0, self._config(shape=x.shape))
        self.w_ = np.asarray(res.w)
        self.components_ = np.asarray(res.h)
        self.reconstruction_err_ = self._pure_err(x, float(res.cost))
        self.n_iter_ = int(res.iterations)
        return self.w_

    def _pure_err(self, x: np.ndarray, solver_cost: float) -> float:
        """sklearn's ``reconstruction_err_`` is the PURE beta-divergence; the
        solver's cost includes the L1/L2 penalty terms when regularization
        is on, so recompute the divergence from the fitted factors then."""
        alpha_h = self.alpha_W if self.alpha_H == "same" else float(self.alpha_H)
        if not self.alpha_W and not alpha_h:
            return solver_cost
        return -self.score(x)

    def transform(
        self,
        x,
        h0=None,
        max_iter: Optional[int] = None,
        out_of_core: bool = False,
        mask=None,
    ) -> np.ndarray:
        """Solve for H against the learned W... for NEW columns of data.

        In the X = W @ H orientation, new data are new columns (time frames):
        ``x`` is (M, N_new) and the result is H_new (K, N_new).

        With ``out_of_core`` the columns are streamed
        (:func:`nmf_tpu.transform_out_of_core`): ``x`` may also be a
        ``.bin`` path or memmap far larger than device memory.

        ``mask`` (same shape as ``x``; 0 = missing) scores partially
        observed columns — only the observed entries drive the fit
        (:func:`nmf_tpu.solve_masked_h_only`; with ``out_of_core`` the mask
        streams alongside X, :func:`nmf_tpu.transform_out_of_core`).
        """
        if self.w_ is None:
            raise RuntimeError("transform() before fit()")
        if mask is not None:
            if out_of_core:
                # the streamed masked transform landed after this guard:
                # the mask streams block-aligned with X
                from .streaming import _as_source, transform_out_of_core

                shape = _as_source(x).shape
                res = transform_out_of_core(
                    x, self.w_, h0=h0,
                    config=self._config(max_iter, shape=shape),
                    mesh=self.mesh, seed=self.random_state, mask=mask,
                )
                return np.asarray(res.h)
            from .masked import solve_masked_h_only

            x = np.asarray(x, np.float32)
            mask = np.asarray(mask, np.float32)
            if h0 is None:
                rng = np.random.RandomState(self.random_state)
                h0 = rng.rand(self.n_components, x.shape[1]).astype(np.float32)
            res = solve_masked_h_only(
                x, self.w_, h0, mask,
                self._config(max_iter, shape=x.shape), mesh=self.mesh,
            )
            return np.asarray(res.h)
        if out_of_core:
            from .streaming import _as_source, transform_out_of_core

            # the regularization scaling needs the GLOBAL dims; sources
            # know their shape without loading any data
            shape = _as_source(x).shape
            res = transform_out_of_core(
                x, self.w_, h0=h0,
                config=self._config(max_iter, shape=shape),
                mesh=self.mesh, seed=self.random_state,
            )
            return res.h
        x = np.asarray(x, np.float32)
        k = self.n_components
        if h0 is None:
            rng = np.random.RandomState(self.random_state)
            h0 = rng.rand(k, x.shape[1]).astype(np.float32)
        res = solve_h_only(
            x, self.w_, h0, self._config(max_iter, shape=x.shape),
            mesh=self.mesh,
        )
        return np.asarray(res.h)

    def inverse_transform(self, h) -> np.ndarray:
        if self.w_ is None:
            raise RuntimeError("inverse_transform() before fit()")
        return np.asarray(self.w_ @ np.asarray(h, np.float32))

    def score(self, x, y=None) -> float:
        """Negative divergence of the fit (higher is better, sklearn-style).

        ``y`` is accepted and ignored (the supervised-signature convention
        sklearn's model-selection utilities call with)."""
        import jax.numpy as jnp

        x = jnp.maximum(jnp.asarray(x, _F32), 2.2204e-16)
        d = beta_divergence(x, jnp.asarray(self.w_), jnp.asarray(self.components_), self.beta_loss)
        return -float(d)

    # -- sklearn estimator protocol (clone / GridSearchCV / Pipeline) ------
    # every __init__ parameter, by its __init__ name
    _param_names = (
        "n_components", "init", "beta_loss", "max_iter", "tol",
        "check_every", "random_state", "precision", "backend", "solver",
        "mesh", "n_restarts", "alpha_W", "alpha_H", "l1_ratio", "accelerate",
    )

    def get_params(self, deep: bool = True) -> dict:
        """All constructor parameters (``sklearn.base.clone`` contract).

        ``solver`` comes back normalized ('cd' is stored as its alias
        'hals'), which clone accepts — both construct the same estimator."""
        return {name: getattr(self, name) for name in self._param_names}

    def set_params(self, **params) -> "NMF":
        for name, value in params.items():
            if name not in self._param_names:
                raise ValueError(
                    f"invalid parameter {name!r} for NMF; valid: "
                    f"{sorted(self._param_names)}"
                )
            if name == "solver":
                value = {"cd": "hals"}.get(value, value)
            setattr(self, name, value)
        return self

    def __sklearn_tags__(self):
        # sklearn >= 1.6 asks estimators for capability tags; delegate to
        # BaseEstimator's defaults (unbound — this class does not inherit
        # from sklearn, which stays an optional dependency)
        from sklearn.base import BaseEstimator

        tags = BaseEstimator.__sklearn_tags__(self)
        tags.estimator_type = None  # unsupervised transformer
        tags.input_tags.positive_only = True
        return tags
