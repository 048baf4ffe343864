"""Audio source separation via spectrogram NMF — the reference's application.

The reference library exists to accelerate exactly this pipeline (bundled
paper, ISMIR 2009): magnitude STFT of audio -> KL-NMF into K spectral basis
vectors (columns of W) with activations (rows of H) -> per-component Wiener
masking -> ISTFT back to audio sources.  The paper's workload is a 20 s clip
at 44.1 kHz, 1024-point FFT, hop 256 -> X of 513 x ~3445 (paper section 3.4).

The NMF step runs on the accelerator via this framework's solver; the
STFT/ISTFT and Wiener masking are host-side pre/post-processing in NumPy
(they are a rounding error of the total compute, and complex-array device
transfers are not supported on all TPU transports).  jnp ``stft``/``istft``
equivalents are exported for fully on-device pipelines.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..utils.config import SolveConfig
from .init import scaled_random_init
from .solver import SolveResult, solve

__all__ = ["stft", "istft", "SeparationResult", "separate"]


# ---------------------------------------------------------------------------
# jnp STFT/ISTFT (on-device variants; used by tests and device pipelines)
# ---------------------------------------------------------------------------


def _hann(n: int) -> jnp.ndarray:
    # periodic Hann (matches common STFT conventions; COLA at hop = n/4)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)


def stft(audio: jnp.ndarray, n_fft: int = 1024, hop: int = 256) -> jnp.ndarray:
    """Complex STFT: frames of ``n_fft`` samples every ``hop``; Hann window.

    Returns (n_fft//2 + 1, n_frames) — paper dims: 513 x frames for 1024/256.
    """
    audio = jnp.asarray(audio, jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(audio, (pad, pad))
    n_frames = 1 + (x.shape[0] - n_fft) // hop
    idx = (
        jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    )  # (frames, n_fft)
    frames = x[idx] * _hann(n_fft)[None, :]
    spec = jnp.fft.rfft(frames, axis=1)  # (frames, bins)
    return spec.T  # (bins, frames)


def istft(
    spec: jnp.ndarray, n_fft: int = 1024, hop: int = 256, length: Optional[int] = None
) -> jnp.ndarray:
    """Inverse STFT with windowed overlap-add (COLA-normalised)."""
    frames = jnp.fft.irfft(spec.T, n=n_fft, axis=1)  # (frames, n_fft)
    win = _hann(n_fft)
    frames = frames * win[None, :]
    n_frames = frames.shape[0]
    total = n_fft + hop * (n_frames - 1)
    out = jnp.zeros((total,), jnp.float32)
    norm = jnp.zeros((total,), jnp.float32)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    out = out.at[idx.reshape(-1)].add(frames.reshape(-1))
    norm = norm.at[idx.reshape(-1)].add(
        (win * win)[None, :].repeat(n_frames, 0).reshape(-1)
    )
    out = out / jnp.maximum(norm, 1e-8)
    out = out[n_fft // 2 :]
    if length is not None:
        out = out[:length]
    return out


# ---------------------------------------------------------------------------
# NumPy STFT/ISTFT (host-side pre/post-processing used by separate())
# ---------------------------------------------------------------------------


def _stft_np(audio: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """Host-side STFT, numerically equivalent to :func:`stft`."""
    pad = n_fft // 2
    x = np.pad(audio.astype(np.float32), (pad, pad))
    n_frames = 1 + (x.shape[0] - n_fft) // hop
    win = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(
        np.float32
    )
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * win[None, :]
    return np.fft.rfft(frames, axis=1).astype(np.complex64).T  # (bins, frames)


def _istft_np(
    spec: np.ndarray, n_fft: int, hop: int, length: Optional[int] = None
) -> np.ndarray:
    """Host-side ISTFT (windowed overlap-add), equivalent to :func:`istft`."""
    frames = np.fft.irfft(spec.T, n=n_fft, axis=1).astype(np.float32)
    win = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(
        np.float32
    )
    frames *= win[None, :]
    n_frames = frames.shape[0]
    total = n_fft + hop * (n_frames - 1)
    out = np.zeros((total,), np.float32)
    norm = np.zeros((total,), np.float32)
    w2 = win * win
    for f in range(n_frames):  # frames count is small; host loop is fine
        out[f * hop : f * hop + n_fft] += frames[f]
        norm[f * hop : f * hop + n_fft] += w2
    out /= np.maximum(norm, 1e-8)
    out = out[n_fft // 2 :]
    return out[:length] if length is not None else out


def _masked_sources(
    w: np.ndarray, h: np.ndarray, spec: np.ndarray, n_fft: int, hop: int, length: int
) -> np.ndarray:
    """All K Wiener-masked sources (host-side post-processing).

    One (bins, frames) mask at a time: materialising all K masked complex
    spectrograms at once would cost K x the clip's spectrogram in RAM.
    """
    w = np.asarray(w, np.float32)
    h = np.asarray(h, np.float32)
    recon = np.maximum(w @ h, 1e-12)                      # (bins, frames)
    out = []
    for k_i in range(w.shape[1]):
        comp = w[:, k_i : k_i + 1] @ h[k_i : k_i + 1, :]
        masked = (spec * (comp / recon)).astype(np.complex64)
        out.append(_istft_np(masked, n_fft, hop, length))
    return np.stack(out)


@dataclasses.dataclass
class SeparationResult:
    """K separated sources plus the factorization that produced them."""

    sources: np.ndarray          # (K, samples) per-component audio
    w: np.ndarray                # (bins, K) spectral dictionary
    h: np.ndarray                # (K, frames) activations
    solve_result: SolveResult


def separate(
    audio,
    n_components: int = 32,
    n_fft: int = 1024,
    hop: int = 256,
    config: Optional[SolveConfig] = None,
    seed: int = 0,
    n_restarts: int = 1,
    w_template=None,
    adapt_template: bool = False,
) -> SeparationResult:
    """Decompose audio into ``n_components`` sources (paper pipeline).

    magnitude STFT -> KL-NMF -> per-component Wiener mask
    ``(w_k h_k) / (W H)`` applied to the complex STFT -> ISTFT.

    ``n_restarts > 1`` factorizes from several seeded inits in one compiled
    batch and keeps the lowest-divergence decomposition (NMF is non-convex;
    spectrogram dims are small enough that extra members are nearly free —
    see :func:`nmf_tpu.solve_restarts`).

    ``w_template`` ((n_fft//2+1, F) spectral templates, e.g. drum basis
    vectors learned from solo recordings — the paper's actual drum-
    extraction workflow, pdf section 2) seeds the FIRST F components and
    freezes them while the remaining ``n_components - F`` adapt to the
    rest of the mix (:func:`nmf_tpu.solve_semi`); sources[0:F] are then
    the template-attributed stems.  ``adapt_template=True`` uses the
    templates as a warm start but lets them train too.
    """
    if n_restarts < 1:
        raise ValueError(f"n_restarts must be >= 1, got {n_restarts}")
    audio = np.asarray(audio, np.float32)
    if audio.ndim != 1:
        raise ValueError("separate() expects mono audio (1-D)")
    config = config or SolveConfig(max_iter=200, thresh=1e-5, check_every=25)

    spec = _stft_np(audio, n_fft, hop)        # complex (bins, frames), host
    mag = np.abs(spec).astype(np.float32)
    if w_template is not None:
        w_template = np.asarray(w_template, np.float32)
        n_bins = n_fft // 2 + 1
        if w_template.ndim != 2 or w_template.shape[0] != n_bins:
            raise ValueError(
                f"w_template must be ({n_bins}, F) for n_fft={n_fft}, got "
                f"{w_template.shape}"
            )
        f = w_template.shape[1]
        if f > n_components:
            raise ValueError(
                f"{f} template columns exceed n_components={n_components}"
            )
        if n_restarts > 1:
            # restart only the FREE columns: templates frozen, each member
            # re-seeds the adaptive remainder (selection.n_frozen)
            from .selection import solve_restarts

            inits = [
                scaled_random_init(mag, n_components, seed=seed + s)
                for s in range(n_restarts)
            ]
            w0s = np.stack(
                [np.concatenate([w_template, w[:, f:]], axis=1) for w, _ in inits]
            )
            h0s = np.stack([h for _, h in inits])
            sel = solve_restarts(
                mag, w0s=w0s, h0s=h0s, config=config,
                n_frozen=0 if adapt_template else f,
            )
            res = sel.best_solve_result()
        else:
            from .semi import solve_semi

            w_rand, h0 = scaled_random_init(mag, n_components, seed=seed)
            w0 = np.concatenate([w_template, w_rand[:, f:]], axis=1)
            res = solve_semi(
                mag, w0, h0, config, n_frozen=0 if adapt_template else f
            )
    elif n_restarts > 1:
        from .selection import solve_restarts

        sel = solve_restarts(
            mag, rank=n_components, n_restarts=n_restarts, config=config,
            seed=seed,
        )
        res = sel.best_solve_result()
    else:
        w0, h0 = scaled_random_init(mag, n_components, seed=seed)
        res = solve(mag, w0, h0, config)      # the accelerator does the NMF

    sources = _masked_sources(
        np.asarray(res.w), np.asarray(res.h), spec, n_fft, hop, int(audio.shape[0])
    )
    return SeparationResult(
        sources=sources,
        w=np.asarray(res.w),
        h=np.asarray(res.h),
        solve_result=res,
    )
