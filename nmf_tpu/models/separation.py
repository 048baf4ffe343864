"""Audio source separation via spectrogram NMF — the reference's application.

The reference library exists to accelerate exactly this pipeline (bundled
paper, ISMIR 2009): magnitude STFT of audio -> KL-NMF into K spectral basis
vectors (columns of W) with activations (rows of H) -> per-component Wiener
masking -> ISTFT back to audio sources.  The paper's workload is a 20 s clip
at 44.1 kHz, 1024-point FFT, hop 256 -> X of 513 x ~3445 (paper section 3.4).

Everything here is jnp (STFT/ISTFT included) so the whole pipeline runs on
TPU; the NMF step uses this framework's solver.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.mu import matmul
from ..utils.config import Precision, SolveConfig
from .init import scaled_random_init
from .solver import SolveResult, solve

__all__ = ["stft", "istft", "SeparationResult", "separate"]


def _hann(n: int) -> jnp.ndarray:
    # periodic Hann (matches common STFT conventions; COLA at hop = n/4)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / n)


def stft(
    audio: jnp.ndarray, n_fft: int = 1024, hop: int = 256
) -> jnp.ndarray:
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
    # overlap-add via scatter-add
    out = jnp.zeros((total,), jnp.float32)
    norm = jnp.zeros((total,), jnp.float32)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    out = out.at[idx.reshape(-1)].add(frames.reshape(-1))
    norm = norm.at[idx.reshape(-1)].add((win * win)[None, :].repeat(n_frames, 0).reshape(-1))
    out = out / jnp.maximum(norm, 1e-8)
    pad = n_fft // 2
    out = out[pad:]
    if length is not None:
        out = out[:length]
    return out


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
) -> SeparationResult:
    """Decompose audio into ``n_components`` sources (paper pipeline).

    magnitude STFT -> KL-NMF -> per-component Wiener mask
    ``(w_k h_k) / (W H)`` applied to the complex STFT -> ISTFT.
    """
    audio = jnp.asarray(audio, jnp.float32)
    if audio.ndim != 1:
        raise ValueError("separate() expects mono audio (1-D)")
    config = config or SolveConfig(max_iter=200, thresh=1e-5, check_every=25)

    spec = stft(audio, n_fft, hop)            # complex (bins, frames)
    mag = jnp.abs(spec)
    w0, h0 = scaled_random_init(np.asarray(mag), n_components, seed=seed)
    res = solve(mag, w0, h0, config)

    w = jnp.asarray(res.w)
    h = jnp.asarray(res.h)
    prec = Precision()  # true-f32 GEMMs for the masks (CLAUDE.md convention)
    recon = jnp.maximum(matmul(w, h, prec), 1e-12)    # (bins, frames)
    sources = []
    for k_i in range(n_components):
        comp = matmul(w[:, k_i : k_i + 1], h[k_i : k_i + 1, :], prec)
        sources.append(
            istft(spec * (comp / recon), n_fft, hop, length=audio.shape[0])
        )
    return SeparationResult(
        sources=np.stack([np.asarray(s) for s in sources]),
        w=np.asarray(w),
        h=np.asarray(h),
        solve_result=res,
    )
