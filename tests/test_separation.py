"""Audio separation pipeline tests (the paper's application, on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nmf_tpu.models.separation import istft, separate, stft
from nmf_tpu.utils.config import SolveConfig


@pytest.fixture(scope="module")
def two_tone_audio():
    """Two interleaved pure tones — trivially separable spectral sources."""
    sr = 8000
    t = np.arange(sr * 2) / sr  # 2 seconds
    tone_a = np.sin(2 * np.pi * 440.0 * t)
    tone_b = np.sin(2 * np.pi * 1313.0 * t)
    # alternate half-second activations, slight overlap
    env_a = (np.sin(2 * np.pi * 1.0 * t) > 0).astype(np.float32)
    env_b = 1.0 - env_a
    return (tone_a * env_a + tone_b * env_b).astype(np.float32), sr


def test_stft_shapes_match_paper_convention():
    audio = np.random.RandomState(0).randn(44100 * 2).astype(np.float32)
    spec = stft(jnp.asarray(audio), n_fft=1024, hop=256)
    assert spec.shape[0] == 513  # paper section 3.4: 513 frequency bins
    assert spec.dtype == jnp.complex64


def test_stft_istft_roundtrip():
    rng = np.random.RandomState(0)
    audio = rng.randn(16384).astype(np.float32)
    spec = stft(jnp.asarray(audio), n_fft=512, hop=128)
    back = istft(spec, n_fft=512, hop=128, length=audio.shape[0])
    # COLA reconstruction: interior matches tightly (edges are windowed)
    a, b = np.asarray(back)[512:-512], audio[512:-512]
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 1e-3, f"ISTFT roundtrip rel error {rel:.3e}"


def test_separate_two_tones(two_tone_audio):
    audio, sr = two_tone_audio
    res = separate(
        audio,
        n_components=2,
        n_fft=512,
        hop=128,
        config=SolveConfig(max_iter=100, thresh=1e-5, check_every=10),
        seed=3,
    )
    assert res.sources.shape == (2, audio.shape[0])
    assert res.w.shape[1] == 2 and res.h.shape[0] == 2
    # each learned basis vector concentrates on one tone's frequency bin
    bins = np.argmax(res.w, axis=0)
    freqs = bins * sr / 512
    assert abs(sorted(freqs)[0] - 440.0) < 40
    assert abs(sorted(freqs)[1] - 1313.0) < 40
    # masked sources sum approximately back to the mixture
    mix = res.sources.sum(axis=0)
    rel = np.linalg.norm(mix[512:-512] - audio[512:-512]) / np.linalg.norm(
        audio[512:-512]
    )
    assert rel < 0.05


def test_separate_rejects_stereo():
    with pytest.raises(ValueError):
        separate(np.zeros((2, 1000), np.float32), n_components=2)


def test_cli_separate(tmp_path, two_tone_audio):
    from scipy.io import wavfile

    from nmf_tpu.cli import main as cli_main

    audio, sr = two_tone_audio
    wav = str(tmp_path / "mix.wav")
    wavfile.write(wav, sr, (audio * 32767).astype(np.int16))
    out = str(tmp_path / "srcs")
    rc = cli_main(
        ["separate", wav, "--rank", "2", "--out-dir", out,
         "--n-fft", "512", "--max-iter", "50", "-q"]
    )
    assert rc == 0
    import os

    files = sorted(os.listdir(out))
    assert files == ["source_000.wav", "source_001.wav"]
    sr2, s0 = wavfile.read(os.path.join(out, files[0]))
    assert sr2 == sr and s0.shape[0] == audio.shape[0]


def test_np_and_jnp_stft_agree():
    """The host-side STFT/ISTFT must match the on-device jnp versions."""
    from nmf_tpu.models.separation import _istft_np, _stft_np

    rng = np.random.RandomState(4)
    audio = rng.randn(8192).astype(np.float32)
    s_np = _stft_np(audio, 512, 128)
    s_j = np.asarray(stft(jnp.asarray(audio), 512, 128))
    np.testing.assert_allclose(s_np, s_j, rtol=1e-4, atol=1e-4)
    a_np = _istft_np(s_np, 512, 128, length=audio.shape[0])
    a_j = np.asarray(istft(jnp.asarray(s_j), 512, 128, length=audio.shape[0]))
    np.testing.assert_allclose(a_np, a_j, rtol=1e-3, atol=1e-4)


def test_separate_restarts_keeps_best(two_tone_audio):
    audio, sr = two_tone_audio
    cfg = SolveConfig(max_iter=30, check_every=10)
    single = separate(audio, n_components=4, config=cfg, seed=0)
    multi = separate(audio, n_components=4, config=cfg, seed=0, n_restarts=4)
    assert multi.sources.shape == single.sources.shape
    # restarts can only match or beat the seed-0 divergence (seed 0 is
    # member 0 of the batch)
    assert float(multi.solve_result.cost) <= float(single.solve_result.cost) + 1e-4


def test_separate_with_frozen_templates(two_tone_audio):
    """The paper's drum-template workflow: learn templates from one signal,
    freeze them while separating a mix — the template stems capture their
    source."""
    from nmf_tpu.models.separation import separate, stft

    audio, sr = two_tone_audio
    n_fft, hop = 512, 128
    cfg = SolveConfig(max_iter=40, check_every=10)
    # learn 2 'template' components from the mixture itself (stand-in for
    # solo training audio), then re-separate with them frozen + 2 free
    base = separate(audio, n_components=2, n_fft=n_fft, hop=hop, config=cfg)
    templates = base.w  # (bins, 2)
    res = separate(
        audio, n_components=4, n_fft=n_fft, hop=hop, config=cfg,
        w_template=templates,
    )
    # frozen columns preserved exactly (post-clamp)
    np.testing.assert_array_equal(
        res.w[:, :2], np.maximum(templates, np.float32(2.2204e-16))
    )
    assert res.sources.shape[0] == 4
    # adapt_template=True trains them instead
    res2 = separate(
        audio, n_components=4, n_fft=n_fft, hop=hop, config=cfg,
        w_template=templates, adapt_template=True,
    )
    assert not np.allclose(res2.w[:, :2], res.w[:, :2])
    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError):
        separate(audio, n_components=1, n_fft=n_fft, hop=hop,
                 w_template=templates, config=cfg)
    # templates + restarts: only the FREE columns re-seed per member
    res3 = separate(
        audio, n_components=4, n_fft=n_fft, hop=hop, config=cfg,
        w_template=templates, n_restarts=3,
    )
    np.testing.assert_array_equal(
        res3.w[:, :2], np.maximum(templates, np.float32(2.2204e-16))
    )
    assert res3.sources.shape[0] == 4
    # best-of-restarts can only match or beat the single seeded run
    assert float(res3.solve_result.cost) <= float(res.solve_result.cost) + 1e-3


def test_separate_rejects_nonpositive_restarts():
    import numpy as np

    from nmf_tpu.models.separation import separate

    with pytest.raises(ValueError, match="n_restarts"):
        separate(np.zeros(4096, np.float32), n_components=4, n_restarts=0)
