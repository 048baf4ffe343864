"""Audio source separation demo (the reference paper's application).

Synthesizes a drum-plus-tone mixture, separates it with spectrogram KL-NMF,
and reports how cleanly the components split.

    python examples/separation_demo.py [--wav out_prefix]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nmf_tpu as nt
from nmf_tpu.utils.config import SolveConfig


def synth_mixture(sr=16000, seconds=4):
    t = np.arange(sr * seconds) / sr
    # "hi-hat": short noise bursts every 0.25 s
    noise = np.random.RandomState(0).randn(t.size) * 0.3
    gate = ((t * 4) % 1.0) < 0.05
    hats = noise * gate
    # "bass": 110 Hz tone pulsing every 0.5 s
    bass = 0.8 * np.sin(2 * np.pi * 110 * t) * (((t * 2) % 1.0) < 0.4)
    return (hats + bass).astype(np.float32), sr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wav", help="write mixture + sources as WAVs with this prefix")
    ap.add_argument("--rank", type=int, default=4)
    args = ap.parse_args()

    # NMF_TPU_EXAMPLE_QUICK=1 shrinks the clip/iterations for the test suite
    # (same knob as the other examples)
    quick = bool(os.environ.get("NMF_TPU_EXAMPLE_QUICK"))
    audio, sr = synth_mixture(seconds=1 if quick else 4)
    res = nt.separate(
        audio,
        n_components=args.rank,
        n_fft=1024,
        hop=256,
        config=SolveConfig(
            max_iter=60 if quick else 300, thresh=1e-5, check_every=25
        ),
    )
    print(
        f"separated into {args.rank} components "
        f"({int(res.solve_result.iterations)} NMF iterations, "
        f"cost {float(res.solve_result.cost):.4e})"
    )
    # a tonal component concentrates energy at 110 Hz; a percussive one is broadband
    freqs = np.fft.rfftfreq(1024, 1 / sr)
    for i, col in enumerate(res.w.T):
        peak = freqs[int(np.argmax(col))]
        spread = float((col > 0.25 * col.max()).mean())
        kind = "tonal" if spread < 0.05 else "broadband"
        print(f"  component {i}: peak {peak:7.1f} Hz, {kind}")

    if args.wav:
        from scipy.io import wavfile

        # peak-normalize the mixture like the sources: the synth overlaps
        # exceed [-1, 1] and a raw *32767 cast would WRAP int16 (loud pops)
        mix_peak = max(abs(audio).max(), 1e-9)
        wavfile.write(
            f"{args.wav}_mix.wav", sr,
            (audio / mix_peak * 32767).astype(np.int16),
        )
        for i, src in enumerate(res.sources):
            peak = max(abs(src).max(), 1e-9)
            wavfile.write(
                f"{args.wav}_src{i}.wav", sr, (src / peak * 32767).astype(np.int16)
            )
        print(f"wrote {args.wav}_mix.wav and {args.rank} source files")


if __name__ == "__main__":
    main()
