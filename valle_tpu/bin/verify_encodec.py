#!/usr/bin/env python3
"""Real-pretrained-EnCodec readiness kit (one command).

The reference's entire audio path rests on Meta's pretrained
``EncodecModel.encodec_model_24khz()`` weights
(/root/reference/valle/data/tokenizer.py:214-242) and verifies its own
weight handling against them. This environment has no network egress and
no ``encodec`` package, so our importer (codec/convert.py) is validated
against a self-written torch mirror instead (tests/encodec_torch_parity).
The day a real checkpoint is available, THIS script closes the loop:

    python -m valle_tpu.bin.verify_encodec --weights encodec_24khz.th

It 1) imports the torch state dict into the JAX codec, 2) encodes a
deterministic fixture waveform, 3) compares the code indices against the
vendored goldens (``--write-golden`` pins them on the first
real-weights run; until then the script reports them for inspection),
4) decodes and checks reconstruction SNR against the input (pretrained
EnCodec at 6 kbps reconstructs speech-band fixtures at >= ~3 dB SNR;
random weights give large negative SNR, so the check separates real from
garbage weights), and 5) round-trips encode(decode(codes)) for
self-consistency.

Exit code 0 = all checks pass.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

SAMPLE_RATE = 24000
GOLDEN = Path(__file__).resolve().parent.parent.parent / (
    "tests/data/encodec_golden_codes.npz")


def fixture_wav(seconds: float = 1.5) -> np.ndarray:
    """Deterministic speech-band fixture: gliding tone + harmonics +
    noise floor, amplitude-enveloped. Reproducible everywhere (no RNG
    state dependence beyond the fixed seed)."""
    t = np.arange(int(seconds * SAMPLE_RATE)) / SAMPLE_RATE
    f0 = 110 * 2 ** (t / seconds)              # one octave glide
    phase = 2 * np.pi * np.cumsum(f0) / SAMPLE_RATE
    wav = (0.5 * np.sin(phase) + 0.25 * np.sin(2 * phase)
           + 0.125 * np.sin(3 * phase))
    env = 0.5 * (1 - np.cos(2 * np.pi * np.minimum(t / 0.05, 1.0)))
    rng = np.random.RandomState(1234)
    wav = wav * env + 0.003 * rng.randn(len(t))
    return (0.6 * wav / np.abs(wav).max()).astype(np.float32)


def snr_db(ref: np.ndarray, est: np.ndarray) -> float:
    n = min(len(ref), len(est))
    ref, est = ref[:n], est[:n]
    err = ref - est
    return float(10 * np.log10(
        (np.sum(ref ** 2) + 1e-12) / (np.sum(err ** 2) + 1e-12)))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--weights", type=str, required=True,
                    help="Path to a torch EnCodec 24 kHz state dict "
                         "(.th/.pt, as distributed by Meta).")
    ap.add_argument("--golden", type=str, default=str(GOLDEN))
    ap.add_argument("--write-golden", action="store_true",
                    help="Pin this run's code indices as the golden "
                         "(use ONCE, on verified real weights).")
    ap.add_argument("--min-snr-db", type=float, default=3.0)
    args = ap.parse_args(argv)

    from valle_tpu.data.tokenizer import AudioTokenizer

    tok = AudioTokenizer(weights_path=args.weights)
    wav = fixture_wav()
    codes = np.asarray(tok.encode(wav[None]))[0]   # (F, 8)
    print(f"encoded fixture: codes shape {codes.shape}, "
          f"first frame {codes[0].tolist()}")

    ok = True
    golden = Path(args.golden)
    if args.write_golden:
        golden.parent.mkdir(parents=True, exist_ok=True)
        np.savez(golden, codes=codes.astype(np.int32))
        print(f"wrote golden -> {golden}")
    elif golden.exists():
        want = np.load(golden)["codes"]
        if want.shape != codes.shape or not np.array_equal(want, codes):
            frac = (float((want == codes).mean())
                    if want.shape == codes.shape else 0.0)
            print(f"FAIL: codes differ from golden (match {frac:.4f})")
            ok = False
        else:
            print("golden code indices: EXACT match")
    else:
        print(f"no golden at {golden} yet — run --write-golden on "
              f"verified real weights to pin these codes")

    wav_hat = np.asarray(tok.decode(codes[None])).reshape(-1)
    snr = snr_db(wav, wav_hat)
    print(f"reconstruction SNR {snr:.2f} dB (min {args.min_snr_db})")
    if snr < args.min_snr_db:
        print("FAIL: SNR below threshold — weights are not a functioning "
              "EnCodec (random/corrupt import?)")
        ok = False

    codes2 = np.asarray(tok.encode(wav_hat[None, : len(wav)]))[0]
    stable = float((codes2 == codes).mean())
    print(f"encode(decode(codes)) self-consistency: {stable:.3f} "
          f"of codes stable")

    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
