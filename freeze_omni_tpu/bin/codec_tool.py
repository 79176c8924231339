"""Codec encode/decode harness.

Role of the reference's VqvaeTester (models/decoder/ticodec/vqvae_tester.py,
minus the leftover pdb.set_trace): round-trip a wav through the TiCodec
encoder -> quantizer -> generator and report codes + reconstruction stats.

Usage:
  python -m freeze_omni_tpu.bin.codec_tool --input_wav in.wav \
      [--output_wav out.wav] [--ckpt codec.pt] [--preset tiny]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="TiCodec round-trip harness")
    p.add_argument("--preset", default="flagship", choices=["tiny", "flagship"])
    p.add_argument("--input_wav", required=True)
    p.add_argument("--output_wav", default=None)
    p.add_argument("--ckpt", default=None, help="reference codec final.pt")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from ..config import flagship_system, tiny_system
    from ..frontend.wav import read_wav, resample, write_wav
    from ..models import codec as codec_mod
    from ..utils import checkpoint as ckpt_mod

    cfg = (tiny_system() if args.preset == "tiny" else flagship_system()).tts.codec

    if args.ckpt:
        params = ckpt_mod.convert_codec(
            ckpt_mod.load_torch_state_dict(args.ckpt), cfg, with_encoder=True)
    else:
        params = codec_mod.init_params(jax.random.PRNGKey(args.seed), cfg,
                                       with_encoder=True)

    wav, sr = read_wav(args.input_wav)
    if wav.ndim > 1:
        wav = wav.mean(axis=1)
    if sr != cfg.sample_rate:
        wav = resample(wav, sr, cfg.sample_rate)

    x = wav[None, None, :].astype(np.float32)
    codes, gst = codec_mod.encode(params, cfg, x)
    recon = codec_mod.decode(params, cfg, codes, gst)
    recon = np.asarray(recon)[0, 0]

    n = min(len(wav), len(recon))
    err = float(np.sqrt(np.mean((wav[:n] - recon[:n]) ** 2)))
    print(f"input: {len(wav)} samples @ {cfg.sample_rate} Hz")
    print(f"codes: {np.asarray(codes).shape} (vocab {cfg.n_codes}), "
          f"global tokens: {np.asarray(gst).ravel().tolist()}")
    print(f"token rate: {cfg.sample_rate / cfg.upsample_rate:.1f} Hz")
    print(f"reconstruction rmse: {err:.4f} (random weights -> noise; "
          f"converted checkpoint -> speech)")
    if args.output_wav:
        write_wav(args.output_wav, recon, cfg.sample_rate)
        print(f"wrote {args.output_wav} ({len(recon)} samples)")


if __name__ == "__main__":
    main()
