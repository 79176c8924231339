"""Convert reference checkpoints into a NATIVE (orbax) system checkpoint.

The reference loads four torch files + an HF model on every process start
(models/utils.py load semantics); quantizing the 7B adds minutes more. This
CLI does that work ONCE:

    python -m freeze_omni_tpu.bin.convert_ckpt \
        --model_path /ckpts --llm_path /Qwen2-7B-Instruct \
        --out /ckpts-native --quant 8

`serve --model_path /ckpts-native` (and asr_eval) detect the native layout
and restore the already-quantized pytrees directly — no torch, no
transformers, no re-quantization.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from ..utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(
        description="reference checkpoints -> native orbax system")
    p.add_argument("--model_path", required=True,
                   help="reference checkpoint dir (audiollm/ decoder/ codec/)")
    p.add_argument("--llm_path", required=True,
                   help="HF Qwen2 dir (weights + tokenizer)")
    p.add_argument("--out", required=True, help="output dir")
    p.add_argument("--quant", default=8, type=int, choices=[0, 8, 4],
                   help="weight-only bits for the frozen backbone "
                        "(8 = fits one 16 GB chip; 0 = keep bf16 for TP)")
    args = p.parse_args(argv)

    from ..utils.factory import (build_system_from_reference,
                                 save_native_system)

    cfg, audiollm, tts, _ = build_system_from_reference(
        args.model_path, args.llm_path,
        quantize_llm_bits=args.quant or None)
    save_native_system(args.out, cfg, audiollm, tts, llm_path=args.llm_path)
    print(f"native system checkpoint written to {args.out} "
          f"(llm {'int%d' % args.quant if args.quant else 'bf16'})")


if __name__ == "__main__":
    main()
