"""Adapt an HF AST checkpoint dir to a different input length (short-seq
mode prep): cuts/extends the positional embeddings' time axis (the AST
authors' input-length transfer trick, models/ast.py:adapt_max_length) and
writes a new HF-format dir, carrying preprocessor_config.json along with
the updated max_length.

Typical use: convert MIT/ast-finetuned-audioset-10-10-0.4593 (1024 frames)
once to max_length=128, then pass the adapted dir as
--pretrained-model-dir to the trainers — identical to training directly
with --max-length 128, but the adaptation cost is paid once and the
adapted dir is shareable. No reference counterpart (the reference is
locked to 1024-frame inputs).
"""

import argparse
import os

from ..models import ast as ast_mod
from ..models import convert
from ..train import loop as train_loop
from ..utils import fsio


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Rewrite an HF AST model dir at a different max_length "
                    "(positional-embedding time-axis cut/extend).")
    ap.add_argument("model_dir", help="source HF AST model dir")
    ap.add_argument("output_dir", help="destination dir (HF format)")
    ap.add_argument("--max-length", type=int, default=None,
                    help="target input frame count (e.g. 128 for 1 s windows)")
    ap.add_argument("--int8", action="store_true",
                    help="write the framework's int8 export "
                         "(model_int8.safetensors, ~4x smaller on disk; "
                         "served transparently by every infer CLI — "
                         "models/convert.py:save_int8_model_dir)")
    args = ap.parse_args(argv)
    if args.max_length is None and not args.int8:
        ap.error("nothing to do: pass --max-length and/or --int8")

    params, config = convert.load_hf_model_dir(args.model_dir)
    if "kernel_int8" in params.get("encoder", {}).get("q", {}) \
            and not args.int8:
        ap.error(f"{args.model_dir} is an int8 export "
                 "(model_int8.safetensors); pass --int8 to re-export — an "
                 "HF f32 export is impossible (quantization is lossy)")
    if args.max_length is not None:
        if args.max_length == config.max_length:
            print(f"[Adapt] model already at max_length={config.max_length};"
                  f" copying through")
        params, config = ast_mod.adapt_max_length(params, config,
                                                  args.max_length)

    id2label = None
    cfg_path = os.path.join(args.model_dir, "config.json")
    d = fsio.load_json_object(cfg_path, "model config")
    if "id2label" in d:
        id2label = {int(k): v for k, v in d["id2label"].items()}
    if args.int8:
        convert.save_int8_model_dir(params, config, args.output_dir, id2label)
        print(f"[Adapt] int8 export -> {args.output_dir}")
    else:
        convert.save_hf_model_dir(params, config, args.output_dir, id2label)

    fx_path = os.path.join(args.model_dir, "preprocessor_config.json")
    if os.path.exists(fx_path):
        fx = fsio.load_json_object(fx_path, "feature-extractor config")
        train_loop.save_feature_extractor_config(
            args.output_dir, fx.get("mean", -4.2677393),
            fx.get("std", 4.5689974), max_length=config.max_length)
    print(f"[Adapt] {args.model_dir} ({d.get('max_length', 1024)} frames) "
          f"-> {args.output_dir} ({config.max_length} frames, "
          f"{config.seq_length} tokens)")


if __name__ == "__main__":
    main()
