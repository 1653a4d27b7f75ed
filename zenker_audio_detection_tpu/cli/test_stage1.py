"""Stage-1 snippet evaluator CLI (reference src/test_trained_model_stage1_cv.py)."""

import argparse
import os

from ..analysis import snippet_eval


def run(stage: str, argv=None):
    ap = argparse.ArgumentParser(
        description=f"Evaluate trained {stage} models on fold test splits.")
    ap.add_argument("--fold", type=int, default=None)
    ap.add_argument("--all", action="store_true",
                    help="evaluate all folds + summed aggregate CM")
    ap.add_argument("--num-folds", type=int, default=5)
    ap.add_argument("--data-dir", default=f"data_ast_{stage}")
    ap.add_argument("--model-root", default=f"runs/ast_classifier_{stage}")
    ap.add_argument("--results-dir", default=None,
                    help="central results dir (default results/<stage>)")
    ap.add_argument("--mapping-path", default=None)
    ap.add_argument("--use-aggregate-stats", action="store_true")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    folds = (list(range(1, args.num_folds + 1)) if args.all or not args.fold
             else [args.fold])
    central = args.results_dir or os.path.join("results", stage)
    snippet_eval.evaluate_all_folds(
        stage=stage, data_dir=args.data_dir, model_root=args.model_root,
        central_results_dir=central, mapping_path=args.mapping_path,
        folds=folds, use_aggregate_stats=args.use_aggregate_stats,
        batch_size=args.batch_size,
        dtype=jnp.float32 if args.f32 else jnp.bfloat16)


def main(argv=None):
    run("stage1", argv)


if __name__ == "__main__":
    main()
