"""Normalization-stats CLI (reference utils/compute_ast_normalization_stats.py)."""

import argparse
import os

from ..data import stats


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Compute AST normalization stats across CV folds.")
    ap.add_argument("--data-dir", default="data_ast_cv")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--output-dir", default=None,
                    help="defaults to --data-dir")
    ap.add_argument("--stage", choices=["stage1", "stage2"],
                    help="shortcut: use data_ast_stage1/2 as data+output dir")
    ap.add_argument("--batch-size", type=int, default=16,
                    help="accepted for reference CLI parity "
                         "(utils/compute_ast_normalization_stats.py); here "
                         "featurization streams one file at a time on device, "
                         "so this flag does not change numerics or apply")
    args = ap.parse_args(argv)

    data_dir = args.data_dir
    output_dir = args.output_dir or data_dir
    if args.stage:
        data_dir = output_dir = os.path.join(os.getcwd(),
                                             f"data_ast_{args.stage}")
        print(f"[Info] Using stage alias '{args.stage}' -> '{data_dir}'")
    per_fold, aggregate = stats.compute_all_stats(data_dir, output_dir,
                                                  args.folds)
    print(f"\nWeighted aggregate: mean={aggregate['mean']:.6f} "
          f"std={aggregate['std']:.6f} (total_count={aggregate['total_count']})")


if __name__ == "__main__":
    main()
