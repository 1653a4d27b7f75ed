"""Stage-2 (Healthy vs Zenker) cross-validation trainer CLI
(reference src/train_ast_stage2_cross_validation.py): focal loss with label
smoothing + inverse-frequency class weights + batch-level alpha balancing,
or weighted CE with --no-focal-loss."""

import argparse

from . import _train_common
from ..train import loop as train_loop


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Fine-tune AST for Stage 2 (Healthy vs Zenker) per fold.")
    _train_common.add_common_train_args(ap, "stage2")
    ap.add_argument("--focal-alpha", type=float, default=0.25)
    ap.add_argument("--no-focal-loss", action="store_true",
                    help="weighted CE instead of focal loss")
    ap.add_argument("--no-class-weights", action="store_true")
    args = ap.parse_args(argv)
    folds = _train_common.validate_train_args(args)

    import jax.numpy as jnp

    cfg = train_loop.TrainFoldConfig(
        stage="stage2",
        data_dir=args.data_dir,
        output_root=args.output_root,
        pretrained_model_dir=args.pretrained_model_dir,
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        grad_accum=args.grad_accum,
        learning_rate=_train_common.effective_lr(args),
        weight_decay=args.weight_decay,
        warmup_ratio=args.warmup_ratio,
        adam_beta2=args.adam_beta2,
        focal_gamma=args.focal_gamma,
        label_smoothing=args.label_smoothing,
        focal_alpha=args.focal_alpha,
        use_focal_loss=not args.no_focal_loss,
        use_class_weights=not args.no_class_weights,
        enable_early_stopping=not args.no_early_stopping,
        augment=not args.no_augment,
        dry_run=args.dry_run,
        seed=args.seed,
        resume=args.resume,
        dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        num_devices=args.num_devices,
        num_slices=args.num_slices,
        fold_parallel=args.parallel_folds,
        data_per_fold=args.data_per_fold,
        max_length=args.max_length,
        streaming=args.streaming,
    )
    train_loop.run_cross_validation(
        folds, cfg, tracking_opts=_train_common.tracking_opts(args))


if __name__ == "__main__":
    main()
