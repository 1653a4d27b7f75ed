"""Command-line entry points mirroring the reference's script surface.

Reference script -> CLI module (run as
`python -m zenker_audio_detection_tpu.cli.<name>`):

  utils/PrepareDataset.py / PrepareDatasetLongAudio.py -> prepare_dataset
  utils/PrepareTrainingData_AST_cv.py                  -> prepare_training_data
  utils/PrepareTrainingData_AST_cv_2stage[_capped].py  -> prepare_two_stage
  utils/compute_ast_normalization_stats.py             -> compute_stats
  src/train_ast_stage{1,2}_cross_validation.py         -> train_stage1/2
  src/test_trained_model_stage{1,2}_cv.py              -> test_stage1/2
  src/test_long_audio_windows_2stage[_cache].py        -> infer_long_audio
  src/run_batch_simple_2stage.py                       -> run_batch_2stage
  src/run_all_folds_simple_batch.sh                    -> run_all_folds
  utils/analyze_ROC_PR_stage{1,2}.py                   -> analyze_roc_pr
  utils/extract_thresholds_per_fold.py                 -> extract_thresholds
  utils/aggregate_2stage_results.py                    -> aggregate_results
  utils/plot_confusion_matrices.py                     -> plot_confusion_matrices

Beyond the reference:
  (wandb sweep agent, local-first)                     -> sweep
  (max_length adaptation of HF AST dirs)               -> adapt_checkpoint
  (real-time streaming serving, stdin PCM -> JSONL)    -> serve
  (one-command real-asset quality validation)          -> validate_real
"""
