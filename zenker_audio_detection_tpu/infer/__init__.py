from .cascade import CascadeConfig, StageSpec, TwoStageEngine  # noqa: F401
