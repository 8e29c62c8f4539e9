from .base import ExperimentConfig, get_config, DATASET_CONFIGS

__all__ = ["ExperimentConfig", "get_config", "DATASET_CONFIGS"]
