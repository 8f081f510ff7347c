"""Dataset pipelines: AMASS sampling with occlusion-mask synthesis."""
from .amass import AMASSDataset, synthetic_amass_data

__all__ = ["AMASSDataset", "synthetic_amass_data"]
