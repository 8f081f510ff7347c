"""Dataset pipelines: AMASS sampling with occlusion-mask synthesis."""
from .amass import AMASSDataset, synthetic_amass_data
from .device_sampler import DeviceSampler

__all__ = ["AMASSDataset", "DeviceSampler", "synthetic_amass_data"]
