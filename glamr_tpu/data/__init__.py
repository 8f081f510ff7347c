"""Dataset pipelines: AMASS sampling with occlusion-mask synthesis."""
from .amass import AMASSDataset, synthetic_amass_data
from .device_sampler import DeviceSampler
from .procedural import procedural_amass_data, procedural_motions

__all__ = ["AMASSDataset", "DeviceSampler", "procedural_amass_data",
           "procedural_motions", "synthetic_amass_data"]
