"""Data pipeline: manifests, tables, bucketed batching."""

from wetts_tpu.data.dataset import TTSDataset, read_table
from wetts_tpu.data.sampler import BucketBatcher

__all__ = ["TTSDataset", "read_table", "BucketBatcher"]
