from kanvit.data.datasets import load_dataset, DATASETS
from kanvit.data.pipeline import DataPipeline

__all__ = ["load_dataset", "DATASETS", "DataPipeline"]
