from .data import FeatureDataset, BatchPlan, make_device_batch
from .checkpoint import save_checkpoint, load_checkpoint
from .loop import TrainLoopConfig, train, train_with_restarts

__all__ = ["FeatureDataset", "BatchPlan", "make_device_batch",
           "save_checkpoint", "load_checkpoint", "TrainLoopConfig", "train",
           "train_with_restarts"]
