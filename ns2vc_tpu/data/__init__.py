from ns2vc_tpu.data.dataset import VCDataset, EvalDataset, FixedShapeCollator, data_loader
from ns2vc_tpu.data.preprocess import preprocess_dataset, process_one

__all__ = [
    "VCDataset",
    "EvalDataset",
    "FixedShapeCollator",
    "data_loader",
    "preprocess_dataset",
    "process_one",
]
