from face_recognition_models_tpu.data.index import ImageFolderIndex
from face_recognition_models_tpu.data.pairs import (
    load_pair_list,
    pair_image_names,
)
from face_recognition_models_tpu.data.packed import (
    PackedDataset,
    PackedLoader,
    pack_dataset,
)
from face_recognition_models_tpu.data.pipeline import Loader, PKLoader
from face_recognition_models_tpu.data.recordio import (
    PKRecLoader,
    RecLoader,
    RecordIODataset,
)
from face_recognition_models_tpu.data.sampler import PKBatchSampler

__all__ = ["ImageFolderIndex", "load_pair_list", "pair_image_names",
           "Loader", "PKLoader", "PKBatchSampler", "PackedDataset",
           "PackedLoader", "pack_dataset", "PKRecLoader", "RecLoader",
           "RecordIODataset"]
