from face_recognition_models_tpu.serving.export import (
    EmbedderArtifact,
    export_embedder,
    load_embedder,
)
from face_recognition_models_tpu.serving.embed import (
    embed_directory,
    norm_quality,
)
from face_recognition_models_tpu.serving.server import (
    EmbedService,
    MicroBatcher,
    make_server,
)

__all__ = ["EmbedderArtifact", "export_embedder", "load_embedder",
           "embed_directory", "norm_quality",
           "EmbedService", "MicroBatcher", "make_server"]
