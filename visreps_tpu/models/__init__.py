from visreps_tpu.models.zoo import load_model, init_model, MODEL_REGISTRY, TORCHVISION_RETURN_NODES
from visreps_tpu.models.extractor import FeatureExtractor, configure_feature_extractor

__all__ = [
    "load_model",
    "init_model",
    "MODEL_REGISTRY",
    "TORCHVISION_RETURN_NODES",
    "FeatureExtractor",
    "configure_feature_extractor",
]
