from visreps_tpu.data.transforms import get_transform, DS_MEAN, DS_STD
from visreps_tpu.data.loader import PrefetchLoader, make_stimuli_loader
from visreps_tpu.data.obj_cls import get_obj_cls_loader

__all__ = [
    "get_transform",
    "DS_MEAN",
    "DS_STD",
    "PrefetchLoader",
    "make_stimuli_loader",
    "get_obj_cls_loader",
]
