"""Table-driven validator parity: every config the reference's
ConfigVerifier (visreps/utils.py:509-823) rejects must be rejected
here, and its normalize-and-warn paths must normalize identically.
VERDICT round-1 item 8."""
import pytest

from visreps_tpu.core.config import Config
from visreps_tpu.core.validate import validate_config


def _train(**kw):
    base = {
        "mode": "train", "dataset": "imagenet", "model_class": "custom_model",
        "pca_labels": False, "model_name": "CustomCNN",
        "arch": {"conv_trainable": "11111", "fc_trainable": "111"},
    }
    base.update(kw)
    return Config(base)


def _eval(**kw):
    base = {
        "mode": "eval", "seed": 1, "neural_dataset": "nsd",
        "subject_idx": 0, "region": "V1", "analysis": "rsa",
        "compare_method": "spearman", "return_nodes": ["fc2"],
        "load_model_from": "torchvision", "model_name": "AlexNet",
    }
    base.update(kw)
    return Config(base)


REJECTED = [
    # mode / train-side (reference utils.py:541-590,787-823)
    ("bad mode", _train(mode="predict")),
    ("bad dataset", _train(dataset="cifar10")),
    ("bad model_class", _train(model_class="resnet")),
    ("custom key in standard mode",
     _train(model_class="standard_model", custom_model={"x": 1})),
    ("standard key in custom mode", _train(standard_model={"x": 1})),
    ("conv_trainable non-binary",
     _train(arch={"conv_trainable": "10x11", "fc_trainable": "111"})),
    ("fc_trainable non-binary",
     _train(arch={"conv_trainable": "11111", "fc_trainable": "abc"})),
    ("pca_n_classes <= 1", _train(pca_labels=True, pca_n_classes=1)),
    ("pca_n_classes not power of 2", _train(pca_labels=True, pca_n_classes=6)),
    # eval-side (reference utils.py:592-780)
    ("bad seed", _eval(seed=4)),
    ("bad neural_dataset", _eval(neural_dataset="hcp")),
    ("NSD subject out of range", _eval(subject_idx=8)),
    ("NSD subject negative", _eval(subject_idx=-1)),
    ("NSD bad region", _eval(region="IT")),
    ("TVSD bad subject", _eval(neural_dataset="tvsd", subject_idx=2, region="V1")),
    ("TVSD bad region",
     _eval(neural_dataset="tvsd", subject_idx=0, region="early visual stream")),
    ("bad compare_method", _eval(compare_method="cosine")),
    ("bad analysis", _eval(analysis="decoding")),
    ("encoding on things-behavior",
     _eval(analysis="encoding_score", neural_dataset="things-behavior",
           region="N/A", subject_idx="N/A")),
    ("encoding on nsd_synthetic",
     _eval(analysis="encoding_score", neural_dataset="nsd_synthetic")),
    ("empty return_nodes", _eval(return_nodes=[])),
    ("non-iterable return_nodes", _eval(return_nodes=7)),
    ("bad load_model_from", _eval(load_model_from="hub")),
    ("torchvision key in checkpoint mode",
     _eval(load_model_from="checkpoint", torchvision={"m": 1},
           checkpoint_dir="/nonexistent", cfg_id=32,
           checkpoint_model="checkpoint_epoch_20.pth")),
    ("missing checkpoint file",
     _eval(load_model_from="checkpoint", checkpoint_dir="/nonexistent",
           cfg_id=32, checkpoint_model="checkpoint_epoch_20.pth")),
]


@pytest.mark.parametrize("name,cfg", REJECTED, ids=[n for n, _ in REJECTED])
def test_reference_rejections_are_rejected(name, cfg):
    with pytest.raises(AssertionError):
        validate_config(cfg)


class TestNormalization:
    def test_things_region_subject_forced_na(self):
        cfg = validate_config(_eval(neural_dataset="things-behavior",
                                    region="V1", subject_idx=3))
        assert cfg.region == "N/A"
        assert cfg.subject_idx == "N/A"

    def test_scalar_subject_and_region_listified(self):
        cfg = validate_config(_eval(subject_idx=3, region="V1"))
        assert cfg.subject_idx == [3]
        assert cfg.region == ["V1"]

    def test_encoding_forces_pearson(self):
        cfg = validate_config(_eval(analysis="encoding_score",
                                    compare_method="spearman"))
        assert cfg.compare_method == "pearson"

    def test_default_batchsize(self):
        cfg = validate_config(_train())
        assert cfg.batchsize == 64

    def test_valid_eval_passes(self):
        cfg = validate_config(_eval(subject_idx=[0, 1],
                                    region=["V1", "hV4"]))
        assert cfg.subject_idx == [0, 1]
