"""Config validation mirroring the reference's ConfigVerifier semantics.

Reference parity: visreps/utils.py:510-823. Rules preserved:
  * mode ∈ {train, eval}
  * train: dataset / model_class whitelists, pca_labels required,
    conv_trainable / fc_trainable binary strings, pca_n_classes a
    power of two > 1, default batchsize 64.
  * eval: seed ∈ {1,2,3}; subject_idx/region normalized to lists and
    whitelisted per dataset (NSD 8 subjects + 8 regions, TVSD 2
    monkeys × V1/V4/IT); things-behavior forces region/subject to
    "N/A"; encoding_score forbidden for things-behavior and
    nsd_synthetic and forces compare_method="pearson"; return_nodes
    non-empty; checkpoint existence check.
"""
from __future__ import annotations

from pathlib import Path

from visreps_tpu.core.config import Config, get_seed_letter
from visreps_tpu.core.logging import rprint

VALID_MODES = {"train", "eval"}
VALID_DATASETS = {
    "imagenet",
    "tiny-imagenet",
    "imagenet-mini-10",
    "imagenet-mini-50",
    "imagenet-mini-200",
}
VALID_MODEL_CLASSES = {"custom_model", "standard_model"}
VALID_MODEL_SOURCES = {"checkpoint", "torchvision"}
VALID_ANALYSES = {"rsa", "encoding_score"}
VALID_COMPARE_METHODS = {"spearman", "kendall"}
VALID_NEURAL_DATASETS = {"nsd", "things-behavior", "tvsd", "nsd_synthetic"}
VALID_NSD_REGIONS = {
    "early visual stream",
    "ventral visual stream",
    "V1",
    "V2",
    "V3",
    "hV4",
    "FFA",
    "PPA",
}
VALID_TVSD_REGIONS = {"V1", "V4", "IT"}


class ConfigVerifier:
    def __init__(self, cfg: Config):
        self.cfg = cfg

    def verify(self) -> Config:
        if self.cfg.get("mode") not in VALID_MODES:
            raise AssertionError(f"Invalid mode: {self.cfg.get('mode')}")
        if self.cfg.mode == "train":
            return self._verify_train()
        return self._verify_eval()

    # ── train ────────────────────────────────────────────────
    def _verify_train(self) -> Config:
        cfg = self.cfg
        if cfg.get("dataset") not in VALID_DATASETS:
            raise AssertionError(f"Invalid dataset: {cfg.get('dataset')}")
        if cfg.get("model_class") not in VALID_MODEL_CLASSES:
            raise AssertionError(f"Invalid model_class: {cfg.get('model_class')}")
        if "pca_labels" not in cfg:
            raise AssertionError("pca_labels flag must be specified")

        self._verify_model_config()
        if cfg.pca_labels:
            self._verify_pca_config()

        if "batchsize" not in cfg:
            cfg.batchsize = 64
            rprint("Using default batch size: 64", style="info")
        return cfg

    def _verify_model_config(self) -> None:
        cfg = self.cfg
        if cfg.model_class == "standard_model":
            if "custom_model" in cfg:
                raise AssertionError("custom_model key should not be present in standard_model mode")
        else:
            if "standard_model" in cfg:
                raise AssertionError("standard_model key should not be present in custom_model mode")
            arch = cfg.get("arch", Config())
            if not all(c in "01" for c in arch.get("conv_trainable", "")):
                raise AssertionError("conv_trainable must only contain '0's and '1's")
            if not all(c in "01" for c in arch.get("fc_trainable", "")):
                raise AssertionError("fc_trainable must only contain '0's and '1's")
            if cfg.get("dataset") == "imagenet" and "tiny" in cfg.get("model_name", "").lower():
                rprint("Training TinyCustomCNN on ImageNet-1k (designed for TinyImageNet)", style="warning")
            elif cfg.get("dataset") == "tiny-imagenet" and "tiny" not in cfg.get("model_name", "").lower():
                rprint("Training CustomCNN on TinyImageNet (designed for ImageNet-1k)", style="warning")

    def _verify_pca_config(self) -> None:
        n = self.cfg.get("pca_n_classes", 0)
        if n <= 1:
            raise AssertionError("pca_n_classes must be greater than 1 when pca_labels is True")
        if (n & (n - 1)) != 0:
            raise AssertionError("pca_n_classes must be a power of 2")

    # ── eval ─────────────────────────────────────────────────
    def _verify_eval(self) -> Config:
        cfg = self.cfg
        if cfg.get("seed") not in (1, 2, 3):
            raise AssertionError(f"Invalid seed: {cfg.get('seed')}. Must be one of [1, 2, 3]")

        dataset = cfg.get("neural_dataset", "").lower()
        if dataset not in VALID_NEURAL_DATASETS:
            raise AssertionError(f"Invalid neural_dataset: {dataset}")

        if dataset == "things-behavior":
            for key in ("region", "subject_idx"):
                val = cfg.get(key)
                if val is not None and not (isinstance(val, str) and val.upper() == "N/A"):
                    rprint(f"{key}={val!r} ignored for things-behavior; set to 'N/A'", style="warning")
                    cfg[key] = "N/A"

        if dataset in ("nsd", "nsd_synthetic"):
            subs = self._listify("subject_idx")
            for s in subs:
                if not isinstance(s, int) or not 0 <= s < 8:
                    raise AssertionError(f"Invalid subject index for NSD: {s}. Must be an integer in range [0, 7]")
            regs = self._listify("region")
            for r in regs:
                if r not in VALID_NSD_REGIONS:
                    raise AssertionError(f"Invalid region for NSD: {r}. Must be one of {VALID_NSD_REGIONS}")

        if dataset == "tvsd":
            subs = self._listify("subject_idx")
            for s in subs:
                if not isinstance(s, int) or s not in (0, 1):
                    raise AssertionError(f"Invalid subject_idx for TVSD: {s}. Must be 0 (monkey F) or 1 (monkey N)")
            regs = self._listify("region")
            for r in regs:
                if r not in VALID_TVSD_REGIONS:
                    raise AssertionError(f"Invalid region for TVSD: {r}. Must be one of {VALID_TVSD_REGIONS}")

        method = cfg.get("compare_method", "spearman").lower()
        if method not in VALID_COMPARE_METHODS:
            raise AssertionError(f"Invalid compare_method: {method}")

        analysis = cfg.get("analysis", "").lower()
        if analysis not in VALID_ANALYSES:
            raise AssertionError(f"Invalid analysis: {cfg.get('analysis')}")

        if analysis == "encoding_score":
            if dataset == "things-behavior":
                raise AssertionError(
                    "analysis=encoding_score is not supported for things-behavior "
                    "(behavioral embeddings have no voxels to predict). Use analysis=rsa instead."
                )
            if dataset == "nsd_synthetic":
                raise AssertionError(
                    "analysis=encoding_score is not supported for nsd_synthetic. Use analysis=rsa instead."
                )
            # Encoding metric is always Pearson r; keeps run_id hashing consistent.
            cfg.compare_method = "pearson"

        nodes = cfg.get("return_nodes")
        if nodes is None or not hasattr(nodes, "__iter__"):
            raise AssertionError("return_nodes must be a list-like object")
        if not list(nodes):
            raise AssertionError("return_nodes list cannot be empty")

        if cfg.get("load_model_from") not in VALID_MODEL_SOURCES:
            raise AssertionError(f"load_model_from must be in {VALID_MODEL_SOURCES}")

        if cfg.load_model_from == "checkpoint":
            if "torchvision" in cfg:
                raise AssertionError("torchvision key not allowed in checkpoint mode")
            seed_letter = get_seed_letter(cfg.seed)
            path = Path(f"{cfg.checkpoint_dir}/cfg{cfg.cfg_id}{seed_letter}/{cfg.checkpoint_model}")
            if not path.exists():
                raise AssertionError(f"Checkpoint not found: {path}")

        return cfg

    def _listify(self, key: str) -> list:
        val = self.cfg.get(key)
        if not isinstance(val, list):
            val = [val]
        self.cfg[key] = val
        return val


def validate_config(cfg: Config) -> Config:
    return ConfigVerifier(cfg).verify()
