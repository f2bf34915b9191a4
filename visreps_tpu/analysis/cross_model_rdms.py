"""Cross-model RDM comparison matrices (CLIP / DINO / ViT / CNNs).

BASELINE.json configs[3] workload: all-layer RDMs for a list of models
over a shared stimulus set, plus the layer×layer RDM-correlation matrix
for every model pair. The reference ships per-model feature-extraction
scripts only (reference: scripts/extract_representations/
clip_representations.py:1-60) and no cross-model comparison tool; here
extraction runs through the standard jitted FeatureExtractor (fused SRP,
uint8 H2D) for every family — torchvision CNNs/ViT, flax CustomCNN, and
the TPU-native CLIP/DINOv2 towers (models/hf_vit.py) — and the pairwise
correlations run as batched device programs (ops/rdm.py).

Usage:
  python -m visreps_tpu.analysis.cross_model_rdms \\
      --models AlexNet clip-vit-l14 dinov2-l14 --stimuli <dir>|synthetic:64 \\
      --out cross_model_rdms.npz [--srp-k 4096] [--method spearman]
      [--random-init] [--image-size 224] [--tiny-towers]

Output npz:
  layers__<model>      layer-name array per model
  rdm__<model>__<layer>  (optional, --save-rdms) the (N, N) RDMs
  corr__<mi>__<mj>     (L_i, L_j) RDM-correlation matrix per pair
  summary              best (layer_i, layer_j, corr) rows per pair
"""
from __future__ import annotations

import argparse
from typing import Dict, List

import numpy as np

import jax.numpy as jnp

from visreps_tpu.core.logging import rprint
from visreps_tpu.ops.rdm import compute_rdm, compute_rdm_correlation_batched


def _tower_nodes(module) -> List[str]:
    return (["patch_embed"]
            + [f"block{i}" for i in range(1, module.num_layers + 1)]
            + ["pooled"])


def resolve_model(name: str, pretrained: bool, image_size: int,
                  tiny_towers: bool = False):
    """Model name → (ModelState, return_nodes)."""
    lname = name.lower()
    if "clip" in lname or "dino" in lname:
        if tiny_towers:
            import jax

            from visreps_tpu.models.hf_vit import CLIPVisionTower, DINOv2Tower
            from visreps_tpu.models.zoo import ModelState

            cls = CLIPVisionTower if "clip" in lname else DINOv2Tower
            kwargs = dict(hidden=32, num_layers=2, heads=4, mlp_dim=64, patch=16)
            if cls is CLIPVisionTower:
                kwargs["projection_dim"] = None
            module = cls(**kwargs)
            params = module.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, image_size, image_size, 3), jnp.float32))["params"]
            state = ModelState(module=module, params=params, batch_stats=None,
                               input_size=image_size)
        else:
            from visreps_tpu.models.hf_vit import load_tower

            state = load_tower(name, pretrained=pretrained, image_size=image_size)
        return state, _tower_nodes(state.module)

    from visreps_tpu.models.zoo import TORCHVISION_RETURN_NODES, init_model

    state = init_model(name, 1000, seed=0, input_size=image_size)
    if pretrained:
        from visreps_tpu.models.torch_import import load_pretrained_torch

        state = load_pretrained_torch(state, name, 1000)
    nodes = TORCHVISION_RETURN_NODES.get(
        name, [p for p in ("conv1", "fc1") if p in state.module.TAPS])
    return state, nodes


def build_stimuli(spec: str, image_size: int) -> Dict[str, np.ndarray]:
    """'synthetic:N' or a directory of images → {id: array/path}."""
    if spec.startswith("synthetic:"):
        n = int(spec.split(":", 1)[1])
        rng = np.random.Generator(np.random.PCG64(0))
        return {f"syn{i:04d}": rng.integers(0, 256, (image_size, image_size, 3),
                                            dtype=np.uint8)
                for i in range(n)}
    import os

    files = sorted(os.listdir(spec))
    return {f: os.path.join(spec, f) for f in files}


def model_layer_rdms(state, return_nodes, loader, srp_k: int,
                     batch_size: int, image_size: int) -> Dict[str, np.ndarray]:
    """{layer: (N, N) RDM} over the loader's stimuli (order-aligned)."""
    from visreps_tpu.models.extractor import FeatureExtractor

    ex = FeatureExtractor(state, return_nodes, extract_pre_and_post=False,
                          srp_k=srp_k, batch_size=batch_size,
                          image_size=image_size)
    acts, ids = ex.get_activations(loader)
    order = np.argsort(np.asarray(ids, dtype=object))
    rdms = {}
    for layer, a in acts.items():
        rdms[layer] = np.asarray(compute_rdm(jnp.asarray(np.asarray(a)[order])))
    return rdms


def cross_model_matrix(rdms_a: Dict[str, np.ndarray],
                       rdms_b: Dict[str, np.ndarray],
                       method: str = "spearman") -> np.ndarray:
    """(L_a, L_b) RDM-correlation matrix as ONE batched device program."""
    la, lb = list(rdms_a), list(rdms_b)
    pairs_a = jnp.stack([jnp.asarray(rdms_a[x]) for x in la for _ in lb])
    pairs_b = jnp.stack([jnp.asarray(rdms_b[y]) for _ in la for y in lb])
    vals = np.asarray(compute_rdm_correlation_batched(pairs_a, pairs_b, method))
    return vals.reshape(len(la), len(lb))


def run(models: List[str], stimuli_spec: str, out: str, srp_k: int = 4096,
        batch_size: int = 64, image_size: int = 224, method: str = "spearman",
        pretrained: bool = True, save_rdms: bool = False,
        tiny_towers: bool = False) -> dict:
    from visreps_tpu.data.loader import make_stimuli_loader
    from visreps_tpu.data.transforms import get_transform

    stimuli = build_stimuli(stimuli_spec, image_size)
    rprint(f"  {len(stimuli)} stimuli, {len(models)} models", style="info")

    all_rdms: Dict[str, Dict[str, np.ndarray]] = {}
    errors: Dict[str, str] = {}
    for name in models:
        # One model failing (e.g. a remote-compile-helper crash on a
        # 24-block tower program) must not lose the other models'
        # matrices — record the error and keep going.
        try:
            state, nodes = resolve_model(name, pretrained, image_size,
                                         tiny_towers)
            transform = get_transform("imgnet", image_size=image_size,
                                      normalize=False)
            loader = make_stimuli_loader(stimuli, transform, batch_size, 4)
            all_rdms[name] = model_layer_rdms(state, nodes, loader, srp_k,
                                              batch_size, image_size)
            del state
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            rprint(f"  [{name}] FAILED: {errors[name]}", style="warning")
            continue
        rprint(f"  [{name}] {len(all_rdms[name])} layer RDMs", style="success")

    payload: dict = {}
    summary = []
    names = list(all_rdms)
    for i, mi in enumerate(names):
        payload[f"layers__{mi}"] = np.asarray(list(all_rdms[mi]), dtype=object)
        if save_rdms:
            for layer, rdm in all_rdms[mi].items():
                payload[f"rdm__{mi}__{layer}"] = rdm.astype(np.float32)
        for mj in names[i:]:
            mat = cross_model_matrix(all_rdms[mi], all_rdms[mj], method)
            payload[f"corr__{mi}__{mj}"] = mat
            # exclude the trivial diagonal for the self-pair summary
            m = mat.copy()
            if mi == mj:
                np.fill_diagonal(m, -np.inf)
            bi, bj = np.unravel_index(np.argmax(m), m.shape)
            summary.append((mi, mj, list(all_rdms[mi])[bi],
                            list(all_rdms[mj])[bj], float(mat[bi, bj])))
            rprint(
                f"  {mi} vs {mj}: best {summary[-1][2]} ↔ {summary[-1][3]} "
                f"({method} {summary[-1][4]:.4f})", style="highlight")
    payload["summary"] = np.asarray(summary, dtype=object)
    payload["method"] = method
    if errors:
        payload["model_errors"] = np.asarray(
            [f"{k}: {v}" for k, v in errors.items()], dtype=object)
    np.savez(out, **payload)
    rprint(f"  Saved {out}", style="success")
    return payload


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--models", nargs="+", required=True)
    p.add_argument("--stimuli", default="synthetic:64")
    p.add_argument("--out", default="cross_model_rdms.npz")
    p.add_argument("--srp-k", type=int, default=4096)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--method", default="spearman",
                   choices=["spearman", "pearson", "kendall"])
    p.add_argument("--random-init", action="store_true",
                   help="skip pretrained weight loading")
    p.add_argument("--save-rdms", action="store_true")
    p.add_argument("--tiny-towers", action="store_true",
                   help="2-layer towers for offline smoke runs")
    a = p.parse_args(argv)
    run(a.models, a.stimuli, a.out, srp_k=a.srp_k, batch_size=a.batch_size,
        image_size=a.image_size, method=a.method, pretrained=not a.random_init,
        save_rdms=a.save_rdms, tiny_towers=a.tiny_towers)


if __name__ == "__main__":
    main()
