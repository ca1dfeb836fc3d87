"""Config system: reference-compatible YAML in, typed configs out.

Accepts the reference's single-YAML layout (sections experiment/wandb/
dataset/graph/rec_encoder{,_gvp}/diffusion/dynamics{,_gvp}/
rec_encoder_loss/training/sampling_config — configs/dev_config.yml and
trained_models/*/config.yml in the reference repo) so that a user of the
reference can bring their configs over unchanged. model_from_config
mirrors the reference factory (model_setup.py:4-64) including its feature
-size resolution, with one fix: ca_only datasets carry 20-dim residue
one-hots (process_bindingmoad.py:166-180), which the reference factory
mis-sizes as len(rec_elements).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict

import yaml

from kpdiff_tpu.models.diffusion import DiffusionConfig, KeypointDiffusion

N_AA_TYPES = 20  # one-hot residue types for ca_only pockets


@dataclasses.dataclass(frozen=True)
class PaddingConfig:
    """Static capacities for the padded complex. Defaults sized from the
    BindingMOAD joint size histogram (rec 7..661, lig 2..60)."""

    n_rec: int = 384
    n_lig: int = 64
    n_kp: int = 20  # keypoint capacity; == n_rec for fixed encoders
    n_ip: int = 64  # interface points

    @staticmethod
    def from_config(config: Dict[str, Any]) -> "PaddingConfig":
        pad = dict(config.get("padding", {}))
        n_kp = config.get("graph", {}).get("n_keypoints", 20)
        rec_encoder_type = config.get("diffusion", {}).get("rec_encoder_type", "learned")
        n_rec = pad.get("n_rec", 384)
        if rec_encoder_type == "fixed":
            n_kp = n_rec
        return PaddingConfig(
            n_rec=n_rec,
            n_lig=pad.get("n_lig", 64),
            n_kp=pad.get("n_kp", n_kp),
            n_ip=pad.get("n_ip", 64),
        )


def load_config(path: str | Path) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def resolve_feature_sizes(config: Dict[str, Any]):
    """(n_rec_feat, n_lig_feat, n_kp_feat) per model_setup.py:27-40."""
    ds = config["dataset"]
    diffusion = config.get("diffusion", {})
    architecture = diffusion.get("architecture", "egnn")
    rec_encoder_type = diffusion.get("rec_encoder_type", "learned")
    use_fake_atoms = ds.get("max_fake_atom_frac", 0.0) > 0

    if ds.get("ca_only", False):
        n_rec_feat = N_AA_TYPES
    else:
        n_rec_feat = len(ds["rec_elements"])

    n_lig_feat = len(ds["lig_elements"]) + (1 if use_fake_atoms else 0)

    if rec_encoder_type == "learned":
        if architecture == "egnn":
            n_kp_feat = config["rec_encoder"]["out_n_node_feat"]
        else:
            n_kp_feat = config["rec_encoder_gvp"]["out_scalar_size"]
    else:
        n_kp_feat = n_rec_feat
    return n_rec_feat, n_lig_feat, n_kp_feat


def model_from_config(config: Dict[str, Any]) -> KeypointDiffusion:
    diffusion = dict(config.get("diffusion", {}))
    architecture = diffusion.pop("architecture", "egnn")
    rec_encoder_type = diffusion.pop("rec_encoder_type", "learned")

    n_rec_feat, n_lig_feat, n_kp_feat = resolve_feature_sizes(config)

    graph = config.get("graph", {})
    cutoffs = dict(graph.get("graph_cutoffs", {}))
    n_keypoints = graph.get("n_keypoints", 20)

    if architecture == "egnn":
        dynamics_cfg = dict(config.get("dynamics", {}))
        rec_enc_cfg = dict(config.get("rec_encoder", {}))
        rec_enc_cfg["in_n_node_feat"] = n_rec_feat
        rec_enc_cfg["n_keypoints"] = n_keypoints
    else:
        dynamics_cfg = dict(config.get("dynamics_gvp", {}))
        rec_enc_cfg = dict(config.get("rec_encoder_gvp", {}))
        rec_enc_cfg["in_scalar_size"] = n_rec_feat
        rec_enc_cfg["n_keypoints"] = n_keypoints
        if rec_encoder_type == "fixed":
            # fixed GVP encoders need the dynamics vector size for kp_v
            rec_enc_cfg.setdefault("vector_size", dynamics_cfg.get("vector_size", 16))

    cfg = DiffusionConfig(
        atom_nf=n_lig_feat,
        rec_nf=n_kp_feat,
        n_timesteps=diffusion.get("n_timesteps", 1000),
        precision=diffusion.get("precision", 1e-4),
        noise_schedule=diffusion.get("noise_schedule", "polynomial_2"),
        lig_feat_norm_constant=diffusion.get("lig_feat_norm_constant", 1),
        rl_dist_threshold=diffusion.get("rl_dist_threshold", 0),
        use_fake_atoms=config["dataset"].get("max_fake_atom_frac", 0.0) > 0,
        fake_atom_loss_semantics=diffusion.get("fake_atom_loss_semantics", "intent"),
        architecture=architecture,
        rec_encoder_type=rec_encoder_type,
        graph_cutoffs=cutoffs,
        dynamics=dynamics_cfg,
        rec_encoder=rec_enc_cfg,
        rec_encoder_loss=dict(config.get("rec_encoder_loss", {})),
    )
    return KeypointDiffusion(cfg)
