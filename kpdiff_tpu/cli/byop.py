"""BYOP — bring your own protein. Reference byop.py equivalent.

User supplies a receptor PDB and a reference ligand SDF defining the
pocket; pocket extraction + featurization run at inference with the
first-party PDB/SDF parsers (the reference used BioPython + rdkit,
byop.py:99-206).

    python -m kpdiff_tpu.cli.byop --model_dir runs/<run> \
        --receptor_file prot.pdb --ligand_file ref_lig.sdf --out byop_out/
"""
from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--checkpoint_step", type=int, default=None)
    p.add_argument("--receptor_file", type=str, required=True,
                   help="receptor structure, .pdb or .cif/.mmcif "
                        "(reference byop.py:13)")
    p.add_argument("--ligand_file", type=str, required=True, help="reference ligand SDF defining the pocket")
    p.add_argument("--out", type=str, default="byop_out")
    p.add_argument("--n_mols", type=int, default=32)
    p.add_argument("--sample_steps", type=int, default=0,
                   help="opt-in strided sampling (K < n_timesteps ancestral steps); "
                        "0 = full chain. K=250 matches full-chain quality at 4x "
                        "speed on the trained flagship (see STRIDED_QUALITY.json)")
    p.add_argument("--eta", type=float, default=1.0,
                   help="DDIM noise scale: 1.0 (default) = the reference's "
                        "ancestral chain (bit-exact); 0.0 = deterministic DDIM, "
                        "pair with --sample_steps for few-step sampling")
    p.add_argument("--max_batch_size", type=int, default=64)
    p.add_argument("--kp_shard_devices", type=int, default=0,
                   help="shard the keypoint axis of the reverse diffusion over "
                        "this many devices (parallel/kp_shard.py) — the "
                        "single-pocket latency mode")
    p.add_argument("--pocket_minimization", action="store_true",
                   help="force-field-minimize sampled ligands inside the fixed "
                        "pocket and write pocket_minimized_ligands.sdf + "
                        "pocket_min_rmsds.csv (reference byop.py:389-395)")
    p.add_argument("--ligand_size", type=str, default="random",
                   help="'random' (joint size dist), 'ref' (reference ligand count), or an integer")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def process_ligand_and_pocket(receptor_file, ligand_file, config):
    """Pocket extraction at inference (reference byop.py:99-206). The
    receptor may be .pdb or .cif/.mmcif (reference byop.py:13,107-110)."""
    from kpdiff_tpu.data.mmcif import parse_structure
    from kpdiff_tpu.data.pocket import get_pocket_atoms, make_element_map
    from kpdiff_tpu.data.sdf import parse_sdf

    ds_cfg = config["dataset"]
    atoms = parse_structure(receptor_file, remove_hydrogen=ds_cfg.get("remove_hydrogen", True))
    rec = atoms.select(~atoms.is_hetero)

    lig = parse_sdf(ligand_file)[0]
    if ds_cfg.get("remove_hydrogen", True):
        lig = lig.without_hydrogens()

    emap = make_element_map(ds_cfg["rec_elements"])
    pocket_coords, pocket_feats, byres_mask, interface_points = get_pocket_atoms(
        rec.coords, rec.element, rec.res_index, lig.coords,
        box_padding=ds_cfg.get("lig_box_padding", 8),
        pocket_cutoff=ds_cfg.get("pocket_cutoff", 8),
        element_map=emap,
        interface_distance_threshold=ds_cfg.get("interface_distance_threshold", 5),
        interface_exclusion_threshold=ds_cfg.get("interface_exclusion_threshold", 2),
    )
    pocket_res_idx = rec.res_index[byres_mask]
    # re-index residues compactly
    _, pocket_res_idx = np.unique(pocket_res_idx, return_inverse=True)
    return dict(
        rec_pos=pocket_coords.astype(np.float32),
        rec_feat=pocket_feats.astype(np.float32),
        rec_res_idx=pocket_res_idx.astype(np.int32),
        interface_points=interface_points.astype(np.float32),
        lig_pos=lig.coords.astype(np.float32),
        lig_feat=np.zeros((lig.n_atoms, len(ds_cfg["lig_elements"])), np.float32),
        rec_atoms=rec.select(byres_mask),
        ref_lig=lig,
    )


def main(argv=None):
    args = parse_args(argv)

    import jax
    from kpdiff_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()

    from kpdiff_tpu.analysis.molecule_builder import build_molecule
    from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config, resolve_feature_sizes
    from kpdiff_tpu.data.dataset import pad_item
    from kpdiff_tpu.data.pdb import write_pdb, write_xyz
    from kpdiff_tpu.data.sdf import write_sdf
    from kpdiff_tpu.cli.sample import _to_complex
    from kpdiff_tpu.training.trainer import TrainConfig, init_train_state, load_checkpoint, make_optimizer

    run_dir = Path(args.model_dir)
    config = load_config(run_dir / "config.yml")
    model = model_from_config(config)
    pad = PaddingConfig.from_config(config)
    _, n_lig_feat, _ = resolve_feature_sizes(config)
    lig_elements = config["dataset"]["lig_elements"]

    data = process_ligand_and_pocket(args.receptor_file, args.ligand_file, config)
    n_ref_atoms = data["lig_pos"].shape[0]
    n_pocket = data["rec_pos"].shape[0]
    print(f"pocket: {n_pocket} atoms; reference ligand: {n_ref_atoms} atoms", flush=True)

    # ligand sizes (reference byop.py:316-321)
    rng_np = np.random.default_rng(args.seed)
    batch = min(args.n_mols, args.max_batch_size)
    if args.ligand_size == "random":
        from kpdiff_tpu.models.size_dist import LigandSizeDistribution

        try:
            dist = LigandSizeDistribution(Path(config["dataset"]["location"]))
        except ValueError:
            dist = LigandSizeDistribution("/root/reference/data/bindingmoad_processed")
        sizes = dist.sample(np.array([n_pocket]), args.n_mols, rng_np)[0]
    elif args.ligand_size == "ref":
        sizes = np.full(args.n_mols, n_ref_atoms)
    else:
        sizes = np.full(args.n_mols, int(args.ligand_size))
    sizes = np.clip(sizes, 2, pad.n_lig)

    kp_vec_dim = model.cfg.rec_encoder.get("vector_size", 16) if model.cfg.architecture == "gvp" else None

    item = dict(
        lig_pos=data["lig_pos"], lig_feat=np.zeros((n_ref_atoms, len(lig_elements)), np.float32),
        rec_pos=data["rec_pos"], rec_feat=data["rec_feat"], rec_res_idx=data["rec_res_idx"],
        interface_points=data["interface_points"],
    )
    padded = pad_item(item, pad, n_lig_feat_out=n_lig_feat)
    if padded is None:
        raise SystemExit(f"pocket ({n_pocket} atoms) exceeds padding capacity {pad.n_rec}; "
                         "increase padding.n_rec in the config")

    opt = make_optimizer(TrainConfig())
    example = _to_complex([padded], pad, model, kp_vec_dim)
    state = init_train_state(model, opt, jax.random.key(0), example)
    state = load_checkpoint(run_dir / "checkpoints", state, step=args.checkpoint_step)
    params = state.params

    encode_fn = jax.jit(model.encode)
    sample_fn = jax.jit(lambda params, rng, enc, kk, init_com:
                        model.sample(params, rng, enc, kk, init_com=init_com,
                                     sample_steps=args.sample_steps, eta=args.eta))

    mesh = None
    if args.kp_shard_devices > 1:
        from kpdiff_tpu.parallel.mesh import make_mesh, replicated

        mesh = make_mesh(args.kp_shard_devices, axis_names=("model",))
        params = jax.device_put(params, replicated(mesh))

    def sample_batch(params, rng, cpx, init_com):
        # encode once per batch; compact the static kk edges to the exact
        # capped neighbor list before the reverse-diffusion scan
        enc, kk = encode_fn(params, cpx)
        kk = model.compact_kk(enc, kk)
        if mesh is not None:
            from kpdiff_tpu.parallel.kp_shard import shard_encoded

            enc, kk = shard_encoded(enc, kk, mesh, axis="model")
        return sample_fn(params, rng, enc, kk, init_com), enc

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    ref_com = data["lig_pos"].mean(0)  # init at reference-ligand COM (byop.py:324-334)
    mols = []
    rng = jax.random.key(args.seed)
    t0 = time.time()
    done = 0
    while done < args.n_mols:
        bs = min(batch, args.n_mols - done)
        items = []
        for j in range(bs):
            it = dict(item)
            n = int(sizes[done + j])
            it["lig_pos"] = np.zeros((n, 3), np.float32)
            it["lig_feat"] = np.zeros((n, len(lig_elements)), np.float32)
            items.append(pad_item(it, pad, n_lig_feat_out=n_lig_feat))
        # pad the batch to the jit batch size
        while len(items) < batch:
            items.append(items[-1])
        cpx = _to_complex(items, pad, model, kp_vec_dim)
        init_com = np.broadcast_to(ref_com, (batch, 3)).astype(np.float32)
        rng, k = jax.random.split(rng)
        out, enc = sample_batch(params, k, cpx, init_com)
        lig_x, lig_h, lig_mask = map(np.asarray, (out["lig_x"], out["lig_h"], out["lig_mask"]))
        for b in range(bs):
            m = lig_mask[b]
            if m.sum() == 0:
                continue
            feats = lig_h[b][m][:, : len(lig_elements)]
            elements = [lig_elements[j] for j in feats.argmax(1)]
            mol = build_molecule(lig_x[b][m], elements)
            if mol is not None:
                mols.append(mol)
        done += bs

    dt = time.time() - t0
    write_sdf([m.to_sdf_mol(title=f"byop_{j}") for j, m in enumerate(mols)], out_dir / "raw_ligands.sdf")
    write_pdb(data["rec_atoms"], out_dir / "pocket.pdb")
    kx, km = np.asarray(out["kp_x"]), np.asarray(enc.kp_mask)
    if model.cfg.rec_encoder_type == "learned":
        write_xyz(np.asarray(enc.kp_x)[0][km[0]], ["C"] * int(km[0].sum()), out_dir / "keypoints.xyz")
    if args.pocket_minimization:
        from kpdiff_tpu.analysis.pocket_minimization import minimize_and_write

        rmsds = minimize_and_write(data["rec_pos"], mols, out_dir)
        mean_r = np.mean(rmsds) if rmsds else 0.0
        print(f"pocket minimization: {len(rmsds)} mols, mean RMSD {mean_r:.3f}", flush=True)
    print(f"{len(mols)} valid molecules in {dt:.1f}s -> {out_dir}", flush=True)


if __name__ == "__main__":
    main()
