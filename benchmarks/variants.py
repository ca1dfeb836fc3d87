import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, sys, json, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
from kpdiff_tpu.models.complex import synthetic_batch

config = sys.argv[1] if len(sys.argv) > 1 else "egnn_all_atom"
n_lig = int(sys.argv[2]) if len(sys.argv) > 2 else 32
T = int(sys.argv[3]) if len(sys.argv) > 3 else 100
batch = int(sys.argv[4]) if len(sys.argv) > 4 else 32
compact = (sys.argv[5] != "nocompact") if len(sys.argv) > 5 else True
# KPDIFF_COMPILER_OPTS: JSON dict of TPU compiler options, passed per-compile
# through PJRT to the (chipless) remote compile service — the only way to
# reach xla_tpu_* backend flags here (host XLA_FLAGS has no TPU flags).
copts = json.loads(os.environ.get("KPDIFF_COMPILER_OPTS", "null"))

cfg = load_config(f"configs/{config}.yml")
cfg["diffusion"]["n_timesteps"] = T
model = model_from_config(cfg)
pad = PaddingConfig.from_config(cfg)
kpv = cfg.get("dynamics_gvp", {}).get("vector_size", 16) if model.cfg.architecture == "gvp" else None
cpx = synthetic_batch(0, batch=batch, n_rec_pad=pad.n_rec, n_lig_pad=n_lig,
    n_rec_feat=10, n_lig_feat=10, n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf,
    kp_vec_dim=kpv, n_ip_pad=pad.n_ip, min_rec=260, min_lig=min(18, n_lig-2), min_sep=1.8)
params = model.init(jax.random.key(0), cpx)
encode_fn = jax.jit(model.encode)
sample_fn = jax.jit(lambda p, r, enc, kk: model.sample(p, r, enc, kk))
enc, kk = encode_fn(params, cpx)
if compact:
    kk = model.compact_kk(enc, kk)
if copts:
    # AOT-compile with explicit TPU backend options; the compiled
    # executable is then called directly (same signature)
    sample_fn = sample_fn.lower(params, jax.random.key(1), enc, kk
                                ).compile(compiler_options=copts)
kk_desc = "block" if isinstance(kk, dict) else ("nbr" if isinstance(kk, tuple) else "dense")
t0=time.time(); out = sample_fn(params, jax.random.key(1), enc, kk); np.asarray(out["lig_x"]); comp=time.time()-t0
ts=[]
for i in range(3):
    t0=time.time(); out = sample_fn(params, jax.random.key(2+i), enc, kk); np.asarray(out["lig_x"]); ts.append(time.time()-t0)
best=min(ts)
info = {"config": config, "kk": kk_desc, "n_lig": n_lig, "T": T, "batch": batch,
        "ms_per_step": round(best/T*1000,2),
        "sec_per_lig_at_T1000": round(best/T*1000/batch,4), "compile_s": round(comp,1)}
if kk_desc == "nbr":
    info["kk_cap"] = int(kk[0].shape[-1])
print(json.dumps(info))
