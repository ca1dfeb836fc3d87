import time, sys, json, numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/tmp/kpdiff_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
from kpdiff_tpu.config import PaddingConfig, load_config, model_from_config
from kpdiff_tpu.models.complex import synthetic_batch

vec_layout = sys.argv[1] if len(sys.argv) > 1 else "flat"
n_lig = int(sys.argv[2]) if len(sys.argv) > 2 else 32
T = int(sys.argv[3]) if len(sys.argv) > 3 else 100
batch = int(sys.argv[4]) if len(sys.argv) > 4 else 64

cfg = load_config("/root/repo/configs/gvp_40kp.yml")
cfg["dynamics_gvp"]["vec_layout"] = vec_layout
cfg["diffusion"]["n_timesteps"] = T
model = model_from_config(cfg)
pad = PaddingConfig.from_config(cfg)
cpx = synthetic_batch(0, batch=batch, n_rec_pad=pad.n_rec, n_lig_pad=n_lig,
    n_rec_feat=10, n_lig_feat=10, n_kp=pad.n_kp, kp_feat_dim=model.cfg.rec_nf,
    kp_vec_dim=model.cfg.rec_encoder.get("vector_size", 16),
    n_ip_pad=pad.n_ip, min_rec=260, min_lig=min(18, n_lig-2), min_sep=1.8)
params = model.init(jax.random.key(0), cpx)
encode_fn = jax.jit(model.encode)
sample_fn = jax.jit(lambda p, r, enc, kk: model.sample(p, r, enc, kk))
enc, kk = encode_fn(params, cpx)
kk = model.compact_kk(enc, kk)
t0=time.time(); out = sample_fn(params, jax.random.key(1), enc, kk); np.asarray(out["lig_x"]); comp=time.time()-t0
ts=[]
for i in range(3):
    t0=time.time(); out = sample_fn(params, jax.random.key(2+i), enc, kk); np.asarray(out["lig_x"]); ts.append(time.time()-t0)
best=min(ts)
print(json.dumps({"layout": vec_layout, "n_lig": n_lig, "T": T, "batch": batch,
                  "ms_per_step": round(best/T*1000,2),
                  "sec_per_lig_at_T1000": round(best/T*1000/batch,4), "compile_s": round(comp,1)}))
