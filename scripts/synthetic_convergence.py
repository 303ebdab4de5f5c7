import time, jax, jax.numpy as jnp, optax, numpy as np
import sys; sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
jax.config.update('jax_default_prng_impl', 'rbg')
from jax.experimental.compilation_cache import compilation_cache as cc
cc.set_cache_dir("/tmp/jax_cache_trajsde")
from __graft_entry__ import _build_flagship
from trajsde_tpu.losses import diff_bce_loss, l2_loss
from trajsde_tpu.train.loop import create_train_state, make_train_step, make_eval_step
from trajsde_tpu.train.metrics import make_metrics

B, A, L = 64, 16, 32
model = _build_flagship(dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
from trajsde_tpu.data.synthetic import make_scene_batch
train_scenes = [jax.device_put(make_scene_batch(rng, B, A, L, sources=[0,1])) for _ in range(4)]
val_scene = jax.device_put(make_scene_batch(np.random.default_rng(99), B, A, L, sources=[0,1]))

opt = optax.adamw(optax.cosine_decay_schedule(1e-3, 400), weight_decay=7e-4)
state = create_train_state(model, opt, train_scenes[0])
step = make_train_step(model, opt, [("L2",1.0,l2_loss),("DiffBCE",1.0,diff_bce_loss)], donate=False)
metrics = make_metrics(["ADE_T","FDE_T","MR_T"], [{"dataset":"nuScenes","end_idcs":[59,29]}]*3)
eval_step = make_eval_step(model, metrics)

def evaluate(state):
    for m in metrics: m.reset()
    c = eval_step(state.params, val_scene, jax.random.key(5), np.int32(0))
    for m in metrics: m.accumulate(jax.tree.map(float, c[m.name]))
    return {m.name: m.compute() for m in metrics}

print("step 0 eval:", evaluate(state), flush=True)
losses = []
t0 = time.time()
for it in range(400):
    state, logs = step(state, train_scenes[it % 4])
    if it % 100 == 99:
        l = float(logs["train/total"]); losses.append(l)
        print(f"it {it+1}: loss {l:.4f} ({time.time()-t0:.0f}s)", flush=True)
print("final eval:", evaluate(state), flush=True)
print("loss curve:", [round(l,3) for l in losses], flush=True)
