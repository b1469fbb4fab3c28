"""Round-5 XProf harness: device-true per-op breakdown of the CHAINED
fwd+bwd bench step (the only honest form — returning just the loss DCEs
the backward, returning the grads pytree adds ~3 ms of tunnel fetch; see
PERF_NOTES round 4 and the memory notes).

Usage: python profile_r5.py [tag]
Prints the XLA-module time per step and the top ops by total time.
"""
import glob
import gzip
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from gaussian_mesh_splatting_tpu.core import make_camera
from gaussian_mesh_splatting_tpu.models.gaussian_bag import GaussianBag
from gaussian_mesh_splatting_tpu.renderer import render
from gaussian_mesh_splatting_tpu.train.loss import photometric_loss

TAG = sys.argv[1] if len(sys.argv) > 1 else "r5"
STEPS = 8

n = 100_000
width = height = 800
k = jax.random.split(jax.random.key(0), 6)
xyz = jax.random.normal(k[0], (n, 3)) * 0.5
scales_log = jax.random.normal(k[1], (n, 3)) * 0.3 - 3.5
q = jax.random.normal(k[2], (n, 4))
opacity_raw = jax.random.normal(k[3], (n, 1))
shs = jnp.concatenate(
    [jax.random.uniform(k[4], (n, 3, 1)) * 2 - 0.5,
     jax.random.normal(k[5], (n, 3, 15)) * 0.01], axis=-1)
cam = make_camera(np.eye(3), np.array([0.0, 0.0, 4.0]), 0.8, 0.8, width, height)
target = jnp.zeros((height, width, 3))
bg = jnp.zeros(3)
params = dict(xyz=xyz, scales_log=scales_log, q=q, opacity_raw=opacity_raw, shs=shs)


@jax.jit
def step(p):
    def loss_fn(pp, offset):
        out = render(GaussianBag(
            xyz=pp["xyz"], scaling=jnp.exp(pp["scales_log"]),
            rotation=pp["q"] / jnp.linalg.norm(pp["q"], axis=-1, keepdims=True),
            opacity=jax.nn.sigmoid(pp["opacity_raw"]), shs=pp["shs"],
            alive=jnp.ones((n,), bool),
        ), cam, bg, sh_degree=3, backend="pallas", mean2d_offset=offset)
        total, _ = photometric_loss(out.image, target, 0.2)
        return total
    offset = jnp.zeros((n, 2), jnp.float32)
    loss, (gp, go) = jax.value_and_grad(loss_fn, argnums=(0, 1))(p, offset)
    newp = jax.tree.map(lambda a, g: a - 1e-7 * g, p, gp)
    gn = sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(gp)) + jnp.sum(jnp.abs(go))
    return newp, loss, gn


p_cur, loss, gn = step(params)
jax.block_until_ready(loss)
assert float(gn) > 1e-3, f"zero grads - ablated backward? |g|={float(gn)}"

t0 = time.perf_counter()
for _ in range(10):
    p_cur, loss, gn = step(p_cur)
jax.block_until_ready(loss)
wall_ms = (time.perf_counter() - t0) / 10 * 1e3

trace_dir = f"/tmp/xprof_{TAG}"
jax.profiler.start_trace(trace_dir)
for _ in range(STEPS):
    p_cur, loss, gn = step(p_cur)
jax.block_until_ready(loss)
jax.profiler.stop_trace()

# ---- parse the xplane: trace_events json, group by op name ----------------
from xprof.convert import raw_to_tool_data as rtd

xplane = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))[-1]
data, _ = rtd.xspace_to_tool_data([xplane], "trace_viewer@", {})
if isinstance(data, bytes):
    data = data.decode()
tr = json.loads(data)
events = tr["traceEvents"] if isinstance(tr, dict) else tr

# identify the pid/tid lanes: "XLA Modules" = per-step module spans,
# "XLA Ops" = per-op spans
names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "thread_name":
        names[(e["pid"], e["tid"])] = e["args"]["name"]

mod_lane = [k for k, v in names.items() if "XLA Modules" in v]
op_lane = [k for k, v in names.items() if "XLA Ops" in v]

mod_tot, mod_cnt = 0.0, 0
op_tot = {}
for e in events:
    if e.get("ph") != "X":
        continue
    key = (e.get("pid"), e.get("tid"))
    if key in mod_lane and "jit_step" in e.get("name", ""):
        mod_tot += e["dur"]
        mod_cnt += 1
    elif key in op_lane:
        nm = e["name"]
        op_tot[nm] = op_tot.get(nm, 0.0) + e["dur"]

per_step_ms = mod_tot / max(mod_cnt, 1) / 1e3
print(f"wall {wall_ms:.2f} ms/step   device module {per_step_ms:.2f} ms/step "
      f"({mod_cnt} spans)   px/s {width*height/ (wall_ms/1e3):,.0f}")
print(f"{'op':55s} {'ms/step':>8s}")
for nm, us in sorted(op_tot.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{nm[:55]:55s} {us / max(mod_cnt,1) / 1e3:8.3f}")
