"""Drill into backtrace (iota-cast / clip) and diffuse-stage remainder."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smokephysai_tpu.ops.pallas import fused_step3d as F
from smokephysai_tpu.physics.solver3d import add_smoke_source3d, init_state3d

print("devices:", jax.devices(), flush=True)
D = H = W = 128
vol = (D, H, W)
s = init_state3d(vol)
rng = np.random.RandomState(0)
X = jnp.asarray(rng.rand(*vol), jnp.float32)
VMEM = pl.BlockSpec(memory_space=pltpu.VMEM)
LIMIT = pltpu.CompilerParams(vmem_limit_bytes=F._VMEM_LIMIT)
DT = 0.01


def call(kern, outs, *args):
    return pl.pallas_call(
        kern,
        out_shape=[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in outs],
        in_specs=[VMEM] * len(args),
        out_specs=[VMEM] * len(outs),
        compiler_params=LIMIT,
    )(*args)


def tcase(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        sm = float(out[0].sum()) if isinstance(out, (tuple, list)) else float(out.sum())
        print(f"[{name}] OK {time.perf_counter()-t0:.1f}s sum={sm:.4f}", flush=True)
        return True
    except Exception as e:
        print(f"[{name}] FAIL {time.perf_counter()-t0:.1f}s {str(e).split(chr(10))[0][:160]}", flush=True)
        return False


def k_bt(u_ref, v_ref, w_ref, o_ref):
    tz, ty, tx = F._backtrace_vals(u_ref[:], v_ref[:], w_ref[:], DT, 1)
    o_ref[:] = tz + ty + tx


def k_iota_cast(x_ref, o_ref):
    zc = lax.broadcasted_iota(jnp.int32, vol, 0).astype(jnp.float32)
    yc = lax.broadcasted_iota(jnp.int32, vol, 1).astype(jnp.float32)
    xc = lax.broadcasted_iota(jnp.int32, vol, 2).astype(jnp.float32)
    o_ref[:] = zc + yc + xc + x_ref[:]


def k_clip(x_ref, o_ref):
    x = x_ref[:]
    o_ref[:] = jnp.clip(2.0 * x, 0, D - 1) - x


def k_bt1(x_ref, o_ref):
    zc = lax.broadcasted_iota(jnp.int32, vol, 0).astype(jnp.float32)
    o_ref[:] = jnp.clip(zc - DT * x_ref[:], 0, D - 1) - zc


def k_pad_div(u_ref, v_ref, w_ref, d_ref, w_out, div_out):
    u, v, w_vel, density = u_ref[:], v_ref[:], w_ref[:], d_ref[:]
    w_vel = w_vel + DT * 0.1 * F._pad1(density, 0)
    w_out[:] = w_vel
    div_out[:] = (F._diff_down(u, 2) + F._diff_down(v, 1) + F._diff_down(w_vel, 0)) / DT


def k_diffuse4_stag(u_ref, v_ref, w_ref, d_ref, u_out, v_out, w_out, d_out):
    u_out[:] = F._diffuse_val3(u_ref[:], 1e-5)
    v_out[:] = F._diffuse_val3(v_ref[:], 1e-5)
    w_out[:] = F._diffuse_val3(w_ref[:], 1e-5)
    d_out[:] = F._diffuse_val3(d_ref[:], 1e-6)


for c in (sys.argv[1:] or ["iota_cast", "clip", "bt1", "bt", "pad_div", "diffuse4_stag"]):
    if c == "bt":
        tcase(c, lambda: call(k_bt, [vol], X, X, X))
    elif c == "iota_cast":
        tcase(c, lambda: call(k_iota_cast, [vol], X))
    elif c == "clip":
        tcase(c, lambda: call(k_clip, [vol], X))
    elif c == "bt1":
        tcase(c, lambda: call(k_bt1, [vol], X))
    elif c == "pad_div":
        tcase(c, lambda: call(k_pad_div, [s.w.shape, vol], s.u, s.v, s.w, s.density))
    elif c == "diffuse4_stag":
        tcase(c, lambda: call(k_diffuse4_stag, [s.u.shape, s.v.shape, s.w.shape, vol], s.u, s.v, s.w, s.density))
print("bisect8 done", flush=True)
