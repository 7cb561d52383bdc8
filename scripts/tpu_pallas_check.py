import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)
from smokephysai_tpu.ops.pallas.jacobi import jacobi_pressure_pallas
from smokephysai_tpu.ops.pallas.stencil import diffuse_pallas
from smokephysai_tpu.physics.solver import jacobi_pressure, diffuse
k1,k2 = jax.random.split(jax.random.PRNGKey(0))
p = jax.random.normal(k1,(256,256)); div = jax.random.normal(k2,(256,256))
t0=time.time()
a = jacobi_pressure_pallas(p,div,20); a.block_until_ready()
print("pallas jacobi compile+run:", round(time.time()-t0,1), "s", flush=True)
b = jacobi_pressure(p,div,20)
print("jacobi max diff:", float(jnp.max(jnp.abs(a-b))), flush=True)
# timing
import numpy as np
for fn, name in [(lambda: jacobi_pressure_pallas(p,div,20), "pallas"),
                 (lambda: jacobi_pressure(p,div,20), "xla")]:
    fn().block_until_ready()
    ts=[]
    for _ in range(20):
        t0=time.perf_counter(); fn().block_until_ready(); ts.append(time.perf_counter()-t0)
    print(name, "jacobi20 p50:", round(np.percentile(ts,50)*1e6), "us", flush=True)
t0=time.time()
f = jax.random.uniform(k1,(257,256))
d1 = diffuse_pallas(f,0.01,0.5); d1.block_until_ready()
print("pallas diffuse compile+run:", round(time.time()-t0,1), "s", flush=True)
print("diffuse max diff:", float(jnp.max(jnp.abs(d1-diffuse(f,0.01,0.5)))), flush=True)
