import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, functools, jax, jax.numpy as jnp, numpy as np
from jax import lax
from smokephysai_tpu.physics import init_state, add_smoke_source
from smokephysai_tpu.physics import solver

def make_multi(max_disp, use_pallas, jac_iters=20):
    def body(s, _):
        # inline step with chosen max_disp
        buoy = s.density * 0.1
        s = s.replace(v=s.v.at[:, :-1].add(0.01 * buoy))
        if use_pallas:
            from smokephysai_tpu.ops.pallas import jacobi as pj, stencil as ps
            dfn = ps.diffuse_pallas; jfn = pj.jacobi_pressure_pallas
        else:
            dfn = solver.diffuse; jfn = None
        s = s.replace(u=dfn(s.u, 0.01, 0.001), v=dfn(s.v, 0.01, 0.001),
                      density=dfn(s.density, 0.01, 0.0001))
        s = solver.pressure_projection(s, 0.01, jac_iters, jacobi_fn=jfn)
        u = solver.advect(s.u, s.u, s.v, 0.01, max_disp=max_disp)
        v = solver.advect(s.v, u, s.v, 0.01, max_disp=max_disp)
        d = solver.advect(s.density, u, v, 0.01, max_disp=max_disp)
        return s.replace(u=u, v=v, density=d*0.995), None
    @jax.jit
    def run(s):
        s, _ = lax.scan(body, s, None, length=100)
        return s
    return run

s0 = init_state((256,256))
s0 = s0.replace(density=add_smoke_source(s0.density,128.,128.,8.,1.5))

# measure actual max velocity after 100 steps
run = make_multi(2, False)
s = run(s0); jax.block_until_ready(s.density)
print("max|u|:", float(jnp.abs(s.u).max()), "max|v|:", float(jnp.abs(s.v).max()), flush=True)

for D in [1,2,4]:
    for up in [False, True]:
        run = make_multi(D, up)
        s = run(s0); jax.block_until_ready(s.density)
        t0=time.perf_counter(); s = run(s0); jax.block_until_ready(s.density)
        dt=time.perf_counter()-t0
        print(f"D={D} pallas={up}: {100/dt:.1f} steps/s", flush=True)
# no-advect baseline to see advection share
run0 = make_multi(1, True, jac_iters=20)
