import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def loop_kernel(x_ref, o_ref):
    def body(_, x):
        return x * 1.01 + 0.001
    o_ref[:] = lax.fori_loop(0, 20, body, x_ref[:])

@jax.jit
def f(x):
    return pl.pallas_call(loop_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

x = jnp.ones((256,256))
t0=time.time(); y=f(x); y.block_until_ready()
print("loop kernel compile+run:", round(time.time()-t0,1), "s", flush=True)

def concat_kernel(x_ref, o_ref):
    def body(_, x):
        h, w = x.shape
        up = jnp.concatenate([jnp.zeros((1,w), x.dtype), x[:-1,:]], axis=0)
        left = jnp.concatenate([jnp.zeros((h,1), x.dtype), x[:,:-1]], axis=1)
        return x + 0.1*up + 0.1*left
    o_ref[:] = lax.fori_loop(0, 20, body, x_ref[:])

@jax.jit
def g(x):
    return pl.pallas_call(concat_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)

t0=time.time(); y=g(x); y.block_until_ready()
print("concat kernel compile+run:", round(time.time()-t0,1), "s", flush=True)
