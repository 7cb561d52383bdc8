"""TPU numeric check: fused dq+dk+dv flash backward vs the split dq/dkv
kernels, compiled by Mosaic on the real chip (the CPU test suite runs
Pallas in interpret mode, which cannot catch a Mosaic miscompile).

Exits 0 iff all three gradients agree within bf16-accumulation slack.
Run from repo root: python scripts/check_fused_bwd_tpu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smokephysai_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from smokephysai_tpu.ops.pallas import attention as A

    B, L, D, H = 4, 1024, 512, 8  # the flagship trunk's attention shape
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(k1, (B, L, D), jnp.float32)
    k = jax.random.normal(k2, (B, L, D), jnp.float32)
    v = jax.random.normal(k3, (B, L, D), jnp.float32)
    g = jax.random.normal(k4, (B, L, D), jnp.float32)

    def grads():
        return jax.grad(
            lambda q, k, v: jnp.sum(
                A.flash_attention_tokens_trainable(q, k, v, H, 1.0) * g
            ),
            argnums=(0, 1, 2),
        )(q, k, v)

    os.environ["SMOKEPHYS_FUSED_BWD"] = "1"
    fused = [np.asarray(x) for x in grads()]
    os.environ["SMOKEPHYS_FUSED_BWD"] = "0"
    split = [np.asarray(x) for x in grads()]

    ok = True
    for name, a, b in zip(("dq", "dk", "dv"), fused, split):
        diff = float(np.max(np.abs(a - b)))
        scale = float(np.max(np.abs(b))) or 1.0
        rel = diff / scale
        print(f"[check] {name}: max|fused-split| {diff:.3e} (rel {rel:.3e})",
              flush=True)
        ok = ok and rel < 1e-4 and np.all(np.isfinite(a))
    print("FUSED-BWD TPU CHECK " + ("PASS" if ok else "FAIL"), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
