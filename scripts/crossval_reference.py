"""Cross-validate the committed trained checkpoint against the *reference*
torch implementation (VERDICT r1: "the one committed 103 MB checkpoint can't
be cross-validated against the reference implementation").

Loads checkpoints/smokephysnet_128_best.npz, exports it to a torch
state_dict (torch_port.export_torch_state_dict), loads it into the reference
SmokePhysNet (/root/reference), and compares eval forwards element-wise on a
fixed input with identical injected chaos fields. Run from repo root:

    python scripts/crossval_reference.py [checkpoint.npz]
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from make_goldens import numpy_lorenz_fields  # noqa: E402
from smokephysai_tpu.models import SmokePhysNet  # noqa: E402
import smokephysai_tpu.models.chaos_attention as ca_mod  # noqa: E402
from smokephysai_tpu.models.torch_port import export_torch_state_dict  # noqa: E402
from smokephysai_tpu.train.serving import _load_npz_variables  # noqa: E402

from src.models.smokephys_net import SmokePhysNet as TorchNet  # noqa: E402
from src.models.chaos_attention import ChaosAttention as TorchCA  # noqa: E402


def main(ckpt="checkpoints/smokephysnet_128_best.npz"):
    variables = _load_npz_variables(ckpt)
    B, L = 2, 1024
    fields = numpy_lorenz_fields(seed=23, num_layers=6, batch=B, seq_len=L)
    rng = np.random.default_rng(29)
    x = rng.uniform(0.0, 1.0, (B, 1, 128, 128)).astype(np.float32)

    # --- torch reference with exported weights ---
    tmodel = TorchNet()
    sd = export_torch_state_dict(variables)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected, unexpected
    assert all(
        "num_batches_tracked" in k or "lorenz_" in k for k in missing
    ), missing
    tmodel.eval()

    calls = {"i": 0}

    def t_patched(self, seq_len, batch_size, device):
        f = torch.from_numpy(fields[calls["i"] % 6])
        calls["i"] += 1
        return f[:, :seq_len]

    TorchCA.generate_chaos_field = t_patched
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(x))
    assert calls["i"] == 6

    # --- flax with the same chaos fields ---
    jcalls = {"i": 0}

    def j_patched(key, batch, seq_len):
        f = jnp.asarray(fields[jcalls["i"] % 6][:, :seq_len])
        jcalls["i"] += 1
        return f

    ca_mod.chaos_field = j_patched
    jout = SmokePhysNet().apply(
        variables,
        jnp.asarray(x).transpose(0, 2, 3, 1),
        train=False,
        rngs={"chaos": jax.random.PRNGKey(0)},
    )
    assert jcalls["i"] == 6

    def rel(a, b):
        """max |Δ| normalized by output scale (trained latent/physics values
        reach |x| ≈ 2000 on OOD input, so raw atol would mislead)."""
        a, b = np.asarray(a), np.asarray(b)
        return np.abs(a - b).max() / max(1.0, np.abs(b).max())

    recon_d = rel(
        np.asarray(jout["reconstructed"]).transpose(0, 3, 1, 2),
        tout["reconstructed"].numpy(),
    )
    phys_d = rel(jout["physics_features"], tout["physics_features"].numpy())
    lat_d = rel(jout["latent_features"], tout["latent_features"].numpy())
    print(f"checkpoint: {ckpt}")
    print(f"scaled max |Δ| reconstructed:    {recon_d:.3e}")
    print(f"scaled max |Δ| physics_features: {phys_d:.3e}")
    print(f"scaled max |Δ| latent_features:  {lat_d:.3e}")
    ok = recon_d < 1e-4 and phys_d < 1e-4 and lat_d < 1e-4
    print("CROSS-VALIDATION", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
