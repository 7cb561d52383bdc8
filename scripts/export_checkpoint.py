"""Export an Orbax training checkpoint's {params, batch_stats} to a single
flat compressed npz that serving.load_model can consume directly:

    python scripts/export_checkpoint.py experiments/<dir> out.npz
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from jax.tree_util import keystr, tree_flatten_with_path


def main(ckpt_dir: str, out_path: str, config_path: str = "config/config.yaml"):
    from smokephysai_tpu.train.serving import load_model
    from smokephysai_tpu.utils.config import load_config

    config = load_config(config_path)
    _, variables = load_model(config, ckpt_dir)
    flat = {}
    for col in ("params", "batch_stats"):
        for path, leaf in tree_flatten_with_path(variables[col])[0]:
            flat[f"{col}/{keystr(path)}"] = np.asarray(leaf)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez_compressed(out_path, **flat)
    print(f"wrote {out_path} ({os.path.getsize(out_path)/1e6:.1f} MB, "
          f"{len(flat)} leaves)")


if __name__ == "__main__":
    main(*sys.argv[1:])
