"""Parallelism layer (SURVEY.md §2.6 — absent in the single-GPU reference):

  DP  - batch sharding over 'data' (sharding.py; gradient psum by GSPMD)
  TP  - attention/FFN column/row sharding over 'model' (sharding.py)
  SP  - ring attention (ppermute K/V rotation, ring_attention.py) or
        Ulysses head-scatter all-to-all (ulysses_attention.py) over a
        sequence-sharded axis; pick via model/config `sp_impl`
  PP  - GPipe microbatch pipeline over 'model' (pipeline.py)
  Spatial - row-block solver decomposition + ppermute halos (halo.py)
  EP  - NOT SUPPORTED: the model family has no MoE layers (SURVEY.md §2.6
        marks expert parallelism N/A for this framework).
"""
from .mesh import make_mesh
from .sharding import (
    batch_sharding,
    param_sharding_specs,
    shard_batch,
    shard_params,
)

__all__ = [
    "make_mesh",
    "param_sharding_specs",
    "batch_sharding",
    "shard_params",
    "shard_batch",
]
