"""Device-mesh sharding for the CKKS engine (jax.sharding / GSPMD)."""

from .mesh import make_mesh, ct_spec, shard_pair

__all__ = ["make_mesh", "ct_spec", "shard_pair"]
