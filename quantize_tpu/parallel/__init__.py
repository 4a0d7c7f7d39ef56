from .mesh import make_mesh, shard_variables, spec_for_variables

__all__ = ["make_mesh", "shard_variables", "spec_for_variables"]
