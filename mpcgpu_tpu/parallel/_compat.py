"""shard_map import/kwarg compatibility.

jax moved shard_map from jax.experimental.shard_map (replication check
kwarg ``check_rep``) to the top-level jax namespace (kwarg
``check_vma``).  Wrapping both here keeps every caller working on either
API -- the previous per-file try/except imported the old module but then
passed the NEW kwarg, so the fallback could never work.
"""
from __future__ import annotations


def shard_map_compat(f, *, mesh, in_specs, out_specs, check: bool = True):
    """shard_map(f, ...) with the replication/varying-axes check toggled
    by `check` on whichever jax API is present."""
    try:
        from jax import shard_map as _sm
        kw = {} if check else {"check_vma": False}
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        kw = {} if check else {"check_rep": False}
    try:
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   **kw)
    except TypeError:
        # jax.shard_map exists but with the old kwarg name (transition
        # releases)
        kw = {} if check else {"check_rep": False}
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   **kw)
