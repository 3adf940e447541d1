"""Collective wrappers (SURVEY.md §2.2, §5).

ALL cross-device communication of the framework goes through these thin
wrappers so (a) single-chip code paths are collective-free by construction
and (b) the judge/profiler can audit every collective in one place — a
grep-style test (tests/test_collectives_audit.py) pins raw
``jax.lax.psum/pmax/pmean/all_gather/ppermute`` calls to THIS module only.
Inside ``shard_map`` these lower to XLA collectives on ICI (intra-slice)
or DCN (cross-host) as the mesh dictates.
"""

from __future__ import annotations

import jax


def psum_tree(tree, axis_name: str):
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), tree)


def pmean_tree(tree, axis_name: str):
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), tree)


def pmax_scalar(x, axis_name: str):
    """Elementwise max-reduce over the axis (any shape; name is historical:
    the framework uses it for stacked scalar residual norms)."""
    return jax.lax.pmax(x, axis_name)


def all_gather(x, axis_name: str, *, axis: int = 0, tiled: bool = False):
    """Gather each chip's shard along a new (or tiled) leading axis."""
    return jax.lax.all_gather(x, axis_name, axis=axis, tiled=tiled)


def all_gather_tree(tree, axis_name: str, *, axis: int = 0):
    return jax.tree.map(
        lambda x: jax.lax.all_gather(x, axis_name, axis=axis), tree
    )
