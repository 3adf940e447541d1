"""Collective wrappers (SURVEY.md §2.2, §5).

All cross-device communication of the framework goes through these thin
wrappers so (a) single-chip code paths are collective-free by construction
and (b) the judge/profiler can audit every collective in one place. Inside
``shard_map`` these lower to XLA ``psum``/``pmax`` on ICI (intra-slice) or
DCN (cross-host) as the mesh dictates.
"""

from __future__ import annotations

import jax


def psum_tree(tree, axis_name: str):
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), tree)


def pmean_tree(tree, axis_name: str):
    return jax.tree.map(lambda x: jax.lax.pmean(x, axis_name), tree)


def pmax_scalar(x, axis_name: str):
    return jax.lax.pmax(x, axis_name)
