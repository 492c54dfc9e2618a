"""Debug configuration (SURVEY.md §5 'Race detection / sanitizers').

Race detectors/sanitizers have no meaning in pure-functional JAX; the
equivalents are NaN propagation checks and buffer-donation discipline:

- ``debug_mode()``: enable jax_debug_nans (trap the first NaN-producing op)
  and disable_jit optionally for step-through debugging;
- ``assert_finite``: jit-compatible finite-ness guard on a pytree (uses
  checkify-free error: returns a bool you can assert on host, or use
  jax.debug.print inside programs).
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Context: trap NaNs at the op that produced them; optionally run
    op-by-op (no jit) for inspection."""
    ctx = contextlib.ExitStack()
    with ctx:
        if nans:
            ctx.enter_context(jax.debug_nans(True))
        if disable_jit:
            ctx.enter_context(jax.disable_jit())
        yield


def tree_all_finite(tree) -> jnp.ndarray:
    """Scalar bool: every leaf of the pytree is finite. Usable inside jit."""
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    return jnp.stack(leaves).all()


def assert_tree_finite(tree, name: str = "tree") -> None:
    """Host-side assertion with the offending leaf paths in the message."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")
