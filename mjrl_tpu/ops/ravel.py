"""Flat-vector <-> pytree raveling.

The reference's optimizer interface is a flat numpy parameter vector
(reference: mjrl/policies/gaussian_mlp.py ``get_param_values`` /
``set_param_values``); NPG/TRPO do all their linear algebra on it. Here the
same role is played by ``jax.flatten_util.ravel_pytree``: raveling happens
inside jit and XLA elides the copies where layouts allow.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.flatten_util


def ravel_pytree(pytree: Any) -> Tuple[jax.Array, Callable[[jax.Array], Any]]:
    """Flatten a pytree of arrays into one 1-D vector + an unravel closure."""
    return jax.flatten_util.ravel_pytree(pytree)


def unravel_like(template: Any) -> Callable[[jax.Array], Any]:
    """The unravel closure for ``template``'s structure/shapes only."""
    return jax.flatten_util.ravel_pytree(template)[1]
