"""Const-free ahead-of-time compilation.

This JAX build (0.9.0 + axon plugin) mishandles closure constants once
several structurally similar programs coexist: after one compiled program
has run, later lowerings lift their constants into executable parameters
which neither the pjit fast path nor the AOT call path supplies
("Execution supplied 5 buffers but compiled program expected N"; the
experimental jax_use_simplified_jaxpr_constants mode fails differently).

``compile_const_free`` sidesteps the whole machinery: trace the function
to a closed jaxpr, extract its constants, and compile ``eval_jaxpr`` with
the constants passed as ordinary leading arguments.  The resulting
executable has exactly (consts + args) inputs, all explicitly supplied on
every call — nothing left for the dispatch layer to lose.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import core as jax_core


class CompiledConstFree:
    """A compiled callable with its constants bound."""

    def __init__(self, executable, consts, in_tree, out_tree, num_args):
        self._executable = executable
        self._consts = consts
        self._in_tree = in_tree
        self._out_tree = out_tree
        self._num_args = num_args

    def __call__(self, *args):
        flat, tree = jax.tree_util.tree_flatten(args)
        if tree != self._in_tree:
            raise TypeError(f"argument structure changed: {tree} vs "
                            f"{self._in_tree}")
        out_flat = self._executable(self._consts, tuple(flat))
        return jax.tree_util.tree_unflatten(self._out_tree, out_flat)


def compile_const_free(fn, *example_args) -> CompiledConstFree:
    """AOT-compile ``fn(*example_args)`` with all constants as arguments."""
    flat_args, in_tree = jax.tree_util.tree_flatten(example_args)
    out_tree_box = []

    def flat_fn(*flat):
        args = jax.tree_util.tree_unflatten(in_tree, flat)
        out = fn(*args)
        out_flat, out_tree = jax.tree_util.tree_flatten(out)
        out_tree_box.append(out_tree)
        return out_flat

    closed = jax.make_jaxpr(flat_fn)(*flat_args)
    out_tree = out_tree_box[0]
    consts = tuple(jnp.asarray(c) for c in closed.consts)

    def const_free(consts_in, args_in):
        return jax_core.eval_jaxpr(closed.jaxpr, list(consts_in),
                                   *list(args_in))

    executable = jax.jit(const_free).lower(consts, tuple(flat_args)).compile()
    return CompiledConstFree(executable, consts, in_tree, out_tree,
                             len(flat_args))
