"""Complex-free jit boundaries.

Some TPU attachment runtimes do not support complex64 arrays outside a
compiled program (eager creation/transfer fails), while complex math
inside jit works fine. This codec re-expresses complex pytree leaves as
(real, imag) float pairs at jit boundaries:

    state_enc = jax.jit(lambda: encode(init_fn()))()
    step = jax.jit(wrap_step(fn))      # fn sees decoded complex state

`CPair` is a registered pytree node, so encoded trees flatten to float
leaves only; XLA fuses the split/recombine away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class CPair:
    """A complex array carried as (real, imag) float leaves."""

    def __init__(self, re, im):
        self.re = re
        self.im = im

    def tree_flatten(self):
        return (self.re, self.im), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __repr__(self):
        return f"CPair({self.re!r})"


def _is_complex(x):
    return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.complexfloating)


def encode(tree):
    """Replace complex leaves with CPair(real, imag)."""
    return jax.tree_util.tree_map(
        lambda x: CPair(x.real, x.imag) if _is_complex(x) else x, tree
    )


def decode(tree):
    """Rebuild complex leaves from CPair nodes."""
    return jax.tree_util.tree_map(
        lambda n: jax.lax.complex(n.re, n.im) if isinstance(n, CPair) else n,
        tree,
        is_leaf=lambda n: isinstance(n, CPair),
    )


def wrap_step(fn):
    """Wraps `fn(state, *args) -> (state, *outs)` so the state crosses the
    jit boundary encoded (complex-free). The other args/outs pass through
    unchanged (they must not be complex)."""

    def wrapped(state_enc, *args, **kwargs):
        state = decode(state_enc)
        result = fn(state, *args, **kwargs)
        if isinstance(result, tuple):
            return (encode(result[0]),) + result[1:]
        return encode(result)

    return wrapped


def init_encoded(init_fn):
    """Runs an init function inside jit and returns the encoded state, so
    no complex array is ever created eagerly."""
    return jax.jit(lambda: encode(init_fn()))()
