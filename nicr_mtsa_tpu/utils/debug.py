"""Computation-graph introspection.

The reference optionally renders the autograd graph with torchviz
(visualization/graph.py:11-27). The XLA-native equivalents: dump the
jaxpr (framework-level graph) or the optimized HLO (what actually runs
on the TPU) for a jitted function."""
from typing import Any, Callable, Optional

import jax


def save_jaxpr(fn: Callable, *args, filepath: Optional[str] = None,
               **kwargs) -> str:
    """Trace `fn` and return (optionally write) its jaxpr text."""
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    text = str(jaxpr)
    if filepath:
        with open(filepath, 'w') as f:
            f.write(text)
    return text


def save_hlo(fn: Callable, *args, filepath: Optional[str] = None,
             optimized: bool = False, **kwargs) -> str:
    """Lower `fn` and return (optionally write) its StableHLO text, or
    the backend-optimized HLO when `optimized=True`."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    text = (lowered.compile().as_text() if optimized
            else lowered.as_text())
    if filepath:
        with open(filepath, 'w') as f:
            f.write(text)
    return text


def checkify_invariants(fn: Callable):
    """Wrap `fn` with jax.experimental.checkify so runtime assertions
    (`checkify.check`) inside jitted code surface as host errors --
    the TPU-side counterpart of the reference's data-invariant asserts
    (e.g. data/preprocessing/instance.py:263-271)."""
    from jax.experimental import checkify
    return checkify.checkify(fn)
