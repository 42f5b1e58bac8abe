"""jit with owner-attribute weight trees passed as ARGUMENTS.

The codec models route every jit through CodecModel._split_params so
compiled graphs are weight-independent; the LM layer's methods instead
read weights off `self` inside the traced function, which bakes them in
as constants. On the remote-compile relay that ships the whole MLIR to
the compiler — 3.9 GB of captured constants for the BlueMagpie CFM step,
enough to break the connection (bench tts_ar broken-pipe failures) — and
it also keys the compile cache on the checkpoint's bytes.

`jit_weighted(owner, fn, attrs)` wraps fn so the arrays under the given
owner attributes are flattened into one jit argument; at trace/call time
the attribute trees are temporarily rebuilt from the traced leaves, so
the method body is unchanged. Non-array leaves (ints used for static
shape math, None, configs) stay closure constants.
"""

from __future__ import annotations

import threading
from typing import Callable, Iterable, Optional, Sequence

import numpy as np

import jax

_LOCK_REGISTRY_GUARD = threading.Lock()


def _owner_trace_lock(owner) -> threading.RLock:
    """Per-owner re-entrant lock serializing the swap-trace-restore window.

    Tracing temporarily setattr-swaps tracers into shared owner attributes;
    two threads tracing jit_weighted functions on one owner would otherwise
    observe each other's tracers (UnexpectedTracerError) or leave tracer
    objects in the weight attrs. RLock so a traced fn may call another
    jit_weighted fn of the same owner. Compiled-cache-hit calls never enter
    `wrapped`, so steady-state concurrency is unaffected."""
    lock = getattr(owner, "_jit_weighted_trace_lock", None)
    if lock is None:
        with _LOCK_REGISTRY_GUARD:
            lock = getattr(owner, "_jit_weighted_trace_lock", None)
            if lock is None:
                lock = threading.RLock()
                owner._jit_weighted_trace_lock = lock
    return lock


def _is_array(leaf) -> bool:
    return isinstance(leaf, (jax.Array, np.ndarray)) and not np.isscalar(leaf)


def array_attrs(owner, exclude: Iterable[str] = ()) -> list[str]:
    """Names of owner attributes whose pytrees contain array leaves."""
    from jax import tree_util as jtu

    out = []
    skip = set(exclude)
    for name, val in vars(owner).items():
        if name in skip or val is None:
            continue
        try:
            leaves = jtu.tree_leaves(val)
        except Exception:      # pragma: no cover - exotic attr
            continue
        if any(_is_array(l) for l in leaves):
            out.append(name)
    return out


def jit_weighted(owner, fn: Callable, attrs: Sequence[str],
                 donate_argnums: Sequence[int] = (),
                 static_argnums: Sequence[int] = (),
                 ) -> Callable:
    """jax.jit(fn) with the arrays under `owner.<attrs>` as jit arguments.

    donate/static argnums refer to fn's ORIGINAL positions (the weight
    argument is prepended internally). The returned callable has fn's
    signature.
    """
    from jax import tree_util as jtu

    specs = []
    flat = []
    for a in attrs:
        tree = getattr(owner, a, None)
        if tree is None:
            continue
        leaves, td = jtu.tree_flatten(tree)
        idx = [i for i, l in enumerate(leaves) if _is_array(l)]
        specs.append((a, td, leaves, idx, len(flat)))
        flat.extend(leaves[i] for i in idx)

    trace_lock = _owner_trace_lock(owner)

    def wrapped(dyn, *args):
        saved = {}
        with trace_lock:
            try:
                for a, td, leaves, idx, start in specs:
                    merged = list(leaves)
                    for j, i in enumerate(idx):
                        merged[i] = dyn[start + j]
                    saved[a] = getattr(owner, a)
                    setattr(owner, a, jtu.tree_unflatten(td, merged))
                return fn(*args)
            finally:
                for a, v in saved.items():
                    setattr(owner, a, v)

    jkw = {}
    if donate_argnums:
        jkw["donate_argnums"] = tuple(d + 1 for d in donate_argnums)
    if static_argnums:
        jkw["static_argnums"] = tuple(s + 1 for s in static_argnums)
    jfn = jax.jit(wrapped, **jkw)

    def call(*args, _jfn=jfn, _flat=flat):
        return _jfn(_flat, *args)

    # introspection hooks: the wrapped jax.jit and the flattened weight
    # argument, for callers that lower/compile explicitly (HLO asserts)
    call._jit = jfn
    call._weights = flat
    return call
