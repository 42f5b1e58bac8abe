"""Device mesh + sharding helpers for multi-chip batch decode.

The reference is single-device; its batch API loops sequences serially
(reference: src/batch/batch.cpp + src/codec.cpp:640-786, noted in SURVEY §2.7
as the one real parallelism upgrade). Here batch decode is a single jitted
program with the batch dim sharded over a `dp` mesh axis: XLA partitions every
conv/matmul per-chip with zero collectives in the steady state (pure data
parallel — weights replicated, activations batch-split over ICI).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(f"need {n_devices} devices for a {axis!r} "
                             f"mesh, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(n_first: int, n_second: int,
                 axes: Sequence[str] = ("dp", "tp")) -> Mesh:
    """2-D mesh for composed parallelism, e.g. ("dp", "tp"): streams split
    over the first axis, the model over the second (batched TTS serving —
    `run_codebook_ar_batch(mesh=...)` + `LlamaBackbone.set_mesh(mesh,
    axis="tp")`). The second axis is the fast (innermost) one, so on real
    hardware the per-layer TP all-reduces ride adjacent ICI links."""
    devs = jax.devices()[: n_first * n_second]
    if len(devs) < n_first * n_second:
        raise ValueError(f"need {n_first * n_second} devices, "
                         f"have {len(devs)}")
    return Mesh(np.array(devs).reshape(n_first, n_second), tuple(axes))


def shard_batch(mesh: Mesh, x: jax.Array, axis: str = "dp") -> jax.Array:
    """Place `x` with its leading (batch) dim split over the mesh."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree's ARRAY leaves on every device of the mesh.
    Scalar leaves (kernel sizes, strides) stay plain Python values — they
    must remain static for shape/padding math under jit."""
    sharding = NamedSharding(mesh, P())

    def place(a):
        if isinstance(a, (jax.Array, np.ndarray)):
            return jax.device_put(a, sharding)
        return a

    return jax.tree_util.tree_map(place, tree)
