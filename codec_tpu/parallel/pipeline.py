"""Pipeline-parallel backbone forward (GPipe schedule over a `pp` mesh axis).

The TTS backbone is the one component big enough to outgrow a single
chip's HBM (the codec graphs are tens of MB; a Llama-3B backbone is not).
Tensor parallelism (lm/backbone.py::set_mesh) splits every matmul and
pays an all-reduce per layer; pipeline parallelism instead places
`n_layers / S` whole layers per chip — the only communication is one
[mb, hidden] activation hop per stage boundary, riding ICI neighbor
links (`ppermute`). That makes PP the bandwidth-cheap way to hold a big
backbone, at the cost of a fill/drain bubble.

Schedule: classic GPipe. The input [T, hidden] is split into `n_mb`
microbatches of `mb` rows; at pipeline step t, stage s processes
microbatch m = t - s (valid when 0 <= m < n_mb), so the whole forward
takes n_mb + S - 1 steps. Microbatching over *time* is sound for causal
attention-with-cache: microbatch m reaches stage s strictly after
microbatch m-1 did, so earlier tokens' KV rows are already written when
later tokens attend (the same invariant the host's sequential prefill
relies on). Bubble steps run the layer math on junk but commit nothing:
KV writes are gated (`layer_block(write_gate=...)` re-writes the
existing cache slice) and only valid last-stage outputs land in the
output buffer.

Within one jitted fn: weights and KV cache enter `shard_map` sharded on
their layer axis (P(axis)), activations rotate stage-to-stage with
`lax.ppermute`, and the assembled output leaves via `psum` (only the
last stage holds nonzero rows).

Reference contrast: the reference is single-device by design; its
backbone lives in a separate llama.cpp process (SURVEY §2.7,
common/tts_runner.cpp:1096-1113). On TPU the backbone is a JAX model,
so stage-parallelism over ICI is available to the same `prefill`/`step`
calls the tts_runner host loop makes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def build_pp_forward(cfg, mesh, axis: str = "pp", microbatches: int = 4):
    """Returns fwd(params, kv, pos0, x) with `backbone_forward` semantics
    (x: [T, hidden] → (hiddens [T, hidden], new kv)), executed
    pipeline-parallel over `mesh[axis]`. `params["layers"]` leaves and
    `kv` must already be device-put sharded on their leading (layer)
    axis; everything else replicated (LlamaBackbone.set_mesh handles
    placement). `microbatches` caps the split of T — prefill pipelines
    up to that many in flight; a 1-token decode step degenerates to a
    single microbatch walking the stages."""
    from ..lm.backbone import NEG_INF, layer_block
    from ..ops import norms

    S = int(mesh.shape[axis])
    shard_map = jax.shard_map

    def fwd(params, kv, pos0, x):
        t_total = x.shape[0]
        n_mb = max(1, min(int(microbatches), t_total))
        mb = -(-t_total // n_mb)
        n_mb = -(-t_total // mb)          # actual count after rounding
        pad = n_mb * mb - t_total
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        # pad rows write KV at positions pos0+T .. pos0+n_mb*mb-1, which
        # can spill past max_ctx when the caller prefils right up to the
        # cache end (dynamic_update_slice would CLAMP the start and shift
        # the whole microbatch's keys one slot early — silent corruption).
        # Give the cache `pad` scratch slots for the duration of the call;
        # the junk lands there and is sliced off on the way out.
        if pad:
            kv = jnp.pad(kv, ((0, 0), (0, 0), (0, 0), (0, pad), (0, 0)))
        ctx_eff = cfg.max_ctx + pad
        pos0_a = jnp.asarray(pos0, jnp.int32)
        layers = params["layers"]
        ff = params["freq_factors"]

        layer_specs = jax.tree_util.tree_map(lambda _: P(axis), layers)
        ff_spec = None if ff is None else P()
        kv_spec = P(axis)

        def body(layers_l, ff_l, kv_l, pos0_, xp_):
            s = jax.lax.axis_index(axis)
            hid = xp_.shape[-1]
            key_pos = jnp.arange(ctx_eff)
            out0 = jnp.zeros_like(xp_)
            buf0 = jnp.zeros((mb, hid), xp_.dtype)

            def step(tstep, carry):
                buf, kv_loc, out = carry
                m = tstep - s                   # this stage's microbatch
                mv = jnp.clip(m, 0, n_mb - 1)
                valid = jnp.logical_and(m >= 0, m < n_mb)
                x_in = jnp.where(
                    s == 0,
                    jax.lax.dynamic_slice(xp_, (mv * mb, 0), (mb, hid)),
                    buf)
                posw = pos0_ + mv * mb
                positions = posw + jnp.arange(mb)
                mask = jnp.where(key_pos[None, :] <= positions[:, None],
                                 0.0, NEG_INF)

                def lbody(c, lw_i):
                    xb, kvs, li = c
                    xb, kv_one = layer_block(xb, lw_i, kvs[li], posw,
                                             positions, mask, cfg, ff_l,
                                             write_gate=valid)
                    kvs = kvs.at[li].set(kv_one)
                    return (xb, kvs, li + 1), None

                (y, kv_loc, _), _ = jax.lax.scan(
                    lbody, (x_in, kv_loc, 0), layers_l)

                row = mv * mb
                old = jax.lax.dynamic_slice(out, (row, 0), (mb, hid))
                wr = jnp.logical_and(valid, s == S - 1)
                out = jax.lax.dynamic_update_slice(
                    out, jnp.where(wr, y, old), (row, 0))
                buf = jax.lax.ppermute(
                    y, axis, [(i, i + 1) for i in range(S - 1)])
                return buf, kv_loc, out

            _, kv_l, out = jax.lax.fori_loop(
                0, n_mb + S - 1, step, (buf0, kv_l, out0))
            # only the last stage wrote rows; psum replicates the result
            return jax.lax.psum(out, axis), kv_l

        out, kv = shard_map(
            body, mesh=mesh,
            in_specs=(layer_specs, ff_spec, kv_spec, P(), P()),
            out_specs=(P(), kv_spec), check_vma=False,
        )(layers, ff, kv, pos0_a, xp)
        out = out[:t_total]
        if pad:
            kv = kv[:, :, :, : cfg.max_ctx, :]       # drop scratch slots
        return norms.rms_norm(out, params["out_norm"], cfg.rms_eps), kv

    return fwd
