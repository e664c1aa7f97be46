"""Stateful block-streaming Mimi decoder.

The reference decodes the whole utterance after the AR loop finishes and
lists frame-level streaming as an open TODO (`PLAN.md:9-17`,
`internal/native/mimi.go:719-789` is stateless). Every stage of the chain is
causal, so a block decoder carrying per-stage state is *sample-exact* with
the whole-sequence decoder:

- causal Conv1d (left pad ``k_eff − 1``, stride 1): carry the last
  ``k_eff − 1`` input frames; zero-initialized state ≡ the causal left pad
- ConvTranspose1d (right trim ``k − s``): overlap-add — emit ``T·s`` samples,
  carry the ``k − s`` tail into the next block
- windowed transformer: per-layer K/V cache at absolute positions; the
  250-step window mask makes old cache slots naturally invisible

Block size is in latent frames (each = 16 transformer steps = 1920 samples),
so ``block=4`` streams 320 ms of audio per emission.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.models.mimi import MimiConfig
from go_pocket_tts_tpu.models.params import apply_linear
from go_pocket_tts_tpu.ops import (
    apply_rope,
    attention_with_positions,
    conv1d,
    conv_transpose1d_trim,
    elu,
    gelu_erf,
    layer_norm,
)

__all__ = [
    "init_stream_state",
    "decode_block",
    "freeze_lanes",
    "reset_lane",
    "reset_lanes",
]

Params = Dict
State = Dict

# Per-leaf lane axis in a batched stream state: kv buffers are
# [L, B, H, S, Dh] (axis 1), everything else is batch-leading.
_LANE_AXIS = {"kv_k": 1, "kv_v": 1}


def freeze_lanes(new_state: State, old_state: State, live) -> State:
    """Keep ``new_state`` for lanes where ``live`` is True, ``old_state``
    elsewhere — idle batcher slots must not advance their stream state."""
    out = {}
    for key, new in new_state.items():
        old = old_state[key]
        axis = _LANE_AXIS.get(key, 0)
        shape = [1] * new.ndim
        shape[axis] = live.shape[0]
        out[key] = jnp.where(live.reshape(shape), new, old)
    return out


def reset_lane(state: State, slot) -> State:
    """Zero one lane of a batched stream state (a new streaming request was
    admitted into that slot)."""
    out = {}
    for key, val in state.items():
        axis = _LANE_AXIS.get(key, 0)
        idx = [slice(None)] * val.ndim
        idx[axis] = slot
        out[key] = val.at[tuple(idx)].set(0)
    return out


@partial(jax.jit, donate_argnames=("state",))
def reset_lanes(state: State, slots) -> State:
    """Zero several lanes in ONE compiled, donated program.

    ``slots`` is an int32 vector; duplicates are fine (zeroing is
    idempotent), so callers can pad the count to a fixed set of compile
    variants. The eager per-lane :func:`reset_lane` dispatches ~13 un-donated
    whole-buffer ``at[].set`` programs per lane — measured 12 ms host wall
    per call through the axon tunnel, which paced burst admission (r3:
    8-stream wave admit ≈ 680 ms, uniform 1.4-2.3 s streaming TTFA).
    Donation turns the reset into in-place row scatters: one ~1 ms dispatch
    per admission burst.
    """
    out = {}
    for key, val in state.items():
        axis = _LANE_AXIS.get(key, 0)
        moved = jnp.moveaxis(val, axis, 0)
        moved = moved.at[slots].set(jnp.zeros((), val.dtype))
        out[key] = jnp.moveaxis(moved, 0, axis)
    return out


def _conv_state_len(p: Params, dilation: int = 1) -> int:
    k = p["w"].shape[-1]
    return (k - 1) * dilation


def init_stream_state(
    params: Params,
    cfg: MimiConfig,
    batch: int,
    max_steps: int,
    dtype=jnp.float32,
    per_lane_offsets: bool = False,
) -> State:
    """Zero state. ``max_steps`` bounds the transformer K/V capacity in
    encoder steps (= latent frames × 16).

    ``per_lane_offsets=True`` makes ``offset`` an int32 ``[batch]`` vector so
    each lane advances independently — the continuous batcher's shared
    streaming state, where slots join/leave at different times."""
    tp = params["transformer"]
    d_model = tp["layers"][0]["out_proj"]["w"].shape[1] if tp["layers"] else 0
    head_dim = tp["rope_cos"].shape[1] * 2
    num_heads = d_model // head_dim if d_model else 0
    n_layers = len(tp["layers"])

    def conv_tail(p, ch_key="w"):
        c_in = p["w"].shape[1] * 1  # [O, I/g, K] with g=1 in the decoder convs
        return jnp.zeros((batch, p["w"].shape[1], _conv_state_len(p)), dtype)

    def convtr_tail(p, stride):
        k = p["w"].shape[-1]
        out_ch = p["w"].shape[0]
        return jnp.zeros((batch, out_ch, k - stride), dtype)

    s1, s2, s3 = cfg.seanet_strides
    state: State = {
        "offset": jnp.zeros((batch,), jnp.int32) if per_lane_offsets else jnp.int32(0),
        "kv_k": jnp.zeros((n_layers, batch, num_heads, max_steps, head_dim), dtype),
        "kv_v": jnp.zeros((n_layers, batch, num_heads, max_steps, head_dim), dtype),
        "upsample_tail": convtr_tail(params["upsample"], cfg.steps_per_latent),
        "init_conv": conv_tail(params["init_conv"]),
        "up1_tail": convtr_tail(params["up1"], s1),
        "res1_c1": conv_tail(params["res1"]["conv1"]),
        "res1_c2": conv_tail(params["res1"]["conv2"]),
        "up2_tail": convtr_tail(params["up2"], s2),
        "res2_c1": conv_tail(params["res2"]["conv1"]),
        "res2_c2": conv_tail(params["res2"]["conv2"]),
        "up3_tail": convtr_tail(params["up3"], s3),
        "res3_c1": conv_tail(params["res3"]["conv1"]),
        "res3_c2": conv_tail(params["res3"]["conv2"]),
        "final_conv": conv_tail(params["final_conv"]),
    }
    return state


def _stream_conv(p: Params, state: State, key: str, x: jax.Array) -> Tuple[jax.Array, State]:
    """Causal conv, stride 1: prepend carried tail instead of zero padding."""
    tail = state[key]
    inp = jnp.concatenate([tail, x], axis=2)
    y = conv1d(inp, p["w"], p.get("b"), stride=1, left_pad=0)
    n = tail.shape[2]
    new_tail = inp[:, :, inp.shape[2] - n :] if n > 0 else tail
    return y, {**state, key: new_tail}


def _stream_convtr(
    p: Params, state: State, key: str, x: jax.Array, stride: int, groups: int = 1
) -> Tuple[jax.Array, State]:
    """ConvTranspose with overlap-add tail: emit T·s samples, carry k−s."""
    k = p["w"].shape[-1]
    full = conv_transpose1d_trim(x, p["w"], p.get("b"), stride, groups, right_trim=0)
    tail = state[key]
    n_tail = tail.shape[2]
    t_out = x.shape[2] * stride
    if n_tail > 0:
        # Bias is added once per output sample by conv_transpose1d_trim on
        # both the emitted and carried region; the carried region must not
        # double-count it when added onto the next block's output.
        full = full.at[:, :, :n_tail].add(tail)
    emit = full[:, :, :t_out]
    new_tail = full[:, :, t_out:]
    if p.get("b") is not None and n_tail > 0:
        new_tail = new_tail - p["b"][None, :, None]
    return emit, {**state, key: new_tail}


def _stream_resblock(
    p: Params, state: State, k1: str, k2: str, x: jax.Array
) -> Tuple[jax.Array, State]:
    h = elu(x)
    h, state = _stream_conv(p["conv1"], state, k1, h)
    h = elu(h)
    h, state = _stream_conv(p["conv2"], state, k2, h)
    return x + h, state


def _stream_transformer(
    params: Params, cfg: MimiConfig, state: State, x: jax.Array
) -> Tuple[jax.Array, State]:
    tp = params["transformer"]
    if not tp["layers"]:
        return x, state
    x = jnp.swapaxes(x, 1, 2)  # [B, T, C]
    b, t, d = x.shape
    head_dim = tp["rope_cos"].shape[1] * 2
    num_heads = d // head_dim
    offset = state["offset"]
    capacity = state["kv_k"].shape[3]
    per_lane = offset.ndim == 1  # continuous-batcher shared state

    if per_lane:
        pos_q = offset[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
        pos_k = jnp.broadcast_to(jnp.arange(capacity, dtype=jnp.int32)[None, :], (b, capacity))
        write = jax.vmap(
            lambda buf, val, off: jax.lax.dynamic_update_slice(buf, val, (0, off, 0))
        )
    else:
        pos_q = offset + jnp.arange(t, dtype=jnp.int32)
        pos_k = jnp.arange(capacity, dtype=jnp.int32)

    kv_k, kv_v = state["kv_k"], state["kv_v"]
    zero = jnp.int32(0)
    for i, layer in enumerate(tp["layers"]):
        n1 = layer_norm(x, layer["norm1"]["weight"], layer["norm1"]["bias"])
        qkv = apply_linear(layer["in_proj"], n1)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, num_heads, head_dim).transpose(0, 2, 1, 3)
        q = apply_rope(q, tp["rope_cos"], tp["rope_sin"], offset)
        k = apply_rope(k, tp["rope_cos"], tp["rope_sin"], offset)
        if per_lane:
            kv_k = kv_k.at[i].set(write(kv_k[i], k, offset))
            kv_v = kv_v.at[i].set(write(kv_v[i], v, offset))
        else:
            kv_k = jax.lax.dynamic_update_slice(kv_k, k[None], (i, zero, zero, offset, zero))
            kv_v = jax.lax.dynamic_update_slice(kv_v, v[None], (i, zero, zero, offset, zero))
        a = attention_with_positions(q, kv_k[i], kv_v[i], pos_q, pos_k, cfg.context)
        a = a.transpose(0, 2, 1, 3).reshape(b, t, d)
        a = apply_linear(layer["out_proj"], a)
        if "layer_scale_1" in layer:
            a = a * layer["layer_scale_1"]
        x = x + a
        n2 = layer_norm(x, layer["norm2"]["weight"], layer["norm2"]["bias"])
        ff = apply_linear(layer["linear1"], n2)
        ff = gelu_erf(ff)
        ff = apply_linear(layer["linear2"], ff)
        if "layer_scale_2" in layer:
            ff = ff * layer["layer_scale_2"]
        x = x + ff

    state = {**state, "kv_k": kv_k, "kv_v": kv_v, "offset": offset + t}
    return jnp.swapaxes(x, 1, 2), state


def decode_block(
    params: Params, cfg: MimiConfig, state: State, mimi_latent: jax.Array
) -> Tuple[jax.Array, State]:
    """Decode ``[B, 512, Tb]`` latent frames → ``[B, 1, Tb·1920]`` PCM,
    carrying stream state. Exact prefix-match with `mimi_decode` (tested)."""
    s1, s2, s3 = cfg.seanet_strides
    x, state = _stream_convtr(
        params["upsample"], state, "upsample_tail", mimi_latent,
        cfg.steps_per_latent, cfg.upsample_groups,
    )
    x, state = _stream_transformer(params, cfg, state, x)
    x, state = _stream_conv(params["init_conv"], state, "init_conv", x)
    x = elu(x)
    x, state = _stream_convtr(params["up1"], state, "up1_tail", x, s1)
    x, state = _stream_resblock(params["res1"], state, "res1_c1", "res1_c2", x)
    x = elu(x)
    x, state = _stream_convtr(params["up2"], state, "up2_tail", x, s2)
    x, state = _stream_resblock(params["res2"], state, "res2_c1", "res2_c2", x)
    x = elu(x)
    x, state = _stream_convtr(params["up3"], state, "up3_tail", x, s3)
    x, state = _stream_resblock(params["res3"], state, "res3_c1", "res3_c2", x)
    x = elu(x)
    x, state = _stream_conv(params["final_conv"], state, "final_conv", x)
    return x, state
