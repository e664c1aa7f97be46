"""Frame-level streaming tests: the segmented AR + stateful block decoder
must be sample-exact with the whole-utterance fused path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.models import mimi_stream, synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.runtime.streaming import stream_generate
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

ARCH = synthetic.tiny_arch()


@pytest.fixture(scope="module")
def model():
    data = encode_tensors(synthetic.build_checkpoint(ARCH, seed=66))
    return load_model_from_store(open_store_from_bytes(data), num_heads=ARCH.num_heads)


def test_block_decoder_matches_whole(model):
    """Stateful block decode over 4 blocks == stateless whole decode."""
    rng = np.random.RandomState(2)
    t_total, block = 12, 3
    latent = rng.randn(1, ARCH.mimi_dim, t_total).astype(np.float32) * 0.1

    whole = np.asarray(model.mimi_decode(jnp.asarray(latent)))

    params = model.params["mimi"]
    cfg = model.config.mimi
    state = mimi_stream.init_stream_state(params, cfg, 1, t_total * cfg.steps_per_latent)
    outs = []
    for i in range(0, t_total, block):
        pcm, state = mimi_stream.decode_block(
            params, cfg, state, jnp.asarray(latent[:, :, i : i + block])
        )
        outs.append(np.asarray(pcm))
    got = np.concatenate(outs, axis=2)
    assert got.shape == whole.shape
    np.testing.assert_allclose(got, whole, atol=2e-4, rtol=1e-3)


def test_block_decoder_single_frame_blocks(model):
    """Block size 1 (the minimum-latency configuration) is also exact."""
    rng = np.random.RandomState(4)
    latent = rng.randn(1, ARCH.mimi_dim, 5).astype(np.float32) * 0.1
    whole = np.asarray(model.mimi_decode(jnp.asarray(latent)))

    params, cfg = model.params["mimi"], model.config.mimi
    state = mimi_stream.init_stream_state(params, cfg, 1, 5 * cfg.steps_per_latent)
    outs = []
    for i in range(5):
        pcm, state = mimi_stream.decode_block(
            params, cfg, state, jnp.asarray(latent[:, :, i : i + 1])
        )
        outs.append(np.asarray(pcm))
    np.testing.assert_allclose(np.concatenate(outs, axis=2), whole, atol=2e-4, rtol=1e-3)


def test_reset_lanes_matches_reset_lane(model):
    """The batched donated reset program == N eager reset_lane calls
    (including duplicate slot ids from count padding)."""
    rng = np.random.RandomState(9)
    params, cfg = model.params["mimi"], model.config.mimi
    state = mimi_stream.init_stream_state(
        params, cfg, 4, 8 * cfg.steps_per_latent, per_lane_offsets=True
    )
    # Pollute every leaf so the reset has something to erase.
    state = jax.tree_util.tree_map(
        lambda v: v + jnp.asarray(rng.randn(*v.shape) * 3, v.dtype), state
    )
    eager = mimi_stream.reset_lane(mimi_stream.reset_lane(state, jnp.int32(1)), jnp.int32(3))
    batched = mimi_stream.reset_lanes(
        jax.tree_util.tree_map(jnp.copy, state), jnp.asarray([1, 3, 1], jnp.int32)
    )
    for key in state:
        np.testing.assert_array_equal(
            np.asarray(eager[key]), np.asarray(batched[key]), err_msg=key
        )


def test_batched_per_lane_stream_decode(model):
    """Per-lane-offset batched stream state: lanes joining at different times
    (reset_lane) and pausing (freeze_lanes) reproduce the whole decode."""
    rng = np.random.RandomState(5)
    params, cfg = model.params["mimi"], model.config.mimi
    t_total, block, lanes = 6, 2, 3
    latents = [
        rng.randn(1, ARCH.mimi_dim, t_total).astype(np.float32) * 0.1 for _ in range(lanes)
    ]
    whole = [np.asarray(model.mimi_decode(jnp.asarray(lat))) for lat in latents]

    state = mimi_stream.init_stream_state(
        params, cfg, lanes, t_total * cfg.steps_per_latent, per_lane_offsets=True
    )
    assert state["offset"].shape == (lanes,)
    # Lane 2 joins late: "pollute" it first, then reset — via the batched
    # donated reset (duplicated slot ids exercise the idempotent padding).
    state = mimi_stream.reset_lanes(
        jax.tree_util.tree_map(jnp.copy, state), jnp.asarray([2, 2], jnp.int32)
    )

    outs = [[] for _ in range(lanes)]
    # Schedule: lane0 decodes every block; lane1 skips (frozen) on block 1 and
    # catches up after; lane2 runs normally.
    progress = [0, 0, 0]
    schedule = [(True, True, True), (True, False, True), (True, True, True), (False, True, False)]
    for live_flags in schedule:
        live = np.asarray(live_flags)
        batch = np.zeros((lanes, ARCH.mimi_dim, block), np.float32)
        for lane in range(lanes):
            if live[lane] and progress[lane] < t_total:
                batch[lane] = latents[lane][0, :, progress[lane] : progress[lane] + block]
        pcm, new_state = mimi_stream.decode_block(params, cfg, state, jnp.asarray(batch))
        state = mimi_stream.freeze_lanes(new_state, state, jnp.asarray(live))
        for lane in range(lanes):
            if live[lane] and progress[lane] < t_total:
                outs[lane].append(np.asarray(pcm[lane : lane + 1]))
                progress[lane] += block
    for lane in range(lanes):
        got = np.concatenate(outs[lane], axis=2)
        np.testing.assert_allclose(got, whole[lane], atol=2e-4, rtol=1e-3)


def test_stream_generate_matches_fused(model):
    """Same seed → streamed PCM == whole-utterance PCM (same RNG split
    sequence, exact block decoder)."""
    tokens = [3, 8, 15]
    cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=10)

    whole = TPURuntime(model, seed=11, frame_bucket=64).generate_audio(tokens, cfg)

    rt = TPURuntime(model, seed=11, frame_bucket=64)
    blocks = list(stream_generate(rt, tokens, cfg, segment_frames=4))
    streamed = np.concatenate(blocks)

    assert len(blocks) == 2  # adaptive segments: 4 then 6 frames
    assert [len(b) // 1920 for b in blocks] == [4, 6]
    assert len(streamed) == len(whole)
    np.testing.assert_allclose(streamed, whole, atol=3e-4, rtol=1e-3)


def test_stream_generate_eos_stops_early(model):
    tokens = [3, 8]
    cfg = GenerateConfig(
        temperature=0.0, eos_threshold=-1e9, max_steps=30, frames_after_eos=3
    )
    rt = TPURuntime(model, seed=11, frame_bucket=64)
    blocks = list(stream_generate(rt, tokens, cfg, segment_frames=4))
    total = sum(len(b) for b in blocks)
    assert total == 4 * 1920  # EOS frame + 3


def test_stream_session_matches_plain_session_temp0(model):
    """VERDICT r3 #5 acceptance: streamed-with-continuity PCM == plain
    session PCM at temperature 0, chunk by chunk (same prefill program and
    AR math; the block decoder is sample-exact)."""
    from go_pocket_tts_tpu.runtime.streaming import stream_generate_session

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=10)
    chunks = [[5, 9, 2], [7, 1, 4], [3, 8, 15]]

    rt_plain = TPURuntime(model, seed=11, frame_bucket=64)
    plain_parts, cont = [], None
    for c in chunks:
        pcm, cont = rt_plain.generate_audio_session(c, cfg, cont)
        plain_parts.append(pcm)

    rt_stream = TPURuntime(model, seed=11, frame_bucket=64)
    cont = None
    for i, c in enumerate(chunks):
        blocks, next_state = stream_generate_session(rt_stream, c, cfg, cont)
        streamed = np.concatenate(list(blocks))
        cont = next_state()
        assert len(streamed) == len(plain_parts[i])
        np.testing.assert_allclose(streamed, plain_parts[i], atol=3e-4, rtol=1e-3)
    assert cont.used_ub == sum(len(c) + 10 for c in chunks)


def test_stream_session_state_conditions_later_chunks(model):
    """The carried KV must actually condition the streamed second chunk."""
    from go_pocket_tts_tpu.runtime.streaming import stream_generate_session

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=4)
    rt = TPURuntime(model, seed=11, frame_bucket=64)
    blocks, next_state = stream_generate_session(rt, [5, 9, 2], cfg, None)
    list(blocks)
    cont = next_state()
    blocks, _ = stream_generate_session(rt, [7, 1, 4], cfg, cont)
    with_state = np.concatenate(list(blocks))
    blocks, _ = stream_generate_session(rt, [7, 1, 4], cfg, None)
    fresh = np.concatenate(list(blocks))
    assert with_state.shape == fresh.shape
    assert not np.allclose(with_state, fresh, atol=1e-5)


def test_stream_session_resets_when_full(model):
    """Capacity bookkeeping mirrors the plain session: a chunk that cannot
    fit restarts the session instead of wrapping write indices."""
    from go_pocket_tts_tpu.runtime.streaming import stream_generate_session

    cfg = GenerateConfig(temperature=0.7, eos_threshold=1e9, max_steps=4)
    rt = TPURuntime(model, seed=11, frame_bucket=64)
    cont, seen = None, []
    for _ in range(8):
        blocks, next_state = stream_generate_session(
            rt, [5, 9, 2], cfg, cont, session_capacity=128
        )
        total = sum(len(b) for b in blocks)
        cont = next_state()
        seen.append(cont.used_ub)
        assert total == 4 * 1920
        assert cont.used_ub <= cont.capacity
    assert min(seen) < max(seen)  # grew, then reset at least once


def test_stream_session_next_state_requires_drain(model):
    from go_pocket_tts_tpu.runtime.streaming import stream_generate_session

    cfg = GenerateConfig(temperature=0.0, eos_threshold=1e9, max_steps=4)
    rt = TPURuntime(model, seed=11, frame_bucket=64)
    _blocks, next_state = stream_generate_session(rt, [5, 9, 2], cfg, None)
    with pytest.raises(RuntimeError, match="drain"):
        next_state()


def test_service_streaming_continuity_single_request(model):
    """`/tts/stream` + continuity at batch_slots=0: the Service routes
    through TPURuntime.stream_generate_session and the audio matches the
    non-streaming continuity path at temperature 0 (VERDICT r3 weak #5)."""
    from go_pocket_tts_tpu.config import TTSConfig
    from go_pocket_tts_tpu.tts.service import Service

    class _Tok:
        def encode(self, s):
            return [3] * len(s.split())

    text = "one two three. four five six. seven eight nine."
    tcfg = TTSConfig(temperature=0.0, eos_threshold=1e9, max_steps=6, continuity=True)
    # max_steps equals the default-override rule: mark as user-set.
    tcfg.max_steps_user_set = True

    svc_plain = Service(TPURuntime(model, seed=11, frame_bucket=64), _Tok(), tcfg)
    plain = np.concatenate(
        [c.samples for c in svc_plain.synthesize_stream(text)]
    )

    svc_stream = Service(TPURuntime(model, seed=11, frame_bucket=64), _Tok(), tcfg)
    chunks = list(svc_stream.synthesize_stream(text, frame_streaming=True))
    streamed = np.concatenate([c.samples for c in chunks])
    assert chunks[-1].final
    assert len(streamed) == len(plain)
    np.testing.assert_allclose(streamed, plain, atol=3e-4, rtol=1e-3)


def test_service_frame_streaming(model):
    from go_pocket_tts_tpu.config import TTSConfig
    from go_pocket_tts_tpu.tts.service import Service

    class _Tok:
        def encode(self, s):
            return [3] * len(s.split())

    rt = TPURuntime(model, seed=11, frame_bucket=64)
    svc = Service(rt, _Tok(), TTSConfig(temperature=0.0, eos_threshold=1e9, max_steps=6))
    assert svc.supports_frame_streaming
    chunks = list(svc.synthesize_stream("hello world again.", frame_streaming=True))
    assert len(chunks) >= 2  # 6 frames / 4-frame segments → 2 blocks
    assert chunks[-1].final and not chunks[0].final
    total = sum(len(c.samples) for c in chunks)
    assert total == 6 * 1920
