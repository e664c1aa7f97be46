"""Continuous batching + mesh DP tests.

The strongest invariant: at temperature=0, a request served through the
batched per-slot-offset engine must produce the SAME audio as the
single-request single-program runtime — regardless of what other requests
share the batch (heterogeneous prompt lengths, admission times, EOS)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from go_pocket_tts_tpu.models import synthetic
from go_pocket_tts_tpu.models.model import load_model_from_store
from go_pocket_tts_tpu.parallel import ContinuousBatcher, dp_mesh, replicate_params, shard_batch
from go_pocket_tts_tpu.runtime import GenerateConfig, TPURuntime
from go_pocket_tts_tpu.utils.safetensors import encode_tensors, open_store_from_bytes

ARCH = synthetic.tiny_arch()


@pytest.fixture(scope="module")
def model():
    data = encode_tensors(synthetic.build_checkpoint(ARCH, seed=55))
    return load_model_from_store(open_store_from_bytes(data), num_heads=ARCH.num_heads)


def _cfg(**kw):
    base = dict(temperature=0.0, eos_threshold=1e9, max_steps=4)
    base.update(kw)
    return GenerateConfig(**base)


def test_batched_matches_single_request(model):
    single = TPURuntime(model, seed=3, frame_bucket=64)
    want = single.generate_audio([5, 9, 2], _cfg())

    batcher = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    batcher.start()
    try:
        got = batcher.generate([5, 9, 2], _cfg(), timeout=60)
    finally:
        batcher.stop()
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_batched_matches_single_request_pallas(model):
    """The fused batched decode-attention kernel (interpret mode on CPU)
    must reproduce the single-runtime audio through the engine, for both
    the bf16-cache and the int8-KV variants."""
    single = TPURuntime(model, seed=3, frame_bucket=64)
    want = single.generate_audio([5, 9, 2], _cfg())

    for kvq in (False, True):
        batcher = ContinuousBatcher(
            model,
            slots=2,
            prompt_capacity=64,
            max_frames=64,
            seed=3,
            kv_quantize=kvq,
            pallas=True,
        )
        batcher.start()
        try:
            got = batcher.generate([5, 9, 2], _cfg(), timeout=120)
        finally:
            batcher.stop()
        atol = 5e-3 if kvq else 1e-4
        np.testing.assert_allclose(got, want, atol=atol, rtol=1e-2)


def test_batched_heterogeneous_requests(model):
    """Concurrent requests with different prompts/lengths each match their
    individual single-request output."""
    single = TPURuntime(model, seed=3, frame_bucket=64)
    want_a = single.generate_audio([5, 9, 2], _cfg(max_steps=4))
    want_b = single.generate_audio([7, 1, 4, 8, 11, 13, 2], _cfg(max_steps=6))

    batcher = ContinuousBatcher(model, slots=4, prompt_capacity=64, max_frames=64, seed=3)
    batcher.start()
    try:
        fut_a = batcher.submit([5, 9, 2], _cfg(max_steps=4))
        fut_b = batcher.submit([7, 1, 4, 8, 11, 13, 2], _cfg(max_steps=6))
        got_a = fut_a.result(timeout=60)
        got_b = fut_b.result(timeout=60)
    finally:
        batcher.stop()

    np.testing.assert_allclose(got_a, want_a, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(got_b, want_b, atol=1e-4, rtol=1e-3)


def test_batched_more_requests_than_slots(model):
    batcher = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    batcher.start()
    try:
        futs = [batcher.submit([3 + i, 4], _cfg(max_steps=3)) for i in range(5)]
        outs = [f.result(timeout=120) for f in futs]
    finally:
        batcher.stop()
    assert all(len(o) == 3 * 1920 for o in outs)


def test_batched_16_slots_oversubscribed(model):
    """CPU smoke at the hardware-session scale (exp_slot_scaling runs 16/32
    slots): 24 requests through 16 slots with int8 weights+KV and burst
    admission must all match the single-request engine at temp 0. Guards
    the wide-batch paths (_pad_count at full slots, epoch recycling under
    churn) that 2-4-slot tests never reach."""
    from go_pocket_tts_tpu.models.quantize import quantize_model_params
    from go_pocket_tts_tpu.models.model import PocketTTSModel

    qmodel = PocketTTSModel(quantize_model_params(model.params), model.config)
    want = {}
    single = TPURuntime(qmodel, seed=3, frame_bucket=64)
    tokens = [[3 + (i % 7), 4, 5 + (i % 3)] for i in range(24)]
    for i in (0, 7, 23):  # spot-check oracle lanes only (CPU time)
        want[i] = single.generate_audio(tokens[i], _cfg(max_steps=3))

    batcher = ContinuousBatcher(
        model, slots=16, prompt_capacity=64, max_frames=64, seed=3,
        quantize=True, kv_quantize=True, steps_per_sync=4,
    )
    batcher.start()
    try:
        futs = [batcher.submit(t, _cfg(max_steps=3)) for t in tokens]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        batcher.stop()
    assert all(len(o) == 3 * 1920 for o in outs)
    # int8 KV perturbs vs the full-precision-KV single engine: bounded drift.
    for i, ref in want.items():
        rms = np.sqrt(np.mean((outs[i] - ref) ** 2))
        assert rms < 0.05 * (np.std(ref) + 1e-6), (i, rms)
    # Batch-position invariance at width 16: identical inputs (lanes 0 and
    # 21 share tokens) must produce identical audio at temp 0.
    assert tokens[0] == tokens[21]
    np.testing.assert_array_equal(outs[0], outs[21])


def test_batched_eos_early_exit(model):
    """eos_threshold=-inf → EOS at step 0 → frames_after_eos+1 frames."""
    batcher = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    batcher.start()
    try:
        out = batcher.generate(
            [5, 6], _cfg(eos_threshold=-1e9, max_steps=20, frames_after_eos=3), timeout=60
        )
    finally:
        batcher.stop()
    assert len(out) == 4 * 1920


def test_late_admission_does_not_disturb_running_lane(model):
    """A request admitted mid-flight (after the first block was already
    dispatched — the r2 overlapped-admission loop order) must neither change
    the running lane's audio nor its own vs the single-request runtime."""
    single = TPURuntime(model, seed=3, frame_bucket=64)
    want_a = single.generate_audio([5, 9, 2], _cfg(max_steps=12))
    want_b = single.generate_audio([8, 3], _cfg(max_steps=5))

    batcher = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3, steps_per_sync=2
    )
    batcher.start()
    try:
        import time as _t

        fut_a = batcher.submit([5, 9, 2], _cfg(max_steps=12))
        _t.sleep(0.3)  # let A run a few 2-step blocks alone
        fut_b = batcher.submit([8, 3], _cfg(max_steps=5))
        got_a = fut_a.result(timeout=60)
        got_b = fut_b.result(timeout=60)
    finally:
        batcher.stop()

    np.testing.assert_allclose(got_a, want_a, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(got_b, want_b, atol=1e-4, rtol=1e-3)


# -- mesh DP -----------------------------------------------------------------


def test_dp_mesh_batched_step_matches_unsharded(model):
    """One batched AR step under an 8-device dp mesh == unsharded result."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual CPU) devices; hardware tier has 1 chip")
    from go_pocket_tts_tpu.models import flow_lm as flm
    from go_pocket_tts_tpu.models import flow_transformer as ftr
    from go_pocket_tts_tpu.parallel.batching import _batched_ar_step
    from go_pocket_tts_tpu.parallel.mesh import shard_state

    mesh = dp_mesh(8)
    flow = model.params["flow_lm"]
    cfg = model.config.flow_lm
    S, L = 8, cfg.latent_dim

    tcfg = cfg.transformer
    cache_shape = (tcfg.num_layers, S, tcfg.num_heads, 32, tcfg.head_dim)
    rng = np.random.RandomState(0)
    state = {
        "cache": {
            "k": jnp.asarray(rng.randn(*cache_shape).astype(np.float32) * 0.1),
            "v": jnp.asarray(rng.randn(*cache_shape).astype(np.float32) * 0.1),
            "offset": jnp.asarray(rng.randint(1, 5, size=S).astype(np.int32)),
        },
        "frame": jnp.asarray(rng.randn(S, 1, L).astype(np.float32)),
        "frames": jnp.zeros((S, 16, L), jnp.float32),
        "n_frames": jnp.zeros((S,), jnp.int32),
        "countdown": jnp.full((S,), -1, jnp.int32),
        "done": jnp.zeros((S,), bool),
        "active": jnp.ones((S,), bool),
        "max_steps": jnp.full((S,), 10, jnp.int32),
        "eos_threshold": jnp.full((S,), 1e9, jnp.float32),
        "frames_after_eos": jnp.full((S,), 3, jnp.int32),
        "sigma": jnp.zeros((S,), jnp.float32),
    }
    noise = jnp.zeros((S, L), jnp.float32)

    plain = _batched_ar_step(flow, cfg, jax.tree_util.tree_map(jnp.copy, state), noise, 1)

    flow_sharded = replicate_params(flow, mesh)
    state_sharded = shard_state(jax.tree_util.tree_map(jnp.copy, state), mesh)
    noise_sharded = shard_batch(noise, mesh)
    sharded = _batched_ar_step(flow_sharded, cfg, state_sharded, noise_sharded, 1)

    np.testing.assert_allclose(
        np.asarray(plain["frame"]), np.asarray(sharded["frame"]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(plain["cache"]["offset"]), np.asarray(sharded["cache"]["offset"])
    )


def test_batcher_runtime_in_service(model):
    """Concurrent Service calls share the continuous batcher (config 4)."""
    import threading

    from go_pocket_tts_tpu.config import TTSConfig
    from go_pocket_tts_tpu.parallel.batching import BatcherRuntime
    from go_pocket_tts_tpu.runtime import TPURuntime
    from go_pocket_tts_tpu.tts.service import Service

    class _Tok:
        def encode(self, s):
            return [5, 9, 2]

    rt = BatcherRuntime(model, slots=4, seed=3)
    try:
        svc = Service(rt, _Tok(), TTSConfig(temperature=0.0, eos_threshold=1e9, max_steps=4))
        results = {}

        def run(name):
            results[name] = svc.synthesize("hello there.")

        threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(len(v) == 4 * 1920 for v in results.values())
        # All requests identical input + temp 0 => identical audio, matching
        # the single-request engine.
        want = TPURuntime(model, seed=1, frame_bucket=64).generate_audio(
            [5, 9, 2], _cfg(max_steps=4)
        )
        for v in results.values():
            np.testing.assert_allclose(v, want, atol=1e-4, rtol=1e-3)
    finally:
        rt.close()


def test_batcher_over_dp_mesh(model):
    """The full engine sharded over a 4-device dp mesh produces the same
    audio as the single-request runtime (config 5 shape, CPU mesh)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual CPU) devices; hardware tier has 1 chip")
    mesh = dp_mesh(4)
    batcher = ContinuousBatcher(
        model, slots=4, prompt_capacity=64, max_frames=64, seed=3, mesh=mesh
    )
    batcher.start()
    try:
        futs = [batcher.submit([5, 9, 2], _cfg(max_steps=4)) for _ in range(4)]
        outs = [f.result(timeout=120) for f in futs]
    finally:
        batcher.stop()
    want = TPURuntime(model, seed=1, frame_bucket=64).generate_audio([5, 9, 2], _cfg(max_steps=4))
    for o in outs:
        np.testing.assert_allclose(o, want, atol=1e-4, rtol=1e-3)


def test_batcher_quantized(model):
    """INT8 weight-only batcher (the BASELINE config-5 serving shape) tracks
    the unquantized engine within quantization tolerance."""
    ref = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    q = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3, quantize=True
    )
    ref.start()
    q.start()
    try:
        want = ref.generate([5, 9, 2], _cfg(), timeout=60)
        got = q.generate([5, 9, 2], _cfg(), timeout=60)
    finally:
        ref.stop()
        q.stop()
    assert got.shape == want.shape
    # int8 per-channel quantization: small relative drift, same waveform.
    assert np.sqrt(np.mean((got - want) ** 2)) < 0.05 * (np.std(want) + 1e-6)


def test_batcher_int4_quantized(model):
    """quantize=4 (INT4 weights, s4 storage) through the batched engine:
    finite audio of the right shape, bounded drift from the f32 engine."""
    ref = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    q = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3, quantize=4
    )
    ref.start()
    q.start()
    try:
        want = ref.generate([5, 9, 2], _cfg(), timeout=60)
        got = q.generate([5, 9, 2], _cfg(), timeout=60)
    finally:
        ref.stop()
        q.stop()
    assert got.shape == want.shape
    assert np.all(np.isfinite(got))
    # int4 is ~16x coarser than int8; the trajectory drifts more but must
    # stay the same scale of waveform.
    assert np.sqrt(np.mean((got - want) ** 2)) < 0.8 * (np.std(want) + 1e-6)


def test_batcher_kv_quantized(model):
    """INT8 KV cache (per-row scales): the quantized-attention engine tracks
    the bf16-cache engine within quantization tolerance, for both the plain
    and the frame-streaming path (same cache under both)."""
    ref = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    q = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3, kv_quantize=True
    )
    ref.start()
    q.start()
    try:
        want = ref.generate([5, 9, 2], _cfg(), timeout=60)
        got = q.generate([5, 9, 2], _cfg(), timeout=60)
        blocks = list(q.submit_stream([5, 9, 2], _cfg(), timeout=120))
    finally:
        ref.stop()
        q.stop()
    assert got.shape == want.shape
    assert np.sqrt(np.mean((got - want) ** 2)) < 0.05 * (np.std(want) + 1e-6)
    assert np.concatenate(blocks).shape == want.shape


def test_batcher_kv_and_weight_quantized(model):
    """The two int8 knobs compose (weights AND KV cache int8 — the max-MFU
    batch-serving configuration)."""
    ref = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    q = ContinuousBatcher(
        model,
        slots=2,
        prompt_capacity=64,
        max_frames=64,
        seed=3,
        quantize=True,
        kv_quantize=True,
    )
    ref.start()
    q.start()
    try:
        want = ref.generate([5, 9, 2], _cfg(), timeout=60)
        got = q.generate([5, 9, 2], _cfg(), timeout=60)
    finally:
        ref.stop()
        q.stop()
    assert got.shape == want.shape
    assert np.sqrt(np.mean((got - want) ** 2)) < 0.08 * (np.std(want) + 1e-6)


def test_batcher_kv_quantized_over_dp_mesh(model):
    """int8 KV state (incl. the per-row scale arrays) shards over a dp mesh."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ (virtual CPU) devices")
    from go_pocket_tts_tpu.parallel.mesh import dp_mesh

    batcher = ContinuousBatcher(
        model,
        slots=2,
        prompt_capacity=64,
        max_frames=64,
        seed=3,
        mesh=dp_mesh(2),
        kv_quantize=True,
    )
    batcher.start()
    try:
        futs = [batcher.submit([5, 9, 2], _cfg(max_steps=4)) for _ in range(2)]
        outs = [f.result(timeout=120) for f in futs]
    finally:
        batcher.stop()
    want = TPURuntime(model, seed=1, frame_bucket=64).generate_audio(
        [5, 9, 2], _cfg(max_steps=4)
    )
    for o in outs:
        assert o.shape == want.shape
        assert np.sqrt(np.mean((o - want) ** 2)) < 0.05 * (np.std(want) + 1e-6)


def test_batcher_int4_over_dp_mesh(model):
    """INT4 (s4) weights replicate over a dp mesh — packed sub-byte dtypes
    must survive device_put sharding and the jitted step under GSPMD."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ (virtual CPU) devices")
    from go_pocket_tts_tpu.parallel.mesh import dp_mesh

    batcher = ContinuousBatcher(
        model,
        slots=2,
        prompt_capacity=64,
        max_frames=64,
        seed=3,
        mesh=dp_mesh(2),
        quantize=4,
    )
    batcher.start()
    try:
        out = batcher.generate([5, 9, 2], _cfg(max_steps=4), timeout=120)
    finally:
        batcher.stop()
    assert out.shape == (4 * 1920,)
    assert np.all(np.isfinite(out))


def test_batcher_all_knobs_on(model):
    """Every serving knob at once — int4 grouped weights, int8 KV cache,
    dp mesh, adaptive burst blocks, plain + streaming mix — produces finite,
    correctly-shaped audio (integration coverage for knob interactions)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ (virtual CPU) devices")
    from go_pocket_tts_tpu.parallel.mesh import dp_mesh

    batcher = ContinuousBatcher(
        model,
        slots=2,
        prompt_capacity=64,
        max_frames=64,
        seed=3,
        mesh=dp_mesh(2),
        quantize=4,
        kv_quantize=True,
        steps_per_sync=2,
        steps_per_sync_burst=4,
    )
    batcher.start()
    try:
        fut = batcher.submit([5, 9, 2], _cfg(max_steps=4))
        blocks = list(batcher.submit_stream([7, 1, 4], _cfg(max_steps=4), timeout=120))
        plain = fut.result(timeout=120)
        # ...and a continuity session on top (snapshot dequantizes the
        # sharded INT8 cache under GSPMD; rehydration re-quantizes).
        s1, cont = batcher.generate_session([5, 9, 2], _cfg(max_steps=4), None, timeout=120)
        s2, _ = batcher.generate_session([7, 1], _cfg(max_steps=4), cont, timeout=120)
    finally:
        batcher.stop()
    streamed = np.concatenate(blocks)
    assert plain.shape == (4 * 1920,) and streamed.shape == (4 * 1920,)
    assert np.all(np.isfinite(plain)) and np.all(np.isfinite(streamed))
    assert s1.shape == s2.shape == (4 * 1920,)
    assert np.all(np.isfinite(s1)) and np.all(np.isfinite(s2))


def test_batcher_over_dp_tp_mesh(model):
    """The full engine on a 2-D (dp=2, tp=2) mesh — the `serve --runtime-dp 2
    --runtime-tp 2` configuration — produces the same audio as the
    single-request runtime (GSPMD's tensor-parallel collectives are
    numerically transparent through the whole engine, not just one step)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual CPU) devices; hardware tier has 1 chip")
    from go_pocket_tts_tpu.parallel.mesh import dp_tp_mesh

    mesh = dp_tp_mesh(2, 2)
    batcher = ContinuousBatcher(
        model, slots=4, prompt_capacity=64, max_frames=64, seed=3, mesh=mesh
    )
    batcher.start()
    try:
        futs = [batcher.submit([5, 9, 2], _cfg(max_steps=4)) for _ in range(4)]
        outs = [f.result(timeout=120) for f in futs]
    finally:
        batcher.stop()
    want = TPURuntime(model, seed=1, frame_bucket=64).generate_audio([5, 9, 2], _cfg(max_steps=4))
    for o in outs:
        np.testing.assert_allclose(o, want, atol=1e-4, rtol=1e-3)


def test_service_runtime_tp_config_builds_mesh(model, tmp_path, monkeypatch):
    """`--runtime-tp 2` reaches the batcher as a (dp, tp) mesh through
    Service.from_config (the serving surface, VERDICT r2 #4)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual CPU) devices; hardware tier has 1 chip")
    from go_pocket_tts_tpu.config import Config
    from go_pocket_tts_tpu.tts.service import Service
    from go_pocket_tts_tpu.utils.safetensors import write_file

    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(ARCH, seed=55))
    from test_kernel import _tokenizer_bytes

    tok_path = tmp_path / "tokenizer.model"
    tok_path.write_bytes(_tokenizer_bytes())

    cfg = Config()
    cfg.paths.model_path = str(model_path)
    cfg.paths.tokenizer_model = str(tok_path)
    cfg.runtime.batch_slots = 2
    cfg.runtime.dp_devices = 2
    cfg.runtime.tp_devices = 2
    cfg.runtime.seed = 3
    cfg.tts.eos_threshold = 1e9
    cfg.tts.max_steps = 4
    svc = Service.from_config(cfg)
    try:
        mesh = svc.runtime.batcher.mesh
        assert mesh is not None and dict(mesh.shape) == {"dp": 2, "tp": 2}
        pcm = svc.synthesize("hello world")
        assert len(pcm) > 0
    finally:
        svc.runtime.close()


def test_service_compile_cache_persisted(tmp_path):
    """from_config enables the persistent XLA compilation cache, so repeat
    CLI invocations / server restarts reuse executables from disk."""
    from go_pocket_tts_tpu.config import Config
    from go_pocket_tts_tpu.tts.service import Service
    from go_pocket_tts_tpu.utils.safetensors import write_file
    from test_kernel import _tokenizer_bytes

    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(ARCH, seed=55))
    tok_path = tmp_path / "tokenizer.model"
    tok_path.write_bytes(_tokenizer_bytes())
    cache_dir = tmp_path / "xla-cache"

    cfg = Config()
    cfg.paths.model_path = str(model_path)
    cfg.paths.tokenizer_model = str(tok_path)
    cfg.runtime.compile_cache_dir = str(cache_dir)
    cfg.runtime.seed = 3
    cfg.tts.eos_threshold = 1e9
    cfg.tts.max_steps = 2

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        svc = Service.from_config(cfg)
        # Earlier tests in the same process may have compiled identical
        # programs into the in-memory jit cache — nothing would recompile,
        # so nothing would persist. Clear both layers so this test observes
        # the disk write the way a fresh process (the real user) does.
        jax.clear_caches()
        from jax.experimental.compilation_cache import compilation_cache as cc

        cc.reset_cache()
        pcm = svc.synthesize("hello world")
        assert len(pcm) > 0
        assert cache_dir.exists() and any(cache_dir.iterdir()), (
            "no executables persisted to the configured cache dir"
        )
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


def test_service_rejects_tp_without_batch_slots(model, tmp_path):
    """`--runtime-tp N` without `--runtime-batch-slots > 1` must refuse, not
    silently fall back to a single-chip runtime (a user would read unsharded
    numbers as N-way TP)."""
    from go_pocket_tts_tpu.config import Config
    from go_pocket_tts_tpu.tts.service import Service
    from go_pocket_tts_tpu.utils.safetensors import write_file

    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(ARCH, seed=55))
    from test_kernel import _tokenizer_bytes

    tok_path = tmp_path / "tokenizer.model"
    tok_path.write_bytes(_tokenizer_bytes())

    cfg = Config()
    cfg.paths.model_path = str(model_path)
    cfg.paths.tokenizer_model = str(tok_path)
    cfg.runtime.tp_devices = 2  # batch_slots stays 1
    with pytest.raises(ValueError, match="runtime-batch-slots"):
        Service.from_config(cfg)


def test_service_runtime_pallas_flag(model, tmp_path):
    """`--runtime-pallas on|off|auto` flows to the runtime's transformer
    config (on = kernel even on CPU, off = never, bogus = clean error)."""
    from go_pocket_tts_tpu.config import Config
    from go_pocket_tts_tpu.tts.service import Service
    from go_pocket_tts_tpu.utils.safetensors import write_file

    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(ARCH, seed=55))
    from test_kernel import _tokenizer_bytes

    tok_path = tmp_path / "tokenizer.model"
    tok_path.write_bytes(_tokenizer_bytes())

    def build(pallas):
        cfg = Config()
        cfg.paths.model_path = str(model_path)
        cfg.paths.tokenizer_model = str(tok_path)
        cfg.runtime.pallas = pallas
        return Service.from_config(cfg)

    svc = build("on")
    assert svc.runtime.model.config.flow_lm.transformer.use_pallas is True
    svc = build("off")
    assert svc.runtime.model.config.flow_lm.transformer.use_pallas is False
    svc = build("auto")  # CPU backend -> auto resolves off
    assert svc.runtime.model.config.flow_lm.transformer.use_pallas is False
    with pytest.raises(ValueError, match="runtime-pallas"):
        build("bogus")


def test_service_rejects_kv_quantize_without_batch_slots(model, tmp_path):
    """`--runtime-kv-quantize` without the batched runtime must refuse (the
    single-request AR path has no int8 cache; silently ignoring the flag
    would misreport the serving configuration)."""
    from go_pocket_tts_tpu.config import Config
    from go_pocket_tts_tpu.tts.service import Service
    from go_pocket_tts_tpu.utils.safetensors import write_file

    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(ARCH, seed=55))
    from test_kernel import _tokenizer_bytes

    tok_path = tmp_path / "tokenizer.model"
    tok_path.write_bytes(_tokenizer_bytes())

    cfg = Config()
    cfg.paths.model_path = str(model_path)
    cfg.paths.tokenizer_model = str(tok_path)
    cfg.runtime.kv_quantize = True  # batch_slots stays 1
    with pytest.raises(ValueError, match="runtime-kv-quantize"):
        Service.from_config(cfg)


def test_service_steps_per_sync_reaches_batcher(model, tmp_path):
    """`--runtime-steps-per-sync` (the throughput-vs-latency block size knob)
    threads from config through BatcherRuntime to the engine."""
    from go_pocket_tts_tpu.config import Config
    from go_pocket_tts_tpu.tts.service import Service
    from go_pocket_tts_tpu.utils.safetensors import write_file

    model_path = tmp_path / "model.safetensors"
    write_file(model_path, synthetic.build_checkpoint(ARCH, seed=55))
    from test_kernel import _tokenizer_bytes

    tok_path = tmp_path / "tokenizer.model"
    tok_path.write_bytes(_tokenizer_bytes())

    cfg = Config()
    cfg.paths.model_path = str(model_path)
    cfg.paths.tokenizer_model = str(tok_path)
    cfg.runtime.batch_slots = 2
    cfg.runtime.steps_per_sync = 32
    cfg.runtime.seed = 3
    cfg.tts.eos_threshold = 1e9
    cfg.tts.max_steps = 4
    svc = Service.from_config(cfg)
    try:
        assert svc.runtime.batcher.steps_per_sync == 32
        pcm = svc.synthesize("hello")
        assert len(pcm) > 0
    finally:
        svc.runtime.close()


def test_batcher_adaptive_burst_blocks(model):
    """steps_per_sync_burst: plain-only traffic runs burst-sized blocks,
    a live streaming consumer drops the engine back to the base block size,
    and both request kinds complete with the right shapes."""
    batcher = ContinuousBatcher(
        model,
        slots=2,
        prompt_capacity=64,
        max_frames=32,
        seed=3,
        steps_per_sync=4,
        steps_per_sync_burst=13,  # rounds up to 16
    )
    assert batcher.steps_per_sync_burst == 16
    batcher.start()
    try:
        out = batcher.generate([5, 9, 2], _cfg(max_steps=24), timeout=120)
        assert out.size > 0
        assert batcher._last_block_k == 16  # plain traffic took burst blocks

        saw_lo = False
        blocks = []
        for blk in batcher.submit_stream([5, 9, 2], _cfg(max_steps=24), timeout=120):
            blocks.append(blk)
            saw_lo = saw_lo or batcher._last_block_k == 4
        assert saw_lo  # streaming dropped the block size to steps_per_sync
        streamed = np.concatenate(blocks)
        assert streamed.size == out.size
    finally:
        batcher.stop()


def test_batcher_frame_streaming(model):
    """submit_stream emits PCM blocks that concatenate to the non-streamed
    result (temp=0); per-slot block decoder is sample-exact."""
    batcher = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3, steps_per_sync=4
    )
    batcher.start()
    try:
        whole = batcher.generate([5, 9, 2], _cfg(max_steps=10), timeout=120)
        blocks = list(batcher.submit_stream([5, 9, 2], _cfg(max_steps=10), timeout=120))
    finally:
        batcher.stop()
    assert len(blocks) >= 2  # 10 frames in 4-step blocks → 3 emissions
    streamed = np.concatenate(blocks)
    assert len(streamed) == len(whole) == 10 * 1920
    np.testing.assert_allclose(streamed, whole, atol=1e-3)


def test_batcher_streaming_concurrent_with_batch(model):
    """A streaming request and plain requests share the batch."""
    batcher = ContinuousBatcher(
        model, slots=4, prompt_capacity=64, max_frames=64, seed=3, steps_per_sync=4
    )
    batcher.start()
    try:
        stream_iter = batcher.submit_stream([5, 9, 2], _cfg(max_steps=8), timeout=120)
        fut = batcher.submit([7, 1, 4], _cfg(max_steps=8))
        streamed = np.concatenate(list(stream_iter))
        plain = fut.result(timeout=120)
    finally:
        batcher.stop()
    assert len(streamed) == 8 * 1920
    assert len(plain) == 8 * 1920


def test_batcher_engine_crash_fails_futures(model):
    """If the engine thread dies, pending futures get the exception instead
    of hanging."""
    batcher = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)

    def boom():
        raise RuntimeError("engine boom")

    batcher._admit = boom  # crash on first iteration
    batcher.start()
    fut = batcher.submit([5, 9], _cfg(max_steps=2))
    with pytest.raises(RuntimeError, match="engine boom"):
        fut.result(timeout=30)
    batcher.stop()


def test_batcher_engine_crash_raises_in_stream(model):
    """A crashed engine must raise at the streaming consumer, never deliver a
    clean (silently truncated) end-of-stream (ADVICE r1)."""
    batcher = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)

    def boom():
        raise RuntimeError("engine boom")

    batcher._admit = boom
    batcher.start()
    try:
        # The exception surfaces either at submit time (engine already dead)
        # or from the generator — never as a clean end-of-stream.
        with pytest.raises(RuntimeError, match="engine boom"):
            list(batcher.submit_stream([5, 9], _cfg(max_steps=2), timeout=30))
    finally:
        batcher.stop()


def test_batcher_stream_timeout_raises_timeouterror(model):
    """A stalled stream raises TimeoutError, not a bare queue.Empty."""
    batcher = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    # Engine never started → the queue never produces.
    gen = batcher.submit_stream([5, 9], _cfg(max_steps=2), timeout=0.2)
    with pytest.raises(TimeoutError, match="no PCM block"):
        next(gen)


def test_service_multichunk_parallel_through_batcher(model):
    """Multi-chunk text submits all chunks concurrently to the batcher and
    yields them in order, matching sequential synthesis at temp 0."""
    from go_pocket_tts_tpu.config import TTSConfig
    from go_pocket_tts_tpu.parallel.batching import BatcherRuntime
    from go_pocket_tts_tpu.tts.service import Service

    class _Tok:
        def encode(self, s):
            return [(abs(hash(w)) % 60) for w in s.split()]

    cfg = TTSConfig(temperature=0.0, eos_threshold=1e9, max_steps=3)
    text = (
        " ".join(["alpha"] * 60) + ". " + " ".join(["beta"] * 60) + ". "
        + " ".join(["gamma"] * 60) + "."
    )

    rt = BatcherRuntime(model, slots=4, seed=3)
    try:
        svc = Service(rt, _Tok(), cfg)
        chunks = list(svc.synthesize_stream(text))
    finally:
        rt.close()
    assert len(chunks) == 3
    assert [c.chunk_index for c in chunks] == [0, 1, 2]
    assert chunks[-1].final

    single = TPURuntime(model, seed=1, frame_bucket=64)
    svc2 = Service(single, _Tok(), cfg)
    sequential = list(svc2.synthesize_stream(text))
    for got, want in zip(chunks, sequential):
        np.testing.assert_allclose(got.samples, want.samples, atol=1e-4, rtol=1e-3)


def test_batcher_midblock_finish_streams_exact(model):
    """A request whose frame count is NOT a multiple of steps_per_sync ends
    mid-block: the final partial block must stream exactly the remaining
    frames (no padding audio), through the one-deep pipelined loop."""
    batcher = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3, steps_per_sync=4
    )
    batcher.start()
    try:
        whole = batcher.generate([5, 9, 2], _cfg(max_steps=7), timeout=120)
        blocks = list(batcher.submit_stream([5, 9, 2], _cfg(max_steps=7), timeout=120))
    finally:
        batcher.stop()
    assert [len(b) // 1920 for b in blocks] == [4, 3]
    np.testing.assert_allclose(np.concatenate(blocks), whole, atol=1e-3)


def test_batcher_sequential_waves_reuse_slots(model):
    """Back-to-back submission waves exercise the pipeline's idle transition
    (pending block dropped when all slots empty, fresh dispatch after):
    wave 2 must still match wave 1 at temp=0."""
    batcher = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3, steps_per_sync=4
    )
    batcher.start()
    try:
        first = batcher.generate([5, 9, 2], _cfg(max_steps=6), timeout=120)
        import time

        time.sleep(0.3)  # let the engine drain to idle (drops pending block)
        second = batcher.generate([5, 9, 2], _cfg(max_steps=6), timeout=120)
    finally:
        batcher.stop()
    np.testing.assert_allclose(first, second, atol=0, rtol=0)


def test_batcher_pcm16_roundtrip_matches_single_runtime(model):
    """The batcher's on-device int16 conversion uses the same truncation
    convention as the single runtime: re-quantized outputs agree to within
    1 LSB (the two compiled programs differ by float-boundary noise, so a
    handful of samples may land on opposite sides of a truncation edge)."""
    single = TPURuntime(model, seed=3, frame_bucket=64)
    want = single.generate_audio([5, 9, 2], _cfg(max_steps=5))

    batcher = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    batcher.start()
    try:
        got = batcher.generate([5, 9, 2], _cfg(max_steps=5), timeout=120)
    finally:
        batcher.stop()
    q = lambda a: (np.clip(a, -1.0, 1.0) * 32767.0).astype(np.int32)  # noqa: E731
    diff = np.abs(q(got) - q(want))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01


def test_dp_tp_mesh_batched_step_matches_unsharded(model):
    """One batched AR step under a 2-D (dp=2, tp=4) mesh — transformer
    matmuls and KV-cache heads sharded over ``tp``, batch over ``dp`` —
    matches the unsharded result. GSPMD inserts the per-layer all-reduces."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual CPU) devices; hardware tier has 1 chip")
    from go_pocket_tts_tpu.parallel.batching import _batched_ar_step
    from go_pocket_tts_tpu.parallel.mesh import (
        dp_tp_mesh,
        shard_params_tp,
        shard_state_tp,
    )

    mesh = dp_tp_mesh(2, 4)
    flow = model.params["flow_lm"]
    cfg = model.config.flow_lm
    S, L = 4, cfg.latent_dim

    tcfg = cfg.transformer
    cache_shape = (tcfg.num_layers, S, tcfg.num_heads, 32, tcfg.head_dim)
    rng = np.random.RandomState(1)
    state = {
        "cache": {
            "k": jnp.asarray(rng.randn(*cache_shape).astype(np.float32) * 0.1),
            "v": jnp.asarray(rng.randn(*cache_shape).astype(np.float32) * 0.1),
            "offset": jnp.asarray(rng.randint(1, 5, size=S).astype(np.int32)),
        },
        "frame": jnp.asarray(rng.randn(S, 1, L).astype(np.float32)),
        "frames": jnp.zeros((S, 16, L), jnp.float32),
        "n_frames": jnp.zeros((S,), jnp.int32),
        "countdown": jnp.full((S,), -1, jnp.int32),
        "done": jnp.zeros((S,), bool),
        "active": jnp.ones((S,), bool),
        "max_steps": jnp.full((S,), 10, jnp.int32),
        "eos_threshold": jnp.full((S,), 1e9, jnp.float32),
        "frames_after_eos": jnp.full((S,), 3, jnp.int32),
        "sigma": jnp.zeros((S,), jnp.float32),
    }
    noise = jnp.zeros((S, L), jnp.float32)

    plain = _batched_ar_step(flow, cfg, jax.tree_util.tree_map(jnp.copy, state), noise, 1)

    flow_sharded = shard_params_tp(flow, mesh)
    state_sharded = shard_state_tp(jax.tree_util.tree_map(jnp.copy, state), mesh)
    noise_sharded = shard_batch(noise, mesh)
    sharded = _batched_ar_step(flow_sharded, cfg, state_sharded, noise_sharded, 1)

    np.testing.assert_allclose(
        np.asarray(plain["frame"]), np.asarray(sharded["frame"]), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(plain["cache"]["offset"]), np.asarray(sharded["cache"]["offset"])
    )
    # The sharded step must KEEP the cache head-sharded (no silent gather):
    k_sharding = sharded["cache"]["k"].sharding
    assert "tp" in getattr(k_sharding, "spec", ())[2:3] or k_sharding.spec[2] == "tp"


def test_shard_params_tp_int4_grouped_scales(model):
    """Group-wise INT4 scales [G, out] must shard on the OUTPUT axis (last)
    under tp, aligned with w's out-axis sharding — never on the group axis
    (uneven shards when G % tp != 0, resharding in the hot loop otherwise)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ (virtual CPU) devices")
    from go_pocket_tts_tpu.models.quantize import quantize_linear
    from go_pocket_tts_tpu.parallel.mesh import dp_tp_mesh, shard_params_tp

    mesh = dp_tp_mesh(1, 2)
    rng = np.random.RandomState(0)
    # G=3 is NOT divisible by tp=2: group-axis sharding would fail outright.
    lin = quantize_linear({"w": jnp.asarray(rng.randn(384, 64), jnp.float32)}, bits=4)
    assert lin["scale"].shape == (3, 64)
    tree = {"layers": [{"in_proj": lin}]}
    sharded = shard_params_tp(tree, mesh)
    spec = sharded["layers"][0]["in_proj"]["scale"].sharding.spec
    assert tuple(spec) == (None, "tp")
    assert tuple(sharded["layers"][0]["in_proj"]["w"].sharding.spec) == (None, "tp")


def test_batcher_stream_close_cancels_lane(model):
    """Closing a stream generator mid-flight (client disconnect) frees the
    lane at the next block boundary instead of generating to max_steps for
    nobody; other requests are unaffected."""
    import time

    batcher = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3, steps_per_sync=2
    )
    batcher.start()
    try:
        g = batcher.submit_stream([5, 9, 2], _cfg(max_steps=60), timeout=120)
        first = next(g)
        assert len(first) == 2 * 1920
        g.close()  # consumer walks away

        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if all(s.request is None for s in batcher._slot_info):
                break
            time.sleep(0.05)
        else:
            raise AssertionError("cancelled lane was never reaped")

        # Engine still healthy: a fresh request completes.
        out = batcher.generate([7, 1, 4], _cfg(max_steps=3), timeout=120)
        assert len(out) == 3 * 1920
    finally:
        batcher.stop()


def test_batcher_soak_random_mix(model):
    """Stress the pipelined engine with a randomized mix of plain, streaming,
    early-EOS, and disconnecting requests across waves — every surviving
    request must produce exactly its expected frame count and the engine must
    end idle and healthy (race canary for the one-deep pipeline)."""
    import random
    import threading
    import time

    rng = random.Random(0xC0FFEE)
    batcher = ContinuousBatcher(
        model, slots=4, prompt_capacity=64, max_frames=64, seed=3, steps_per_sync=3
    )
    batcher.start()
    errors = []
    try:
        def plain(n_steps, delay):
            time.sleep(delay)
            try:
                out = batcher.generate(
                    [rng.randrange(3, 50) for _ in range(rng.randrange(1, 6))],
                    _cfg(max_steps=n_steps),
                    timeout=180,
                )
                assert len(out) == n_steps * 1920, (len(out), n_steps)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        def streamer(n_steps, delay, abandon_after):
            time.sleep(delay)
            try:
                g = batcher.submit_stream(
                    [rng.randrange(3, 50) for _ in range(rng.randrange(1, 6))],
                    _cfg(max_steps=n_steps),
                    timeout=180,
                )
                got = 0
                for i, blk in enumerate(g):
                    got += len(blk)
                    if abandon_after is not None and i >= abandon_after:
                        g.close()
                        return
                assert got == n_steps * 1920, (got, n_steps)
            except Exception as exc:  # noqa: BLE001
                errors.append(exc)

        threads = []
        for _ in range(10):
            kind = rng.random()
            delay = rng.random() * 0.8
            steps = rng.randrange(2, 14)
            if kind < 0.5:
                threads.append(threading.Thread(target=plain, args=(steps, delay)))
            elif kind < 0.85:
                threads.append(
                    threading.Thread(target=streamer, args=(steps, delay, None))
                )
            else:
                threads.append(
                    threading.Thread(target=streamer, args=(steps, delay, 0))
                )
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=240)
            assert not t.is_alive(), "soak worker hung"
        assert not errors, errors

        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            if all(s.request is None for s in batcher._slot_info):
                break
            time.sleep(0.05)
        else:
            raise AssertionError("engine did not drain to idle")
        assert batcher._crashed is None
    finally:
        batcher.stop()


def test_batcher_stop_fails_inflight_requests(model):
    """Graceful stop() must not strand futures: in-flight and queued
    requests fail with an explicit error instead of hanging forever."""
    import concurrent.futures

    batcher = ContinuousBatcher(
        model, slots=1, prompt_capacity=64, max_frames=64, seed=3, steps_per_sync=2
    )
    batcher.start()
    fut_running = batcher.submit([5, 9, 2], _cfg(max_steps=60))
    fut_queued = batcher.submit([7, 1], _cfg(max_steps=60))  # waits for the slot
    import time

    time.sleep(0.5)  # let the first request attach and start stepping
    batcher.stop()
    for fut in (fut_running, fut_queued):
        try:
            fut.result(timeout=10)
        except (RuntimeError, concurrent.futures.CancelledError):
            pass  # explicit failure is the contract
        else:
            # A completed result is fine too (request finished before stop).
            pass
    assert fut_running.done() and fut_queued.done()


def test_batcher_session_matches_single_runtime(model):
    """Long-form continuity THROUGH the batch: at temperature=0 a two-chunk
    session served by the batcher must produce the same audio per chunk as
    the single-request runtime's session path (same hydration semantics)."""
    rt = TPURuntime(model, seed=3, frame_bucket=64)
    want1, rcont = rt.generate_audio_session([5, 9, 2], _cfg(), None, session_capacity=128)
    want2, _ = rt.generate_audio_session([7, 1, 4], _cfg(), rcont)

    b = ContinuousBatcher(model, slots=2, prompt_capacity=128, max_frames=64, seed=3)
    b.start()
    try:
        got1, cont = b.generate_session([5, 9, 2], _cfg(), None, timeout=60)
        assert cont is not None and cont.offset is not None
        got2, cont2 = b.generate_session([7, 1, 4], _cfg(), cont, timeout=60)
        assert cont2 is not None
    finally:
        b.stop()
    np.testing.assert_allclose(got1, want1, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(got2, want2, atol=1e-4, rtol=1e-3)


def test_batcher_session_state_conditions_generation(model):
    """The carried snapshot must actually condition the next chunk: with
    temperature=0, chunk 2 with state differs from chunk 2 fresh."""
    b = ContinuousBatcher(model, slots=2, prompt_capacity=128, max_frames=64, seed=3)
    b.start()
    try:
        _a1, cont = b.generate_session([5, 9, 2], _cfg(), None, timeout=60)
        with_state, _ = b.generate_session([7, 1, 4], _cfg(), cont, timeout=60)
        fresh, _ = b.generate_session([7, 1, 4], _cfg(), None, timeout=60)
    finally:
        b.stop()
    assert with_state.shape == fresh.shape
    assert not np.allclose(with_state, fresh, atol=1e-5)


def test_batcher_session_resets_when_full(model):
    """Chunks keep succeeding past the KV capacity — the session resets
    instead of overflowing the lane (mirrors the single runtime)."""
    b = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    b.start()
    try:
        cont = None
        offsets = []
        for _ in range(6):
            audio, cont = b.generate_session([5, 9, 2], _cfg(), cont, timeout=60)
            assert len(audio) == 4 * 1920
            cont.offset_host = int(np.asarray(cont.offset).reshape(-1)[0])
            offsets.append(cont.offset_host)
    finally:
        b.stop()
    assert min(offsets) < max(offsets)  # grew, then reset at least once


def test_batcher_session_with_kv_quantize(model):
    """Session snapshots dequantize an INT8 cache and re-quantize on
    hydration; audio stays finite and state still conditions generation."""
    b = ContinuousBatcher(
        model, slots=2, prompt_capacity=128, max_frames=64, seed=3, kv_quantize=True
    )
    b.start()
    try:
        _a1, cont = b.generate_session([5, 9, 2], _cfg(), None, timeout=60)
        with_state, _ = b.generate_session([7, 1, 4], _cfg(), cont, timeout=60)
        fresh, _ = b.generate_session([7, 1, 4], _cfg(), None, timeout=60)
    finally:
        b.stop()
    assert np.all(np.isfinite(with_state))
    assert not np.allclose(with_state, fresh, atol=1e-5)


def test_service_continuity_through_batcher(model):
    """Service + BatcherRuntime + continuity=True: the session path engages
    (BatcherRuntime.generate_audio_session) and chunks come back in order."""
    from go_pocket_tts_tpu.config import TTSConfig
    from go_pocket_tts_tpu.parallel.batching import BatcherRuntime
    from go_pocket_tts_tpu.tts.service import Service

    class _Tok:  # ~3 tokens/word so the chunker splits long text
        def encode(self, s):
            out = []
            for w in s.split():
                out.extend([abs(hash(w + str(i))) % 60 for i in range(3)])
            return out

    rt = BatcherRuntime(model, slots=2, seed=5, prompt_capacity=128)
    try:
        svc = Service(
            rt,
            _Tok(),
            TTSConfig(
                temperature=0.7, eos_threshold=1e9, max_steps=4, continuity=True
            ),
        )
        text = " ".join(f"sentence number {i} about item {i}." for i in range(12))
        chunks = list(svc.synthesize_stream(text))
    finally:
        rt.close()
    assert len(chunks) >= 2
    assert all(len(c.samples) == 4 * 1920 for c in chunks)
    assert chunks[-1].final


def test_batcher_session_concurrent_with_plain_load(model):
    """A continuity session stays correct while plain requests churn through
    the other slots: the session's per-chunk audio must equal the same
    session run on an idle batcher (temperature=0 ⇒ batch-invariance)."""
    idle = ContinuousBatcher(model, slots=4, prompt_capacity=128, max_frames=64, seed=3)
    idle.start()
    try:
        want1, icont = idle.generate_session([5, 9, 2], _cfg(), None, timeout=60)
        want2, _ = idle.generate_session([7, 1, 4], _cfg(), icont, timeout=60)
    finally:
        idle.stop()

    busy = ContinuousBatcher(model, slots=4, prompt_capacity=128, max_frames=64, seed=3)
    busy.start()
    try:
        load = [busy.submit([4, 4, 4], _cfg(max_steps=6)) for _ in range(6)]
        got1, cont = busy.generate_session([5, 9, 2], _cfg(), None, timeout=60)
        load += [busy.submit([2, 8], _cfg(max_steps=6)) for _ in range(4)]
        got2, _ = busy.generate_session([7, 1, 4], _cfg(), cont, timeout=60)
        for f in load:
            assert len(f.result(timeout=60)) == 6 * 1920
    finally:
        busy.stop()
    np.testing.assert_allclose(got1, want1, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(got2, want2, atol=1e-4, rtol=1e-3)


def test_batcher_session_cont_is_reusable(model):
    """A continuation can be submitted more than once (branching/retry):
    hydration copies the snapshot instead of letting _prefill donate it."""
    b = ContinuousBatcher(model, slots=2, prompt_capacity=128, max_frames=64, seed=3)
    b.start()
    try:
        _a, cont = b.generate_session([5, 9, 2], _cfg(), None, timeout=60)
        first, _ = b.generate_session([7, 1, 4], _cfg(), cont, timeout=60)
        second, _ = b.generate_session([7, 1, 4], _cfg(), cont, timeout=60)
    finally:
        b.stop()
    np.testing.assert_allclose(first, second, atol=1e-6)


def test_batcher_session_reset_reapplies_voice(model):
    """Service semantics: voice rides every chunk's cfg; when the session
    resets internally (capacity full) the voice must re-apply — the reset
    chunk equals a fresh voiced chunk, not an unvoiced one."""
    d_model = model.params["flow_lm"]["conditioner_embed"].shape[1]
    rng = np.random.RandomState(4)
    voice = rng.randn(1, 2, d_model).astype(np.float32) * 0.1

    # capacity 16+64=80: chunk 1 fills offset≈5+64=69, so chunk 2's
    # validation (69 + bucket 8 + steps 4 > 80) must reset the session.
    b = ContinuousBatcher(model, slots=2, prompt_capacity=16, max_frames=64, seed=3)
    b.start()
    try:
        want_fresh_voiced, _ = b.generate_session(
            [7, 1, 4], _cfg(voice_embedding=voice), None, timeout=120
        )
        _a, cont = b.generate_session(
            [5, 9, 2], _cfg(voice_embedding=voice, max_steps=64), None, timeout=120
        )
        cont.offset_host = None  # force re-fetch
        got, reset_cont = b.generate_session(
            [7, 1, 4], _cfg(voice_embedding=voice), cont, timeout=120
        )
        # the reset actually happened: the new session starts fresh
        assert int(np.asarray(reset_cont.offset).reshape(-1)[0]) < 69
    finally:
        b.stop()
    np.testing.assert_allclose(got, want_fresh_voiced, atol=1e-4, rtol=1e-3)


def test_batcher_stream_admission_failure_reaches_consumer(model):
    """An admission failure (oversized prompt) must raise promptly in the
    stream consumer instead of stranding it until the timeout."""
    b = ContinuousBatcher(model, slots=2, prompt_capacity=64, max_frames=64, seed=3)
    b.start()
    try:
        gen = b.submit_stream(list(range(3)) * 60, _cfg(), timeout=15)
        with pytest.raises(ValueError, match="capacity"):
            list(gen)
    finally:
        b.stop()


def test_batcher_stream_session_state_conditions(model):
    """Streaming sessions: chunk 2 streamed with carried state differs from
    chunk 2 streamed fresh (temperature=0), and next_state() is available
    once the stream ends."""
    b = ContinuousBatcher(model, slots=2, prompt_capacity=128, max_frames=64, seed=3)
    b.start()
    try:
        gen1, next1 = b.stream_session([5, 9, 2], _cfg(), None, timeout=60)
        audio1 = np.concatenate(list(gen1))
        cont = next1()
        assert audio1.shape == (4 * 1920,) and cont is not None

        gen2, next2 = b.stream_session([7, 1, 4], _cfg(), cont, timeout=60)
        with_state = np.concatenate(list(gen2))
        assert next2() is not None
        gen3, _n3 = b.stream_session([7, 1, 4], _cfg(), None, timeout=60)
        fresh = np.concatenate(list(gen3))
    finally:
        b.stop()
    assert with_state.shape == fresh.shape
    assert not np.allclose(with_state, fresh, atol=1e-5)


def test_batcher_stream_session_matches_plain_session(model):
    """At temperature=0 a streamed session must produce byte-identical audio
    and equivalent carried state to the plain session path (the stateful
    block decoder is sample-exact vs the harvest decode)."""
    a = ContinuousBatcher(model, slots=2, prompt_capacity=128, max_frames=64, seed=3)
    b = ContinuousBatcher(model, slots=2, prompt_capacity=128, max_frames=64, seed=3)
    a.start()
    b.start()
    try:
        p1, pc = a.generate_session([5, 9, 2], _cfg(), None, timeout=60)
        p2, _ = a.generate_session([7, 1, 4], _cfg(), pc, timeout=60)

        g1, n1 = b.stream_session([5, 9, 2], _cfg(), None, timeout=60)
        s1 = np.concatenate(list(g1))
        g2, _n2 = b.stream_session([7, 1, 4], _cfg(), n1(), timeout=60)
        s2 = np.concatenate(list(g2))
    finally:
        a.stop()
        b.stop()
    np.testing.assert_allclose(s1, p1, atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(s2, p2, atol=1e-4, rtol=1e-3)


def test_service_continuity_frame_streaming_through_batcher(model):
    """Service + batcher + continuity + frame_streaming: blocks stream per
    chunk while the KV session threads across chunks."""
    from go_pocket_tts_tpu.config import TTSConfig
    from go_pocket_tts_tpu.parallel.batching import BatcherRuntime
    from go_pocket_tts_tpu.tts.service import Service

    class _Tok:  # ~3 tokens/word so the chunker splits long text
        def encode(self, s):
            out = []
            for w in s.split():
                out.extend([abs(hash(w + str(i))) % 60 for i in range(3)])
            return out

    rt = BatcherRuntime(model, slots=2, seed=5, prompt_capacity=128)
    try:
        svc = Service(
            rt,
            _Tok(),
            TTSConfig(
                temperature=0.7, eos_threshold=1e9, max_steps=4, continuity=True
            ),
        )
        text = " ".join(f"sentence number {i} about item {i}." for i in range(12))
        chunks = list(svc.synthesize_stream(text, frame_streaming=True))
    finally:
        rt.close()
    assert len(chunks) >= 2
    assert chunks[-1].final
    assert sum(len(c.samples) for c in chunks) % (4 * 1920) == 0
    by_chunk = {}
    for c in chunks:
        by_chunk.setdefault(c.chunk_index, 0)
        by_chunk[c.chunk_index] += len(c.samples)
    assert all(v == 4 * 1920 for v in by_chunk.values())


def test_batcher_restart_after_stop(model):
    """stop() shuts the harvest drainer pool down; start() must rebuild it so
    a restarted batcher still delivers audio (not RuntimeError: cannot
    schedule new futures after shutdown)."""
    batcher = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3
    )
    batcher.start()
    try:
        first = batcher.generate([5, 9, 2], _cfg(), timeout=60)
    finally:
        batcher.stop()
    batcher.start()
    try:
        second = batcher.generate([5, 9, 2], _cfg(), timeout=60)
    finally:
        batcher.stop()
    np.testing.assert_allclose(second, first, atol=1e-4, rtol=1e-3)


def test_drain_harvest_failure_fails_futures(model):
    """A failed PCM fetch on the drainer thread must fail every future in the
    wave (never strand a caller), and a future already resolved by the crash
    path must not raise InvalidStateError in the drainer."""
    from concurrent.futures import Future

    from go_pocket_tts_tpu.parallel import batching as bmod

    batcher = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3
    )

    class _Poison:
        def __getitem__(self, _key):
            return self

        def __array__(self, *a, **kw):
            raise RuntimeError("device fetch failed")

    f1, f2 = Future(), Future()
    f2.set_exception(RuntimeError("already failed by _fail_all"))
    items = [
        (bmod._Request([1], _cfg(), f1), 2),
        (bmod._Request([1], _cfg(), f2), 2),
    ]
    batcher._drain_harvest(_Poison(), items)
    with pytest.raises(RuntimeError, match="device fetch failed"):
        f1.result(timeout=1)
    with pytest.raises(RuntimeError, match="already failed"):
        f2.result(timeout=1)


def test_batcher_prewarm_compiles_and_engine_serves(model):
    """prewarm() drives full-slot bursts, single admission, and streaming
    without errors, leaving a healthy engine."""
    batcher = ContinuousBatcher(
        model, slots=2, prompt_capacity=64, max_frames=64, seed=3, steps_per_sync=2
    )
    batcher.start()
    try:
        batcher.prewarm(token_lengths=(3,), timeout=180)
        out = batcher.generate([5, 9, 2], _cfg(max_steps=3), timeout=120)
        assert len(out) == 3 * 1920
        assert batcher._crashed is None
    finally:
        batcher.stop()


def test_prewarm_covers_every_live_program(model, fresh_compile_cache):
    """The prewarm contract, enforced: after prewarm(), mixed live traffic
    triggers ZERO new XLA compiles.

    Every program variant is keyed on a bucketed shape (prompt bucket,
    decode bucket, burst count, block size) — a variant that traffic can
    reach but prewarm does not is a mid-traffic compile that stalls every
    lane (~2-3 s of wall through a remote-compile tunnel; the r3
    streaming-TTFA p50≈p95≈1.8 s regression was exactly such a cold
    variant). The harvest-decode bucket depends on the DATA-DEPENDENT EOS
    frame count, so the traffic below spans every decode bucket, raw prompt
    lengths that differ from the prewarmed ones (same buckets), both burst
    counts, streaming, and an instant-EOS request."""
    import logging

    batcher = ContinuousBatcher(
        model,
        slots=2,
        prompt_capacity=64,
        max_frames=64,
        seed=3,
        steps_per_sync=2,
        steps_per_sync_burst=4,
    )
    batcher.start()
    compiles = []

    class _Handler(logging.Handler):
        def emit(self, record):
            msg = record.getMessage()
            if "Finished XLA compilation" in msg:
                compiles.append(msg)

    handler = _Handler(level=logging.DEBUG)
    dispatch_log = logging.getLogger("jax._src.dispatch")
    prev_level = dispatch_log.level
    prev_flag = jax.config.jax_log_compiles
    try:
        batcher.prewarm(token_lengths=(3, 17), timeout=600)

        dispatch_log.addHandler(handler)
        dispatch_log.setLevel(logging.DEBUG)
        jax.config.update("jax_log_compiles", True)

        # Plain singles at raw lengths != the prewarmed (3, 17), spanning
        # every reachable decode bucket (16/32/64) via max_steps.
        for toks, steps in (
            ([5, 9, 2], 2),
            ([7, 1, 4, 8, 11], 20),
            ([1] * 9, 40),
            ([2] * 13, 64),
        ):
            batcher.generate(toks, _cfg(max_steps=steps), timeout=120)
        # Full-slot burst (count variant 2-of-2) at a mid decode bucket.
        futs = [batcher.submit([3 + i, 4, 5], _cfg(max_steps=33)) for i in range(2)]
        for f in futs:
            f.result(timeout=120)
        # Streaming (drops block size to steps_per_sync mid-engine).
        for _ in batcher.submit_stream([6, 2], _cfg(max_steps=5), timeout=120):
            pass
        # Instant EOS: the countdown path decides the harvested count.
        batcher.generate(
            [4, 4, 4],
            GenerateConfig(temperature=0.0, eos_threshold=-1e9, max_steps=40),
            timeout=120,
        )
        assert batcher._crashed is None
    finally:
        jax.config.update("jax_log_compiles", prev_flag)
        dispatch_log.removeHandler(handler)
        dispatch_log.setLevel(prev_level)
        batcher.stop()
    assert compiles == [], f"cold program variants hit mid-traffic: {compiles}"
