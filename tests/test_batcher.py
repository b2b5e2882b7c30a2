"""Continuous batching: join/leave across chunk boundaries produces the same
codes as individual decode calls (greedy)."""

import sys
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))

from indextts_tpu.config import ConditionModuleConfig, GPTConfig
from indextts_tpu.models.unified_voice import UnifiedVoice
from indextts_tpu.runtime.batcher import ContinuousBatcher
from indextts_tpu.runtime.decode import GPTDecoder, SamplingConfig

CFG = GPTConfig(
    model_dim=64, layers=2, heads=4, max_mel_tokens=64, max_text_tokens=32,
    number_text_tokens=50, number_mel_codes=36, start_mel_token=34,
    stop_mel_token=35,
    condition_module=ConditionModuleConfig(
        output_size=32, linear_units=48, attention_heads=4, num_blocks=1
    ),
    emo_condition_module=ConditionModuleConfig(
        output_size=32, linear_units=32, attention_heads=2, num_blocks=1
    ),
)


def _params(model):
    p = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 64)), jnp.zeros((1, 4), jnp.int32), jnp.asarray([4]),
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6]), jnp.zeros((1, 64)),
        method=UnifiedVoice.forward_latent,
    )["params"]
    ph = model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 64)),
        method=UnifiedVoice.mel_logits_from_hidden,
    )["params"]
    for k, v in ph.items():
        p.setdefault(k, v)
    return {"params": p}


@pytest.mark.parametrize("attn_impl", ["xla", "xla_bucketed"])
def test_batcher_matches_individual_greedy(rng, attn_impl):
    model = UnifiedVoice(CFG, attn_impl=attn_impl)
    dec = GPTDecoder(model, CFG, SamplingConfig(do_sample=False))
    params = _params(model)
    bucket, max_new = 8, 12

    reqs = []
    for i in range(5):  # 5 requests, 2 slots -> continuous admission
        conds = jnp.asarray(
            np.random.default_rng(100 + i).standard_normal((1, 34, 64)),
            jnp.float32,
        )
        n = 3 + (i % 4)
        text = np.random.default_rng(200 + i).integers(2, 50, n)
        reqs.append((conds, text))

    # individual reference decodes
    want = []
    for conds, text in reqs:
        ids, pos, valid = dec.build_text_prompt_arrays(
            text[None], np.asarray([len(text)]), bucket
        )
        r = dec.generate(
            params, conds, jnp.asarray(ids), jnp.asarray(pos),
            jnp.asarray(valid), jax.random.PRNGKey(0), max_new=max_new,
        )
        n = int(np.asarray(r.lengths)[0])
        want.append(np.asarray(r.codes)[0, :n])

    bat = ContinuousBatcher(
        dec, params, n_slots=2, text_bucket=bucket, max_new=max_new,
        chunk_steps=4,
    )
    ids = [bat.submit(c, t) for c, t in reqs]
    done = bat.run()
    assert [c.req_id for c in done] == ids
    for c, w in zip(done, want):
        np.testing.assert_array_equal(c.codes, w)


def test_batcher_kv_quant_matches_individual_greedy(rng):
    """Quantize-on-insert: the continuous batcher under kv_quant writes
    admitted requests' prefill KV int8 and decodes over the int8 stream —
    tokens identical to individual kv_quant decodes (VERDICT r2 #3: no
    float-sibling fallback)."""
    model = UnifiedVoice(CFG, kv_quant=True)
    dec = GPTDecoder(model, CFG, SamplingConfig(do_sample=False))
    params = _params(model)
    bucket, max_new = 8, 12

    reqs = []
    for i in range(5):
        conds = jnp.asarray(
            np.random.default_rng(100 + i).standard_normal((1, 34, 64)),
            jnp.float32,
        )
        n = 3 + (i % 4)
        text = np.random.default_rng(200 + i).integers(2, 50, n)
        reqs.append((conds, text))

    want = []
    for conds, text in reqs:
        ids, pos, valid = dec.build_text_prompt_arrays(
            text[None], np.asarray([len(text)]), bucket
        )
        r = dec.generate(
            params, conds, jnp.asarray(ids), jnp.asarray(pos),
            jnp.asarray(valid), jax.random.PRNGKey(0), max_new=max_new,
        )
        n = int(np.asarray(r.lengths)[0])
        want.append(np.asarray(r.codes)[0, :n])

    bat = ContinuousBatcher(
        dec, params, n_slots=2, text_bucket=bucket, max_new=max_new,
        chunk_steps=4,
    )
    assert bat.kv_quant and bat.state["ks"].dtype == jnp.int8
    ids = [bat.submit(c, t) for c, t in reqs]
    done = bat.run()
    assert [c.req_id for c in done] == ids
    for c, w in zip(done, want):
        np.testing.assert_array_equal(c.codes, w)


def test_batcher_phased_prefix_limit_matches(rng):
    """step_chunk with the host-computed static prefix_limit (phased decode)
    produces the same codes as unphased individual decodes."""
    model = UnifiedVoice(CFG)
    dec0 = GPTDecoder(model, CFG, SamplingConfig(do_sample=False))
    dec = GPTDecoder(model, CFG, SamplingConfig(do_sample=False))
    dec.PHASE = 64
    params = _params(model)
    bucket, max_new = 8, 12

    reqs = []
    for i in range(4):
        conds = jnp.asarray(
            np.random.default_rng(300 + i).standard_normal((1, 34, 64)),
            jnp.float32,
        )
        text = np.random.default_rng(400 + i).integers(2, 50, 3 + i)
        reqs.append((conds, text))

    want = []
    for conds, text in reqs:
        ids, pos, valid = dec0.build_text_prompt_arrays(
            text[None], np.asarray([len(text)]), bucket
        )
        r = dec0.generate(
            params, conds, jnp.asarray(ids), jnp.asarray(pos),
            jnp.asarray(valid), jax.random.PRNGKey(0), max_new=max_new,
        )
        n = int(np.asarray(r.lengths)[0])
        want.append(np.asarray(r.codes)[0, :n])

    bat = ContinuousBatcher(
        dec, params, n_slots=2, text_bucket=bucket, max_new=max_new,
        chunk_steps=4,
    )
    assert bat._chunk_prefix_limit() is None  # nothing active yet
    ids = [bat.submit(c, t) for c, t in reqs]
    done = bat.run()
    assert [c.req_id for c in done] == ids
    for c, w in zip(done, want):
        np.testing.assert_array_equal(c.codes, w)


def test_batcher_priority_admission(rng):
    """Breadth-first admission: with every slot contended, priority-0
    submissions (requests' FIRST segments) are admitted before priority-1
    ones that arrived earlier, FIFO within a level — and every request
    still completes with the same codes as its individual decode."""
    model = UnifiedVoice(CFG, attn_impl="xla")
    dec = GPTDecoder(model, CFG, SamplingConfig(do_sample=False))
    params = _params(model)
    bucket, max_new = 8, 12

    reqs = []
    for i in range(6):
        conds = jnp.asarray(
            np.random.default_rng(300 + i).standard_normal((1, 34, 64)),
            jnp.float32,
        )
        text = np.random.default_rng(400 + i).integers(2, 50, 3 + (i % 3))
        reqs.append((conds, text))

    bat = ContinuousBatcher(
        dec, params, n_slots=2, text_bucket=bucket, max_new=max_new,
        chunk_steps=4,
    )
    # interleaved submission: (reqA seg0, seg1, seg2), (reqB seg0, seg1,
    # seg2) — depth-first arrival order, breadth-first priorities
    prios = [0, 1, 2, 0, 1, 2]
    ids = [bat.submit(c, t, priority=p) for (c, t), p in zip(reqs, prios)]
    # first admission wave (2 slots): the two priority-0 segments win even
    # though ids[1]/ids[2] arrived before ids[3]
    bat._admit()
    admitted = sorted(p.req_id for p in bat._slot_req if p is not None)
    assert admitted == [ids[0], ids[3]]
    done = bat.run()
    assert sorted(c.req_id for c in done) == sorted(ids)
    # codes unaffected by admission order: compare vs individual decodes
    by_id = {c.req_id: c.codes for c in done}
    for rid, (conds, text) in zip(ids, reqs):
        p_ids, pos, valid = dec.build_text_prompt_arrays(
            text[None], np.asarray([len(text)]), bucket
        )
        r = dec.generate(
            params, conds, jnp.asarray(p_ids), jnp.asarray(pos),
            jnp.asarray(valid), jax.random.PRNGKey(0), max_new=max_new,
        )
        n = int(np.asarray(r.lengths)[0])
        np.testing.assert_array_equal(by_id[rid], np.asarray(r.codes)[0, :n])


def test_batcher_rejects_oversize_text():
    model = UnifiedVoice(CFG)
    dec = GPTDecoder(model, CFG, SamplingConfig(do_sample=False))
    bat = ContinuousBatcher(dec, {"params": {}}, n_slots=1, text_bucket=4,
                            max_new=4)
    with pytest.raises(ValueError):
        bat.submit(jnp.zeros((1, 34, 64)), np.arange(9))


@pytest.mark.parametrize("kv_quant,tail_workers", [
    (False, 0), (True, 0), (False, 2),
])
def test_continuous_service_end_to_end(kv_quant, tail_workers):
    """ContinuousService: concurrent segment futures produce the same audio
    as sequential synthesize_segment (greedy, same seed noise). Under
    kv_quant the service decodes over the int8 cache (quantize-on-insert) —
    same stream as the sequential path, so audio still matches exactly.
    tail_workers=2 runs the cascade tails off the decode thread (the serving
    default) — results must be identical to the inline tail."""
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).parent))
    from test_engine_e2e import tiny_config

    from indextts_tpu.runtime.batcher import ContinuousService
    from indextts_tpu.runtime.engine import (
        EmotionConditioning,
        IndexTTS2Engine,
        random_params,
    )

    import dataclasses as dc

    cfg = tiny_config()
    # greedy for bit-stable comparison
    cfg = dc.replace(cfg, runtime=dc.replace(cfg.runtime, do_sample=False,
                                             kv_quant=kv_quant))
    engine = IndexTTS2Engine(cfg, random_params(cfg, seed=0))
    if kv_quant:
        assert engine.decoder is not None
        assert getattr(engine.decoder.model, "kv_quant", False)
    wav = (np.random.default_rng(3).standard_normal(16000) * 0.1).astype(np.float32)
    spk = engine.prepare_speaker(wav, 16000)
    emo = EmotionConditioning(spk.spk_cond_emb, spk.cond_len)
    segs = [np.random.default_rng(40 + i).integers(2, 50, 5 + i) for i in range(3)]

    want = [
        engine.synthesize_segment(spk, emo, s, seed=7, do_sample=False,
                                  num_beams=1, max_mel_tokens=24)
        for s in segs
    ]

    svc = ContinuousService(engine, n_slots=2, text_bucket=16, max_new=24,
                            chunk_steps=4, tail_workers=tail_workers)
    try:
        futs = [svc.submit(spk, emo, s, seed=7) for s in segs]
        got = [f.result(timeout=120) for f in futs]
    finally:
        svc.shutdown()

    for g, w in zip(got, want):
        assert g.codes_len == w.codes_len
        np.testing.assert_array_equal(g.wav, w.wav)


def test_infer_generator_continuous_matches_sequential():
    """Streaming through the shared service (infer_generator_continuous)
    yields the same per-segment waveforms as the sequential generator."""
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).parent))
    import dataclasses as dc

    from test_engine_e2e import tiny_config

    from indextts_tpu.runtime.batcher import ContinuousService
    from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params

    cfg = tiny_config()
    cfg = dc.replace(cfg, runtime=dc.replace(cfg.runtime, do_sample=False,
                                             num_beams=1, max_mel_tokens=24))
    engine = IndexTTS2Engine(cfg, random_params(cfg, seed=0))
    wav = ((np.random.default_rng(3).standard_normal(16000) * 0.1)
           .astype(np.float32), 16000)
    segs = [np.random.default_rng(70 + i).integers(2, 50, 5 + i)
            for i in range(2)]
    want = list(engine.infer_generator(wav, segs, seed=5))

    svc = ContinuousService(engine, n_slots=2, text_bucket=16, max_new=24,
                            chunk_steps=4)
    try:
        got = list(engine.infer_generator_continuous(svc, wav, segs, seed=5))
    finally:
        svc.shutdown()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_engine_infer_continuous_concurrent_requests():
    """engine.infer_continuous: two concurrent multi-segment requests through
    one shared service produce the same audio as sequential engine.infer."""
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, str(Path(__file__).parent))
    import dataclasses as dc
    from concurrent.futures import ThreadPoolExecutor

    from test_engine_e2e import tiny_config

    from indextts_tpu.runtime.batcher import ContinuousService
    from indextts_tpu.runtime.engine import IndexTTS2Engine, random_params

    cfg = tiny_config()
    cfg = dc.replace(cfg, runtime=dc.replace(cfg.runtime, do_sample=False,
                                             num_beams=1, max_mel_tokens=24))
    engine = IndexTTS2Engine(cfg, random_params(cfg, seed=0))
    wav = ((np.random.default_rng(3).standard_normal(16000) * 0.1)
           .astype(np.float32), 16000)
    reqs = [
        [np.random.default_rng(60 + i).integers(2, 50, 5 + j)
         for j in range(2)]
        for i in range(2)
    ]
    want = [np.asarray(engine.infer(wav, segs, seed=5)["audio"])
            for segs in reqs]

    svc = ContinuousService(engine, n_slots=3, text_bucket=16, max_new=24,
                            chunk_steps=4)
    try:
        with ThreadPoolExecutor(2) as ex:
            got = list(ex.map(
                lambda segs: np.asarray(
                    engine.infer_continuous(svc, wav, segs, seed=5)["audio"]
                ),
                reqs,
            ))
    finally:
        svc.shutdown()
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_batcher_admission_aging_promotes_old_tail_segments(rng):
    """ADVICE r4: strict breadth-first admission starves older requests'
    tail segments under sustained arrivals. Queue-wait now ages a pending
    segment's effective priority (one level per AGING_S seconds), so a
    long-waiting priority-1 segment beats a fresh priority-0 one."""
    import time as _time

    model = UnifiedVoice(CFG, attn_impl="xla")
    dec = GPTDecoder(model, CFG, SamplingConfig(do_sample=False))
    bat = ContinuousBatcher(dec, _params(model), n_slots=1, text_bucket=8,
                            max_new=8, chunk_steps=4)
    old_tail = bat.submit(jnp.zeros((1, 34, 64)), np.arange(2, 6), priority=1)
    fresh = bat.submit(jnp.zeros((1, 34, 64)), np.arange(2, 6), priority=0)
    # backdate the tail segment past one aging level
    bat._queue[0].enqueued_at = _time.perf_counter() - 1.5 * bat.AGING_S
    bat._admit()
    admitted = [p.req_id for p in bat._slot_req if p is not None]
    assert admitted == [old_tail]
    assert bat._queue[0].req_id == fresh


def test_service_finish_one_tolerates_cancelled_future():
    """ADVICE r4: a caller cancel() racing _finish_one must not raise
    InvalidStateError (inline mode would kill the decode thread). The
    future is claimed atomically; a won cancel returns without computing."""
    from concurrent.futures import Future

    from indextts_tpu.runtime.batcher import ContinuousService

    fut = Future()
    assert fut.cancel()
    # unbound call: a cancelled future returns before touching engine/meta
    ContinuousService._finish_one(None, None, None, fut)
    assert fut.cancelled()


def test_service_shutdown_fails_pending_futures():
    """Shutdown with requests still queued/in-flight must promptly fail
    their futures instead of stranding clients in result(timeout=...) (r5
    review): join is bounded and pending futures get a shutdown error."""
    import sys as _sys
    import time as _time
    from pathlib import Path as _Path

    _sys.path.insert(0, str(_Path(__file__).parent))
    from test_engine_e2e import tiny_config

    from indextts_tpu.runtime.batcher import ContinuousService
    from indextts_tpu.runtime.engine import (
        EmotionConditioning, IndexTTS2Engine, random_params,
    )

    cfg = tiny_config()
    engine = IndexTTS2Engine(cfg, random_params(cfg, seed=0))
    rng = np.random.default_rng(9)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    svc = ContinuousService(engine, n_slots=1, text_bucket=16, max_new=8,
                            chunk_steps=4)
    # wedge the decode loop so the submitted segment can never complete
    orig_step = svc.bat.dec.step_chunk
    svc.bat.dec.step_chunk = lambda *a, **k: (_time.sleep(3.0), a[1])[1]
    spk = engine.prepare_speaker(wav, 16000)
    emo = EmotionConditioning(spk.spk_cond_emb, spk.cond_len)
    fut = svc.submit(spk, emo, rng.integers(2, 50, 4), seed=0)
    _time.sleep(0.3)  # let the worker pick it up / park in the wedge
    t0 = _time.perf_counter()
    svc.shutdown(timeout=0.5)
    assert _time.perf_counter() - t0 < 10
    with pytest.raises(RuntimeError, match="shut down"):
        fut.result(timeout=5)
    svc.bat.dec.step_chunk = orig_step
