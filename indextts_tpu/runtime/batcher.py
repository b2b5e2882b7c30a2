"""Continuous batching: cross-request join/leave for the AR decode loop.

N slots decode in lockstep chunks of `chunk_steps`; between chunks the host
harvests finished slots and admits queued requests (each request's prompt is
prefilled by its own program and its KV inserted into the slot's cache rows).
This is the TPU counterpart of the reference accel engine's continuous
admission (accel/engine.py:154-212): instead of per-token host bookkeeping,
all per-row state lives on device and the host only intervenes at chunk
boundaries, so the hot loop never syncs mid-chunk.

Shapes are static: one (n_slots, cap) cache; one text bucket per batcher.
Requests longer than the bucket are rejected (the engine's segmenter already
caps segment length).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class _Pending:
    req_id: int
    conds: Any          # (1, P, D)
    text_ids: np.ndarray
    enqueued_at: float
    priority: int = 0   # lower admits first (ties: arrival order)


@dataclasses.dataclass
class CompletedRequest:
    req_id: int
    codes: np.ndarray       # (n,) int32 including stop token (if emitted)
    queued_s: float
    decode_chunks: int


class ContinuousBatcher:
    def __init__(
        self,
        decoder,                    # GPTDecoder
        params,
        n_slots: int = 8,
        text_bucket: int = 64,
        max_new: int = 600,
        chunk_steps: int = 32,
        temperature: float = 0.8,
        top_p: float = 0.8,
        repetition_penalty: float = 10.0,
        seed: int = 0,
    ):
        assert getattr(decoder.model, "attn_impl", "xla") in (
            "xla", "xla_bucketed"
        ), (
            "continuous batching needs a scatter-insertable cache layout "
            "(xla / xla_bucketed; float or kv_quant int8)"
        )
        if getattr(decoder.model, "kv_quant", False):
            assert getattr(decoder.model, "attn_impl", "xla") == "xla", (
                "kv_quant requires attn_impl='xla'"
            )
        self.dec = decoder
        self.params = params
        self.B = n_slots
        self.bucket = text_bucket
        self.max_new = max_new
        self.chunk = chunk_steps
        cfg = decoder.cfg
        self.cap = cfg.condition_num_latent + (text_bucket + 2) + 1 + max_new
        self._queue: List[_Pending] = []
        self._slot_req: List[Optional[_Pending]] = [None] * n_slots
        self._slot_chunks = [0] * n_slots
        self._next_id = 0
        self.completed: List[CompletedRequest] = []

        L, H, Dh = cfg.layers, cfg.heads, cfg.head_dim
        self.kv_quant = bool(getattr(decoder.model, "kv_quant", False))
        dt = jnp.int8 if self.kv_quant else decoder.model.dtype
        self.state: Dict[str, Any] = {
            "ks": jnp.zeros((L, self.B, H, self.cap, Dh), dt),
            "vs": jnp.zeros((L, self.B, H, self.cap, Dh), dt),
            "codes": jnp.zeros((self.B, max_new), jnp.int32),
            "logits": jnp.zeros((self.B, cfg.number_mel_codes), jnp.float32),
            "pos": jnp.zeros((self.B,), jnp.int32),
            "gen_count": jnp.zeros((self.B,), jnp.int32),
            "finished": jnp.ones((self.B,), bool),
            "active": jnp.zeros((self.B,), bool),
            "penal_mask": jnp.zeros((self.B, cfg.number_mel_codes), bool),
            "cap_mask": jnp.ones((self.B, self.cap), bool),
            "key": jax.random.PRNGKey(seed),
            "temperature": jnp.asarray(temperature, jnp.float32),
            "top_p": jnp.asarray(top_p, jnp.float32),
            "rep_penalty": jnp.asarray(repetition_penalty, jnp.float32),
        }
        if self.kv_quant:
            # int8 cache scale planes (quantize-on-insert: admitted requests'
            # prefill KV is written int8+scale, decode reads int8 only)
            self.state["ksc"] = jnp.zeros((L, self.B, H, self.cap), jnp.float32)
            self.state["vsc"] = jnp.zeros((L, self.B, H, self.cap), jnp.float32)

    # -- request intake -----------------------------------------------------

    def submit(self, conds, text_ids: np.ndarray, priority: int = 0) -> int:
        """Queue one request (conds (1, P, D) latents, raw text ids).

        priority orders ADMISSION only (lower first, FIFO within a level):
        multi-segment callers pass the segment index so every request's
        first segment is admitted before any request's later segments —
        breadth-first across requests, which is what streaming TTFB sees
        (depth-first admission let one request's tail segments hold slots
        while another request had produced no audio at all)."""
        if len(text_ids) > self.bucket:
            raise ValueError(
                f"text length {len(text_ids)} exceeds bucket {self.bucket}"
            )
        rid = self._next_id
        self._next_id += 1
        self._queue.append(
            _Pending(rid, conds, np.asarray(text_ids, np.int32),
                     time.perf_counter(), priority=int(priority))
        )
        return rid

    # -- scheduling ---------------------------------------------------------

    # queue-wait seconds that promote a pending segment by one priority
    # level: under sustained arrivals, strict breadth-first admission would
    # let every new request's first segment bypass older requests' tail
    # segments indefinitely; aging bounds that starvation to roughly
    # AGING_S * max_segment_index seconds of extra wait.
    AGING_S = 10.0

    def _admit(self):
        st = self.state
        free = np.flatnonzero(~np.asarray(st["active"]))
        if len(free) and len(self._queue) > 1:
            # stable: FIFO within an (aged) priority level
            now = time.perf_counter()
            self._queue.sort(
                key=lambda p: (
                    p.priority - (now - p.enqueued_at) / self.AGING_S,
                    p.req_id,
                )
            )
        for slot in free:
            if not self._queue:
                break
            p = self._queue.pop(0)
            ids, pos, valid = self.dec.build_text_prompt_arrays(
                p.text_ids[None], np.asarray([len(p.text_ids)]), self.bucket
            )
            pieces, logits1, mask1, S = self.dec.prefill_request(
                self.params, p.conds, jnp.asarray(ids), jnp.asarray(pos),
                jnp.asarray(valid), cap=self.cap,
            )
            slot_i = jnp.asarray(int(slot), jnp.int32)
            keys = ("ks", "vs", "ksc", "vsc")[: len(pieces)]
            new = self.dec.insert_slot(
                tuple(st[k] for k in keys), pieces, slot_i
            )
            for k, v in zip(keys, new):
                st[k] = v
            b = int(slot)
            st["logits"] = st["logits"].at[b].set(logits1[0])
            st["cap_mask"] = st["cap_mask"].at[b].set(mask1[0])
            st["pos"] = st["pos"].at[b].set(S)
            st["gen_count"] = st["gen_count"].at[b].set(0)
            st["finished"] = st["finished"].at[b].set(False)
            st["active"] = st["active"].at[b].set(True)
            penal_row = jnp.zeros((st["penal_mask"].shape[1],), bool)
            if (self.dec.sampling.use_repetition_penalty
                    and self.dec.sampling.hf_fake_prompt_penalty):
                penal_row = penal_row.at[1].set(True)
                penal_row = penal_row.at[self.dec.cfg.start_mel_token].set(True)
            st["penal_mask"] = st["penal_mask"].at[b].set(penal_row)
            st["codes"] = st["codes"].at[b].set(self.dec.cfg.stop_mel_token)
            self._slot_req[b] = p
            self._slot_chunks[b] = 0

    def _harvest(self):
        st = self.state
        finished = np.asarray(st["finished"])
        active = np.asarray(st["active"])
        codes = None
        for b in range(self.B):
            if active[b] and finished[b]:
                if codes is None:
                    codes = np.asarray(st["codes"])
                n = int(np.asarray(st["gen_count"])[b])
                p = self._slot_req[b]
                self.completed.append(
                    CompletedRequest(
                        req_id=p.req_id,
                        codes=codes[b, :n].copy(),
                        queued_s=time.perf_counter() - p.enqueued_at,
                        decode_chunks=self._slot_chunks[b],
                    )
                )
                st["active"] = st["active"].at[b].set(False)
                self._slot_req[b] = None

    def _chunk_prefix_limit(self):
        """STATIC attention-read bound for the next chunk: the deepest active
        slot's position after `chunk` more steps, rounded up to the phased-
        decode grid (decoder.PHASE; None = full-cap). Host-side, but the host
        reads this state every chunk anyway (harvest)."""
        G = self.dec.PHASE
        if G <= 0:
            return None
        active = np.asarray(self.state["active"])
        if not active.any():
            return None
        deepest = int(np.asarray(self.state["pos"])[active].max()) + self.chunk
        lim = min(-(-(deepest + 1) // G) * G, self.cap)
        return lim if lim < self.cap else None

    def run(self, max_chunks: int = 10_000) -> List[CompletedRequest]:
        """Drain the queue; returns all completed requests."""
        chunks = 0
        while (self._queue or any(a is not None for a in self._slot_req)):
            self._admit()
            if not any(a is not None for a in self._slot_req):
                break
            self.state = self.dec.step_chunk(
                self.params, self.state, chunk=self.chunk,
                max_new=self.max_new,
                prefix_limit=self._chunk_prefix_limit(),
            )
            for b in range(self.B):
                if self._slot_req[b] is not None:
                    self._slot_chunks[b] += 1
            self._harvest()
            chunks += 1
            if chunks >= max_chunks:
                raise RuntimeError("continuous batcher exceeded max_chunks")
        return sorted(self.completed, key=lambda c: c.req_id)


class ContinuousService:
    """Persistent serving front-end over ContinuousBatcher.

    submit() is thread-safe and returns a concurrent.futures.Future that
    resolves to a SegmentResult: the AR decode runs inside the shared chunked
    loop (requests from different clients batch dynamically), and the cascade
    tail (latent -> s2mel -> vocoder) runs per request as it completes.
    Enable in serving with TARS_CONTINUOUS_SLOTS>1.

    tail_workers>0 offloads the cascade tail to a small thread pool so the
    decode loop keeps dispatching chunks while a finished segment's tail
    computes: the tail ends in a blocking PCM d2h (engine._finish_from_codes'
    np.asarray(wav)), and running it inline stalls the shared AR loop — the
    device pipeline drains once per completed segment, which is what made
    continuous mode LOSE to threaded-sequential at multi-segment workloads
    (BENCH_SERVER_r04: 6.92 vs 11.75 aggregate audio-sec/s). 0 = inline
    (legacy). Serving env: TARS_CONTINUOUS_TAIL_WORKERS.
    """

    def __init__(
        self,
        engine,
        n_slots: int = 4,
        text_bucket: int = 64,
        max_new: Optional[int] = None,
        chunk_steps: int = 32,
        seed: int = 0,
        tail_workers: int = 0,
    ):
        import threading
        from concurrent.futures import Future

        self.engine = engine
        rt = engine.cfg.runtime
        self.max_new = max_new or rt.max_mel_tokens
        dec = engine.decoder
        model = dec.model
        if getattr(model, "attn_impl", "xla") not in ("xla", "xla_bucketed"):
            # the batcher's scatter-insert works on the standard (float or
            # int8 kv_quant) cache layouts; Pallas blocked/transposed layouts
            # get an xla sibling decoder (clone keeps every other knob — same
            # params, weights are cache-layout-independent) instead of
            # rejecting the config. kv_quant carries over: quantize-on-insert,
            # not a float detour.
            from indextts_tpu.runtime.decode import GPTDecoder

            dec = GPTDecoder(
                model.clone(attn_impl="xla"), engine.cfg.gpt, dec.sampling,
                dec.param_dtype,
            )
        self.bat = ContinuousBatcher(
            dec,
            {"params": engine.p_gpt},
            n_slots=n_slots,
            text_bucket=text_bucket,
            max_new=self.max_new,
            chunk_steps=chunk_steps,
            temperature=rt.temperature,
            top_p=rt.top_p,
            repetition_penalty=rt.repetition_penalty,
            seed=seed,
        )
        self._Future = Future
        self._tail_pool = None
        if tail_workers > 0:
            from concurrent.futures import ThreadPoolExecutor

            self._tail_pool = ThreadPoolExecutor(
                max_workers=tail_workers, thread_name_prefix="tars-tail"
            )
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._incoming: List[tuple] = []
        self._futures: Dict[int, Any] = {}
        self._meta: Dict[int, tuple] = {}
        self._running = True
        self._next_tmp_id = 0
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def submit(self, spk, emo, text_ids, emo_alpha: float = 1.0,
               emo_vector=None, seed: Optional[int] = None,
               priority: int = 0):
        """Queue one segment; returns a Future[SegmentResult]. priority is
        the caller's segment index (breadth-first admission across
        requests — see ContinuousBatcher.submit)."""
        eng = self.engine
        emovec = eng._emovec_program(
            eng.p_gpt, spk.spk_cond_emb, emo.emo_cond_emb,
            jnp.asarray([spk.cond_len]), jnp.asarray([emo.cond_len]),
            jnp.asarray(emo_alpha, jnp.float32),
        )
        if emo_vector is not None:
            mat_vec = eng._emovec_from_matrix(emo_vector, spk.style, False)
            weight_sum = float(np.sum(emo_vector))
            emovec = jnp.asarray(mat_vec) + (1.0 - weight_sum) * emovec
        conds = eng._build_conds_program(eng.p_gpt, spk.spk_latents, emovec)
        fut = self._Future()
        with self._cv:
            self._incoming.append(
                (conds, np.asarray(text_ids, np.int32), spk, emovec, seed, fut,
                 time.perf_counter(), int(priority))
            )
            self._cv.notify()
        return fut

    def _worker(self):
        try:
            self._worker_loop()
        except BaseException as e:  # worker death must not strand futures
            with self._cv:
                self._running = False
            self._fail_pending(e)
            raise

    def _fail_pending(self, exc: BaseException):
        """Fail every future still pending in the service (queued or
        submitted-but-unharvested), releasing its conds/spk metadata.
        Futures whose tails are RUNNING are left alone — their in-flight
        _finish_one resolves them (set_exception on a RUNNING future would
        SUCCEED and clobber the imminent result); the try/except covers
        the narrow claim race that remains."""
        with self._cv:
            pending = list(self._futures.values())
            pending += [t[5] for t in self._incoming]
            self._futures.clear()
            self._meta.clear()
            self._incoming = []
        for fut in pending:
            if not fut.done() and not fut.running():
                try:
                    fut.set_exception(exc)
                except Exception:  # claimed/resolved in the race window
                    pass

    def _worker_loop(self):
        while True:
            with self._cv:
                while (self._running and not self._incoming
                       and not self.bat._queue
                       and not any(r is not None for r in self.bat._slot_req)):
                    self._cv.wait(timeout=0.5)
                if not self._running:
                    return
                moved = self._incoming
                self._incoming = []
            for conds, text_ids, spk, emovec, seed, fut, t0, prio in moved:
                try:
                    rid = self.bat.submit(conds, text_ids, priority=prio)
                except ValueError as e:
                    fut.set_exception(e)
                    continue
                self._futures[rid] = fut
                self._meta[rid] = (spk, emovec, text_ids, seed, t0)
            self.bat._admit()
            if not any(r is not None for r in self.bat._slot_req):
                continue
            self.bat.state = self.bat.dec.step_chunk(
                self.bat.params, self.bat.state, chunk=self.bat.chunk,
                max_new=self.bat.max_new,
                prefix_limit=self.bat._chunk_prefix_limit(),
            )
            for b in range(self.bat.B):
                if self.bat._slot_req[b] is not None:
                    self.bat._slot_chunks[b] += 1
            self.bat._harvest()
            done, self.bat.completed = self.bat.completed, []
            for c in done:
                fut = self._futures.pop(c.req_id, None)
                meta = self._meta.pop(c.req_id)
                if fut is None or fut.cancelled():
                    continue
                if self._tail_pool is not None:
                    # decode loop moves straight on to the next admit+chunk;
                    # the tail (and its blocking PCM d2h) runs concurrently
                    try:
                        self._tail_pool.submit(self._finish_one, c, meta, fut)
                    except RuntimeError:
                        # pool already shut down (late harvest during
                        # shutdown): finish inline rather than stranding the
                        # future with a confusing submit error
                        self._finish_one(c, meta, fut)
                else:
                    self._finish_one(c, meta, fut)

    def _finish_one(self, c, meta, fut):
        # claims the future atomically: a caller cancel() that lands before
        # this point wins cleanly, and set_result can no longer race
        # cancellation into InvalidStateError (which would kill the decode
        # thread in inline mode). A future already FINISHED (shutdown's
        # _fail_pending raced a late harvest) raises here — treat as
        # resolved-elsewhere, never as a worker-killing error.
        try:
            if not fut.set_running_or_notify_cancel():
                return
        except Exception:
            return
        spk, emovec, text_ids, seed, t0 = meta
        try:
            res = self.engine._finish_from_codes(
                spk, emovec, text_ids, c.codes, seed,
                time.perf_counter() - t0,
            )
            try:
                fut.set_result(res)
            except Exception:  # resolved elsewhere (shutdown raced the tail)
                pass
        except Exception as e:  # surface cascade errors to the caller
            try:
                fut.set_exception(e)
            except Exception:
                pass

    def shutdown(self, timeout: float = 60.0):
        with self._cv:
            self._running = False
            self._cv.notify_all()
        # bounded join, generous enough for a long step_chunk/compile (>5 s
        # is routine on a degraded tunnel) but not forever — a worker wedged
        # in a dead-tunnel device call must not hang SIGTERM shutdown. If
        # the worker outlives the cap and later harvests into the shut-down
        # pool, _worker_loop's RuntimeError fallback finishes that segment
        # inline instead of stranding its future.
        self._thread.join(timeout=timeout)
        if self._tail_pool is not None:
            # wait=False: a tail thread wedged in a dead-tunnel device call
            # (s2mel/vocoder/PCM d2h can block for minutes) must not hang
            # the SIGTERM handler either. In-flight tails keep their
            # claimed futures and resolve them if the call ever returns;
            # a blocked device call itself cannot be cancelled, so it may
            # still pin interpreter teardown — that is the backend's floor,
            # not this shutdown's.
            self._tail_pool.shutdown(wait=False)
        # fail whatever is still pending (RUNNING tails excluded — see
        # _fail_pending): clients blocked in fut.result() get a prompt
        # shutdown error, not a multi-minute timeout
        self._fail_pending(RuntimeError("ContinuousService shut down"))
