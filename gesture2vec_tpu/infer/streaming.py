"""Streaming text -> gesture inference: incremental window-by-window
generation for live serving.

The reference generates only whole transcripts offline (one process per
transcript, ref: scripts/inference_text2embedding.py:108-569). For a
live avatar the words arrive WITH the speech, so this module exposes the
same generation chain as infer/text2gesture.GestureGenerator as an
incremental session: push words as they arrive, receive motion for each
completed ~6 s window immediately, with the reference's cross-window
token carry (ref :369-374) preserved across push calls.

TPU-native structure: one jitted per-window step (text encode -> token
decode -> chunk rollout -> DAE decode fused into ONE device program per
window; the teacher-forced seed prefix is an explicit carry array
threaded between calls, exactly the value the batch path's lax.scan
carries in-graph). Every step reuses one compiled program, so
steady-state latency is a single device dispatch per window — measured
in benchmarks/streaming_infer.py.

Decode-mode streaming is bit-identical to the batch path
(tests/test_streaming_infer.py pins generate() == streamed concat);
exemplar mode streams too (per-window retrieval + decode), with the
same bank semantics as the batch path.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.data.datasets import unnormalize


class StreamingGestureSession:
    """Incremental generation over one transcript.

    Built from a configured GestureGenerator (mode, decode policy,
    smoothing fields are all honored). Typical use::

        gen = GestureGenerator(..., mode="decode")
        sess = StreamingGestureSession(gen)
        for words_so_far, now_s in live_captions():
            for frames, tokens in sess.push(words_so_far, now_s):
                play(frames)                      # one ~6 s window
        for frames, tokens in sess.finish(total_duration_s):
            play(frames)

    push(words, now_s) emits every window whose time range is fully
    covered by now_s; finish(duration_s) pads and emits the remainder
    (same ceil-to-window rule as the batch path). Words may keep
    arriving for future windows at any time; words for already-emitted
    windows are ignored (they are in the past).
    """

    def __init__(self, generator, step=None):
        self.gen = generator
        g = generator
        self.unit = g.sentence_frame_length / g.fps
        self.n_steps = g.n_steps
        self._next_window = 0
        self._seed = jnp.zeros((self.n_steps,), jnp.int32)
        # decode mode: seed frame carried across windows when the
        # generator has chunk_continuity (matches the batch path's scan
        # carry, which never resets at window boundaries).
        # exemplar mode: the previous pick index instead — the carry of
        # continuity-aware retrieval (exemplar_continuity), -1 = none.
        if g.mode == "exemplar":
            self._prev_last = np.int32(-1)
        else:
            self._prev_last = jnp.zeros(
                (getattr(g.seq_model, "rep_dim", 1),), jnp.float32)
        self._words: List[List] = []
        # one fused per-window program, compiled once per session
        # (shapes are static: one window, max_words ids). Pass a
        # prebuilt `step` (build_streaming_step(generator)) to share
        # the compiled program across many sessions — jax.jit caches by
        # function identity, so a per-session build would recompile;
        # a server serving concurrent streams builds it once.
        self._step = step or build_streaming_step(generator)

    # -----------------------------------------------------------------
    def push(self, words: List[List], now_s: float
             ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Feed the words seen so far (cumulative [[word, start_s,
        end_s], ...]) and the current stream time. Returns one
        (frames, tokens) pair per newly COMPLETED window (time range
        fully <= now_s), possibly empty."""
        self._words = list(words)
        out = []
        while (self._next_window + 1) * self.unit <= now_s + 1e-9:
            out.append(self._emit(self._next_window))
            self._next_window += 1
        return out

    def finish(self, duration_s: Optional[float] = None
               ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Emit the remaining windows up to ceil(duration_s / unit)
        (default: last word end time), same rule as the batch path."""
        if duration_s is None:
            duration_s = self._words[-1][2] if self._words else self.unit
        n_windows = max(int(np.ceil(duration_s / self.unit)), 1)
        out = []
        while self._next_window < n_windows:
            out.append(self._emit(self._next_window))
            self._next_window += 1
        return out

    def _emit(self, w: int) -> Tuple[np.ndarray, np.ndarray]:
        g = self.gen
        t0, t1 = w * self.unit, (w + 1) * self.unit
        ids, length = g._window_word_ids(self._words, t0, t1)
        key = g._next_key()
        frames_j, toks_j, self._seed, self._prev_last = self._step(
            jnp.asarray(ids), jnp.asarray(np.int32(length)), self._seed,
            self._prev_last, key)
        frames = unnormalize(np.asarray(frames_j), g.pose_mean,
                             g.pose_std)
        return frames, np.asarray(toks_j)


def build_streaming_step(g):
    """Build the per-window step program for a GestureGenerator:
    (word_ids (S,), length, seed_tokens (n_steps,), prev_last
    (rep_dim,), key) -> (frames, tokens, next_seed, next_prev_last).
    One compiled program shared by every StreamingGestureSession
    constructed with it."""
    t2t = g.t2t_model
    n_pre = t2t.n_pre_poses
    n_steps = g.n_steps
    multi = getattr(t2t, "token_stages", 1) > 1
    s0t = float(getattr(g, "stage0_temperature", -1.0))
    sampling = g.temperature > 0.0 or s0t > 0.0
    beam = int(g.beam_width) if g.beam_width > 1 else 0
    temp, topk = float(g.temperature), int(g.top_k)
    soft = float(getattr(g, "soft_decode", 0.0))

    def _mix_probs(logits, tokens):
        """Soft-decode mixture (see text2gesture._mix_probs): softmax
        at temperature `soft`, step-0 seed row kept hard."""
        p = jax.nn.softmax(logits / soft, axis=-1)
        hard0 = jax.nn.one_hot(tokens[..., 0], logits.shape[-1],
                               dtype=p.dtype)[..., None, :]
        return jnp.concatenate([hard0, p[..., 1:, :]], axis=-2)

    def decode_window(word_ids, length, seed_tokens, key):
        """(S,) ids, scalar length, (n_steps,) seed -> res dict of
        the window's token decode under the session's policy."""
        eo, dh = t2t.apply(g.t2t_variables, word_ids[None],
                           length[None], method=t2t.encode_text)
        mask = jnp.arange(word_ids.shape[0]) < length
        if beam:
            return t2t.apply(g.t2t_variables, eo, dh,
                             seed_tokens[None], enc_mask=mask,
                             beam_width=beam, method=t2t.beam_decode)
        kw = {}
        if sampling:
            kw = dict(temperature=temp, top_k=topk,
                      rngs={"sample": key})
            if s0t >= 0.0:
                kw["stage0_temperature"] = s0t
        return t2t.apply(g.t2t_variables, eo, dh, seed_tokens[None],
                         train=False, enc_mask=mask,
                         method=t2t.decode_tokens, **kw)

    if g.mode == "decode":
        if getattr(g, "decode_overlap", 0):
            raise ValueError("decode_overlap is not supported by the "
                             "streaming session (the crossfade needs "
                             "the next chunk's head before emitting); "
                             "use chunk_continuity for streamed decode")
        seq, dae = g.seq_model, g.dae_model

        def token_hidden(tokens, stage_tokens, probs=None,
                         stage_probs=None):
            cb = jnp.asarray(g.seq_variables["params"]["vq_layer"]
                             ["codebook"])
            L, H = seq.n_layers, seq.hidden_size
            if probs is not None:
                flat = probs @ cb
            else:
                flat = jnp.take(cb, tokens, axis=0)
            if stage_tokens is not None:
                for s in range(stage_tokens.shape[-1]):
                    cbs = jnp.asarray(
                        g.seq_variables["params"]["vq_layer"]
                        [f"codebook_r{s + 1}"])
                    if stage_probs is not None:
                        flat = flat + stage_probs[:, s] @ cbs
                        continue
                    st = stage_tokens[:, s]
                    flat = flat + jnp.where(
                        (st >= 0)[:, None],
                        jnp.take(cbs, jnp.maximum(st, 0), axis=0),
                        0.0)
            return jnp.transpose(
                flat.reshape(tokens.shape[0], L, H), (1, 0, 2))

        continuity = bool(g.chunk_continuity)

        @jax.jit
        def step(word_ids, length, seed_tokens, prev_last, key):
            """One window: tokens + motion frames + carries, one
            device program."""
            res = decode_window(word_ids, length, seed_tokens, key)
            toks = res["tokens"][0]
            stage = None
            probs = stage_probs = None
            if multi:
                sr = res["stage_tokens"][0]
                stage = jnp.concatenate(
                    [jnp.full((1, sr.shape[-1]), -1, sr.dtype), sr],
                    axis=0)
            if soft:
                probs = _mix_probs(res["logits"][0], toks)
                if multi:
                    sp = jax.nn.softmax(res["stage_logits"][0] / soft,
                                        axis=-1)
                    stage_probs = jnp.concatenate(
                        [jnp.zeros((1,) + sp.shape[1:], sp.dtype), sp],
                        axis=0)
            if continuity:
                # per-chunk scan seeded from the previous chunk's
                # last frame, carried ACROSS windows via prev_last
                # (the batch path's scan carry never resets)
                def body(pl, xs):
                    hid = token_hidden(
                        xs["tok"][None],
                        xs["st"][None] if "st" in xs else None,
                        xs["p"][None] if "p" in xs else None,
                        xs["sp"][None] if "sp" in xs else None)
                    out = seq.apply(
                        g.seq_variables, hid, pl[None],
                        method=seq.rollout,
                        rngs={"dropout": jax.random.PRNGKey(0)})[0]
                    return out[-1], out

                xs = {"tok": toks}
                if stage is not None:
                    xs["st"] = stage
                if probs is not None:
                    xs["p"] = probs
                if stage_probs is not None:
                    xs["sp"] = stage_probs
                new_last, chunks = jax.lax.scan(body, prev_last, xs)
                lat = chunks.reshape(-1, seq.rep_dim)
            else:
                hidden = token_hidden(toks, stage, probs, stage_probs)
                seed0 = jnp.zeros((toks.shape[0], seq.rep_dim))
                lat = seq.apply(
                    g.seq_variables, hidden, seed0,
                    method=seq.rollout,
                    rngs={"dropout": jax.random.PRNGKey(0)})
                lat = lat.reshape(-1, seq.rep_dim)
                new_last = prev_last
            frames = dae.apply(g.dae_variables, lat,
                               method=dae.decode)
            next_seed = jnp.zeros((n_steps,), jnp.int32) \
                .at[:n_pre].set(toks[-n_pre:])
            return frames, toks, next_seed, new_last

        return step

    # exemplar mode: tokens on device, retrieval on host (indexing),
    # decode via the shared bank program (one extra device call)
    @jax.jit
    def predict(word_ids, length, seed_tokens, key):
        res = decode_window(word_ids, length, seed_tokens, key)
        toks = res["tokens"][0]
        next_seed = jnp.zeros((n_steps,), jnp.int32) \
            .at[:n_pre].set(toks[-n_pre:])
        return toks, next_seed

    continuity_picks = bool(getattr(g, "exemplar_continuity", False))

    def step(word_ids, length, seed_tokens, prev_last, key):
        toks, next_seed = predict(word_ids, length, seed_tokens, key)
        if continuity_picks:
            picks = g._exemplars.pick_indices_continuity(
                np.asarray(toks), prev_pick=int(prev_last))
            prev_last = np.int32(picks[-1])
        else:
            picks = g._exemplars.pick_indices(np.asarray(toks))
        frames = g._exemplar_decode(jnp.asarray(picks))
        return frames, toks, next_seed, prev_last

    return step


class StreamStepBatcher:
    """Continuous batching for concurrent streaming sessions (decode
    mode): fuse due per-window steps across live sessions into ONE
    vmapped device program - the LLM-serving lever applied to gesture
    streams. The batcher exposes a `step`-compatible callable
    (StreamingGestureSession(gen, step=batcher.step)): calls queue for
    up to `window_s`, the collector stacks up to `max_batch` of them
    INSIDE the jitted program (host-side stacking of device carries
    would pay one tunnel fetch per row per arg - measured to dominate),
    pads to a power-of-two bucket so arbitrary concurrency reuses a
    handful of compiled programs, and runs one jit(vmap(step)). Each
    caller gets bit-identical results to its own unbatched step - the
    sessions' carries never mix (vmap semantics), pinned by
    tests/test_streaming_infer.py.

    MEASURED VERDICT (benchmarks/streaming_concurrency.py, v5e via the
    tunnel): OFF by default. JAX async dispatch already pipelines
    concurrent B=1 stream steps - per-session dispatch sustains
    160-190 windows/s aggregate from 16-64 sessions (~1000 live
    avatars/chip at one window per 6 s) with p50 latency still near the
    single-stream floor, while fusing adds batch-formation latency and
    lockstep convoying without throughput gain (speedup 0.1-0.5x at
    every concurrency measured; these ~200-wide GRU steps leave the
    chip idle either way, so there is no compute contention for fusion
    to relieve). The batcher ships as an opt-in
    (g2v-serve --stream-batch N) for deployments where the chip IS
    compute-saturated - much bigger models or many chips behind one
    host - mirroring how the Pallas kernels ship (reference designs,
    off by default, benchmarks/README.md).

    Decode mode only: the exemplar step has a host retrieval stage
    between two device calls; constructing a batcher for an exemplar
    generator raises. Beyond reference (the reference has no serving or
    streaming story at all)."""

    def __init__(self, generator, max_batch: int = 16,
                 window_s: float = 0.01):
        if generator.mode != "decode":
            raise ValueError("StreamStepBatcher supports decode mode "
                             "only (the exemplar step retrieves on "
                             "host mid-step)")
        self.gen = generator
        self.max_batch = int(max_batch)
        self.window_s = float(window_s)
        self.stats = {"calls": 0, "batches": 0, "batched_calls": 0}
        self._base_step = build_streaming_step(generator)
        self._vsteps: Dict[int, object] = {}
        self._lock = threading.Lock()
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        # set while the collector holds a batch open in its window
        # (synchronization hook for shutdown tests/diagnostics)
        self.collecting = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._stop.set()
        self._q.put(None)
        self._thread.join(timeout=5)
        # fail any callers still queued (their step() would otherwise
        # block forever on done.wait())
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                item[0]["error"] = RuntimeError("batcher closed")
                item[0]["done"].set()

    # -- the injectable session step ----------------------------------
    def step(self, word_ids, length, seed_tokens, prev_last, key):
        """Same signature/results as build_streaming_step(gen); blocks
        until the fused batch containing this call completes."""
        if self._stop.is_set():
            raise RuntimeError("batcher closed")
        done = threading.Event()
        slot = {"done": done}
        self._q.put((slot, (word_ids, length, seed_tokens, prev_last,
                            key)))
        done.wait()
        if "error" in slot:
            raise slot["error"]
        return slot["result"]

    # -- collector -----------------------------------------------------
    def _vstep(self, bucket: int):
        with self._lock:
            if bucket not in self._vsteps:
                base = self._base_step

                # rows: tuple of B per-session arg tuples. Stacking
                # INSIDE the jitted program is load-bearing on a
                # tunnel-attached chip: the session carries (seed,
                # prev_last) live on device, and a host-side
                # np.asarray/stack would pay one device->host fetch
                # per row per arg (~30 ms each) — measured to make the
                # fused step slower than unbatched dispatch. This way
                # the whole fused step is ONE dispatch.
                @jax.jit
                def vstep(rows):
                    stacked = tuple(
                        jnp.stack([r[i] for r in rows])
                        for i in range(5))
                    return jax.vmap(base)(*stacked)

                self._vsteps[bucket] = vstep
            return self._vsteps[bucket]

    def _bucket(self, n: int) -> int:
        b = 1
        while b < n:
            b *= 2
        return min(b, self.max_batch)

    def _run(self) -> None:
        import time
        while not self._stop.is_set():
            first = self._q.get()
            if first is None:
                return
            batch = [first]
            self.collecting.set()
            deadline = time.monotonic() + self.window_s
            stopping = False
            while len(batch) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    item = self._q.get(timeout=left)
                except queue.Empty:
                    break
                if item is None:
                    # shutdown sentinel mid-collection: still execute
                    # the batch already collected, then exit
                    stopping = True
                    break
                batch.append(item)
            try:
                self._execute(batch)
            except Exception as e:  # deliver the failure to every caller
                for slot, _ in batch:
                    slot["error"] = e
                    slot["done"].set()
            self.collecting.clear()
            if stopping:
                return

    def _execute(self, batch) -> None:
        n = len(batch)
        self.stats["calls"] += n
        self.stats["batches"] += 1
        if n == 1:
            slot, args = batch[0]
            slot["result"] = self._base_step(*args)
            slot["done"].set()
            return
        self.stats["batched_calls"] += n
        bucket = self._bucket(n)
        # pad to the bucket with copies of row 0 (results discarded)
        rows = [args for _, args in batch]
        rows += [rows[0]] * (bucket - n)
        outs = self._vstep(bucket)(tuple(rows))
        for i, (slot, _) in enumerate(batch):
            slot["result"] = tuple(o[i] for o in outs)
            slot["done"].set()


class AudioStreamingGestureSession:
    """Incremental speech -> gesture over one live audio stream.

    The audio twin of StreamingGestureSession, built from a configured
    AudioGestureGenerator: push the waveform captured so far (cumulative
    mono float at audio_sr), receive motion for each completed ~6 s
    window immediately, with the cross-window teacher-seed carry
    preserved. For fusion="both" checkpoints also pass the cumulative
    words to push().

    Host work per window is the mel frontend (io/audio numpy); the rest
    is one fused device program per window, shared across sessions via
    `step=build_audio_streaming_step(generator)`.
    """

    def __init__(self, generator, step=None):
        self.gen = generator
        g = generator
        self.unit = g.sentence_frame_length / g.fps
        self.n_steps = g.n_steps
        self._next_window = 0
        self._seed = jnp.zeros((self.n_steps,), jnp.int32)
        self._prev_pick = np.int32(-1)   # exemplar continuity carry
        self._audio = np.zeros((0,), np.float32)
        self._words: List[List] = []
        self._step = step or build_audio_streaming_step(generator)

    def push(self, audio: np.ndarray, now_s: Optional[float] = None,
             words: Optional[List[List]] = None
             ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """audio: the CUMULATIVE waveform so far (mono, audio_sr).
        now_s defaults to the audio length. Emits one (frames, tokens)
        per newly completed window."""
        self._audio = np.asarray(audio, np.float32)
        if words is not None:
            self._words = list(words)
        if now_s is None:
            now_s = len(self._audio) / self.gen.audio_sr
        out = []
        while (self._next_window + 1) * self.unit <= now_s + 1e-9:
            out.append(self._emit(self._next_window))
            self._next_window += 1
        return out

    def finish(self, duration_s: Optional[float] = None
               ) -> List[Tuple[np.ndarray, np.ndarray]]:
        if duration_s is None:
            duration_s = len(self._audio) / self.gen.audio_sr
        n_windows = max(int(np.ceil(duration_s / self.unit)), 1)
        out = []
        while self._next_window < n_windows:
            out.append(self._emit(self._next_window))
            self._next_window += 1
        return out

    def _emit(self, w: int) -> Tuple[np.ndarray, np.ndarray]:
        g = self.gen
        sr = g.audio_sr
        window_samples = int(self.unit) * sr
        seg = self._audio[w * window_samples:(w + 1) * window_samples]
        if len(seg) < window_samples:
            seg = np.pad(seg, (0, window_samples - len(seg)))
        if g.fusion == "both":
            if g.vocab is None:
                raise ValueError("fusion='both' streaming needs a vocab "
                                 "and words pushed alongside the audio")
            window_seconds = int(self.unit)
            wavs = seg.reshape(window_seconds, sr)
            # word ids for THIS window's time range (generator helper
            # indexes windows from 0 over the whole stream, so slice)
            all_ids = g._window_word_ids(self._words, w + 1)
            enc_in = (jnp.asarray(all_ids[w]), jnp.asarray(wavs))
        else:
            from gesture2vec_tpu.io.audio import mel_chunks_per_second
            enc_in = jnp.asarray(
                mel_chunks_per_second(seg, sr).astype(np.float32))
        if g.temperature > 0.0:
            key = jax.random.PRNGKey(int(g._rng.integers(2 ** 31 - 1)))
        else:
            key = jax.random.PRNGKey(0)
        frames_j, toks_j, self._seed, self._prev_pick = self._step(
            enc_in, self._seed, self._prev_pick, key)
        frames = unnormalize(np.asarray(frames_j), g.pose_mean,
                             g.pose_std)
        return frames, np.asarray(toks_j)


def build_audio_streaming_step(g):
    """Per-window step for an AudioGestureGenerator: (enc_in (mel
    chunks (S, n_mels, F) or (word_ids (T,), wavs (S, sr)) for
    fusion='both'), seed_tokens, key) -> (frames, tokens, next_seed).
    Shared across sessions (jit caches by function identity)."""
    a2t, seq, dae = g.a2t_model, g.seq_model, g.dae_model
    n_pre, n_steps = a2t.n_pre_poses, g.n_steps
    multi = getattr(a2t, "token_stages", 1) > 1
    sampling = g.temperature > 0.0
    beam = int(g.beam_width) if g.beam_width > 1 else 0
    temp, topk = float(g.temperature), int(g.top_k)
    exemplar = g.mode == "exemplar"
    soft = float(getattr(g, "soft_decode", 0.0))

    def _mix_probs(logits, tokens):
        p = jax.nn.softmax(logits / soft, axis=-1)
        hard0 = jax.nn.one_hot(tokens[..., 0], logits.shape[-1],
                               dtype=p.dtype)[..., None, :]
        return jnp.concatenate([hard0, p[..., 1:, :]], axis=-2)

    @jax.jit
    def device_step(enc_in, seed_tokens, key):
        if isinstance(enc_in, tuple):
            batched = (enc_in[0][None], enc_in[1][None])
        else:
            batched = enc_in[None]
        eo, dh = a2t.apply(g.a2t_variables, batched,
                           method=a2t.encode_audio)
        if beam:
            res = a2t.apply(g.a2t_variables, eo, dh, seed_tokens[None],
                            beam_width=beam, method=a2t.beam_decode)
        else:
            kw = (dict(temperature=temp, top_k=topk,
                       rngs={"sample": key}) if sampling else {})
            res = a2t.apply(g.a2t_variables, eo, dh, seed_tokens[None],
                            method=a2t.decode_tokens, **kw)
        toks = res["tokens"][0]
        next_seed = jnp.zeros((n_steps,), jnp.int32) \
            .at[:n_pre].set(toks[-n_pre:])
        if exemplar:
            return toks, next_seed
        stage = None
        if multi:
            sr_ = res["stage_tokens"][0]
            stage = jnp.concatenate(
                [jnp.full((1, sr_.shape[-1]), -1, sr_.dtype), sr_],
                axis=0)
        cb = jnp.asarray(g.seq_variables["params"]["vq_layer"]
                         ["codebook"])
        L, H = seq.n_layers, seq.hidden_size
        if soft:
            flat = _mix_probs(res["logits"][0], toks) @ cb
        else:
            flat = jnp.take(cb, toks, axis=0)
        if stage is not None:
            for s in range(stage.shape[-1]):
                cbs = jnp.asarray(g.seq_variables["params"]["vq_layer"]
                                  [f"codebook_r{s + 1}"])
                if soft:
                    sp = jax.nn.softmax(
                        res["stage_logits"][0][:, s] / soft, axis=-1)
                    sp = jnp.concatenate(
                        [jnp.zeros((1, sp.shape[-1]), sp.dtype), sp],
                        axis=0)
                    flat = flat + sp @ cbs
                    continue
                st = stage[:, s]
                flat = flat + jnp.where(
                    (st >= 0)[:, None],
                    jnp.take(cbs, jnp.maximum(st, 0), axis=0), 0.0)
        hidden = jnp.transpose(flat.reshape(toks.shape[0], L, H),
                               (1, 0, 2))
        lat = seq.apply(g.seq_variables, hidden,
                        jnp.zeros((toks.shape[0], seq.rep_dim)),
                        method=seq.rollout,
                        rngs={"dropout": jax.random.PRNGKey(0)})
        frames = dae.apply(g.dae_variables,
                           lat.reshape(-1, seq.rep_dim),
                           method=dae.decode)
        return frames, toks, next_seed

    if not exemplar:
        def step(enc_in, seed_tokens, prev_pick, key):
            frames, toks, next_seed = device_step(enc_in, seed_tokens,
                                                  key)
            return frames, toks, next_seed, prev_pick
        return step

    continuity_picks = bool(getattr(g, "exemplar_continuity", False))

    def step(enc_in, seed_tokens, prev_pick, key):
        toks, next_seed = device_step(enc_in, seed_tokens, key)
        if continuity_picks:
            picks = g._exemplars.pick_indices_continuity(
                np.asarray(toks), prev_pick=int(prev_pick))
            prev_pick = np.int32(picks[-1])
        else:
            picks = g._exemplars.pick_indices(np.asarray(toks))
        frames = g._exemplar_decode(jnp.asarray(picks))
        return frames, toks, next_seed, prev_pick

    return step
