"""Streaming inference session (infer/streaming.py): incremental
window-by-window generation must reproduce the batch path's output
exactly in decode mode (same token carry, same chunk semantics), and
compose with the decode policies and exemplar retrieval."""
import numpy as np
import pytest

from gesture2vec_tpu.infer.streaming import StreamingGestureSession
from gesture2vec_tpu.infer.text2gesture import GestureGenerator

from tests.test_e2e import (CODES, FPS, N_POSES, SENT_LEN, WORDS,
                            _generator, _sampling_generator,
                            pipeline_artifacts)  # noqa: F401 (fixture)


def _stream_all(gen, words, duration_s, chunks=3):
    """Feed words incrementally in `chunks` pushes + finish; returns
    (frames concat, tokens concat)."""
    sess = StreamingGestureSession(gen)
    out = []
    n = len(words)
    for i in range(chunks):
        upto = (i + 1) * n // chunks
        now = words[upto - 1][2] if upto else 0.0
        out += sess.push(words[:upto], now)
    out += sess.finish(duration_s)
    frames = np.concatenate([f for f, _ in out], axis=0)
    tokens = np.concatenate([t for _, t in out], axis=0)
    return frames, tokens


def test_streaming_matches_batch_decode(pipeline_artifacts):
    """Greedy decode: streamed windows concat == one-shot generate()."""
    gen = _generator(pipeline_artifacts, "decode")
    f_batch, t_batch = gen.generate(WORDS, duration_s=4.0)
    f_stream, t_stream = _stream_all(
        _generator(pipeline_artifacts, "decode"), WORDS, 4.0)
    np.testing.assert_array_equal(t_stream, t_batch)
    np.testing.assert_allclose(f_stream, f_batch, atol=1e-5)


def test_streaming_matches_batch_continuity(pipeline_artifacts):
    """chunk_continuity: the seed-frame carry crosses push boundaries
    exactly like the batch scan (which never resets at windows)."""
    art = pipeline_artifacts
    gen_b = _sampling_generator(art, temperature=0.0,
                                chunk_continuity=True)
    f_batch, t_batch = gen_b.generate(WORDS, duration_s=4.0)
    gen_s = _sampling_generator(art, temperature=0.0,
                                chunk_continuity=True)
    f_stream, t_stream = _stream_all(gen_s, WORDS, 4.0)
    np.testing.assert_array_equal(t_stream, t_batch)
    np.testing.assert_allclose(f_stream, f_batch, atol=1e-5)


def test_streaming_incremental_emission(pipeline_artifacts):
    """Windows emit as soon as their time range completes; finish()
    flushes the remainder; word updates for future windows count."""
    gen = _generator(pipeline_artifacts, "decode")
    sess = StreamingGestureSession(gen)
    unit = SENT_LEN / FPS  # 2 s
    assert sess.push(WORDS[:2], now_s=1.0) == []    # window 0 incomplete
    first = sess.push(WORDS[:4], now_s=2.0)         # window 0 complete
    assert len(first) == 1
    frames0, toks0 = first[0]
    assert toks0.shape == (SENT_LEN // N_POSES,)
    assert frames0.shape == ((SENT_LEN // N_POSES) * N_POSES, 135)
    rest = sess.finish(4.0)
    assert len(rest) == 1
    assert np.isfinite(rest[0][0]).all()


def test_streaming_policies_and_exemplar(pipeline_artifacts):
    """Sampled, beam, and exemplar sessions all stream valid output."""
    art = pipeline_artifacts
    for kw, mode in (({"temperature": 1.5}, "decode"),
                     ({"beam_width": 3}, "decode"),
                     ({}, "exemplar")):
        if mode == "exemplar":
            gen = _generator(art, "exemplar")
        else:
            gen = _sampling_generator(art, temperature=0.0, **kw) \
                if "beam_width" in kw else \
                _sampling_generator(art, **kw)
        frames, tokens = _stream_all(gen, WORDS, 4.0)
        assert tokens.shape == (2 * (SENT_LEN // N_POSES),)
        assert tokens.min() >= 0 and tokens.max() < CODES
        assert np.isfinite(frames).all()


def test_streaming_beam1_matches_greedy(pipeline_artifacts):
    art = pipeline_artifacts
    f_g, t_g = _stream_all(_generator(art, "decode"), WORDS, 4.0)
    gen_b1 = _sampling_generator(art, temperature=0.0, beam_width=1)
    f_b, t_b = _stream_all(gen_b1, WORDS, 4.0)
    np.testing.assert_array_equal(t_b, t_g)
    np.testing.assert_allclose(f_b, f_g, atol=1e-6)
