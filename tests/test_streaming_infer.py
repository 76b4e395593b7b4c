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


def _tiny_audio_generator(rng, temperature=0.0):
    import jax
    import jax.numpy as jnp

    from gesture2vec_tpu.infer.audio2gesture import AudioGestureGenerator
    from gesture2vec_tpu.train.audio2token_trainer import make_audio2token
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.dae_trainer import (init_state as dae_init,
                                                   make_frame_model)
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state as sq_init,
                                                      make_seq_ae)

    rep, fps, n_poses, sent_len, codes = 12, 10, 10, 20, 8
    a2t_cfg = load_config(dict(
        name="a", model="seq2seq", hidden_size=16, n_layers=2,
        dropout_prob=0.1, epochs=1, batch_size=4, learning_rate=1e-3,
        n_poses=n_poses, n_pre_poses=1, sentence_frame_length=sent_len,
        motion_resampling_framerate=fps, autoencoder_vq=True,
        autoencoder_vq_components=codes, autoencoder_att=True,
        random_seed=0))
    a2t = make_audio2token(a2t_cfg)
    key = jax.random.PRNGKey(0)
    mel0 = jnp.zeros((2, sent_len // fps, 128, 31), jnp.float32)
    tgt0 = jnp.zeros((2, sent_len // n_poses), jnp.int32)
    a2t_vars = a2t.init({"params": key,
                         "dropout": jax.random.fold_in(key, 1)},
                        mel0, tgt0, train=False)
    a2t_vars = {"params": a2t_vars["params"],
                "batch_stats": a2t_vars.get("batch_stats", {})}
    dae_cfg = load_config(dict(name="d", model="DAE", hidden_size=rep,
                               input_motion_dim=30, epochs=1,
                               batch_size=4, random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_state = dae_init(dae_cfg, dae, jax.random.fold_in(key, 2),
                         make_optimizer(1e-3))
    sq_cfg = load_config(dict(name="s", model="seq2seq", hidden_size=16,
                              n_layers=2, dropout_prob=0.0, epochs=1,
                              batch_size=4, learning_rate=1e-3,
                              rep_learning_dim=rep, n_poses=n_poses,
                              n_pre_poses=1, autoencoder_vq=True,
                              autoencoder_vq_components=codes,
                              autoencoder_att=False,
                              autoencoder_conditioned=True,
                              random_seed=0))
    seq = make_seq_ae(sq_cfg)
    sq_state = sq_init(sq_cfg, seq, jax.random.fold_in(key, 3),
                       make_optimizer(1e-3))
    return AudioGestureGenerator(
        a2t_model=a2t, a2t_variables=a2t_vars, seq_model=seq,
        seq_variables={"params": sq_state.params,
                       "batch_stats": sq_state.batch_stats},
        dae_model=dae, dae_variables={"params": dae_state.params},
        pose_mean=np.zeros(30, np.float32),
        pose_std=np.ones(30, np.float32),
        n_frames=n_poses, sentence_frame_length=sent_len, fps=fps,
        audio_sr=16000, mode="decode", temperature=temperature)


def test_audio_streaming_matches_batch(rng):
    """Live speech streaming: incremental pushes reproduce the batch
    audio path exactly in greedy decode mode."""
    from gesture2vec_tpu.infer.streaming import (
        AudioStreamingGestureSession)

    audio = rng.normal(scale=0.1, size=(16000 * 4,)).astype(np.float32)
    gen = _tiny_audio_generator(np.random.default_rng(0))
    f_batch, t_batch = gen.generate(audio)

    sess = AudioStreamingGestureSession(
        _tiny_audio_generator(np.random.default_rng(0)))
    out = sess.push(audio[:16000 * 1])          # 1 s: window incomplete
    assert out == []
    out = sess.push(audio[:16000 * 3])          # 3 s: window 0 done
    assert len(out) == 1
    out += sess.push(audio)                     # 4 s: window 1 done
    out += sess.finish(4.0)
    assert len(out) == 2
    f_s = np.concatenate([f for f, _ in out], axis=0)
    t_s = np.concatenate([t for _, t in out], axis=0)
    np.testing.assert_array_equal(t_s, t_batch)
    np.testing.assert_allclose(f_s, f_batch, atol=1e-5)


def test_audio_streaming_sampled(rng):
    from gesture2vec_tpu.infer.streaming import (
        AudioStreamingGestureSession)

    audio = rng.normal(scale=0.1, size=(16000 * 4,)).astype(np.float32)
    sess = AudioStreamingGestureSession(
        _tiny_audio_generator(np.random.default_rng(0), temperature=1.5))
    out = sess.push(audio) + sess.finish(4.0)
    tokens = np.concatenate([t for _, t in out])
    assert tokens.shape == (4,)                 # 2 windows x 2 steps
    assert tokens.min() >= 0 and tokens.max() < 8
    assert all(np.isfinite(f).all() for f, _ in out)


def test_streaming_exemplar_continuity_matches_batch(pipeline_artifacts):
    """The continuity pick chain threads across streamed windows via
    the session carry, reproducing the batch path exactly (both start
    from one seeded random first pick)."""
    art = pipeline_artifacts
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator

    def mk():
        return GestureGenerator(
            t2t_model=art["t2t"][0], t2t_variables=art["t2t"][1],
            seq_model=art["seq"][0], seq_variables=art["seq"][1],
            dae_model=art["dae"][0], dae_variables=art["dae"][1],
            vocab=art["vocab"], pose_mean=art["store"].pose_mean,
            pose_std=art["store"].pose_std, n_frames=N_POSES,
            sentence_frame_length=SENT_LEN, fps=FPS, max_words=16,
            mode="exemplar", latent_bank=art["bank"], seed=0,
            exemplar_continuity=True)

    f_batch, t_batch = mk().generate(WORDS, duration_s=4.0)
    f_stream, t_stream = _stream_all(mk(), WORDS, 4.0)
    np.testing.assert_array_equal(t_stream, t_batch)
    np.testing.assert_allclose(f_stream, f_batch, atol=1e-5)


def test_streaming_soft_decode_matches_batch(pipeline_artifacts):
    """soft_decode: the streamed per-window mixture decode reproduces
    the batch path exactly (same logits, same mixture, same carry)."""
    art = pipeline_artifacts
    gen_b = _sampling_generator(art, temperature=0.0, soft_decode=1.0)
    f_batch, t_batch = gen_b.generate(WORDS, duration_s=4.0)
    gen_s = _sampling_generator(art, temperature=0.0, soft_decode=1.0)
    f_stream, t_stream = _stream_all(gen_s, WORDS, 4.0)
    np.testing.assert_array_equal(t_stream, t_batch)
    np.testing.assert_allclose(f_stream, f_batch, atol=1e-5)


def test_stream_step_batcher_matches_unbatched(pipeline_artifacts):
    """Continuous batching (StreamStepBatcher): concurrent sessions
    fused into one vmapped step produce the same windows as their own
    unbatched sessions; carries never mix across sessions; bucket
    padding rows are discarded; exemplar generators are rejected."""
    import threading

    from tests.test_e2e import WORDS_B

    from gesture2vec_tpu.infer.streaming import StreamStepBatcher

    art = pipeline_artifacts
    gen = _generator(art, "decode")

    # unbatched ground truth per transcript
    refs = {}
    for name, words, dur in (("a", WORDS, 4.0), ("b", WORDS_B, 4.0),
                             ("c", WORDS[:4], 4.0)):
        sess = StreamingGestureSession(gen)
        sess.push(words, now_s=0.0)
        out = sess.finish(dur)
        refs[name] = (np.concatenate([f for f, _ in out]),
                      np.concatenate([t for _, t in out]))

    batcher = StreamStepBatcher(gen, max_batch=4, window_s=0.2)
    try:
        results = {}

        def drive(name, words, dur):
            sess = StreamingGestureSession(gen, step=batcher.step)
            sess.push(words, now_s=0.0)
            out = sess.finish(dur)
            results[name] = (np.concatenate([f for f, _ in out]),
                             np.concatenate([t for _, t in out]))

        threads = [threading.Thread(target=drive, args=(n, w, d))
                   for n, w, d in (("a", WORDS, 4.0), ("b", WORDS_B, 4.0),
                                   ("c", WORDS[:4], 4.0))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert set(results) == {"a", "b", "c"}
        for name in "abc":
            np.testing.assert_array_equal(results[name][1],
                                          refs[name][1])
            np.testing.assert_allclose(results[name][0], refs[name][0],
                                       atol=1e-4)
        # with 3 concurrent sessions and a generous window at least one
        # fused batch should have formed
        assert batcher.stats["calls"] >= 6  # 3 sessions x 2 windows
    finally:
        batcher.close()

    with pytest.raises(ValueError):
        StreamStepBatcher(_generator(art, "exemplar"))


def test_stream_step_batcher_close_unblocks(pipeline_artifacts):
    """close(): a shutdown sentinel arriving mid-collection still
    executes the already-collected batch; queued-after-close items get
    a failure instead of blocking forever; step() after close raises."""
    import threading

    from gesture2vec_tpu.infer.streaming import StreamStepBatcher

    gen = _generator(pipeline_artifacts, "decode")
    batcher = StreamStepBatcher(gen, max_batch=4, window_s=30.0)
    sess = StreamingGestureSession(gen, step=batcher.step)
    sess.push(WORDS, now_s=0.0)
    out = {}

    def drive():
        # exactly one window; its step will sit in the 30 s batch
        # window until close()'s sentinel forces execution of the
        # partial batch
        out["res"] = sess.finish(sess.unit)

    t = threading.Thread(target=drive)
    t.start()
    assert batcher.collecting.wait(timeout=120), \
        "step never reached the batch window"
    batcher.close()
    t.join(timeout=60)
    assert not t.is_alive(), "caller stayed blocked through close()"
    assert "res" in out and len(out["res"]) == 1
    assert np.isfinite(out["res"][0][0]).all()

    with pytest.raises(RuntimeError):
        batcher.step(np.zeros((16,), np.int32), np.int32(1),
                     np.zeros((gen.n_steps,), np.int32),
                     np.zeros((gen.seq_model.rep_dim,), np.float32),
                     None)


# ---------------------------------------------------------------------
# Recommended-recipe streaming coverage (round-5, VERDICT r4 item 5):
# the configs/seq2seqtxt_recommended.yml shape — 4-stage residual-VQ
# Part b + stage-conditional TRANSFORMER Part d — streamed window by
# window must reproduce the batch path exactly, and the per-stage
# decode policy must keep the primary chain deterministic.
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def recipe_artifacts():
    """Init-only (untrained) 4-stage rvq + stage-conditional transformer
    chain at tiny dims: streaming contracts are about plumbing and
    carry semantics, which don't need trained weights."""
    import jax
    import jax.numpy as jnp

    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.dae_trainer import make_frame_model
    from gesture2vec_tpu.train.seq_ae_trainer import make_seq_ae
    from gesture2vec_tpu.train.text2token_trainer import make_text2token

    REP, K, S, NP, SL = 8, 12, 4, 10, 40
    seq_cfg = load_config(dict(
        name="rcp_seq", model="seq2seq", hidden_size=16, n_layers=2,
        dropout_prob=0.0, epochs=1, batch_size=8, learning_rate=1e-3,
        rep_learning_dim=REP, n_poses=NP, n_pre_poses=1,
        autoencoder_vq=True, autoencoder_vq_components=K,
        autoencoder_att=False, autoencoder_conditioned=True,
        random_seed=0, autoencoder_vq_variant="rvq", rvq_stages=S))
    seq_model = make_seq_ae(seq_cfg)
    x = jnp.zeros((2, NP, REP), jnp.float32)
    sv = seq_model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x, x,
                        train=False)
    seq_vars = {"params": sv["params"],
                "batch_stats": sv.get("batch_stats", {})}

    dae_cfg = load_config(dict(name="rcp_dae", model="DAE",
                               hidden_size=REP, epochs=1, batch_size=8,
                               learning_rate=1e-3, input_motion_dim=24,
                               random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = dae.init({"params": jax.random.PRNGKey(7)},
                        jnp.zeros((2, 24), jnp.float32))
    vocab = build_vocab("rcp", [[w[0] for w in WORDS]],
                        embedding_dim=16)
    t2t_cfg = load_config(dict(
        name="rcp_t2t", model="seq2seq", hidden_size=32, n_layers=2,
        dropout_prob=0.1, epochs=1, batch_size=8, learning_rate=1e-3,
        sentence_frame_length=SL, n_poses=NP, n_pre_poses=1,
        autoencoder_vq=True, autoencoder_vq_components=K,
        autoencoder_att=True, wordembed_dim=16, random_seed=0,
        token_stages=S, stage_conditional=True,
        extras={"t2t_arch": "transformer"}))
    t2t = make_text2token(t2t_cfg, vocab.n_words)
    tv = t2t.init({"params": jax.random.PRNGKey(2),
                   "dropout": jax.random.PRNGKey(3)},
                  jnp.zeros((2, 8), jnp.int32),
                  jnp.full((2,), 8, jnp.int32),
                  jnp.zeros((2, SL // NP), jnp.int32), train=False)
    t2t_vars = {"params": tv["params"],
                "batch_stats": tv.get("batch_stats", {})}
    return dict(dae=(dae, dae_vars), seq=(seq_model, seq_vars),
                t2t=(t2t, t2t_vars), vocab=vocab, n_poses=NP,
                sent_len=SL, codes=K)


def _recipe_generator(art, **kw):
    return GestureGenerator(
        t2t_model=art["t2t"][0], t2t_variables=art["t2t"][1],
        seq_model=art["seq"][0], seq_variables=art["seq"][1],
        dae_model=art["dae"][0], dae_variables=art["dae"][1],
        vocab=art["vocab"], pose_mean=np.zeros(24, np.float32),
        pose_std=np.ones(24, np.float32), n_frames=art["n_poses"],
        sentence_frame_length=art["sent_len"], fps=FPS, max_words=16,
        mode="decode", seed=0, **kw)


def test_streaming_recipe_matches_batch_greedy(recipe_artifacts):
    """4-stage stage-conditional transformer: streamed windows concat
    == one-shot generate(), tokens AND frames (the multi-stage token
    carry crosses push boundaries exactly like the batch path)."""
    art = recipe_artifacts
    f_batch, t_batch = _recipe_generator(art).generate(
        WORDS, duration_s=4.0)
    f_stream, t_stream = _stream_all(_recipe_generator(art), WORDS, 4.0)
    np.testing.assert_array_equal(t_stream, t_batch)
    np.testing.assert_allclose(f_stream, f_batch, atol=1e-5)


def test_streaming_recipe_stage0_policy(recipe_artifacts):
    """stage0_temperature=0 + temperature>0 on the recipe chain: the
    PRIMARY token stream is deterministic (== the fully greedy decode)
    in both batch and streamed sessions — only the residual-stage
    dispersion samples; frames stay finite."""
    art = recipe_artifacts
    _, t_greedy = _recipe_generator(art).generate(WORDS, duration_s=4.0)

    gen_b = _recipe_generator(art, temperature=1.5,
                              stage0_temperature=0.0)
    f_b, t_b = gen_b.generate(WORDS, duration_s=4.0)
    np.testing.assert_array_equal(t_b, t_greedy)
    assert np.isfinite(f_b).all()

    gen_s = _recipe_generator(art, temperature=1.5,
                              stage0_temperature=0.0)
    f_s, t_s = _stream_all(gen_s, WORDS, 4.0)
    np.testing.assert_array_equal(t_s, t_greedy)
    assert np.isfinite(f_s).all()


def test_streaming_recipe_sampled_valid(recipe_artifacts):
    """Full sampling on the recipe chain streams valid output (no
    determinism claim — streaming consumes the rng differently)."""
    art = recipe_artifacts
    gen = _recipe_generator(art, temperature=1.0)
    frames, tokens = _stream_all(gen, WORDS, 4.0)
    assert tokens.shape == (2 * (art["sent_len"] // art["n_poses"]),)
    assert tokens.min() >= 0 and tokens.max() < art["codes"]
    assert np.isfinite(frames).all()
