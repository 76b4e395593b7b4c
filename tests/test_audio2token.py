"""Audio-context Part-d path: trainer, checkpoint kind, inference.

Covers the reference's audio_context=True configuration
(ref: scripts/model/text2embedding_model.py:41,563-571 +
Helper_models.py:179-317) rebuilt as a first-class part: mel chunks ->
Audio2Token -> gesture tokens -> motion.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture2vec_tpu.train.audio2token_trainer import (make_audio2token,
                                                       train_audio2token)
from gesture2vec_tpu.train.config import load_config

S, MELS, FRAMES, CODES, N_POSES, SENT_LEN = 2, 32, 16, 8, 10, 20


def _cfg(**over):
    base = dict(name="a2t", model="seq2seq", hidden_size=16, n_layers=2,
                dropout_prob=0.1, epochs=4, batch_size=16,
                learning_rate=0.003, n_poses=N_POSES, n_pre_poses=1,
                sentence_frame_length=SENT_LEN,
                autoencoder_vq_components=CODES, autoencoder_att=True,
                random_seed=0)
    base.update(over)
    return load_config(base)


def _synthetic_audio_data(rng, n=64):
    """Mel windows whose per-chunk mean level determines the token, so
    the mapping is learnable."""
    tokens = rng.integers(0, CODES, size=(n, SENT_LEN // N_POSES))
    mel = rng.normal(scale=0.1,
                     size=(n, S, MELS, FRAMES)).astype(np.float32)
    for i in range(n):
        for s in range(S):
            mel[i, s] += tokens[i, min(s, tokens.shape[1] - 1)] / CODES
    return {"mel": mel, "tokens": tokens.astype(np.int32)}


def test_audio2token_trains(rng, tmp_path):
    data = _synthetic_audio_data(rng)
    cfg = _cfg()
    state, hist = train_audio2token(cfg, data,
                                    {k: v[:16] for k, v in data.items()},
                                    save_dir=str(tmp_path), save_every=100)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    ckpt = os.path.join(str(tmp_path), "a2t_checkpoint_004.bin")
    assert os.path.exists(ckpt)

    # checkpoint kind roundtrip: the audio2token registry builder
    from gesture2vec_tpu.train import checkpoints
    model, variables, payload = checkpoints.load_checkpoint_and_model(
        ckpt, "audio2token")
    res = model.apply(variables, jnp.asarray(data["mel"][:4]),
                      jnp.asarray(data["tokens"][:4]), train=False)
    assert res["logits"].shape == (4, SENT_LEN // N_POSES, CODES)


def test_audio2token_both_fusion_trains(rng, tmp_path):
    """The text+audio fusion variant (audio_fusion='both', ref
    Helper_models.py both=True - repaired): raw-wave chunks + word ids
    -> tokens. Tokens are a function of both the chunk amplitude and a
    marker word, so only the fused encoder can fit the mapping; loss
    must fall and the checkpoint kind must round-trip."""
    n, t_words, s_chunks, samples, n_words = 48, 6, 2, 1200, 20
    tokens = rng.integers(0, CODES, size=(n, SENT_LEN // N_POSES))
    wav = rng.normal(scale=0.05,
                     size=(n, s_chunks, samples)).astype(np.float32)
    word_ids = rng.integers(4, n_words, size=(n, t_words)) \
        .astype(np.int32)
    for i in range(n):
        wav[i] += tokens[i, 0] / CODES          # amplitude carries token 0
        word_ids[i, 0] = 4 + tokens[i, -1] % (n_words - 4)  # word marks last
    data = {"word_ids": word_ids, "wav": wav,
            "tokens": tokens.astype(np.int32)}
    cfg = _cfg(audio_fusion="both", epochs=5, wordembed_dim=16)
    state, hist = train_audio2token(cfg, data,
                                    {k: v[:16] for k, v in data.items()},
                                    save_dir=str(tmp_path),
                                    save_every=100, n_words=n_words)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]

    from gesture2vec_tpu.train import checkpoints
    ckpt = os.path.join(str(tmp_path), "a2t_checkpoint_005.bin")
    model, variables, _ = checkpoints.load_checkpoint_and_model(
        ckpt, "audio2token")
    assert model.fusion == "both" and model.n_words == n_words
    res = model.apply(variables,
                      (jnp.asarray(word_ids[:4]), jnp.asarray(wav[:4])),
                      jnp.asarray(data["tokens"][:4]), train=False)
    assert res["logits"].shape == (4, SENT_LEN // N_POSES, CODES)


def test_audio2token_mesh_matches_single_device(rng):
    """config.mesh_shape in the audio trainer: dp-sharded run matches
    single-device losses."""
    data = _synthetic_audio_data(rng, n=32)
    val = {k: v[:16] for k, v in data.items()}
    _, h1 = train_audio2token(_cfg(epochs=2), data, val)
    _, h2 = train_audio2token(_cfg(epochs=2, mesh_shape={"dp": 8}),
                              data, val)
    np.testing.assert_allclose(h1["train_loss"], h2["train_loss"],
                               rtol=1e-4)


def test_audio_generator_end_to_end(rng):
    """Waveform -> mel windows -> tokens -> Part-b decode -> DAE decode:
    the full audio-context generation produces motion of the right
    length with in-range tokens."""
    from gesture2vec_tpu.infer.audio2gesture import AudioGestureGenerator
    from gesture2vec_tpu.train.dae_trainer import (init_state as dae_init,
                                                   make_frame_model)
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state as sq_init,
                                                      make_seq_ae)

    rep, fps = 12, 10
    a2t_cfg = _cfg(hidden_size=16)
    a2t = make_audio2token(a2t_cfg)
    key = jax.random.PRNGKey(0)
    # window_seconds = SENT_LEN / fps = 2 -> S=2 mel chunks per window
    mel0 = jnp.zeros((2, SENT_LEN // fps, 128, 31), jnp.float32)
    tgt0 = jnp.zeros((2, SENT_LEN // N_POSES), jnp.int32)
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
                              rep_learning_dim=rep, n_poses=N_POSES,
                              n_pre_poses=1, autoencoder_vq=True,
                              autoencoder_vq_components=CODES,
                              autoencoder_att=False,
                              autoencoder_conditioned=True, random_seed=0))
    seq = make_seq_ae(sq_cfg)
    sq_state = sq_init(sq_cfg, seq, jax.random.fold_in(key, 3),
                       make_optimizer(1e-3))

    gen = AudioGestureGenerator(
        a2t_model=a2t, a2t_variables=a2t_vars,
        seq_model=seq,
        seq_variables={"params": sq_state.params,
                       "batch_stats": sq_state.batch_stats},
        dae_model=dae, dae_variables={"params": dae_state.params},
        pose_mean=np.zeros(30, np.float32),
        pose_std=np.ones(30, np.float32),
        n_frames=N_POSES, sentence_frame_length=SENT_LEN, fps=fps,
        audio_sr=16000, mode="decode")

    audio = rng.normal(scale=0.1, size=(16000 * 4,)).astype(np.float32)
    frames, tokens = gen.generate(audio)
    n_windows = 2  # 4 s / 2 s per window
    assert tokens.shape == (n_windows * SENT_LEN // N_POSES,)
    assert frames.shape == (n_windows * SENT_LEN, 30)
    assert np.isfinite(frames).all()
    assert (tokens >= 0).all() and (tokens < CODES).all()


def test_audio_generator_both_fusion_end_to_end(rng):
    """Fusion (text+audio) generation: transcript words + waveform ->
    (word_ids, 1-second raw chunks) per window -> tokens -> motion.
    Covers the inference side of the repaired both=True branch
    (ref: Helper_models.py:246-253)."""
    from gesture2vec_tpu.infer.audio2gesture import AudioGestureGenerator
    from gesture2vec_tpu.train.dae_trainer import (init_state as dae_init,
                                                   make_frame_model)
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state as sq_init,
                                                      make_seq_ae)

    class _Vocab:
        def words_to_ids(self, words, add_sos_eos=True):
            ids = [4 + (len(w) % 5) for w in words]
            return [1] + ids + [2] if add_sos_eos else ids

    rep, fps, n_words = 12, 10, 16
    a2t_cfg = _cfg(hidden_size=16, audio_fusion="both", wordembed_dim=8)
    a2t = make_audio2token(a2t_cfg, n_words=n_words)
    key = jax.random.PRNGKey(0)
    # window_seconds = SENT_LEN / fps = 2 -> 2 raw 1 s chunks per window
    enc0 = (jnp.zeros((2, 8), jnp.int32),
            jnp.zeros((2, SENT_LEN // fps, 16000), jnp.float32))
    tgt0 = jnp.zeros((2, SENT_LEN // N_POSES), jnp.int32)
    a2t_vars = a2t.init({"params": key,
                         "dropout": jax.random.fold_in(key, 1)},
                        enc0, tgt0, train=False)
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
                              rep_learning_dim=rep, n_poses=N_POSES,
                              n_pre_poses=1, autoencoder_vq=True,
                              autoencoder_vq_components=CODES,
                              autoencoder_att=False,
                              autoencoder_conditioned=True, random_seed=0))
    seq = make_seq_ae(sq_cfg)
    sq_state = sq_init(sq_cfg, seq, jax.random.fold_in(key, 3),
                       make_optimizer(1e-3))

    gen = AudioGestureGenerator(
        a2t_model=a2t, a2t_variables=a2t_vars,
        seq_model=seq,
        seq_variables={"params": sq_state.params,
                       "batch_stats": sq_state.batch_stats},
        dae_model=dae, dae_variables={"params": dae_state.params},
        pose_mean=np.zeros(30, np.float32),
        pose_std=np.ones(30, np.float32),
        n_frames=N_POSES, sentence_frame_length=SENT_LEN, fps=fps,
        audio_sr=16000, mode="decode", vocab=_Vocab(), max_words=8)
    assert gen.fusion == "both"

    audio = rng.normal(scale=0.1, size=(16000 * 4,)).astype(np.float32)
    words = [["hello", 0.2, 0.8], ["there", 1.0, 1.9],
             ["friend", 2.2, 3.6]]
    frames, tokens = gen.generate(audio, words=words)
    n_windows = 2  # 4 s / 2 s per window
    assert tokens.shape == (n_windows * SENT_LEN // N_POSES,)
    assert frames.shape == (n_windows * SENT_LEN, 30)
    assert np.isfinite(frames).all()
    assert (tokens >= 0).all() and (tokens < CODES).all()

    # words are required in fusion mode
    with pytest.raises(ValueError):
        gen.generate(audio)


def test_audio2token_bf16_trains(rng):
    """compute_dtype=bfloat16 for the audio variant: encoder GRU +
    decoder in bf16, logits/params fp32, loss falls."""
    data = _synthetic_audio_data(rng, n=32)
    cfg = _cfg(epochs=3, compute_dtype="bfloat16")
    state, hist = train_audio2token(cfg, data,
                                    {k: v[:16] for k, v in data.items()})
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state.params))


def test_audio_multistage_trains_and_generates(rng):
    """token_stages=2 over an rvq tokenizer, audio chain: stage-CE
    training through the shared loop, then decode-mode generation from
    the stage-sum hidden (infer/audio2gesture multi path)."""
    from gesture2vec_tpu.infer.audio2gesture import AudioGestureGenerator
    from gesture2vec_tpu.train.dae_trainer import (init_state as dae_init,
                                                   make_frame_model)
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state as sq_init,
                                                      make_seq_ae)

    data = _synthetic_audio_data(rng, n=32)
    t1 = (data["tokens"] + 3) % CODES
    data["stage_tokens"] = np.stack([data["tokens"], t1],
                                    axis=-1).astype(np.int32)
    val = {k: v[:16] for k, v in data.items()}
    cfg = _cfg(epochs=2, token_stages=2)
    state, hist = train_audio2token(cfg, data, val)
    assert np.isfinite(hist["train_loss"]).all()
    assert "out_layer_r1" in state.params["decoder_step"]

    rep, fps = 12, 10
    a2t = make_audio2token(cfg.replace(hidden_size=16))
    key = jax.random.PRNGKey(0)
    mel0 = jnp.zeros((2, SENT_LEN // fps, 128, 31), jnp.float32)
    tgt0 = jnp.zeros((2, SENT_LEN // N_POSES), jnp.int32)
    a2t_vars = a2t.init({"params": key,
                         "dropout": jax.random.fold_in(key, 1)},
                        mel0, tgt0, train=False)
    a2t_vars = {"params": a2t_vars["params"],
                "batch_stats": a2t_vars.get("batch_stats", {})}

    dae_cfg = load_config(dict(name="d2", model="DAE", hidden_size=rep,
                               input_motion_dim=30, epochs=1,
                               batch_size=4, random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_state = dae_init(dae_cfg, dae, jax.random.fold_in(key, 2),
                         make_optimizer(1e-3))
    sq_cfg = load_config(dict(name="s2", model="seq2seq", hidden_size=16,
                              n_layers=2, dropout_prob=0.0, epochs=1,
                              batch_size=4, learning_rate=1e-3,
                              rep_learning_dim=rep, n_poses=N_POSES,
                              n_pre_poses=1, autoencoder_vq=True,
                              autoencoder_vq_components=CODES,
                              autoencoder_att=False,
                              autoencoder_conditioned=True,
                              autoencoder_vq_variant="rvq", rvq_stages=2,
                              random_seed=0))
    seq = make_seq_ae(sq_cfg)
    sq_state = sq_init(sq_cfg, seq, jax.random.fold_in(key, 3),
                       make_optimizer(1e-3))

    gen = AudioGestureGenerator(
        a2t_model=a2t, a2t_variables=a2t_vars, seq_model=seq,
        seq_variables={"params": sq_state.params,
                       "batch_stats": sq_state.batch_stats},
        dae_model=dae, dae_variables={"params": dae_state.params},
        pose_mean=np.zeros(30, np.float32),
        pose_std=np.ones(30, np.float32),
        n_frames=N_POSES, sentence_frame_length=SENT_LEN, fps=fps,
        audio_sr=16000, mode="decode")
    audio = rng.normal(scale=0.1, size=(16000 * 4,)).astype(np.float32)
    frames, tokens = gen.generate(audio)
    assert tokens.shape == (2 * SENT_LEN // N_POSES,)
    assert frames.shape == (2 * SENT_LEN, 30)
    assert np.isfinite(frames).all()


def test_audio2token_sampled_decode(rng):
    """The audio decoder shares the sampling contract: greedy tokens ==
    argmax(logits); temperature>0 is key-deterministic and in-range."""
    from gesture2vec_tpu.models.audio2token import Audio2Token

    m = Audio2Token(n_tokens=12, hidden_size=16, n_layers=2, n_steps=4,
                    n_pre_poses=1)
    key = jax.random.PRNGKey(0)
    mel = jnp.asarray(rng.normal(size=(2, 2, 16, 8)).astype(np.float32))
    tgt = jnp.zeros((2, 4), jnp.int32)
    vs = m.init({"params": key, "dropout": key, "sample": key}, mel, tgt,
                train=False)
    r0 = m.apply(vs, mel, tgt, train=False)
    np.testing.assert_array_equal(
        np.asarray(r0["tokens"]),
        np.argmax(np.asarray(r0["logits"]), -1))
    k1 = jax.random.PRNGKey(7)
    r1 = m.apply(vs, mel, tgt, train=False, temperature=1.5,
                 rngs={"sample": k1})
    r1b = m.apply(vs, mel, tgt, train=False, temperature=1.5,
                  rngs={"sample": k1})
    t1 = np.asarray(r1["tokens"])
    np.testing.assert_array_equal(t1, np.asarray(r1b["tokens"]))
    assert t1.min() >= 0 and t1.max() < 12


def test_audio2token_beam_decode(rng):
    """Audio decoder beam search: K=1 == greedy; K=3 valid and
    deterministic."""
    from gesture2vec_tpu.models.audio2token import Audio2Token

    m = Audio2Token(n_tokens=12, hidden_size=16, n_layers=2, n_steps=4,
                    n_pre_poses=1)
    key = jax.random.PRNGKey(0)
    mel = jnp.asarray(rng.normal(size=(2, 2, 16, 8)).astype(np.float32))
    tgt = jnp.zeros((2, 4), jnp.int32)
    vs = m.init({"params": key, "dropout": key}, mel, tgt, train=False)
    eo, dh = m.apply(vs, mel, method=m.encode_audio)
    greedy = m.apply(vs, eo, dh, tgt, method=m.decode_tokens)
    b1 = m.apply(vs, eo, dh, tgt, beam_width=1, method=m.beam_decode)
    np.testing.assert_array_equal(np.asarray(b1["tokens"]),
                                  np.asarray(greedy["tokens"]))
    b3 = m.apply(vs, eo, dh, tgt, beam_width=3, method=m.beam_decode)
    t3 = np.asarray(b3["tokens"])
    assert t3.shape == (2, 4) and t3.min() >= 0 and t3.max() < 12
    assert (np.asarray(b3["logprob"])
            >= np.asarray(b1["logprob"]) - 1e-5).all()
