"""Multi-stage residual-VQ token chain (beyond the reference).

A vq_variant="rvq" Part-b tokenizer plus a token_stages>1 Part d lets
decode-mode inference rebuild the FULL quantized hidden (sum of stage
codebook rows) instead of stage 0 only — the framework's answer to the
token-bottleneck FGD ceiling quantified in QUALITY.md /
benchmarks/quality_vq_ablation.py. These tests pin the chain: stage
token round trip, the multi-head Part d training path, checkpoint
round trip, and decode-mode generation end to end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.seq_ae_trainer import make_seq_ae
from gesture2vec_tpu.train.text2token_trainer import (make_text2token,
                                                      train_text2token)

N_WORDS, K, N_STEPS, MAXW = 40, 12, 6, 10
REP, HID = 8, 16


def _seq_cfg(**kw):
    base = dict(name="rvq_seq", model="seq2seq", hidden_size=HID,
                n_layers=2, dropout_prob=0.0, epochs=1, batch_size=8,
                learning_rate=1e-3, rep_learning_dim=REP, n_poses=10,
                n_pre_poses=1, autoencoder_vq=True,
                autoencoder_vq_components=K, autoencoder_att=False,
                autoencoder_conditioned=True, random_seed=0,
                autoencoder_vq_variant="rvq", rvq_stages=2)
    base.update(kw)
    return load_config(base)


def _t2t_cfg(**kw):
    base = dict(name="rvq_t2t", model="seq2seq", hidden_size=24,
                n_layers=2, dropout_prob=0.1, epochs=8, batch_size=16,
                learning_rate=0.003, sentence_frame_length=60,
                n_poses=10, n_pre_poses=2, autoencoder_vq=True,
                autoencoder_vq_components=K, autoencoder_att=True,
                wordembed_dim=16, random_seed=0, token_stages=2)
    base.update(kw)
    return load_config(base)


def _init_seq(rng_key=0):
    cfg = _seq_cfg()
    model = make_seq_ae(cfg)
    x = jnp.zeros((2, cfg.n_poses, REP), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(rng_key),
                            "dropout": jax.random.PRNGKey(rng_key + 1)},
                           x, x, train=False)
    return model, {"params": variables["params"],
                   "batch_stats": variables.get("batch_stats", {})}


def test_stage_token_roundtrip(rng):
    """embed_stage_tokens(stage_tokens(h)) reproduces the rvq quantized
    hidden exactly, and column 0 is THE pipeline token."""
    model, variables = _init_seq()
    x = jnp.asarray(rng.normal(size=(5, 10, REP)).astype(np.float32))
    _, dec_hidden = model.apply(variables, x, method=model.encode)

    stage = model.apply(variables, dec_hidden, method=model.stage_tokens)
    assert stage.shape == (5, 2)
    t0 = model.apply(variables, dec_hidden,
                     method=model.tokens_from_hidden)
    np.testing.assert_array_equal(np.asarray(stage[:, 0]),
                                  np.asarray(t0))

    hid = model.apply(variables, stage,
                      method=model.hidden_from_stage_tokens)
    assert hid.shape == dec_hidden.shape
    # the rvq straight-through value at eval IS the stage sum
    vq_out, q_hidden = model.apply(variables, dec_hidden,
                                   method=model.quantize)
    np.testing.assert_allclose(np.asarray(hid), np.asarray(q_hidden),
                               rtol=1e-5, atol=1e-6)


def _dataset(rng, n=128):
    """Learnable mapping for both stages: stage tokens derive from the
    word ids with different offsets per stage."""
    lengths = rng.integers(3, MAXW, size=n).astype(np.int32)
    word_ids = np.zeros((n, MAXW), np.int32)
    for i, L in enumerate(lengths):
        word_ids[i, :L] = rng.integers(4, N_WORDS, size=L)
    key = word_ids.sum(axis=1) % K
    t0 = ((key[:, None] + np.arange(N_STEPS)[None, :]) % K)
    t1 = ((key[:, None] + 2 * np.arange(N_STEPS)[None, :] + 3) % K)
    return {"word_ids": word_ids, "lengths": lengths,
            "tokens": t0.astype(np.int32),
            "stage_tokens": np.stack([t0, t1], axis=-1).astype(np.int32)}


def test_multi_stage_t2t_forward_and_training(rng, tmp_path):
    cfg = _t2t_cfg()
    data = _dataset(rng, n=128)
    val = {k: v[:16] for k, v in data.items()}

    model = make_text2token(cfg, N_WORDS)
    assert model.token_stages == 2
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.asarray(data["word_ids"][:4]),
                           jnp.asarray(data["lengths"][:4]),
                           jnp.asarray(data["tokens"][:4]), train=False)
    res = model.apply(variables, jnp.asarray(data["word_ids"][:4]),
                      jnp.asarray(data["lengths"][:4]),
                      jnp.asarray(data["tokens"][:4]), train=False)
    assert res["logits"].shape == (4, N_STEPS, K)
    assert res["stage_logits"].shape == (4, N_STEPS - 1, 1, K)

    state, hist = train_text2token(cfg, data, val, N_WORDS,
                                   save_dir=str(tmp_path), save_every=8)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    # the residual head exists and received gradient
    assert "out_layer_r1" in state.params["decoder_step"]

    # checkpoint round trip rebuilds the multi-head model
    from gesture2vec_tpu.train import checkpoints
    ckpt = checkpoints.checkpoint_filename(str(tmp_path), cfg.name, 8)
    m2, v2, _ = checkpoints.load_checkpoint_and_model(ckpt,
                                                      "text2embedding")
    assert m2.token_stages == 2
    r2 = m2.apply(v2, jnp.asarray(data["word_ids"][:2]),
                  jnp.asarray(data["lengths"][:2]),
                  jnp.asarray(data["tokens"][:2]), train=False)
    assert r2["stage_logits"].shape == (2, N_STEPS - 1, 1, K)


def test_multi_stage_decode_mode_generates(rng):
    """GestureGenerator decode mode with a token_stages=2 Part d over an
    rvq tokenizer: the fused program predicts stage tokens and decodes
    from the stage-sum hidden (seed steps fall back to stage 0 only)."""
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train.dae_trainer import make_frame_model

    seq_model, seq_vars = _init_seq()

    dae_cfg = load_config(dict(name="rvq_dae", model="DAE",
                               hidden_size=REP, epochs=1, batch_size=8,
                               learning_rate=1e-3, input_motion_dim=24,
                               random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = dae.init({"params": jax.random.PRNGKey(7)},
                        jnp.zeros((2, 24), jnp.float32))

    vocab = build_vocab("rvq", [["hello", "world", "test"]],
                        embedding_dim=16)
    t2t_cfg = _t2t_cfg(wordembed_dim=16)
    t2t = make_text2token(t2t_cfg, vocab.n_words)
    t2t_vars = t2t.init({"params": jax.random.PRNGKey(2),
                         "dropout": jax.random.PRNGKey(3)},
                        jnp.zeros((2, 8), jnp.int32),
                        jnp.full((2,), 8, jnp.int32),
                        jnp.zeros((2, N_STEPS), jnp.int32), train=False)
    t2t_vars = {"params": t2t_vars["params"],
                "batch_stats": t2t_vars.get("batch_stats", {})}

    for carry in (True, False):
        gen = GestureGenerator(
            t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq_model,
            seq_variables=seq_vars, dae_model=dae, dae_variables=dae_vars,
            vocab=vocab, pose_mean=np.zeros(24, np.float32),
            pose_std=np.ones(24, np.float32), n_frames=10,
            sentence_frame_length=60, fps=20, max_words=8, mode="decode",
            window_carry=carry, seed=0)
        frames, tokens = gen.generate(
            [["hello", 0.1, 0.5], ["world", 1.0, 1.6],
             ["test", 2.0, 2.8]], duration_s=6.0)
        n_tok = 2 * N_STEPS     # 6 s / 3 s windows
        assert tokens.shape == (n_tok,)
        assert frames.shape == (n_tok * 10, 24)
        assert np.isfinite(frames).all()

    # batched serving path
    outs = gen.generate_batch(
        [[["hello", 0.1, 0.5]], [["world", 0.2, 0.9]]], 3.0)
    assert len(outs) == 2
    for fr, tk in outs:
        assert tk.shape == (N_STEPS,)
        assert np.isfinite(fr).all()


def test_multi_stage_decode_policies(rng):
    """Sampling and beam search both drive the multi-stage chain:
    stage tokens follow the chosen policy end to end; beam_width=1
    reproduces the greedy generation exactly."""
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train.dae_trainer import make_frame_model

    seq_model, seq_vars = _init_seq()
    dae_cfg = load_config(dict(name="rvq_dae2", model="DAE",
                               hidden_size=REP, epochs=1, batch_size=8,
                               learning_rate=1e-3, input_motion_dim=24,
                               random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = dae.init({"params": jax.random.PRNGKey(7)},
                        jnp.zeros((2, 24), jnp.float32))
    vocab = build_vocab("rvq2", [["hello", "world", "test"]],
                        embedding_dim=16)
    t2t_cfg = _t2t_cfg(wordembed_dim=16)
    t2t = make_text2token(t2t_cfg, vocab.n_words)
    t2t_vars = t2t.init({"params": jax.random.PRNGKey(2),
                         "dropout": jax.random.PRNGKey(3)},
                        jnp.zeros((2, 8), jnp.int32),
                        jnp.full((2,), 8, jnp.int32),
                        jnp.zeros((2, N_STEPS), jnp.int32), train=False)
    t2t_vars = {"params": t2t_vars["params"],
                "batch_stats": t2t_vars.get("batch_stats", {})}

    def mk(**kw):
        return GestureGenerator(
            t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq_model,
            seq_variables=seq_vars, dae_model=dae,
            dae_variables=dae_vars, vocab=vocab,
            pose_mean=np.zeros(24, np.float32),
            pose_std=np.ones(24, np.float32), n_frames=10,
            sentence_frame_length=60, fps=20, max_words=8,
            mode="decode", seed=0, **kw)

    words = [["hello", 0.1, 0.5], ["world", 1.0, 1.6],
             ["test", 2.0, 2.8]]
    f_greedy, t_greedy = mk().generate(words, duration_s=6.0)

    f_b1, t_b1 = mk(beam_width=1).generate(words, duration_s=6.0)
    np.testing.assert_array_equal(t_b1, t_greedy)
    np.testing.assert_allclose(f_b1, f_greedy, atol=1e-6)

    f_b3, t_b3 = mk(beam_width=3).generate(words, duration_s=6.0)
    assert t_b3.shape == t_greedy.shape
    assert np.isfinite(f_b3).all()

    f_s, t_s = mk(temperature=1.5).generate(words, duration_s=6.0)
    assert t_s.shape == t_greedy.shape
    assert np.isfinite(f_s).all()

    with pytest.raises(ValueError):
        mk(beam_width=3, temperature=1.0)


def test_multi_stage_soft_decode(rng):
    """soft_decode on the multi-stage chain: stage-0 AND residual-stage
    hiddens become per-head softmax mixtures; tokens match greedy; a
    near-argmax mixture temperature reproduces the hard decode."""
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train.dae_trainer import make_frame_model

    seq_model, seq_vars = _init_seq()
    dae_cfg = load_config(dict(name="rvq_dae3", model="DAE",
                               hidden_size=REP, epochs=1, batch_size=8,
                               learning_rate=1e-3, input_motion_dim=24,
                               random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = dae.init({"params": jax.random.PRNGKey(7)},
                        jnp.zeros((2, 24), jnp.float32))
    vocab = build_vocab("rvq3", [["hello", "world", "test"]],
                        embedding_dim=16)
    t2t_cfg = _t2t_cfg(wordembed_dim=16)
    t2t = make_text2token(t2t_cfg, vocab.n_words)
    t2t_vars = t2t.init({"params": jax.random.PRNGKey(2),
                         "dropout": jax.random.PRNGKey(3)},
                        jnp.zeros((2, 8), jnp.int32),
                        jnp.full((2,), 8, jnp.int32),
                        jnp.zeros((2, N_STEPS), jnp.int32), train=False)
    t2t_vars = {"params": t2t_vars["params"],
                "batch_stats": t2t_vars.get("batch_stats", {})}

    def mk(**kw):
        return GestureGenerator(
            t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq_model,
            seq_variables=seq_vars, dae_model=dae,
            dae_variables=dae_vars, vocab=vocab,
            pose_mean=np.zeros(24, np.float32),
            pose_std=np.ones(24, np.float32), n_frames=10,
            sentence_frame_length=60, fps=20, max_words=8,
            mode="decode", seed=0, **kw)

    words = [["hello", 0.1, 0.5], ["world", 1.0, 1.6],
             ["test", 2.0, 2.8]]
    f0, t0 = mk().generate(words, duration_s=6.0)

    fe, te = mk(soft_decode=1e-4).generate(words, duration_s=6.0)
    np.testing.assert_array_equal(te, t0)
    np.testing.assert_allclose(fe, f0, atol=1e-3)

    f1, t1 = mk(soft_decode=1.0).generate(words, duration_s=6.0)
    np.testing.assert_array_equal(t1, t0)
    assert np.isfinite(f1).all()
    assert not np.allclose(f1, f0, atol=1e-3)
