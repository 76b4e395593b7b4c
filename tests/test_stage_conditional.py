"""Stage-conditional residual-stage heads (config.stage_conditional,
beyond the reference — the reference has no multi-stage tokens).

Round-3 finding being addressed: independent summed-CE stage heads must
marginalize over the earlier stages' choices (4-stage val CE 21.6 vs
the 2-stage run's 8.3, QUALITY.md), while the residual-VQ code
structure is conditional by construction (stage s+1 quantizes the
residual GIVEN stages <= s). stage_chain (models/text2token) chains the
heads through code embeddings: teacher-forced at train, fed its own
choices at decode. These tests pin the chain for both Part-d archs:
shapes/contract, the learnability separation that motivates it,
trainer + checkpoint round trip, and decode-mode generation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.text2token_trainer import (make_text2token,
                                                      train_text2token)

N_WORDS, K, N_STEPS, MAXW = 40, 16, 6, 10


def _cfg(**kw):
    base = dict(name="cond_t2t", model="seq2seq", hidden_size=24,
                n_layers=2, dropout_prob=0.1, epochs=8, batch_size=16,
                learning_rate=0.003, sentence_frame_length=60,
                n_poses=10, n_pre_poses=2, autoencoder_vq=True,
                autoencoder_vq_components=K, autoencoder_att=True,
                wordembed_dim=16, random_seed=0, token_stages=2,
                stage_conditional=True)
    base.update(kw)
    return load_config(base)


def _dataset(rng, n=128, informative_text=True):
    """When informative_text=False the words say NOTHING about the
    tokens (constant text, random primary): stage 1 = f(stage 0) is
    then learnable ONLY through the conditional chain — an independent
    head sees a marginally-uniform target."""
    lengths = np.full(n, 4, np.int32)
    word_ids = np.zeros((n, MAXW), np.int32)
    if informative_text:
        lengths = rng.integers(3, MAXW, size=n).astype(np.int32)
        for i, L in enumerate(lengths):
            word_ids[i, :L] = rng.integers(4, N_WORDS, size=L)
        key = word_ids.sum(axis=1) % K
        t0 = ((key[:, None] + np.arange(N_STEPS)[None, :]) % K)
    else:
        word_ids[:, :4] = 5
        t0 = rng.integers(0, K, size=(n, N_STEPS))
    t1 = (t0 * 7 + 3) % K           # deterministic given stage 0
    return {"word_ids": word_ids.astype(np.int32), "lengths": lengths,
            "tokens": t0.astype(np.int32),
            "stage_tokens": np.stack([t0, t1], axis=-1).astype(np.int32)}


@pytest.mark.parametrize("arch", ["gru", "transformer"])
def test_forward_contract_and_errors(rng, arch):
    cfg = _cfg(t2t_arch=arch) if arch == "transformer" else _cfg()
    d = _dataset(rng, n=8)
    model = make_text2token(cfg, N_WORDS)
    assert model.stage_conditional
    w = jnp.asarray(d["word_ids"][:4])
    ln = jnp.asarray(d["lengths"][:4])
    tg = jnp.asarray(d["tokens"][:4])
    st = jnp.asarray(d["stage_tokens"][:4])
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           w, ln, tg, train=False)
    # eval: self-chained, same res contract as the independent heads
    res = model.apply(variables, w, ln, tg, train=False)
    assert res["logits"].shape == (4, N_STEPS, K)
    assert res["stage_logits"].shape == (4, N_STEPS - 1, 1, K)
    assert res["stage_tokens"].shape == (4, N_STEPS - 1, 1)
    # train: teacher-forced chain needs stage_targets
    res_t, _ = model.apply(variables, w, ln, tg, train=True,
                           stage_targets=st,
                           rngs={"dropout": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
    assert res_t["stage_logits"].shape == (4, N_STEPS - 1, 1, K)
    with pytest.raises(ValueError, match="stage_targets"):
        model.apply(variables, w, ln, tg, train=True,
                    rngs={"dropout": jax.random.PRNGKey(2)},
                    mutable=["batch_stats"])
    # the chain's embedding tables exist
    params = variables["params"]
    dec = params["decoder_step"] if arch == "gru" else params["decoder"]
    assert "stage_embed_0" in dec and "out_layer_r1" in dec


@pytest.mark.parametrize("arch", ["gru", "transformer"])
def test_conditional_beats_independent_when_stage_needs_stage0(rng, arch):
    """The motivating separation: with uninformative text and a random
    primary, stage 1 = f(stage 0) is pure noise to an independent head
    (target marginal uniform over K) but a deterministic lookup for the
    conditional chain. Total train loss = primary CE (~ln K for both,
    unlearnable) + stage CE (-> ~0 conditional, ~ln K independent)."""
    kw = {"t2t_arch": arch} if arch == "transformer" else {}
    data = _dataset(rng, n=256, informative_text=False)
    val = {k: v[:32] for k, v in data.items()}
    _, hist_c = train_text2token(_cfg(epochs=12, **kw), data, val,
                                 N_WORDS)
    _, hist_i = train_text2token(
        _cfg(epochs=12, stage_conditional=False, **kw), data, val,
        N_WORDS)
    # stage CE gap: >= 1.5 nats of the ln(16) = 2.77 max
    assert hist_c["train_loss"][-1] < hist_i["train_loss"][-1] - 1.5, (
        hist_c["train_loss"][-1], hist_i["train_loss"][-1])


def test_trainer_and_checkpoint_roundtrip(rng, tmp_path):
    cfg = _cfg()
    data = _dataset(rng, n=128)
    val = {k: v[:16] for k, v in data.items()}
    state, hist = train_text2token(cfg, data, val, N_WORDS,
                                   save_dir=str(tmp_path), save_every=8)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    from gesture2vec_tpu.train import checkpoints
    ckpt = checkpoints.checkpoint_filename(str(tmp_path), cfg.name, 8)
    m2, v2, _ = checkpoints.load_checkpoint_and_model(ckpt,
                                                      "text2embedding")
    assert m2.stage_conditional and m2.token_stages == 2
    r2 = m2.apply(v2, jnp.asarray(data["word_ids"][:2]),
                  jnp.asarray(data["lengths"][:2]),
                  jnp.asarray(data["tokens"][:2]), train=False)
    assert r2["stage_logits"].shape == (2, N_STEPS - 1, 1, K)


def test_transformer_parallel_train_primary_matches_rollout(rng):
    """The conditional chain must not disturb the primary path: with
    dropout 0 and full teacher forcing, the transformer's parallel
    teacher-forced pass still reproduces the rollout's primary logits
    (the chain only ADDS stage heads after the decoder state)."""
    from gesture2vec_tpu.models.transformer import TransformerText2Token
    d = _dataset(rng, n=4)
    model = TransformerText2Token(
        n_words=N_WORDS, n_tokens=K, hidden_size=24, n_layers=2,
        n_steps=N_STEPS, n_pre_poses=N_STEPS, dropout=0.0,
        word_embed_size=16, token_stages=2, stage_conditional=True)
    w = jnp.asarray(d["word_ids"][:4])
    ln = jnp.asarray(d["lengths"][:4])
    tg = jnp.asarray(d["tokens"][:4])
    st = jnp.asarray(d["stage_tokens"][:4])
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           w, ln, tg, train=False)
    serial = model.apply(variables, w, ln, tg, train=False)
    parallel = model.apply(variables, w, ln, tg, train=True,
                           stage_targets=st,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(serial["logits"][:, 1:]),
                               np.asarray(parallel["logits"][:, 1:]),
                               rtol=1e-5, atol=1e-5)


def test_decode_mode_generates_and_policies(rng):
    """GestureGenerator decode mode over an rvq tokenizer with a
    conditional Part d: greedy, sampled, beam, and batched serving all
    produce finite motion with the right shapes; beam_width=1 matches
    greedy exactly (the chain conditions on argmax in both)."""
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train.dae_trainer import make_frame_model
    from gesture2vec_tpu.train.seq_ae_trainer import make_seq_ae

    REP = 8
    seq_cfg = load_config(dict(
        name="cond_seq", model="seq2seq", hidden_size=16, n_layers=2,
        dropout_prob=0.0, epochs=1, batch_size=8, learning_rate=1e-3,
        rep_learning_dim=REP, n_poses=10, n_pre_poses=1,
        autoencoder_vq=True, autoencoder_vq_components=K,
        autoencoder_att=False, autoencoder_conditioned=True,
        random_seed=0, autoencoder_vq_variant="rvq", rvq_stages=2))
    seq_model = make_seq_ae(seq_cfg)
    x = jnp.zeros((2, 10, REP), jnp.float32)
    sv = seq_model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, x, x,
                        train=False)
    seq_vars = {"params": sv["params"],
                "batch_stats": sv.get("batch_stats", {})}

    dae_cfg = load_config(dict(name="cond_dae", model="DAE",
                               hidden_size=REP, epochs=1, batch_size=8,
                               learning_rate=1e-3, input_motion_dim=24,
                               random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = dae.init({"params": jax.random.PRNGKey(7)},
                        jnp.zeros((2, 24), jnp.float32))
    vocab = build_vocab("cond", [["hello", "world", "test"]],
                        embedding_dim=16)
    t2t = make_text2token(_cfg(), vocab.n_words)
    tv = t2t.init({"params": jax.random.PRNGKey(2),
                   "dropout": jax.random.PRNGKey(3)},
                  jnp.zeros((2, 8), jnp.int32),
                  jnp.full((2,), 8, jnp.int32),
                  jnp.zeros((2, N_STEPS), jnp.int32), train=False)
    t2t_vars = {"params": tv["params"],
                "batch_stats": tv.get("batch_stats", {})}

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
    assert t_greedy.shape == (2 * N_STEPS,)
    assert f_greedy.shape == (2 * N_STEPS * 10, 24)
    assert np.isfinite(f_greedy).all()

    f_b1, t_b1 = mk(beam_width=1).generate(words, duration_s=6.0)
    np.testing.assert_array_equal(t_b1, t_greedy)
    np.testing.assert_allclose(f_b1, f_greedy, atol=1e-6)

    f_s, t_s = mk(temperature=1.0).generate(words, duration_s=6.0)
    assert np.isfinite(f_s).all()

    outs = mk(window_carry=False).generate_batch(
        [[["hello", 0.1, 0.5]], [["world", 0.2, 0.9]]], 3.0)
    assert len(outs) == 2
    for fr, tk in outs:
        assert tk.shape == (N_STEPS,)
        assert np.isfinite(fr).all()
