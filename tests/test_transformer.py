"""Transformer Part-d variant (models/transformer): API parity with the
GRU Text2Token, causal-decode correctness, training, checkpointing.

The variant is beyond-reference (the reference's Part d is GRU-only,
text2embedding_model.py:488-746); these tests pin its contract to the
GRU model's so the shared trainer/inference/serving paths stay
arch-agnostic."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture2vec_tpu.models.transformer import TransformerText2Token
from gesture2vec_tpu.train import checkpoints
from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.text2token_trainer import (
    make_text2token, train_text2token)

N_WORDS, N_TOKENS, N_STEPS, MAXW = 40, 12, 6, 10


def _config(**kw):
    base = dict(name="test_t2t_tf", model="seq2seq", hidden_size=32,
                n_layers=2, dropout_prob=0.1, epochs=10, batch_size=16,
                learning_rate=0.001, sentence_frame_length=120,
                n_poses=20, n_pre_poses=2, autoencoder_vq=True,
                autoencoder_vq_components=N_TOKENS, autoencoder_att=True,
                wordembed_dim=32, random_seed=0,
                t2t_arch="transformer")
    base.update(kw)
    return load_config(base)


def _dataset(rng, n=128):
    """Synthetic learnable mapping: tokens derive from the word ids."""
    lengths = rng.integers(3, MAXW, size=n).astype(np.int32)
    word_ids = np.zeros((n, MAXW), np.int32)
    for i, L in enumerate(lengths):
        word_ids[i, :L] = rng.integers(4, N_WORDS, size=L)
    key = word_ids.sum(axis=1) % N_TOKENS
    tokens = ((key[:, None] + np.arange(N_STEPS)[None, :]) %
              N_TOKENS).astype(np.int32)
    return {"word_ids": word_ids, "lengths": lengths, "tokens": tokens}


def _init(model, d, n=4):
    return model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)},
                      jnp.asarray(d["word_ids"][:n]),
                      jnp.asarray(d["lengths"][:n]),
                      jnp.asarray(d["tokens"][:n]), train=False)


def test_config_selects_transformer():
    model = make_text2token(_config(), N_WORDS)
    assert isinstance(model, TransformerText2Token)
    assert model.n_steps == N_STEPS and model.n_tokens == N_TOKENS


def test_forward_shapes_and_seed_onehot(rng):
    model = make_text2token(_config(), N_WORDS)
    d = _dataset(rng, n=4)
    variables = _init(model, d)
    res = model.apply(variables, jnp.asarray(d["word_ids"][:4]),
                      jnp.asarray(d["lengths"][:4]),
                      jnp.asarray(d["tokens"][:4]), train=False)
    assert res["logits"].shape == (4, N_STEPS, N_TOKENS)
    assert res["tokens"].shape == (4, N_STEPS)
    assert res["attentions"].shape == (N_STEPS - 1, 4, MAXW)
    np.testing.assert_allclose(
        np.asarray(res["logits"][:, 0]).argmax(-1), d["tokens"][:4, 0])
    np.testing.assert_array_equal(np.asarray(res["tokens"][:, 0]),
                                  d["tokens"][:4, 0])


def test_parallel_train_pass_matches_serial_decode(rng):
    """The core causal-decoder invariant: with dropout 0 and every step
    teacher-forced (n_pre_poses = n_steps), the autoregressive eval
    rollout must reproduce the single parallel teacher-forced pass
    bit-for-bit - i.e. position j's logits depend only on inputs 0..j
    and the two code paths compute the same function."""
    d = _dataset(rng, n=4)
    model = TransformerText2Token(
        n_words=N_WORDS, n_tokens=N_TOKENS, hidden_size=32, n_layers=2,
        n_steps=N_STEPS, n_pre_poses=N_STEPS, dropout=0.0,
        word_embed_size=32)
    variables = _init(model, d)
    args = (jnp.asarray(d["word_ids"][:4]), jnp.asarray(d["lengths"][:4]),
            jnp.asarray(d["tokens"][:4]))
    serial = model.apply(variables, *args, train=False)
    parallel = model.apply(variables, *args, train=True,
                           rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_allclose(np.asarray(serial["logits"][:, 1:]),
                               np.asarray(parallel["logits"][:, 1:]),
                               rtol=1e-5, atol=1e-5)


def test_encode_decode_split_matches_fused(rng):
    model = make_text2token(_config(), N_WORDS)
    d = _dataset(rng, n=4)
    variables = _init(model, d)
    toks = jnp.asarray(d["word_ids"][:4])
    lens = jnp.asarray(d["lengths"][:4])
    tgt = jnp.asarray(d["tokens"][:4])
    fused = model.apply(variables, toks, lens, tgt, train=False)
    eo, dh = model.apply(variables, toks, lens, method=model.encode_text)
    assert eo.shape == (MAXW, 4, 32) and dh.shape == (2, 4, 32)
    mask = jnp.arange(MAXW)[None, :] < lens[:, None]
    split = model.apply(variables, eo, dh, tgt, train=False,
                        enc_mask=mask, method=model.decode_tokens)
    np.testing.assert_array_equal(np.asarray(fused["tokens"]),
                                  np.asarray(split["tokens"]))


def test_beam_width_one_is_greedy(rng):
    model = make_text2token(_config(), N_WORDS)
    d = _dataset(rng, n=4)
    variables = _init(model, d)
    toks = jnp.asarray(d["word_ids"][:4])
    lens = jnp.asarray(d["lengths"][:4])
    tgt = jnp.asarray(d["tokens"][:4])
    greedy = model.apply(variables, toks, lens, tgt, train=False)
    eo, dh = model.apply(variables, toks, lens, method=model.encode_text)
    mask = jnp.arange(MAXW)[None, :] < lens[:, None]
    b1 = model.apply(variables, eo, dh, tgt, beam_width=1, enc_mask=mask,
                     method=model.beam_decode)
    np.testing.assert_array_equal(np.asarray(b1["tokens"]),
                                  np.asarray(greedy["tokens"]))
    b4 = model.apply(variables, eo, dh, tgt, beam_width=4, enc_mask=mask,
                     method=model.beam_decode)
    assert b4["tokens"].shape == (4, N_STEPS)
    # the beam's best sequence can only have >= the greedy logprob
    assert np.all(np.asarray(b4["logprob"])
                  >= np.asarray(b1["logprob"]) - 1e-5)


def test_sampled_decode_reproducible_and_varied(rng):
    model = make_text2token(_config(), N_WORDS)
    d = _dataset(rng, n=8)
    variables = _init(model, d, n=8)
    toks = jnp.asarray(d["word_ids"][:8])
    lens = jnp.asarray(d["lengths"][:8])
    tgt = jnp.asarray(d["tokens"][:8])
    kw = dict(train=False, temperature=1.0,
              rngs={"sample": jax.random.PRNGKey(7)})
    a = model.apply(variables, toks, lens, tgt, **kw)
    b = model.apply(variables, toks, lens, tgt, **kw)
    np.testing.assert_array_equal(np.asarray(a["tokens"]),
                                  np.asarray(b["tokens"]))
    c = model.apply(variables, toks, lens, tgt, train=False,
                    temperature=1.0,
                    rngs={"sample": jax.random.PRNGKey(8)})
    assert not np.array_equal(np.asarray(a["tokens"]),
                              np.asarray(c["tokens"]))


def test_learns_synthetic_mapping_and_checkpoints(rng, tmp_path):
    cfg = _config()
    data = _dataset(rng, n=256)
    state, hist = train_text2token(cfg, data, data, N_WORDS,
                                   save_dir=str(tmp_path), save_every=100)
    assert hist["train_loss"][-1] < hist["train_loss"][0] * 0.8
    assert hist["val_acc"][-1] > 0.3  # well above 1/12 chance

    ckpt = checkpoints.checkpoint_filename(str(tmp_path), "test_t2t_tf",
                                           cfg.epochs)
    model, variables, payload = checkpoints.load_checkpoint_and_model(
        ckpt, "text2embedding")
    # the arch rides in the config: the registry rebuilds a transformer
    assert isinstance(model, TransformerText2Token)
    res = model.apply(variables, jnp.asarray(data["word_ids"][:8]),
                      jnp.asarray(data["lengths"][:8]),
                      jnp.asarray(data["tokens"][:8]), train=False)
    assert res["logits"].shape == (8, N_STEPS, N_TOKENS)


def test_bf16_compute_mode_trains(rng):
    cfg = _config(compute_dtype="bfloat16", epochs=2)
    data = _dataset(rng, n=64)
    state, hist = train_text2token(cfg, data, data, N_WORDS)
    assert np.isfinite(hist["train_loss"]).all()
    # logits stay fp32 regardless of the compute dtype
    model = make_text2token(cfg, N_WORDS)
    res = model.apply({"params": state.params},
                      jnp.asarray(data["word_ids"][:4]),
                      jnp.asarray(data["lengths"][:4]),
                      jnp.asarray(data["tokens"][:4]), train=False)
    assert res["logits"].dtype == jnp.float32


def test_multi_stage_heads(rng):
    cfg = _config(token_stages=3)
    model = make_text2token(cfg, N_WORDS)
    d = _dataset(rng, n=4)
    variables = _init(model, d)
    res = model.apply(variables, jnp.asarray(d["word_ids"][:4]),
                      jnp.asarray(d["lengths"][:4]),
                      jnp.asarray(d["tokens"][:4]), train=False)
    assert res["stage_logits"].shape == (4, N_STEPS - 1, 2, N_TOKENS)
    assert res["stage_tokens"].shape == (4, N_STEPS - 1, 2)
    rt = model.apply(variables, jnp.asarray(d["word_ids"][:4]),
                     jnp.asarray(d["lengths"][:4]),
                     jnp.asarray(d["tokens"][:4]), train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    assert rt["stage_logits"].shape == (4, N_STEPS - 1, 2, N_TOKENS)


def test_stage0_temperature_policy(rng):
    """Per-stage decode policy on the stage-conditional transformer:
    stage0_temperature=0 + temperature>0 keeps the primary chain
    bit-equal to the fully greedy decode (only primaries feed the
    causal buffer) while residual stages stay key-sensitive; the -1
    sentinel matches the single-policy path bit for bit."""
    cfg = _config(token_stages=3, stage_conditional=True)
    model = make_text2token(cfg, N_WORDS)
    d = _dataset(rng, n=4)
    variables = _init(model, d)
    toks = jnp.asarray(d["word_ids"][:4])
    lens = jnp.asarray(d["lengths"][:4])
    tgt = jnp.asarray(d["tokens"][:4])
    r0 = model.apply(variables, toks, lens, tgt, train=False)
    k1, k2 = jax.random.PRNGKey(7), jax.random.PRNGKey(8)

    r1 = model.apply(variables, toks, lens, tgt, train=False,
                     temperature=1.5, stage0_temperature=0.0,
                     rngs={"sample": k1})
    np.testing.assert_array_equal(np.asarray(r1["tokens"]),
                                  np.asarray(r0["tokens"]))
    r2 = model.apply(variables, toks, lens, tgt, train=False,
                     temperature=1.5, stage0_temperature=0.0,
                     rngs={"sample": k2})
    np.testing.assert_array_equal(np.asarray(r2["tokens"]),
                                  np.asarray(r0["tokens"]))
    assert not np.array_equal(np.asarray(r1["stage_tokens"]),
                              np.asarray(r2["stage_tokens"]))
    st = np.asarray(r1["stage_tokens"])
    assert st.min() >= 0 and st.max() < N_TOKENS

    ra = model.apply(variables, toks, lens, tgt, train=False,
                     temperature=1.5, rngs={"sample": k1})
    rb = model.apply(variables, toks, lens, tgt, train=False,
                     temperature=1.5, stage0_temperature=-1.0,
                     rngs={"sample": k1})
    np.testing.assert_array_equal(np.asarray(ra["tokens"]),
                                  np.asarray(rb["tokens"]))
    np.testing.assert_array_equal(np.asarray(ra["stage_tokens"]),
                                  np.asarray(rb["stage_tokens"]))


def test_padding_positions_do_not_leak(rng):
    """Changing word ids past a sentence's length must not change its
    decode (the encoder's padding mask + enc_mask plumbing)."""
    model = make_text2token(_config(dropout_prob=0.0), N_WORDS)
    d = _dataset(rng, n=2)
    d["lengths"][:] = 5
    variables = _init(model, d, n=2)
    toks = np.array(d["word_ids"][:2])
    tgt = jnp.asarray(d["tokens"][:2])
    lens = jnp.asarray(d["lengths"][:2])
    a = model.apply(variables, jnp.asarray(toks), lens, tgt, train=False)
    toks[:, 5:] = 3  # garbage in the padding region
    b = model.apply(variables, jnp.asarray(toks), lens, tgt, train=False)
    np.testing.assert_allclose(np.asarray(a["logits"]),
                               np.asarray(b["logits"]), rtol=1e-5,
                               atol=1e-6)


def test_padding_leak_mixed_lengths(rng):
    """A sentence's decode must not depend on BATCH COMPOSITION: with
    mixed lengths, the per-sentence enc_mask must stop the short
    sentence's cross-attention from reading its own pad rows (which
    sit below the batch max and carry pad-embedding-derived content —
    a batch-max mask would expose them; advisor finding, round 3)."""
    model = make_text2token(_config(dropout_prob=0.0), N_WORDS)
    d = _dataset(rng, n=2)
    d["lengths"][0] = 4   # short sentence
    d["lengths"][1] = 9   # long sentence sets the batch max
    variables = _init(model, d, n=2)
    toks = np.array(d["word_ids"][:2])
    tgt = jnp.asarray(d["tokens"][:2])
    lens = jnp.asarray(d["lengths"][:2])
    a = model.apply(variables, jnp.asarray(toks), lens, tgt, train=False)
    # garbage inside the short sentence's pad region but BELOW the
    # batch max — exactly the rows a batch-max mask would attend to
    toks[0, 4:9] = 3
    b = model.apply(variables, jnp.asarray(toks), lens, tgt, train=False)
    np.testing.assert_allclose(np.asarray(a["logits"]),
                               np.asarray(b["logits"]), rtol=1e-5,
                               atol=1e-6)
    # and the same through the solo path: the short sentence decoded
    # alone (its own padding) must match its decode inside the batch
    solo = model.apply(variables, jnp.asarray(toks[:1]), lens[:1],
                       tgt[:1], train=False)
    np.testing.assert_allclose(np.asarray(solo["logits"][0]),
                               np.asarray(b["logits"][0]), rtol=1e-4,
                               atol=1e-5)
