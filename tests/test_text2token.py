"""Part-d text->gesture-token model: shapes, learning, checkpointing."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.text2token_trainer import (
    make_text2token, token_histogram_perplexity, train_text2token)
from gesture2vec_tpu.train import checkpoints

N_WORDS, N_TOKENS, N_STEPS, MAXW = 40, 12, 6, 10


def _config(**kw):
    base = dict(name="test_t2t", model="seq2seq", hidden_size=32,
                n_layers=2, dropout_prob=0.1, epochs=10, batch_size=16,
                learning_rate=0.003, sentence_frame_length=120, n_poses=20,
                n_pre_poses=2, autoencoder_vq=True,
                autoencoder_vq_components=N_TOKENS, autoencoder_att=True,
                wordembed_dim=32, random_seed=0)
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


@pytest.mark.parametrize("enc", ["tcn", "gru"])
def test_forward_shapes(rng, enc):
    cfg = _config(extras={})
    cfg.extras["text_encoder"] = enc
    model = make_text2token(cfg, N_WORDS)
    d = _dataset(rng, n=4)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.asarray(d["word_ids"]),
                           jnp.asarray(d["lengths"]),
                           jnp.asarray(d["tokens"]), train=False)
    res = model.apply(variables, jnp.asarray(d["word_ids"]),
                      jnp.asarray(d["lengths"]),
                      jnp.asarray(d["tokens"]), train=False)
    assert res["logits"].shape == (4, N_STEPS, N_TOKENS)
    # position 0 is the one-hot of the seed token
    np.testing.assert_allclose(
        np.asarray(res["logits"][:, 0]).argmax(-1), d["tokens"][:, 0])


def test_learns_synthetic_mapping(rng, tmp_path):
    cfg = _config()
    data = _dataset(rng, n=256)
    state, hist = train_text2token(cfg, data, data, N_WORDS,
                                   save_dir=str(tmp_path), save_every=100)
    assert hist["train_loss"][-1] < hist["train_loss"][0] * 0.8
    assert hist["val_acc"][-1] > 0.3  # well above 1/12 chance

    ckpt = checkpoints.checkpoint_filename(str(tmp_path), "test_t2t",
                                           cfg.epochs)
    model, variables, payload = checkpoints.load_checkpoint_and_model(
        ckpt, "text2embedding")
    res = model.apply(variables, jnp.asarray(data["word_ids"][:8]),
                      jnp.asarray(data["lengths"][:8]),
                      jnp.asarray(data["tokens"][:8]), train=False)
    assert res["logits"].shape == (8, N_STEPS, N_TOKENS)


def test_token_histogram_perplexity():
    uniform = np.arange(12).repeat(10)
    assert abs(token_histogram_perplexity(uniform, 12) - 12.0) < 1e-6
    constant = np.zeros(100, np.int32)
    assert abs(token_histogram_perplexity(constant, 12) - 1.0) < 1e-6


def test_eval_metrics_hand_computed():
    """Pin the trainer eval metrics to hand-computed fixtures, the way
    test_vq.py pins the VQ math (reference eval: CE over positions 1..
    + token-histogram perplexity, ref: train_text2embedding.py:371-410,
    train_seq2seq.py:520-530)."""
    import jax.numpy as jnp

    from gesture2vec_tpu.train.losses import token_cross_entropy

    # skewed histogram: p = [0.5, 0.25, 0.25] over 4 classes
    # H = 1.5 ln 2 -> perplexity = 2^1.5
    toks = np.array([0, 0, 1, 2], np.int32)
    assert abs(token_histogram_perplexity(toks, 4) - 2 ** 1.5) < 1e-9

    # CE: position 0 ignored (the seed one-hot); two positions remain.
    # logits chosen so softmax is exactly [e,1,1]/(e+2) at pos 1 (target
    # hits the e term) and uniform at pos 2.
    logits = np.array([[[99.0, 0.0, 0.0],     # pos 0: ignored
                        [1.0, 0.0, 0.0],      # pos 1
                        [0.0, 0.0, 0.0]]])    # pos 2: uniform
    targets = np.array([[2, 0, 1]], np.int32)
    e = np.e
    expected = np.mean([-np.log(e / (e + 2)), -np.log(1 / 3)])
    got = float(token_cross_entropy(jnp.asarray(logits),
                                    jnp.asarray(targets)))
    assert abs(got - expected) < 1e-6


@pytest.mark.parametrize("enc", ["tcn", "gru"])
def test_bf16_compute_mode_trains(rng, enc):
    """compute_dtype=bfloat16 for Part d: encoder + decoder matmuls run
    single-pass bf16, logits and params stay fp32, and training still
    converges (same fp32-island discipline as Part b,
    tests/test_seq_ae.py::test_bf16_compute_mode_trains)."""
    cfg = _config(compute_dtype="bfloat16", epochs=6, extras={})
    cfg.extras["text_encoder"] = enc
    model = make_text2token(cfg, N_WORDS)
    d = _dataset(rng, n=64)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jnp.asarray(d["word_ids"]),
                           jnp.asarray(d["lengths"]),
                           jnp.asarray(d["tokens"]), train=False)
    # params stay fp32
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(variables["params"]))
    res = model.apply(variables, jnp.asarray(d["word_ids"][:4]),
                      jnp.asarray(d["lengths"][:4]),
                      jnp.asarray(d["tokens"][:4]), train=False)
    assert res["logits"].dtype == jnp.float32

    data = _dataset(rng, n=128)
    _, hist = train_text2token(cfg, data, data, N_WORDS)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_bf16_checkpoint_loads_fp32(rng, tmp_path):
    """Checkpoints trained in bf16 build fp32 models through the
    registry (token identity at inference)."""
    cfg = _config(compute_dtype="bfloat16", epochs=2)
    data = _dataset(rng, n=64)
    train_text2token(cfg, data, data, N_WORDS, save_dir=str(tmp_path),
                     save_every=100)
    ckpt = checkpoints.checkpoint_filename(str(tmp_path), "test_t2t", 2)
    model, variables, _ = checkpoints.load_checkpoint_and_model(
        ckpt, "text2embedding")
    assert model.compute_dtype == "float32"


def test_sampled_decode_model_level():
    """temperature>0 token sampling: greedy path unchanged
    (res["tokens"] == argmax(logits)), per-key deterministic, key-
    sensitive, top_k=1 == greedy; multi-stage heads sample too."""
    from gesture2vec_tpu.models.text2token import Text2Token

    m = Text2Token(n_words=50, n_tokens=16, hidden_size=24, n_layers=2,
                   n_steps=6, n_pre_poses=1, token_stages=2)
    rng = jax.random.PRNGKey(0)
    wids = jnp.zeros((3, 8), jnp.int32).at[:, :4].set(5)
    lens = jnp.full((3,), 4, jnp.int32)
    tgt = jnp.zeros((3, 6), jnp.int32)
    vs = m.init({"params": rng, "dropout": rng, "sample": rng},
                wids, lens, tgt, train=False)

    r0 = m.apply(vs, wids, lens, tgt, train=False)
    np.testing.assert_array_equal(
        np.asarray(r0["tokens"]),
        np.argmax(np.asarray(r0["logits"]), -1))
    np.testing.assert_array_equal(
        np.asarray(r0["stage_tokens"]),
        np.argmax(np.asarray(r0["stage_logits"]), -1))

    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    r1 = m.apply(vs, wids, lens, tgt, train=False, temperature=1.5,
                 rngs={"sample": k1})
    r1b = m.apply(vs, wids, lens, tgt, train=False, temperature=1.5,
                  rngs={"sample": k1})
    r2 = m.apply(vs, wids, lens, tgt, train=False, temperature=1.5,
                 rngs={"sample": k2})
    t1, t1b, t2 = (np.asarray(r["tokens"]) for r in (r1, r1b, r2))
    np.testing.assert_array_equal(t1, t1b)
    assert not np.array_equal(t1, t2)
    assert t1.min() >= 0 and t1.max() < 16
    st = np.asarray(r1["stage_tokens"])
    assert st.min() >= 0 and st.max() < 16

    r3 = m.apply(vs, wids, lens, tgt, train=False, temperature=1.5,
                 top_k=1, rngs={"sample": k1})
    np.testing.assert_array_equal(np.asarray(r3["tokens"]),
                                  np.asarray(r0["tokens"]))


@pytest.mark.parametrize("cond", [False, True])
def test_stage0_temperature_policy(cond):
    """Per-stage decode policy (beyond reference): stage0_temperature=0
    with temperature>0 keeps the PRIMARY token chain bit-equal to the
    fully greedy decode (only the primary token feeds back) while the
    residual stages stay key-sensitive sampled; the -1 sentinel is
    bit-identical to the single-policy path; the inverse split
    (stage0>0, temperature=0) samples the primary and argmaxes the
    residual stages."""
    from gesture2vec_tpu.models.text2token import Text2Token

    m = Text2Token(n_words=50, n_tokens=16, hidden_size=24, n_layers=2,
                   n_steps=6, n_pre_poses=1, token_stages=2,
                   stage_conditional=cond)
    rng = jax.random.PRNGKey(0)
    wids = jnp.zeros((3, 8), jnp.int32).at[:, :4].set(5)
    lens = jnp.full((3,), 4, jnp.int32)
    tgt = jnp.zeros((3, 6), jnp.int32)
    vs = m.init({"params": rng, "dropout": rng, "sample": rng},
                wids, lens, tgt, train=False)
    r0 = m.apply(vs, wids, lens, tgt, train=False)
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)

    # greedy primary + sampled residuals: primary == full greedy
    r1 = m.apply(vs, wids, lens, tgt, train=False, temperature=1.5,
                 stage0_temperature=0.0, rngs={"sample": k1})
    np.testing.assert_array_equal(np.asarray(r1["tokens"]),
                                  np.asarray(r0["tokens"]))
    r2 = m.apply(vs, wids, lens, tgt, train=False, temperature=1.5,
                 stage0_temperature=0.0, rngs={"sample": k2})
    np.testing.assert_array_equal(np.asarray(r2["tokens"]),
                                  np.asarray(r0["tokens"]))
    assert not np.array_equal(np.asarray(r1["stage_tokens"]),
                              np.asarray(r2["stage_tokens"]))
    st = np.asarray(r1["stage_tokens"])
    assert st.min() >= 0 and st.max() < 16

    # -1 sentinel == single-policy path, bit for bit
    ra = m.apply(vs, wids, lens, tgt, train=False, temperature=1.5,
                 rngs={"sample": k1})
    rb = m.apply(vs, wids, lens, tgt, train=False, temperature=1.5,
                 stage0_temperature=-1.0, rngs={"sample": k1})
    np.testing.assert_array_equal(np.asarray(ra["tokens"]),
                                  np.asarray(rb["tokens"]))
    np.testing.assert_array_equal(np.asarray(ra["stage_tokens"]),
                                  np.asarray(rb["stage_tokens"]))

    # sampled primary + greedy residuals: key-sensitive primaries,
    # residual stages argmax their own (primary-conditioned) logits
    r3 = m.apply(vs, wids, lens, tgt, train=False, temperature=0.0,
                 stage0_temperature=1.5, rngs={"sample": k1})
    r4 = m.apply(vs, wids, lens, tgt, train=False, temperature=0.0,
                 stage0_temperature=1.5, rngs={"sample": k2})
    assert not np.array_equal(np.asarray(r3["tokens"]),
                              np.asarray(r4["tokens"]))
    np.testing.assert_array_equal(
        np.asarray(r3["stage_tokens"]),
        np.argmax(np.asarray(r3["stage_logits"]), -1))


def test_beam_decode_model_level():
    """Beam search contract: K=1 == greedy (tokens AND stage tokens),
    K>1 never scores below greedy, results deterministic and in-range."""
    from gesture2vec_tpu.models.text2token import Text2Token

    m = Text2Token(n_words=50, n_tokens=16, hidden_size=24, n_layers=2,
                   n_steps=6, n_pre_poses=1, token_stages=2)
    rng = jax.random.PRNGKey(0)
    wids = jnp.zeros((3, 8), jnp.int32).at[:, :4].set(jnp.arange(4) + 3)
    lens = jnp.full((3,), 4, jnp.int32)
    tgt = jnp.zeros((3, 6), jnp.int32)
    vs = m.init({"params": rng, "dropout": rng}, wids, lens, tgt,
                train=False)
    eo, dh = m.apply(vs, wids, lens, method=m.encode_text)
    mask = jnp.arange(8) < 4

    greedy = m.apply(vs, eo, dh, tgt, train=False, enc_mask=mask,
                     method=m.decode_tokens)
    b1 = m.apply(vs, eo, dh, tgt, enc_mask=mask, beam_width=1,
                 method=m.beam_decode)
    np.testing.assert_array_equal(np.asarray(b1["tokens"]),
                                  np.asarray(greedy["tokens"]))
    np.testing.assert_array_equal(np.asarray(b1["stage_tokens"]),
                                  np.asarray(greedy["stage_tokens"]))

    b4 = m.apply(vs, eo, dh, tgt, enc_mask=mask, beam_width=4,
                 method=m.beam_decode)
    assert (np.asarray(b4["logprob"])
            >= np.asarray(b1["logprob"]) - 1e-5).all()
    t4 = np.asarray(b4["tokens"])
    assert t4.shape == (3, 6) and t4.min() >= 0 and t4.max() < 16
    st4 = np.asarray(b4["stage_tokens"])
    assert st4.shape == (3, 5, 1) and st4.min() >= 0 and st4.max() < 16
    b4b = m.apply(vs, eo, dh, tgt, enc_mask=mask, beam_width=4,
                  method=m.beam_decode)
    np.testing.assert_array_equal(t4, np.asarray(b4b["tokens"]))


@pytest.mark.parametrize("arch,fb_temp", [("gru", 0.0),
                                          ("transformer", 0.0),
                                          ("transformer", 1.0)])
def test_feedback_finetune_step(arch, fb_temp):
    """Feedback-matched finetune (config.feedback_finetune_epochs): the
    rollout-based step produces a finite loss, nonzero grads (params
    move), and the full trainer switches phases and still learns."""
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.text2token_trainer import (
        init_state, make_feedback_train_step)

    rng = np.random.default_rng(0)
    d = _dataset(rng, n=32)
    kw = dict(token_stages=2, stage_conditional=True)
    if arch == "transformer":
        kw["extras"] = {"t2t_arch": "transformer"}
    cfg = _config(**kw)
    model = make_text2token(cfg, N_WORDS)
    opt = make_optimizer(cfg.learning_rate)
    state = init_state(model, jax.random.PRNGKey(0), opt, max_words=MAXW)
    step = make_feedback_train_step(model, opt,
                                    feedback_temperature=fb_temp)
    # stage targets: stage 0 = the primary token
    stage = np.stack([d["tokens"], (d["tokens"] + 1) % N_TOKENS],
                     axis=-1).astype(np.int32)
    before = [np.asarray(x) for x in
              jax.tree_util.tree_leaves(state.params)]
    state, metrics = step(state, jnp.asarray(d["word_ids"]),
                          jnp.asarray(d["lengths"]),
                          jnp.asarray(d["tokens"]),
                          jnp.asarray(stage), jax.random.PRNGKey(3))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    after = jax.tree_util.tree_leaves(state.params)
    moved = sum(float(np.abs(np.asarray(a) - b).max())
                for a, b in zip(after, before))
    assert moved > 0.0, "feedback step produced zero gradient"


def test_feedback_finetune_trainer_phase(rng):
    """End-to-end: epochs=4 with feedback_finetune_epochs=2 runs both
    phases through run_token_training and the loss history is finite."""
    d = _dataset(rng, n=64)
    data = {"word_ids": d["word_ids"], "lengths": d["lengths"],
            "tokens": d["tokens"],
            "stage_tokens": np.stack(
                [d["tokens"], (d["tokens"] + 1) % N_TOKENS],
                axis=-1).astype(np.int32)}
    cfg = _config(epochs=4, token_stages=2, stage_conditional=True,
                  feedback_finetune_epochs=2, feedback_temperature=1.0,
                  extras={"t2t_arch": "transformer"})
    state, hist = train_text2token(cfg, data, data, N_WORDS)
    assert len(hist["train_loss"]) == 4
    assert all(np.isfinite(v) for v in hist["train_loss"])
    assert all(np.isfinite(v) for v in hist["val_loss"])


def test_label_smoothing_ce_hand_computed():
    """label_smoothing=0 is bit-identical to the reference's plain
    integer-label CE; >0 matches the hand-computed smoothed-target CE
    (beyond reference, config `label_smoothing`)."""
    from gesture2vec_tpu.train.losses import token_cross_entropy

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 4, 5)).astype(np.float32)
    targets = rng.integers(0, 5, size=(2, 4)).astype(np.int32)

    plain = float(token_cross_entropy(jnp.asarray(logits),
                                      jnp.asarray(targets)))
    zero = float(token_cross_entropy(jnp.asarray(logits),
                                     jnp.asarray(targets),
                                     label_smoothing=0.0))
    assert plain == zero

    alpha, k = 0.2, 5
    lg = logits[:, 1:].reshape(-1, k)
    tg = targets[:, 1:].reshape(-1)
    logp = lg - np.log(np.exp(lg).sum(-1, keepdims=True))
    labels = np.full_like(lg, alpha / k)
    labels[np.arange(len(tg)), tg] += 1.0 - alpha
    expected = float(np.mean(-(labels * logp).sum(-1)))
    got = float(token_cross_entropy(jnp.asarray(logits),
                                    jnp.asarray(targets),
                                    label_smoothing=alpha))
    assert abs(got - expected) < 1e-5


def test_label_smoothing_trains(rng):
    cfg = _config(epochs=2, label_smoothing=0.1)
    data = _dataset(rng, n=64)
    cfg = cfg.replace(batch_size=16)
    state, hist = train_text2token(cfg, data, data, N_WORDS)
    assert np.isfinite(hist["train_loss"]).all()
    # smoothed CE is bounded below by the smoothing entropy floor, so
    # it must exceed a plain-CE run's floor at convergence; here just
    # assert the loss went down (it trains)
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_keep_best_returns_best_epoch():
    """keep_best: the shared token loop snapshots the best-val-loss
    state and returns/saves it instead of the final epoch's (the state
    is donated every step, so the snapshot must be a host copy)."""
    from gesture2vec_tpu.train.token_loop import run_token_training

    cfg = load_config(dict(name="kb", epochs=3, batch_size=2,
                           random_seed=0, keep_best=True))
    data = {"x": np.zeros((2, 1), np.float32)}
    saved = []

    def train_step(state, x, rng):
        return state + 1.0, {"loss": jnp.zeros(())}

    def eval_step(state, x):
        # val loss dips at state==1 (end of epoch 0), then worsens
        return jnp.abs(state - 1.0), jnp.zeros(()), None

    state, hist = run_token_training(
        cfg, jnp.zeros(()), jax.random.PRNGKey(0), 0, ("x",),
        data, data, train_step, eval_step, lambda a: a,
        lambda st, r, ep1, tag=None: saved.append(
            (tag if tag else ep1, float(st))),
        save_every=100, log_every=100)

    assert hist["best_epoch"] == [0]
    assert float(state) == 1.0          # epoch-0 state, not the final 3.0
    assert ("best", 1.0) in saved       # best snapshot under distinct tag
    assert (3, 3.0) in saved            # final epoch still checkpointed


def test_latest_checkpoint_prefers_best(tmp_path):
    """Reuse paths must load the keep_best snapshot over the final
    numbered epoch (round-4 advisor: sorted(glob)[-1] silently
    evaluated the overfit epoch-120 state under a keep_best label)."""
    from gesture2vec_tpu.train import checkpoints

    d = str(tmp_path)
    assert checkpoints.latest_checkpoint(d) is None
    for fn in ("m_checkpoint_040.bin", "m_checkpoint_120.bin"):
        open(os.path.join(d, fn), "wb").close()
    assert checkpoints.latest_checkpoint(d).endswith("_120.bin")
    open(os.path.join(d, "m_checkpoint_best.bin"), "wb").close()
    assert checkpoints.latest_checkpoint(d).endswith("_best.bin")
    assert checkpoints.checkpoint_filename("/x", "m", "best") == \
        "/x/m_checkpoint_best.bin"
