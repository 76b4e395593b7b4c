"""Part-b transformer encoder variant (models/seq_encoder, YAML
`seq_arch: transformer`) — the TPU-first replacement for the biGRU
chunk encoder (ref: Autoencoder_VQVAE_model.py:30-100; the reference's
own disabled conv-encoder idea is at :739). The decoder and VQ are
untouched, so these tests pin the encoder contract, the training path,
and the checkpoint round trip."""
import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.seq_ae_trainer import (init_state, make_seq_ae,
                                                  train_seq_ae)
from gesture2vec_tpu.train.optim import make_optimizer

REP, HID, K, T = 8, 16, 12, 10


def _cfg(**kw):
    base = dict(name="tfenc", model="seq2seq", hidden_size=HID,
                n_layers=2, dropout_prob=0.1, epochs=6, batch_size=16,
                learning_rate=1e-3, rep_learning_dim=REP, n_poses=T,
                n_pre_poses=1, autoencoder_vq=True,
                autoencoder_vq_components=K, autoencoder_att=False,
                autoencoder_conditioned=True, autoencoder_vae=False,
                loss_l1_weight=5, loss_cont_weight=0.1,
                loss_var_weight=0.5, random_seed=0,
                seq_arch="transformer")
    base.update(kw)
    return load_config(base)


def _init(cfg, seed=0):
    model = make_seq_ae(cfg)
    opt = make_optimizer(cfg.learning_rate)
    state = init_state(cfg, model, jax.random.PRNGKey(seed), opt)
    return model, {"params": state.params,
                   "batch_stats": state.batch_stats}


def test_encoder_contract_and_token_path(rng):
    """Same encode/quantize/tokens surface as the biGRU model: shapes
    match, tokens are deterministic, the hidden slice is n_layers."""
    cfg = _cfg()
    model, variables = _init(cfg)
    assert model.encoder_arch == "transformer"
    x = jnp.asarray(rng.normal(size=(5, T, REP)).astype(np.float32))
    enc_outs, dec_hidden = model.apply(variables, x, method=model.encode)
    assert enc_outs.shape == (T, 5, HID)
    assert dec_hidden.shape == (2, 5, HID)
    toks = model.apply(variables, dec_hidden,
                       method=model.tokens_from_hidden)
    assert toks.shape == (5,)
    toks2 = model.apply(variables, dec_hidden,
                        method=model.tokens_from_hidden)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
    # full forward (train + eval) produces the standard res dict
    res = model.apply(variables, x, x, train=False)
    assert res["outputs"].shape == (5, T, REP)
    assert res["vq"] is not None


def test_frame_order_matters(rng):
    """The positional encoding must break permutation invariance: a
    time-reversed chunk encodes to a different hidden (the mean-pool
    alone would be order-blind — this pins that positions are wired)."""
    cfg = _cfg(dropout_prob=0.0)
    model, variables = _init(cfg)
    x = jnp.asarray(rng.normal(size=(3, T, REP)).astype(np.float32))
    _, h_fwd = model.apply(variables, x, method=model.encode)
    _, h_rev = model.apply(variables, x[:, ::-1], method=model.encode)
    assert float(jnp.abs(h_fwd - h_rev).max()) > 1e-4


def test_training_and_checkpoint_roundtrip(rng, tmp_path):
    cfg = _cfg()
    n = 128
    lat = rng.normal(size=(n, T, REP)).astype(np.float32)
    # learnable structure: two clusters of chunks
    lat[: n // 2] += 1.5
    state, hist = train_seq_ae(cfg, lat, lat[:16],
                               save_dir=str(tmp_path), save_every=6)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert "layer_0" in state.params["encoder"]  # transformer blocks

    from gesture2vec_tpu.train import checkpoints
    ckpt = checkpoints.checkpoint_filename(str(tmp_path), cfg.name, 6)
    m2, v2, _ = checkpoints.load_checkpoint_and_model(ckpt,
                                                      "autoencoder_vq")
    assert m2.encoder_arch == "transformer"
    x = jnp.asarray(lat[:4])
    r2 = m2.apply(v2, x, x, train=False)
    assert r2["outputs"].shape == (4, T, REP)
    # tokens survive the round trip bit-exactly
    _, dh = m2.apply(v2, x, method=m2.encode)
    t_loaded = m2.apply(v2, dh, method=m2.tokens_from_hidden)
    model = make_seq_ae(cfg)
    live = {"params": state.params, "batch_stats": state.batch_stats}
    _, dh_live = model.apply(live, x, method=model.encode)
    t_live = model.apply(live, dh_live, method=model.tokens_from_hidden)
    np.testing.assert_array_equal(np.asarray(t_loaded),
                                  np.asarray(t_live))


def test_rvq_variant_composes(rng):
    """seq_arch=transformer composes with vq_variant=rvq (the
    multi-stage chain): stage tokens round-trip through the stage sum."""
    cfg = _cfg(autoencoder_vq_variant="rvq", rvq_stages=2)
    model, variables = _init(cfg)
    x = jnp.asarray(rng.normal(size=(4, T, REP)).astype(np.float32))
    _, dec_hidden = model.apply(variables, x, method=model.encode)
    stage = model.apply(variables, dec_hidden, method=model.stage_tokens)
    assert stage.shape == (4, 2)
    hid = model.apply(variables, stage,
                      method=model.hidden_from_stage_tokens)
    vq_out, q_hidden = model.apply(variables, dec_hidden,
                                   method=model.quantize)
    np.testing.assert_allclose(np.asarray(hid), np.asarray(q_hidden),
                               rtol=1e-5, atol=1e-6)
