"""Part-b sequence VQ autoencoder: shapes, training, tokenization."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.seq_ae_trainer import (make_seq_ae, train_seq_ae)
from gesture2vec_tpu.train import checkpoints


def _config(**kw):
    base = dict(name="test_vqvae", model="seq2seq", hidden_size=32,
                n_layers=2, dropout_prob=0.2, epochs=2, batch_size=16,
                learning_rate=0.001, rep_learning_dim=24, n_poses=10,
                n_pre_poses=1, autoencoder_vq=True,
                autoencoder_vq_components=16,
                autoencoder_vq_commitment_cost=0.25,
                autoencoder_vae=False, autoencoder_att=False,
                autoencoder_conditioned=True, random_seed=0)
    base.update(kw)
    return load_config(base)


def _windows(rng, n=64, t=10, d=24):
    from tests.fixtures import make_smooth_windows
    phase = rng.uniform(0, 6, size=(n, 1, d)).astype(np.float32)
    return make_smooth_windows(rng, n=n, t=t, d=d, phase=phase)


def test_forward_shapes(rng):
    cfg = _config()
    model = make_seq_ae(cfg)
    x = jnp.asarray(_windows(rng, n=4))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, x,
                           train=False)
    res = model.apply(variables, x, x, train=False)
    assert res["outputs"].shape == (4, 10, 24)
    assert res["first_hidden"].shape == (2, 4, 32)
    assert res["vq"].encodings.shape == (4, 16)
    # outputs[0] is the seed frame, copied from the target
    np.testing.assert_allclose(np.asarray(res["outputs"][:, 0]),
                               np.asarray(x[:, 0]), atol=1e-6)


def test_trains_and_improves(rng, tmp_path):
    cfg = _config(epochs=3)
    w = _windows(rng, n=96)
    state, hist = train_seq_ae(cfg, w, w[:16], save_dir=str(tmp_path),
                               save_every=100)
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert hist["perplexity"][-1] > 1.0

    # registry round-trip
    ckpt = checkpoints.checkpoint_filename(str(tmp_path), "test_vqvae", 3)
    model, variables, payload = checkpoints.load_checkpoint_and_model(
        ckpt, "autoencoder_vq")
    res = model.apply(variables, jnp.asarray(w[:4]), jnp.asarray(w[:4]),
                      train=False)
    assert res["outputs"].shape == (4, 10, 24)


def test_tokens_deterministic(rng):
    cfg = _config()
    model = make_seq_ae(cfg)
    x = jnp.asarray(_windows(rng, n=8))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, x,
                           train=False)

    def tokens(v, xs):
        _, hid = model.apply(v, xs, method=model.encode)
        return model.apply(v, hid, method=model.tokens_from_hidden)

    t1 = np.asarray(tokens(variables, x))
    t2 = np.asarray(tokens(variables, x))
    np.testing.assert_array_equal(t1, t2)
    assert t1.shape == (8,)
    assert t1.dtype.kind == "i"


def test_rollout_emits_only_decoder_outputs(rng):
    """rollout() is the generative path (ref
    inference_text2embedding.py:488-519): the seed is CONSUMED as the
    first input and never emitted. Pinned relationship with decode():
    with the seed frame tiled as the teacher sequence, decode's
    outputs are [seed, step1..step_{T-1}] while rollout's are
    [step1..step_T], so rollout[:, :-1] == decode[:, 1:]."""
    cfg = _config()
    model = make_seq_ae(cfg)
    x = jnp.asarray(_windows(rng, n=4))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x, x,
                           train=False)
    B, H, D, T = 4, 32, 24, 10
    h0 = jnp.asarray(rng.normal(size=(2, B, H)).astype(np.float32))
    seed = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    roll = model.apply(variables, h0, seed, method=model.rollout)
    assert roll.shape == (B, T, D)
    dec = model.apply(variables, h0,
                      jnp.tile(seed[:, None, :], (1, T, 1)), None,
                      method=model.decode)
    np.testing.assert_allclose(np.asarray(roll[:, :-1]),
                               np.asarray(dec[:, 1:]), atol=1e-5)
    # no frame of the rollout equals the (token-independent) seed
    assert not np.allclose(np.asarray(roll[:, 0]), np.asarray(seed))

    # fused Pallas kernel matches rollout exactly at full step count
    from gesture2vec_tpu.ops.decoder_pallas import fused_chunk_decode
    ys = fused_chunk_decode(seed, h0, variables["params"]["decoder_step"],
                            variables["batch_stats"]["decoder_step"],
                            n_steps=T, interpret=True)
    np.testing.assert_allclose(np.transpose(np.asarray(ys), (1, 0, 2)),
                               np.asarray(roll), atol=1e-5)


def test_vq_flatten_modes_differ(rng):
    """per_sample and torch_view are different bottleneck semantics; both
    must run, and they should generally produce different tokens."""
    cfg = _config()
    x = jnp.asarray(_windows(rng, n=8))
    m1 = make_seq_ae(cfg, parity=False)
    m2 = make_seq_ae(cfg, parity=True)
    v = m1.init({"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, x, x, train=False)
    r1 = m1.apply(v, x, x, train=False)
    # parity model keeps the reference's eval-time 0.95 step dropout, so
    # eval needs a dropout rng
    r2 = m2.apply(v, x, x, train=False,
                  rngs={"dropout": jax.random.PRNGKey(2)})
    assert r1["outputs"].shape == r2["outputs"].shape
    # the flatten modes are genuinely different bottleneck semantics:
    # with shared weights, torch_view interleaves pairs of batch
    # elements through the VQ rows, so the assignments must differ
    t1 = np.argmax(np.asarray(r1["vq"].encodings), axis=1)
    t2 = np.argmax(np.asarray(r2["vq"].encodings), axis=1)
    assert not np.array_equal(t1, t2), \
        "parity (torch_view) quantization degenerated to per_sample"


def test_unconditioned_decoder(rng):
    cfg = _config(autoencoder_conditioned=False)
    model = make_seq_ae(cfg)
    x = jnp.asarray(_windows(rng, n=4))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, x, train=False)
    res = model.apply(v, x, x, train=False)
    assert np.isfinite(np.asarray(res["outputs"])).all()


def test_attention_variant(rng):
    cfg = _config(autoencoder_att=True)
    model = make_seq_ae(cfg)
    x = jnp.asarray(_windows(rng, n=4))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, x, train=False)
    res = model.apply(v, x, x, train=False)
    assert np.isfinite(np.asarray(res["outputs"])).all()


def test_plot_every_writes_codebook_tsne(rng, tmp_path):
    import os

    cfg = _config(epochs=2)
    w = _windows(rng, n=48)
    train_seq_ae(cfg, w, w[:16], save_dir=str(tmp_path), save_every=100,
                 plot_every=1)
    pngs = [f for f in os.listdir(tmp_path) if f.startswith("codebook")]
    assert len(pngs) == 2


def test_bf16_compute_mode_trains(rng):
    """compute_dtype=bfloat16: encoder/decoder matmuls run single-pass
    bf16, the VQ path and outputs stay fp32, params stay fp32, and
    training still converges."""
    import jax
    import jax.numpy as jnp

    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state,
                                                      make_seq_ae,
                                                      make_train_step,
                                                      train_seq_ae)
    from gesture2vec_tpu.train.optim import make_optimizer

    base = dict(name="bf16", model="seq2seq", hidden_size=16, n_layers=2,
                dropout_prob=0.1, epochs=2, batch_size=16,
                learning_rate=0.002, rep_learning_dim=12, n_poses=8,
                n_pre_poses=1, autoencoder_vq=True,
                autoencoder_vq_components=16, autoencoder_att=False,
                autoencoder_conditioned=True, random_seed=0,
                compute_dtype="bfloat16")
    cfg = load_config(base)
    model = make_seq_ae(cfg)
    st = init_state(cfg, model, jax.random.PRNGKey(0),
                    make_optimizer(1e-3))
    # params stay fp32
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(st.params))
    x = jnp.asarray(rng.normal(size=(4, 8, 12)).astype(np.float32))
    res = model.apply({"params": st.params,
                       "batch_stats": st.batch_stats}, x, x, train=False)
    assert res["outputs"].dtype == jnp.float32
    assert res["vq"].encodings.dtype == jnp.float32

    from tests.fixtures import make_smooth_windows
    w = make_smooth_windows(np.random.default_rng(1), n=64, t=8, d=12)
    _, hist = train_seq_ae(cfg, w, w[:16])
    assert np.isfinite(hist["train_loss"]).all()
    assert hist["train_loss"][-1] < hist["train_loss"][0]


def test_scan_unroll_identical_numerics(rng):
    """scan_unroll is a speed-only knob: identical params must produce
    identical outputs and VQ tokens at any unroll factor."""
    from gesture2vec_tpu.models.gru import set_scan_unroll

    x = jnp.asarray(_windows(rng, n=8))
    try:
        model1 = make_seq_ae(_config())          # sets unroll 1
        variables = model1.init({"params": jax.random.PRNGKey(0),
                                 "dropout": jax.random.PRNGKey(1)}, x, x,
                                train=False)
        res1 = model1.apply(variables, x, x, train=False)
        model4 = make_seq_ae(_config(scan_unroll=4))
        res4 = model4.apply(variables, x, x, train=False)
        np.testing.assert_array_equal(
            np.argmax(res1["vq"].encodings, -1),
            np.argmax(res4["vq"].encodings, -1))
        np.testing.assert_allclose(res1["outputs"], res4["outputs"],
                                   atol=1e-6)
    finally:
        set_scan_unroll(1)


def test_ssl_training_via_config(rng, tmp_path):
    """use_similarity + similarity_labels drives the SSL step inside
    train_seq_ae (ref: train_Autoencoder.py semi-supervised variant)."""
    from gesture2vec_tpu.train.seq_ae_trainer import train_seq_ae

    labels = tmp_path / "gesture_labels.txt"
    lines = []
    r = np.random.default_rng(0)
    for k in range(30):
        left, mid, right = r.integers(0, 48, size=3)
        lines.append(f"ann,{left},{mid},{right},"
                     f"{['left', 'right', 'neither'][k % 3]},0.0")
    labels.write_text("\n".join(lines))

    win = rng.normal(size=(48, 10, 16)).astype(np.float32)
    cfg = _config(epochs=2, batch_size=16, rep_learning_dim=16,
                  n_poses=10, hidden_size=16,
                  use_similarity=True, similarity_labels=str(labels),
                  loss_label_weight=0.1)
    state, hist = train_seq_ae(cfg, win, win[:16])
    assert np.isfinite(hist["train_loss"][-1])
    assert hist["train_loss"][-1] < hist["train_loss"][0] * 1.5

    # mesh + SSL is rejected (single-device only, like the reference)
    with pytest.raises(ValueError):
        train_seq_ae(cfg.replace(mesh_shape={"dp": 2}), win, win[:16])


def test_rvq_variant_trains_and_serves(rng, tmp_path):
    """autoencoder_vq_variant=rvq: trains, tokenizes, checkpoints, and
    every codebook consumer still finds the stage-0 "codebook" param."""
    win = rng.normal(size=(64, 10, 16)).astype(np.float32)
    cfg = _config(epochs=2, batch_size=16, rep_learning_dim=16,
                  n_poses=10, hidden_size=16, name="rvq",
                  autoencoder_vq_variant="rvq", rvq_stages=2)
    state, hist = train_seq_ae(cfg, win, win[:16],
                               save_dir=str(tmp_path), save_every=2)
    assert np.isfinite(hist["train_loss"][-1])
    assert "codebook" in state.params["vq_layer"]
    assert "codebook_r1" in state.params["vq_layer"]

    ckpt = checkpoints.checkpoint_filename(str(tmp_path), "rvq", 2)
    model, variables, _ = checkpoints.load_checkpoint_and_model(
        ckpt, "autoencoder_vq")
    assert model.vq_variant == "rvq"
    x = jnp.asarray(win[:4])
    res = model.apply(variables, x, x, train=False)
    toks = np.argmax(np.asarray(res["vq"].encodings), axis=-1)
    assert toks.shape == (4,)
    assert (toks >= 0).all() and (toks < 16).all()


def test_rvq_reestimate_recovers_codebook_usage(rng):
    """Gradient-only hard-assign RVQ codebooks collapse (dead codes get
    no gradient — measured 2/64 used at corpus scale); the per-stage
    K-Means re-fit restores usage and training continues through the
    param swap (train/seq_ae_trainer.reestimate_rvq_codebooks)."""
    from gesture2vec_tpu.models.seq_ae import _flatten_hidden
    from gesture2vec_tpu.train.seq_ae_trainer import (
        reestimate_rvq_codebooks, init_state)
    from gesture2vec_tpu.train.optim import make_optimizer

    win = rng.normal(size=(64, 10, 16)).astype(np.float32)
    cfg = _config(epochs=4, batch_size=16, rep_learning_dim=16,
                  n_poses=10, hidden_size=16, name="rvq_re",
                  autoencoder_vq_variant="rvq", rvq_stages=2,
                  rvq_reestimate_every=2)
    model = make_seq_ae(cfg)
    state = init_state(cfg, model, jax.random.PRNGKey(0),
                       make_optimizer(cfg.learning_rate))

    old_cb = np.asarray(state.params["vq_layer"]["codebook"])
    state2 = reestimate_rvq_codebooks(model, state, win,
                                      cfg.autoencoder_vq_components,
                                      cfg.rvq_stages)
    new_cb = np.asarray(state2.params["vq_layer"]["codebook"])
    assert not np.allclose(old_cb, new_cb)

    # after the re-fit, stage-0 assignments over the data cover a
    # healthy fraction of the codebook (K-Means centers are data means)
    variables = {"params": state2.params,
                 "batch_stats": state2.batch_stats}
    _, dec_hidden = model.apply(variables, jnp.asarray(win),
                                method=model.encode)
    flat = np.asarray(_flatten_hidden(dec_hidden, model.vq_flatten))
    d = ((flat ** 2).sum(1, keepdims=True) + (new_cb ** 2).sum(1)
         - 2.0 * flat @ new_cb.T)
    used = np.unique(np.argmin(d, axis=1)).size
    assert used >= cfg.autoencoder_vq_components // 2, used

    # the trainer hook path: a full run through the epoch-2 re-fit
    _, hist = train_seq_ae(cfg, win, win[:16])
    assert np.isfinite(hist["train_loss"]).all()
