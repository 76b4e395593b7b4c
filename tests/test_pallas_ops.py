"""Pallas kernels vs jnp references (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.models.gru import gru_layer
from gesture2vec_tpu.models.vq import codebook_distances
from gesture2vec_tpu.ops.gru_pallas import gru_sequence_fused
from gesture2vec_tpu.ops.gru_pallas import supported as gru_supported
from gesture2vec_tpu.ops.vq_pallas import supported as vq_supported
from gesture2vec_tpu.ops.vq_pallas import vq_argmin


def test_vq_argmin_matches_jnp(rng):
    x = rng.normal(size=(300, 64)).astype(np.float32)  # non-tile-multiple
    cb = rng.normal(size=(128, 64)).astype(np.float32)
    idx, dmin = vq_argmin(jnp.asarray(x), jnp.asarray(cb), interpret=True)
    d_ref = np.asarray(codebook_distances(jnp.asarray(x), jnp.asarray(cb)))
    np.testing.assert_array_equal(np.asarray(idx), d_ref.argmin(1))
    np.testing.assert_allclose(np.asarray(dmin), d_ref.min(1), atol=1e-3)


def test_vq_supported_budget():
    assert vq_supported((1024, 400), (512, 400))
    assert not vq_supported((1024, 4096), (4096, 4096))
    assert not vq_supported((10, 32), (16, 64))  # dim mismatch


def test_gru_fused_matches_scan(rng):
    T, B, H, D = 20, 32, 64, 48
    xs = rng.normal(size=(T, B, D)).astype(np.float32)
    w_ih = rng.normal(size=(3 * H, D)).astype(np.float32) * 0.1
    w_hh = rng.normal(size=(3 * H, H)).astype(np.float32) * 0.1
    b_ih = rng.normal(size=(3 * H,)).astype(np.float32) * 0.1
    b_hh = rng.normal(size=(3 * H,)).astype(np.float32) * 0.1
    h0 = rng.normal(size=(B, H)).astype(np.float32)

    ys_ref, h_ref = gru_layer(jnp.asarray(xs), jnp.asarray(h0),
                              jnp.asarray(w_ih), jnp.asarray(w_hh),
                              jnp.asarray(b_ih), jnp.asarray(b_hh))
    x_proj = jnp.asarray(xs) @ jnp.asarray(w_ih).T + jnp.asarray(b_ih)
    ys, h_last = gru_sequence_fused(x_proj, jnp.asarray(h0),
                                    jnp.asarray(w_hh), jnp.asarray(b_hh),
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(h_ref),
                               atol=1e-5)


def test_gru_supported_budget():
    assert gru_supported(20, 128, 200)
    assert not gru_supported(2000, 1024, 1024)


def test_fused_chunk_decoder_matches_scan(rng):
    """The fused decoder kernel vs models/seq_ae.decode (eval mode)."""
    from gesture2vec_tpu.ops.decoder_pallas import (fused_chunk_decode,
                                                    supported)
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state,
                                                      make_seq_ae)

    cfg = load_config(dict(name="f", model="seq2seq", hidden_size=32,
                           n_layers=2, dropout_prob=0.1, epochs=1,
                           batch_size=8, rep_learning_dim=16, n_poses=10,
                           n_pre_poses=1, autoencoder_vq=True,
                           autoencoder_vq_components=8, random_seed=0))
    model = make_seq_ae(cfg)
    st = init_state(cfg, model, jax.random.PRNGKey(0),
                    make_optimizer(1e-3))
    variables = {"params": st.params, "batch_stats": st.batch_stats}

    B = 6
    h0 = jnp.asarray(rng.normal(size=(2, B, 32)).astype(np.float32))
    seed = jnp.asarray(rng.normal(size=(B, 16)).astype(np.float32))

    # reference path: seq_ae.decode with the seed frame tiled
    seed_seq = jnp.tile(seed[:, None, :], (1, 10, 1))
    ref = model.apply(variables, h0, seed_seq, None, method=model.decode)
    ref = np.asarray(ref)[:, 1:, :]  # drop the copied seed frame

    ys = fused_chunk_decode(seed, h0, st.params["decoder_step"],
                            st.batch_stats["decoder_step"],
                            n_steps=9, interpret=True)
    ours = np.transpose(np.asarray(ys), (1, 0, 2))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # production shapes fit one grid step; the chunk axis is blocked so
    # the answer is workload-size independent (a 30-min transcript's
    # ~1800 chunks previously overflowed the 16 MB VMEM scope)
    assert supported(200, 40, 19)


def test_decoder_block_sizing():
    """Small batches get a sublane-aligned small tile, not a padded 256
    (B=1 serving would otherwise pay a 256-row rollout)."""
    from gesture2vec_tpu.ops.decoder_pallas import BLOCK, _pick_block
    assert _pick_block(1) == 8
    assert _pick_block(8) == 8
    assert _pick_block(9) == 16
    assert _pick_block(150) == 152
    assert _pick_block(256) == BLOCK
    assert _pick_block(1800) == BLOCK


def test_fused_chunk_decoder_blocks_large_batch(rng):
    """B far above one BLOCK tiles over the grid and still matches the
    scan decoder (regression for the unblocked-VMEM-overflow gating
    bug found at the 30-min bench workload)."""
    from gesture2vec_tpu.ops import decoder_pallas as dp
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state,
                                                      make_seq_ae)

    cfg = load_config(dict(name="f2", model="seq2seq", hidden_size=16,
                           n_layers=2, dropout_prob=0.1, epochs=1,
                           batch_size=8, rep_learning_dim=8, n_poses=6,
                           n_pre_poses=1, autoencoder_vq=True,
                           autoencoder_vq_components=8, random_seed=0))
    model = make_seq_ae(cfg)
    st = init_state(cfg, model, jax.random.PRNGKey(0),
                    make_optimizer(1e-3))
    variables = {"params": st.params, "batch_stats": st.batch_stats}

    B = dp.BLOCK + 37  # forces 2 grid blocks + padding
    h0 = jnp.asarray(rng.normal(size=(2, B, 16)).astype(np.float32))
    seed = jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32))
    seed_seq = jnp.tile(seed[:, None, :], (1, 6, 1))
    ref = model.apply(variables, h0, seed_seq, None, method=model.decode)
    ref = np.asarray(ref)[:, 1:, :]

    ys = dp.fused_chunk_decode(seed, h0, st.params["decoder_step"],
                               st.batch_stats["decoder_step"],
                               n_steps=5, interpret=True)
    ours = np.transpose(np.asarray(ys), (1, 0, 2))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5)
