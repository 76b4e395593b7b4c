"""The reference-quirk switches: each must run and behave as documented."""
import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.models.c2g import Cluster2Gesture
from gesture2vec_tpu.models.seq_ae import SeqVQAutoencoder


def _model(**kw):
    base = dict(rep_dim=12, hidden_size=16, n_layers=2, n_frames=8,
                n_pre_poses=1, use_vq=True, vq_components=10)
    base.update(kw)
    return SeqVQAutoencoder(**base)


def test_eval_step_dropout_quirk(rng):
    """parity mode applies the 0.95 dropout in eval
    (ref: Autoencoder_VQVAE_model.py:570) -> stochastic eval outputs;
    default mode is deterministic."""
    x = jnp.asarray(rng.normal(size=(4, 8, 12)).astype(np.float32))
    quirk = _model(eval_step_dropout=True)
    v = quirk.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, x, train=False)
    r1 = quirk.apply(v, x, x, train=False,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    r2 = quirk.apply(v, x, x, train=False,
                     rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(r1["outputs"][:, 1:]),
                           np.asarray(r2["outputs"][:, 1:]))

    clean = _model(eval_step_dropout=False)
    c1 = clean.apply(v, x, x, train=False)
    c2 = clean.apply(v, x, x, train=False)
    np.testing.assert_allclose(np.asarray(c1["outputs"]),
                               np.asarray(c2["outputs"]))


def test_vq_flatten_modes_change_assignment(rng):
    """torch_view interleaves pairs of batch rows into VQ inputs
    (ref: Autoencoder_VQVAE_model.py:977 + the VQ layer's view);
    per_sample keeps one row per sample. Same weights, generally
    different tokens."""
    x = jnp.asarray(rng.normal(size=(8, 8, 12)).astype(np.float32) * 3)
    a = _model(vq_flatten="per_sample")
    b = _model(vq_flatten="torch_view")
    v = a.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, x, x, train=False)

    def tokens(m):
        _, hid = m.apply(v, x, method=m.encode)
        out, _ = m.apply(v, hid, method=m.quantize)
        return np.argmax(np.asarray(out.encodings), axis=1)

    ta, tb = tokens(a), tokens(b)
    assert ta.shape == tb.shape == (8,)
    # the modes are genuinely different bottleneck semantics: with
    # shared weights the assignments must differ (a silently no-op'd
    # vq_flatten flag would make them identical)
    assert not np.array_equal(ta, tb)
    assert ta.max() < 10 and tb.max() < 10


def test_c2g_frozen_hidden_quirk(rng):
    """parity_frozen_hidden reproduces the reference's decode_hidden typo
    (ref: seq2seq_with_cluster_model.py:56-61): the GRU re-reads the
    encoder hidden every step, so consecutive outputs repeat once the
    input feedback settles; the fixed decoder produces a progressing
    recurrence. Both must run; outputs differ."""
    ids = jnp.asarray(np.array([1, 2, 3], np.int32))
    fixed = Cluster2Gesture(n_clusters=5, output_size=6, hidden_size=8,
                            n_frames=6, n_layers=1,
                            parity_frozen_hidden=False)
    v = fixed.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, ids, train=False)
    quirk = Cluster2Gesture(n_clusters=5, output_size=6, hidden_size=8,
                            n_frames=6, n_layers=1,
                            parity_frozen_hidden=True)
    out_fixed = np.asarray(fixed.apply(v, ids, train=False))
    out_quirk = np.asarray(quirk.apply(v, ids, train=False))
    assert out_fixed.shape == out_quirk.shape == (3, 6, 6)
    assert not np.allclose(out_fixed, out_quirk)
