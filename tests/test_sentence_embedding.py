"""Sentence-embedding provider interface (the reference's GPT-3 hook:
data_preprocessor.py:459-472 stub + inference_text2embedding_GENEA.py
:57-68 caller/.gpt cache)."""
import pickle

import numpy as np

from gesture2vec_tpu.text.sentence_embedding import (
    ApiProvider, CachedProvider, ConstantProvider, HashedNGramProvider,
    import_reference_gpt_cache, load_cache, save_cache)


def test_constant_provider_matches_reference_stub():
    """The committed GPT_3_caller returns the scalar 1 before any work
    (ref: data_preprocessor.py:459-461); ConstantProvider is that."""
    p = ConstantProvider()
    np.testing.assert_array_equal(p.embed_sentence("anything at all"),
                                  np.ones(1, np.float32))


def test_hashed_provider_deterministic_and_similarity():
    p = HashedNGramProvider(dim=256, seed=3)
    a = p.embed_sentence("the quick brown fox")
    a2 = HashedNGramProvider(dim=256, seed=3).embed_sentence(
        "the quick brown fox")
    np.testing.assert_array_equal(a, a2)
    assert abs(float(np.linalg.norm(a)) - 1.0) < 1e-5
    # overlapping sentences are closer than disjoint ones
    b = p.embed_sentence("the quick brown dog")
    c = p.embed_sentence("completely unrelated words here")
    assert float(a @ b) > float(a @ c)
    # empty sentence: well-defined zero vector
    assert float(np.linalg.norm(p.embed_sentence(""))) == 0.0


def test_api_provider_adapts_and_validates():
    calls = []

    def fake(s):
        calls.append(s)
        return [0.5] * 8

    p = ApiProvider(fake, dim=8)
    out = p.embed_sentence("hi")
    assert out.shape == (8,) and calls == ["hi"]
    bad = ApiProvider(lambda s: [1.0, 2.0], dim=8)
    try:
        bad.embed_sentence("x")
        assert False, "dim mismatch not caught"
    except ValueError:
        pass


def test_cached_provider_lookup_then_call(tmp_path):
    """Reference semantics: scan the cache, only call the live provider
    on miss (ref: inference_text2embedding_GENEA.py:57-68)."""
    calls = []
    inner = ApiProvider(lambda s: (calls.append(s)
                                   or np.arange(4) + len(s)), dim=4)
    path = str(tmp_path / "emb.npz")
    p = CachedProvider(inner, path)
    e1 = p.embed_sentence("hello world")
    e2 = p.embed_sentence("hello world")
    np.testing.assert_array_equal(e1, e2)
    assert calls == ["hello world"]
    p.embed_sentence("other")
    p.save()

    # cold restart: no live calls for cached sentences
    calls2 = []
    inner2 = ApiProvider(lambda s: calls2.append(s) or np.zeros(4), dim=4)
    p2 = CachedProvider(inner2, path)
    assert p2.n_cached == 2
    np.testing.assert_array_equal(p2.embed_sentence("hello world"), e1)
    assert calls2 == []


def test_save_load_cache_roundtrip(tmp_path):
    path = str(tmp_path / "c.npz")
    cache = {"a b": np.array([1.0, 2.0], np.float32),
             "c": np.array([3.0, 4.0], np.float32)}
    save_cache(path, cache)
    loaded = load_cache(path)
    assert set(loaded) == {"a b", "c"}
    np.testing.assert_array_equal(loaded["a b"], cache["a b"])


def test_import_reference_gpt_cache(tmp_path):
    """A reference-format .gpt pickle ({sample_words_list,
    GPT_3_Embedding_list}) converts into our cache dict."""
    gpt = str(tmp_path / "transcript.gpt")
    with open(gpt, "wb") as f:
        pickle.dump({"sample_words_list": ["hello there", "bye"],
                     "GPT_3_Embedding_list": [[0.1] * 6, [0.2] * 6]}, f)
    cache = import_reference_gpt_cache(gpt)
    assert set(cache) == {"hello there", "bye"}
    assert cache["bye"].shape == (6,)
    # usable as a CachedProvider warm start
    path = str(tmp_path / "c.npz")
    save_cache(path, cache)
    p = CachedProvider(ConstantProvider(dim=6), path)
    np.testing.assert_allclose(p.embed_sentence("bye"),
                               np.full(6, 0.2, np.float32))


def test_sentence_dataset_gets_embedding_slot(rng, tmp_path):
    """build_sentence_dataset fills the GPT3_Embedding batch slot
    (ref: lmdb_data_loader.py:67-119) when a provider is passed."""
    import jax

    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.data.store import ClipStore, ClipStoreWriter
    from gesture2vec_tpu.text.vocab import Vocab
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.dae_trainer import (init_state as dae_init,
                                                   make_frame_model)
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state as sq_init,
                                                      make_seq_ae)

    d, flen = 18, 24
    root = str(tmp_path / "store")
    w = ClipStoreWriter(root)
    words = [[f"w{i}", i * 0.2, i * 0.2 + 0.15] for i in range(40)]
    w.add_clip("c0", rng.normal(size=(96, d)).astype(np.float32),
               words=words)
    w.set_stats(np.zeros(d), np.ones(d))
    w.finish()
    store = ClipStore(root)
    vocab = Vocab("t")
    for word, *_ in words:
        vocab.index_word(word)

    opt = make_optimizer(1e-3)
    dae_cfg = load_config(dict(name="d", model="DAE", hidden_size=8,
                               input_motion_dim=d, epochs=1,
                               batch_size=4, random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_init(dae_cfg, dae, jax.random.PRNGKey(0),
                                   opt).params}
    sq_cfg = load_config(dict(name="s", model="seq2seq", hidden_size=12,
                              n_layers=2, dropout_prob=0.0, epochs=1,
                              batch_size=4, rep_learning_dim=8,
                              n_poses=8, n_pre_poses=1,
                              autoencoder_vq=True,
                              autoencoder_vq_components=8,
                              random_seed=0))
    seq = make_seq_ae(sq_cfg)
    sst = sq_init(sq_cfg, seq, jax.random.PRNGKey(1), opt)

    data = build_sentence_dataset(
        store, vocab, dae_model=dae, dae_variables=dae_vars,
        seq_model=seq,
        seq_variables={"params": sst.params,
                       "batch_stats": sst.batch_stats},
        sentence_frame_length=flen, stride=flen, n_frames=8, fps=20,
        max_words=16,
        sentence_embedding=HashedNGramProvider(dim=32, seed=1))
    n = data["word_ids"].shape[0]
    assert n > 0
    assert data["sentence_emb"].shape == (n, 32)
    assert np.isfinite(data["sentence_emb"]).all()
