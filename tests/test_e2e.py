"""Full pipeline end-to-end: corpus -> parts a,b,d -> text -> BVH.

Mirrors the reference's chained workflow (SURVEY.md section 3): every
stage consumes the previous stage's artifacts, ending in both inference
modes (exemplar retrieval - the reference default - and generative
decode) and a written BVH file.
"""
import os

import jax
import numpy as np
import pytest

from gesture2vec_tpu.cluster.latent_dataset import (build_latent_dataset,
                                                    token_index)
from gesture2vec_tpu.data.datasets import all_frames, pose_windows
from gesture2vec_tpu.data.ingest import ingest_trinity
from gesture2vec_tpu.data.sentence import build_sentence_dataset
from gesture2vec_tpu.data.store import ClipStore
from gesture2vec_tpu.data.teacher import encode_windows_with_dae
from gesture2vec_tpu.infer.exporter import frames_to_bvh
from gesture2vec_tpu.infer.text2gesture import GestureGenerator
from gesture2vec_tpu.io.bvh import parse_bvh, write_bvh
from gesture2vec_tpu.mocap.features import FeatureExtractor
from gesture2vec_tpu.text.vocab import build_vocab
from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.dae_trainer import make_frame_model, train_dae
from gesture2vec_tpu.train.seq_ae_trainer import make_seq_ae, train_seq_ae
from gesture2vec_tpu.train.text2token_trainer import (make_text2token,
                                                      train_text2token)
from tests.corpus import make_corpus

N_POSES, SENT_LEN, FPS = 10, 40, 20
REP, HID, CODES = 16, 32, 24


@pytest.fixture(scope="module")
def pipeline_artifacts(tmp_path_factory):
    """Train the full chain once for all tests in this module."""
    root = str(tmp_path_factory.mktemp("e2e"))
    make_corpus(os.path.join(root, "corpus"), n_files=3, n_frames=360,
                with_audio=False)
    train_dir, val_dir = ingest_trinity(os.path.join(root, "corpus"))
    store = ClipStore(train_dir)

    # ---- Part a
    dae_cfg = load_config(dict(name="dae", model="DAE", hidden_size=REP,
                               epochs=4, batch_size=64,
                               learning_rate=0.005, input_motion_dim=135,
                               random_seed=0))
    dae_state, _ = train_dae(dae_cfg, all_frames(store),
                             all_frames(store)[:64])
    dae_model = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_state.params}

    # ---- Part b on frozen-DAE window latents
    windows = pose_windows(store, N_POSES, stride=5)
    latents = encode_windows_with_dae(dae_model, dae_vars, windows)
    sq_cfg = load_config(dict(name="vqvae", model="seq2seq",
                              hidden_size=HID, n_layers=2,
                              dropout_prob=0.1, epochs=3, batch_size=32,
                              learning_rate=0.002, rep_learning_dim=REP,
                              n_poses=N_POSES, n_pre_poses=1,
                              autoencoder_vq=True,
                              autoencoder_vq_components=CODES,
                              autoencoder_vq_commitment_cost=0.25,
                              autoencoder_att=False,
                              autoencoder_conditioned=True, random_seed=0))
    sq_state, _ = train_seq_ae(sq_cfg, latents, latents[:32])
    seq_model = make_seq_ae(sq_cfg)
    seq_vars = {"params": sq_state.params,
                "batch_stats": sq_state.batch_stats}

    # ---- Part c latent bank
    bank = build_latent_dataset(store, dae_model=dae_model,
                                dae_variables=dae_vars,
                                seq_model=seq_model,
                                seq_variables=seq_vars,
                                n_poses=N_POSES, stride=5)

    # ---- vocab + Part d
    vocab = build_vocab("test", [[w[0] for w in c["words"]]
                                 for c in store], embedding_dim=32)
    sent = build_sentence_dataset(store, vocab, dae_model=dae_model,
                                  dae_variables=dae_vars,
                                  seq_model=seq_model,
                                  seq_variables=seq_vars,
                                  sentence_frame_length=SENT_LEN,
                                  stride=20, n_frames=N_POSES, fps=FPS,
                                  max_words=16)
    t2t_cfg = load_config(dict(name="t2t", model="seq2seq",
                               hidden_size=HID, n_layers=2,
                               dropout_prob=0.1, epochs=4, batch_size=8,
                               learning_rate=0.003,
                               sentence_frame_length=SENT_LEN,
                               n_poses=N_POSES, n_pre_poses=1,
                               autoencoder_vq=True,
                               autoencoder_vq_components=CODES,
                               autoencoder_att=True, wordembed_dim=32,
                               random_seed=0))
    t2t_state, _ = train_text2token(
        t2t_cfg, sent, sent, vocab.n_words,
        embedding_weights=vocab.word_embedding_weights)
    t2t_model = make_text2token(t2t_cfg, vocab.n_words)
    t2t_vars = {"params": t2t_state.params,
                "batch_stats": t2t_state.batch_stats}

    return dict(root=root, store=store, vocab=vocab, bank=bank,
                dae=(dae_model, dae_vars), seq=(seq_model, seq_vars),
                t2t=(t2t_model, t2t_vars), sent=sent)


def _generator(art, mode):
    store = art["store"]
    return GestureGenerator(
        t2t_model=art["t2t"][0], t2t_variables=art["t2t"][1],
        seq_model=art["seq"][0], seq_variables=art["seq"][1],
        dae_model=art["dae"][0], dae_variables=art["dae"][1],
        vocab=art["vocab"], pose_mean=store.pose_mean,
        pose_std=store.pose_std, n_frames=N_POSES,
        sentence_frame_length=SENT_LEN, fps=FPS, max_words=16,
        mode=mode, latent_bank=art["bank"], seed=0)


WORDS = [["hello", 0.2, 0.5], ["world", 0.7, 1.0], ["this", 1.2, 1.4],
         ["is", 1.6, 1.8], ["a", 2.1, 2.3], ["test", 2.6, 2.9],
         ["of", 3.1, 3.3], ["gestures", 3.6, 4.0]]


@pytest.mark.parametrize("mode", ["exemplar", "decode"])
def test_text_to_motion(pipeline_artifacts, mode):
    gen = _generator(pipeline_artifacts, mode)
    frames, tokens = gen.generate(WORDS, duration_s=4.0)
    n_windows = 2  # 4s / (40/20)s
    assert tokens.shape == (n_windows * (SENT_LEN // N_POSES),)
    assert frames.shape == (n_windows * SENT_LEN, 135)
    assert np.isfinite(frames).all()
    # frames should look like rotation-matrix features (entries in ~[-1,1])
    assert np.abs(frames).max() < 3.0


def test_export_bvh(pipeline_artifacts, tmp_path):
    art = pipeline_artifacts
    gen = _generator(art, "exemplar")
    frames, _ = gen.generate(WORDS, duration_s=4.0)
    fe = FeatureExtractor.load(os.path.join(art["root"], "corpus",
                                            "store", "data_pipe.json"))
    out = str(tmp_path / "generated.bvh")
    frames_to_bvh(frames, fe, path=out)
    d = parse_bvh(out)
    assert d.n_frames == frames.shape[0]
    assert d.root_name == "Hips"


def test_deterministic_generation(pipeline_artifacts):
    g1 = _generator(pipeline_artifacts, "exemplar")
    g2 = _generator(pipeline_artifacts, "exemplar")
    f1, t1 = g1.generate(WORDS, duration_s=2.0)
    f2, t2 = g2.generate(WORDS, duration_s=2.0)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_allclose(f1, f2, atol=1e-6)


def test_token_index(pipeline_artifacts):
    bank = pipeline_artifacts["bank"]
    idx = token_index(bank["tokens"], CODES)
    total = sum(len(v) for v in idx.values())
    assert total == bank["tokens"].shape[0]


def test_parallel_windows_mode(pipeline_artifacts):
    """window_carry=False decodes all windows in one batched call; shape
    contract identical to the sequential default."""
    art = pipeline_artifacts
    gen = _generator(art, "decode")
    gen_fast = GestureGenerator(
        t2t_model=art["t2t"][0], t2t_variables=art["t2t"][1],
        seq_model=art["seq"][0], seq_variables=art["seq"][1],
        dae_model=art["dae"][0], dae_variables=art["dae"][1],
        vocab=art["vocab"], pose_mean=art["store"].pose_mean,
        pose_std=art["store"].pose_std, n_frames=N_POSES,
        sentence_frame_length=SENT_LEN, fps=FPS, max_words=16,
        mode="decode", latent_bank=art["bank"], seed=0,
        window_carry=False)
    f1, t1 = gen.generate(WORDS, duration_s=4.0)
    f2, t2 = gen_fast.generate(WORDS, duration_s=4.0)
    assert f1.shape == f2.shape
    assert t1.shape == t2.shape
    # first window has no carry in either mode: its tokens agree
    np.testing.assert_array_equal(t1[:SENT_LEN // N_POSES],
                                  t2[:SENT_LEN // N_POSES])


WORDS_B = [["good", 0.1, 0.4], ["morning", 0.6, 1.0],
           ["everyone", 1.3, 1.8], ["today", 2.2, 2.6],
           ["we", 2.8, 3.0], ["talk", 3.2, 3.6]]


def test_generate_batch_matches_single(pipeline_artifacts):
    """Batch-of-transcripts decode mode reproduces per-transcript
    generate() exactly (different durations in one batch)."""
    gen = _generator(pipeline_artifacts, "decode")
    singles = [gen.generate(WORDS, 4.0), gen.generate(WORDS_B, 2.0),
               gen.generate(WORDS[:3], 2.0)]
    batch = gen.generate_batch([WORDS, WORDS_B, WORDS[:3]],
                               [4.0, 2.0, 2.0])
    assert len(batch) == 3
    for (fs, ts), (fb, tb) in zip(singles, batch):
        np.testing.assert_array_equal(ts, tb)
        np.testing.assert_allclose(fs, fb, atol=1e-5)


def test_generate_batch_dp_mesh(pipeline_artifacts):
    """The transcript axis shards over a dp mesh (8 virtual CPU devices)
    with identical results; batch pads to a multiple of the dp size."""
    from gesture2vec_tpu.parallel.mesh import make_mesh

    gen = _generator(pipeline_artifacts, "decode")
    mesh = make_mesh({"dp": 4})
    single_f, single_t = gen.generate(WORDS, 4.0)
    batch = gen.generate_batch([WORDS, WORDS_B, WORDS[:3]],
                               [4.0, 2.0, 2.0], mesh=mesh)  # pads B 3->4
    assert len(batch) == 3
    np.testing.assert_array_equal(batch[0][1], single_t)
    np.testing.assert_allclose(batch[0][0], single_f, atol=1e-5)


def test_generate_batch_exemplar(pipeline_artifacts):
    """Exemplar mode batches token prediction + DAE decode; per-item
    shapes match the single path."""
    gen = _generator(pipeline_artifacts, "exemplar")
    batch = gen.generate_batch([WORDS, WORDS_B], 4.0)
    n_tok = 2 * (SENT_LEN // N_POSES)  # 4s -> 2 windows
    for frames, tokens in batch:
        assert tokens.shape == (n_tok,)
        assert frames.shape == (n_tok * N_POSES, 135)
        assert np.isfinite(frames).all()


def _sampling_generator(art, temperature, seed=0, top_k=0, **kw):
    store = art["store"]
    return GestureGenerator(
        t2t_model=art["t2t"][0], t2t_variables=art["t2t"][1],
        seq_model=art["seq"][0], seq_variables=art["seq"][1],
        dae_model=art["dae"][0], dae_variables=art["dae"][1],
        vocab=art["vocab"], pose_mean=store.pose_mean,
        pose_std=store.pose_std, n_frames=N_POSES,
        sentence_frame_length=SENT_LEN, fps=FPS, max_words=16,
        mode="decode", latent_bank=art["bank"], seed=seed,
        temperature=temperature, top_k=top_k, **kw)


def test_sampled_generation(pipeline_artifacts):
    """temperature>0 samples tokens ancestrally: reproducible from the
    generator seed, fresh across calls, valid ids; top_k=1 collapses to
    the greedy decode exactly."""
    art = pipeline_artifacts
    g1 = _sampling_generator(art, temperature=2.0, seed=0)
    g1b = _sampling_generator(art, temperature=2.0, seed=0)
    g2 = _sampling_generator(art, temperature=2.0, seed=1)
    f1, t1 = g1.generate(WORDS, duration_s=4.0)
    f1b, t1b = g1b.generate(WORDS, duration_s=4.0)
    _, t2 = g2.generate(WORDS, duration_s=4.0)
    np.testing.assert_array_equal(t1, t1b)       # seed-reproducible
    np.testing.assert_allclose(f1, f1b, atol=1e-6)
    assert not np.array_equal(t1, t2)            # seeds vary the draw
    _, t1c = g1.generate(WORDS, duration_s=4.0)  # fresh key per call
    assert not np.array_equal(t1, t1c)
    assert t1.min() >= 0 and t1.max() < CODES
    assert np.isfinite(f1).all()

    # top_k=1 at any temperature == the greedy decode bit-for-bit
    greedy = _generator(art, "decode")
    fg, tg = greedy.generate(WORDS, duration_s=4.0)
    gk = _sampling_generator(art, temperature=2.0, top_k=1)
    fk, tk = gk.generate(WORDS, duration_s=4.0)
    np.testing.assert_array_equal(tg, tk)
    np.testing.assert_allclose(fg, fk, atol=1e-6)


def test_sampled_generate_batch(pipeline_artifacts):
    """Batched sampling splits the key per transcript: two IDENTICAL
    transcripts in one batch draw different token sequences."""
    art = pipeline_artifacts
    gen = _sampling_generator(art, temperature=2.0)
    batch = gen.generate_batch([WORDS, WORDS], 4.0)
    t_a, t_b = batch[0][1], batch[1][1]
    assert t_a.shape == t_b.shape
    assert not np.array_equal(t_a, t_b)
    for frames, tokens in batch:
        assert tokens.min() >= 0 and tokens.max() < CODES
        assert np.isfinite(frames).all()


def test_sampled_exemplar_and_parallel_windows(pipeline_artifacts):
    """Sampling composes with exemplar retrieval and with
    window_carry=False (the batched-windows decode)."""
    art = pipeline_artifacts
    store = art["store"]
    gex = GestureGenerator(
        t2t_model=art["t2t"][0], t2t_variables=art["t2t"][1],
        seq_model=art["seq"][0], seq_variables=art["seq"][1],
        dae_model=art["dae"][0], dae_variables=art["dae"][1],
        vocab=art["vocab"], pose_mean=store.pose_mean,
        pose_std=store.pose_std, n_frames=N_POSES,
        sentence_frame_length=SENT_LEN, fps=FPS, max_words=16,
        mode="exemplar", latent_bank=art["bank"], seed=0,
        temperature=1.0)
    frames, tokens = gex.generate(WORDS, duration_s=4.0)
    assert tokens.min() >= 0 and tokens.max() < CODES
    assert np.isfinite(frames).all()

    gpw = _sampling_generator(art, temperature=2.0, window_carry=False)
    f2, t2 = gpw.generate(WORDS, duration_s=4.0)
    assert t2.shape == tokens.shape
    assert np.isfinite(f2).all()


def test_beam_generation(pipeline_artifacts):
    """Beam decode: beam_width=1 reproduces greedy bit-for-bit;
    beam_width=4 runs in both window modes with valid output; beam and
    temperature are mutually exclusive."""
    art = pipeline_artifacts
    greedy = _generator(art, "decode")
    fg, tg = greedy.generate(WORDS, duration_s=4.0)

    g1 = _sampling_generator(art, temperature=0.0, top_k=0, beam_width=1)
    f1, t1 = g1.generate(WORDS, duration_s=4.0)
    np.testing.assert_array_equal(t1, tg)
    np.testing.assert_allclose(f1, fg, atol=1e-6)

    g4 = _sampling_generator(art, temperature=0.0, beam_width=4)
    f4, t4 = g4.generate(WORDS, duration_s=4.0)
    assert t4.shape == tg.shape
    assert t4.min() >= 0 and t4.max() < CODES
    assert np.isfinite(f4).all()
    # deterministic
    _, t4b = g4.generate(WORDS, duration_s=4.0)
    np.testing.assert_array_equal(t4, t4b)

    gpw = _sampling_generator(art, temperature=0.0, beam_width=4,
                              window_carry=False)
    fpw, tpw = gpw.generate(WORDS, duration_s=4.0)
    assert tpw.shape == tg.shape
    assert np.isfinite(fpw).all()

    with pytest.raises(ValueError):
        _sampling_generator(art, temperature=1.0, beam_width=4)


def test_exemplar_continuity_retrieval(pipeline_artifacts):
    """Continuity-aware retrieval picks, per token, the candidate
    window whose opening latent is nearest the previous pick's closing
    latent — so the mean splice jump can only be <= the random policy's
    (same tokens, argmin over the same candidate sets)."""
    art = pipeline_artifacts
    gen_r = _generator(art, "exemplar")
    f_r, t_r = gen_r.generate(WORDS, duration_s=4.0)
    gen_c = GestureGenerator(
        t2t_model=art["t2t"][0], t2t_variables=art["t2t"][1],
        seq_model=art["seq"][0], seq_variables=art["seq"][1],
        dae_model=art["dae"][0], dae_variables=art["dae"][1],
        vocab=art["vocab"], pose_mean=art["store"].pose_mean,
        pose_std=art["store"].pose_std, n_frames=N_POSES,
        sentence_frame_length=SENT_LEN, fps=FPS, max_words=16,
        mode="exemplar", latent_bank=art["bank"], seed=0,
        exemplar_continuity=True)
    f_c, t_c = gen_c.generate(WORDS, duration_s=4.0)
    np.testing.assert_array_equal(t_c, t_r)   # same predicted tokens
    assert f_c.shape == f_r.shape
    assert np.isfinite(f_c).all()

    def jump(f):
        ks = np.arange(N_POSES, f.shape[0], N_POSES)
        return float(np.mean(np.linalg.norm(f[ks] - f[ks - 1], axis=1)))

    # argmin over each candidate set cannot lose to a uniform draw over
    # the same sets in expectation; on this fixture assert <=
    assert jump(f_c) <= jump(f_r) + 1e-6

    # bank-level contract: each pick opens at the candidate nearest the
    # previous pick's close
    bank = gen_c._exemplars
    picks = bank.pick_indices_continuity(t_c)
    lats = np.asarray(art["bank"]["dae_latents"], np.float32)
    for i in range(1, len(picks)):
        cand = bank._index[bank._resolve(int(t_c[i]))]
        d = np.sum((lats[cand, 0] - lats[picks[i - 1], -1]) ** 2, axis=1)
        assert picks[i] == cand[np.argmin(d)]

    # batched path chains per transcript, same contract
    batch = gen_c.generate_batch([WORDS, WORDS_B], 4.0)
    for frames, tokens in batch:
        assert np.isfinite(frames).all()


def test_decode_overlap_blend(pipeline_artifacts):
    """Overlap-blended decode: frames outside the b-frame blend regions
    are bit-identical to the plain decode (same rollout prefix); the
    chunk-boundary jump shrinks; exclusivity with chunk_continuity."""
    art = pipeline_artifacts
    plain = _generator(art, "decode")
    f0, t0 = plain.generate(WORDS, duration_s=4.0)
    gb = _sampling_generator(art, temperature=0.0, decode_overlap=3)
    fb, tb = gb.generate(WORDS, duration_s=4.0)
    np.testing.assert_array_equal(tb, t0)
    assert fb.shape == f0.shape
    b = 3
    for k in range(f0.shape[0] // N_POSES):
        s = k * N_POSES
        lo = s + (b if k else 0)
        np.testing.assert_allclose(fb[lo:s + N_POSES],
                                   f0[lo:s + N_POSES], atol=1e-5)

    def jump(f):
        ks = np.arange(N_POSES, f.shape[0], N_POSES)
        return float(np.mean(np.linalg.norm(f[ks] - f[ks - 1], axis=1)))

    assert jump(fb) < jump(f0)

    with pytest.raises(ValueError):
        _sampling_generator(art, temperature=0.0, decode_overlap=3,
                            chunk_continuity=True)


def test_soft_decode(pipeline_artifacts):
    """Soft-mixture decode (soft_decode>0): the chunk hidden becomes the
    Part-d-probability-weighted codebook mixture. Tokens are unchanged
    (the mixture replaces only the hidden); a near-argmax mixture
    temperature converges to the hard decode; the batch path matches
    the single path; chunk_continuity composes; exemplar/beam combos
    are rejected."""
    art = pipeline_artifacts
    plain = _generator(art, "decode")
    f0, t0 = plain.generate(WORDS, duration_s=4.0)

    # near-zero mixture temperature -> softmax ~ one-hot(argmax) ->
    # the hard decode (stable softmax, so 1e-4 is safe)
    g_eps = _sampling_generator(art, temperature=0.0, soft_decode=1e-4)
    fe, te = g_eps.generate(WORDS, duration_s=4.0)
    np.testing.assert_array_equal(te, t0)
    np.testing.assert_allclose(fe, f0, atol=1e-3)

    # T=1 mixture: same tokens, different finite frames
    g1 = _sampling_generator(art, temperature=0.0, soft_decode=1.0)
    f1, t1 = g1.generate(WORDS, duration_s=4.0)
    np.testing.assert_array_equal(t1, t0)
    assert np.isfinite(f1).all()
    assert not np.allclose(f1, f0, atol=1e-3)

    # batched transcripts reproduce the single path
    outs = g1.generate_batch([WORDS, WORDS], 4.0)
    np.testing.assert_array_equal(outs[0][1], t1)
    np.testing.assert_allclose(outs[0][0], f1, atol=1e-4)

    # composes with chunk_continuity (dict-xs scan path)
    gc = _sampling_generator(art, temperature=0.0, soft_decode=1.0,
                             chunk_continuity=True)
    fc, tc = gc.generate(WORDS, duration_s=4.0)
    np.testing.assert_array_equal(tc, t0)
    assert np.isfinite(fc).all()

    # invalid combinations fail fast
    with pytest.raises(ValueError):
        GestureGenerator(
            t2t_model=art["t2t"][0], t2t_variables=art["t2t"][1],
            seq_model=art["seq"][0], seq_variables=art["seq"][1],
            dae_model=art["dae"][0], dae_variables=art["dae"][1],
            vocab=art["vocab"], pose_mean=art["store"].pose_mean,
            pose_std=art["store"].pose_std, n_frames=N_POSES,
            sentence_frame_length=SENT_LEN, fps=FPS, max_words=16,
            mode="exemplar", latent_bank=art["bank"], soft_decode=1.0)
    with pytest.raises(ValueError):
        _sampling_generator(art, temperature=0.0, soft_decode=1.0,
                            beam_width=3)


def test_text_context_window_lookup(pipeline_artifacts):
    """text_context_s: the generator's per-window word lookup extends
    backwards by context_s (a word that ended before t0 is included);
    0 keeps the reference's window-local rule."""
    art = pipeline_artifacts
    plain = _generator(art, "decode")
    gctx = _sampling_generator(art, temperature=0.0, text_context_s=2.0)
    words = [["early", 0.2, 0.8], ["hello", 3.1, 3.4],
             ["world", 3.6, 3.9], ["more", 4.1, 4.4],
             ["words", 4.6, 4.9]]
    # window [3.0, 6.0): "early" (ends 0.8) is outside even with 2 s of
    # context; window [3.0,6.0) with t0-2.0=1.0 still excludes it, but
    # a word ending at 1.5 would be included — test both boundaries
    ids_p, len_p = plain._window_word_ids(words, 3.0, 6.0)
    ids_c, len_c = gctx._window_word_ids(words, 3.0, 6.0)
    assert len_c == len_p  # "early" ends before t0 - 2
    words2 = [["early", 0.2, 1.5]] + words[1:]
    ids_p2, len_p2 = plain._window_word_ids(words2, 3.0, 6.0)
    ids_c2, len_c2 = gctx._window_word_ids(words2, 3.0, 6.0)
    assert len_p2 == len_p and len_c2 == len_p + 1
    v = art["vocab"]
    assert ids_c2[0] == v.words_to_ids(["early"])[0]
    # generation still runs end to end with the extended lookup
    frames, tokens = gctx.generate(words2, duration_s=6.0)
    assert np.isfinite(frames).all()
