"""Audio encoders, SSL similarity step, reconstruction paths, profiling."""
import jax
import jax.numpy as jnp
import numpy as np

from gesture2vec_tpu.data.similarity import read_gesture_labels, sample_pairs
from gesture2vec_tpu.infer.reconstruct import (chunked_reconstruct,
                                               dae_roundtrip)
from gesture2vec_tpu.io.audio import mel_spectrogram
from gesture2vec_tpu.models.audio import (AudioContextEncoder,
                                          WavEncoderRaw,
                                          WavEncoderSpectral)
from gesture2vec_tpu.train.config import load_config
from gesture2vec_tpu.train.dae_trainer import make_frame_model, init_state
from gesture2vec_tpu.train.optim import make_optimizer
from gesture2vec_tpu.train.seq_ae_trainer import (init_state as sq_init,
                                                  make_seq_ae,
                                                  make_ssl_train_step)
from gesture2vec_tpu.utils.profiling import StageTimer


def test_mel_spectrogram_shape(rng):
    wav = rng.normal(size=(16000 * 2,)).astype(np.float32)
    mel = mel_spectrogram(wav)
    assert mel.shape[0] == 80
    assert mel.shape[1] >= 16000 * 2 // 655
    assert np.isfinite(mel).all()


def test_wav_encoders(rng):
    raw = jnp.asarray(rng.normal(size=(2, 16000)).astype(np.float32))
    m = WavEncoderRaw()
    v = m.init(jax.random.PRNGKey(0), raw)
    out = m.apply(v, raw)
    assert out.shape[0] == 2 and out.shape[-1] == 200

    mel = jnp.asarray(rng.normal(size=(3, 128, 32)).astype(np.float32))
    m2 = WavEncoderSpectral()
    v2 = m2.init(jax.random.PRNGKey(0), mel)
    out2 = m2.apply(v2, mel)
    assert out2.shape == (3, 200)
    assert np.abs(np.asarray(out2)).max() <= 1.0  # tanh head


def test_audio_context_encoder(rng):
    chunks = jnp.asarray(rng.normal(size=(2, 6, 128, 32)).astype(np.float32))
    m = AudioContextEncoder(hidden_size=32, n_layers=2)
    v = m.init(jax.random.PRNGKey(0), chunks)
    outs, hidden = m.apply(v, chunks)
    assert outs.shape == (6, 2, 32)
    assert hidden.shape == (4, 2, 32)


def test_similarity_labels(tmp_path):
    p = tmp_path / "labels.txt"
    p.write_text("payam,10,20,30,right,1.0\n"
                 "payam,11,21,31,left,1.0\n"
                 "payam,12,22,32,neither,1.0\n")
    pairs = read_gesture_labels(str(p))
    assert (30, 20, 1) in pairs
    assert (11, 21, 1) in pairs
    assert (32, 22, 0) in pairs and (12, 22, 0) in pairs
    a, b, l = sample_pairs(pairs, 3, np.random.default_rng(0), 100)
    assert a.shape == (3,) and set(l) <= {0.0, 1.0}


def test_ssl_train_step(rng):
    cfg = load_config(dict(name="ssl", model="seq2seq", hidden_size=16,
                           n_layers=2, dropout_prob=0.1, epochs=1,
                           batch_size=8, learning_rate=1e-3,
                           rep_learning_dim=12, n_poses=8, n_pre_poses=1,
                           autoencoder_vq=True,
                           autoencoder_vq_components=8,
                           loss_label_weight=5.5, random_seed=0,
                           loss_l1_weight=5, loss_cont_weight=0.1,
                           loss_var_weight=0.5))
    model = make_seq_ae(cfg)
    opt = make_optimizer(cfg.learning_rate)
    state = sq_init(cfg, model, jax.random.PRNGKey(0), opt)
    step = make_ssl_train_step(cfg, model, opt, 1)
    w = rng.normal(size=(8, 8, 12)).astype(np.float32)
    pa = rng.normal(size=(4, 8, 12)).astype(np.float32)
    pb = rng.normal(size=(4, 8, 12)).astype(np.float32)
    lbl = np.array([1, 0, 1, 0], np.float32)
    state, metrics = step(state, jnp.asarray(w), jnp.asarray(pa),
                          jnp.asarray(pb), jnp.asarray(lbl),
                          jax.random.PRNGKey(1), jnp.asarray(0.0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["sim"]))


def test_reconstruction_paths(rng):
    dae_cfg = load_config(dict(name="d", model="DAE", hidden_size=12,
                               epochs=1, batch_size=8, learning_rate=1e-3,
                               input_motion_dim=30, random_seed=0))
    dae = make_frame_model(dae_cfg)
    opt = make_optimizer(1e-3)
    dst = init_state(dae_cfg, dae, jax.random.PRNGKey(0), opt)
    dae_vars = {"params": dst.params}

    frames = rng.normal(size=(45, 30)).astype(np.float32)
    recon, lat = dae_roundtrip(dae, dae_vars, frames)
    assert recon.shape == frames.shape and lat.shape == (45, 12)

    sq_cfg = load_config(dict(name="s", model="seq2seq", hidden_size=16,
                              n_layers=2, dropout_prob=0.1, epochs=1,
                              batch_size=8, learning_rate=1e-3,
                              rep_learning_dim=12, n_poses=10,
                              n_pre_poses=1, autoencoder_vq=True,
                              autoencoder_vq_components=8, random_seed=0))
    seq = make_seq_ae(sq_cfg)
    sst = sq_init(sq_cfg, seq, jax.random.PRNGKey(1),
                  make_optimizer(1e-3))
    seq_vars = {"params": sst.params, "batch_stats": sst.batch_stats}

    out = chunked_reconstruct(seq, seq_vars, dae, dae_vars, frames,
                              n_poses=10, overlap=5)
    assert out.shape == frames.shape
    assert np.isfinite(out).all()

    # 5-step decoder warm-up (ref: inference_Autoencoder.py:206-209):
    # spins the hidden state, so the rollout differs from warmup=0
    warm = chunked_reconstruct(seq, seq_vars, dae, dae_vars, frames,
                               n_poses=10, overlap=5, warmup_steps=5)
    assert warm.shape == frames.shape
    assert np.isfinite(warm).all()
    assert not np.allclose(warm, out)
    # warmup=0 is deterministic and identical to the default path
    again = chunked_reconstruct(seq, seq_vars, dae, dae_vars, frames,
                                n_poses=10, overlap=5, warmup_steps=0)
    np.testing.assert_allclose(again, out, atol=1e-6)

    # attention-enabled Part-b model: the decoder reads the encoder
    # outputs at every step (previously crashed on encoder_outputs=None)
    att_cfg = load_config(dict(name="a", model="seq2seq", hidden_size=16,
                               n_layers=2, dropout_prob=0.1, epochs=1,
                               batch_size=8, learning_rate=1e-3,
                               rep_learning_dim=12, n_poses=10,
                               n_pre_poses=1, autoencoder_vq=True,
                               autoencoder_vq_components=8,
                               autoencoder_att=True, random_seed=0))
    att = make_seq_ae(att_cfg)
    ast = sq_init(att_cfg, att, jax.random.PRNGKey(2),
                  make_optimizer(1e-3))
    att_vars = {"params": ast.params, "batch_stats": ast.batch_stats}
    att_out = chunked_reconstruct(att, att_vars, dae, dae_vars, frames,
                                  n_poses=10, overlap=5, warmup_steps=2)
    assert att_out.shape == frames.shape and np.isfinite(att_out).all()

    # parity-quirk model (eval-time 0.95 step dropout, ref :570):
    # reconstruct must supply the dropout rng (previously crashed)
    par = make_seq_ae(sq_cfg, parity=True)
    pst = sq_init(sq_cfg, par, jax.random.PRNGKey(3),
                  make_optimizer(1e-3))
    par_vars = {"params": pst.params, "batch_stats": pst.batch_stats}
    par_out = chunked_reconstruct(par, par_vars, dae, dae_vars, frames,
                                  n_poses=10)
    assert par_out.shape == frames.shape and np.isfinite(par_out).all()


def test_stage_timer():
    t = StageTimer(sync=False)
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert t.counts["a"] == 2
    assert "a:" in t.report()

    # sync mode with an output sink: the stage blocks on the handed
    # arrays, so device compute is billed to the stage that ran it
    # (jax.effects_barrier alone does not wait for pure computations)
    t2 = StageTimer(sync=True)
    with t2.stage("mm") as done:
        x = jnp.ones((64, 64))
        done(jax.jit(lambda a: a @ a)(x))
    assert t2.counts["mm"] == 1 and t2.totals["mm"] > 0


def test_load_wav_uint8_centered(tmp_path):
    """8-bit PCM WAVs are unsigned, centered at 128: the decoded wave
    must be zero-mean in [-1, 1], not [0, 1] with a 0.5 DC bias."""
    from scipy.io import wavfile

    from gesture2vec_tpu.io.audio import load_wav

    t = np.arange(16000) / 16000
    wave = 0.5 * np.sin(2 * np.pi * 220 * t)
    u8 = (wave * 127 + 128).astype(np.uint8)
    p = str(tmp_path / "u8.wav")
    wavfile.write(p, 16000, u8)
    out = load_wav(p)
    assert abs(float(out.mean())) < 0.01
    assert 0.4 < float(np.abs(out).max()) <= 1.0


def test_audio2token(rng):
    from gesture2vec_tpu.models.audio2token import Audio2Token

    m = Audio2Token(n_tokens=12, hidden_size=24, n_layers=2, n_steps=4,
                    n_pre_poses=1)
    mel = jnp.asarray(rng.normal(size=(2, 4, 128, 32)).astype(np.float32))
    tgt = jnp.asarray(rng.integers(0, 12, size=(2, 4)).astype(np.int32))
    v = m.init({"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)}, mel, tgt, train=False)
    res = m.apply(v, mel, tgt, train=False)
    assert res["logits"].shape == (2, 4, 12)
    assert np.isfinite(np.asarray(res["logits"])).all()


def test_sentence_dataset_with_audio(tmp_path):
    import os
    from gesture2vec_tpu.data.ingest import ingest_trinity
    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train.dae_trainer import (
        init_state as dae_init, make_frame_model)
    from gesture2vec_tpu.train.seq_ae_trainer import (
        init_state as sq_init, make_seq_ae)
    from tests.corpus import make_corpus

    root = str(tmp_path / "c")
    make_corpus(root, n_files=2, n_frames=360, with_audio=True)
    train_dir, _ = ingest_trinity(root)
    store = ClipStore(train_dir)
    assert "audio" in store[0]

    opt = make_optimizer(1e-3)
    dae_cfg = load_config(dict(name="d", model="DAE", hidden_size=12,
                               epochs=1, batch_size=8,
                               input_motion_dim=135, random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_init(dae_cfg, dae, jax.random.PRNGKey(0),
                                   opt).params}
    sq_cfg = load_config(dict(name="s", model="seq2seq", hidden_size=16,
                              n_layers=2, dropout_prob=0.1, epochs=1,
                              batch_size=8, rep_learning_dim=12,
                              n_poses=10, n_pre_poses=1,
                              autoencoder_vq=True,
                              autoencoder_vq_components=8, random_seed=0))
    seq = make_seq_ae(sq_cfg)
    sst = sq_init(sq_cfg, seq, jax.random.PRNGKey(1), opt)
    seq_vars = {"params": sst.params, "batch_stats": sst.batch_stats}

    vocab = build_vocab("t", [[w[0] for w in c["words"]] for c in store],
                        embedding_dim=16)
    sent = build_sentence_dataset(store, vocab, dae_model=dae,
                                  dae_variables=dae_vars, seq_model=seq,
                                  seq_variables=seq_vars,
                                  sentence_frame_length=40, stride=20,
                                  n_frames=10, fps=20, max_words=16,
                                  include_audio=True,
                                  include_raw_audio=True)
    assert "mel" in sent
    # 40 frames / 20 fps = 2 seconds -> 2 one-second mel chunks
    assert sent["mel"].shape[1] == 2
    assert sent["mel"].shape[2] == 128
    assert np.isfinite(sent["mel"]).all()
    # raw 1-second chunks for the fusion encoder: same windows/segments
    # as the mel chunks (mel of wav[i] == mel[i])
    from gesture2vec_tpu.io.audio import mel_chunks_per_second
    assert sent["wav"].shape == (sent["mel"].shape[0], 2, 16000)
    np.testing.assert_allclose(
        mel_chunks_per_second(sent["wav"][0].reshape(-1), 16000),
        sent["mel"][0], atol=1e-5)
