"""Benchmark: the HTTP serving layer under concurrent load (TPU).

Measures aggregate frames/s through the FULL serving stack (HTTP +
micro-batching queue + generate_batch) for N concurrent 60 s-transcript
requests, vs the same requests issued sequentially. The point is to
show the batching collector actually delivers the generate_batch
aggregate numbers (benchmarks/README.md "Batched serving") once HTTP
and queueing overhead are included.

    python benchmarks/serve_bench.py [--clients 16] [--duration 60]
"""
from __future__ import annotations

import argparse
import base64
import json
import threading
import time
import urllib.request

import numpy as np

HID, REP, K, DIM, NF, SENT = 200, 40, 512, 135, 20, 120


def build_generator():
    import jax

    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.text.vocab import Vocab
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.dae_trainer import (init_state as dae_init,
                                                   make_frame_model)
    from gesture2vec_tpu.train.optim import make_optimizer
    from gesture2vec_tpu.train.seq_ae_trainer import (init_state as sq_init,
                                                      make_seq_ae)
    from gesture2vec_tpu.train.text2token_trainer import (
        init_state as t2t_init, make_text2token)

    opt = make_optimizer(1e-3)
    dae_cfg = load_config(dict(name="d", model="DAE", hidden_size=REP,
                               epochs=1, batch_size=8,
                               input_motion_dim=DIM, random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_init(dae_cfg, dae, jax.random.PRNGKey(0),
                                   opt).params}
    sq_cfg = load_config(dict(name="s", model="seq2seq", hidden_size=HID,
                              n_layers=2, dropout_prob=0.2, epochs=1,
                              batch_size=8, rep_learning_dim=REP,
                              n_poses=NF, n_pre_poses=1,
                              autoencoder_vq=True,
                              autoencoder_vq_components=K, random_seed=0))
    seq = make_seq_ae(sq_cfg)
    sst = sq_init(sq_cfg, seq, jax.random.PRNGKey(1), opt)
    t2t_cfg = load_config(dict(name="t", model="seq2seq", hidden_size=HID,
                               n_layers=2, dropout_prob=0.2, epochs=1,
                               batch_size=8, sentence_frame_length=SENT,
                               n_poses=NF, n_pre_poses=2,
                               autoencoder_vq=True,
                               autoencoder_vq_components=K,
                               autoencoder_att=True, wordembed_dim=300,
                               random_seed=0))
    t2t = make_text2token(t2t_cfg, 5000)
    tst = t2t_init(t2t, jax.random.PRNGKey(2), opt, max_words=48)
    vocab = Vocab("bench")
    for i in range(300):
        vocab.index_word(f"word{i}")
    return GestureGenerator(
        t2t_model=t2t, t2t_variables={"params": tst.params,
                                      "batch_stats": tst.batch_stats},
        seq_model=seq, seq_variables={"params": sst.params,
                                      "batch_stats": sst.batch_stats},
        dae_model=dae, dae_variables=dae_vars, vocab=vocab,
        pose_mean=np.zeros(DIM, np.float32),
        pose_std=np.ones(DIM, np.float32), n_frames=NF,
        sentence_frame_length=SENT, fps=20, max_words=48,
        mode="decode", seed=0)


def words_for(duration_s, seed=0):
    rng = np.random.default_rng(seed)
    n = int(2.5 * duration_s)
    starts = np.linspace(0.1, duration_s - 0.5, n)
    return [[f"word{rng.integers(200)}", float(s), float(s + 0.3)]
            for s in starts]


def fire(port, words, duration_s, out):
    body = json.dumps({"words": words, "duration_s": duration_s,
                       "format": "json"}).encode()
    req = urllib.request.Request(f"http://127.0.0.1:{port}/generate",
                                 data=body)
    with urllib.request.urlopen(req, timeout=600) as r:
        payload = json.loads(r.read())
    out.append(int(payload["frames_shape"][0]))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--duration", type=float, default=60.0)
    ap.add_argument("--window-ms", type=float, default=100.0)
    args = ap.parse_args()

    from gesture2vec_tpu.serve.server import serve

    gen = build_generator()
    httpd = serve(gen, port=0, max_batch=args.clients,
                  batch_window_s=args.window_ms / 1000.0,
                  request_timeout_s=560.0)  # covers cold-start compiles
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()

    all_words = [words_for(args.duration, seed=i)
                 for i in range(args.clients)]

    # warmup: compile the single-stream program and the full-bucket
    # batched program (the measured concurrent run reuses both)
    out = []
    fire(port, all_words[0], args.duration, out)
    ts = [threading.Thread(target=fire,
                           args=(port, all_words[i], args.duration, out))
          for i in range(args.clients)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()

    # sequential reference
    out = []
    t0 = time.perf_counter()
    for i in range(args.clients):
        fire(port, all_words[i], args.duration, out)
    seq_dt = time.perf_counter() - t0
    seq_frames = sum(out)

    # concurrent: one fused device program per collected batch
    out = []
    threads = [threading.Thread(target=fire, args=(port, all_words[i],
                                                   args.duration, out))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc_dt = time.perf_counter() - t0
    conc_frames = sum(out)

    stats = httpd.worker.stats
    print(f"serving bench ({args.clients} clients, "
          f"{args.duration:.0f}s transcripts, decode mode):")
    print(f"  sequential: {seq_frames} frames in {seq_dt:.2f}s = "
          f"{seq_frames / seq_dt:,.0f} frames/s")
    print(f"  concurrent: {conc_frames} frames in {conc_dt:.2f}s = "
          f"{conc_frames / conc_dt:,.0f} frames/s "
          f"({seq_dt / conc_dt:.2f}x)")
    print(f"  worker stats: {stats}")
    httpd.shutdown()
    httpd.worker.close()


if __name__ == "__main__":
    main()
