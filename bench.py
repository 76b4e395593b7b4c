"""Benchmark: end-to-end text -> gesture motion throughput.

The BASELINE.json north star: motion frames/sec/chip for the full
text -> tokens -> latents -> frames inference path, vs the PyTorch-CPU
reference (the reference is pure PyTorch with no committed GPU numbers,
see BASELINE.md). Both sides run the generative decode path at
production shapes (hidden 200, 512 codes, 2 layers, 20-frame chunks,
120-frame sentence windows). The JAX side runs a 30-minute transcript
(DURATION_S) to amortize the ~34 ms/call axon-tunnel dispatch floor;
the torch side runs a 120 s slice of the same workload (its frames/s is
duration-independent - no per-call dispatch floor). Both sides use the
same best-of-N retry policy (best_of_rounds); per-side round counts are
reported next to the headline number.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec", "vs_baseline": N,
   "jax_rounds": R1, "torch_rounds": R2}
"""
from __future__ import annotations

import json
import time

import numpy as np

B = 1                 # inference is single-stream like the reference CLI
N_FRAMES = 20
SENT_LEN = 120
FPS = 20
HID, L, K, REP, DIM = 200, 2, 512, 40, 135
N_WORDS, MAXW = 5000, 48
# 30-minute transcript (a long-form talk): 36000 output frames per run.
# Stage profiling showed the per-call dispatch round-trip (~34 ms)
# dwarfs the actual device compute (~3 ms per 3000 frames), so the
# workload is sized to measure the model, not the harness. The torch
# baseline has no fixed per-call cost - its frames/sec is duration-
# independent - so it runs a shorter slice of the same workload and
# reports the same throughput metric.
DURATION_S = 1800.0
TORCH_DURATION_S = 120.0
WARMUP, ITERS = 2, 5
MAX_ROUNDS = 3  # bounded retry rounds, same policy both sides


def best_of_rounds(run_once, iters: int = ITERS,
                   max_rounds: int = MAX_ROUNDS):
    """Best-of-N with bounded retry, applied identically to the JAX and
    torch sides: ambient load swings this box's timings by +-50%
    (benchmarks/README.md); the minimum over all rounds is the least
    contaminated estimate of the code's own speed. Extra rounds run only
    while they still improve the best by >5% (i.e. while we are visibly
    inside a load spike). Returns (best_seconds, rounds_used)."""
    best = float("inf")
    rounds = 0
    for _ in range(max_rounds):
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run_once()
            times.append(time.perf_counter() - t0)
        rounds += 1
        round_best = min(times)
        if round_best >= best * 0.95:
            best = min(best, round_best)
            break
        best = round_best
    return best, rounds


def _words(duration_s: float = None, seed: int = 0):
    """Synthetic transcript at ~150 words/min. Shared with
    benchmarks/serve_bench.py so both benchmarks use one workload."""
    duration_s = DURATION_S if duration_s is None else duration_s
    rng = np.random.default_rng(seed)
    n = int(2.5 * duration_s)
    starts = np.linspace(0.1, duration_s - 0.5, n)
    return [[f"word{rng.integers(200)}", float(s), float(s + 0.3)]
            for s in starts]


def build_generator(hid: int = HID, rep: int = REP, k: int = K,
                    dim: int = DIM, n_frames: int = N_FRAMES,
                    sent_len: int = SENT_LEN, n_words: int = N_WORDS,
                    max_words: int = MAXW, n_layers: int = L,
                    wordembed: int = 300, fps: int = FPS,
                    vocab_words: int = 300, mode: str = "decode",
                    bank_windows: int = 2000, token_stages: int = 1,
                    stage_conditional: bool = False,
                    t2t_arch: str = "gru", **gen_kwargs):
    """Untrained production-shape pipeline models assembled into a
    GestureGenerator. Shared by bench.py, benchmarks/serve_bench.py and
    tests/test_serve.py (at smaller dims) — output quality is
    irrelevant to all three; shapes and program structure are what is
    measured."""
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
    dae_cfg = load_config(dict(name="d", model="DAE", hidden_size=rep,
                               epochs=1, batch_size=8,
                               input_motion_dim=dim, random_seed=0))
    dae = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_init(dae_cfg, dae, jax.random.PRNGKey(0),
                                   opt).params}

    sq_cfg = load_config(dict(name="s", model="seq2seq", hidden_size=hid,
                              n_layers=n_layers, dropout_prob=0.2,
                              epochs=1, batch_size=8,
                              rep_learning_dim=rep,
                              n_poses=n_frames, n_pre_poses=1,
                              autoencoder_vq=True,
                              autoencoder_vq_components=k, random_seed=0,
                              **({"autoencoder_vq_variant": "rvq",
                                  "rvq_stages": token_stages}
                                 if token_stages > 1 else {})))
    seq = make_seq_ae(sq_cfg)
    sst = sq_init(sq_cfg, seq, jax.random.PRNGKey(1), opt)
    seq_vars = {"params": sst.params, "batch_stats": sst.batch_stats}

    t2t_cfg = load_config(dict(name="t", model="seq2seq", hidden_size=hid,
                               n_layers=n_layers, dropout_prob=0.2,
                               epochs=1, batch_size=8,
                               sentence_frame_length=sent_len,
                               n_poses=n_frames, n_pre_poses=2,
                               autoencoder_vq=True,
                               autoencoder_vq_components=k,
                               autoencoder_att=True,
                               wordembed_dim=wordembed,
                               random_seed=0, token_stages=token_stages,
                               stage_conditional=stage_conditional,
                               extras=({"t2t_arch": t2t_arch}
                                       if t2t_arch != "gru" else {})))
    t2t = make_text2token(t2t_cfg, n_words)
    tst = t2t_init(t2t, jax.random.PRNGKey(2), opt, max_words=max_words)
    t2t_vars = {"params": tst.params, "batch_stats": tst.batch_stats}

    vocab = Vocab("bench")
    for i in range(vocab_words):
        vocab.index_word(f"word{i}")

    latent_bank = None
    if mode == "exemplar":
        # synthetic bank at production shapes: retrieval cost depends on
        # bank size/shape, not on latent values
        brng = np.random.default_rng(1)
        latent_bank = {
            "dae_latents": brng.normal(
                size=(bank_windows, n_frames, rep)).astype(np.float32),
            "tokens": brng.integers(0, k, size=bank_windows,
                                    dtype=np.int32),
        }

    return GestureGenerator(
        t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq,
        seq_variables=seq_vars, dae_model=dae, dae_variables=dae_vars,
        vocab=vocab, pose_mean=np.zeros(dim, np.float32),
        pose_std=np.ones(dim, np.float32), n_frames=n_frames,
        sentence_frame_length=sent_len, fps=fps, max_words=max_words,
        mode=mode, latent_bank=latent_bank, seed=0, **gen_kwargs)


def bench_jax():
    gen = build_generator()
    words = _words()
    for _ in range(WARMUP):
        gen.generate(words, DURATION_S)
    n_frames = gen.generate(words, DURATION_S)[0].shape[0]
    best, rounds = best_of_rounds(lambda: gen.generate(words, DURATION_S))
    return n_frames / best, rounds


def make_torch_baseline_models():
    """The torch-CPU baseline models, at module call scope so
    tests/test_bench_baseline.py can pin their structure against the
    reference call graph (the actual reference cannot run in this image
    - lmdb/pyarrow.serialize/fasttext are absent - so the baseline is a
    faithful reconstruction; per-stage mapping documented in
    BASELINE.md).

    Reference stages reproduced:
      T2T.forward          <- inference_text2embedding.py:360-366 via
        text2embedding_model.py:701-744: one Python decoder step per
        token (GRU stepped with a length-1 sequence), Bahdanau attention
        re-scored per step, argmax fed back.
      ChunkDecoder.forward <- Autoencoder_VQVAE_model.py:1038-1054 via
        inference_text2embedding.py:453-519: per token, a Python loop of
        n_frames-1 single-step GRU calls (pre_linear+BN+ReLU -> GRU ->
        out), then the frame-wise DAE decode
        (inference_text2embedding.py:544-547).
    """
    import torch
    import torch.nn as nn

    n_steps = SENT_LEN // N_FRAMES

    class T2T(nn.Module):
        def __init__(self):
            super().__init__()
            self.emb = nn.Embedding(N_WORDS, 300)
            self.enc = nn.GRU(300, HID, L, bidirectional=True)
            self.tok_emb = nn.Embedding(K, HID)
            self.attn = nn.Linear(2 * HID, HID)
            self.v = nn.Parameter(torch.randn(HID))
            self.pre = nn.Linear(2 * HID, HID)
            self.bn = nn.BatchNorm1d(HID)
            self.dec = nn.GRU(HID, HID, L)
            self.out = nn.Linear(HID, K)

        def forward(self, ids):
            e = self.emb(ids).transpose(0, 1)
            outs, hidden = self.enc(e)
            outs = outs[:, :, :HID] + outs[:, :, HID:]
            h = hidden[:L].contiguous()
            tok = torch.zeros(1, dtype=torch.long)
            toks = []
            for _ in range(n_steps):
                q = h[-1].unsqueeze(0).expand(outs.shape[0], -1, -1)
                energy = torch.tanh(self.attn(
                    torch.cat([q, outs], dim=2)))
                scores = torch.einsum("tbh,h->bt", energy, self.v)
                w = torch.softmax(scores, dim=1)
                ctx = torch.einsum("bt,tbh->bh", w, outs)
                x = torch.cat([self.tok_emb(tok), ctx], dim=1)
                x = torch.relu(self.bn(self.pre(x)))
                o, h = self.dec(x.unsqueeze(0), h)
                logits = self.out(o[0])
                tok = logits.argmax(1)
                toks.append(int(tok))
            return toks

    class ChunkDecoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.codebook = nn.Parameter(torch.randn(K, L * HID))
            self.pre = nn.Linear(REP, HID)
            self.bn = nn.BatchNorm1d(HID)
            self.gru = nn.GRU(HID, HID, L)
            self.out = nn.Linear(HID, REP)
            self.dae_dec = nn.Linear(REP, DIM)

        def forward(self, tok, seed):
            h = self.codebook[tok].reshape(1, L, HID).transpose(0, 1) \
                .contiguous()
            x = seed
            lat = [x]
            for _ in range(N_FRAMES - 1):
                y = torch.relu(self.bn(self.pre(x)))
                o, h = self.gru(y.unsqueeze(0), h)
                x = self.out(o[0])
                lat.append(x)
            return self.dae_dec(torch.stack(lat, dim=0)[:, 0])

    return T2T().eval(), ChunkDecoder().eval()


def bench_torch_cpu() -> float:
    """Equivalent e2e computation with torch on CPU: per 6s window a
    GRU-attention token decoder over the text encoding, then per token a
    20-step GRU chunk rollout, then the DAE decode."""
    import torch

    t2t, dec = make_torch_baseline_models()
    rng = np.random.default_rng(0)
    ids = torch.from_numpy(rng.integers(0, N_WORDS, size=(1, MAXW)))
    n_windows = int(np.ceil(TORCH_DURATION_S / (SENT_LEN / FPS)))

    def run():
        total = 0
        with torch.no_grad():
            for _ in range(n_windows):
                toks = t2t(ids)
                seed = torch.zeros(1, REP)
                for t in toks:
                    frames = dec(t, seed)
                    total += frames.shape[0]
        return total

    for _ in range(WARMUP):
        run()
    total = run()
    best, rounds = best_of_rounds(run)
    return total / best, rounds


def main():
    jax_fps, jax_rounds = bench_jax()
    torch_fps, torch_rounds = bench_torch_cpu()
    print(json.dumps({
        "metric": "end-to-end text->gesture inference throughput",
        "value": round(jax_fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(jax_fps / torch_fps, 2),
        "jax_rounds": jax_rounds,
        "torch_rounds": torch_rounds,
    }))


if __name__ == "__main__":
    main()
