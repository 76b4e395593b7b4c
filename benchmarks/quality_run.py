"""End-to-end output-quality run: train a/b/d to convergence, then
reproduce the reference's objective evaluation (Hellinger / Frechet /
token perplexity / Wasserstein / BLEU - ref: scripts/Clustering.py:
1353-1628 Metrics_analysis + the per-epoch eval loops,
train_autoencoder_VQVAE.py:350-410) on generated-vs-held-out gestures.

The licensed Trinity corpus cannot exist in this image, so the corpus
is synthetic WITH REAL TEXT->MOTION STRUCTURE: a fixed vocabulary maps
words onto M gesture "motifs" (distinct posture + oscillation patterns
per joint channel), and each clip's motion follows the motif of the
word being spoken (smooth crossfades between words). The chain
therefore has a learnable ground truth: Part b must tokenize motifs
consistently and Part d must map words to the right motif tokens.

Run (writes artifacts + metrics into OUT, ~10-20 min on the TPU):
    python benchmarks/quality_run.py /tmp/quality_out
    python benchmarks/quality_run.py /tmp/q_fast --fast   # smoke sizes

Artifacts: metrics.json, loss_curves.png, token_histograms.png,
generated_sample.bvh + ground_truth_sample.bvh, checkpoints, and the
clusters/Metrics.txt written by the g2v-cluster equivalent pass.
QUALITY.md at the repo root is authored from metrics.json.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

FPS_RAW = 60          # BVH framerate; ingest downsamples to 20
WORD_DUR = 0.5        # seconds per spoken word
N_MOTIFS = 10
VOCAB = [f"motif{m}word{v}" for m in range(N_MOTIFS) for v in range(3)]

# --hard corpus (round 4): the standard corpus saturates Part d by
# epoch ~40 (QUALITY.md: train CE 0.23 vs val 2.5) so modeling gains
# vanish into the dataset ceiling. Hard mode raises it: 16 motifs x 4
# surface words (64 one-hot words) PLUS 32 compositional pair words
# whose motion is the 50/50 blend of two motifs — the word->token
# mapping can no longer be memorized per-motif, it must compose.
N_MOTIFS_HARD = 16
HARD_WORDS_PER_MOTIF = 4
HARD_N_PAIRS = 32


def motif_of(word: str) -> int:
    return VOCAB.index(word) % N_MOTIFS


def _vocab_weights(hard: bool, n_motifs: int, seed: int):
    """word -> motif-weight vector. One-hot for every surface word;
    hard mode adds 50/50 pair words over deterministic motif pairs."""
    if not hard:
        return {w: _onehot(motif_of(w), n_motifs) for w in VOCAB}
    words = {}
    for m in range(n_motifs):
        for v in range(HARD_WORDS_PER_MOTIF):
            words[f"motif{m}word{v}"] = _onehot(m, n_motifs)
    prng = np.random.default_rng(seed + 1000)
    pairs = set()
    while len(pairs) < HARD_N_PAIRS:
        a, b = sorted(prng.integers(n_motifs, size=2).tolist())
        if a != b:
            pairs.add((a, b))
    for a, b in sorted(pairs):
        w = np.zeros(n_motifs)
        w[a] = w[b] = 0.5
        words[f"blend{a}x{b}"] = w
    return words


def _onehot(m: int, n: int) -> np.ndarray:
    w = np.zeros(n)
    w[m] = 1.0
    return w


def make_motif_corpus(root: str, n_files: int, duration_s: float,
                      seed: int = 0, hard: bool = False) -> str:
    """Trinity-layout corpus whose motion is word-conditioned."""
    import json as _json

    from tests.fixtures import _SKELETON, _emit

    os.makedirs(os.path.join(root, "Motion"), exist_ok=True)
    os.makedirs(os.path.join(root, "Transcripts"), exist_ok=True)
    rng = np.random.default_rng(seed)
    n_motifs = N_MOTIFS_HARD if hard else N_MOTIFS
    vocab_w = _vocab_weights(hard, n_motifs, seed)
    # default path keeps VOCAB's exact order (committed corpora must
    # reproduce bit-for-bit); hard mode sorts for determinism
    vocab = VOCAB if not hard else sorted(vocab_w)

    # skeleton text + channel layout (shared across clips)
    lines = ["HIERARCHY"]
    channel_joints: list = []
    _emit("Hips", 0, lines, channel_joints)
    hierarchy = "\n".join(lines) + "\n"
    n_rot = len(channel_joints) * 3

    # per-motif channel signatures: posture + oscillation
    base = rng.uniform(-25.0, 25.0, size=(n_motifs, n_rot))
    amp = rng.uniform(4.0, 18.0, size=(n_motifs, n_rot))
    freq = rng.uniform(0.8, 3.0, size=(n_motifs, n_rot))
    phase = rng.uniform(0, 2 * np.pi, size=(n_motifs, n_rot))

    n_frames = int(duration_s * FPS_RAW)
    t = np.arange(n_frames) / FPS_RAW
    fade = 0.15  # crossfade seconds at word boundaries

    for i in range(n_files):
        # word schedule: back-to-back words, WORD_DUR each
        n_words = int(duration_s / WORD_DUR) - 1
        words = [vocab[rng.integers(len(vocab))] for _ in range(n_words)]
        starts = np.arange(n_words) * WORD_DUR + 0.05

        # per-frame motif weights with cosine crossfades; hard-mode
        # pair words carry a 0.5/0.5 vector (compositional blend),
        # one-hot words reduce to the original column add exactly
        weights = np.zeros((n_frames, n_motifs))
        for w_i, (word, s) in enumerate(zip(words, starts)):
            wvec = vocab_w[word]
            e = s + WORD_DUR
            ramp_in = np.clip((t - s) / fade, 0.0, 1.0)
            ramp_out = np.clip((e - t) / fade, 0.0, 1.0)
            env = np.minimum(ramp_in, ramp_out) ** 2
            for m in np.nonzero(wvec)[0]:
                weights[:, m] += wvec[m] * env
        weights[weights.sum(1) == 0, 0] = 1.0
        weights /= weights.sum(1, keepdims=True)

        osc = base[None] + amp[None] * np.sin(
            freq[None] * t[:, None, None] + phase[None])   # (T, M, C)
        rots = np.einsum("tm,tmc->tc", weights, osc)
        # tiny per-clip jitter so windows are not bit-identical
        rots = rots + rng.normal(0, 0.4, size=rots.shape)

        cols, r = [], 0
        for j in channel_joints:
            if j == "Hips":
                cols += [2.0 * np.sin(0.3 * t), 95.0 + 0.3 * np.sin(0.7 * t),
                         1.2 * np.cos(0.35 * t)]
            cols += [rots[:, r], rots[:, r + 1], rots[:, r + 2]]
            r += 3
        motion = np.stack(cols, axis=1)

        name = f"Recording_{i:03d}"
        with open(os.path.join(root, "Motion", name + ".bvh"), "w") as f:
            f.write(hierarchy)
            f.write("MOTION\n")
            f.write(f"Frames: {n_frames}\n")
            f.write(f"Frame Time: {1.0 / FPS_RAW:.6f}\n")
            for row in motion:
                f.write(" ".join(f"{v:.6f}" for v in row) + "\n")
        transcript = [{"word": w, "start_time": f"{s:.2f}s",
                       "end_time": f"{s + WORD_DUR - 0.05:.2f}s"}
                      for w, s in zip(words, starts)]
        with open(os.path.join(root, "Transcripts", name + ".json"),
                  "w") as f:
            _json.dump(transcript, f)
    return root


def token_latent_battery(pairs, gen_seq_latents, bank_train, bank_val,
                         codes):
    """Pooled generated-vs-ground-truth metric battery shared by every
    quality harness (quality_run/quality_genea/quality_misc), mirroring
    the reference's Metrics_analysis (ref: Clustering.py:1353-1628).

    pairs: per-clip (gen_tokens, gt_tokens) arrays, already aligned and
    trimmed to equal length; gen_seq_latents (N, L*H) from re-encoding
    the generated motion through the frozen teachers."""
    from gesture2vec_tpu.cluster.metrics import (corpus_bleu,
                                                 frechet_distance,
                                                 hellinger,
                                                 token_histogram,
                                                 token_perplexity,
                                                 wasserstein_distance)

    gen_tokens = np.concatenate([p[0] for p in pairs])
    gt_tokens = np.concatenate([p[1] for p in pairs])
    hist_gen = token_histogram(gen_tokens, codes)
    hist_gt = token_histogram(gt_tokens, codes)
    return {
        "hellinger": float(hellinger(hist_gen, hist_gt)),
        "frechet_seq_latents": float(frechet_distance(
            gen_seq_latents, bank_val["seq_latents"])),
        "frechet_floor_train_vs_val": float(frechet_distance(
            bank_train["seq_latents"], bank_val["seq_latents"])),
        "token_perplexity_generated": float(
            token_perplexity(gen_tokens, codes)),
        "token_perplexity_ground_truth": float(
            token_perplexity(gt_tokens, codes)),
        "wasserstein": float(wasserstein_distance(gen_tokens,
                                                  gt_tokens)),
        "bleu": float(corpus_bleu([p[0].tolist() for p in pairs],
                                  [p[1].tolist() for p in pairs],
                                  max_n=4)),
        "token_accuracy": float((gen_tokens == gt_tokens).mean()),
        "n_tokens_compared": int(len(gen_tokens)),
        "_hist_gen": hist_gen.tolist(),
        "_hist_gt": hist_gt.tolist(),
    }


def eval_generated_vs_gt(gen, store, val_store, dae, dae_vars, seq,
                         seq_vars, n_frames_chunk, codes, bank_val,
                         bank_train, fps, smooth_generated=False):
    """Generate motion for every val clip from its transcript alone,
    push generated + real held-out motion through the frozen teachers,
    and compute the reference's metric battery (Clustering.py:1353-1628
    equivalents). Returns (metrics dict, generated frame arrays).

    smooth_generated: apply the production export smoothing (savgol
    25/5, ref: inference_text2embedding.py:796-834) to the generated
    frames before the teacher re-encode - measures the motion the BVH
    consumer actually sees."""
    import jax
    import jax.numpy as jnp

    from gesture2vec_tpu.data.datasets import normalize
    from gesture2vec_tpu.data.teacher import (encode_windows_with_dae,
                                              tokenize_windows)

    gen_tokens_all, gt_tokens_all = [], []
    gen_frames_list = []
    for clip in val_store:
        words = [[w, s, e] for w, s, e in clip["words"]]
        dur = clip["poses"].shape[0] / fps
        frames, tokens = gen.generate(words, duration_s=dur)
        frames = np.asarray(frames)
        if smooth_generated:
            from gesture2vec_tpu.infer.smoothing import savgol
            frames = savgol(frames)
        gen_frames_list.append(frames)
        gen_tokens_all.append(np.asarray(tokens).reshape(-1))
        # aligned GT teacher tokens for the same clip
        gt_norm = normalize(clip["poses"], store.pose_mean,
                            store.pose_std)
        n_chunks = min(frames.shape[0],
                       gt_norm.shape[0]) // n_frames_chunk
        gt_chunks = gt_norm[:n_chunks * n_frames_chunk].reshape(
            n_chunks, n_frames_chunk, -1)
        gt_lat = encode_windows_with_dae(dae, dae_vars, gt_chunks)
        gt_tok, _ = tokenize_windows(seq, seq_vars, gt_lat)
        gt_tokens_all.append(np.asarray(gt_tok).reshape(-1))

    # trim to aligned lengths per clip, then pool
    pairs = [(g[:min(len(g), len(r))], r[:min(len(g), len(r))])
             for g, r in zip(gen_tokens_all, gt_tokens_all)]

    # FGD on sequence latents: re-encode the GENERATED motion through
    # the frozen teachers and compare to the val corpus latents
    # (ref: Clustering.py:1252-1315 applied to latent_rnn)
    # jitted ONCE outside the loop: a fresh jax.jit(lambda) per clip
    # would retrace/recompile every iteration
    seq_encode = jax.jit(
        lambda x: seq.apply(seq_vars, x, method=seq.encode))
    gen_lat_list = []
    for gf in gen_frames_list:
        gfn = normalize(gf, store.pose_mean, store.pose_std)
        n_chunks = gfn.shape[0] // n_frames_chunk
        chunks = gfn[:n_chunks * n_frames_chunk].reshape(
            n_chunks, n_frames_chunk, -1)
        lat = encode_windows_with_dae(dae, dae_vars, chunks)
        _, hidden = seq_encode(jnp.asarray(lat))
        L, B, H = hidden.shape
        gen_lat_list.append(np.asarray(
            jnp.transpose(hidden, (1, 0, 2)).reshape(B, L * H)))
    gen_seq_latents = np.concatenate(gen_lat_list, axis=0)

    metrics = token_latent_battery(pairs, gen_seq_latents, bank_train,
                                   bank_val, codes)
    return metrics, gen_frames_list


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--fast", action="store_true",
                    help="smoke sizes (~2 min CPU)")
    ap.add_argument("--hard", action="store_true",
                    help="harder corpus: 16 motifs, 96-word vocab with "
                         "32 compositional pair words, 2x clips — "
                         "raises the dataset ceiling so Part-d "
                         "modeling gains stay measurable")
    ap.add_argument("--platform", default=None,
                    help="cpu to force off the TPU")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from gesture2vec_tpu.cluster.latent_dataset import build_latent_dataset
    from gesture2vec_tpu.cluster.metrics import (corpus_bleu,
                                                 frechet_distance,
                                                 hellinger,
                                                 token_histogram,
                                                 token_perplexity,
                                                 wasserstein_distance)
    from gesture2vec_tpu.data.datasets import (all_frames, normalize,
                                               pose_windows)
    from gesture2vec_tpu.data.ingest import ingest_trinity
    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.data.teacher import (encode_windows_with_dae,
                                              tokenize_windows)
    from gesture2vec_tpu.infer.exporter import frames_to_bvh
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.mocap.features import FeatureExtractor
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.dae_trainer import (make_frame_model,
                                                   train_dae)
    from gesture2vec_tpu.train.seq_ae_trainer import (make_seq_ae,
                                                      train_seq_ae)
    from gesture2vec_tpu.train.text2token_trainer import (
        make_text2token, token_histogram_perplexity, train_text2token)

    logging.basicConfig(level=logging.INFO)
    print("backend:", jax.devices()[0].platform)
    os.makedirs(args.out, exist_ok=True)

    fast = args.fast
    n_files = (4 if fast else 12) * (2 if args.hard else 1)
    duration_s = 30.0 if fast else 120.0
    n_frames_chunk, sent_len, fps = 20, 120, 20
    codes = 32 if fast else 64
    rep = 40
    hid_b = 64 if fast else 200
    bs_b = 32 if fast else 128    # val window counts must cover one batch
    bs_d = 4 if fast else 32

    # ---------------- corpus + ingest ----------------
    corpus = os.path.join(args.out, "corpus")
    if not os.path.exists(os.path.join(corpus, "store", "train",
                                       "meta.msgpack")):
        make_motif_corpus(corpus, n_files=n_files, duration_s=duration_s,
                          hard=args.hard)
        ingest_trinity(corpus, tgt_fps=fps, with_audio=False)
    store = ClipStore(os.path.join(corpus, "store", "train"))
    val_store = ClipStore(os.path.join(corpus, "store", "val"))
    # a cached corpus from a different --fast/size run would silently
    # train on the wrong data while metrics.json records the requested
    # sizes - fail fast on mismatch (mirror augmentation doubles clips,
    # first file + its mirror are held out)
    if (len(store) != 2 * (n_files - 1)
            or abs(store[0]["poses"].shape[0] - duration_s * fps) > fps):
        raise SystemExit(
            f"cached corpus at {corpus} does not match the requested "
            f"sizes (found {len(store)} train clips of "
            f"{store[0]['poses'].shape[0]} frames, expected "
            f"{2 * (n_files - 1)} of ~{int(duration_s * fps)}); delete "
            f"it or use a fresh out dir")
    print(f"corpus: {len(store)} train clips, {len(val_store)} val")

    # ---------------- Part a ----------------
    dae_cfg = load_config(dict(
        name="dae", model="DAE", hidden_size=rep,
        epochs=(6 if fast else 40), batch_size=512,
        learning_rate=0.002, input_motion_dim=135, random_seed=0,
        model_save_path=os.path.join(args.out, "dae")))
    dae_state, dae_hist = train_dae(
        dae_cfg, all_frames(store),
        all_frames(val_store, store.pose_mean, store.pose_std),
        save_dir=os.path.join(args.out, "dae"), save_every=1000)
    dae = make_frame_model(dae_cfg)
    dae_vars = {"params": dae_state.params}
    print(f"part a: val MSE {dae_hist['val_loss'][-1]:.5f}")

    # ---------------- Part b ----------------
    train_wins = pose_windows(store, n_frames_chunk, n_frames_chunk // 2)
    val_wins = pose_windows(val_store, n_frames_chunk, n_frames_chunk // 2,
                            store.pose_mean, store.pose_std)
    lat_train = encode_windows_with_dae(dae, dae_vars, train_wins)
    lat_val = encode_windows_with_dae(dae, dae_vars, val_wins)
    sq_cfg = load_config(dict(
        name="vqvae", model="seq2seq", hidden_size=hid_b, n_layers=2,
        dropout_prob=0.1, epochs=(8 if fast else 80), batch_size=bs_b,
        learning_rate=0.002, rep_learning_dim=rep,
        n_poses=n_frames_chunk, n_pre_poses=1, autoencoder_vq=True,
        autoencoder_vq_components=codes, random_seed=0,
        model_save_path=os.path.join(args.out, "vqvae")))
    sq_state, sq_hist = train_seq_ae(
        sq_cfg, lat_train, lat_val,
        save_dir=os.path.join(args.out, "vqvae"), save_every=1000)
    seq = make_seq_ae(sq_cfg)
    seq_vars = {"params": sq_state.params,
                "batch_stats": sq_state.batch_stats}
    print(f"part b: val loss {sq_hist['val_loss'][-1]:.4f}, "
          f"codebook perplexity {sq_hist['perplexity'][-1]:.1f}/{codes}")

    # ---------------- Part d ----------------
    vocab = build_vocab("quality", [[w[0] for w in c["words"]]
                                    for c in store],
                        embedding_dim=100)
    sent = build_sentence_dataset(
        store, vocab, dae_model=dae, dae_variables=dae_vars,
        seq_model=seq, seq_variables=seq_vars,
        sentence_frame_length=sent_len, stride=30,
        n_frames=n_frames_chunk, fps=fps, max_words=24)
    sent_val = build_sentence_dataset(
        val_store, vocab, dae_model=dae, dae_variables=dae_vars,
        seq_model=seq, seq_variables=seq_vars,
        sentence_frame_length=sent_len, stride=sent_len,
        n_frames=n_frames_chunk, fps=fps, max_words=24,
        mean=store.pose_mean, std=store.pose_std)
    t2t_cfg = load_config(dict(
        name="t2t", model="seq2seq", hidden_size=hid_b, n_layers=2,
        dropout_prob=0.1, epochs=(10 if fast else 120), batch_size=bs_d,
        learning_rate=0.001, sentence_frame_length=sent_len,
        n_poses=n_frames_chunk, n_pre_poses=1, autoencoder_vq=True,
        autoencoder_vq_components=codes, autoencoder_att=True,
        wordembed_dim=100, random_seed=0,
        model_save_path=os.path.join(args.out, "t2t")))
    t2t_state, t2t_hist = train_text2token(
        t2t_cfg, sent, sent_val, vocab.n_words,
        embedding_weights=vocab.word_embedding_weights,
        save_dir=os.path.join(args.out, "t2t"), save_every=1000)
    t2t = make_text2token(t2t_cfg, vocab.n_words)
    t2t_vars = {"params": t2t_state.params,
                "batch_stats": t2t_state.batch_stats}
    print(f"part d: val CE {t2t_hist['val_loss'][-1]:.4f}, "
          f"val acc {t2t_hist['val_acc'][-1]:.3f}")

    # ---------------- Part c latent dataset (train vs val) ----------
    bank = build_latent_dataset(store, dae_model=dae,
                                dae_variables=dae_vars, seq_model=seq,
                                seq_variables=seq_vars,
                                n_poses=n_frames_chunk,
                                stride=n_frames_chunk)
    bank_val = build_latent_dataset(val_store, dae_model=dae,
                                    dae_variables=dae_vars,
                                    seq_model=seq, seq_variables=seq_vars,
                                    n_poses=n_frames_chunk,
                                    stride=n_frames_chunk,
                                    mean=store.pose_mean,
                                    std=store.pose_std)

    # ---------------- generated vs ground truth on VAL -------------
    # Generate motion for each val clip from its transcript alone
    # (production decode mode, window token carry), then compare
    # against the held-out real motion through the frozen teachers.
    fe = FeatureExtractor.load(os.path.join(corpus, "store",
                                            "data_pipe.json"))
    gen = GestureGenerator(
        t2t_model=t2t, t2t_variables=t2t_vars, seq_model=seq,
        seq_variables=seq_vars, dae_model=dae, dae_variables=dae_vars,
        vocab=vocab, pose_mean=store.pose_mean, pose_std=store.pose_std,
        n_frames=n_frames_chunk, sentence_frame_length=sent_len,
        fps=fps, max_words=24, mode="decode", latent_bank=bank, seed=0)

    gvg, gen_frames_list = eval_generated_vs_gt(
        gen, store, val_store, dae, dae_vars, seq, seq_vars,
        n_frames_chunk, codes, bank_val, bank, fps)
    hist_gen = np.asarray(gvg.pop("_hist_gen"))
    hist_gt = np.asarray(gvg.pop("_hist_gt"))

    metrics = {
        "corpus": {"n_files": n_files, "duration_s": duration_s,
                   "hard": args.hard, "codes": codes, "hidden": hid_b,
                   "train_windows": int(lat_train.shape[0]),
                   "train_sentences": int(sent["tokens"].shape[0]),
                   "val_sentences": int(sent_val["tokens"].shape[0])},
        "part_a": {"val_mse_first": dae_hist["val_loss"][0],
                   "val_mse_last": dae_hist["val_loss"][-1]},
        "part_b": {"val_loss_first": sq_hist["val_loss"][0],
                   "val_loss_last": sq_hist["val_loss"][-1],
                   "codebook_perplexity": sq_hist["perplexity"][-1]},
        "part_d": {"val_ce_first": t2t_hist["val_loss"][0],
                   "val_ce_last": t2t_hist["val_loss"][-1],
                   "val_acc": t2t_hist["val_acc"][-1]},
        "generated_vs_ground_truth": gvg,
    }
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics["generated_vs_ground_truth"], indent=2))

    # ---------------- artifacts ----------------
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 4, figsize=(18, 3.5))
    for ax, (title, hist_d, keys) in zip(axes, [
            ("Part a (DAE)", dae_hist, ("train_loss", "val_loss")),
            ("Part b (VQ-VAE)", sq_hist, ("train_loss", "val_loss")),
            ("Part b codebook ppl", sq_hist, ("perplexity",)),
            ("Part d (text2token CE)", t2t_hist,
             ("train_loss", "val_loss"))]):
        for k in keys:
            ax.plot(hist_d[k], label=k)
        ax.set_title(title)
        ax.set_xlabel("epoch")
        ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "loss_curves.png"), dpi=110)

    fig2, ax = plt.subplots(figsize=(9, 3.5))
    x = np.arange(codes)
    ax.bar(x - 0.2, hist_gt, width=0.4, label="ground truth")
    ax.bar(x + 0.2, hist_gen, width=0.4, label="generated")
    ax.set_title("val token histograms (Hellinger "
                 f"{metrics['generated_vs_ground_truth']['hellinger']:.3f})")
    ax.set_xlabel("gesture token")
    ax.legend()
    fig2.tight_layout()
    fig2.savefig(os.path.join(args.out, "token_histograms.png"), dpi=110)

    # BVH artifacts: generated vs ground-truth for the first val clip
    frames_to_bvh(gen_frames_list[0], fe,
                  path=os.path.join(args.out, "generated_sample.bvh"))
    frames_to_bvh(val_store[0]["poses"], fe,
                  path=os.path.join(args.out, "ground_truth_sample.bvh"))
    print("artifacts in", args.out)


if __name__ == "__main__":
    main()
