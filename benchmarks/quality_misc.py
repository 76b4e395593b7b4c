"""Quality/convergence proof for the remaining trainers: the
continuous text->pose baseline (Seq2SeqNet, ref: scripts/train.py +
scripts/inference.py), the cluster->gesture decoder (ref:
scripts/train_cluster2gesture.py + inference_cluster2gesture.py), and
the unrolled-GAN variant (ref: scripts/train_gan.py).

Companion to quality_run.py / quality_audio.py: QUALITY.md proves the
a/b/d + audio chains at corpus scale; this script closes the loop on
the other three training paths, reusing the frozen Part-a/b teachers
and the motif corpus from a completed quality_run so every number is
comparable with the tables already committed (same val clips, same
metric battery, same FGD floor).

What each part proves:
- baseline: trains to convergence on word-conditioned pose windows and
  generates held-out motion via the reference's sliding-window +
  seed-carry inference; its token/FGD metrics quantify the paper's
  comparison point (continuous regression vs the token pipeline).
- c2g: given ground-truth gesture tokens for the val clips, decodes
  DAE-latent motion; FGD against the val corpus + latent MSE measure
  how much motion detail survives the token bottleneck.
- GAN: the unrolled-GAN trainer runs at corpus scale (D/G losses
  stay balanced, no divergence) and its generator's val-transcript
  motion is scored with the same teacher metrics.

    python benchmarks/quality_run.py /tmp/quality_out    # first
    python benchmarks/quality_misc.py /tmp/quality_out   # then this
    # smoke: quality_run --fast, then quality_misc --fast
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def word_windows(clips, vocab, n_frames: int, stride: int,
                 max_words: int, fps: int, mean, std,
                 drop_wordless: bool = True):
    """Fixed-shape (word_ids, lengths, poses) windows for the baseline
    and GAN trainers (ref: TrinityDataset + word_seq_collate_fn,
    lmdb_data_loader.py:29-125). Windows with no spoken words are
    dropped by default, matching the reference's >=1-word filter;
    pass drop_wordless=False for EVAL windows that must stay
    time-aligned with the clip (a dropped window would silently shift
    every later generated chunk against the ground truth). `clips` is
    any iterable of store records; normalization stats are the TRAIN
    corpus stats (pass them explicitly for val clips)."""
    from gesture2vec_tpu.data.datasets import normalize

    ids_l, len_l, pose_l = [], [], []
    for clip in clips:
        poses = normalize(clip["poses"], mean, std)
        words = clip["words"]
        for s in range(0, poses.shape[0] - n_frames + 1, stride):
            t0, t1 = s / fps, (s + n_frames) / fps
            inside = [w[0] for w in words if w[2] > t0 and w[1] < t1]
            if not inside and drop_wordless:
                continue
            wid = vocab.words_to_ids(inside)[:max_words]
            row = np.zeros(max_words, np.int32)
            row[: len(wid)] = wid
            ids_l.append(row)
            len_l.append(max(len(wid), 1))
            pose_l.append(poses[s:s + n_frames])
    return {"word_ids": np.stack(ids_l),
            "lengths": np.asarray(len_l, np.int32),
            "poses": np.stack(pose_l).astype(np.float32)}


def teacher_metrics(gen_frames_per_clip, val_store, store, dae, dae_vars,
                    seq, seq_vars, n_chunk, codes, bank, bank_val,
                    normalized_input=False):
    """Score generated motion with the reference's metric battery:
    tokenize generated + real held-out motion through the frozen a/b
    teachers, then pool via quality_run.token_latent_battery (the one
    shared implementation of the Clustering.py:1353-1628 metrics)."""
    from quality_run import token_latent_battery

    from gesture2vec_tpu.data.datasets import normalize
    from gesture2vec_tpu.data.teacher import (encode_windows_with_dae,
                                              tokenize_windows)

    def frames_to_tokens_latents(frames, already_norm):
        fn = frames if already_norm else normalize(
            frames, store.pose_mean, store.pose_std)
        n = fn.shape[0] // n_chunk
        chunks = fn[:n * n_chunk].reshape(n, n_chunk, -1)
        lat = encode_windows_with_dae(dae, dae_vars, chunks)
        # tokenize_windows returns the flattened (N, L*H) seq latents
        # alongside the tokens - one device pass serves both
        tok, seq_lat = tokenize_windows(seq, seq_vars, lat)
        return np.asarray(tok).reshape(-1), seq_lat

    pairs, gen_lat_list = [], []
    for clip, gen_frames in zip(val_store, gen_frames_per_clip):
        g_tok, g_lat = frames_to_tokens_latents(
            np.asarray(gen_frames), normalized_input)
        r_tok, _ = frames_to_tokens_latents(clip["poses"], False)
        n = min(len(g_tok), len(r_tok))
        pairs.append((g_tok[:n], r_tok[:n]))
        gen_lat_list.append(g_lat)
    metrics = token_latent_battery(pairs, np.concatenate(gen_lat_list),
                                   bank, bank_val, codes)
    metrics.pop("_hist_gen"), metrics.pop("_hist_gt")
    return metrics


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--parts", default="baseline,c2g,gan",
                    help="comma-set of baseline,c2g,gan")
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from gesture2vec_tpu.cluster.latent_dataset import build_latent_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.infer.baseline_infer import generate_baseline
    from gesture2vec_tpu.text.vocab import build_vocab
    from gesture2vec_tpu.train import checkpoints
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.train.gan_trainer import build_gan, train_gan
    from gesture2vec_tpu.train.misc_trainers import (make_baseline,
                                                     train_baseline,
                                                     train_c2g)

    import logging
    logging.basicConfig(level=logging.INFO)
    print("backend:", jax.devices()[0].platform)
    parts = set(args.parts.split(","))
    fast = args.fast
    corpus = os.path.join(args.out, "corpus")

    def latest(pat):
        hits = sorted(glob.glob(os.path.join(args.out, pat)))
        if not hits:
            raise SystemExit(
                f"no checkpoint matches {pat} under {args.out}: run "
                f"`python benchmarks/quality_run.py {args.out}` first "
                f"(this harness reuses its frozen a/b teachers)")
        return hits[-1]

    dae, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        latest("dae/*.bin"), "DAE")
    seq, seq_vars, seq_payload = checkpoints.load_checkpoint_and_model(
        latest("vqvae/*.bin"), "autoencoder_vq")
    cfg_b = seq_payload["config"]
    codes, n_chunk = cfg_b.autoencoder_vq_components, cfg_b.n_poses
    fps = 20
    hid = 64 if fast else 200

    store = ClipStore(os.path.join(corpus, "store", "train"))
    val_store = ClipStore(os.path.join(corpus, "store", "val"))
    vocab = build_vocab("quality", [[w[0] for w in c["words"]]
                                    for c in store], embedding_dim=100)
    print(f"corpus: {len(store)} train clips, {len(val_store)} val, "
          f"{codes} codes")

    bank = build_latent_dataset(store, dae_model=dae,
                                dae_variables=dae_vars, seq_model=seq,
                                seq_variables=seq_vars, n_poses=n_chunk,
                                stride=n_chunk)
    bank_val = build_latent_dataset(
        val_store, dae_model=dae, dae_variables=dae_vars, seq_model=seq,
        seq_variables=seq_vars, n_poses=n_chunk, stride=n_chunk,
        mean=store.pose_mean, std=store.pose_std)
    # merge with a prior run so --parts subsets update in place
    metrics_path = os.path.join(args.out, "metrics_misc.json")
    metrics: dict = {}
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            metrics = json.load(f)

    def val_curve(hist):
        vl = hist["val_loss"]
        return dict(val_loss_first=vl[0], val_loss_last=vl[-1],
                    val_loss_min=float(np.min(vl)),
                    val_loss_argmin=int(np.argmin(vl)))

    # ------------------------------------------------------- baseline
    if "baseline" in parts:
        T = 40
        data = word_windows(store, vocab, T, 20, 12, fps,
                            store.pose_mean, store.pose_std)
        val_data = word_windows(val_store, vocab, T, T, 12, fps,
                                store.pose_mean, store.pose_std)
        print(f"baseline windows: {data['poses'].shape} train, "
              f"{val_data['poses'].shape} val")
        bl_cfg = load_config(dict(
            name="baseline", model="baseline", hidden_size=hid,
            n_layers=2, dropout_prob=0.1, epochs=(4 if fast else 40),
            batch_size=(16 if fast else 64), learning_rate=0.0005,
            n_poses=T, n_pre_poses=4, wordembed_dim=100, random_seed=0,
            model_save_path=os.path.join(args.out, "baseline")))
        bl_state, bl_hist = train_baseline(
            bl_cfg, data, val_data, vocab.n_words,
            embedding_weights=vocab.word_embedding_weights,
            save_dir=os.path.join(args.out, "baseline"))
        bl_model = make_baseline(bl_cfg, vocab.n_words,
                                 data["poses"].shape[-1],
                                 vocab.word_embedding_weights)
        bl_vars = {"params": bl_state.params,
                   "batch_stats": bl_state.batch_stats}
        gen_frames = []
        for clip in val_store:
            dur = clip["poses"].shape[0] / fps
            gen_frames.append(generate_baseline(
                bl_model, bl_vars, vocab, clip["words"], dur,
                pose_mean=store.pose_mean, pose_std=store.pose_std,
                fps=fps, max_words=12))
        metrics["baseline"] = dict(
            **val_curve(bl_hist),
            **teacher_metrics(gen_frames, val_store, store, dae,
                              dae_vars, seq, seq_vars, n_chunk, codes,
                              bank, bank_val))
        print("baseline:", json.dumps(metrics["baseline"], indent=2))

    # ------------------------------------------------------------ c2g
    if "c2g" in parts:
        tr = build_latent_dataset(store, dae_model=dae,
                                  dae_variables=dae_vars, seq_model=seq,
                                  seq_variables=seq_vars, n_poses=n_chunk,
                                  stride=n_chunk // 2)
        c2g_cfg = load_config(dict(
            name="c2g", model="c2g", hidden_size=hid, n_layers=2,
            dropout_prob=0.1, epochs=(6 if fast else 60),
            batch_size=(32 if fast else 128), learning_rate=0.001,
            n_poses=n_chunk, autoencoder_vq_components=codes,
            random_seed=0,
            model_save_path=os.path.join(args.out, "c2g")))
        c2g_state, c2g_hist = train_c2g(
            c2g_cfg, tr["tokens"], tr["dae_latents"],
            bank_val["tokens"], bank_val["dae_latents"],
            save_dir=os.path.join(args.out, "c2g"))
        from gesture2vec_tpu.train.misc_trainers import make_c2g
        c2g_model = make_c2g(c2g_cfg, tr["dae_latents"].shape[-1])
        c2g_vars = {"params": c2g_state.params,
                    "batch_stats": c2g_state.batch_stats}
        # decode the val clips' GROUND-TRUTH token sequences: isolates
        # the c2g decoder (part d's translation error is excluded)
        dec_lat = np.asarray(jax.jit(
            lambda v, i: c2g_model.apply(v, i, train=False))(
                c2g_vars, jnp.asarray(bank_val["tokens"])))
        lat_mse = float(np.mean(
            (dec_lat - bank_val["dae_latents"]) ** 2))
        # seq-latent FGD of the decoded motion vs the real val corpus
        # (tokenize_windows' second return IS the flattened seq latent)
        from gesture2vec_tpu.data.teacher import tokenize_windows
        _, dec_seq_lat = tokenize_windows(seq, seq_vars, dec_lat)
        from gesture2vec_tpu.cluster.metrics import frechet_distance
        metrics["c2g"] = {
            **val_curve(c2g_hist),
            "dae_latent_mse_gt_tokens": lat_mse,
            "frechet_seq_latents": float(frechet_distance(
                dec_seq_lat, bank_val["seq_latents"])),
            "frechet_floor_train_vs_val": float(frechet_distance(
                bank["seq_latents"], bank_val["seq_latents"])),
        }
        print("c2g:", json.dumps(metrics["c2g"], indent=2))

    # ------------------------------------------------------------ gan
    if "gan" in parts:
        T = 40
        data = word_windows(store, vocab, T, 20, 12, fps,
                            store.pose_mean, store.pose_std)
        gan_cfg = load_config(dict(
            name="gan", model="gan", hidden_size=hid, n_layers=2,
            dropout_prob=0.1, epochs=(3 if fast else 30),
            batch_size=(16 if fast else 64), learning_rate=0.0002,
            n_poses=T, n_pre_poses=4, wordembed_dim=100,
            noise_dim=(16 if fast else 64), random_seed=0,
            model_save_path=os.path.join(args.out, "gan")))
        gan_state, gan_hist = train_gan(
            gan_cfg, data, vocab.n_words,
            embedding_weights=vocab.word_embedding_weights,
            save_dir=os.path.join(args.out, "gan"))
        g_model, _ = build_gan(gan_cfg, vocab.n_words,
                               data["poses"].shape[-1],
                               embedding_weights=vocab.word_embedding_weights)
        g_variables = {"params": gan_state.g_params,
                       "batch_stats": gan_state.g_batch_stats}
        g_run = jax.jit(lambda ids, lens, noise, seed: g_model.apply(
            g_variables, ids, lens, noise, seed, train=False))
        # batched generation: all non-overlapping windows of each val
        # clip in ONE device call (zero seed frame = corpus mean pose).
        # drop_wordless=False: eval windows must stay time-aligned with
        # the clip, wordless ones generate from SOS/EOS alone
        rng = np.random.default_rng(0)
        gen_frames = []
        for clip in val_store:
            vw = word_windows([clip], vocab, T, T, 12, fps,
                              store.pose_mean, store.pose_std,
                              drop_wordless=False)
            noise = rng.normal(size=(vw["word_ids"].shape[0],
                                     gan_cfg.noise_dim)).astype(np.float32)
            seed = np.zeros((vw["word_ids"].shape[0],
                             data["poses"].shape[-1]), np.float32)
            wins = np.asarray(g_run(jnp.asarray(vw["word_ids"]),
                                    jnp.asarray(vw["lengths"]),
                                    jnp.asarray(noise),
                                    jnp.asarray(seed)))
            gen_frames.append(wins.reshape(-1, wins.shape[-1]))
        metrics["gan"] = dict(
            g_loss_first=gan_hist["g_loss"][0],
            g_loss_last=gan_hist["g_loss"][-1],
            d_real_last=gan_hist["d_real"][-1],
            d_fake_last=gan_hist["d_fake"][-1],
            **teacher_metrics(gen_frames, val_store, store, dae,
                              dae_vars, seq, seq_vars, n_chunk, codes,
                              bank, bank_val, normalized_input=True))
        print("gan:", json.dumps(metrics["gan"], indent=2))

    with open(metrics_path, "w") as f:
        json.dump(metrics, f, indent=2)
    print("wrote", metrics_path)


if __name__ == "__main__":
    main()
