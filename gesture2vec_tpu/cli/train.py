"""CLI: train any pipeline part from a YAML config.

Replaces the reference's per-part scripts
(ref: scripts/train_DAE.py, scripts/train_autoencoder_VQVAE.py,
scripts/train_text2embedding.py) with one entry point:

    g2v-train --config configs/DAE.yml --part a
    g2v-train --config configs/VQ-VAE.yml --part b \
        --rep-checkpoint out/dae_H40_checkpoint_020.bin
    g2v-train --config configs/seq2seqtxt.yml --part d \
        --rep-checkpoint ... --autoencoder-checkpoint ...

Part-to-part artifact flow matches the reference: part b consumes the
frozen Part-a checkpoint, part d consumes both frozen checkpoints.
"""
from __future__ import annotations

import argparse
import logging
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", "-c", required=True)
    parser.add_argument("--part",
                        choices=["a", "b", "d", "audio", "baseline", "c2g",
                                 "gan"],
                        required=True)
    parser.add_argument("--rep-checkpoint", default=None,
                        help="frozen Part-a checkpoint (parts b, d)")
    parser.add_argument("--autoencoder-checkpoint", default=None,
                        help="frozen Part-b checkpoint (part d)")
    parser.add_argument("--save-dir", default=None)
    parser.add_argument("--resume", default=None, metavar="CKPT",
                        help="checkpoint to resume training from "
                             "(parts a, b, d, audio; bit-exact when the "
                             "checkpoint carries optimizer state)")
    parser.add_argument("--mesh", default=None,
                        help="device mesh, e.g. 'dp=8' or 'dp=4,tp=2'")
    parser.add_argument("--plot-every", type=int, default=0,
                        help="part b: write a codebook t-SNE every N "
                             "epochs (ref: train_autoencoder_VQVAE.py"
                             ":450-545)")
    parser.add_argument("--platform", default=None,
                        help="force jax platform (cpu/tpu)")
    from gesture2vec_tpu.utils.jaxcache import add_jax_cache_flag
    add_jax_cache_flag(parser)
    args = parser.parse_args()

    from gesture2vec_tpu.cli._common import ensure_virtual_devices
    ensure_virtual_devices(args.mesh, args.platform)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from gesture2vec_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache(args.jax_cache)

    from gesture2vec_tpu.data.datasets import all_frames, pose_windows
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.data.teacher import encode_windows_with_dae
    from gesture2vec_tpu.train import checkpoints
    from gesture2vec_tpu.train.config import load_config
    from gesture2vec_tpu.utils.meters import set_logger

    cfg = load_config(args.config)
    if args.mesh:
        shape = {k: int(v) for k, v in
                 (kv.split("=") for kv in args.mesh.split(","))}
        cfg = cfg.replace(mesh_shape=shape)
    if args.rep_checkpoint:
        cfg = cfg.replace(rep_learning_checkpoint=args.rep_checkpoint)
    if args.autoencoder_checkpoint:
        cfg = cfg.replace(autoencoder_checkpoint=args.autoencoder_checkpoint)
    save_dir = args.save_dir or cfg.model_save_path
    set_logger(save_dir)
    logging.info("part %s, config %s -> %s", args.part, args.config,
                 save_dir)

    train_store = ClipStore(cfg.train_data_path)
    val_store = ClipStore(cfg.val_data_path)
    mean, std = train_store.pose_mean, train_store.pose_std

    def _plot(history):
        from gesture2vec_tpu.mocap.viz import plot_loss_curves
        path = os.path.join(save_dir, "loss_curves.png")
        plot_loss_curves(history, path, title=cfg.name)
        logging.info("loss curves -> %s", path)

    if args.part == "a":
        from gesture2vec_tpu.train.dae_trainer import train_dae
        _, hist = train_dae(cfg, all_frames(train_store),
                            all_frames(val_store, mean, std),
                            save_dir=save_dir, resume_from=args.resume)
        _plot(hist)
        return

    if args.part in ("baseline", "gan"):
        # text -> continuous pose windows (ref: scripts/train.py for the
        # baseline, scripts/train_gan.py for the unrolled GAN);
        # no frozen teachers needed
        from gesture2vec_tpu.data.datasets import (normalize,
                                                   sentence_windows)
        from gesture2vec_tpu.text.vocab import build_vocab
        from gesture2vec_tpu.train.misc_trainers import train_baseline
        import numpy as np

        vocab = build_vocab(
            "corpus", [[w[0] for w in c["words"]] for c in train_store],
            cfg.wordembed_path, cfg.wordembed_dim)

        def build(store):
            wins = sentence_windows(store, cfg.n_poses,
                                    cfg.subdivision_stride,
                                    cfg.motion_resampling_framerate,
                                    min_words=1)
            clips = {i: store[i]
                     for i in sorted({w["clip"] for w in wins})}
            poses = np.stack([
                normalize(clips[w["clip"]]["poses"][
                    w["frame0"]:w["frame0"] + cfg.n_poses], mean, std)
                for w in wins]).astype(np.float32)
            word_ids = np.zeros((len(wins), 32), np.int32)
            lengths = np.zeros((len(wins),), np.int32)
            for i, w in enumerate(wins):
                ids = vocab.words_to_ids([t[0] for t in w["words"]])[:32]
                word_ids[i, :len(ids)] = ids
                lengths[i] = max(len(ids), 1)
            return {"word_ids": word_ids, "lengths": lengths,
                    "poses": poses}

        if args.part == "baseline":
            train_baseline(cfg, build(train_store), build(val_store),
                           vocab.n_words,
                           embedding_weights=vocab.word_embedding_weights,
                           save_dir=save_dir)
            return

        # unrolled GAN (ref: scripts/train_gan.py +
        # train_eval/train_seq2seq.py:541-661)
        from gesture2vec_tpu.train.gan_trainer import train_gan

        train_gan(cfg, build(train_store), vocab.n_words,
                  embedding_weights=vocab.word_embedding_weights,
                  save_dir=save_dir)
        return

    # parts b, c2g, and d need the frozen Part-a model
    assert cfg.rep_learning_checkpoint, "--rep-checkpoint required"
    dae_model, dae_vars, dae_payload = checkpoints.load_checkpoint_and_model(
        cfg.rep_learning_checkpoint, "DAE")
    # teacher sweeps row-shard the corpus axis over the same mesh the
    # trainer uses (data/teacher._sweep_setup)
    from gesture2vec_tpu.parallel.mesh import make_mesh
    sweep_mesh = make_mesh(cfg.mesh_shape)
    if cfg.rep_learning_dim <= 0:
        cfg = cfg.replace(
            rep_learning_dim=dae_payload["config"].hidden_size)

    if args.part == "b":
        from gesture2vec_tpu.train.seq_ae_trainer import train_seq_ae
        tw = encode_windows_with_dae(
            dae_model, dae_vars,
            pose_windows(train_store, cfg.n_poses,
                         cfg.subdivision_stride, mean, std),
            mesh=sweep_mesh)
        vw = encode_windows_with_dae(
            dae_model, dae_vars,
            pose_windows(val_store, cfg.n_poses,
                         cfg.subdivision_stride, mean, std),
            mesh=sweep_mesh)
        _, hist = train_seq_ae(cfg, tw, vw, save_dir=save_dir,
                               plot_every=args.plot_every,
                               resume_from=args.resume)
        _plot(hist)
        return

    if args.part == "c2g":
        # cluster ids + frozen-DAE latent windows
        # (ref: scripts/train_cluster2gesture.py)
        from gesture2vec_tpu.data.teacher import tokenize_windows
        from gesture2vec_tpu.train.misc_trainers import train_c2g
        assert cfg.autoencoder_checkpoint, \
            "--autoencoder-checkpoint required"
        seq_model, seq_vars, _ = checkpoints.load_checkpoint_and_model(
            cfg.autoencoder_checkpoint, "autoencoder_vq")
        tw = encode_windows_with_dae(
            dae_model, dae_vars,
            pose_windows(train_store, cfg.n_poses,
                         cfg.subdivision_stride, mean, std),
            mesh=sweep_mesh)
        vw = encode_windows_with_dae(
            dae_model, dae_vars,
            pose_windows(val_store, cfg.n_poses,
                         cfg.subdivision_stride, mean, std),
            mesh=sweep_mesh)
        t_tokens, _ = tokenize_windows(seq_model, seq_vars, tw,
                                       mesh=sweep_mesh)
        v_tokens, _ = tokenize_windows(seq_model, seq_vars, vw,
                                       mesh=sweep_mesh)
        train_c2g(cfg, t_tokens, tw, v_tokens, vw, save_dir=save_dir)
        return

    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.text.vocab import build_vocab

    vocab = build_vocab("corpus",
                        [[w[0] for w in c["words"]] for c in train_store],
                        cfg.wordembed_path, cfg.wordembed_dim)

    # parts d and audio share the sentence-level dataset build
    assert cfg.autoencoder_checkpoint, "--autoencoder-checkpoint required"
    seq_model, seq_vars, _ = checkpoints.load_checkpoint_and_model(
        cfg.autoencoder_checkpoint, "autoencoder_vq")
    # audio_fusion='both' (the repaired text+audio branch) trains on
    # word ids + raw 1 s wav chunks instead of mel chunks
    both = args.part == "audio" and cfg.audio_fusion == "both"
    kw = dict(dae_model=dae_model, dae_variables=dae_vars,
              seq_model=seq_model, seq_variables=seq_vars,
              sentence_frame_length=cfg.sentence_frame_length,
              stride=cfg.subdivision_stride_sentence,
              n_frames=cfg.n_poses,
              fps=cfg.motion_resampling_framerate, mean=mean, std=std,
              include_audio=args.part == "audio" and not both,
              include_raw_audio=both, mesh=sweep_mesh,
              emit_stage_tokens=cfg.token_stages > 1,
              text_context_s=cfg.text_context_s)
    sent = build_sentence_dataset(train_store, vocab, **kw)
    sent_val = build_sentence_dataset(val_store, vocab, **kw)

    if args.part == "audio":
        # audio-context variant (ref: text2embedding_model.py:563-571,
        # Helper_models.py:179-317): mel chunks -> gesture tokens
        from gesture2vec_tpu.train.audio2token_trainer import \
            train_audio2token
        _, hist = train_audio2token(
            cfg, sent, sent_val, save_dir=save_dir,
            resume_from=args.resume,
            n_words=(vocab.n_words if both else 0),
            lang_model_state=(vocab.state_dict() if both else None))
        _plot(hist)
        return

    from gesture2vec_tpu.train.text2token_trainer import train_text2token
    _, hist = train_text2token(cfg, sent, sent_val, vocab.n_words,
                               embedding_weights=vocab.word_embedding_weights,
                               lang_model_state=vocab.state_dict(),
                               save_dir=save_dir, resume_from=args.resume)
    _plot(hist)


if __name__ == "__main__":
    main()
