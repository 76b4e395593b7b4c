"""CLI: end-to-end audio -> gesture BVH (audio-context Part-d variant).

The reference exposes audio context as a module flag inside the text
inference script (ref: scripts/model/text2embedding_model.py:41
audio_context + scripts/inference_text2embedding.py mel-chunk windows
:293-339). Here it is a first-class entry point:

    g2v-infer-audio <audio2token.bin> <speech.wav> <DAE.bin> <VQVAE.bin>
        --store ... --pipeline ... [--mode decode|exemplar]
"""
from __future__ import annotations

import argparse
import logging
import time


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("a2t_checkpoint")
    parser.add_argument("wav", help="mono wav file (16 kHz)")
    parser.add_argument("rep_checkpoint")
    parser.add_argument("autoencoder_checkpoint")
    parser.add_argument("--store", required=True,
                        help="train clip store (for pose mean/std)")
    parser.add_argument("--pipeline", required=True,
                        help="fitted data_pipe.json for BVH export")
    parser.add_argument("--mode", choices=["decode", "exemplar"],
                        default="decode")
    parser.add_argument("--latent-bank", default=None,
                        help="org_latent_clustering_data.npz "
                             "(required for exemplar mode)")
    parser.add_argument("--transcript", default=None,
                        help="subtitle JSON/TSV; required when the "
                             "checkpoint was trained with "
                             "audio_fusion='both' (text+audio fusion)")
    parser.add_argument("--out", default="generated_audio.bvh")
    parser.add_argument("--duration", type=float, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--temperature", type=float, default=0.0,
                        help="0 = greedy token decode (reference "
                             "behavior); >0 samples tokens at this "
                             "softmax temperature")
    parser.add_argument("--top-k", type=int, default=0,
                        help="truncate sampling to the k best tokens "
                             "(0 = full distribution)")
    parser.add_argument("--beam-width", type=int, default=0,
                        help="beam-search token decode with this "
                             "many hypotheses (0/1 = greedy; "
                             "exclusive with --temperature)")
    parser.add_argument("--decode-overlap", type=int, default=0,
                        help="decode mode: overlap-blend this many "
                             "frames across chunk boundaries "
                             "(reference-style sliding-window "
                             "blending applied to the token decode)")
    parser.add_argument("--soft-decode", type=float, default=0.0,
                        help="decode mode: rebuild each chunk's "
                             "hidden from the softmax codebook "
                             "mixture at this temperature instead "
                             "of the hard argmax row (0 = reference "
                             "behavior; the GS-Soft decoder is "
                             "trained on soft mixtures)")
    parser.add_argument("--exemplar-continuity",
                        action="store_true",
                        help="exemplar mode: continuity-aware "
                             "retrieval (motion matching) instead "
                             "of the reference's random pick")
    parser.add_argument("--platform", default=None)
    from gesture2vec_tpu.utils.jaxcache import add_jax_cache_flag
    add_jax_cache_flag(parser)
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from gesture2vec_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache(args.jax_cache)

    import numpy as np

    from gesture2vec_tpu.cluster.latent_dataset import load_latent_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.infer.audio2gesture import AudioGestureGenerator
    from gesture2vec_tpu.infer.exporter import frames_to_bvh
    from gesture2vec_tpu.mocap.features import FeatureExtractor
    from gesture2vec_tpu.train import checkpoints

    logging.basicConfig(level=logging.INFO)
    store = ClipStore(args.store)

    a2t_model, a2t_vars, a2t_payload = \
        checkpoints.load_checkpoint_and_model(args.a2t_checkpoint,
                                              "audio2token")
    dae_model, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        args.rep_checkpoint, "DAE")
    seq_model, seq_vars, _ = checkpoints.load_checkpoint_and_model(
        args.autoencoder_checkpoint, "autoencoder_vq")
    cfg = a2t_payload["config"]

    # shared decoder: mono float32 at 16 kHz, signed/unsigned PCM
    # normalized and centered (io/audio.load_wav - the inline version
    # here previously fed uint8 WAVs through unscaled)
    from gesture2vec_tpu.io.audio import AUDIO_SR, load_wav
    wave = load_wav(args.wav)
    sr = AUDIO_SR

    bank = (load_latent_dataset(args.latent_bank)
            if args.latent_bank else None)

    # text+audio fusion checkpoints need the transcript + vocab
    # (ref both=True branch; vocab from the checkpoint's lang_model,
    # else rebuilt from the training store like cli/infer.py)
    words, vocab = None, None
    if getattr(a2t_model, "fusion", "audio") == "both":
        if not args.transcript:
            parser.error("this checkpoint was trained with "
                         "audio_fusion='both'; pass --transcript")
        from gesture2vec_tpu.io.subtitles import read_subtitles
        from gesture2vec_tpu.text.vocab import Vocab, build_vocab
        words = read_subtitles(args.transcript)
        if a2t_payload.get("lang_model"):
            vocab = Vocab.from_state_dict(a2t_payload["lang_model"])
        else:
            vocab = build_vocab("corpus",
                                [[w[0] for w in c["words"]] for c in store],
                                cfg.wordembed_path, cfg.wordembed_dim)

    gen = AudioGestureGenerator(
        a2t_model=a2t_model, a2t_variables=a2t_vars,
        seq_model=seq_model, seq_variables=seq_vars,
        dae_model=dae_model, dae_variables=dae_vars,
        pose_mean=store.pose_mean, pose_std=store.pose_std,
        n_frames=cfg.n_poses,
        sentence_frame_length=cfg.sentence_frame_length,
        fps=cfg.motion_resampling_framerate, audio_sr=sr,
        mode=args.mode, latent_bank=bank, seed=args.seed, vocab=vocab,
        temperature=args.temperature, top_k=args.top_k,
        beam_width=args.beam_width,
        exemplar_continuity=args.exemplar_continuity,
        decode_overlap=args.decode_overlap,
        soft_decode=args.soft_decode)

    t0 = time.time()
    frames, tokens = gen.generate(wave, args.duration, words=words)
    dt = time.time() - t0
    logging.info("generated %d frames (%d tokens) in %.2fs "
                 "(%.0f frames/s)", frames.shape[0], len(tokens), dt,
                 frames.shape[0] / dt)

    fe = FeatureExtractor.load(args.pipeline)
    frames_to_bvh(frames, fe, path=args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
