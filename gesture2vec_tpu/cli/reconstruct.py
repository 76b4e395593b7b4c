"""CLI: autoencoder round-trip reconstruction of a BVH file.

Replaces `python inference_DAE.py <ckpt>` (Part-a round trip,
ref: scripts/inference_DAE.py:416-681) and
`python inference_Autoencoder.py <DAE.ckpt> <ckpt>` (Part a+b chunked
round trip, ref: scripts/inference_Autoencoder.py:124-231).
"""
from __future__ import annotations

import argparse
import logging


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("rep_checkpoint", help="Part-a checkpoint")
    parser.add_argument("bvh", help="input BVH file")
    parser.add_argument("--autoencoder-checkpoint", default=None,
                        help="Part-b checkpoint (enables the chunked "
                             "a+b round trip)")
    parser.add_argument("--store", required=True,
                        help="train store (mean/std)")
    parser.add_argument("--pipeline", required=True,
                        help="fitted data_pipe.json")
    parser.add_argument("--out", default="reconstructed.bvh")
    parser.add_argument("--overlap", type=int, default=0,
                        help="chunk overlap frames (cross-fade blended)")
    parser.add_argument("--warmup-steps", type=int, default=0,
                        help="decoder hidden warm-up repeats before each "
                             "chunk rollout (reference uses 5)")
    parser.add_argument("--plot-kernels", default=None, metavar="DIR",
                        help="render each DAE encoder unit as a stick "
                             "figure + heatmaps (ref: inference_DAE.py"
                             ":358-407 Plot_Kernel)")
    parser.add_argument("--html-player", default=None, metavar="FILE",
                        help="write a self-contained HTML player of the "
                             "reconstruction (nb_play_mocap equivalent, "
                             "ref: pymo/viz_tools.py:190)")
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

    from gesture2vec_tpu.data.datasets import normalize, unnormalize
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.infer.exporter import frames_to_bvh
    from gesture2vec_tpu.infer.reconstruct import (chunked_reconstruct,
                                                   dae_roundtrip)
    from gesture2vec_tpu.io.bvh import parse_bvh
    from gesture2vec_tpu.mocap.features import FeatureExtractor
    from gesture2vec_tpu.train import checkpoints

    logging.basicConfig(level=logging.INFO)
    store = ClipStore(args.store)
    fe = FeatureExtractor.load(args.pipeline)
    # transform (no refit): the fitted pipeline's channel selection and
    # constants must stay exactly what the store stats were computed on
    feats = fe.transform(parse_bvh(args.bvh))
    frames = normalize(feats.astype(np.float32), store.pose_mean,
                       store.pose_std)

    dae_model, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        args.rep_checkpoint, "DAE")

    if args.autoencoder_checkpoint:
        seq_model, seq_vars, seq_payload = \
            checkpoints.load_checkpoint_and_model(
                args.autoencoder_checkpoint, "autoencoder_vq")
        recon = chunked_reconstruct(seq_model, seq_vars, dae_model,
                                    dae_vars, frames,
                                    seq_payload["config"].n_poses,
                                    overlap=args.overlap,
                                    warmup_steps=args.warmup_steps)
        logging.info("part a+b chunked round trip (%d frames)",
                     recon.shape[0])
    else:
        recon, _ = dae_roundtrip(dae_model, dae_vars, frames)
        logging.info("part a round trip (%d frames)", recon.shape[0])

    err = float(np.mean((recon - frames) ** 2))
    logging.info("reconstruction MSE (normalized space): %.5f", err)
    out_frames = unnormalize(recon, store.pose_mean, store.pose_std)
    data = frames_to_bvh(out_frames, fe, path=args.out)
    print(f"wrote {args.out} (MSE {err:.5f})")

    if args.plot_kernels:
        from gesture2vec_tpu.cluster.analysis import plot_kernel_stickfigures
        kernel = np.asarray(dae_vars["params"]["encoder"]["kernel"])
        written = plot_kernel_stickfigures(kernel, fe, store.pose_mean,
                                           store.pose_std,
                                           args.plot_kernels)
        print(f"wrote {len(written)} kernel plots -> {args.plot_kernels}")

    if args.html_player:
        from gesture2vec_tpu.io.bvh import parse_bvh as _parse
        from gesture2vec_tpu.mocap.viz import save_html_player
        if data is None:
            data = _parse(args.out)
        save_html_player(data, args.html_player,
                         title=f"reconstruction of {args.bvh}")
        print(f"wrote {args.html_player}")


if __name__ == "__main__":
    main()
