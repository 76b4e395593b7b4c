"""Serve text->gesture generation over HTTP with micro-batching.

    g2v-serve <t2t.bin> <dae.bin> <vq.bin> --store ... --pipeline ...
              [--port 8008] [--max-batch 16] [--batch-window-ms 50]
              [--mode decode|exemplar] [--latent-bank ...] [--mesh dp=N]

The reference has no serving path (one transcript per process,
ref: inference_text2embedding.py:837-951); see serve/server.py for the
batching design. POST /generate with {"words": [[w, start, end], ...]}
returns BVH text; GET /healthz reports batching stats.
"""
from __future__ import annotations

import argparse
import logging


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("t2t_checkpoint")
    parser.add_argument("rep_checkpoint")
    parser.add_argument("autoencoder_checkpoint")
    parser.add_argument("--store", required=True)
    parser.add_argument("--pipeline", required=True,
                        help="fitted pipeline json for BVH export")
    parser.add_argument("--mode", choices=["exemplar", "decode"],
                        default="decode")
    parser.add_argument("--latent-bank", default=None)
    parser.add_argument("--dataset", choices=["trinity", "twh"],
                        default="trinity")
    parser.add_argument("--twh-variant", default="test1")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8008)
    parser.add_argument("--max-batch", type=int, default=16)
    parser.add_argument("--batch-window-ms", type=float, default=50.0)
    parser.add_argument("--mesh", default=None,
                        help="e.g. dp=2: shard batched requests")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--platform", default=None)
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from gesture2vec_tpu.cluster.latent_dataset import load_latent_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.infer.exporter import frames_to_bvh
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.serve.server import serve
    from gesture2vec_tpu.text.vocab import Vocab, build_vocab
    from gesture2vec_tpu.train import checkpoints

    logging.basicConfig(level=logging.INFO)
    store = ClipStore(args.store)
    t2t_model, t2t_vars, t2t_payload = \
        checkpoints.load_checkpoint_and_model(args.t2t_checkpoint,
                                              "text2embedding")
    dae_model, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        args.rep_checkpoint, "DAE")
    seq_model, seq_vars, _ = checkpoints.load_checkpoint_and_model(
        args.autoencoder_checkpoint, "autoencoder_vq")
    cfg = t2t_payload["config"]
    if t2t_payload.get("lang_model"):
        vocab = Vocab.from_state_dict(t2t_payload["lang_model"])
    else:
        vocab = build_vocab("corpus",
                            [[w[0] for w in c["words"]] for c in store],
                            cfg.wordembed_path, cfg.wordembed_dim)
    bank = (load_latent_dataset(args.latent_bank)
            if args.latent_bank else None)
    gen = GestureGenerator(
        t2t_model=t2t_model, t2t_variables=t2t_vars,
        seq_model=seq_model, seq_variables=seq_vars,
        dae_model=dae_model, dae_variables=dae_vars, vocab=vocab,
        pose_mean=store.pose_mean, pose_std=store.pose_std,
        n_frames=cfg.n_poses,
        sentence_frame_length=cfg.sentence_frame_length,
        fps=cfg.motion_resampling_framerate, mode=args.mode,
        latent_bank=bank, seed=args.seed)

    from gesture2vec_tpu.io.bvh import write_bvh
    if args.dataset == "twh":
        from gesture2vec_tpu.infer.exporter import frames_to_bvh_twh
        from gesture2vec_tpu.mocap.features import TWHFeatureExtractor
        fe = TWHFeatureExtractor.load(args.pipeline, args.twh_variant)

        def export_bvh(frames):
            return write_bvh(frames_to_bvh_twh(frames, fe, path=None))
    else:
        from gesture2vec_tpu.mocap.features import FeatureExtractor
        fe = FeatureExtractor.load(args.pipeline)

        def export_bvh(frames):
            return write_bvh(frames_to_bvh(frames, fe, path=None))

    mesh = None
    if args.mesh:
        from gesture2vec_tpu.parallel.mesh import make_mesh
        mesh = make_mesh({k: int(v)
                          for k, v in (kv.split("=")
                                       for kv in args.mesh.split(","))})

    httpd = serve(gen, host=args.host, port=args.port,
                  export_bvh=export_bvh, max_batch=args.max_batch,
                  batch_window_s=args.batch_window_ms / 1000.0, mesh=mesh)
    logging.info("serving on http://%s:%d (mode=%s, max_batch=%d, "
                 "window=%.0fms)", args.host, httpd.server_address[1],
                 args.mode, args.max_batch, args.batch_window_ms)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.worker.close()


if __name__ == "__main__":
    main()
