"""Serve text->gesture generation over HTTP with micro-batching.

    g2v-serve <t2t.bin> <dae.bin> <vq.bin> --store ... --pipeline ...
              [--port 8008] [--max-batch 32] [--batch-window-ms 50]
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
    parser.add_argument("--max-batch", type=int, default=32,
                    help="fused-batch cap; 32 is the measured v5e peak (benchmarks/serve_falloff.py)")
    parser.add_argument("--batch-window-ms", type=float, default=50.0)
    parser.add_argument("--stream-batch", type=int, default=1,
                        help="continuous batching of concurrent "
                             "/stream sessions (decode mode): fuse up "
                             "to this many due window steps into one "
                             "device program. Default 1 = per-session "
                             "dispatch, which measured FASTER at this "
                             "model scale (async dispatch already "
                             "pipelines; benchmarks/"
                             "streaming_concurrency.py)")
    parser.add_argument("--stream-batch-window-ms", type=float,
                        default=10.0,
                        help="how long a due stream step waits for "
                             "peers before dispatching")
    parser.add_argument("--request-timeout", type=float, default=120.0,
                        help="seconds a request may wait for generation "
                             "(raise for cold-start compiles)")
    parser.add_argument("--mesh", default=None,
                        help="e.g. dp=2: shard batched requests")
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

    from gesture2vec_tpu.cli._common import (build_generator,
                                             ensure_virtual_devices,
                                             load_bvh_exporter, parse_mesh)
    ensure_virtual_devices(args.mesh, args.platform)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from gesture2vec_tpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache(args.jax_cache)

    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.io.bvh import write_bvh
    from gesture2vec_tpu.serve.server import serve

    logging.basicConfig(level=logging.INFO)
    store = ClipStore(args.store)
    gen, _ = build_generator(args.t2t_checkpoint, args.rep_checkpoint,
                             args.autoencoder_checkpoint, store,
                             mode=args.mode,
                             latent_bank_path=args.latent_bank,
                             seed=args.seed,
                             temperature=args.temperature,
                             top_k=args.top_k,
                               beam_width=args.beam_width,
                               exemplar_continuity=args.exemplar_continuity,
                               decode_overlap=args.decode_overlap,
                               soft_decode=args.soft_decode)
    to_bvh = load_bvh_exporter(args.dataset, args.pipeline,
                               args.twh_variant)

    def export_bvh(frames):
        return write_bvh(to_bvh(frames, path=None))

    mesh = parse_mesh(args.mesh)

    httpd = serve(gen, host=args.host, port=args.port,
                  export_bvh=export_bvh, max_batch=args.max_batch,
                  batch_window_s=args.batch_window_ms / 1000.0, mesh=mesh,
                  request_timeout_s=args.request_timeout,
                  stream_batch=args.stream_batch,
                  stream_batch_window_s=args.stream_batch_window_ms
                  / 1000.0)
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
