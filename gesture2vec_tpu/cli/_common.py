"""Shared construction helpers for the inference-side CLIs.

g2v-infer, g2v-serve (and their variants) all load the same three
checkpoints, rebuild the vocab the same way, and assemble the same
GestureGenerator; this module is the single implementation so a fix to
checkpoint loading or the vocab fallback lands everywhere at once.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple


def ensure_virtual_devices(mesh_spec: Optional[str],
                           platform: Optional[str]) -> None:
    """On --platform cpu with --mesh, provision enough virtual host
    devices (must run BEFORE jax initializes its backend). A stale
    --xla_force_host_platform_device_count already in XLA_FLAGS (e.g.
    exported by a previous run) is replaced, not kept."""
    if not (mesh_spec and platform == "cpu"):
        return
    import os
    need = 1
    for kv in mesh_spec.split(","):
        need *= int(kv.split("=")[1])
    flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={need}")
    os.environ["XLA_FLAGS"] = " ".join(flags)


def parse_mesh(mesh_spec: Optional[str]):
    """'dp=4,tp=2' -> a jax Mesh (None passes through)."""
    if not mesh_spec:
        return None
    from gesture2vec_tpu.parallel.mesh import make_mesh
    return make_mesh({k: int(v)
                      for k, v in (kv.split("=")
                                   for kv in mesh_spec.split(","))})


def build_generator(t2t_checkpoint: str, rep_checkpoint: str,
                    autoencoder_checkpoint: str, store,
                    mode: str = "decode",
                    latent_bank_path: Optional[str] = None,
                    seed: int = 0, temperature: float = 0.0,
                    top_k: int = 0, beam_width: int = 0,
                    exemplar_continuity: bool = False,
                    decode_overlap: int = 0,
                    soft_decode: float = 0.0,
                    stage0_temperature: float = -1.0):
    """Load the three pipeline checkpoints and assemble the
    GestureGenerator. Returns (generator, t2t_config)."""
    from gesture2vec_tpu.cluster.latent_dataset import load_latent_dataset
    from gesture2vec_tpu.infer.text2gesture import GestureGenerator
    from gesture2vec_tpu.text.vocab import Vocab, build_vocab
    from gesture2vec_tpu.train import checkpoints

    t2t_model, t2t_vars, t2t_payload = \
        checkpoints.load_checkpoint_and_model(t2t_checkpoint,
                                              "text2embedding")
    dae_model, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        rep_checkpoint, "DAE")
    seq_model, seq_vars, _ = checkpoints.load_checkpoint_and_model(
        autoencoder_checkpoint, "autoencoder_vq")
    cfg = t2t_payload["config"]
    if t2t_payload.get("lang_model"):
        vocab = Vocab.from_state_dict(t2t_payload["lang_model"])
    else:
        vocab = build_vocab("corpus",
                            [[w[0] for w in c["words"]] for c in store],
                            cfg.wordembed_path, cfg.wordembed_dim)
    bank = (load_latent_dataset(latent_bank_path)
            if latent_bank_path else None)
    gen = GestureGenerator(
        t2t_model=t2t_model, t2t_variables=t2t_vars,
        seq_model=seq_model, seq_variables=seq_vars,
        dae_model=dae_model, dae_variables=dae_vars, vocab=vocab,
        pose_mean=store.pose_mean, pose_std=store.pose_std,
        n_frames=cfg.n_poses,
        sentence_frame_length=cfg.sentence_frame_length,
        fps=cfg.motion_resampling_framerate, mode=mode,
        latent_bank=bank, seed=seed, temperature=temperature,
        top_k=top_k, beam_width=beam_width,
        exemplar_continuity=exemplar_continuity,
        decode_overlap=decode_overlap, soft_decode=soft_decode,
        stage0_temperature=stage0_temperature,
        text_context_s=getattr(cfg, "text_context_s", 0.0))
    return gen, cfg


def load_bvh_exporter(dataset: str, pipeline_path: str,
                      twh_variant: str = "test1"):
    """Returns to_bvh(frames, path=None) -> BVHData|None for the
    dataset family (Trinity rotmat features or TWH variants)."""
    if dataset == "twh":
        from gesture2vec_tpu.infer.exporter import frames_to_bvh_twh
        from gesture2vec_tpu.mocap.features import TWHFeatureExtractor
        fe = TWHFeatureExtractor.load(pipeline_path, twh_variant)

        def to_bvh(frames, path=None):
            return frames_to_bvh_twh(frames, fe, path=path)
    else:
        from gesture2vec_tpu.infer.exporter import frames_to_bvh
        from gesture2vec_tpu.mocap.features import FeatureExtractor
        fe = FeatureExtractor.load(pipeline_path)

        def to_bvh(frames, path=None):
            return frames_to_bvh(frames, fe, path=path)
    return to_bvh
