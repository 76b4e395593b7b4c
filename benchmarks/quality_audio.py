"""Audio-chain quality: train audio2token on the motif corpus and
evaluate speech->gesture end to end against held-out ground truth.

Companion to quality_run.py (which proves the text chain): synthesizes
audio for the SAME corpus from its saved transcripts - each word's
interval carries a sine at its motif's frequency, so the mel chunks are
as word-informative as the text - then trains the audio-context Part d
(ref: text2embedding_model.py audio_context=True rebuilt as
models/audio2token) against the frozen a/b teachers from a completed
quality_run, and runs the generated-vs-ground-truth metric battery on
motion generated from val AUDIO alone.

    python benchmarks/quality_run.py /tmp/quality_out    # first
    python benchmarks/quality_audio.py /tmp/quality_out  # then this

--fusion both trains/evaluates the repaired text+audio fusion encoder
instead (ref Helper_models.py both=True branch; word ids + raw 1 s wav
chunks -> WavEncoderTri + embedding -> fused biGRU) and writes
metrics_audio_both.json.
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
from quality_run import (VOCAB, WORD_DUR, motif_of,  # noqa: E402
                         token_latent_battery)

AUDIO_SR = 16000


def synthesize_audio(corpus: str) -> None:
    """Write Audio/*.wav: per-word sine bursts at motif frequencies,
    derived from the committed Transcripts/*.json."""
    from scipy.io import wavfile

    os.makedirs(os.path.join(corpus, "Audio"), exist_ok=True)
    rng = np.random.default_rng(7)
    for tpath in sorted(glob.glob(os.path.join(corpus, "Transcripts",
                                               "*.json"))):
        with open(tpath) as f:
            words = json.load(f)
        dur = float(words[-1]["end_time"][:-1]) + WORD_DUR
        wave = rng.normal(0, 0.01, size=int(dur * AUDIO_SR)) \
            .astype(np.float32)
        for w in words:
            s = float(w["start_time"][:-1])
            e = float(w["end_time"][:-1])
            m = motif_of(w["word"])
            freq = 180.0 + 35.0 * m
            i0, i1 = int(s * AUDIO_SR), int(e * AUDIO_SR)
            t = np.arange(i1 - i0) / AUDIO_SR
            wave[i0:i1] += 0.3 * np.sin(2 * np.pi * freq * t) \
                .astype(np.float32)
        name = os.path.splitext(os.path.basename(tpath))[0]
        wavfile.write(os.path.join(corpus, "Audio", name + ".wav"),
                      AUDIO_SR, wave)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", nargs="?", default="/tmp/quality_out")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--fusion", choices=["audio", "both"],
                    default="audio",
                    help="'both' trains/evaluates the text+audio "
                         "fusion encoder (repaired ref both=True "
                         "branch) and writes metrics_audio_both.json")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax

    from gesture2vec_tpu.cluster.latent_dataset import build_latent_dataset
    from gesture2vec_tpu.data.datasets import normalize
    from gesture2vec_tpu.data.ingest import ingest_trinity
    from gesture2vec_tpu.data.sentence import build_sentence_dataset
    from gesture2vec_tpu.data.store import ClipStore
    from gesture2vec_tpu.data.teacher import (encode_windows_with_dae,
                                              tokenize_windows)
    from gesture2vec_tpu.infer.audio2gesture import AudioGestureGenerator
    from gesture2vec_tpu.text.vocab import Vocab
    from gesture2vec_tpu.train import checkpoints
    from gesture2vec_tpu.train.audio2token_trainer import (
        make_audio2token, train_audio2token)
    from gesture2vec_tpu.train.config import load_config

    print("backend:", jax.devices()[0].platform)
    corpus = os.path.join(args.out, "corpus")

    def latest(pat):
        return sorted(glob.glob(os.path.join(args.out, pat)))[-1]

    dae, dae_vars, _ = checkpoints.load_checkpoint_and_model(
        latest("dae/*.bin"), "DAE")
    seq, seq_vars, seq_payload = checkpoints.load_checkpoint_and_model(
        latest("vqvae/*.bin"), "autoencoder_vq")
    cfg_b = seq_payload["config"]
    codes, n_frames_chunk = cfg_b.autoencoder_vq_components, cfg_b.n_poses
    sent_len, fps = 120, 20

    # audio store: same BVHs + transcripts (identical poses/stats),
    # now with synthesized waveforms
    audio_store_root = os.path.join(corpus, "store_audio")
    if not os.path.exists(os.path.join(audio_store_root, "train",
                                       "meta.msgpack")):
        synthesize_audio(corpus)
        ingest_trinity(corpus, out_path=audio_store_root, tgt_fps=fps,
                       with_audio=True)
    store = ClipStore(os.path.join(audio_store_root, "train"))
    val_store = ClipStore(os.path.join(audio_store_root, "val"))
    vocab = Vocab("unused")  # sentence builder needs one; audio ignores it
    for c in store:
        vocab.index_words([w[0] for w in c["words"]])

    both = args.fusion == "both"
    sent = build_sentence_dataset(
        store, vocab, dae_model=dae, dae_variables=dae_vars,
        seq_model=seq, seq_variables=seq_vars,
        sentence_frame_length=sent_len, stride=30,
        n_frames=n_frames_chunk, fps=fps, max_words=24,
        include_audio=not both, include_raw_audio=both,
        audio_sr=AUDIO_SR)
    sent_val = build_sentence_dataset(
        val_store, vocab, dae_model=dae, dae_variables=dae_vars,
        seq_model=seq, seq_variables=seq_vars,
        sentence_frame_length=sent_len, stride=sent_len,
        n_frames=n_frames_chunk, fps=fps, max_words=24,
        include_audio=not both, include_raw_audio=both,
        audio_sr=AUDIO_SR,
        mean=store.pose_mean, std=store.pose_std)
    keys = ("word_ids", "wav") if both else ("mel",)
    data = {k: sent[k] for k in keys} | {"tokens": sent["tokens"]}
    val = {k: sent_val[k] for k in keys} | {"tokens": sent_val["tokens"]}
    print(f"audio dataset ({args.fusion}): "
          f"{data[keys[-1]].shape} train, {val[keys[-1]].shape} val")

    a2t_cfg = load_config(dict(
        name="a2t" + ("_both" if both else ""), model="seq2seq",
        hidden_size=(32 if args.fast else cfg_b.hidden_size),
        n_layers=2, dropout_prob=0.1,
        epochs=(6 if args.fast else 60),
        batch_size=(8 if args.fast else 32), learning_rate=0.001,
        sentence_frame_length=sent_len, n_poses=n_frames_chunk,
        n_pre_poses=1, autoencoder_vq_components=codes,
        autoencoder_att=True, random_seed=0,
        audio_fusion=args.fusion,
        wordembed_dim=(16 if args.fast else 100)))
    a2t_state, hist = train_audio2token(
        a2t_cfg, data, val,
        save_dir=os.path.join(args.out, "a2t" + ("_both" if both
                                                 else "")),
        save_every=1000, n_words=(vocab.n_words if both else 0),
        lang_model_state=(vocab.state_dict() if both else None))
    a2t = make_audio2token(a2t_cfg,
                           n_words=(vocab.n_words if both else 0))
    a2t_vars = {"params": a2t_state.params,
                "batch_stats": a2t_state.batch_stats}
    print(f"audio2token: val CE {hist['val_loss'][-1]:.4f}, "
          f"val acc {hist['val_acc'][-1]:.3f}")

    # ---- generated-vs-GT from val AUDIO alone ----
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
    def eval_policy(temperature, soft_decode=0.0):
        gen = AudioGestureGenerator(
            a2t_model=a2t, a2t_variables=a2t_vars, seq_model=seq,
            seq_variables=seq_vars, dae_model=dae, dae_variables=dae_vars,
            pose_mean=store.pose_mean, pose_std=store.pose_std,
            n_frames=n_frames_chunk, sentence_frame_length=sent_len,
            fps=fps, audio_sr=AUDIO_SR, mode="decode", latent_bank=bank,
            vocab=vocab, max_words=24, temperature=temperature,
            soft_decode=soft_decode)

        gen_toks, gt_toks, gen_lat_list = [], [], []
        for clip in val_store:
            audio = clip.get("audio")
            if audio is None:
                continue
            dur = clip["poses"].shape[0] / fps
            frames, tokens = gen.generate(
                audio, duration_s=dur,
                words=(clip["words"] if both else None))
            n_tok_real = int(clip["poses"].shape[0] // n_frames_chunk)
            gen_toks.append(np.asarray(tokens).reshape(-1)[:n_tok_real])
            gt_norm = normalize(clip["poses"], store.pose_mean,
                                store.pose_std)
            chunks = gt_norm[:n_tok_real * n_frames_chunk].reshape(
                n_tok_real, n_frames_chunk, -1)
            gt_lat = encode_windows_with_dae(dae, dae_vars, chunks)
            t, _ = tokenize_windows(seq, seq_vars, gt_lat)
            gt_toks.append(np.asarray(t).reshape(-1))
            gfn = normalize(np.asarray(frames), store.pose_mean,
                            store.pose_std)
            n_chunks = gfn.shape[0] // n_frames_chunk
            glat = encode_windows_with_dae(
                dae, dae_vars, gfn[:n_chunks * n_frames_chunk].reshape(
                    n_chunks, n_frames_chunk, -1))
            # tokenize_windows' second return is the flattened (N, L*H)
            # seq latent - the generated tokens themselves come from the
            # generator above, not this teacher pass
            _, gen_lat = tokenize_windows(seq, seq_vars, glat)
            gen_lat_list.append(gen_lat)

        pairs = [(g[:min(len(g), len(r))], r[:min(len(g), len(r))])
                 for g, r in zip(gen_toks, gt_toks)]
        m = token_latent_battery(pairs, np.concatenate(gen_lat_list),
                                 bank, bank_val, codes)
        m.pop("_hist_gen"), m.pop("_hist_gt")
        return m

    metrics = eval_policy(0.0)
    # stochastic decode over the same checkpoints (see QUALITY.md
    # decode-policy table for the text chain's equivalent)
    metrics_sampled = eval_policy(1.0)
    # soft-mixture decode (same lever as the text chain's QUALITY.md
    # soft rows: feed the predicted codebook mixture, tokens unchanged)
    metrics_soft = eval_policy(0.0, soft_decode=1.0)
    metrics = {"val_ce": hist["val_loss"][-1],
               "val_token_accuracy_teacher_forced": hist["val_acc"][-1],
               **metrics,
               "sampled_t1": metrics_sampled,
               "soft_t1": metrics_soft}
    out_name = ("metrics_audio_both.json" if both
                else "metrics_audio.json")
    with open(os.path.join(args.out, out_name), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
