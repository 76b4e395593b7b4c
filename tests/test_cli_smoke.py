"""End-to-end CLI smoke test through subprocesses - the exact commands a
user types (installed console-script modules, --platform cpu)."""
import json
import os
import subprocess
import sys

import pytest

from tests.corpus import make_corpus

pytestmark = pytest.mark.slow


def _run(args, cwd):
    env = dict(os.environ)
    r = subprocess.run([sys.executable, "-m"] + args, cwd=cwd,
                       capture_output=True, text=True, timeout=300,
                       env=env)
    assert r.returncode == 0, f"{args}\nstdout:{r.stdout}\nstderr:{r.stderr}"
    return r


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    make_corpus(str(root / "corpus"), n_files=3, n_frames=360,
                with_audio=True)
    return root


def _write_cfg(path, **kw):
    import yaml
    with open(path, "w") as f:
        yaml.safe_dump(kw, f)


def test_full_cli_workflow(workdir):
    root = str(workdir)
    _run(["gesture2vec_tpu.cli.make_dataset", "corpus"], root)

    _write_cfg(os.path.join(root, "dae.yml"), name="dae", model="DAE",
               train_data_path="corpus/store/train",
               val_data_path="corpus/store/val",
               model_save_path="out/dae", hidden_size=16,
               dropout_prob=0.2, input_motion_dim=135, epochs=1,
               batch_size=32, learning_rate=0.005, random_seed=0)
    _run(["gesture2vec_tpu.cli.train", "-c", "dae.yml", "--part", "a",
          "--platform", "cpu"], root)
    dae_ckpt = "out/dae/dae_H16_checkpoint_001.bin"
    assert os.path.exists(os.path.join(root, dae_ckpt))

    _write_cfg(os.path.join(root, "vq.yml"), name="vq", model="seq2seq",
               train_data_path="corpus/store/train",
               val_data_path="corpus/store/val",
               model_save_path="out/vq", hidden_size=24, n_layers=2,
               dropout_prob=0.1, epochs=1, batch_size=16,
               learning_rate=0.002, random_seed=0, n_poses=10,
               n_pre_poses=1, subdivision_stride=5, autoencoder_vq=True,
               autoencoder_vq_components=16,
               autoencoder_vq_commitment_cost=0.25, autoencoder_att=False,
               autoencoder_conditioned=True, autoencoder_vae=False,
               loss_l1_weight=5, loss_cont_weight=0.1, loss_var_weight=0.5)
    _run(["gesture2vec_tpu.cli.train", "-c", "vq.yml", "--part", "b",
          "--rep-checkpoint", dae_ckpt, "--platform", "cpu"], root)
    vq_ckpt = "out/vq/vq_checkpoint_001.bin"
    assert os.path.exists(os.path.join(root, vq_ckpt))

    _write_cfg(os.path.join(root, "t2t.yml"), name="t2t", model="seq2seq",
               train_data_path="corpus/store/train",
               val_data_path="corpus/store/val",
               model_save_path="out/t2t", hidden_size=24, n_layers=2,
               dropout_prob=0.1, epochs=1, batch_size=8,
               learning_rate=0.003, random_seed=0, wordembed_dim=24,
               n_poses=10, n_pre_poses=1, sentence_frame_length=40,
               subdivision_stride_sentence=20,
               motion_resampling_framerate=20, autoencoder_vq=True,
               autoencoder_vq_components=16, autoencoder_att=True,
               text_encoder="tcn")
    _run(["gesture2vec_tpu.cli.train", "-c", "t2t.yml", "--part", "d",
          "--rep-checkpoint", dae_ckpt, "--autoencoder-checkpoint",
          vq_ckpt, "--platform", "cpu"], root)
    t2t_ckpt = "out/t2t/t2t_checkpoint_001.bin"
    assert os.path.exists(os.path.join(root, t2t_ckpt))

    # baseline text->pose regressor (ref: scripts/train.py +
    # scripts/inference.py, config/seq2seq.yml)
    _write_cfg(os.path.join(root, "seq2seq.yml"), name="baseline",
               model="seq2seq", train_data_path="corpus/store/train",
               val_data_path="corpus/store/val",
               model_save_path="out/baseline", hidden_size=24, n_layers=2,
               dropout_prob=0.0, epochs=1, batch_size=8,
               learning_rate=0.0005, random_seed=0, wordembed_dim=24,
               n_poses=20, n_pre_poses=1, subdivision_stride=20,
               motion_resampling_framerate=20, loss_l1_weight=5,
               loss_cont_weight=0.1, loss_var_weight=0.5)
    _run(["gesture2vec_tpu.cli.train", "-c", "seq2seq.yml", "--part",
          "baseline", "--platform", "cpu"], root)
    base_ckpt = "out/baseline/baseline_checkpoint_001.bin"
    assert os.path.exists(os.path.join(root, base_ckpt))
    _run(["gesture2vec_tpu.cli.tools", "baseline-infer", base_ckpt,
          "corpus/Transcripts/Recording_001.json", "--store",
          "corpus/store/train", "--pipeline",
          "corpus/store/data_pipe.json", "--out", "baseline.bvh",
          "--platform", "cpu"], root)
    assert os.path.getsize(os.path.join(root, "baseline.bvh")) > 10000

    # audio-context Part-d variant: mel chunks -> tokens
    _write_cfg(os.path.join(root, "a2t.yml"), name="a2t", model="seq2seq",
               train_data_path="corpus/store/train",
               val_data_path="corpus/store/val",
               model_save_path="out/a2t", hidden_size=24, n_layers=2,
               dropout_prob=0.1, epochs=1, batch_size=8,
               learning_rate=0.003, random_seed=0, n_poses=10,
               n_pre_poses=1, sentence_frame_length=40,
               subdivision_stride_sentence=20,
               motion_resampling_framerate=20, autoencoder_vq=True,
               autoencoder_vq_components=16, autoencoder_att=True)
    _run(["gesture2vec_tpu.cli.train", "-c", "a2t.yml", "--part", "audio",
          "--rep-checkpoint", dae_ckpt, "--autoencoder-checkpoint",
          vq_ckpt, "--platform", "cpu"], root)
    a2t_ckpt = "out/a2t/a2t_checkpoint_001.bin"
    assert os.path.exists(os.path.join(root, a2t_ckpt))

    _run(["gesture2vec_tpu.cli.infer_audio", a2t_ckpt,
          "corpus/Audio/Recording_001.wav", dae_ckpt, vq_ckpt,
          "--mode", "decode", "--store", "corpus/store/train",
          "--pipeline", "corpus/store/data_pipe.json", "--out",
          "generated_audio.bvh", "--platform", "cpu"], root)
    assert os.path.getsize(os.path.join(root, "generated_audio.bvh")) > 10000

    # text+audio fusion variant (audio_fusion='both', the repaired ref
    # both=True branch): word ids + raw 1 s chunks; inference needs the
    # transcript
    _write_cfg(os.path.join(root, "a2t_both.yml"), name="a2tb",
               model="seq2seq", train_data_path="corpus/store/train",
               val_data_path="corpus/store/val",
               model_save_path="out/a2t_both", hidden_size=24,
               n_layers=2, dropout_prob=0.1, epochs=1, batch_size=8,
               learning_rate=0.003, random_seed=0, wordembed_dim=24,
               n_poses=10, n_pre_poses=1, sentence_frame_length=40,
               subdivision_stride_sentence=20,
               motion_resampling_framerate=20, autoencoder_vq=True,
               autoencoder_vq_components=16, autoencoder_att=True,
               audio_fusion="both")
    _run(["gesture2vec_tpu.cli.train", "-c", "a2t_both.yml", "--part",
          "audio", "--rep-checkpoint", dae_ckpt,
          "--autoencoder-checkpoint", vq_ckpt, "--platform", "cpu"],
         root)
    a2tb_ckpt = "out/a2t_both/a2tb_checkpoint_001.bin"
    assert os.path.exists(os.path.join(root, a2tb_ckpt))
    _run(["gesture2vec_tpu.cli.infer_audio", a2tb_ckpt,
          "corpus/Audio/Recording_001.wav", dae_ckpt, vq_ckpt,
          "--mode", "decode", "--store", "corpus/store/train",
          "--transcript", "corpus/Transcripts/Recording_001.json",
          "--pipeline", "corpus/store/data_pipe.json", "--out",
          "generated_audio_both.bvh", "--platform", "cpu"], root)
    assert os.path.getsize(
        os.path.join(root, "generated_audio_both.bvh")) > 10000

    _run(["gesture2vec_tpu.cli.cluster", dae_ckpt, vq_ckpt, "--store",
          "corpus/store/train", "--platform", "cpu"], root)
    bank = "out/vq/clusters/org_latent_clustering_data.npz"
    assert os.path.exists(os.path.join(root, bank))

    _run(["gesture2vec_tpu.cli.infer", t2t_ckpt,
          "corpus/Transcripts/Recording_001.json", dae_ckpt, vq_ckpt,
          "--latent-bank", bank, "--store", "corpus/store/train",
          "--pipeline", "corpus/store/data_pipe.json", "--out",
          "generated.bvh", "--platform", "cpu"], root)
    assert os.path.getsize(os.path.join(root, "generated.bvh")) > 10000

    _run(["gesture2vec_tpu.cli.reconstruct", dae_ckpt,
          "corpus/Motion/Recording_001.bvh", "--store",
          "corpus/store/train", "--pipeline",
          "corpus/store/data_pipe.json", "--out", "recon.bvh",
          "--platform", "cpu"], root)
    assert os.path.getsize(os.path.join(root, "recon.bvh")) > 10000

    # batched serving: two transcripts, one device program, dp=2 mesh
    _run(["gesture2vec_tpu.cli.infer", t2t_ckpt,
          "corpus/Transcripts/Recording_001.json",
          "corpus/Transcripts/Recording_002.json", dae_ckpt, vq_ckpt,
          "--mode", "decode", "--mesh", "dp=2", "--store",
          "corpus/store/train", "--pipeline",
          "corpus/store/data_pipe.json", "--out", "batch/gen.bvh",
          "--duration", "4", "--platform", "cpu"], root)
    for rec in ("Recording_001", "Recording_002"):
        p = os.path.join(root, "batch", f"gen_{rec}.bvh")
        assert os.path.getsize(p) > 10000, p


def test_serve_cli(workdir):
    """g2v-serve end-to-end: spawn the server CLI on the checkpoints the
    workflow test trained, POST a transcript, get BVH text back."""
    import re
    import time
    import urllib.request

    root = str(workdir)
    t2t_ckpt = os.path.join(root, "out/t2t/t2t_checkpoint_001.bin")
    if not os.path.exists(t2t_ckpt):
        pytest.skip("workflow checkpoints not present (run order)")

    proc = subprocess.Popen(
        [sys.executable, "-m", "gesture2vec_tpu.cli.serve",
         "out/t2t/t2t_checkpoint_001.bin", "out/dae/dae_H16_checkpoint_001.bin",
         "out/vq/vq_checkpoint_001.bin", "--store", "corpus/store/train",
         "--pipeline", "corpus/store/data_pipe.json", "--mode", "decode",
         "--port", "0", "--batch-window-ms", "10", "--platform", "cpu"],
        cwd=root, stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
        text=True)
    try:
        # the CLI logs "serving on http://host:port" once ready; read
        # stderr on a side thread so a wedged server cannot block the
        # suite in readline() past the deadline
        import threading
        found = []

        def _scan():
            for line in proc.stderr:
                m = re.search(r"serving on http://[\d.]+:(\d+)", line)
                if m:
                    found.append(int(m.group(1)))
                    return

        reader = threading.Thread(target=_scan, daemon=True)
        reader.start()
        reader.join(timeout=120)
        assert found, "server did not report its port"
        port = found[0]

        with open(os.path.join(
                root, "corpus/Transcripts/Recording_001.json")) as f:
            sub = json.load(f)
        words = [[w["word"], float(w["start_time"].rstrip("s")),
                  float(w["end_time"].rstrip("s"))] for w in sub]
        body = json.dumps({"words": words[:12], "duration_s": 4.0}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            assert r.status == 200
            text = r.read().decode()
        assert text.startswith("HIERARCHY")
        assert "MOTION" in text
    finally:
        proc.terminate()
        proc.wait(timeout=10)
