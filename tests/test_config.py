"""Config loading: reference YAMLs load unmodified."""
import os

import numpy as np
import pytest

from gesture2vec_tpu.train.config import load_config

REF = "/root/reference/config"


def test_boolean_normalization():
    cfg = load_config(dict(autoencoder_vq="True", autoencoder_vae="False",
                           sentence_level="true", use_derivative=False))
    assert cfg.autoencoder_vq is True
    assert cfg.autoencoder_vae is False
    assert cfg.sentence_level is True
    assert cfg.use_derivative is False


def test_extras_roundtrip(tmp_path):
    from gesture2vec_tpu.train import checkpoints

    cfg = load_config(dict(name="x", text_encoder="gru", custom_flag=7))
    assert cfg.extras["text_encoder"] == "gru"
    p = str(tmp_path / "c.bin")
    checkpoints.save_checkpoint(p, config=cfg, epoch=1, params={})
    payload = checkpoints.load_checkpoint(p)
    assert payload["config"].extras["text_encoder"] == "gru"
    assert payload["config"].extras["custom_flag"] == 7


def test_kind_collision_warnings(tmp_path, caplog):
    """Overwriting a checkpoint of a different kind (two parts sharing
    a config name + save dir) and loading a checkpoint as the wrong
    kind both warn."""
    import logging

    from gesture2vec_tpu.train import checkpoints

    cfg = load_config(dict(name="x", model="seq2seq"))
    p = str(tmp_path / "x_checkpoint_001.bin")
    checkpoints.save_checkpoint(p, config=cfg, epoch=1, params={},
                                kind="autoencoder_vq")
    with caplog.at_level(logging.WARNING):
        checkpoints.save_checkpoint(p, config=cfg, epoch=1, params={},
                                    kind="text2embedding")
    assert any("sharing a config name" in r.message for r in caplog.records)
    assert checkpoints.load_checkpoint(p)["kind"] == "text2embedding"

    # re-saving the same kind does not warn
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        checkpoints.save_checkpoint(p, config=cfg, epoch=1, params={},
                                    kind="text2embedding")
    assert not caplog.records

    # checkpoints without a kind stamp (older files) stay silent
    checkpoints.save_checkpoint(p, config=cfg, epoch=1, params={})
    assert checkpoints.load_checkpoint(p)["kind"] == ""


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference configs not mounted")
@pytest.mark.parametrize("name", ["DAE.yml", "VQ-VAE.yml",
                                  "seq2seqtxt.yml", "VQ-VAE_GENEA.yml"])
def test_reference_yaml_loads(name):
    """The reference's own YAML files load without modification - the
    config surface is drop-in compatible."""
    cfg = load_config(os.path.join(REF, name))
    assert cfg.hidden_size > 0
    assert isinstance(cfg.autoencoder_vq, bool)
    assert isinstance(cfg.autoencoder_vq_components, int)
    if cfg.data_mean is not None:
        # note: the reference's own seq2seqtxt.yml ships a 162-dim
        # (TWH "Taras") mean with input_motion_dim=135, so only
        # well-formedness is asserted here
        assert cfg.data_mean.ndim >= 1
        assert np.isfinite(cfg.data_mean).all()


def test_all_shipped_configs_load():
    """Every --part choice in cli/train.py has a shipped config that
    loads (reference config/seq2seq.yml included -> configs/seq2seq.yml
    for --part baseline)."""
    here = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    names = {f for f in os.listdir(here) if f.endswith(".yml")}
    # part -> config file coverage
    for required in ("DAE.yml", "VQ-VAE.yml", "seq2seqtxt.yml",
                     "seq2seq.yml", "audio.yml", "c2g.yml", "gan.yml",
                     "DAE_GENEA.yml", "VQ-VAE_GENEA.yml"):
        assert required in names, required
    for name in sorted(names):
        cfg = load_config(os.path.join(here, name))
        assert cfg.hidden_size > 0
        assert isinstance(cfg.autoencoder_vq, bool)

def test_recommended_recipe_configs_build_models():
    """The round-4 recommended recipe pair (configs/VQ-VAE_rvq.yml +
    configs/seq2seqtxt_recommended.yml) must stay in sync with the
    flags the combined-lever study promoted
    (docs/quality/metrics_combined.json): 4-stage residual VQ, and a
    stage-conditional transformer Part d with matching token_stages."""
    from gesture2vec_tpu.train.seq_ae_trainer import make_seq_ae
    from gesture2vec_tpu.train.text2token_trainer import make_text2token

    here = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")

    b = load_config(os.path.join(here, "VQ-VAE_rvq.yml"))
    assert b.autoencoder_vq_variant == "rvq"
    assert b.rvq_stages == 4
    assert b.rvq_reestimate_every > 0  # collapse guard stays on
    seq = make_seq_ae(b)
    assert type(seq).__name__ == "SeqVQAutoencoder"

    d = load_config(os.path.join(here, "seq2seqtxt_recommended.yml"))
    assert d.token_stages == b.rvq_stages  # heads must match stages
    assert d.stage_conditional is True
    assert d.extras.get("t2t_arch") == "transformer"
    # round-5 lever: label smoothing is the measured-best distribution
    # regularizer (FGD 2.59, metrics_combined.json tf_cond_ls); it must
    # not be combined with keep_best (best_ls measured worse, 3.30)
    assert d.label_smoothing == 0.1
    assert d.keep_best is False
    t2t = make_text2token(d, n_words=50)
    assert "Transformer" in type(t2t).__name__
